package graft.sources

import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/scan operators (SURVEY §2.1, S2–S11) as library readers.
  *
  * Each mirrors one ingestion shape of the reference's parsers; Catalyst
  * prunes/pushes down through all of them, and every reader returns a plain
  * DataFrame so downstream operators compose. Scale notes inline.
  */
object Readers {

  /** S2: header TSV/CSV scan (reference:src/kg_ae/datasets/drugcentral/
    * parse.py:59-66). */
  def csvWithHeader(spark: SparkSession, path: String, sep: String = "\t"): DataFrame =
    spark.read.option("sep", sep).option("header", "true").csv(path)

  /** S3: headerless TSV with imposed schema (reference:sider/parse.py:70-77). */
  def csvImposedSchema(spark: SparkSession, path: String, schema: StructType,
      sep: String = "\t"): DataFrame =
    spark.read.schema(schema).option("sep", sep).option("header", "false")
      .csv(path)

  /** S4: commented-header TSV — '#' lines skipped, schema imposed
    * (reference:ctd/parse.py:76-86). */
  def csvCommentHeader(spark: SparkSession, path: String, schema: StructType,
      sep: String = "\t"): DataFrame =
    spark.read.schema(schema).option("sep", sep).option("comment", "#")
      .option("header", "false").csv(path)

  /** S5: tolerant big-TSV scan — all-string, ragged/malformed lines kept,
    * quoting disabled (reference:bindingdb/parse.py:58-80). Project columns
    * immediately after; Catalyst pushes the pruning into the scan. */
  def csvTolerant(spark: SparkSession, path: String, sep: String = "\t"): DataFrame =
    spark.read
      .option("sep", sep).option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("quote", "\u0000") // disable quoting (reference: quote_char=None)
      .option("enforceSchema", "false")
      .csv(path)

  /** S6: gzipped CSV — Spark decompresses transparently; NOTE a .gz file is
    * a single split, so at 100 TB pre-decompress or convert to
    * parquet/zstd-in-parquet before the heavy lifting. */
  def csvGz(spark: SparkSession, path: String, sep: String = ","): DataFrame =
    csvWithHeader(spark, path, sep)

  /** S7: space-separated scan (reference:string/parse.py:143-149). */
  def spaceSeparated(spark: SparkSession, path: String): DataFrame =
    csvWithHeader(spark, path, " ")

  /** S10: JSONL scan with skip-on-error — PERMISSIVE mode captures bad
    * lines in _corrupt_record instead of failing the scan
    * (reference:chembl/parse.py:55-95 skips json.loads errors). */
  def jsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** S11: nested-JSON API documents — one object with a docs[] array;
    * explode + per-field extraction incl. first-of-list
    * (reference:hgnc/parse.py:52-104). `docsPath` e.g. "response.docs". */
  def nestedJsonDocs(spark: SparkSession, path: String, docsPath: String): DataFrame = {
    val root = spark.read.option("multiLine", "true").json(path)
    root.select(explode(col(docsPath)).as("doc")).select(col("doc.*"))
  }

  /** S9: ZIP-of-JSON document scan — binaryFile source + a typed flatMap
    * that walks zip members on the executor (never on the driver). Each
    * member's bytes are returned with its entry name; parse with from_json
    * downstream. At 100 TB each zip is one task — keep archives ≲ a few
    * hundred MB or pre-explode (the reference caps FAERS at 10 quarterly
    * zips for the same reason, faers/download.py:33-39). */
  def zipOfJson(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    bin.as[(String, Array[Byte])].flatMap { case (zipPath, bytes) =>
      val zis = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
      // close in finally: each ZipInputStream holds a native zlib
      // Inflater (off-heap) reclaimed only by GC finalization otherwise —
      // thousands of archives per long-lived executor would grow past the
      // container's memory overhead; a ZipException mid-entry must not
      // leak it either. The .toList materializes every entry BEFORE the
      // close, so the laziness of the iterator never outlives the stream.
      try Iterator.continually(zis.getNextEntry)
        .takeWhile(_ != null)
        .filter(e => !e.isDirectory)
        .map { e =>
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = zis.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = zis.read(buf) }
          (zipPath, e.getName,
            new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
        }.toList
      finally zis.close()
    }.toDF("zip_path", "entry", "json")
  }

  /** S13: small JSON artifact sink (meta.json analogue,
    * reference:graph/build.py:841-875) — deliberately coalesce(1): metadata
    * only, never data-scale. */
  def writeJsonArtifact(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").json(path)
}
