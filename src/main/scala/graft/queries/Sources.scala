package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType, StructField, StructType}

import graft.sources.{Readers, SchemaTools, SourceSynth}

/** Driver-oracled queries for the source readers (SURVEY §2.1 S2/S3/S4/S6/
  * S10/S11): each synthesizes a deterministic fixture file, scans it with
  * the library reader, and the DuckDB oracle scans the SAME file — reader
  * semantics (header handling, comment skipping, imposed schemas,
  * transparent gzip, corrupt-line tolerance, nested-document explosion)
  * are hash-checked end-to-end, not just spec-asserted.
  */
object Sources {

  val defs: Seq[QueryDef] = Seq(

    // S2: header TSV scan — schema from the header line, all-string
    // columns (reference drugcentral/parse.py:59-66).
    QueryDef("q54_src_header_tsv", (s, _) => {
      SourceSynth.ensure()
      Readers.csvWithHeader(s, SourceSynth.peopleTsv)
    }, Some(s"""
      SELECT * FROM read_csv('${SourceSynth.peopleTsv}',
        delim='\t', header=true, all_varchar=true)""")),

    // S3+S4: commented-header TSV with an imposed schema — '#' block
    // skipped, typed columns (reference ctd/parse.py:76-86). The oracle
    // skips the same 3 comment lines positionally (DuckDB 1.0 has no
    // comment option); the engine reader skips them ANYWHERE per the
    // reference's tolerant contract (spec-tested in SourcesSpec).
    QueryDef("q55_src_commented_tsv", (s, _) => {
      SourceSynth.ensure()
      Readers.csvCommentHeader(s, SourceSynth.factsTsv, StructType(Seq(
        StructField("id", IntegerType),
        StructField("label", StringType),
        StructField("weight", DoubleType))))
    }, Some(s"""
      SELECT * FROM read_csv('${SourceSynth.factsTsv}',
        delim='\t', header=false, skip=3,
        columns={'id':'INTEGER','label':'VARCHAR','weight':'DOUBLE'})""")),

    // S6: gzipped CSV — transparent decompression on scan.
    QueryDef("q56_src_gzip_csv", (s, _) => {
      SourceSynth.ensure()
      Readers.csvGz(s, SourceSynth.metricsCsvGz)
    }, Some(s"""
      SELECT * FROM read_csv('${SourceSynth.metricsCsvGz}',
        header=true, all_varchar=true)""")),

    // S10: JSONL with corrupt lines — PERMISSIVE scan keeps one all-null
    // row per bad line instead of failing (reference chembl/parse.py:55-95
    // skips json.loads errors); DuckDB's ignore_errors yields the same
    // null rows, so tolerance itself is hash-checked.
    QueryDef("q57_src_jsonl_corrupt", (s, _) => {
      SourceSynth.ensure()
      Readers.jsonl(s, SourceSynth.eventsJsonl)
        .select(col("id"), col("kind"), col("v"))
    }, Some(s"""
      SELECT id, kind, v FROM read_json('${SourceSynth.eventsJsonl}',
        format='newline_delimited', ignore_errors=true)""")),

    // S11: nested-JSON API document — docs[] explosion + first-of-list
    // field extraction (reference hgnc/parse.py:52-104).
    QueryDef("q58_src_nested_json", (s, _) => {
      SourceSynth.ensure()
      Readers.nestedJsonDocs(s, SourceSynth.apiJson, "response.docs")
        .select(col("id"), col("symbol"),
          element_at(col("alias"), 1).as("first_alias"))
    }, Some(s"""
      SELECT d.id AS id, d.symbol AS symbol, d.alias[1] AS first_alias
      FROM (SELECT unnest(response.docs) AS d
            FROM read_json('${SourceSynth.apiJson}')) t""")),

    // S9: ZIP-of-JSON scan — zip members are walked on the EXECUTOR
    // (binaryFile + flatMap, never driver-side). DuckDB can't open zips,
    // so the oracle regenerates entry names + bodies from the same id
    // arithmetic the fixture writer used — the only way Spark matches is
    // by genuinely unzipping.
    QueryDef("q61_src_zip_json", (s, _) => {
      SourceSynth.ensure()
      Readers.zipOfJson(s, SourceSynth.docsZip)
        .select(col("entry"), col("json"))
    }, Some("""
      SELECT printf('doc_%03d.json', i) AS entry,
        '{"k":' || i || ',"w":"z' || (i % 7) || '"}' AS json
      FROM range(100) t(i)""")),

    // S13: JSON artifact sink ROUNDTRIP — aggregate, write the artifact
    // (coalesce(1), metadata-scale by contract), read it back; the oracle
    // recomputes the aggregate from the source table, so the sink must
    // preserve every value exactly.
    QueryDef("q62_json_artifact", (s, d) => {
      val agg = QueryDef.t(s, d, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), max(col("n_chars")).as("max_chars"))
      val dir = s"${SourceSynth.Dir}/lang_artifact"
      Readers.writeJsonArtifact(agg, dir)
      s.read.json(dir).select(col("lang"), col("n"), col("max_chars"))
    }, Some("""
      SELECT lang, COUNT(*) AS n, MAX(n_chars) AS max_chars
      FROM documents GROUP BY lang""")),

    // S5: tolerant big-TSV scan with QUOTING DISABLED — embedded quote
    // chars stay literal instead of opening a quoted field (the
    // reference's quote_char=None bindingdb contract). Both engines scan
    // the same file with quoting off.
    QueryDef("q68_src_tolerant_tsv", (s, _) => {
      SourceSynth.ensure()
      Readers.csvTolerant(s, SourceSynth.tolerantTsv)
    }, Some(s"""
      SELECT * FROM read_csv('${SourceSynth.tolerantTsv}',
        delim='\t', header=true, quote='', all_varchar=true)""")),

    // S7: space-separated scan (reference string/parse.py:143-149).
    QueryDef("q69_src_space_sep", (s, _) => {
      SourceSynth.ensure()
      Readers.spaceSeparated(s, SourceSynth.spacedTxt)
    }, Some(s"""
      SELECT * FROM read_csv('${SourceSynth.spacedTxt}',
        delim=' ', header=true, all_varchar=true)""")),

    // P1 conditional rename + P4 null-safe ci-regex filter + P15 tolerant
    // cast, over a deliberately "drifty" bronze frame: wrong-case column
    // renamed (absent rename keys ignored), a nullable name column
    // ci-regex-filtered (nulls → false, not error), and a string size
    // column with unparseable values try_cast to null.
    QueryDef("q67_schema_tolerance", (s, d) => {
      val raw = QueryDef.t(s, d, "part").select(
        col("p_partkey"),
        col("p_brand").as("BRAND"),
        when(col("p_partkey") % 10 === 0, lit(null).cast("string"))
          .otherwise(col("p_name")).as("name_nullable"),
        when(col("p_partkey") % 3 === 0,
            concat(lit("x"), col("p_size").cast("string")))
          .otherwise(col("p_size").cast("string")).as("size_str"))
      val renamed = SchemaTools.renameToCanonical(raw,
        Map("BRAND" -> "brand", "absent_col" -> "never_applied"))
      renamed
        .where(SchemaTools.containsCi(col("name_nullable"), "RED"))
        .select(col("p_partkey"), col("brand"),
          SchemaTools.tryCastDouble(col("size_str")).as("size_num"))
    }, Some("""
      SELECT p_partkey, p_brand AS brand,
        CASE WHEN p_partkey % 3 = 0 THEN NULL
             ELSE p_size::DOUBLE END AS size_num
      FROM part
      WHERE p_partkey % 10 != 0 AND lower(p_name) LIKE '%red%'""")),

    // ORC sink + scan ROUNDTRIP (columnar format beside parquet; Spark's
    // built-in ORC source): the full orders table — bigint keys, varchar
    // enums, double prices, a timestamp column — is written to ORC in the
    // per-process fixture root and read back; the oracle scans the
    // ORIGINAL parquet, so any value/type drift through the ORC
    // writer/reader (timestamp epoch handling is the classic one)
    // hash-mismatches. DuckDB cannot read ORC, which is exactly why the
    // roundtrip shape is the right oracle: the engine side is the only
    // thing under test.
    QueryDef("q151_src_orc_roundtrip", (s, d) => {
      SourceSynth.ensure()
      val out = s"${SourceSynth.Dir}/orc_orders"
      QueryDef.t(s, d, "orders").write.mode("overwrite").orc(out)
      s.read.orc(out)
    }, Some("SELECT * FROM orders"))
  )
}
