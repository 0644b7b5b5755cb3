package graft.tools

import org.apache.spark.sql.SparkSession

/** CLI entry for the full KG pipeline — the spark-submit analogue of the
  * reference's `kg-ae stage` driver (reference:src/kg_ae/cli.py): synthesize
  * or resume pages → extract → link → triples → canonicalize → materialize
  * vertices/edges → validate, with per-stage manifests so a killed run
  * resumes from the last committed stage.
  *
  *   spark-submit --class graft.tools.RunPipeline <jar> \
  *     <rootDir> [nPages=100000] [partitions=32] [--dedup-pages]
  *
  * Prints one line per stage: name, rows, skipped, seconds, and a final
  * validation summary. Exit code 0 iff validation passes.
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    // opportunistic janitor pass: long-lived hosts running the pipeline
    // regularly never accumulate dead-owner fixture roots on /tmp
    graft.sources.SourceSynth.cleanStaleRoots()
    val dedup = args.contains("--dedup-pages")
    val pos = args.filterNot(_.startsWith("--")) // flags are position-free
    val root = pos.headOption.getOrElse("/tmp/graft_pipeline")
    val nPages = pos.lift(1).map(_.toLong).getOrElse(100000L)
    val partitions = pos.lift(2).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var ok = true
    try {
      val t0 = System.nanoTime()
      val results = graft.pipeline.Pipeline.run(spark, root, nPages,
        partitions, dedupPages = dedup)
      results.foreach { r =>
        println(f"[pipeline] ${r.stage}%-16s rows=${r.rows}%-10d " +
          f"skipped=${r.skipped}%-5s ${r.elapsedSec}%8.2f s")
      }
      val report = graft.graph.Validator.validate(
        spark.read.parquet(s"$root/vertices"),
        spark.read.parquet(s"$root/edges"))
      println(s"[pipeline] validation: $report")
      println(f"[pipeline] total ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(${nPages} pages → $root)")
      ok = report.ok
    } finally spark.stop() // a sys.exit inside try would skip this
    if (!ok) sys.exit(1)
  }
}
