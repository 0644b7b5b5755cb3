package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's tail-survival contract: the compact headline record
  * printed as the LAST stdout line must parse as JSON and stay far enough
  * under the driver's 2000-byte stdout-tail window that the sbt epilogue
  * line after it can never push the totals + north-rule scaling pair out
  * of the retained tail (rounds 1–4 all shipped parsed:null because only
  * the 4.5 KB full record existed and its head got truncated away). */
class BenchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // worst-plausible field widths: a full double total, every query failed
  // (longest failed_queries list we could ever emit is bounded by the
  // compact form dropping it — use a representative non-empty list), long
  // sf path, 6-digit rates at three levels
  private val failed = (1 to 5).map(i => "\"q%02d_some_query_name\"".format(i))
    .mkString("[", ",", "]")
  private val line = Bench.headlineJson(
    total = 12345.678901234567, timed = 74, totalQ = 80,
    failedJson = failed, passes = 3,
    sfDir = "/root/testdata/sf0.1", aborted = false,
    lowCpus = 2, midCpus = 8, cpus = 32,
    rateLow = "123456.7", rateMid = "1234567.8", rateHigh = "12345678.9",
    effLow = 0.973, effHigh = 0.68)

  test("headline parses as JSON with the fields the driver needs") {
    import spark.implicits._
    val parsed = spark.read.json(Seq(line).toDS)
    assert(parsed.count() == 1)
    val cols = parsed.columns.toSet
    for (c <- Seq("metric", "value", "queries_timed", "queries_total",
        "failed_queries", "scaling_efficiency", "scaling_efficiency_pair",
        "kg_docs_per_sec_2cores", "kg_docs_per_sec_8cores",
        "kg_docs_per_sec_32cores"))
      assert(cols.contains(c), s"missing $c in $line")
    val row = parsed.collect()(0)
    assert(row.getAs[String]("metric") == "total")
    assert(row.getAs[Double]("scaling_efficiency") == 0.973)
    // _corrupt_record would appear if the line were malformed JSON
    assert(!cols.contains("_corrupt_record"), line)
  }

  test("headline + a trailing sbt epilogue line fit a 2000-byte tail") {
    val epilogue =
      "[success] Total time: 2110 s (35:10), completed Aug 17, 2026, 10:54:58 AM\n"
    assert(line.length + 1 + epilogue.length < 1200,
      s"headline too close to the 2000-byte tail window: ${line.length} bytes")
  }

  test("headline carries no per-query maps") {
    assert(!line.contains("\"queries\":") && !line.contains("\"queries_max\":"))
  }
}
