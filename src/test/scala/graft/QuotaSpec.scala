package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sample.Quota

class QuotaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish corpus: one hot source with most docs, two small ones. */
  private def corpus: DataFrame =
    ((1 to 400).map(i => (i.toLong, "hot", 10 + i % 37)) ++
      (401 to 430).map(i => (i.toLong, "mid", 50 + i % 11)) ++
      (431 to 434).map(i => (i.toLong, "tiny", 1000)))
      .toDF("doc_id", "source", "n_tokens")

  /** The naive selection rule, run driver-side on the SAME md5 priorities
    * the operator uses: order by (pri, id), take while the preceding token
    * sum is < ceil(frac * source total). */
  private def naive(df: DataFrame, frac: Double): Set[Long] = {
    val rows = df.select(col("doc_id"), col("source"), col("n_tokens"),
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long").as("pri"))
      .as[(Long, String, Int, Long)].collect()
    rows.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      val budget = math.ceil(frac * ds.map(_._3.toLong).sum).toLong
      val ordered = ds.sortBy(d => (d._4, d._1)).toSeq
      val pre = ordered.map(_._3.toLong).scanLeft(0L)(_ + _)
      ordered.zip(pre).collect { case (d, p) if p < budget => d._1 }
    }.toSet
  }

  private def run(df: DataFrame, frac: Double, buckets: Int = 256): Set[Long] =
    Quota.selectByTokenBudget(df, "doc_id", "source", col("n_tokens"),
      frac, buckets)
      .select("doc_id").as[Long].collect().toSet

  test("matches the naive running-sum rule exactly") {
    assert(run(corpus, 0.5) == naive(corpus, 0.5))
    assert(run(corpus, 0.1) == naive(corpus, 0.1))
  }

  test("bucket count and partition layout never change membership") {
    val expected = naive(corpus, 0.3)
    for (b <- Seq(1, 16, 256); p <- Seq(1, 7)) {
      assert(run(corpus.repartition(p), 0.3, b) == expected,
        s"buckets=$b partitions=$p")
    }
  }

  test("budgetFrac >= 1 keeps every doc; a positive budget keeps >= 1 " +
      "doc per source") {
    assert(run(corpus, 1.0).size == 434)
    val tiny = run(corpus, 1e-9)
    val perSource = corpus.select("source").distinct().count()
    assert(tiny.size == perSource) // exactly the first-priority doc of each
  }

  test("raising the budget only ADDS docs (selected set is a prefix)") {
    val s1 = run(corpus, 0.2)
    val s2 = run(corpus, 0.4)
    assert(s1.subsetOf(s2))
  }
}
