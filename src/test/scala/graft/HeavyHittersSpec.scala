package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.stats.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish stream: "hot" 300×, "warm" 120×, a 40× mid item, and a long
    * tail of singletons — N = 1460. */
  private def stream: Seq[String] =
    Seq.fill(300)("hot") ++ Seq.fill(120)("warm") ++ Seq.fill(40)("mid") ++
      (0 until 1000).map(i => s"tail$i")

  private def naive(tokens: Seq[String], minFrac: Double): Map[String, Long] = {
    val n = tokens.size
    val thresh = math.ceil(minFrac * n)
    tokens.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= thresh).toMap
  }

  test("matches naive GROUP BY .. HAVING exactly") {
    val got = HeavyHitters.frequentTokens(stream.toDS(), 0.05)
      .as[(String, Long)].collect().toMap
    assert(got == naive(stream, 0.05)) // hot (300) + warm (120) ≥ 73
  }

  test("partition-layout invariance: 1, 7 and 32 partitions agree") {
    val expected = naive(stream, 0.02) // hot, warm, mid (40 ≥ 30)
    Seq(1, 7, 32).foreach { p =>
      val got = HeavyHitters
        .frequentTokens(spark.createDataset(stream).repartition(p), 0.02)
        .as[(String, Long)].collect().toMap
      assert(got == expected, s"at $p partitions")
    }
  }

  test("adversarial spread: a hitter split thinly across partitions is " +
      "still found (pigeonhole superset guarantee)") {
    // 40 occurrences of "spread" interleaved 1-per-chunk across the tail so
    // NO partition sees it concentrated; still ≥ 2% of N
    val tail = (0 until 960).map(i => s"t$i")
    val data = tail.grouped(24).zipWithIndex
      .flatMap { case (chunk, _) => "spread" +: chunk }.toSeq
    val n = data.size // 1000
    val got = HeavyHitters
      .frequentTokens(spark.createDataset(data).repartition(8), 0.02)
      .as[(String, Long)].collect().toMap
    assert(got == Map("spread" -> 40L), s"n=$n got=$got")
  }

  test("boundary: count exactly at ceil(frac*N) is kept, one below is not") {
    // N=100, frac=0.1 → threshold 10
    val data = Seq.fill(10)("at") ++ Seq.fill(9)("below") ++
      (0 until 81).map(i => s"t$i")
    val got = HeavyHitters.frequentTokens(data.toDS(), 0.1)
      .as[(String, Long)].collect().toMap
    assert(got == Map("at" -> 10L))
  }

  test("empty input and bad minFrac are rejected cleanly") {
    assert(HeavyHitters.frequentTokens(Seq.empty[String].toDS(), 0.1)
      .count() == 0)
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentTokens(Seq("a").toDS(), 0.0)
    }
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentTokens(Seq("a").toDS(), 1.0)
    }
  }
}
