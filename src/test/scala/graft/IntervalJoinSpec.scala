package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalJoin

class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic pseudo-random intervals: mixed lengths (including
    * zero-length and bin-straddling), two keys. */
  private def mk(n: Int, keyMod: Int, lenMul: Long): DataFrame =
    (1 to n).map { i =>
      val s = (i * 7919L) % 1000
      (i.toLong, s"k${i % keyMod}", s, s + (i % 13) * lenMul)
    }.toDF("id", "key", "s", "e")

  private def naive(l: DataFrame, r: DataFrame): Set[(Long, Long)] = {
    val ls = l.as[(Long, String, Long, Long)].collect()
    val rs = r.as[(Long, String, Long, Long)].collect()
    (for {
      a <- ls; b <- rs
      if a._2 == b._2 && a._3 <= b._4 && b._3 <= a._4
    } yield (a._1, b._1)).toSet
  }

  private def run(l: DataFrame, r: DataFrame, w: Long): Seq[(Long, Long)] =
    IntervalJoin.overlapJoin(l,
        r.withColumnRenamed("id", "rid").withColumnRenamed("s", "rs")
          .withColumnRenamed("e", "re"),
        Seq("key"), "s", "e", "rs", "re", w)
      .select("id", "rid").as[(Long, Long)].collect().toSeq

  test("matches the naive quadratic overlap join, each pair exactly once") {
    val l = mk(200, 3, 5)
    val r = mk(60, 3, 40)
    val expected = naive(l, r)
    for (w <- Seq(1L, 7L, 64L, 100000L)) {
      val got = run(l, r, w)
      assert(got.size == got.toSet.size, s"duplicate pairs at w=$w")
      assert(got.toSet == expected, s"wrong pair set at w=$w")
    }
  }

  test("zero-length and touching intervals are inclusive (closed bounds)") {
    val l = Seq((1L, "k", 10L, 10L)).toDF("id", "key", "s", "e")
    val r = Seq((1L, "k", 10L, 10L), (2L, "k", 5L, 10L), (3L, "k", 10L, 20L),
      (4L, "k", 11L, 12L)).toDF("id", "key", "s", "e")
    assert(run(l, r, 8L).toSet == Set((1L, 1L), (1L, 2L), (1L, 3L)))
  }

  test("keys partition the match space") {
    val l = Seq((1L, "a", 0L, 100L)).toDF("id", "key", "s", "e")
    val r = Seq((1L, "b", 0L, 100L)).toDF("id", "key", "s", "e")
    assert(run(l, r, 10L).isEmpty)
  }
}
