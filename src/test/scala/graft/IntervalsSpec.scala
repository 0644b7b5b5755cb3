package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for interval-union coverage (q185): merge rules
  * (overlap merges, touching merges — [a,b) ∪ [b,c) has no gap — disjoint
  * splits), no double-counting vs the naive duration sum, and
  * containment. */
class IntervalsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("unionCoverage merges overlapping and touching spans, splits on gaps") {
    import spark.implicits._
    val df = Seq(
      // key 1: [0,10) ∪ [5,15) ∪ [15,20) = one island [0,20); [30,35)
      // is a second island → covered 20 + 5 = 25, not the naive 30
      (1L, 0L, 10L, 1L), (1L, 5L, 15L, 2L), (1L, 15L, 20L, 3L),
      (1L, 30L, 35L, 4L),
      // key 2: containment — [0,100) swallows [10,20) → covered 100
      (2L, 0L, 100L, 1L), (2L, 10L, 20L, 2L),
      // key 3: exact duplicate spans collapse to one island
      (3L, 7L, 9L, 1L), (3L, 7L, 9L, 2L)
    ).toDF("k", "s", "e", "id")
    val got = graft.operators.Intervals
      .unionCoverage(df, col("k"), col("s"), col("e"), col("id"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((2L, 25L)), 2L -> ((1L, 100L)),
      3L -> ((1L, 2L))))
  }

  test("unionCoverage is deterministic under start-time ties and out-of-order input") {
    import spark.implicits._
    // two spans starting together with different ends, fed in both
    // orders — coverage must be max-end either way
    val a = Seq((1L, 0L, 5L, 1L), (1L, 0L, 9L, 2L), (1L, 4L, 6L, 3L))
    val got = Seq(a, a.reverse).map { rows =>
      graft.operators.Intervals
        .unionCoverage(rows.toDF("k", "s", "e", "id"), col("k"),
          col("s"), col("e"), col("id"))
        .collect()(0)
    }
    got.foreach { r =>
      assert(r.getLong(1) === 1L && r.getLong(2) === 9L)
    }
  }
}
