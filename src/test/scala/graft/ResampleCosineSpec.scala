package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the resample / item-cosine / Pearson batch
  * (q155–q157) beyond the DuckDB hash gate: gap filling and tie-breaking
  * for the spine, the basket cap and normalization direction for the
  * cosine, and the ±1 endpoints for the correlation. */
class ResampleCosineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dailyForwardFill fills calendar gaps and breaks exact ts ties toward the larger code") {
    import spark.implicits._
    val ts = (s: String) => Timestamp.valueOf(s)
    val df = Seq(
      // user 1: events on day 1 and day 4 — days 2,3 must be filled with 2
      (1L, ts("2024-01-01 08:00:00"), 1),
      (1L, ts("2024-01-01 09:00:00"), 2), // later same day wins
      (1L, ts("2024-01-04 10:00:00"), 3),
      // user 2: two events at the IDENTICAL instant — larger code wins
      (2L, ts("2024-02-10 12:00:00"), 5),
      (2L, ts("2024-02-10 12:00:00"), 4)
    ).toDF("u", "ts", "c")
    val got = graft.operators.Resample
      .dailyForwardFill(df, col("u"), col("ts"), col("c")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    assert(got === Map(
      (1L, "2024-01-01") -> 2L, (1L, "2024-01-02") -> 2L,
      (1L, "2024-01-03") -> 2L, (1L, "2024-01-04") -> 3L,
      (2L, "2024-02-10") -> 5L))
  }

  test("cosinePairs matches a naive computation and drops oversized baskets whole") {
    import spark.implicits._
    val rows = Seq(
      // baskets 1..3 of size ≤ 3; basket 9 has 4 items and must be
      // dropped entirely under maxBasket = 3
      1 -> "a", 1 -> "b", 2 -> "a", 2 -> "b", 2 -> "c", 3 -> "b", 3 -> "c",
      9 -> "a", 9 -> "b", 9 -> "c", 9 -> "d",
      1 -> "a" // duplicate must collapse
    ).toDF("basket", "item")
    val got = graft.stats.Itemsets
      .cosinePairs(rows, "basket", "item", maxBasket = 3, minCo = 1)
      .collect()
      .map(r => (r.getString(r.fieldIndex("item_a")),
        r.getString(r.fieldIndex("item_b"))) ->
        ((r.getLong(r.fieldIndex("co")),
          r.getDouble(r.fieldIndex("cosine"))))).toMap
    // kept set: occ(a)=2, occ(b)=3, occ(c)=2; d appears only in basket 9
    val want = Map(
      ("a", "b") -> ((2L, 2.0 / (math.sqrt(2.0) * math.sqrt(3.0)))),
      ("a", "c") -> ((1L, 1.0 / (math.sqrt(2.0) * math.sqrt(2.0)))),
      ("b", "c") -> ((2L, 2.0 / (math.sqrt(3.0) * math.sqrt(2.0)))))
    assert(got.keySet === want.keySet)
    want.foreach { case (k, (c, cos)) =>
      assert(got(k)._1 === c, s"co for $k")
      assert(math.abs(got(k)._2 - cos) < 1e-15, s"cosine for $k")
    }
    // normalization direction: the always-together niche pair (a,c with
    // 1 of min occ) scores 0.5; a and b co-occur twice but b is popular
    assert(math.abs(got(("a", "c"))._2 - 0.5) < 1e-12)
  }

  test("groupPearson hits the ±1 endpoints and drops zero-variance groups") {
    import spark.implicits._
    val df = Seq(
      ("up", 1, 10), ("up", 2, 20), ("up", 3, 30),   // exact r = 1
      ("down", 1, 9), ("down", 2, 6), ("down", 3, 3), // exact r = -1
      ("flat", 1, 5), ("flat", 2, 5),                 // zero y-variance
      ("one", 7, 7)                                   // n = 1
    ).toDF("g", "x", "y")
    val got = graft.stats.Regression
      .groupPearson(df, col("g"), col("x"), col("y")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === Set("up", "down"))
    assert(math.abs(got("up")._2 - 1.0) < 1e-12)
    assert(math.abs(got("down")._2 + 1.0) < 1e-12)
  }
}
