package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the shape-statistics batch (q172–q175): closed-form
  * skew/kurtosis endpoints and a naive-reference check, and the streak
  * run-splitting rule. */
class MomentsStreakSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("groupSkewKurt: symmetric data has skew 0; a fair two-point has kurt -2") {
    import spark.implicits._
    val df = (
      // key 1: symmetric around 5 → skew exactly 0 (B = 0 integer-exact)
      Seq((1L, 2L), (1L, 5L), (1L, 8L), (1L, 5L)) ++
      // key 2: fair two-point {0,1} × 4 → excess kurtosis exactly −2
      Seq((2L, 0L), (2L, 1L), (2L, 0L), (2L, 1L)) ++
      // key 3: zero variance → dropped by the exact integer A
      Seq((3L, 7L), (3L, 7L), (3L, 7L), (3L, 7L)) ++
      // key 4: n = 3 < 4 → dropped
      Seq((4L, 1L), (4L, 2L), (4L, 9L))
    ).toDF("k", "x")
    val got = graft.stats.Moments
      .groupSkewKurt(df, col("k"), col("x")).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L)._1 === 0.0) // B integer-0 → exact
    assert(got(2L)._2 === -2.0) // C/A² = 1 exactly on {0,1} counts
  }

  test("groupSkewKurt equals the naive moment formulas on an asymmetric fixture") {
    import spark.implicits._
    val xs = Seq(1L, 1L, 1L, 2L, 3L, 10L)
    val got = graft.stats.Moments
      .groupSkewKurt(xs.map((9L, _)).toDF("k", "x"), col("k"), col("x"))
      .collect()(0)
    val n = xs.size.toLong
    val (sx, sxx, sxxx, sxxxx) = (xs.sum, xs.map(x => x * x).sum,
      xs.map(x => x * x * x).sum, xs.map(x => x * x * x * x).sum)
    val a = (n * sxx - sx * sx).toDouble
    val b = (n * n * sxxx - 3 * n * sx * sxx + 2 * sx * sx * sx).toDouble
    val c = (n * n * n * sxxxx - 4 * n * n * sx * sxxx
      + 6 * n * sx * sx * sxx - 3 * sx * sx * sx * sx).toDouble
    assert(got.getDouble(2) === b / (a * math.sqrt(a)))
    assert(got.getDouble(3) === c / (a * a) - 3.0)
    assert(got.getDouble(2) > 1.0) // the 10 drags the tail right
  }

  test("streak runs split on type change, order totalized by (ts, id)") {
    import spark.implicits._
    import java.sql.Timestamp
    val ts = (i: Int) => new Timestamp(1700000000000L + i * 1000L)
    val df = Seq(
      (1L, ts(1), 10L, "a"), (1L, ts(2), 11L, "a"), (1L, ts(3), 12L, "a"),
      (1L, ts(4), 13L, "b"), (1L, ts(5), 14L, "a"), // a-run restarts at 1
      // exact ts tie: event_id orders (b first, then a) → runs b,a
      (2L, ts(1), 20L, "b"), (2L, ts(1), 21L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val got = df
      .withColumn("chg",
        when(lag("event_type", 1).over(w).isNull ||
          col("event_type") =!= lag("event_type", 1).over(w), 1L)
          .otherwise(0L))
      .withColumn("run", sum("chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("run"))
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max("len").as("max_streak"), count(lit(1)).as("n_runs"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((3L, 3L)), 2L -> ((1L, 2L))))
  }
}
