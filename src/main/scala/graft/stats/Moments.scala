package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Higher-moment shape statistics from EXACT integer power sums — the
  * distribution-shape profile (is activity front-loaded? heavy-tailed?)
  * that mean/variance monitoring misses:
  *
  *   skewness g₁ = m₃ / m₂^{3/2}   = B / (A·√A)
  *   kurtosis g₂ = m₄ / m₂² − 3    = C / A² − 3
  *
  * with the central-moment numerators expanded to integer power sums
  * (n, Σx, Σx², Σx³, Σx⁴ — all exact BIGINT, commutative under any
  * partitioning, the [[Regression]] contract):
  *
  *   A = n·Σx² − (Σx)²                                  (= n²·m₂)
  *   B = n²·Σx³ − 3n·Σx·Σx² + 2(Σx)³                    (= n³·m₃)
  *   C = n³·Σx⁴ − 4n²·Σx·Σx³ + 6n·(Σx)²·Σx² − 3(Σx)⁴    (= n⁴·m₄)
  *
  * The n-powers cancel exactly in both ratios, so each output is ONE
  * fixed IEEE tree over exact integers (√ is IEEE-correctly-rounded —
  * bit-identical in any engine). OVERFLOW CONTRACT (ANSI-loud): the
  * fourth-power sums demand n·max|x|⁴ < 2⁶³ and 3·(Σ|x|)⁴ < 2⁶³ — fine
  * for bounded codes/hours/small counts; integerize monetary values to
  * COARSE units (not cents) or pre-bucket before asking for kurtosis at
  * web scale.
  *
  * Scale shape: ONE scan, ONE partial-aggregated groupBy — five sums
  * reach the reducer as one tuple per map partition. Degenerate groups
  * (n < 3 for skew / n < 4 for kurtosis, or zero variance) are dropped
  * by the exact integer A, never a float epsilon. */
object Moments {

  /** (key, n, skew, kurt): excess kurtosis; groups with n < 4 or A = 0
    * are dropped. `x` must be an integer-valued expression. */
  def groupSkewKurt(df: DataFrame, key: Column, x: Column): DataFrame = {
    val xs = x.cast("long")
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"), sum(xs).as("sx"),
        sum(xs * xs).as("sxx"), sum(xs * xs * xs).as("sxxx"),
        sum(xs * xs * xs * xs).as("sxxxx"))
      .where(col("n") >= 4 &&
        col("n") * col("sxx") - col("sx") * col("sx") =!= 0)
      .select(col("key"), col("n"),
        {
          val a = (col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double")
          val b = (col("n") * col("n") * col("sxxx")
            - lit(3L) * col("n") * col("sx") * col("sxx")
            + lit(2L) * col("sx") * col("sx") * col("sx")).cast("double")
          (b / (a * sqrt(a))).as("skew")
        },
        {
          val a = (col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double")
          val cNum = (col("n") * col("n") * col("n") * col("sxxxx")
            - lit(4L) * col("n") * col("n") * col("sx") * col("sxxx")
            + lit(6L) * col("n") * col("sx") * col("sx") * col("sxx")
            - lit(3L) * col("sx") * col("sx") * col("sx") * col("sx"))
            .cast("double")
          (cNum / (a * a) - lit(3.0)).as("kurt")
        })
  }
}
