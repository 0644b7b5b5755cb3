package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group simple linear regression (ordinary least squares, closed
  * form) — the "fit a trend line inside every group" analytics primitive
  * (price-vs-quantity elasticity per product, signal-strength drift per
  * quarter, tokens-vs-documents growth per source):
  *
  *   slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *   intercept = (Σy − slope·Σx) / n
  *
  * EXACTNESS CONTRACT: x and y must be (castable to) integers — the five
  * sufficient statistics (n, Σx, Σy, Σxy, Σx²) are then exact 64-bit sums,
  * commutative under any partitioning, and the two outputs are each ONE
  * fixed IEEE-754 expression tree over those exact integers — bit-identical
  * in any engine (the [[graft.quality.UnigramLm]] portability contract).
  * Float x/y would make the sums order-dependent; callers with monetary
  * doubles convert to cents first (`round(p*100)` — the same expression in
  * engine and oracle). ANSI mode turns a Σxy overflow into a loud
  * ARITHMETIC_OVERFLOW: keep n·max|x·y| < 2⁶³ per group.
  *
  * Scale shape: ONE scan, ONE partial-aggregated groupBy — the sufficient
  * statistics are classic map-side-combinable sums, so a billion-row group
  * reaches the reducer as one 5-tuple per map partition. No window, no
  * second pass, no collect. Degenerate groups (n < 2 or zero x-variance,
  * where the slope is undefined) are filtered AFTER aggregation by the
  * exact integer denominator — never a float-epsilon test.
  */
object Regression {

  /** (key, n, slope, intercept) per group. `x`/`y` are integer-valued
    * expressions (see exactness contract). Groups with fewer than 2 rows
    * or all-equal x are dropped (undefined slope). */
  def groupLeastSquares(df: DataFrame, key: Column, x: Column,
      y: Column): DataFrame = {
    val xs = x.cast("long")
    val ys = y.cast("long")
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"), sum(xs).as("sx"), sum(ys).as("sy"),
        sum(xs * ys).as("sxy"), sum(xs * xs).as("sxx"))
      .where(col("n") >= 2 &&
        col("n") * col("sxx") - col("sx") * col("sx") =!= 0L)
      .select(col("key"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("slope"),
        ((col("sy").cast("double") -
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
            * col("sx").cast("double")) / col("n").cast("double"))
          .as("intercept"))
  }

  /** Per-group Pearson correlation coefficient, same exactness contract
    * as [[groupLeastSquares]] (integer x/y, exact sufficient statistics,
    * one IEEE tree per output):
    *
    *   r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))
    *
    * Adds Σy² to the statistics, so the per-group overflow bound
    * tightens to n·max(Σx², Σy²) < 2⁶³. Groups where either variance is
    * zero (r undefined) are dropped by the exact integer denominators.
    * Returns (key, n, r). One scan, one partial-aggregated groupBy. */
  def groupPearson(df: DataFrame, key: Column, x: Column,
      y: Column): DataFrame = {
    val xs = x.cast("long")
    val ys = y.cast("long")
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"), sum(xs).as("sx"), sum(ys).as("sy"),
        sum(xs * ys).as("sxy"), sum(xs * xs).as("sxx"),
        sum(ys * ys).as("syy"))
      .where(col("n") >= 2 &&
        col("n") * col("sxx") - col("sx") * col("sx") =!= 0L &&
        col("n") * col("syy") - col("sy") * col("sy") =!= 0L)
      .select(col("key"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy"))
              .cast("double")))).as("r"))
  }
}
