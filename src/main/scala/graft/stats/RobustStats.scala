package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order statistics that stay EXACT under distribution (the
  * [[Regression]] integer contract) — the two robust per-group summaries
  * a mean/stddev profile misses:
  *
  *   - [[weightedMedian]]: the value splitting the group's WEIGHT mass in
  *     half (lower weighted median: min v with 2·cumw(v) ≥ W) — "median
  *     document length weighted by token count", "median price weighted
  *     by volume" — where the unweighted median answers the wrong
  *     question;
  *   - [[mode]]: the group's most frequent value, ties broken toward the
  *     smallest — the categorical "typical value".
  *
  * Both are purely integer/ordinal: weights and counts are exact BIGINT
  * sums, the median pick is an integer comparison (2·cumw ≥ W, never a
  * float half), the mode tie rule is a min — bit-identical in any engine,
  * under any partitioning.
  *
  * Scale shape: both collapse duplicates FIRST with a partial-aggregated
  * groupBy — the window/argmax then runs over (key, DISTINCT value) rows,
  * not raw rows, so a billion-row group with a bounded value domain
  * (cents, codes, lengths) reaches the per-key window at domain size.
  * The windows partition BY KEY (the q20 no-hot-group contract). */
object RobustStats {

  /** (key, w_total, wmedian): lower weighted median of integer `v` under
    * integer weight `w` per key. Weights must be positive (caller
    * contract): zero-weight values are harmless (they can never newly
    * satisfy 2·cumw ≥ W, and the min() pick resolves to the positive
    * value that did) except in an all-zero group, where W = 0 makes every
    * value qualify and the group's minimum is returned; NEGATIVE weights
    * break the cumulative pick outright. */
  def weightedMedian(df: DataFrame, key: Column, v: Column,
      w: Column): DataFrame = {
    val byVal = df
      .select(key.as("key"), v.cast("long").as("v"), w.cast("long").as("w"))
      .groupBy("key", "v").agg(sum("w").as("wv"))
    val perKey = Window.partitionBy("key")
    val cum = byVal
      .withColumn("cum", sum("wv").over(perKey.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("w_total", sum("wv").over(perKey))
    cum.where(col("cum") * 2 >= col("w_total"))
      .groupBy("key")
      .agg(max("w_total").as("w_total"), min("v").as("wmedian"))
  }

  /** (key, mode_v, n): the most frequent `v` per key; equal counts break
    * toward the smallest value. */
  def mode(df: DataFrame, key: Column, v: Column): DataFrame = {
    val c = df.select(key.as("key"), v.as("v"))
      .groupBy("key", "v").agg(count(lit(1)).as("n"))
    val m = c.groupBy("key").agg(max("n").as("n"))
    c.join(m, Seq("key", "n")) // keeps exactly the tied-for-max values
      .groupBy("key")
      .agg(min("v").as("mode_v"), max("n").as("n"))
  }
}
