package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key interval-union coverage (merge overlapping spans, measure what
  * they cover) — the utilization/billing primitive behind "minutes of
  * active session time", "seconds of machine occupancy", "bytes of file
  * actually touched": raw spans overlap (retries, concurrent tabs,
  * double-billed meters) and summing raw durations double-counts exactly
  * where activity is densest.
  *
  * Gaps-and-islands shape (the q122/q173 machinery aimed at spans): sort
  * each key's intervals by start, an interval opens a NEW island iff its
  * start exceeds the running max of all PRIOR ends (a cumulative-max
  * window — per key, bounded, the q20 contract), islands number by a
  * running sum of the open flags, and one aggregate per island yields
  * (min start, max end). Everything integer (epoch micros): coverage is
  * exact, commutative, engine-portable.
  *
  * Order is totalized by (start, tiebreak); the cumulative max is
  * insensitive to tie order (equal starts see the same prior-end set up
  * to ties, whose ends enter the max symmetrically), so coverage is
  * deterministic even on exact start collisions. */
object Intervals {

  /** (key, n_islands, covered): total length of the union of the key's
    * [startUs, endUs) spans plus the merged-island count. Zero/negative-
    * length spans participate (they can bridge nothing but count as
    * islands when isolated — callers filter them if unwanted). */
  def unionCoverage(df: DataFrame, key: Column, startUs: Column,
      endUs: Column, tiebreak: Column): DataFrame = {
    val rows = df.select(key.as("key"), startUs.cast("long").as("s"),
      endUs.cast("long").as("e"), tiebreak.as("tb"))
    val w = Window.partitionBy("key").orderBy("s", "tb")
    val prevMax = max("e").over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    val islands = rows
      .withColumn("open",
        when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum("open").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("key", "island")
      .agg(min("s").as("is"), max("e").as("ie"))
    islands.groupBy("key")
      .agg(count(lit(1)).as("n_islands"),
        sum(greatest(col("ie") - col("is"), lit(0L))).as("covered"))
  }
}
