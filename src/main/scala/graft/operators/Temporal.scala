package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Step-function temporal analytics over irregular event logs — the two
  * primitives every telemetry/metering pipeline needs beside
  * [[Resample]]'s calendar spine:
  *
  *   - [[timeWeightedAvg]]: the time-weighted mean of a step signal
  *     ("what was the average price/level/utilization, weighted by how
  *     long each value HELD", not by how often it was sampled) — the
  *     billing/TWAP primitive that plain `avg` gets wrong the moment
  *     sampling is irregular;
  *   - [[debounce]]: collapse rapid-fire repeats (double-clicks, retry
  *     storms, sensor chatter) by dropping any event closer than a gap
  *     to its key's PREVIOUS raw event — the telemetry denoising step
  *     before any downstream count is trustworthy.
  *
  * Both are one key-partitioned ordered window (`lead`/`lag` over the
  * key's own events — partitions are per-user/per-sensor and bounded, the
  * q20/q120 no-hot-group contract: never a global sort, never a
  * single-partition WindowExec) plus, for the average, one partial-
  * aggregated groupBy.
  *
  * EXACTNESS ([[graft.stats.Regression]] contract): timestamps become
  * epoch micros (exact BIGINT), values must arrive integerized (cents,
  * millis — caller supplies the expression so engine and oracle evaluate
  * the SAME tree); Σ value·duration and Σ duration are exact integer sums,
  * the average is ONE IEEE division over them. Window order is totalized
  * by (micros, value) so exact-timestamp ties contribute a deterministic
  * sum (tied rows hold for 0 µs except the tie-group's last, and which
  * row is "last" is pinned by the value tiebreak). ANSI mode turns a
  * Σ v·dur overflow into a loud error: keep max|v| · span_µs < 2⁶³ per
  * key.
  */
object Temporal {

  /** (key, n, twap) per key: twap = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last−t_first)
    * over the key's events ordered by (ts, v) — the last event has no
    * duration and contributes only its timestamp. Keys whose events span
    * zero time (single event, or all at one instant) are dropped (the
    * average is undefined). `v` must be an integer-valued expression. */
  def timeWeightedAvg(df: DataFrame, key: Column, ts: Column,
      v: Column): DataFrame = {
    val rows = df.select(key.as("key"),
      unix_micros(ts.cast("timestamp")).as("us"), v.cast("long").as("v"))
    val w = Window.partitionBy("key").orderBy("us", "v")
    rows
      .withColumn("dur", lead("us", 1).over(w) - col("us"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"),
        sum(col("v") * col("dur")).as("wsum"),
        sum("dur").as("span"))
      .where(col("span") > 0)
      .select(col("key"), col("n"),
        (col("wsum").cast("double") / col("span").cast("double"))
          .as("twap"))
  }

  /** The input rows minus debounced repeats: a row is DROPPED when the
    * previous raw event of the same key (ordered by ts, then `tiebreak` —
    * pass a unique id so the kept ROW SET is fully deterministic) is
    * within `gapMicros`. Note the gap is measured to the previous RAW
    * event, not the previous kept one — a steady storm ticking faster
    * than the gap keeps only its first event, which is the denoising
    * behavior wanted for retry storms (and, unlike kept-relative
    * debounce, needs no iteration). */
  def debounce(df: DataFrame, keyCols: Seq[String], ts: Column,
      tiebreak: Column, gapMicros: Long): DataFrame = {
    require(gapMicros > 0, s"gapMicros must be positive, got $gapMicros")
    val us = unix_micros(ts.cast("timestamp"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(us, tiebreak)
    df.withColumn("_prev_us", lag(us, 1).over(w))
      .where(col("_prev_us").isNull || us - col("_prev_us") > gapMicros)
      .drop("_prev_us")
  }
}
