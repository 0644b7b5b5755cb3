package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar-spine resampling with forward fill — the time-series
  * regularization primitive behind every "status as of day D" dashboard
  * and every ML feature table built from irregular event logs: events
  * arrive on the days they happen, the consumer needs one row per key per
  * CALENDAR day with the last observed state carried across the gaps.
  *
  * Three-stage shape, each distributed:
  *   1. per (key, day) pick the day's LAST observation — one partial-
  *      aggregated max over a packed integer order key (see below), no
  *      window;
  *   2. build each key's daily spine min(day)..max(day) with `sequence`
  *      + explode — generated rows are proportional to key lifetime, and
  *      the generation is embarrassingly parallel (no shuffle: bounds
  *      come from the same aggregate as stage 1);
  *   3. forward-fill over the spine with `last(_, ignoreNulls)` over a
  *      key-PARTITIONED running window — partitioned by key, so at web
  *      scale the window is an ordinary hash-partitioned sort, never the
  *      single-partition WindowExec trap (the q20 contract).
  *
  * DETERMINISM: "last observation of the day" needs a total order even
  * when timestamps tie, and engines disagree on struct-valued argmax
  * (DuckDB's max_by takes no composite key). The order key is therefore
  * ONE packed BIGINT: `epoch_micros(ts) * 2^b + code` where code < 2^b is
  * the integer state being filled — max(packed) picks the latest
  * timestamp, breaking exact ts ties toward the LARGEST code (documented,
  * deterministic, engine-independent), and `% 2^b` decodes the state.
  * All arithmetic integer; packing overflows only past year ~36,000.
  */
object Resample {

  /** One row per key per calendar day from the key's first to last
    * event day: (key, day, status) where status is the forward-filled
    * code of the day's last event. `code` must be a non-negative integer
    * expression < 2^codeBits; `ts` must be timestamp-castable. */
  def dailyForwardFill(df: DataFrame, key: Column, ts: Column, code: Column,
      codeBits: Int = 3): DataFrame = {
    require(codeBits >= 1 && codeBits <= 16,
      s"codeBits must be in [1,16], got $codeBits")
    val mult = 1L << codeBits
    val t = ts.cast("timestamp")
    val packed = unix_micros(t) * mult + code.cast("long")
    // stage 1+2 bounds from ONE aggregate: last packed obs per (key, day)
    val daily = df
      .select(key.as("key"), t.cast("date").as("day"), packed.as("p"))
      .groupBy("key", "day").agg(max("p").as("p"))
      .select(col("key"), col("day"), pmod(col("p"), lit(mult)).as("code"))
    val bounds = daily.groupBy("key")
      .agg(min("day").as("d0"), max("day").as("d1"))
    val spine = bounds.select(col("key"),
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
        .as("day"))
    spine.join(daily, Seq("key", "day"), "left")
      .select(col("key"), col("day"),
        last(col("code"), ignoreNulls = true).over(
          Window.partitionBy("key").orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("status"))
  }
}
