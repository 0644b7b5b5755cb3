package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join — for every left row, the single most recent right row
  * with right.ts ≤ left.ts on the same key (equal timestamps match). The
  * temporal-join primitive Spark lacks natively (events → latest prior
  * state, trades → quotes, clicks → attribution).
  *
  * Shape: NOT a range join. The naive `l JOIN r ON l.key = r.key AND
  * r.ts <= l.ts` + max-per-row explodes quadratically in events-per-key
  * and AQE cannot re-plan it. Instead: union both sides, ONE window per
  * key ordered by (ts, side) carrying the last non-null right payload
  * forward — a sort-merge as-of: one shuffle on the key, O(n log n) per
  * key, no intermediate blow-up. `side` orders right (0) before left (1)
  * at equal ts, which is what makes the ≤ inclusive.
  *
  * PRECONDITION: right must be unique per (key, ts) — dedup-keep-best
  * first (as q98 does) or the carried payload at a tied ts is plan-
  * dependent. NULL semantics are the WINDOW ones, not SQL-join ones:
  * null keys group together and null timestamps sort first (they see no
  * prior payload, and a null-ts right row is visible to every later left
  * row of its key) — filter nulls upstream when join-style null-dropping
  * is required. Skew note: one window partition = one key's full history;
  * for open-ended per-key event counts, range-bucket the time axis and
  * carry each bucket's last payload into the next (two passes) — the
  * standard bounded-memory variant; at this engine's key cardinalities
  * (users, entities) the single-pass form is the right default.
  */
object AsOf {

  /** Returns every left row + the matched right payload columns renamed
    * `prefix + name` (null when no right row precedes). `rightVals` are
    * the right columns to carry; the right timestamp is always carried as
    * `prefix + tsCol`. */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightVals: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val lrow = struct(left.columns.map(col).toIndexedSeq: _*)
    val rv = struct((tsCol +: rightVals).map(col): _*)
    // the carried payload must be a genuinely NULL struct on left rows —
    // struct(null, null, …) is a non-null value with null fields, which
    // last(ignoreNulls) would NOT skip
    val lrowNull = lit(null).cast(left.select(lrow).schema.head.dataType)
    val rvNull = lit(null).cast(right.select(rv).schema.head.dataType)
    val l2 = left.select(col(keyCol).as("_k"), col(tsCol).as("_t"),
      lit(1).as("_side"), lrow.as("_l"), rvNull.as("_r"))
    val r2 = right.select(col(keyCol).as("_k"), col(tsCol).as("_t"),
      lit(0).as("_side"), lrowNull.as("_l"), rv.as("_r"))
    val w = Window.partitionBy("_k").orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(left.columns.map(c => col("_l").getField(c).as(c)) ++
        (tsCol +: rightVals).map(c =>
          col("_m").getField(c).as(prefix + c)): _*)
  }
}
