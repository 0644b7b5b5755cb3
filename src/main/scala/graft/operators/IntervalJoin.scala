package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join — every (left, right) pair on the same key whose
  * closed intervals intersect: `l.start ≤ r.end AND r.start ≤ l.end`.
  * The temporal primitive behind "which events fall inside which
  * maintenance / campaign / session windows" that plain equi-joins can't
  * express and Spark would otherwise plan as BroadcastNestedLoop (small
  * right) or a forbidden CartesianProduct (large right).
  *
  * Shape: bin the axis into fixed-width buckets and turn the range
  * predicate into an EQUI-join. Each side explodes to the buckets its
  * interval touches (`sequence(start/W, end/W)`), the join runs on
  * (key…, bucket), and the residual exact predicate keeps true overlaps.
  * Each overlapping pair intersects in a RUN of shared buckets — the
  * output is deduplicated for free by keeping only the bucket containing
  * `greatest(l.start, r.start)` (the first shared one), so no distinct
  * over pair-sized data is ever needed.
  *
  * Scale notes:
  *  - Cost is (interval span / W + 1) replicas per row; size W to the
  *    TYPICAL interval so short intervals land in 1–2 buckets. A long
  *    right interval (days) against a short W replicates it W-fold —
  *    split long intervals into a separate broadcast-predicate leg, or
  *    raise W for that leg; this operator keeps one W for clarity.
  *  - The shuffle key is (key…, bucket) — time-skew (one hot hour) is
  *    spread only if the logical key has cardinality; a keyless join on
  *    one hot bucket is genuine data skew, handled by AQE skew-join on
  *    the exploded sides.
  *  - Both explosions are narrow (`explode` after a projection), so
  *    column pruning still reaches the scans.
  */
object IntervalJoin {

  /** Join `left` and `right` where closed intervals `[lStart, lEnd]` and
    * `[rStart, rEnd]` (long-typed columns, e.g. epoch micros) overlap and
    * the `keyCols` are equal. Returns all left columns plus all right
    * columns (caller projects/renames to taste); bucket plumbing columns
    * are dropped. `binWidth` is in the same units as the bounds. */
  def overlapJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def buckets(s: String, e: String): Column =
      sequence(floor(col(s) / binWidth).cast("long"),
        floor(col(e) / binWidth).cast("long"))
    val l = left.withColumn("_b", explode(buckets(lStart, lEnd)))
    val r = right.withColumn("_b", explode(buckets(rStart, rEnd)))
    val cond = keyCols.map(k => l(k) === r(k))
      .foldLeft(l("_b") === r("_b"))(_ && _) &&
      l(lStart) <= r(rEnd) && r(rStart) <= l(lEnd) &&
      // first-shared-bucket dedup: exactly one exploded pair survives
      floor(greatest(l(lStart), r(rStart)) / binWidth).cast("long") === l("_b")
    val rightKeep = right.columns.filterNot(keyCols.contains)
    l.join(r, cond)
      .select(left.columns.toIndexedSeq.map(l(_)) ++ rightKeep.map(r(_)): _*)
  }
}
