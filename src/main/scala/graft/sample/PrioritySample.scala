package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted sampling without replacement via priority sampling
  * (Duffield–Lund–Thorup, JACM 2007): each item draws a uniform
  * u ∈ (0, 2^32] from the portable md5 hash of its id and gets priority
  * q = u / w for weight w ≥ 1; the k SMALLEST q per group form the
  * sample, so heavier items are proportionally likelier to be kept. The
  * draw is a pure function of the id — membership is reproducible by any
  * engine (the DuckDB oracle recomputes it from the same md5 bytes) and
  * stable under re-partitioning, unlike rand()-seeded sampling whose
  * per-partition streams reshuffle with the plan.
  *
  * Determinism of q itself: u+1 and w are exact BIGINTs; their quotient
  * is ONE IEEE-correctly-rounded double division — bit-identical in every
  * engine. Scale: the per-group top-k rides
  * [[graft.query.Tools.boundedTopK]] (two-level rank), so a web-hot group
  * never serializes on a single window partition; (q, id) is a total
  * order because ids are unique.
  */
object PrioritySample {

  /** Uniform draw in [1, 2^32]: first 8 md5 hex chars + 1 (the +1 avoids
    * a zero priority for weight-∞-like behavior). */
  def uniformDraw(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") +
      lit(1L)

  /** k lowest-priority rows per group; adds `pri` (the u/w draw) and
    * `rank` (1-based within group). `weight` must be ≥ 1 and integral
    * (exact in BIGINT); `idCol` must be unique. */
  def sample(df: DataFrame, groupCols: Seq[String], idCol: String,
      weight: Column, k: Int): DataFrame = {
    val pri = (uniformDraw(col(idCol)).cast("double") /
      weight.cast("double")).as("pri")
    graft.query.Tools.boundedTopK(
      df.withColumn("w", weight).withColumn("pri", pri),
      groupCols, Seq(col("pri").asc, col(idCol).asc), k, col(idCol))
  }
}
