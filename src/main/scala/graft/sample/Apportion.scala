package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Largest-remainder (Hamilton) apportionment — split an integer budget
  * across groups EXACTLY proportionally to their weights, with the
  * rounding error going to the largest fractional remainders:
  *
  *   base_g  = ⌊B·w_g / T⌋          (T = Σ w_g)
  *   leftover R = B − Σ base_g  →  +1 to the R largest remainders
  *
  * This is the training-data mixture primitive [[Quota]] and [[Mixture]]
  * stop short of: "give me a sample/compute budget per source that sums
  * to EXACTLY B" — floor alone undershoots, round drifts, and both leave
  * Σ alloc ≠ B; largest-remainder is the classic fix (seat apportionment,
  * ad pacing, shard-count assignment).
  *
  * EXACTNESS: everything is integer — base is BIGINT floor-division,
  * remainders compare as exact `(B·w_g) mod T`, and the remainder ranking
  * tie-breaks by key ascending, so the allocation is bit-identical in any
  * engine and Σ alloc = B provably (R < #groups by construction of mod).
  * ANSI mode turns B·w_g overflow into a loud error: keep B·max(w) < 2⁶³.
  *
  * Scale shape: ONE partial-aggregated groupBy over the fact table, then
  * everything else happens on the GROUP-cardinality table (sources,
  * languages, shards — dimension-sized BY CONSTRUCTION: an allocation
  * over 10⁹ distinct groups is meaningless). The two scalar joins
  * (total T, leftover R) broadcast 1-row aggregates, and the remainder
  * rank is a count-of-strictly-greater theta self-join on the dimension
  * table — O(G²) comparisons over dimension-sized G, distributed
  * (broadcast nested loop), never an unpartitioned WindowExec that would
  * warn and serialize. */
object Apportion {

  /** (key, weight, alloc) per group, Σ alloc = budget exactly. Groups
    * with zero/negative total weight get base 0 and compete only via
    * remainder 0 (i.e. effectively never). */
  def largestRemainder(df: DataFrame, key: Column, weight: Column,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val groups = df.groupBy(key.as("key"))
      .agg(sum(weight.cast("long")).as("weight"))
    val withTotal = groups.crossJoin(
      broadcast(groups.agg(sum("weight").as("t"))))
    // `div` is BIGINT integral division (Column./ would detour through
    // DOUBLE and lose exactness past 2⁵³)
    val based = withTotal.select(col("key"), col("weight"),
        expr(s"(${budget}L * weight) div t").as("base"),
        pmod(lit(budget) * col("weight"), col("t")).as("rem"))
    val withLeft = based.crossJoin(broadcast(
      based.agg((lit(budget) - sum("base")).as("r"))))
    // rank = 1 + |{groups strictly ahead in (rem desc, key asc) order}| —
    // a theta self-join on the dimension-sized group table
    val ahead = based.select(col("key").as("k2"), col("rem").as("rem2"))
    withLeft.join(broadcast(ahead),
        col("rem2") > col("rem") ||
          (col("rem2") === col("rem") && col("k2") < col("key")),
        "left")
      .groupBy("key", "weight", "base", "r")
      .agg(count(col("k2")).as("n_ahead"))
      .select(col("key"), col("weight"),
        (col("base") + when(col("n_ahead") + 1 <= col("r"), 1L)
          .otherwise(0L)).as("alloc"))
  }
}
