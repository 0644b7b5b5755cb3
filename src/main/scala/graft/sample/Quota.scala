package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy per-source token-budget selection: within each source, documents
  * are taken in a deterministic priority order until the source's token
  * budget is exhausted — the "fill each domain's quota, highest-priority
  * first" step of mixture construction, the exact-budget sibling of
  * [[Mixture.sampleToWeights]]'s rate-based sampling (rates hit a budget in
  * expectation; this hits it exactly, to the document).
  *
  * Selection rule (total and engine-portable): order a source's docs by
  * (md5-priority, id); a doc is selected iff the token sum of strictly
  * preceding docs is < budget, where budget = ceil(budgetFrac · source
  * tokens). The first doc to cross the budget is still taken, so any
  * source with a positive budget keeps at least one doc.
  *
  * Scale shape — the naive form is a running-sum window partitioned by
  * source, which serializes a web-hot source (one domain holding half the
  * corpus) onto a single reducer. Instead the priority space is cut into
  * `nBuckets` ORDER-ALIGNED buckets and the budget is located in two
  * levels:
  *   1. a (source × bucket) token histogram — dimension-sized — gives each
  *      source's boundary bucket (first bucket whose running total reaches
  *      the budget) and the token base below it; the running sum ranges
  *      over ≤ nBuckets rows per source, never over documents.
  *   2. docs in buckets BELOW the boundary pass with no ordering at all
  *      (scan-side comparison against the broadcast boundary frame); only
  *      docs INSIDE the boundary bucket — an expected 1/nBuckets of the
  *      source under the uniform md5 — enter an exact within-bucket
  *      running-sum window.
  * Output is provably identical to the naive window: a doc below the
  * boundary has preceding-sum ≤ base < budget; a doc above it has
  * preceding-sum ≥ running-total(boundary) ≥ budget; boundary-bucket docs
  * are resolved exactly with the base added in. The md5 priority makes
  * membership reproducible by any engine and stable under re-partitioning.
  */
object Quota {

  /** Priority space: the first 8 hex chars of md5 → [0, 2^32). */
  private val PrioritySpace = 1L << 32

  private def priority(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** Select each source's docs in (md5-priority, id) order until
    * ceil(budgetFrac · source tokens) tokens are reached (the crossing doc
    * included). Returns (idCol, sourceCol, n_tokens). */
  def selectByTokenBudget(docs: DataFrame, idCol: String, sourceCol: String,
      lenCol: Column, budgetFrac: Double, nBuckets: Int = 256): DataFrame = {
    require(budgetFrac > 0, s"budgetFrac must be positive, got $budgetFrac")
    require(nBuckets > 0 && nBuckets <= PrioritySpace &&
      (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two in [1, 2^32], got $nBuckets")
    // bucket = top bits of the priority: a plain right shift is both
    // order-aligned and integer-typed (Spark's `/` on longs is DOUBLE
    // division, which would make the bucket a float key)
    val shift = 32 - java.lang.Integer.numberOfTrailingZeros(nBuckets)
    val sized = docs.select(col(idCol), col(sourceCol),
      lenCol.cast("long").as("n_tokens"),
      priority(col(idCol)).as("_pri"))
      .withColumn("_bucket", shiftright(col("_pri"), shift))

    // level 1: dimension-sized histogram → boundary bucket + base per source
    val budgets = sized.groupBy(sourceCol)
      .agg(ceil(lit(budgetFrac) * sum("n_tokens").cast("double"))
        .as("_budget"))
    val wBuckets = Window.partitionBy(sourceCol).orderBy("_bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sized.groupBy(col(sourceCol), col("_bucket"))
      .agg(sum("n_tokens").as("_tok_b"))
      .withColumn("_cum", sum("_tok_b").over(wBuckets))
      .join(budgets, sourceCol)
    val boundary = cum.where(col("_cum") >= col("_budget"))
      .groupBy(sourceCol).agg(min("_bucket").as("_b_cut"))
    // base = running total through the bucket just below the boundary
    // (cum is monotone in _bucket, so max over buckets < _b_cut is exact)
    val base = cum.join(boundary, sourceCol)
      .where(col("_bucket") < col("_b_cut"))
      .groupBy(sourceCol).agg(max("_cum").as("_base"))
    val frame = budgets
      .join(boundary, Seq(sourceCol), "left")
      .join(base, Seq(sourceCol), "left")
      .na.fill(0L, Seq("_base")) // dimension-sized; AQE broadcasts it

    // level 2: scan-side pass below the boundary; exact window inside it.
    // A source the histogram never pushed to its budget (_b_cut null —
    // only when budgetFrac ≥ 1) keeps everything.
    val tagged = sized.join(frame, sourceCol)
    val below = tagged
      .where(col("_b_cut").isNull || col("_bucket") < col("_b_cut"))
    val wDocs = Window.partitionBy(sourceCol).orderBy(col("_pri"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val refined = tagged.where(col("_bucket") === col("_b_cut"))
      .withColumn("_pre", coalesce(sum("n_tokens").over(wDocs), lit(0L)))
      .where(col("_base") + col("_pre") < col("_budget"))
    below.select(col(idCol), col(sourceCol), col("n_tokens"))
      .unionByName(
        refined.select(col(idCol), col(sourceCol), col("n_tokens")))
  }
}
