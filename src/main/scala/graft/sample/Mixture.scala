package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Data-mixture sampling for pre-training corpora: down-sample each source
  * to hit target mixture weights under a global token budget — the
  * source-weighting step every large-scale training-data pipeline runs
  * (The Pile / LLaMA-style mixture tables).
  *
  * Determinism contract: acceptance is a pure function of the document id
  * via the portable md5 hash ([[TextFunctions.hashBucket]] — recomputable
  * by any engine), NEVER `rand()`. Membership is reproducible outside
  * Spark, stable under re-partitioning and re-ordering, and monotone in
  * the rate: raising a source's budget only ADDS documents, it never swaps
  * the already-sampled set (the property incremental corpus rebuilds
  * need).
  *
  * Scale shape: the per-source token totals and the rate table are
  * source-cardinality-sized (dimension frames); the corpus side is ONE
  * scan + a join against that tiny frame (hint-free — AQE broadcasts it
  * from its true runtime size) + a scan-side hash filter. No
  * data-proportional shuffle at any corpus size.
  */
object Mixture {

  /** Acceptance granularity: rates are quantized to 1/10⁶ by integer
    * threshold so the engine-portable comparison is exact (no float
    * equality at the boundary). */
  val RateBuckets = 1000000

  /** Sample `docs` so each source contributes ≈ its normalized weight of
    * `budgetFrac` × total corpus tokens. Per-source acceptance rate:
    * min(1, wₛ/Σw × budgetFrac × totalTokens / tokensₛ); a source absent
    * from `weights` gets weight 0 (the inner join IS the gate). Returns
    * the accepted rows: (idCol, sourceCol, n_tokens).
    *
    * `weights` must have columns (sourceCol, weight); `lenCol` is any
    * integral per-row token count. */
  def sampleToWeights(docs: DataFrame, idCol: String, sourceCol: String,
      lenCol: Column, weights: DataFrame, budgetFrac: Double): DataFrame = {
    require(budgetFrac > 0, s"budgetFrac must be positive, got $budgetFrac")
    val sized = docs.select(col(idCol), col(sourceCol),
      lenCol.cast("long").as("n_tokens"))
    val perSource = sized.groupBy(sourceCol)
      .agg(sum("n_tokens").as("_tok"))
    val total = perSource.agg(sum("_tok").as("_T"))
    val wsum = weights.agg(sum("weight").as("_wsum"))
    // all dimension-sized: sources × 1 × 1 rows
    val rates = perSource
      .join(weights, sourceCol).crossJoin(total).crossJoin(wsum)
      // operand order/associativity pinned LEFT-TO-RIGHT and mirrored
      // verbatim by the SQL oracle — IEEE double ops are deterministic,
      // so identical expression trees give bit-identical rates
      .withColumn("_rate", least(lit(1.0),
        col("weight").cast("double") / col("_wsum").cast("double")
          * lit(budgetFrac) * col("_T").cast("double")
          / col("_tok").cast("double")))
      .select(col(sourceCol),
        floor(col("_rate") * RateBuckets).cast("long").as("_thr"))
    sized.join(rates, sourceCol)
      .where(TextFunctions.hashBucket(col(idCol), RateBuckets) < col("_thr"))
      .select(col(idCol), col(sourceCol), col("n_tokens"))
  }

  /** Stratified fixed-size sample: exactly min(k, |group|) rows per group,
    * chosen by the md5 hash of the row id — a deterministic uniform draw
    * with the same engine-portability contract as [[sampleToWeights]]
    * (recomputable anywhere, stable under re-partitioning; k→k+1 only adds
    * rows). Order within a group is (hashBucket(id), id): the id tiebreak
    * makes it total, which [[graft.query.Tools.boundedTopK]] requires.
    *
    * Scale shape: rides boundedTopK's two-level rank, so a web-scale hot
    * group (one source holding most of the corpus) spreads over 64 bucket
    * partitions at level 1 and only ≤64k pre-ranked survivors reach the
    * per-group window — never a full group on one reducer. */
  def sampleKPerGroup(df: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    graft.query.Tools.boundedTopK(df, Seq(groupCol),
      Seq(TextFunctions.hashBucket(col(idCol), RateBuckets).asc,
        col(idCol).asc),
      k, col(idCol))
  }
}
