package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion of retrieval result lists (Cormack, Clarke &
  * Büttcher, SIGIR '09) — the standard hybrid-search combiner: each
  * retriever contributes 1/(k0 + rank) for every doc in its top-k list,
  * and the fused score is the sum. Rank-based fusion needs NO score
  * calibration between retrievers (a BM25 score and a cosine live on
  * incomparable scales), which is why RRF is the default hybrid in every
  * production search stack.
  *
  * Scale shape: each input list is a global top-k, which Spark executes as
  * `TakeOrderedAndProject` — per-partition bounded heaps, one k-row merge
  * on the driver side of the exchange, never a full sort (the same plan
  * contract [[graft.query.Tools]] pins for ordered limits). Rank
  * assignment then happens INSIDE the ≤ k rows: one single-group
  * `sort_array(collect_list(...))` + `posexplode` — bounded by k by
  * construction, so no window over an unpartitioned frame (zero
  * WindowExec warnings) and no driver-side collect. The fusion join is
  * k-row × k-row — trivially broadcast.
  *
  * EXACTNESS: ranks are integers from a total order (score DESC, id ASC —
  * ties broken by id); the fused score is the literal two-term IEEE sum
  * 1/(k0+r1) + 1/(k0+r2) with absent-list terms contributing 0.0 — any
  * engine mirroring the tree is bit-identical.
  */
object Fusion {

  /** Top-`k` ranks of `df` by (`score` DESC, `id` ASC): (id, rank) with
    * rank 1-based. The negated-score struct sort gives descending order
    * without a window; float negation is exact, so the tiebreak order is
    * identical to the oracle's ORDER BY score DESC, id. */
  def topkRanks(df: DataFrame, id: Column, score: Column, k: Int): DataFrame =
    df.select(id.as("_id"), score.as("_s"))
      .orderBy(col("_s").desc, col("_id"))
      .limit(k)
      .agg(sort_array(collect_list(struct(negate(col("_s")).as("ns"),
        col("_id").as("i")))).as("xs"))
      .select(posexplode(col("xs")))
      .select(col("col.i").as("id"),
        (col("pos") + 1).cast("long").as("rank"))

  /** Fuse two (id, rank) lists: (id, r1, r2, rrf) for ids in EITHER list
    * (full outer), rrf = Σ 1/(k0 + rank) over the lists containing the
    * id. `k0` = 60 in the original paper. */
  def rrf(ranks1: DataFrame, ranks2: DataFrame, k0: Int): DataFrame =
    ranks1.select(col("id"), col("rank").as("r1"))
      .join(ranks2.select(col("id"), col("rank").as("r2")),
        Seq("id"), "full_outer")
      .select(col("id"), col("r1"), col("r2"),
        (coalesce(lit(1.0) / (lit(k0.toDouble) + col("r1").cast("double")),
            lit(0.0))
          + coalesce(lit(1.0) / (lit(k0.toDouble) + col("r2").cast("double")),
            lit(0.0))).as("rrf"))
}
