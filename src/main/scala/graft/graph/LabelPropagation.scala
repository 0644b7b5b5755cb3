package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by synchronous label propagation (Raghavan et al.
  * 2007) over an undirected edge list: every node starts labeled with its
  * own id; each round it adopts the most frequent label among its
  * neighbors, ties broken by the SMALLEST label. Synchronous rounds +
  * the deterministic tie rule make the result a pure function of the
  * graph — the async/random-order variant of the paper trades that for
  * faster convergence, the wrong trade for a reproducible pipeline.
  *
  * All arithmetic is integer (label ids, counts), so the rounds are
  * bit-identical in any engine under any partitioning — an external
  * oracle can unroll the same rounds in SQL and hash-match.
  *
  * Scale shape (10¹²-page web graph, same contract as [[PageRank]]):
  * the symmetrized edge list materializes ONCE behind a lineage cut;
  * each round is one |V|-sized join (labels onto edges by dst) and two
  * hash aggregates. The per-(node, label) count absorbs hub skew in the
  * partial aggregate (a 10⁸-degree hub's neighbors arrive as one partial
  * count per map partition per label), and the argmax is `min_by` over a
  * (−count, label) struct — a hash aggregate, NOT a per-node sort window,
  * so a hot node never serializes on one reducer's sort. Labels are
  * lineage-cut per round: constant-depth plan at any round count.
  */
object LabelPropagation {

  /** `edges` needs long-castable (src, dst) columns; the graph is
    * symmetrized internally (each input edge counts once per direction;
    * multi-edges weight the vote — consistent, documented). Returns
    * (node, label) for every distinct endpoint after `iters` rounds.
    */
  def run(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e0 = edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
    val und = e0.union(e0.select(col("dst").as("src"),
      col("src").as("dst"))).localCheckpoint(true)
    val nodes = und.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    var labels = nodes.withColumn("label", col("node"))
    (1 to iters).foreach { _ =>
      val votes = und.join(labels, col("dst") === col("node"))
        .groupBy(col("src").as("n"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val next = votes.groupBy(col("n").as("node"))
        .agg(min_by(col("label"),
          struct((-col("cnt")).as("negc"), col("label"))).as("label"))
      // after symmetrization every node has >= 1 neighbor, but keep the
      // isolated-node fallback explicit (own label) for caller edge sets
      labels = nodes.join(next, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("label"), col("node")).as("label"))
        .localCheckpoint(true) // constant-depth plan at any iters
    }
    labels
  }
}
