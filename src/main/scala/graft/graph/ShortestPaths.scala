package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop WEIGHTED shortest paths (distributed Bellman–Ford /
  * min-plus iteration) over an edge list — the weighted sibling of
  * [[Bfs]]: hop counts answer "how far", weighted distances answer "how
  * costly" (edge weights here are integer costs: latency, toll,
  * confidence-rank — the KG path-quality primitive behind weighted
  * Drug→AE path search).
  *
  * Frontier-relaxation shape: round r relaxes ONLY edges leaving nodes
  * whose distance improved in round r−1 (the Bellman–Ford frontier
  * optimization) — after the first rounds the frontier collapses to the
  * active wavefront, so late rounds join a small table against the edge
  * list instead of the whole visited set. Each round is one keyed join
  * (frontier onto edges by src; AQE decides broadcast once the frontier
  * shrinks) plus one min-aggregate whose partial aggregation absorbs
  * hub skew map-side. Frontiers and distances are lineage-cut per round,
  * so plan depth is constant at any hop bound.
  *
  * EXACTNESS: weights cast to BIGINT and distances are exact integer
  * sums/mins — commutative, engine-independent, bit-identical under any
  * partitioning (the [[PageRank]] portability contract; min over integers
  * needs no tie-breaking). Semantics: dist(v) = min total weight over
  * directed paths from any seed to v using ≤ maxHops edges — a pure graph
  * property an oracle can recompute by unrolling the same rounds.
  * Negative weights are allowed (the hop bound makes min-plus well-defined
  * without cycle detection); ANSI mode turns any sum overflow into a loud
  * error.
  */
object ShortestPaths {

  /** `edges`: (src, dst, w) directed, long-castable; parallel edges are
    * fine (min wins). `seeds`: (node), distance 0. Returns (node, dist)
    * for every node reachable within `maxHops` edges. */
  def boundedDistances(edges: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"),
        col("w").cast("long").as("w"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("w").isNotNull)
      // parallel edges collapse to their cheapest — fewer relax rows,
      // identical min-plus semantics
      .groupBy("src", "dst").agg(min("w").as("w"))
      .localCheckpoint(true)
    var dist = seeds.select(col("node").cast("long").as("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint(true)
    var frontier = dist
    var h = 0
    while (h < maxHops && !frontier.isEmpty) {
      // relax only from last round's improved nodes
      val cand = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node"), (frontier("dist") + e("w")).as("dist"))
        .groupBy("node").agg(min("dist").as("dist"))
      val next = dist.unionByName(cand)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint(true)
      // a node is frontier iff its distance strictly improved this round
      frontier = next.as("n").join(dist.as("p"), Seq("node"), "left")
        .where(col("p.dist").isNull || col("n.dist") < col("p.dist"))
        .select(col("node"), col("n.dist").as("dist"))
        .localCheckpoint(true)
      dist = next
      h += 1
    }
    dist
  }
}
