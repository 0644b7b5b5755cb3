package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-depth BFS (multi-source shortest hop count) over an edge list
  * — the KG "n-hop neighborhood with distance" primitive (the unbounded
  * sibling of PathTools' fixed 2-hop expansions).
  *
  * Frontier-expansion shape: each round joins ONLY the current frontier
  * (shrinking, never the visited set) against the edge list on the src
  * key, then anti-joins the visited set so a node's distance is assigned
  * exactly once — min-distance semantics without a min aggregate. Cost is
  * O(maxHops) keyed shuffles; at web scale the frontier join partitions
  * on src like any edge-keyed join (AQE handles hub skew), and the
  * anti-join is a semi-shuffle on the (small) frontier side. Each round's
  * frontier is localCheckpointed: BFS lineage otherwise doubles per round
  * and re-executes every prior join on each action.
  *
  * Determinism: distances are pure graph properties (no tie-breaking
  * needed), so the output is engine-independent — the DuckDB oracle
  * recomputes it as a depth-bounded recursive CTE + min(dist).
  */
object Bfs {

  /** `edges`: (src, dst) directed; `seeds`: (node). Returns (node, dist)
    * for every node reachable within `maxHops` (seeds at dist 0). */
  def hops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be ≥ 0, got $maxHops")
    val e = edges.select(col("src"), col("dst"))
    var visited = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = visited
    var h = 1L
    while (h <= maxHops && !frontier.isEmpty) {
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(h))
        .localCheckpoint()
      visited = visited.unionByName(next)
      frontier = next
      h += 1
    }
    visited
  }
}
