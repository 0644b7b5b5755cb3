package graft.query

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Artifact-backed serving layer (SURVEY S15; the engine analogue of the
  * reference's `get_store()` singleton, reference:src/kg_ae/graph/
  * store.py:44-120, which loads nodes.json/edges.json once and serves every
  * tool from memory).
  *
  * Spark recast: the materialized vertices/edges parquet (Pipeline stage
  * outputs) load into CACHED DataFrames — scanned once, memory-backed
  * across all subsequent tool calls — plus a driver-built BROADCAST
  * (node_type, key) → label map for O(1) label lookups with no join.
  *
  * Broadcast-safety invariant: the label map is VOCABULARY-bounded
  * (gazetteer-sized — thousands to low millions of entities), never
  * fact-proportional. `maxEntries` enforces that loudly instead of letting
  * a mis-sized vocabulary OOM the driver; edges are never collected. */
final class ServingIndex private (
    val vertices: DataFrame,
    val edges: DataFrame,
    labelMap: Broadcast[Map[(String, Long), String]]) extends Serializable {

  /** O(1) driver/executor-side label lookup (store.node_label analogue). */
  def nodeLabel(nodeType: String, key: Long): Option[String] =
    labelMap.value.get((nodeType, key))

  def resolve(nodeType: String, name: String, limit: Int = 25): DataFrame =
    Tools.resolve(vertices, nodeType, name, limit)

  def neighbors(srcType: String, srcKey: Long, dstType: String,
      k: Int = 100): DataFrame =
    Tools.neighbors(edges, vertices, srcType, srcKey, dstType, k)

  def drugToAePaths(drugKey: Long, aeKey: Long, maxPaths: Int = 10): DataFrame =
    PathTools.drugToAePaths(edges, vertices, drugKey, aeKey, maxPaths)

  def drugDrugInteractions(keyA: Long, keyB: Long, limit: Int = 50): DataFrame =
    PathTools.drugDrugInteractions(edges, vertices, keyA, keyB, limit)

  def drugProfile(drugKey: Long): DataFrame =
    PathTools.drugProfile(edges, vertices, drugKey)

  def unpersist(): Unit = {
    vertices.unpersist()
    edges.unpersist()
    labelMap.destroy()
  }
}

object ServingIndex {

  /** Build from already-loaded graph tables. Caches both; collects ONLY
    * the vertex label triple (bounded by `maxEntries`, fail-fast beyond).
    *
    * The 2M default is sized to the DRIVER HEAP the cap exists to protect:
    * ~2M (type, key) → label entries is a few hundred MB of driver map +
    * broadcast copy — comfortable on a default driver, where the previous
    * 10M default could pass the gate and still OOM during the collect.
    * Raise it only alongside the driver's memory. */
  def build(vertices: DataFrame, edges: DataFrame,
      maxEntries: Long = 2000000L): ServingIndex = {
    val spark = vertices.sparkSession
    // gate BEFORE caching: failing after cache() would leave an oversized
    // table pinned in executor storage for the life of the session
    val n = vertices.count()
    require(n <= maxEntries,
      s"vertex vocabulary ($n) exceeds broadcast cap ($maxEntries) — " +
        "the label map must stay vocabulary-bounded; raise the cap only " +
        "for genuinely small graphs or serve labels by join instead")
    val v = vertices.cache()
    val e = edges.cache()
    import spark.implicits._
    try {
      val labels = v.select("node_type", "key", "label")
        .as[(String, Long, String)].collect()
        .map { case (t, k, l) => (t, k) -> l }.toMap
      new ServingIndex(v, e, spark.sparkContext.broadcast(labels))
    } catch { case t: Throwable =>
      // a failed build must not leave the tables pinned in executor
      // storage with no handle to release them
      v.unpersist(); e.unpersist(); throw t
    }
  }

  /** Load from a Pipeline artifact root (vertices/ + edges/ parquet).
    * Refreshes Spark's path caches first: Pipeline commits via a
    * DRIVER-side atomic rename, which Spark's own write-path cache
    * invalidation never sees — without the refresh, a second load() in
    * the same session after a pipeline recompute would canonicalize to
    * the same cached plan and silently serve the PREVIOUS run's rows. */
  def load(spark: SparkSession, root: String,
      maxEntries: Long = 2000000L): ServingIndex = {
    spark.catalog.refreshByPath(s"$root/vertices")
    spark.catalog.refreshByPath(s"$root/edges")
    build(spark.read.parquet(s"$root/vertices"),
      spark.read.parquet(s"$root/edges"), maxEntries)
  }

  private final case class Entry(session: SparkSession, idx: ServingIndex)
  private val loaded =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** The reference's `get_store()` shape: ONE index per artifact root per
    * session, built on first use and reused after — repeated tool calls
    * (or bench passes) must not each pin a fresh cached table pair and
    * leak a broadcast label map. A superseded entry (new session for the
    * same root) is unpersisted before being replaced. Within a session
    * the pipeline's manifest-skip keeps the artifact stable; after an
    * intentional recompute, call [[load]] directly (snapshot-aware via
    * refreshByPath) or unpersist() the old index first. */
  def loadOrGet(spark: SparkSession, root: String,
      maxEntries: Long = 2000000L): ServingIndex =
    loaded.compute(root, (_, old) =>
      if (old != null && (old.session eq spark)) old
      else {
        if (old != null)
          scala.util.Try(old.idx.unpersist()) // stale session: best-effort
        Entry(spark, load(spark, root, maxEntries))
      }).idx
}
