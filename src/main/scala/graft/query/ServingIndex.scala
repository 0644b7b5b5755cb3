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

  @volatile private var active = true

  /** False once [[unpersist]] has destroyed the broadcast, or the owning
    * SparkContext has stopped — either way the index can no longer serve
    * and [[ServingIndex.loadOrGet]] must rebuild instead of returning it. */
  def isActive: Boolean =
    active && !vertices.sparkSession.sparkContext.isStopped

  def unpersist(): Unit = {
    active = false
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

  /** The reference's `get_store()` shape: ONE index per artifact root,
    * built on first use and reused after — repeated tool calls (or bench
    * passes) must not each pin a fresh cached table pair and leak a
    * broadcast label map.
    *
    * Reuse rule: an entry is served as long as it is still [[ServingIndex.isActive
    * alive]] and belongs to the CURRENT SparkContext — caches and
    * broadcasts live at the context level, so sibling sessions
    * (`spark.newSession()`) share one index rather than destroying each
    * other's broadcasts. An entry is replaced only once it is already
    * unusable (unpersisted, or its context stopped), and the replacement
    * is built BEFORE the old entry is released so a failed rebuild leaves
    * the map unchanged. Within a session the pipeline's manifest-skip
    * keeps the artifact stable; after an intentional recompute, unpersist()
    * the old index (the next loadOrGet then rebuilds — snapshot-aware via
    * [[load]]'s refreshByPath) or call [[load]] directly. `maxEntries`
    * applies when the index is (re)built; a live hit returns the existing
    * index as-is.
    *
    * The slow path holds one coarse companion lock for the build — tool
    * layers call this once per process, and a coarse lock can't stall
    * unrelated map bins the way running Spark jobs inside
    * ConcurrentHashMap.compute would. */
  def loadOrGet(spark: SparkSession, root: String,
      maxEntries: Long = 2000000L): ServingIndex = {
    def usable(e: Entry): Boolean =
      e != null && e.idx.isActive &&
        (e.session.sparkContext eq spark.sparkContext)
    val hit = loaded.get(root)
    if (usable(hit)) hit.idx
    else this.synchronized {
      val cur = loaded.get(root)
      if (usable(cur)) cur.idx
      else {
        val fresh = load(spark, root, maxEntries) // build BEFORE evicting
        if (cur != null) scala.util.Try(cur.idx.unpersist()) // best-effort
        loaded.put(root, Entry(spark, fresh))
        fresh
      }
    }
  }
}
