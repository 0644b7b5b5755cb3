package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structural graph invariants as distributed assertions — the DataFrame
  * recast of `validate_graph` (reference:src/kg_ae/graph/validate.py:20-69),
  * run fail-fast before materialization (build.py:849-854).
  */
object Validator {

  val AllowedNodeTypes: Set[String] = Set(
    "Drug", "Gene", "Pathway", "Disease", "AdverseEvent", "DrugCombination")

  case class Report(
      vertexCount: Long,
      edgeCount: Long,
      badNodeTypes: Long,
      badKeys: Long,
      missingEdgeFields: Long,
      orphanEdges: Long,
      // EXTRA rows beyond the distinct (node_type, key) set — 3 rows
      // sharing one key report 2 (renamed from duplicateVertexKeys, which
      // counted duplicated GROUPS; zero iff keys unique either way)
      duplicateVertexRows: Long) {
    def ok: Boolean =
      badNodeTypes == 0 && badKeys == 0 && missingEdgeFields == 0 &&
      orphanEdges == 0 && duplicateVertexRows == 0
  }

  def validate(vertices: DataFrame, edges: DataFrame): Report = {
    // THREE jobs total — one fused aggregation per table plus one fused
    // orphan anti-join — not one full source scan per invariant (the
    // naive 8-job version re-executed the uncached vertex/edge plans from
    // source for every count; this gate runs on every pipeline build).
    def flag(c: Column): Column = coalesce(sum(when(c, 1L)), lit(0L))
    val v = vertices.agg(
      count(lit(1)).as("n"),
      flag(!col("node_type").isin(AllowedNodeTypes.toSeq: _*)).as("bad_types"),
      flag(col("key").isNull || col("key") < 1).as("bad_keys"),
      // duplicates counted as EXTRA rows beyond the distinct (type, key)
      // set (3 rows sharing one key report 2) — zero iff keys are unique,
      // which is the invariant; struct() keeps null-keyed rows countable
      (count(lit(1)) -
        countDistinct(struct(col("node_type"), col("key")))).as("dups")
    ).head()
    val e = edges.agg(
      count(lit(1)).as("n"),
      flag(
        col("src_type").isNull || col("src_key").isNull ||
        col("dst_type").isNull || col("dst_key").isNull ||
        col("edge").isNull || col("claim_type").isNull ||
        col("dataset").isNull).as("missing")
    ).head()
    val vk = vertices.select(col("node_type"), col("key"))
    // no orphan edges: both endpoints must exist (left_anti == violations);
    // src and dst endpoint sets validate in ONE union + anti-join, and the
    // union keeps duplicates so the count still reports every bad endpoint
    val orphans = edges.select(
        col("src_type").as("node_type"), col("src_key").as("key"))
      .union(edges.select(
        col("dst_type").as("node_type"), col("dst_key").as("key")))
      .join(vk, Seq("node_type", "key"), "left_anti").count()
    Report(v.getLong(0), e.getLong(0), v.getLong(1), v.getLong(2),
      e.getLong(1), orphans, v.getLong(3))
  }

  /** Fail-fast gate (reference build.py:849-854 raises on invalid). */
  def validateOrThrow(vertices: DataFrame, edges: DataFrame): Report = {
    val r = validate(vertices, edges)
    require(r.ok, s"graph validation failed: $r")
    r
  }
}
