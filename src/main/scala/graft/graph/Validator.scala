package graft.graph

import org.apache.spark.sql.DataFrame
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
      duplicateVertexKeys: Long) {
    def ok: Boolean =
      badNodeTypes == 0 && badKeys == 0 && missingEdgeFields == 0 &&
      orphanEdges == 0 && duplicateVertexKeys == 0
  }

  def validate(vertices: DataFrame, edges: DataFrame): Report = {
    val badTypes = vertices
      .where(!col("node_type").isin(AllowedNodeTypes.toSeq: _*)).count()
    val badKeys = vertices.where(col("key").isNull || col("key") < 1).count()
    val missing = edges.where(
      col("src_type").isNull || col("src_key").isNull ||
      col("dst_type").isNull || col("dst_key").isNull ||
      col("edge").isNull || col("claim_type").isNull ||
      col("dataset").isNull).count()
    val vk = vertices.select(col("node_type"), col("key"))
    // no orphan edges: both endpoints must exist (left_anti == violations)
    val orphanSrc = edges.select(
        col("src_type").as("node_type"), col("src_key").as("key"))
      .join(vk, Seq("node_type", "key"), "left_anti").count()
    val orphanDst = edges.select(
        col("dst_type").as("node_type"), col("dst_key").as("key"))
      .join(vk, Seq("node_type", "key"), "left_anti").count()
    val dupKeys = vertices.groupBy("node_type", "key").count()
      .where(col("count") > 1).count()
    Report(vertices.count(), edges.count(), badTypes, badKeys, missing,
      orphanSrc + orphanDst, dupKeys)
  }

  /** Fail-fast gate (reference build.py:849-854 raises on invalid). */
  def validateOrThrow(vertices: DataFrame, edges: DataFrame): Report = {
    val r = validate(vertices, edges)
    require(r.ok, s"graph validation failed: $r")
    r
  }
}
