package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Edge, Vertex}
import graft.query.ServingIndex

/** S15 serving layer: artifact load, cached tables, broadcast label map,
  * bounded-vocabulary invariant (reference:src/kg_ae/graph/store.py:44-120
  * get_store semantics). */
class ServingIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def v(t: String, k: Long, label: String) =
    Vertex(t, k, label, Map("label" -> label))
  private def e(st: String, sk: Long, dt: String, dk: Long, claim: String,
      freq: Double) =
    Edge(st, sk, dt, dk, "Claim", sk * 1000 + dk, claim, 0.5, freq, claim,
      "fixture", Map.empty, Seq.empty)

  private lazy val vertices = Seq(
    v("Drug", 1, "warfarin"), v("Gene", 1, "VKORC1"),
    v("AdverseEvent", 1, "bleeding")).toDS().toDF()
  private lazy val edges = Seq(
    e("Drug", 1, "Gene", 1, "DRUG_TARGET", 1),
    e("Drug", 1, "AdverseEvent", 1, "DRUG_AE", 9)).toDS().toDF()

  test("build: broadcast label map + cached tables serve tools") {
    val idx = ServingIndex.build(vertices, edges)
    try {
      assert(idx.nodeLabel("Drug", 1).contains("warfarin"))
      assert(idx.nodeLabel("Gene", 1).contains("VKORC1"))
      assert(idx.nodeLabel("Drug", 99).isEmpty)
      assert(idx.vertices.storageLevel.useMemory) // actually cached
      assert(idx.edges.storageLevel.useMemory)
      val r = idx.resolve("Drug", "warfarin").collect()
      assert(r.length == 1)
      val n = idx.neighbors("Drug", 1, "AdverseEvent").collect()
      assert(n.length == 1 && n(0).getAs[String]("label") == "bleeding")
      val p = idx.drugProfile(1).collect()
      assert(p.map(_.getAs[String]("section")).toSeq ==
        Seq("drug", "target", "adverse_event"))
    } finally idx.unpersist()
  }

  test("load: round-trips pipeline-style parquet artifacts") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_serving").toString
    vertices.write.mode("overwrite").parquet(s"$root/vertices")
    edges.write.mode("overwrite").parquet(s"$root/edges")
    val idx = ServingIndex.load(spark, root)
    try {
      assert(idx.nodeLabel("AdverseEvent", 1).contains("bleeding"))
      assert(idx.vertices.count() == 3 && idx.edges.count() == 2)
    } finally idx.unpersist()
  }

  test("loadOrGet: one cached index per artifact root per session") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_serving_once").toString
    vertices.write.mode("overwrite").parquet(s"$root/vertices")
    edges.write.mode("overwrite").parquet(s"$root/edges")
    val a = ServingIndex.loadOrGet(spark, root)
    val b = ServingIndex.loadOrGet(spark, root)
    try {
      // get_store() semantics: the second call must REUSE the first index
      // (same instance — same cached tables + broadcast), not pin a fresh
      // copy per call the way repeated load() would
      assert(a eq b)
      assert(a.nodeLabel("Drug", 1).contains("warfarin"))
    } finally a.unpersist()
    // the unpersisted entry must NOT be served again (its broadcast is
    // destroyed) — the next loadOrGet rebuilds a live index
    val c = ServingIndex.loadOrGet(spark, root)
    try {
      assert(!(c eq a))
      assert(c.isActive && !a.isActive)
      assert(c.nodeLabel("Drug", 1).contains("warfarin"))
    } finally c.unpersist()
  }

  test("bounded-vocabulary invariant fails fast, never silently collects") {
    val ex = intercept[IllegalArgumentException] {
      ServingIndex.build(vertices, edges, maxEntries = 2L)
    }
    assert(ex.getMessage.contains("broadcast cap"))
  }
}
