package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Edge, Vertex}
import graft.query.Tools

/** Mirrors the reference's DDI fixture suite
  * (reference:tests/test_ddi.py:23-137): tiny hand-built graph, exact
  * assertions on traversal/intersection/resolution semantics. */
class ToolsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def v(t: String, k: Long, label: String) =
    Vertex(t, k, label, Map("label" -> label))
  private def e(st: String, sk: Long, dt: String, dk: Long, claim: String,
      freq: Double, strength: Double = 0.5) =
    Edge(st, sk, dt, dk, "Claim", sk * 1000 + dk, claim, strength, freq,
      claim, "fixture", Map.empty, Seq.empty)

  // 3 drugs, 2 combos, 2 AEs, 2 genes (reference fixture shape)
  private lazy val vertices = Seq(
    v("Drug", 1, "warfarin"), v("Drug", 2, "aspirin"), v("Drug", 3, "ibuprofen"),
    v("DrugCombination", 1, "warfarin + aspirin"),
    v("DrugCombination", 2, "aspirin + ibuprofen"),
    v("AdverseEvent", 1, "bleeding"), v("AdverseEvent", 2, "nausea"),
    v("Gene", 1, "VKORC1"), v("Gene", 2, "PTGS1")
  ).toDS().toDF()

  private lazy val edges = Seq(
    e("Drug", 1, "DrugCombination", 1, "DRUG_IN_COMBINATION", 1),
    e("Drug", 2, "DrugCombination", 1, "DRUG_IN_COMBINATION", 1),
    e("Drug", 2, "DrugCombination", 2, "DRUG_IN_COMBINATION", 1),
    e("Drug", 3, "DrugCombination", 2, "DRUG_IN_COMBINATION", 1),
    e("DrugCombination", 1, "AdverseEvent", 1, "DDI_AE", 12),
    e("DrugCombination", 2, "AdverseEvent", 2, "DDI_AE", 5),
    e("Drug", 1, "Gene", 1, "DRUG_TARGET", 1, 0.9),
    e("Drug", 2, "Gene", 2, "DRUG_TARGET", 1, 0.8),
    e("Gene", 1, "AdverseEvent", 1, "GENE_AE", 1, 0.7),
    e("Drug", 1, "AdverseEvent", 1, "DRUG_AE", 7),
    e("Drug", 1, "AdverseEvent", 1, "DRUG_AE", 9), // dup claim, higher freq
    e("Drug", 1, "AdverseEvent", 2, "DRUG_AE", 3)
  ).toDS().toDF()

  test("resolve: exact beats partial; shortest-label tie-break; bounded") {
    val r = Tools.resolve(vertices, "Drug", "aspirin").collect()
    assert(r.head.getAs[String]("label") == "aspirin")
    val partial = Tools.resolve(vertices, "Drug", "rin").collect()
    assert(partial.map(_.getAs[String]("label")).toSeq ==
      Seq("aspirin", "warfarin")) // both partial; shorter first
    assert(Tools.resolve(vertices, "Drug", "xyz").isEmpty)
  }

  test("resolve: query folds like the gazetteer (no full-mapping length drift)") {
    // label stored as the pipeline's simple fold of "İstanbul" = "istanbul"
    // (8 chars); String.toLowerCase would turn the query into i+U+0307
    // (9 chars) and miss it
    val v = Seq(Vertex("Drug", 1, "istanbul", Map())).toDS().toDF()
    val r = Tools.resolve(v, "Drug", "İstanbul").collect()
    assert(r.map(_.getAs[String]("label")).toSeq == Seq("istanbul"))
    // and the label side folds the same way: a RAW display label
    // ("İstanbul" as stored) must match both its own spelling and the
    // plain-ascii query — Spark's lower() would produce the 9-char full
    // mapping on the label side and miss both
    val raw = Seq(Vertex("Drug", 2, "İstanbul", Map())).toDS().toDF()
    for (query <- Seq("İstanbul", "istanbul")) {
      val hits = Tools.resolve(raw, "Drug", query).collect()
      assert(hits.map(_.getAs[Long]("key")).toSeq == Seq(2L), query)
    }
  }

  test("resolve: partial-match cut has a total order (key tie-break)") {
    // 30 distinct vertices sharing one label, limit 25: without the key
    // tie-break the kept set at the boundary is partition-order luck
    val dup = (1 to 30).map(i => Vertex("Drug", i.toLong, "xaspirinx", Map()))
      .toDS().toDF().repartition(8)
    val r = Tools.resolve(dup, "Drug", "aspirin").collect()
    assert(r.map(_.getAs[Long]("key")).toSeq == (1L to 25L))
  }

  test("resolve: exact ties prefer canonical-id then richer props") {
    // reference _prefer_richer (resolve.py:23-52): same-label candidates —
    // the one with a drugcentral_id wins; among the rest, more props wins
    val dup = Seq(
      Vertex("Drug", 10, "aspirin", Map("label" -> "aspirin")),
      Vertex("Drug", 11, "aspirin",
        Map("label" -> "aspirin", "atc" -> "B01AC06")),
      Vertex("Drug", 12, "aspirin",
        Map("label" -> "aspirin", "drugcentral_id" -> "74"))
    ).toDS().toDF()
    val r = Tools.resolve(dup, "Drug", "aspirin").collect()
    assert(r.map(_.getAs[Long]("key")).toSeq == Seq(12L, 11L, 10L))
    // partial matches keep the shortest-label rule (richness only on exact)
    val mixed = dup.unionByName(Seq(Vertex("Drug", 13, "aspirin plus",
      Map("label" -> "aspirin plus", "drugcentral_id" -> "99"))).toDS().toDF())
    // all partial now ("aspi" matches nothing exactly): richness does NOT
    // apply — shortest label, then key asc
    val partial2 = Tools.resolve(mixed, "Drug", "aspi").collect()
    assert(partial2.map(_.getAs[Long]("key")).toSeq == Seq(10L, 11L, 12L, 13L))
  }

  test("neighbors: dedup-keep-best + ordering (AEs of warfarin)") {
    val r = Tools.neighbors(edges, vertices, "Drug", 1, "AdverseEvent")
      .collect()
    assert(r.length == 2)
    assert(r(0).getAs[String]("label") == "bleeding")
    assert(r(0).getAs[Double]("frequency") == 9.0) // max of dup claims
    assert(r(0).getAs[Long]("n_claims") == 2)
    assert(r(1).getAs[String]("label") == "nausea")
  }

  test("sharedNeighbors: DDI combo intersection semantics + symmetry") {
    val shared = Tools.sharedNeighbors(edges, "Drug", 1, 2, "DrugCombination")
      .as[Long].collect().toSeq
    assert(shared == Seq(1)) // warfarin+aspirin combo
    val sym = Tools.sharedNeighbors(edges, "Drug", 2, 1, "DrugCombination")
      .as[Long].collect().toSeq
    assert(sym == shared)
    val none = Tools.sharedNeighbors(edges, "Drug", 1, 3, "DrugCombination")
      .collect()
    assert(none.isEmpty)
  }

  test("paths2: drug→gene→AE with decay-scored ordering") {
    val p = Tools.paths2(edges, "Drug", 1, "Gene", "AdverseEvent").collect()
    assert(p.length == 1)
    val score = p(0).getAs[Double]("score")
    assert(math.abs(score - 0.9 * 0.7 * 0.9) < 1e-12)
  }

  test("subgraph: 2-hop frontier from warfarin") {
    val sg = Tools.subgraph(edges, "Drug", 1, hops = 2)
    // hop1: 4 edges out of warfarin; hop2: combo1→AE1 + gene1→AE1
    assert(sg.count() == 6)
  }

  test("evidenceForClaim returns flattened provenance rows") {
    val withEv = Seq(
      graft.model.Edge("Drug", 1, "Gene", 1, "Claim", 42, "DRUG_TARGET",
        0.9, 1.0, "r", "ds", Map.empty, Seq(
          graft.model.Evidence("page", "r1", "http://u/1", "ds", Map.empty),
          graft.model.Evidence("page", "r2", "http://u/2", "ds", Map.empty)))
    ).toDS().toDF()
    val ev = Tools.evidenceForClaim(withEv, 42).collect()
    assert(ev.length == 2)
    assert(ev.map(_.getAs[String]("source_url")).toSet ==
      Set("http://u/1", "http://u/2"))
    assert(Tools.evidenceForClaim(withEv, 99).isEmpty)
  }

  test("policyScore: weights, hop decay, multi-source bonus") {
    val df = Seq(
      (1.0, 2, 1, 1.0), // 2 hops, single source
      (1.0, 2, 3, 1.0), // 2 hops, multi-source bonus
      (0.5, 0, 1, 0.8)  // weighted, no hops
    ).toDF("base", "hops", "nsrc", "w")
    val got = df.select(Tools.policyScore(col("base"), col("hops"),
      col("nsrc"), col("w"))).as[Double].collect()
    assert(math.abs(got(0) - 0.95 * 0.95) < 1e-12)
    assert(math.abs(got(1) - 0.95 * 0.95 * 1.2) < 1e-12)
    assert(math.abs(got(2) - 0.4) < 1e-12)
  }

  test("topKNeighborsAll: batched per-source window top-k") {
    val r = Tools.topKNeighborsAll(edges, 1)
      .where(col("src_type") === "Drug" && col("src_key") === 1
        && col("claim_type") === "DRUG_AE")
      .collect()
    assert(r.length == 1 && r(0).getAs[Double]("frequency") == 9.0)
  }

  test("boundedTopK == single-window top-k on a hot group") {
    import org.apache.spark.sql.expressions.Window
    // one hot source with 500 destinations + a cold one
    val hot = (0 until 500).map(i =>
      ("Drug", 1L, i.toLong, (i % 37).toDouble)) ++
      Seq(("Drug", 2L, 7L, 5.0))
    val df = hot.toDF("src_type", "src_key", "dst_key", "frequency")
    val naive = df.withColumn("rank", row_number().over(
        Window.partitionBy(col("src_type"), col("src_key"))
          .orderBy(col("frequency").desc, col("dst_key").asc)))
      .where(col("rank") <= 10)
      .select("src_key", "dst_key", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val bounded = Tools.boundedTopK(df, Seq("src_type", "src_key"),
        Seq(col("frequency").desc, col("dst_key").asc), 10, col("dst_key"))
      .select("src_key", "dst_key", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(bounded == naive)
  }
}
