package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Edge, Evidence, Vertex}
import graft.query.PathTools

/** Fixture tests for the mechanistic-path / DDI / mechanism / profile /
  * subgraph tools, in the reference's test style (reference:tests/
  * test_ddi.py:23-137, tests/test_paths semantics from
  * src/kg_ae/tools/paths.py:56-159): tiny hand-built graph, exact ranked
  * assertions. The Disease "Bleeding" vs AdverseEvent "bleeding" pair
  * exercises the J8 cross-ontology label-equality join (case+trim
  * insensitive). */
class PathToolsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def v(t: String, k: Long, label: String) =
    Vertex(t, k, label, Map("label" -> label))
  private def e(st: String, sk: Long, dt: String, dk: Long, claim: String,
      freq: Double, strength: Double = 0.5,
      meta: Map[String, String] = Map.empty,
      ev: Seq[Evidence] = Seq.empty) =
    Edge(st, sk, dt, dk, "Claim",
      sk * 100000 + dk * 100 + claim.hashCode.abs % 97, claim, strength,
      freq, claim, "fixture", meta, ev)

  private lazy val vertices = Seq(
    v("Drug", 1, "warfarin"), v("Drug", 2, "aspirin"),
    v("Drug", 3, "ibuprofen"),
    v("Gene", 1, "VKORC1"), v("Gene", 2, "PTGS1"),
    v("Disease", 1, "Bleeding "), // case+trailing space: J8 must still match
    v("Disease", 2, "ulcer"),
    v("AdverseEvent", 1, "bleeding"), v("AdverseEvent", 2, "nausea"),
    v("Pathway", 1, "coagulation"),
    v("DrugCombination", 1, "aspirin + warfarin"),
    v("DrugCombination", 2, "aspirin + ibuprofen")
  ).toDS().toDF()

  private lazy val edges = Seq(
    e("Drug", 1, "Gene", 1, "DRUG_TARGET", 1, 0.9),
    e("Drug", 2, "Gene", 2, "DRUG_TARGET", 1, 0.8),
    e("Gene", 1, "Disease", 1, "GENE_DISEASE", 1, 0.6),
    e("Gene", 1, "Disease", 2, "GENE_DISEASE", 1, 0.4),
    e("Gene", 1, "Pathway", 1, "GENE_PATHWAY", 1, 0.9),
    e("Gene", 2, "Pathway", 1, "GENE_PATHWAY", 1, 0.9),
    e("Drug", 1, "AdverseEvent", 1, "DRUG_AE", 9, 0.7),
    e("Drug", 1, "DrugCombination", 1, "DRUG_IN_COMBINATION", 1),
    e("Drug", 2, "DrugCombination", 1, "DRUG_IN_COMBINATION", 1),
    e("Drug", 2, "DrugCombination", 2, "DRUG_IN_COMBINATION", 1),
    e("Drug", 3, "DrugCombination", 2, "DRUG_IN_COMBINATION", 1),
    e("DrugCombination", 1, "AdverseEvent", 1, "DDI_AE_TWOSIDES", 12, 0.5,
      Map("prr" -> "3.5")),
    e("DrugCombination", 2, "AdverseEvent", 2, "DDI_AE_TWOSIDES", 5, 0.4),
    e("Drug", 1, "Drug", 1, "DRUG_LABEL", 2, 1.0,
      Map("brand_name" -> "warfarin"),
      Seq(Evidence("label", "u1", "http://u/1", "fixture",
        Map("adverse_reactions" -> "warfarin causes bleeding",
          "indications" -> "clot prevention"))))
  ).toDS().toDF()

  test("drugToAePaths: direct first, then label-equality two-hop (J8)") {
    val p = PathTools.drugToAePaths(edges, vertices, 1, 1).collect()
    assert(p.length == 2)
    // direct: score = frequency (9), hops 1, evidence 1
    assert(p(0).getAs[Int]("hops") == 1)
    assert(p(0).getAs[Double]("score") == 9.0)
    assert(p(0).getAs[Int]("evidence_count") == 1)
    // two-hop Drug→VKORC1→"Bleeding " matched to AE "bleeding":
    // score = 0.6 × 0.9, hops 3, evidence 2
    assert(p(1).getAs[Int]("hops") == 3)
    assert(math.abs(p(1).getAs[Double]("score") - 0.54) < 1e-12)
    assert(p(1).getAs[Long]("gene_key") == 1L)
    assert(p(1).getAs[String]("ae_label") == "bleeding")
    // aspirin (drug 2): no direct edge, PTGS1 has no disease → no paths
    assert(PathTools.drugToAePaths(edges, vertices, 2, 1).isEmpty)
  }

  test("mechanisticContext: pathway + disease exploration paths, ranked") {
    val p = PathTools.mechanisticContext(edges, vertices, 1).collect()
    val kinds = p.map(r => (r.getAs[String]("path_kind"),
      r.getAs[String]("end_label"), r.getAs[Double]("score"))).toSeq
    assert(kinds == Seq(
      ("drug_gene_pathway", "coagulation", 0.8),
      ("drug_gene_disease", "Bleeding ", 0.6),
      ("drug_gene_disease", "ulcer", 0.4)))
  }

  test("scoreBreakdown: length penalty + multi-source bonus arithmetic") {
    val paths = Seq((1.0, 3, 2), (0.5, 1, 1)).toDF("score", "hops",
      "evidence_count")
    val b = PathTools.scoreBreakdown(paths).orderBy(col("hops").desc).collect()
    assert(math.abs(b(0).getAs[Double]("final_score")
      - 1.0 * math.pow(0.95, 3) * 1.2) < 1e-12)
    assert(math.abs(b(1).getAs[Double]("final_score") - 0.5 * 0.95) < 1e-12)
    // minEvidence gate drops rows
    assert(PathTools.scoreBreakdown(paths, minEvidence = 2).count() == 1)
  }

  test("drugDrugInteractions: combo intersection → AE fan-out, prr-ranked") {
    val ddi = PathTools.drugDrugInteractions(edges, vertices, 1, 2).collect()
    assert(ddi.length == 1)
    assert(ddi(0).getAs[String]("ae_label") == "bleeding")
    assert(ddi(0).getAs[Double]("prr") == 3.5) // meta prr wins over strength
    // symmetric + disjoint pairs
    assert(PathTools.drugDrugInteractions(edges, vertices, 2, 1)
      .collect().length == 1)
    assert(PathTools.drugDrugInteractions(edges, vertices, 1, 3).isEmpty)
  }

  test("drugDrugInteractionsAll: every sharing pair in one pass") {
    val all = PathTools.drugDrugInteractionsAll(edges, vertices)
      .orderBy("drug_a_key", "drug_b_key").collect()
    assert(all.map(r => (r.getAs[Long]("drug_a_key"),
      r.getAs[Long]("drug_b_key"), r.getAs[String]("ae_label"))).toSeq ==
      Seq((1L, 2L, "bleeding"), (2L, 3L, "nausea")))
    // combo 2's AE has no meta prr → falls back to strength_score
    assert(all(1).getAs[Double]("prr") == 0.4)
  }

  test("expandMechanism: targets then their distinct pathways") {
    val m = PathTools.expandMechanism(edges, vertices, 1).collect()
    assert(m.map(r => (r.getAs[String]("kind"),
      r.getAs[String]("label"))).toSeq ==
      Seq(("target", "VKORC1"), ("pathway", "coagulation")))
    assert(m(0).getAs[Long]("n_claims") == 1L)
  }

  test("expandGeneContext: batched pathways + score-gated diseases") {
    val ctx = PathTools.expandGeneContext(edges, vertices, Seq(1L)).collect()
    // disease "ulcer" (0.4) passes min 0.3; raise the gate → drops
    assert(ctx.map(r => (r.getAs[String]("kind"),
      r.getAs[String]("label"))).toSet ==
      Set(("pathway", "coagulation"), ("disease", "Bleeding "),
        ("disease", "ulcer")))
    val strict = PathTools.expandGeneContext(edges, vertices, Seq(1L), 0.5)
      .where(col("kind") === "disease").collect()
    assert(strict.map(_.getAs[String]("label")).toSeq == Seq("Bleeding "))
  }

  test("drugProfile: drug + targets + top AEs in one answer") {
    val p = PathTools.drugProfile(edges, vertices, 1).collect()
    assert(p.map(r => (r.getAs[String]("section"),
      r.getAs[String]("label"))).toSeq ==
      Seq(("drug", "warfarin"), ("target", "VKORC1"),
        ("adverse_event", "bleeding")))
    assert(p(2).getAs[Double]("frequency") == 9.0)
  }

  test("diseaseGenes: reverse lookup with source filter + score gate") {
    val extra = Seq(
      e("Gene", 2, "Disease", 1, "GENE_DISEASE_CTD", 1, 0.9),
      e("Gene", 1, "Disease", 1, "GENE_GENE", 1, 0.95) // wrong claim type
    ).toDS().toDF()
    val all = PathTools.diseaseGenes(edges.unionByName(extra), vertices, 1)
      .collect()
    // ranked by score desc: CTD 0.9 (PTGS1) then opentargets 0.6 (VKORC1)
    assert(all.map(r => (r.getAs[String]("gene_symbol"),
      r.getAs[String]("source"))).toSeq ==
      Seq(("PTGS1", "ctd"), ("VKORC1", "opentargets")))
    val otOnly = PathTools.diseaseGenes(edges.unionByName(extra), vertices, 1,
      sources = Seq("opentargets")).collect()
    assert(otOnly.map(_.getAs[String]("gene_symbol")).toSeq == Seq("VKORC1"))
    assert(PathTools.diseaseGenes(edges, vertices, 1, minScore = 0.7).isEmpty)
  }

  test("geneInteractors: confidence gate + ranked") {
    val withGG = edges.unionByName(Seq(
      e("Gene", 1, "Gene", 2, "GENE_GENE_STRING", 1, 0.8)).toDS().toDF())
    // default claim type is the reference's GENE_GENE_STRING
    val r = PathTools.geneInteractors(withGG, vertices, 1).collect()
    assert(r.length == 1
      && r(0).getAs[String]("interactor_symbol") == "PTGS1")
    assert(PathTools.geneInteractors(withGG, vertices, 1, minScore = 0.9)
      .isEmpty)
    // non-reference claim vocabularies pass theirs explicitly
    val gg = edges.unionByName(Seq(
      e("Gene", 1, "Gene", 2, "GENE_GENE", 1, 0.8)).toDS().toDF())
    assert(PathTools.geneInteractors(gg, vertices, 1).isEmpty)
    assert(PathTools.geneInteractors(gg, vertices, 1,
      claimType = "GENE_GENE").count() == 1)
  }

  test("entityClaims: per-entity claim filter, strongest first") {
    val all = PathTools.entityClaims(edges, "Drug", 1).collect()
    assert(all.length == 4) // target + AE + combo membership + label
    val filtered = PathTools.entityClaims(edges, "Drug", 1,
      Seq("DRUG_AE", "DRUG_TARGET")).collect()
    assert(filtered.map(_.getAs[String]("claim_type")).toSeq ==
      Seq("DRUG_TARGET", "DRUG_AE")) // 0.9 before 0.7
  }

  test("drugLabelSections: payload map explodes into section rows") {
    val s = PathTools.drugLabelSections(edges, vertices, 1)
      .orderBy("section_name").collect()
    assert(s.map(r => (r.getAs[String]("section_name"),
      r.getAs[String]("content"))).toSeq ==
      Seq(("adverse_reactions", "warfarin causes bleeding"),
        ("indications", "clot prevention")))
    val one = PathTools.drugLabelSections(edges, vertices, 1,
      Seq("indications")).collect()
    assert(one.length == 1 && one(0).getAs[String]("brand_name") == "warfarin")
  }

  test("subgraphWithProps: endpoint labels + evidence-weighted scores") {
    val sg = PathTools.subgraphWithProps(edges, vertices, "Drug", 1, hops = 1)
      .orderBy("claim_type").collect()
    val byType = sg.map(r => r.getAs[String]("claim_type") ->
      (r.getAs[String]("src_label"), r.getAs[String]("dst_label"),
        r.getAs[Double]("weight"))).toMap
    assert(byType("DRUG_TARGET") == (("warfarin", "VKORC1", 0.9 * 1.0)))
    assert(byType("DRUG_AE") == (("warfarin", "bleeding", 0.7 * 0.7)))
    // unknown claim type → default 0.5 weight
    assert(byType("DRUG_IN_COMBINATION")._3 == 0.5 * 0.5)
  }

  test("conditionBoostedPaths: matched Disease steps re-rank above higher raw scores") {
    // reference explain_paths (paths.py:161-178): ×1.5 boost for paths
    // whose Disease step is in the patient's condition set, THEN top-k —
    // path via disease 7 (raw 0.6 → 0.9) must displace the raw-0.8 path
    val paths = Seq(
      (1L, 10L, 7L, 0.6), (1L, 11L, 8L, 0.8), (1L, 12L, 9L, 0.4))
      .toDF("drug_key", "gene_key", "disease_key", "score")
    val top = PathTools.conditionBoostedPaths(paths, Seq(7L), topK = 2)
      .collect()
    assert(top.map(_.getAs[Long]("disease_key")).toSeq == Seq(7L, 8L))
    assert(top(0).getAs[Double]("boosted_score") == 0.6 * 1.5)
    assert(top(1).getAs[Double]("boosted_score") == 0.8)
  }
}
