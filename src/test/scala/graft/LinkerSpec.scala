package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.link.Linker

class LinkerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // "mercury" is ambiguous: planet (id 1) vs element (id 2)
  private lazy val candidates = Seq(
    ("mercury", 1L), ("mercury", 2L), ("zorvex", 3L)).toDF("norm", "entity_id")
  private lazy val contexts = Seq(
    (1L, "planet orbit solar system astronomy sun"),
    (2L, "element metal chemistry toxic thermometer"),
    (3L, "drug dose trial")).toDF("entity_id", "context")

  test("TF-IDF re-ranking disambiguates by context") {
    val pages = Seq(
      ("u1", "the mercury orbit around the sun is small planet talk"),
      ("u2", "mercury is a toxic metal used in a thermometer"),
      ("u3", "mercury mentioned with no context at all")).toDF("url", "text")
    val mentions = Seq(("u1", "mercury"), ("u2", "mercury"), ("u3", "mercury"))
      .toDF("url", "norm")
    val got = Linker.rank(spark, mentions, pages, candidates, contexts)
      .select("url", "entity_id").as[(String, Long)].collect().toMap
    assert(got("u1") == 1L) // astronomy context
    assert(got("u2") == 2L) // chemistry context
    assert(got("u3") == 1L) // zero overlap both → deterministic min id
  }

  test("rarer context tokens weigh more (idf)") {
    // 'system' also appears in candidate 4's context → common token,
    // while 'thermometer' is unique to the element
    val cands = Seq(("mercury", 1L), ("mercury", 2L)).toDF("norm", "entity_id")
    val ctxs = Seq(
      (1L, "system system common"),
      (2L, "thermometer system")).toDF("entity_id", "context")
    val pages = Seq(("u", "a system thermometer reading")).toDF("url", "text")
    val mentions = Seq(("u", "mercury")).toDF("url", "norm")
    val got = Linker.rank(spark, mentions, pages, cands, ctxs)
      .select("entity_id").as[Long].head()
    assert(got == 2L) // unique 'thermometer' idf beats shared 'system'
  }

  test("one winner per (url, surface); deterministic across runs") {
    val pages = Seq(("u1", "planet sun"), ("u2", "metal")).toDF("url", "text")
    val mentions = Seq(("u1", "mercury"), ("u2", "mercury")).toDF("url", "norm")
    val a = Linker.rank(spark, mentions, pages, candidates, contexts)
      .collect().map(_.toString).sorted.toSeq
    val b = Linker.rank(spark, mentions, pages, candidates, contexts)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    assert(a.size == 2)
  }
}
