package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.quality.UnigramLm

class QualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // tokens chosen so counts are easy to hand-check: "the" appears in every
  // doc, "zzq" only once (hapax), doc 3 is pure boilerplate repetition
  private lazy val docs = Seq(
    (1L, "the cat sat"),
    (2L, "the dog sat here"),
    (3L, "the the the"),
    (4L, "the zzq")).toDF("doc_id", "text")

  private def naive(rows: Seq[(Long, String)],
      model: Map[String, Long]): Map[Long, (Long, Long, Long, Long, Double)] = {
    val t = model.values.sum
    rows.map { case (id, txt) =>
      val toks = txt.split(" ", -1).toSeq
      val cnts = toks.map(model.getOrElse(_, 0L))
      id -> ((toks.size.toLong, cnts.sum, cnts.min,
        cnts.count(_ == 1L).toLong,
        cnts.sum.toDouble / toks.size.toDouble / t.toDouble))
    }.toMap
  }

  private def collectScores(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))).toMap

  test("scoreSelf == naive per-doc unigram stats") {
    val rows = docs.as[(Long, String)].collect().toSeq
    val model = rows.flatMap(_._2.split(" ", -1)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val got = collectScores(
      UnigramLm.scoreSelf(docs, "doc_id", split(col("text"), " ")))
    assert(got == naive(rows, model))
    // hand-checks: corpus T=12; "the"=6 "sat"=2, rest hapax
    assert(got(3L) == ((3L, 18L, 6L, 0L, 18.0 / 3.0 / 12.0)))
    assert(got(4L)._4 == 1L) // zzq is the one hapax token in doc 4
    // boilerplate doc scores HIGHER mean_prob than the hapax doc
    assert(got(3L)._5 > got(4L)._5)
  }

  test("score vs external model: OOV tokens count 0, min_freq 0") {
    val model = Seq(("the", 100L), ("cat", 5L)).toDF("tok", "cnt")
    val got = collectScores(UnigramLm.score(
      docs, "doc_id", split(col("text"), " "), model))
    // doc 1: the(100) cat(5) sat(OOV 0) → sum 105, min 0, no hapax
    assert(got(1L) == ((3L, 105L, 0L, 0L, 105.0 / 3.0 / 105.0)))
    // doc 3: all in-vocab → min_freq is the model count, not 0
    assert(got(3L) == ((3L, 300L, 100L, 0L, 300.0 / 3.0 / 105.0)))
  }

  test("topTerms == naive tf*N/df ranking, k respected, ties by term") {
    val rows = docs.as[(Long, String)].collect().toSeq
    val n = rows.size.toLong
    val tf = rows.flatMap { case (id, t) =>
      t.split(" ", -1).groupBy(identity).map { case (w, xs) =>
        (id, w, xs.length.toLong) } }
    val df = rows.flatMap { case (_, t) => t.split(" ", -1).distinct }
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val k = 2
    val naive = tf.groupBy(_._1).flatMap { case (id, xs) =>
      xs.map { case (_, w, f) => (w, f, df(w), (f * n).toDouble / df(w).toDouble) }
        .sortBy { case (w, _, _, s) => (-s, w) }.take(k).zipWithIndex
        .map { case ((w, f, d, s), i) => (id, w, f, d, s, i + 1) }
    }.toSet
    val got = graft.quality.Keywords
      .topTerms(docs, "doc_id", split(col("text"), " "), k)
      .as[(Long, String, Long, Long, Double, Int)].collect().toSet
    assert(got == naive)
    // doc 3 is all "the": exactly one distinct term, rank 1, tf 3
    assert(got.count(_._1 == 3L) == 1)
    assert(got.find(_._1 == 3L).get._3 == 3L)
  }

  test("empty text scores as the single empty token") {
    val d = Seq((1L, ""), (2L, "a b")).toDF("doc_id", "text")
    val got = collectScores(
      UnigramLm.scoreSelf(d, "doc_id", split(col("text"), " ")))
    assert(got(1L)._1 == 1L) // split("", " ") = [""] — one token
    assert(got(1L)._4 == 1L) // "" is corpus-hapax here
  }
}
