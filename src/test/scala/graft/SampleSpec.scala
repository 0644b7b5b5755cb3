package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Boilerplate
import graft.functions.TextFunctions
import graft.sample.Mixture

class SampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- Boilerplate.removeFrequentLines ------------------------------

  /** 30 docs: a global nav line on all, a 3-variant footer (10 docs each),
    * a unique body line, and on doc 7 a WITHIN-doc repeated line that is
    * globally rare (must survive — frequency is distinct-DOC count). */
  private lazy val lineDocs = (0 until 30).map { i =>
    val body = s"unique body $i"
    val footer = s"footer variant ${i % 3}"
    val extra = if (i == 7) "\nrepeated twice\nrepeated twice" else ""
    (i.toLong, s"nav menu\n$body\n$footer$extra")
  }.toDF("doc_id", "text")

  test("removeFrequentLines == naive distinct-doc-frequency oracle") {
    val k = 5L
    val rows = lineDocs.as[(Long, String)].collect()
    val df = rows.flatMap { case (id, t) => t.split("\n").distinct.map(_ -> id) }
      .groupBy(_._1).map { case (l, xs) => l -> xs.length.toLong }
    val frequent = df.filter(_._2 >= k).keySet
    val naive = rows.map { case (id, t) =>
      val kept = t.split("\n").filterNot(frequent)
      val removed = t.split("\n").count(frequent)
      id -> ((kept.mkString("\n"), kept.length.toLong, removed.toLong))
    }.toMap
    val got = Boilerplate.removeFrequentLines(lineDocs, "doc_id", "text", k)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == naive)
    // the globally-rare but within-doc-repeated line survives on doc 7
    assert(got(7L)._1.contains("repeated twice\nrepeated twice"))
    // nav + footer are gone everywhere, order of survivors preserved
    assert(got(0L)._1 == "unique body 0")
  }

  test("removeFrequentLines: all-boilerplate doc survives with empty text") {
    val docs = ((0 until 8).map(i => (i.toLong, "same\nlines")) :+
      (99L, "one\nof a kind")).toDF("doc_id", "text")
    val got = Boilerplate.removeFrequentLines(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == 9) // every doc present, none dropped
    (0 until 8).foreach(i => assert(got(i.toLong) == (("", 0L, 2L))))
    assert(got(99L) == (("one\nof a kind", 2L, 0L)))
  }

  test("removeFrequentLines rejects minDocFreq < 2") {
    intercept[IllegalArgumentException] {
      Boilerplate.removeFrequentLines(lineDocs, "doc_id", "text", 1)
    }
  }

  // ---- Mixture.sampleToWeights ---------------------------------------

  private lazy val mixDocs = (0 until 600).map { i =>
    (i.toLong, s"src${i % 3}", ("tok " * (1 + i % 5)).trim)
  }.toDF("doc_id", "source", "text")

  test("sampleToWeights == hand-computed rate thresholds; deterministic") {
    val weights = Seq(("src0", 6.0), ("src1", 3.0), ("src2", 1.0))
      .toDF("source", "weight")
    val lenC = size(split(col("text"), " "))
    val got = Mixture
      .sampleToWeights(mixDocs, "doc_id", "source", lenC, weights, 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // naive oracle: same arithmetic, driver-side
    val rows = mixDocs.select(col("doc_id"), col("source"),
        lenC.cast("long")).as[(Long, String, Long)].collect()
    val tok = rows.groupBy(_._2).map { case (s, xs) => s -> xs.map(_._3).sum }
    val total = tok.values.sum.toDouble
    val w = Map("src0" -> 6.0, "src1" -> 3.0, "src2" -> 1.0)
    val thr = tok.map { case (s, t) =>
      s -> math.floor(math.min(1.0,
        w(s) / 10.0 * 0.5 * total / t) * Mixture.RateBuckets).toLong }
    val bucket = mixDocs.select(col("doc_id"),
        TextFunctions.hashBucket(col("doc_id"), Mixture.RateBuckets))
      .as[(Long, Long)].collect().toMap
    val naive = rows.filter { case (id, s, _) => bucket(id) < thr(s) }
      .map { case (id, s, n) => (id, s, n) }
    assert(got.toSet == naive.toSet)
    assert(got.nonEmpty && got.length < rows.length) // genuinely sampled
    // determinism: a re-run over a re-partitioned input is identical
    val again = Mixture.sampleToWeights(mixDocs.repartition(13), "doc_id",
        "source", lenC, weights, 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(again.toSet == got.toSet)
  }

  test("sampleToWeights: saturation keeps every doc; zero-weight gate drops") {
    val weights = Seq(("src0", 1.0), ("src1", 1.0)).toDF("source", "weight")
    val lenC = size(split(col("text"), " "))
    // budgetFrac 3.0 → every listed source saturates at rate 1;
    // src2 is absent from the weights → gated out entirely
    val got = Mixture
      .sampleToWeights(mixDocs, "doc_id", "source", lenC, weights, 3.0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc == Map("src0" -> 200, "src1" -> 200))
  }

  test("sampleToWeights: monotone in budget (smaller sample ⊂ larger)") {
    val weights = Seq(("src0", 1.0), ("src1", 1.0), ("src2", 1.0))
      .toDF("source", "weight")
    val lenC = size(split(col("text"), " "))
    def ids(frac: Double) = Mixture
      .sampleToWeights(mixDocs, "doc_id", "source", lenC, weights, frac)
      .select("doc_id").as[Long].collect().toSet
    val small = ids(0.2); val big = ids(0.7)
    assert(small.subsetOf(big) && small.size < big.size)
  }

  // ---- Mixture.sampleKPerGroup --------------------------------------

  /** The engine-portable hash order sampleKPerGroup sorts by: first 8 md5
    * hex chars of the id string, mod RateBuckets (mirrors
    * TextFunctions.hashBucket). */
  private def mdBucket(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) %
      Mixture.RateBuckets
  }

  test("sampleKPerGroup == naive hash-order window; exact sizes; monotone") {
    val df = mixDocs.select(col("source"), col("doc_id"))
    val rows = df.as[(String, Long)].collect().toSeq
    val k = 7
    val naive = rows.groupBy(_._1).flatMap { case (src, xs) =>
      xs.map(_._2).sortBy(id => (mdBucket(id), id)).take(k)
        .zipWithIndex.map { case (id, i) => (src, id, i + 1) }
    }.toSet
    val got = Mixture.sampleKPerGroup(df, "source", "doc_id", k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == naive)
    // exactly min(k, group size) per group
    val sizes = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes.values.forall(_ == k))
    // monotone: k=3 sample is a prefix (subset) of k=7
    val small = Mixture.sampleKPerGroup(df, "source", "doc_id", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(small.subsetOf(got) && small.size == 3 * sizes.size)
    // determinism under re-partitioning
    val again = Mixture
      .sampleKPerGroup(df.repartition(11), "source", "doc_id", k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(again == got)
  }

  test("sampleKPerGroup: k larger than a group keeps the whole group") {
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L))
      .toDF("source", "doc_id")
    val got = Mixture.sampleKPerGroup(tiny, "source", "doc_id", 10)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(got == Set(("a", 1L), ("a", 2L), ("b", 3L)))
  }
}
