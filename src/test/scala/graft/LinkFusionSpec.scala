package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the link-prediction / containment / fusion / bigram-LM
  * batch (q147–q150) beyond the DuckDB hash gate: each operator against a
  * naive in-memory reference on crafted fixtures, plus the asymmetry and
  * ordering properties that motivate each operator. */
class LinkFusionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("adamicAdar equals a naive in-memory computation") {
    import spark.implicits._
    // left nodes 1..4 over right neighbors a..e; c is a hub (deg 4)
    val edges = Seq(
      1 -> "a", 1 -> "b", 1 -> "c", 2 -> "a", 2 -> "b", 2 -> "c",
      3 -> "b", 3 -> "c", 3 -> "d", 4 -> "c", 4 -> "e",
      1 -> "a" // duplicate must collapse
    ).toDF("left", "right")
    val got = graft.graph.LinkPrediction
      .adamicAdar(spark, edges, minCommon = 1, maxDegree = 3)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    // naive: deg(a)=2, deg(b)=3, deg(d)=1, deg(e)=1; c has deg 4 → pruned
    val deg = Map("a" -> 2, "b" -> 3, "d" -> 1, "e" -> 1)
    val n = Map(1 -> Set("a", "b"), 2 -> Set("a", "b"), 3 -> Set("b", "d"),
      4 -> Set.empty[String])
    val want = (for {
      u <- n.keys; v <- n.keys if u < v
      shared = n(u).intersect(n(v)) if shared.nonEmpty
    } yield (u, v) -> ((shared.size.toLong,
      shared.toSeq.map(z => 1.0 / math.log(deg(z).toDouble)).sorted.sum))).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (k, (c, s)) =>
      assert(got(k)._1 === c, s"common for $k")
      assert(math.abs(got(k)._2 - s) < 1e-12, s"aa_score for $k")
    }
  }

  test("containment detects doc-inside-doc that Jaccard misses") {
    import spark.implicits._
    val small = "w1 w2 w3 w4 w5" // 3 shingles, all inside big
    val big = ("w1 w2 w3 w4 w5 " +
      (1 to 40).map(i => s"x$i").mkString(" ")) // 43 shingles
    val other = (1 to 20).map(i => s"y$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big), (3L, other)).toDF("doc_id", "text")
    val got = graft.dedup.Containment.containmentPairs(
      docs, "doc_id", split(col("text"), " "),
      w = 3, maxDf = 20, threshold = 0.5).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(r.fieldIndex("d1")), r.getLong(r.fieldIndex("d2")))
      === ((1L, 2L)))
    // A fully inside B: containment(A in B) = 1.0, Jaccard = 3/43 ≈ 0.07
    assert(r.getDouble(r.fieldIndex("c_in_1")) === 1.0)
    assert(r.getDouble(r.fieldIndex("c_in_2")) === 3.0 / 43.0)
  }

  test("containment shingle guard: short docs emit no shingles") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    // Spark sequence() DESCENDS when start > stop — the when() guard must
    // keep a 2-token doc from fabricating shingles
    val sh = docs.select(col("doc_id"),
      size(graft.dedup.Containment.shingles(split(col("text"), " "), 3))
        .as("n")).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sh === Map(1L -> 0, 2L -> 2))
  }

  test("topkRanks assigns dense 1-based ranks in (score desc, id) order") {
    import spark.implicits._
    val df = Seq((10L, 2.0), (11L, 5.0), (12L, 2.0), (13L, 9.0))
      .toDF("doc", "sc")
    val got = graft.similarity.Fusion
      .topkRanks(df, col("doc"), col("sc"), 3)
      .as[(Long, Long)].collect().toMap
    // ties (10, 12 at 2.0) break by id; k=3 cuts 12
    assert(got === Map(13L -> 1L, 11L -> 2L, 10L -> 3L))
  }

  test("rrf fuses full-outer with absent-list terms contributing zero") {
    import spark.implicits._
    val r1 = Seq((1L, 1L), (2L, 2L)).toDF("id", "rank")
    val r2 = Seq((2L, 1L), (3L, 2L)).toDF("id", "rank")
    val got = graft.similarity.Fusion.rrf(r1, r2, 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(got(1L) - 1.0 / 61.0) < 1e-15)
    assert(math.abs(got(2L) - (1.0 / 62.0 + 1.0 / 61.0)) < 1e-15)
    assert(math.abs(got(3L) - 1.0 / 62.0) < 1e-15)
    // doc in both lists outranks single-list docs at comparable ranks
    assert(got(2L) > got(1L) && got(2L) > got(3L))
  }

  test("bigram LM scores ordered text above shuffled text") {
    import spark.implicits._
    val phrase = (1 to 12).map(_ => "the quick brown fox").mkString(" ")
    // same unigram bag, nonsense order — unigram stats identical
    val shuffled = ("the quick brown fox " * 12).trim
      .split(" ").zipWithIndex
      .sortBy { case (w, i) => (i * 7919) % 48 }.map(_._1).mkString(" ")
    val docs = (Seq((1L, phrase), (2L, shuffled)) ++
      (3 to 20).map(i => (i.toLong, phrase))).toDF("doc_id", "text")
    val got = graft.quality.BigramLm
      .score(spark, docs, "doc_id", split(col("text"), " "), 0.75)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("logprob"))).toMap
    assert(got(1L) > got(2L),
      s"ordered ${got(1L)} should beat shuffled ${got(2L)}")
    // all ordered copies score identically (pure function of content)
    assert(got(1L) === got(3L))
  }

  test("bigram LM interpolation never yields -inf on unseen bigrams") {
    import spark.implicits._
    // every bigram is unique → bigram term 1/c1 with unigram backoff > 0
    val docs = Seq((1L, (1 to 30).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = graft.quality.BigramLm
      .score(spark, docs, "doc_id", split(col("text"), " "), 0.75)
      .collect().head
    assert(!got.getDouble(got.fieldIndex("logprob")).isNegInfinity)
    assert(got.getLong(got.fieldIndex("n_bigrams")) === 29L)
  }
}
