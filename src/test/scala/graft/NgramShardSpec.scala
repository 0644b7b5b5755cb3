package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the skip-gram / BPE-pair / rendezvous batch
  * (q163–q165) beyond the DuckDB hash gate: naive-reference equality for
  * both pair generators, the short-token guards, and the DEFINING
  * rendezvous property — growing the shard set only ever moves keys TO
  * the new shard. */
class NgramShardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("skipGramPairs equals the naive positional expansion and respects the window") {
    import spark.implicits._
    val docs = Seq("a b c d", "x y", "solo", "").toDF("text")
    val got = graft.text.Ngrams
      .skipGramPairs(docs, split(col("text"), " "), maxSkip = 2,
        minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // naive: every ordered pair at forward distance 1 or 2
    val naive = Seq("a b c d", "x y", "solo", "")
      .map(_.split(" ", -1).toSeq)
      .flatMap(ts => for {
        i <- ts.indices; k <- 1 to 2 if i + k < ts.length
      } yield (ts(i), ts(i + k)))
      .groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    assert(got === naive)
    // window pin: (a,d) is at distance 3 — absent
    assert(!got.contains(("a", "d")) && got(("a", "c")) === 1L)
  }

  test("bpePairCounts counts adjacent char pairs per occurrence and skips 1-char tokens") {
    import spark.implicits._
    val docs = Seq("low lower a", "low").toDF("text")
    val got = graft.text.Ngrams
      .bpePairCounts(docs, split(col("text"), " "), minCount = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // low×2 + lower: lo 3, ow 3, we 1, er 1; 'a' contributes nothing
    assert(got === Map("lo" -> 3L, "ow" -> 3L, "we" -> 1L, "er" -> 1L))
    // the argmax of this table IS the next BPE merge (tie lo/ow here —
    // a real trainer breaks ties lexicographically; both are valid)
    assert(got.values.max === 3L)
  }

  test("rendezvous assignment is total, deterministic, and monotone under shard growth") {
    import spark.implicits._
    val keys = (1L to 200L).toDF("k")
    def asg(n: Int) = graft.operators.Rendezvous
      .assign(spark, keys, col("k"), nShards = n)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val a16 = asg(16)
    assert(a16.size === 200 && a16.values.toSet.subsetOf((0 until 16).toSet))
    assert(asg(16) === a16) // deterministic
    // THE rendezvous property: adding shard 16 moves keys ONLY to 16 —
    // every existing max is preserved unless the new candidate beats it
    val a17 = asg(17)
    val moved = a17.filter { case (k, s) => a16(k) != s }
    assert(moved.values.forall(_ == 16))
    assert(moved.nonEmpty) // ~1/17 of 200 keys expected to move
  }
}
