package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for sorted-neighborhood candidate generation (q178)
  * beyond the DuckDB hash gate: exact LCP values (incl. duplicates =
  * full length), block isolation, the minLcp gate, and empty keys. */
class SnmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("candidates pairs sort-adjacent records with exact LCPs, blocks isolate") {
    import spark.implicits._
    val df = Seq(
      // block "aaaa": three near-dups in sort order — adjacent pairs only
      (1L, "aaaa hello world"),
      (2L, "aaaa hello worms"),
      (3L, "aaaa help"),
      // identical texts: LCP = full length
      (4L, "bbbb same"), (5L, "bbbb same"),
      // block "cccc" singleton: no pair ever crosses into "aaaa"/"bbbb"
      (6L, "cccc aaaa hello world"),
      // short key: shares only 3 chars with nothing ≥ minLcp in block
      (7L, "dddd"), (8L, "ddd")
    ).toDF("id", "text")
    val got = graft.dedup.SortedNeighborhood
      .candidates(df, col("id"), col("text"), prefixLen = 4, minLcp = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // sort order in "aaaa": hello world < hello worms < help
    // ("aaaa hello world" vs "aaaa hello worms": differ at 'l'/'m', LCP 14;
    //  "aaaa hello worms" vs "aaaa help": differ at 'l'/'p' pos 9, LCP 8)
    assert(got === Map(
      (1L, 2L) -> 14L,
      (2L, 3L) -> 8L,
      (4L, 5L) -> 9L))
    // (7,8): different blocks ("dddd" vs "ddd "-prefix of len 3 → block
    // "ddd") — never compared; 6 is alone in "cccc"
  }

  test("candidates handles empty and sub-minLcp keys without error") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, ""), (3L, "ab"), (4L, "ab")).toDF("id", "t")
    // empty keys: block "" pairs them but LCP 0 < minLcp → filtered;
    // "ab" pair: LCP 2 < 4 → filtered
    val got = graft.dedup.SortedNeighborhood
      .candidates(df, col("id"), col("t"), prefixLen = 4, minLcp = 4)
      .collect()
    assert(got.isEmpty)
    // with minLcp = 1 the "ab" duplicate pair surfaces at LCP 2
    val loose = graft.dedup.SortedNeighborhood
      .candidates(df, col("id"), col("t"), prefixLen = 4, minLcp = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(loose === Map((3L, 4L) -> 2L))
  }
}
