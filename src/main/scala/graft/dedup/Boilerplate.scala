package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document line-level boilerplate removal — the C4/RefinedWeb
  * hygiene pass: a line that appears in at least `minDocFreq` DISTINCT
  * documents is boilerplate (nav menus, cookie banners, footers) and is
  * stripped from every document, preserving the order of the surviving
  * lines.
  *
  * Scale shape (the 100 TB path):
  *   - the corpus text is shuffled at most ONCE. Line content never rides
  *     a shuffle for the frequency count: each line collapses to a 128-bit
  *     hash pair at the scan, so the doc-frequency aggregation and the
  *     frequent-set membership join move ~24-byte rows, not page text;
  *   - doc-frequency is the classic hot-key aggregation (every page has
  *     the same "Home" line) — the (hash, doc) `distinct()` partial-
  *     aggregates map-side, collapsing each partition's copies of a hot
  *     line before anything shuffles, then the per-hash count is a second
  *     cheap partial agg;
  *   - dropped line POSITIONS (not text) aggregate per doc, and only the
  *     final doc ⋈ dropped-positions join moves document text — one
  *     shuffle, or zero when the corpus is already hash-partitioned by id;
  *   - the surviving-line rebuild is a pure array HOF on the original row
  *     (`filter` with index lambda) — no re-assembly groupBy over exploded
  *     text, which would shuffle the corpus a second time.
  *
  * Hash contract: identical to [[Dedup.exact]]'s — two distinct lines
  * colliding on BOTH independent 64-bit xxhash64 seeds (~2⁻¹²⁸) would be
  * conflated; accepted as the standard content-hash contract.
  */
object Boilerplate {

  /** Strip lines whose distinct-document frequency is ≥ `minDocFreq`.
    * Returns one row per input row: (idCol, clean_text, n_kept,
    * n_removed). `sep` is a LITERAL separator (regex-quoted internally);
    * a document whose every line is boilerplate survives with
    * clean_text = "". */
  def removeFrequentLines(docs: DataFrame, idCol: String, textCol: String,
      minDocFreq: Long, sep: String = "\n"): DataFrame = {
    require(minDocFreq >= 2,
      s"minDocFreq must be >= 2 (a 1 would strip every line), got $minDocFreq")
    val qsep = java.util.regex.Pattern.quote(sep)
    val arr = docs.select(col(idCol).as("_id"),
      split(col(textCol), qsep).as("_lines"))
    // hash-only projection: text stays in the source row
    val hashed = arr
      .select(col("_id"), posexplode(col("_lines")).as(Seq("_pos", "_line")))
      .select(col("_id"), col("_pos"),
        xxhash64(col("_line")).as("_h1"),
        xxhash64(col("_line"), lit(7)).as("_h2"))
    // distinct docs per line: two-phase (dedupe (line, doc) pairs map-side,
    // then count) — the hot-line skew collapses before the shuffle
    val freq = hashed.select("_h1", "_h2", "_id").distinct()
      .groupBy("_h1", "_h2").agg(count(lit(1)).as("_df"))
      .where(col("_df") >= minDocFreq)
      .select("_h1", "_h2")
    // hint-free: AQE broadcasts the frequent set from its true (small)
    // runtime size — the codebase-wide broadcast policy
    val dropped = hashed.join(freq, Seq("_h1", "_h2"), "left_semi")
      .groupBy("_id").agg(collect_set(col("_pos")).as("_droppos"))
    val nRemoved = coalesce(size(col("_droppos")), lit(0)).cast("long")
    arr.join(dropped, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        concat_ws(sep, filter(col("_lines"), (_, i) =>
          !coalesce(array_contains(col("_droppos"), i), lit(false))))
          .as("clean_text"),
        (size(col("_lines")).cast("long") - nRemoved).as("n_kept"),
        nRemoved.as("n_removed"))
  }
}
