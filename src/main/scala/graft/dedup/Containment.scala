package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Asymmetric shingle-CONTAINMENT near-duplicate detection — the
  * doc-inside-doc relation Jaccard misses. A quote page that embeds a full
  * article, or a boilerplate wrapper around copied content, has
  *
  *   containment(A in B) = |S(A) ∩ S(B)| / |S(A)|  ≈ 1
  *
  * while Jaccard(A, B) = |∩|/|∪| stays small whenever |B| ≫ |A| — so a
  * Jaccard-only dedup pass (q26/q34) keeps both copies. Broder's original
  * resemblance paper (SEQUENCES '97) defines both measures; training-data
  * pipelines use containment to strip quoted/wrapped duplication.
  *
  * Scale shape: identical to [[Dedup.ngramJaccardPairs]]'s inverted-index
  * join — distinct shingles per doc, pairs generated ONLY through shared
  * shingles (never all-pairs), with a document-frequency cap dropping
  * non-discriminative shingles BEFORE the self-join (a boilerplate shingle
  * shared by d docs expands quadratically; it also contributes the least
  * evidence of targeted copying — the same hub-pruning argument as
  * [[graft.graph.LinkPrediction]]). Intersection counts and shingle-set
  * sizes are integers; the two containment ratios are single IEEE
  * divisions — bit-identical in any engine.
  */
object Containment {

  /** Token w-shingles of an array-of-string column, as space-joined
    * strings; rows with fewer than `w` tokens produce an empty array (the
    * `sequence(1, n-w+1)` guard below — Spark's `sequence` turns DESCENDING
    * when start > stop, which would fabricate shingles for short docs). */
  def shingles(toks: Column, w: Int): Column =
    when(size(toks) >= w,
      transform(sequence(lit(1), size(toks) - (w - 1)), i =>
        concat_ws(" ", (0 until w).map(o => element_at(toks, i + o)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Directed containment for every doc pair sharing ≥ 1 kept shingle and
    * max(c_in_1, c_in_2) ≥ `threshold`. Output: (d1, d2, inter, c_in_1 =
    * inter/|S(d1)|, c_in_2 = inter/|S(d2)|) with d1 < d2. `docs` needs
    * (idCol, toks array); shingles with document frequency > `maxDf` are
    * dropped on BOTH the numerator and denominator side, so the ratio
    * stays a true containment over the kept-shingle sets. */
  def containmentPairs(docs: DataFrame, idCol: String, toks: Column,
      w: Int, maxDf: Int, threshold: Double): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc"), explode(array_distinct(shingles(toks, w))).as("s"))
    val df = sh.groupBy("s").agg(count(lit(1)).as("c"))
    val kept = sh.join(df.where(col("c") <= maxDf), Seq("s"))
      .select("doc", "s")
    val sz = kept.groupBy("doc").agg(count(lit(1)).as("n"))
    val pr = kept.as("a").join(kept.as("b"),
        col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("d1"), col("b.doc").as("d2"))
      .agg(count(lit(1)).as("inter"))
    pr.join(sz.select(col("doc").as("d1"), col("n").as("n1")), Seq("d1"))
      .join(sz.select(col("doc").as("d2"), col("n").as("n2")), Seq("d2"))
      .select(col("d1"), col("d2"), col("inter"),
        (col("inter").cast("double") / col("n1").cast("double")).as("c_in_1"),
        (col("inter").cast("double") / col("n2").cast("double")).as("c_in_2"))
      .where(greatest(col("c_in_1"), col("c_in_2")) >= threshold)
  }
}
