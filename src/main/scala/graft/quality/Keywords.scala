package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document keyword extraction: top-k terms by the rational tf-idf
  * surrogate tf × N / df. The classic formulation multiplies tf by
  * log(N/df); log is monotone, so RANKINGS within a document are identical
  * for any document where tf is constant, and close in general — and the
  * rational form keeps the whole score inside the exact-arithmetic
  * portability contract ([[UnigramLm]]: integer numerators, one final
  * IEEE division, no transcendentals), so the result is hash-verifiable
  * across engines.
  *
  * Scale shape: one explode feeds both aggregates — tf is
  * (doc, term)-keyed with full map-side partial aggregation (a document's
  * token rows never leave their partition before collapsing), df is the
  * vocab-sized distinct-doc count (Zipf-bounded, broadcastable), N is a
  * 1-row aggregate cross-join (zero plan-time jobs). The per-doc rank
  * window partitions by doc id; its partition size is the DISTINCT-term
  * count of one document — bounded by document length, never by corpus
  * size, so no hot-group hazard (unlike per-source windows, which ride
  * [[graft.sample.Mixture.sampleKPerGroup]]'s boundedTopK).
  */
object Keywords {

  /** Top-k terms per document: (idCol, term, tf, df, score, rank) with
    * rank 1..k by (score desc, term asc) — a total order, since term is
    * unique per document after the tf aggregation. */
  def topTerms(docs: DataFrame, idCol: String, toks: Column,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tk = docs.select(col(idCol), explode(toks).as("term"))
    val tf = tk.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val df = tk.distinct().groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(countDistinct(col(idCol)).as("_N"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("term").asc)
    tf.join(df, "term").crossJoin(n)
      .withColumn("score",
        (col("tf") * col("_N")).cast("double") / col("df").cast("double"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }
}
