package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Test-set decontamination: flag corpus documents that share word n-grams
  * with a benchmark/eval document set, the standard pre-training hygiene
  * pass (the n-gram-overlap rule popularized by the GPT-3 and PaLM
  * decontamination appendices).
  *
  * Scale shape (the 100 TB path):
  *   - the corpus side is a narrow scan → per-row gram array (pure HOFs,
  *     the bounded [[TextFunctions.spaceTokens]] cap) → explode; no
  *     corpus-side shuffle for the join itself;
  *   - the benchmark side is dimension-sized by nature (eval suites are
  *     tiny next to the corpus) and collapses to DISTINCT grams before the
  *     join — hint-free, so AQE broadcasts it at runtime from its true
  *     size (the codebase-wide policy: never hint-broadcast anything that
  *     could be data-proportional);
  *   - the only wide operation is the final count per doc id, which
  *     map-side partial-aggregates.
  *
  * `array_distinct` on the corpus side + DISTINCT on the benchmark side
  * make each joined (id, gram) pair unique, so `count(*)` IS the distinct
  * overlapping-gram count.
  */
object Decontaminate {

  /** Distinct word n-grams of `textCol` shared with `bench`, per corpus
    * row: (idCol, overlap_ngrams). Rows with zero overlap are absent. */
  def overlap(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 4, maxTokens: Int = 2048): DataFrame = {
    def gramRows(df: DataFrame) = df.select(col(idCol), explode(
      array_distinct(TextFunctions.ngrams(
        TextFunctions.spaceTokens(col(textCol), maxTokens), n))).as("_gram"))
    val benchGrams = gramRows(bench).select("_gram").distinct()
    gramRows(corpus)
      .join(benchGrams, "_gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("overlap_ngrams"))
  }

  /** Corpus rows contaminated under the ≥ `minOverlap` distinct-shared-
    * n-gram rule. The complement (an anti-join on this result) is the
    * cleaned corpus. */
  def flag(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 4, minOverlap: Int = 3,
      maxTokens: Int = 2048): DataFrame =
    overlap(corpus, bench, idCol, textCol, n, maxTokens)
      .where(col("overlap_ngrams") >= minOverlap)
}
