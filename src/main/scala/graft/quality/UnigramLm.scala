package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language-model quality scoring — the CCNet-style
  * "score each document by how typical its tokens are of the corpus"
  * filter, the standard pre-training quality gate between the heuristic
  * signals (q16/q17/q83) and a full KenLM pass.
  *
  * EXACTNESS CONTRACT: no transcendental functions. DuckDB's `ln` and the
  * JVM's `Math.log` disagree by 1 ulp on ~0.03% of inputs (measured:
  * 14/50000 mismatches), so a log-prob score can never be hash-verified
  * across engines. Every emitted statistic is therefore exact integer
  * arithmetic (counts, sums, min) plus IEEE-pinned division for the final
  * mean probability — bit-identical in any engine that mirrors the
  * expression tree. A caller who wants log-perplexity applies `ln` to
  * `mean_prob` downstream, outside the verified surface.
  *
  * Scale shape (100 TB corpus): the model is a (token, cnt) table — Zipf
  * says its distinct-token count grows ~ O(corpus^0.5..0.7), and a real
  * deployment caps it at top-V by count (the tail folds into cnt=0 OOV via
  * the left join below), making it a broadcastable dimension table. With
  * the model broadcast, the per-doc pass is ONE corpus scan: explode keeps
  * a document's token rows inside their partition, the map-side join
  * attaches counts without moving them, and partial aggregation collapses
  * to one row per doc_id before the only shuffle. Training (`tokenCounts`)
  * is one explode + groupBy(token) — a word-count, the canonical
  * map-side-combined aggregation. Neither pass shuffles data proportional
  * to corpus bytes.
  */
object UnigramLm {

  /** Train: (tok, cnt) over the corpus. `toks` is any array-of-string
    * column (e.g. `split(col("text"), " ")`). At open-web scale, cap the
    * result with an `ORDER BY cnt DESC LIMIT V` before broadcasting; the
    * dropped tail scores as OOV (cnt 0) in [[score]], which only makes the
    * filter more conservative. */
  def tokenCounts(docs: DataFrame, toks: Column): DataFrame =
    docs.select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))

  /** Score each document against a trained `model` (columns tok, cnt):
    *   - n_tokens  — document length in tokens
    *   - sum_freq  — Σ corpus-count over the doc's tokens (OOV counts 0)
    *   - min_freq  — the rarest token's corpus count (0 if any OOV)
    *   - n_hapax   — tokens whose corpus count is exactly 1 (gibberish /
    *                 mojibake indicator: unique-to-one-doc vocabulary)
    *   - mean_prob — (sum_freq / n_tokens) / T, the mean unigram
    *                 probability of the doc's tokens; low = atypical.
    * Division order is pinned left-to-right and must be mirrored verbatim
    * by any re-implementation for bit equality. */
  def score(docs: DataFrame, idCol: String, toks: Column,
      model: DataFrame): DataFrame = {
    val tk = docs.select(col(idCol), explode(toks).as("tok"))
    // scalar total as a 1-row aggregate cross-join: zero driver-side jobs
    // at plan-build time (the Disproportionality idiom)
    val total = model.agg(sum("cnt").as("_T"))
    tk.join(model, Seq("tok"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        sum("cnt").as("sum_freq"),
        min("cnt").as("min_freq"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .crossJoin(total)
      .withColumn("mean_prob",
        col("sum_freq").cast("double") / col("n_tokens").cast("double")
          / col("_T").cast("double"))
      .drop("_T")
  }

  /** Self-trained convenience: model = the corpus itself (every token in
    * scope, min_freq ≥ 1, n_hapax counts corpus-wide hapax legomena).
    * Catalyst does not dedupe the shared model subtree, so this plan scans
    * the corpus three times (doc side, model train, scalar total) — fine
    * at test SF; a production run trains [[tokenCounts]] ONCE, writes it
    * to a table, and calls [[score]] so the corpus is scanned exactly
    * once per scoring pass. */
  def scoreSelf(docs: DataFrame, idCol: String, toks: Column): DataFrame =
    score(docs, idCol, toks, tokenCounts(docs, toks))
}
