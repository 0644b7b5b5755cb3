package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-sequence pair extraction — the two counting kernels at the
  * bottom of embedding/tokenizer training:
  *
  *   - [[skipGramPairs]]: (center, context) pair counts within a forward
  *     window of `maxSkip` positions (word2vec's training-pair
  *     generation, Mikolov et al. 2013) — the corpus-level statistic
  *     embedding trainers stream over;
  *   - [[bpePairCounts]]: adjacent character-pair frequencies across all
  *     token occurrences — EXACTLY the candidate-scoring step of one BPE
  *     merge round (Sennrich et al. ACL'16): the highest count is the
  *     next merge.
  *
  * Both are generation-then-count with NO self-join: the pair stream is
  * produced INSIDE the row's projection (`zip_with` over offset slices
  * for skip-grams, `transform` over a position sequence for char pairs —
  * array HOFs, codegen-friendly, zero shuffle to generate), so the only
  * shuffle in either plan is the final count aggregate, whose map-side
  * partials absorb the Zipf head (the q124 contract — a positional
  * self-join would shuffle every token TWICE and break down exactly on
  * the long documents that matter). Counts are exact BIGINTs.
  */
object Ngrams {

  /** (w_center, w_context, n) for ordered pairs at forward distance
    * 1..maxSkip, n ≥ minCount. `tokens` is an array<string> column. */
  def skipGramPairs(df: DataFrame, tokens: Column, maxSkip: Int,
      minCount: Long): DataFrame = {
    require(maxSkip >= 1 && maxSkip <= 16, s"maxSkip in [1,16], got $maxSkip")
    val withToks = df.select(tokens.as("toks"))
    // one zip_with per distance: slice(toks,1,n-k) × slice(toks,1+k,n-k)
    val pairsAtK = (1 to maxSkip).map { k =>
      // greatest(…, 0): a doc shorter than the distance must yield an
      // empty slice, not a negative-length error
      withToks.select(explode(expr(
        s"""zip_with(slice(toks, 1, greatest(size(toks) - $k, 0)),
                     slice(toks, 1 + $k, greatest(size(toks) - $k, 0)),
                     (a, b) -> struct(a AS w1, b AS w2))""")).as("p"))
    }
    pairsAtK.reduce(_ unionAll _)
      .groupBy(col("p.w1").as("w_center"), col("p.w2").as("w_context"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
  }

  /** (pair, n) adjacent two-character substrings over every token
    * occurrence (tokens shorter than 2 chars contribute nothing),
    * n ≥ minCount — one BPE merge round's candidate table. */
  def bpePairCounts(df: DataFrame, tokens: Column,
      minCount: Long): DataFrame =
    df.select(explode(tokens).as("w"))
      .where(length(col("w")) >= 2)
      // guard above matters: sequence(1, 0) would generate DESCENDING
      .select(explode(expr(
        "transform(sequence(1, char_length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
}
