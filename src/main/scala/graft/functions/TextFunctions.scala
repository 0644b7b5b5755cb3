package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting. All are
  * pure Column pipelines over built-ins (codegen'd; no UDFs) so they stay
  * inside WholeStageCodegen on the 100 TB scan path.
  */
object TextFunctions {

  // the pinned whitespace class (TextExtractor.WsClass): built-in trim()
  // strips ONLY ' ', so a tab/newline-separated doc would miscount under
  // the naive trim+split-on-spaces version these replaced
  private val Ws = graft.extract.TextExtractor.WsClass
  private def trimWs(c: Column): Column =
    graft.extract.TextExtractor.stripCol(c)

  /** Whitespace token count (runs of the pinned ws class separate tokens).
    * Empty/blank text → 0. */
  def tokenCount(text: Column): Column = {
    val t = trimWs(text)
    when(length(t) === 0, lit(0)).otherwise(size(split(t, Ws + "+")))
  }

  /** BPE-ish subword count: words + digits runs + punctuation marks counted
    * separately (a cheap, deterministic proxy for tokenizer cost). The
    * punctuation class excludes the WHOLE pinned ws class, not just ' ' —
    * tabs/newlines must not count as punctuation subwords when the other
    * docStats columns treat them as token separators. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9" + Ws.substring(1)), lit(0)))

  /** Mean token length over the same ws-class tokens (0.0 for empty). */
  def meanTokenLen(text: Column): Column = {
    val t = trimWs(text)
    val toks = split(t, Ws + "+")
    when(length(t) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0.0), (acc, tk) => acc + length(tk).cast("double"))
        / size(toks).cast("double"))
  }

  private val EnStop = Seq("the", "a", "and", "of", "to", "in", "is", "that")
  private val EsStop = Seq("el", "la", "de", "que", "y", "en", "los", "del")
  private val DeStop = Seq("der", "die", "und", "das", "nicht", "ist", "von", "mit")

  private def stopHits(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(lower(text),
      lit(words.mkString("\\b(", "|", ")\\b")), lit(0)))

  /** Quality score in [0,1]: blend of length band, alpha ratio and stopword
    * density (the reference's length/field gates generalized —
    * reference:src/kg_ae/datasets/faers/parse.py:92-99 len>1 gates). */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val lenScore = least(n / lit(500.0), lit(1.0))
    val alpha = size(regexp_extract_all(text, lit("[A-Za-z]"), lit(0)))
      .cast("double") / greatest(n, lit(1.0))
    val stopDensity = least(
      stopHits(text, EnStop).cast("double") * lit(25.0) / greatest(n, lit(1.0)),
      lit(1.0))
    least(greatest(
      lenScore * lit(0.3) + alpha * lit(0.4) + stopDensity * lit(0.3),
      lit(0.0)), lit(1.0))
  }

  /** Heuristic language ID over stopword hit counts (n-gram-free, cheap).
    * Returns "en"/"es"/"de"/"und". Deterministic ties: en > es > de. */
  def langId(text: Column): Column = {
    val en = stopHits(text, EnStop)
    val es = stopHits(text, EsStop)
    val de = stopHits(text, DeStop)
    when(en === 0 && es === 0 && de === 0, lit("und"))
      .when(en >= es && en >= de, lit("en"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }

  /** Rolling polynomial fingerprint over the token sequence, computed in
    * the prime field mod 1e9+7 (ANSI-safe: no Long overflow — acc·B + h
    * stays < 2^60). Order-sensitive (unlike a bag hash); one aggregate
    * pass, fully codegen'd. */
  def fingerprint(text: Column, base: Long = 1000003L): Column = {
    val p = 1000000007L
    // SAME ws-class tokens as tokenCount/meanTokenLen: docStats columns
    // must describe one token sequence (space-vs-tab separators would
    // otherwise fingerprint differently while the stats said identical)
    val toks = split(trimWs(text), Ws + "+")
    aggregate(toks, lit(0L),
      (acc, t) => pmod(acc * lit(base) + pmod(xxhash64(t), lit(p)), lit(p)))
  }

  /** Portable rolling fingerprint: same polynomial-mod-prime structure as
    * [[fingerprint]] but the per-token value is the first 8 hex chars of
    * md5(token) — recomputable by external SQL engines (the driver's DuckDB
    * oracle), so the fingerprint op is oracle-checkable end-to-end. Splits
    * on single spaces (empty tokens included) to keep the mirror trivial. */
  def fingerprintPortable(text: Column): Column = {
    val p = 1000000007L
    val vals = transform(split(text, " "),
      t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    aggregate(vals, lit(0L),
      (acc, v) => pmod(acc * lit(31L) + v, lit(p)))
  }

  /** Affinity string → nM parse (P18, reference:src/kg_ae/datasets/
    * bindingdb/normalize.py:33-44): strip `>`, `<`, `=`, `~` and commas,
    * tolerant float cast, positive-only (null otherwise). */
  def affinityNm(c: Column): Column = {
    val v = regexp_replace(trim(c), "[><=~,]", "").try_cast("double")
    when(v > 0.0, v)
  }

  /** pX strength score (P19, reference:bindingdb/normalize.py:47-54):
    * clamp((9 − log10(nM) − 4) / 6, 0, 1) — affinity to [0,1] strength. */
  def pxStrength(nM: Column): Column =
    greatest(least((lit(9.0) - log10(nM) - lit(4.0)) / lit(6.0), lit(1.0)),
      lit(0.0))

  /** Classification → score mapping with default (P19,
    * reference:clingen/normalize.py:17-26): a when-chain over a literal
    * dictionary, defaulting to 0.5. */
  def classificationScore(c: Column, mapping: Map[String, Double],
      default: Double = 0.5): Column =
    mapping.foldLeft(lit(default)) { case (acc, (k, v)) =>
      when(lower(trim(c)) === k.toLowerCase(java.util.Locale.ROOT), v)
        .otherwise(acc)
    }

  /** All document stats at once (single projection). */
  def docStats(text: Column): Seq[(String, Column)] = Seq(
    "n_tokens" -> tokenCount(text),
    "n_subwords" -> subwordCount(text),
    "mean_token_len" -> meanTokenLen(text),
    "quality" -> qualityScore(text),
    "lang_id" -> langId(text),
    "fingerprint" -> fingerprint(text))
}
