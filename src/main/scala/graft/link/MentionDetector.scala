package graft.link

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.extract.TextExtractor
import graft.model.{Mention, Page, RawTriple}

/** Mention detection + entity linking + pattern triple extraction.
  *
  * One fused, shuffle-free pass over pages: html → text (byte-identical
  * extraction spec) → Aho-Corasick mentions → consecutive-pair relation
  * matching → (subj, pred, obj) rows. Generalizes the reference's
  * lookup-maps-then-emit edge builders (reference:src/kg_ae/graph/
  * build.py:354-805) into a distributed narrow transform: the dictionary is
  * broadcast once; no shuffle occurs until canonicalization aggregates.
  */
object MentionDetector {

  /** Per-row pure function: extracted text of a page (text column wins if
    * present, else decode html). The north-rule per-url invariant is defined
    * on this output. Served by the allocation-lean implementations
    * (FastHtml / CleanText.cleanJava), fuzz-proved byte-identical to the
    * regex spec (FastHtmlSpec, CleanTextExprSpec). */
  def extractText(p: Page): String =
    if (p.text != null)
      graft.functions.CleanText.cleanJava(p.text, TextExtractor.MaxChars)
    else graft.extract.FastHtml.htmlToText(p.html, TextExtractor.MaxChars)

  /** Pure per-row mention scan over an already-cleaned text. */
  def mentionsOf(gaz: Gazetteer, url: String, text: String): Seq[Mention] = {
    if (text == null || text.isEmpty) return Nil
    gaz.automaton.findMentions(text).map { case (b, e, pi) =>
      val surface = text.substring(b, e)
      // SAME fold as the scanner/entry norms: lowerPreserving(surface) is
      // exactly the matched pattern, so the nodeType lookup always hits
      Mention(url, surface, AhoCorasick.lowerPreserving(surface), b, e)
    }
  }

  /** Distributed mentions: broadcast gazetteer, narrow flatMap. */
  def detect(spark: SparkSession, pages: Dataset[Page], gaz: Gazetteer): Dataset[Mention] = {
    import spark.implicits._
    val bGaz: Broadcast[Gazetteer] = spark.sparkContext.broadcast(gaz)
    pages.flatMap { p => mentionsOf(bGaz.value, p.url, extractText(p)) }
  }
}

/** Pattern-rule triple extraction (north rule: "dependency-pattern triple
  * extraction emitting (subj, pred, obj) rows").
  *
  * Rule: for consecutive non-overlapping mentions m1, m2 in a page's cleaned
  * text, if the gap text between them — trimmed of spaces — equals a relation
  * phrase AND the (subjType, objType) of the linked entities matches the
  * claim shape (claim-shape table, reference:docs/data-sources.md:56-68),
  * emit `(m1.norm, claim_type, m2.norm)`. The gap must stay within one
  * sentence (no '.' crossing). Deterministic and purely per-row.
  */
object TripleExtractor {

  /** phrase(lowercase) → (claim_type, subjType, objType) */
  type Rules = Map[String, (String, String, String)]

  /** Ternary relation pattern `m1 <phrase1> m2 <phrase2> m3` with node types
    * (t1, t2, t3), modeled the reference way (reference:src/kg_ae/graph/
    * build.py:747-805): two membership claims m1/m2 → combo plus one
    * combo → m3 claim, where the combo node is keyed by the SORTED pair of
    * member labels so the same pair always reuses one node (SURVEY A11). */
  case class TernaryRule(phrase1: String, phrase2: String,
      t1: String, t2: String, t3: String,
      memberClaim: String, tailClaim: String)

  /** The DDI rule: Drug combined-with Drug jointly-cause AdverseEvent. */
  val DdiRule: TernaryRule = TernaryRule("combined with", "jointly cause",
    "Drug", "Drug", "AdverseEvent", "DRUG_IN_COMBINATION", "DDI_AE_TWOSIDES")

  /** Sorted-pair combination label (A11: least/greatest, so ("b","a") and
    * ("a","b") canonicalize to one node — reference build.py:757-791). */
  def comboLabel(a: String, b: String): String =
    if (a <= b) s"$a + $b" else s"$b + $a"

  /** Evidence-sentence end: one code point past the final mention
    * (captures trailing punctuation), never past the string. Code-point
    * aware — `end + 1` on a char index would split a surrogate pair when
    * an astral character follows the mention, emitting a lone surrogate
    * that UTF-8-encodes as U+FFFD on write and breaks byte-identity
    * against any oracle (same rule as TextExtractor's code-point
    * truncation). For BMP text this is exactly `end + 1`. */
  private def sentenceEnd(text: String, end: Int): Int =
    if (end >= text.length) text.length
    else end + Character.charCount(text.codePointAt(end))

  def triplesOf(gaz: Gazetteer, rules: Rules, url: String, text: String,
      ternary: Option[TernaryRule] = Some(DdiRule)): Seq[RawTriple] = {
    val ms = MentionDetector.mentionsOf(gaz, url, text)
    if (ms.size < 2) return Nil
    val out = Seq.newBuilder[RawTriple]
    var i = 0
    while (i < ms.size - 1) {
      val m1 = ms(i); val m2 = ms(i + 1)
      val gap = text.substring(m1.end, m2.begin)
      if (!gap.contains('.')) {
        val phrase = gap.trim.toLowerCase(java.util.Locale.ROOT)
        rules.get(phrase).foreach { case (claim, st, ot) =>
          val t1 = gaz.nodeType(m1.norm)
          val t2 = gaz.nodeType(m2.norm)
          if (t1.contains(st) && t2.contains(ot)) {
            val sentence = text.substring(m1.begin, sentenceEnd(text, m2.end))
            out += RawTriple(m1.norm, claim, m2.norm, url, sentence)
          }
        }
      }
      i += 1
    }
    ternary.foreach { r =>
      var j = 0
      while (j < ms.size - 2) {
        val m1 = ms(j); val m2 = ms(j + 1); val m3 = ms(j + 2)
        val g1 = text.substring(m1.end, m2.begin)
        val g2 = text.substring(m2.end, m3.begin)
        if (!g1.contains('.') && !g2.contains('.') &&
            g1.trim.toLowerCase(java.util.Locale.ROOT) == r.phrase1 &&
            g2.trim.toLowerCase(java.util.Locale.ROOT) == r.phrase2 &&
            m1.norm != m2.norm &&
            gaz.nodeType(m1.norm).contains(r.t1) &&
            gaz.nodeType(m2.norm).contains(r.t2) &&
            gaz.nodeType(m3.norm).contains(r.t3)) {
          val combo = comboLabel(m1.norm, m2.norm)
          val sentence = text.substring(m1.begin, sentenceEnd(text, m3.end))
          out += RawTriple(m1.norm, r.memberClaim, combo, url, sentence)
          out += RawTriple(m2.norm, r.memberClaim, combo, url, sentence)
          out += RawTriple(combo, r.tailClaim, m3.norm, url, sentence)
        }
        j += 1
      }
    }
    out.result()
  }

  /** Distributed: pages (optionally language-filtered) → raw triples.
    * Narrow transform; dictionary broadcast; no shuffle. */
  def extract(spark: SparkSession, pages: Dataset[Page], gaz: Gazetteer,
      rules: Rules, langFilter: Option[String] = Some("en"),
      ternary: Option[TernaryRule] = Some(DdiRule)): Dataset[RawTriple] = {
    import spark.implicits._
    val bGaz = spark.sparkContext.broadcast(gaz)
    val bRules = spark.sparkContext.broadcast(rules)
    val filtered = langFilter match {
      case Some(l) => pages.filter(_.lang == l)
      case None => pages
    }
    filtered.flatMap { p =>
      triplesOf(bGaz.value, bRules.value, p.url,
        MentionDetector.extractText(p), ternary)
    }
  }
}
