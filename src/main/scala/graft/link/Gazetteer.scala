package graft.link

import scala.collection.mutable

/** Dictionary entity: a surface form, its canonical norm key and node type. */
case class GazEntry(norm: String, nodeType: String)

/** Broadcast-able Aho–Corasick automaton for gazetteer mention detection.
  *
  * Generalizes the reference's lowercase name-index lookup
  * (reference:src/kg_ae/graph/store.py:179-192) to in-text matching, per the
  * north rule: "trie/Aho-Corasick gazetteer broadcast".
  *
  * Matching spec (deterministic):
  *   - patterns are matched on the LOWERCASED text;
  *   - a hit is only valid at word boundaries: the chars adjacent to the
  *     match must be non-alphanumeric (or string edge) — mirrors the
  *     reference's whole-name resolution, not substring resolution;
  *   - overlapping hits are resolved leftmost-longest, non-overlapping
  *     (exact-before-partial precedence analogue, resolve.py:23-52).
  *
  * Built once on the driver, broadcast to executors (one automaton per JVM,
  * shared by all partitions — no per-row build cost). The structure is
  * array-backed and Java-serializable; for a multi-million-entry gazetteer
  * the build is O(total pattern chars) and the serialized form is compact
  * enough to broadcast (tens of MB), which is the intended 100 TB deployment
  * shape: dictionary ships to 1000 executors once per job.
  */
class AhoCorasick private (
    val gotoFn: Array[mutable.HashMap[Char, Int]],
    val fail: Array[Int],
    // longest pattern ending at this node (-1 = none); patterns dedup'd
    val out: Array[Int],
    // nearest proper fail-ancestor carrying an output (0 = none): the
    // standard AC output link, so the per-char emit walk visits only
    // states that actually END a pattern instead of the whole fail chain
    val outLink: Array[Int],
    val patterns: Array[String]) extends Serializable {

  /** Dense DFA fast path: next[state*128 + ascii] with goto/fail closure
    * precomputed, eliminating the per-char fail-walk + HashMap probes in
    * the scan inner loop. Built only while states×128 ints stay small
    * (≤ ~32 MB) — a multi-million-pattern web gazetteer falls back to the
    * HashMap walk automatically. @transient: rebuilt lazily per executor
    * after broadcast (cheap, O(states×128)), so the serialized automaton
    * stays compact. */
  @transient private lazy val dfa: Array[Int] = {
    val n = gotoFn.length
    if (n > (1 << 16)) null
    else {
      val next = new Array[Int](n * 128)
      // BFS order guarantees fail(s) < s in visit order… not in index
      // order, so resolve via fail chain on demand instead: process root
      // first, then states in BFS order (fail targets are always visited
      // before their dependents in BFS of the trie).
      val order = new Array[Int](n)
      var head = 0; var tail = 0
      order(tail) = 0; tail += 1
      val seen = new Array[Boolean](n); seen(0) = true
      while (head < tail) {
        val s = order(head); head += 1
        gotoFn(s).valuesIterator.foreach { t =>
          if (!seen(t)) { seen(t) = true; order(tail) = t; tail += 1 }
        }
      }
      var i = 0
      while (i < tail) {
        val s = order(i)
        var c = 0
        while (c < 128) {
          val direct = gotoFn(s).getOrElse(c.toChar, -1)
          next(s * 128 + c) =
            if (direct >= 0) direct
            else if (s == 0) 0
            else next(fail(s) * 128 + c) // fail(s) already filled (BFS)
          c += 1
        }
        i += 1
      }
      next
    }
  }

  // Word chars = [0-9A-Za-z_] exactly — the RE2/\b class. Keeping this
  // ASCII-only (not Character.isLetterOrDigit) pins the boundary semantics
  // to the oracle's regex definition: '_' is a word char, non-ASCII letters
  // are boundaries. (ADVICE r1: Unicode-aware boundaries diverged from the
  // q28/q29 \b oracle on '_'/non-ASCII-adjacent terms.)
  @inline private def isWordChar(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') ||
    (c >= 'A' && c <= 'Z') || c == '_'

  /** All boundary-valid raw hits as (begin, end) over lowered text, then
    * leftmost-longest non-overlap selection. Returns (begin, end, patternIdx).
    */
  def findMentions(text: String): IndexedSeq[(Int, Int, Int)] = {
    val lower = AhoCorasick.lowerPreserving(text)
    val hits = mutable.ArrayBuffer.empty[(Int, Int, Int)] // begin, end, pat
    val d = dfa
    var state = 0
    var i = 0
    val n = lower.length
    while (i < n) {
      val c = lower.charAt(i)
      if (d != null && c < 128) {
        state = d(state * 128 + c)
      } else {
        var s = state
        while (s != 0 && !gotoFn(s).contains(c)) s = fail(s)
        state = gotoFn(s).getOrElse(c, 0)
      }
      // emit patterns ending here: the current state (if it ends one) plus
      // its output-link chain — every link target ends a pattern, so this
      // walk is O(matches at i), not O(fail-chain depth) per character
      var t = if (out(state) >= 0) state else outLink(state)
      while (t != 0) {
        val p = out(t)
        val pat = patterns(p)
        val begin = i - pat.length + 1
        val boundaryOk =
          (begin == 0 || !isWordChar(lower.charAt(begin - 1))) &&
          (i == n - 1 || !isWordChar(lower.charAt(i + 1)))
        if (boundaryOk) hits += ((begin, i + 1, p))
        t = outLink(t)
      }
      i += 1
    }
    // leftmost-longest, non-overlapping
    val sorted = hits.sortBy { case (b, e, _) => (b, -(e - b)) }
    val sel = mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var lastEnd = 0
    sorted.foreach { case h @ (b, e, _) =>
      if (b >= lastEnd) { sel += h; lastEnd = e }
    }
    sel.toIndexedSeq
  }
}

object AhoCorasick {

  /** LENGTH-PRESERVING lowercase: per-char 1:1 `Character.toLowerCase`
    * (UnicodeData simple mappings), never `String.toLowerCase`, whose full
    * case mappings can CHANGE the string length (U+0130 'İ' → "i"+U+0307,
    * ß under some locales, …). Mention offsets are computed on the lowered
    * text and then applied to the ORIGINAL text — a length change would
    * shift every later span (silently wrong surfaces/gaps) or overflow
    * `substring` inside a distributed flatMap. The trade: supplementary-
    * plane and full-mapping-only case pairs don't fold — acceptable,
    * because offsets stay exact and entry norms fold through THIS same
    * function, so patterns and scan text always agree. */
  def lowerPreserving(text: String): String = {
    var i = 0
    val n = text.length
    // common case: already caseless/lowercase — avoid the copy
    while (i < n && Character.toLowerCase(text.charAt(i)) == text.charAt(i))
      i += 1
    if (i == n) text
    else {
      val arr = new Array[Char](n)
      text.getChars(0, n, arr, 0)
      var j = i
      while (j < n) { arr(j) = Character.toLowerCase(arr(j)); j += 1 }
      new String(arr)
    }
  }

  /** Build from distinct patterns already folded through
    * [[lowerPreserving]] (Gazetteer normalizes on construction). */
  def build(pats: Seq[String]): AhoCorasick = {
    val patterns = pats.distinct.toArray
    val gotoFn = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val outB = mutable.ArrayBuffer(-1)
    patterns.zipWithIndex.foreach { case (pat, pi) =>
      var state = 0
      pat.foreach { c =>
        gotoFn(state).get(c) match {
          case Some(nxt) => state = nxt
          case None =>
            gotoFn += mutable.HashMap.empty[Char, Int]
            outB += -1
            gotoFn(state)(c) = gotoFn.length - 1
            state = gotoFn.length - 1
        }
      }
      // keep the longer pattern if two normalize to the same node (impossible
      // after distinct, but keep deterministic max)
      if (outB(state) < 0 || patterns(outB(state)).length < pat.length)
        outB(state) = pi
    }
    val fail = Array.fill(gotoFn.length)(0)
    val outLink = Array.fill(gotoFn.length)(0)
    val queue = mutable.Queue.empty[Int]
    gotoFn(0).valuesIterator.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      gotoFn(r).foreach { case (c, s) =>
        queue.enqueue(s)
        var st = fail(r)
        while (st != 0 && !gotoFn(st).contains(c)) st = fail(st)
        fail(s) = gotoFn(st).getOrElse(c, 0)
        if (fail(s) == s) fail(s) = 0
        // fail(s) is strictly shallower, so its link is already final (BFS)
        outLink(s) =
          if (outB(fail(s)) >= 0) fail(s) else outLink(fail(s))
      }
    }
    new AhoCorasick(gotoFn.toArray, fail, outB.toArray, outLink, patterns)
  }
}

/** A gazetteer = entity dictionary (norm surface → node type) + automaton.
  * Construct via [[Gazetteer.apply]], which folds entry norms through the
  * SAME length-preserving lowercase the scanner applies to the text — a
  * mixed-case entry handed to the raw constructor would otherwise be
  * silently unmatchable (the automaton only ever sees lowered text) and
  * unlookupable (mention norms are lowered before the `nodeType` probe). */
class Gazetteer(val entries: Map[String, String]) extends Serializable {
  @transient lazy val automaton: AhoCorasick =
    AhoCorasick.build(entries.keys.toSeq.sorted) // sorted → deterministic ids
  def nodeType(norm: String): Option[String] = entries.get(norm)
}

object Gazetteer {
  /** One node type per folded norm is part of the matching contract (the
    * triple rules and vertex typing both key on it). Entries whose norms
    * case-fold to the same key with DIFFERENT types would otherwise
    * collapse last-wins — every mention of the losing entry silently
    * mistyped, its triples silently dropped by the claim-shape checks.
    * Fail loudly at construction instead. (The reference's per-type name
    * index tolerates cross-type duplicates, reference:src/kg_ae/graph/
    * store.py:96-104 — a caller with such a dictionary must disambiguate
    * the norms before construction.) */
  def apply(es: Seq[GazEntry]): Gazetteer = {
    val folded = es.map(e =>
      AhoCorasick.lowerPreserving(e.norm) -> e.nodeType).distinct
    val collisions = folded.groupBy(_._1)
      .collect { case (n, ts) if ts.size > 1 => n }
    require(collisions.isEmpty,
      "gazetteer norms map to multiple node types after case folding: " +
        collisions.toSeq.sorted.take(5).mkString(", ") +
        " — one node type per norm; disambiguate before construction")
    new Gazetteer(folded.toMap)
  }
}
