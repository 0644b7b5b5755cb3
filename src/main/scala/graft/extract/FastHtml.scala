package graft.extract

/** Allocation-lean HTML → text extraction, byte-identical to
  * [[TextExtractor.htmlToText]] (the regex-pass spec). The regex pipeline
  * allocates ~10 intermediate copies per page; at 32 executor threads in
  * one JVM the extraction stage becomes GC-bound and caps scaling. This
  * implementation does the same three passes with index scans and two
  * intermediate builders, then fuses entity decoding with the whitespace
  * collapse/trim/truncate automaton.
  *
  * Pass semantics replicated exactly (FastHtmlSpec fuzzes equality,
  * including pathological markup):
  *   1. `(?is)<(script|style)\b[^>]*>.*?</\1\s*>` → ' '
  *      (leftmost open, nearest valid close, opens without a valid close
  *      do not match)
  *   2. `(?s)<!--.*?-->` → ' '
  *   3. `<[^>]*>` → ' '
  *   4. entity decode (&lt; &gt; &quot; &#39; &apos; &nbsp; &amp;
  *      sequential-replace semantics) + clean (collapse/trim/truncate) —
  *      sequential global replaces are equivalent to one left-to-right
  *      scan because no replacement output except '&' (from &amp;, the
  *      LAST pass) can contribute characters to another entity pattern.
  */
object FastHtml {

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
    (c >= '0' && c <= '9') || c == '_'

  @inline private def isJavaWs(c: Char): Boolean = // java regex \s (ASCII)
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** case-insensitive region match of ASCII `pat` at s[idx..) */
  private def matchesCi(s: CharSequence, idx: Int, pat: String): Boolean = {
    if (idx + pat.length > s.length) return false
    var k = 0
    while (k < pat.length) {
      // ASCII-only fold: java regex (?i) without UNICODE_CASE does not
      // fold non-ASCII (e.g. U+212A KELVIN SIGN never matches 'k')
      val ch = s.charAt(idx + k)
      val a = if (ch >= 'A' && ch <= 'Z') (ch + 32).toChar else ch
      if (a != pat.charAt(k)) return false
      k += 1
    }
    true
  }

  /** Pass 1: remove script/style blocks (regex semantics above). */
  private def stripScriptStyle(s: String): CharSequence = {
    val n = s.length
    var out: java.lang.StringBuilder = null // lazily created on first match
    var copied = 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var consumed = false
      if (c == '<') {
        val tag =
          if (matchesCi(s, i + 1, "script")) "script"
          else if (matchesCi(s, i + 1, "style")) "style"
          else null
        if (tag != null) {
          val afterName = i + 1 + tag.length
          // \b: next char must not be a word char
          if (afterName >= n || !isWordChar(s.charAt(afterName))) {
            // [^>]* then '>'
            var j = afterName
            while (j < n && s.charAt(j) != '>') j += 1
            if (j < n) {
              // find nearest valid close: </tag \s* >
              var k = j + 1
              var closeEnd = -1
              while (closeEnd < 0 && k < n) {
                if (s.charAt(k) == '<' && k + 1 < n && s.charAt(k + 1) == '/'
                    && matchesCi(s, k + 2, tag)) {
                  var m = k + 2 + tag.length
                  while (m < n && isJavaWs(s.charAt(m))) m += 1
                  if (m < n && s.charAt(m) == '>') closeEnd = m + 1
                }
                k += 1
              }
              if (closeEnd > 0) {
                if (out == null) out = new java.lang.StringBuilder(n)
                out.append(s, copied, i).append(' ')
                copied = closeEnd
                i = closeEnd
                consumed = true
              }
            }
          }
        }
      }
      if (!consumed) i += 1
    }
    if (out == null) s
    else { out.append(s, copied, n); out }
  }

  /** Pass 2: remove comments `<!--.*?-->`. */
  private def stripComments(s: CharSequence): CharSequence = {
    val n = s.length
    var out: java.lang.StringBuilder = null
    var copied = 0
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '<' && matchesExact(s, i, "<!--")) {
        // find -->
        var j = i + 4
        var end = -1
        while (end < 0 && j + 3 <= n) {
          if (s.charAt(j) == '-' && s.charAt(j + 1) == '-'
              && s.charAt(j + 2) == '>') end = j + 3
          j += 1
        }
        if (end > 0) {
          if (out == null) out = new java.lang.StringBuilder(n)
          out.append(s, copied, i).append(' ')
          copied = end
          i = end
        } else i += 1
      } else i += 1
    }
    if (out == null) s
    else { out.append(s, copied, n); out }
  }

  private def matchesExact(s: CharSequence, idx: Int, pat: String): Boolean = {
    if (idx + pat.length > s.length) return false
    var k = 0
    while (k < pat.length) {
      if (s.charAt(idx + k) != pat.charAt(k)) return false
      k += 1
    }
    true
  }

  // derived from the ONE authoritative entity list so the fused automaton
  // and the regex spec cannot drift apart between fuzz runs; the fused
  // decoder emits exactly one char per entity, so the contract is
  // enforced at init (a multi-char replacement added upstream must fail
  // HERE, not silently truncate to its first char)
  private val EntityTable: Array[(String, Char)] = {
    require(TextExtractor.Entities.forall(_._2.length == 1),
      "FastHtml fused decoder requires single-char entity replacements; " +
        "widen emit() before adding multi-char entities")
    TextExtractor.Entities.map { case (p, r) => (p, r.charAt(0)) }.toArray
  }

  /** Passes 3+4 fused: strip `<[^>]*>`, decode entities, collapse/trim
    * whitespace, truncate at max + "...". */
  private def stripTagsAndClean(s: CharSequence, max: Int): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var pendingSpace = false
    @inline def emit(c: Char): Unit = {
      // the pinned ws class (TextExtractor.WsClass)
      if (isJavaWs(c)) {
        if (sb.length() > 0) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        var j = i + 1
        while (j < n && s.charAt(j) != '>') j += 1
        if (j < n) { emit(' '); i = j + 1 } // tag → ' '
        else { emit(c); i += 1 } // no closing '>': '<' is literal
      } else if (c == '&') {
        var matched = false
        var e = 0
        while (!matched && e < EntityTable.length) {
          val (pat, rep) = EntityTable(e)
          if (matchesExact(s, i, pat)) {
            emit(rep)
            i += pat.length
            matched = true
          }
          e += 1
        }
        if (!matched) { emit(c); i += 1 }
      } else { emit(c); i += 1 }
    }
    TextExtractor.truncateCp(sb, max) // code points, one shared rule
    sb.toString
  }

  def htmlToText(html: String, max: Int = TextExtractor.MaxChars): String = {
    if (html == null) return null
    stripTagsAndClean(stripComments(stripScriptStyle(html)), max)
  }

  def htmlToText(html: Array[Byte], max: Int): String = {
    if (html == null) return null
    htmlToText(new String(html, java.nio.charset.StandardCharsets.UTF_8), max)
  }
}
