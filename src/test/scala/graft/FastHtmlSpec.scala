package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.{FastHtml, PageSynth, TextExtractor}

/** FastHtml must be byte-identical to the regex-pass spec on pathological
  * markup, not just well-formed pages. */
class FastHtmlSpec extends AnyFunSuite {

  private val pieces: Array[String] = Array(
    "<script>", "</script>", "</script >", "</script\tfoo>", "<script x>",
    "<style>", "</style>", "<scripts>", "<ScRiPt a=b>", "</STYLE>",
    "<!--", "-->", "<!-- c -->", "<!-->", "<b>", "</b>", "<", ">", "<>",
    "&lt;", "&amp;", "&amp;lt;", "&nbsp;", "&#39;", "&apos;", "&quot;",
    "&", "&am", ";", "text", "a b", "\t", "\n", "", " K ", "İ",
    "x" * 40, "--", "<tag attr='>'", "</", "word&gt;word", ".",
    "\ud83d\ude00", "x\ud835\udd4fy") // astral: truncation counts CODE POINTS

  private def fuzz(i: Long): String = {
    val n = (PageSynth.splitmix64(i) & 0x3F).toInt
    (0 until n).map { k =>
      pieces((PageSynth.splitmix64(i * 8117 + k) & 0x7FFFFFFF).toInt % pieces.length)
    }.mkString
  }

  test("byte-identical to regex spec on 3000 pathological fuzz strings") {
    var diffs = 0
    (0L until 3000L).foreach { i =>
      val s = fuzz(i)
      Seq(25, 10000).foreach { max =>
        val want = TextExtractor.htmlToText(s, max)
        val got = FastHtml.htmlToText(s, max)
        if (got != want) {
          diffs += 1
          if (diffs <= 3) info(
            s"DIFF i=$i max=$max\n in=${s.take(120)}\nwant=$want\n got=$got")
        }
      }
    }
    assert(diffs == 0)
  }

  test("byte-identical on all synthesized corpus pages") {
    (0L until 500L).foreach { i =>
      val h = PageSynth.html(i)
      assert(FastHtml.htmlToText(h, TextExtractor.MaxChars) ==
        TextExtractor.htmlToText(h, TextExtractor.MaxChars), s"page $i")
    }
  }

  test("targeted pathological cases") {
    val cases = Seq(
      "<script>x", // unterminated script: open tag stripped as plain tag
      "<!-- <script>a</script> -->", // script inside comment
      "<!-- unterminated <b>bold</b>", // unterminated comment
      "a<script >no close", // script with ws attr no close
      "pre<script a=1>ignore<!-- --></script>post",
      "&amp;lt; &lt;script&gt;", // double-encoded
      "<scripts>not a script</scripts>", // \b guard
      "a &nbsp;  b", // nbsp entity is ws, raw NBSP char is NOT
      "</script>orphan close")
    cases.foreach { s =>
      assert(FastHtml.htmlToText(s, 10000) == TextExtractor.htmlToText(s, 10000),
        s"case: $s")
    }
  }

  test("truncation counts CODE POINTS and never splits a surrogate pair") {
    val astral = "😀" // one code point, two UTF-16 units
    // max=4 must keep the astral char WHOLE (a UTF-16 cut at 4 units
    // would split the pair into a lone high surrogate) and max=7 must
    // not truncate at all (7 code points despite 8 UTF-16 units) — the
    // counting rule Spark substring/length and DuckDB substr/length use
    val s = "abc" + astral + "xyz"
    for (impl <- Seq[(String, Int) => String](
        TextExtractor.clean(_, _),
        graft.functions.CleanText.cleanJava(_, _),
        FastHtml.htmlToText(_: String, _: Int))) {
      assert(impl(s, 3) == "abc...")
      assert(impl(s, 4) == "abc" + astral + "...") // pair kept whole
      assert(impl(s, 7) == s)                      // 7 code points: no cut
      assert(impl(s, 6) == "abc" + astral + "xy...")
    }
  }
}
