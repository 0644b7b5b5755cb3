package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.{PageSynth, TextExtractor}

/** Byte-identity of the text-extraction spec: pure-Scala oracle vs the
  * distributed Column pipeline (the north-rule per-url invariant). Fuzzed
  * deterministically (splitmix64) over whitespace/markup/unicode pieces.
  */
class ExtractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val pieces: Array[String] = Array(
    "abc", "Zorvex12", " ", "\t", "\n", "", "\f", "\r", "  \t ",
    "<b>", "</b>", "&amp;", "&nbsp;", "&lt;", ".", ",", "é", "züge",
    " ", "x" * 50, "")

  private def fuzz(i: Long): String = {
    val n = (PageSynth.splitmix64(i) & 0x1F).toInt
    (0 until n).map { k =>
      pieces((PageSynth.splitmix64(i * 131 + k) & 0x7FFFFFFF).toInt % pieces.length)
    }.mkString
  }

  test("clean: pure vs Column — byte identical on 500 fuzzed strings") {
    val texts = (0L until 500L).map(fuzz)
    val got = texts.toDF("t").select(TextExtractor.cleanCol(col("t"), 40))
      .as[String].collect().toSeq
    val want = texts.map(t => TextExtractor.clean(t, 40))
    assert(got == want)
  }

  test("clean semantics: collapse, strip, truncate") {
    assert(TextExtractor.clean("  a \t b\n\nc  ") == "a b c")
    assert(TextExtractor.clean("x" * 10001) == "x" * 10000 + "...")
    assert(TextExtractor.clean("", 10) == "")
    assert(TextExtractor.clean(" \t\r\n", 10) == "")
    // vertical tab is whitespace in our pinned class
    assert(TextExtractor.clean("ab") == "a b")
    // NBSP is NOT in the pinned class (Python \s parity)
    assert(TextExtractor.clean("a b") == "a b")
  }

  test("htmlToText: pure vs Column — byte identical on synthesized pages") {
    val htmls = (0L until 200L).map(i => PageSynth.html(i))
    val got = htmls.toDF("h").select(col("h").cast("binary").as("h"))
      .select(TextExtractor.htmlToTextCol(col("h"))).as[String]
      .collect().toSeq
    val want = htmls.map(h => TextExtractor.htmlToText(h, TextExtractor.MaxChars))
    assert(got == want)
  }

  test("htmlToText: scripts/styles/comments/entities handled") {
    val h = "<html><script>var a = '<div>';</script><style>p{}</style>" +
      "<!-- note --><p>A &amp; B&nbsp;&lt;ok&gt;</p></html>"
    assert(TextExtractor.htmlToText(h, 10000) == "A & B <ok>")
  }
}
