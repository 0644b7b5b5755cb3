package graft

import scala.collection.mutable
import org.scalatest.funsuite.AnyFunSuite

import graft.link.AhoCorasick

/** Equivalence fuzz for the automaton (incl. the dense-DFA fast path)
  * against a naive indexOf-based oracle implementing the same spec:
  * lowercase match, ASCII word-boundary validity, leftmost-longest
  * non-overlapping selection. */
class AhoCorasickSpec extends AnyFunSuite {

  private def isWordChar(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') ||
    (c >= 'A' && c <= 'Z') || c == '_'

  /** independent oracle: scan every pattern with indexOf. */
  private def naive(patterns: Seq[String], text: String): Seq[(Int, Int, Int)] = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val hits = mutable.ArrayBuffer.empty[(Int, Int, Int)]
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var from = 0
      var i = lower.indexOf(p, from)
      while (i >= 0) {
        val end = i + p.length
        val ok = (i == 0 || !isWordChar(lower.charAt(i - 1))) &&
          (end == lower.length || !isWordChar(lower.charAt(end)))
        if (ok) hits += ((i, end, pi))
        from = i + 1
        i = lower.indexOf(p, from)
      }
    }
    val sorted = hits.sortBy { case (b, e, _) => (b, -(e - b)) }
    val sel = mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var lastEnd = 0
    sorted.foreach { case h @ (b, e, _) =>
      if (b >= lastEnd) { sel += h; lastEnd = e }
    }
    sel.toSeq
  }

  test("fuzz: automaton (DFA path) == naive oracle on adversarial texts") {
    val patterns = Seq("ab", "abc", "b", "bc", "cold flux1", "cold flux14",
      "zorvex1", "zorvex12", "a_b", "x1").sorted
    val ac = AhoCorasick.build(patterns)
    val alphabet = "abcx1 4_.éZ\t"
    val rnd = new scala.util.Random(7)
    (0 until 3000).foreach { t =>
      val text = (0 until (1 + rnd.nextInt(40)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = ac.findMentions(text)
      val want = naive(patterns, text)
      assert(got == want, s"text=<$text>")
    }
  }

  test("fuzz: large pattern set still matches oracle (stress fail links)") {
    val rnd = new scala.util.Random(13)
    val alphabet = "abc"
    val patterns = (0 until 200).map(_ =>
      (0 until (1 + rnd.nextInt(6)))
        .map(_ => alphabet(rnd.nextInt(3))).mkString).distinct.sorted
    val ac = AhoCorasick.build(patterns)
    (0 until 1000).foreach { _ =>
      val text = (0 until (1 + rnd.nextInt(60)))
        .map(_ => "abc .".charAt(rnd.nextInt(5))).mkString
      assert(ac.findMentions(text) == naive(patterns, text), s"<$text>")
    }
  }

  test("java-serialization roundtrip (cluster broadcast path) preserves matching") {
    // local-mode broadcasts may skip ser/deser, so pin it explicitly: the
    // @transient DFA must rebuild on the deserialized copy
    val patterns = Seq("ab", "abc", "cold flux1", "zorvex12").sorted
    val ac = AhoCorasick.build(patterns)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(ac); oos.close()
    val ois = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val ac2 = ois.readObject().asInstanceOf[AhoCorasick]
    val texts = Seq("ab abc cold flux1 zorvex12.", "xabcx", "", "é ab_c ab")
    texts.foreach { t =>
      assert(ac2.findMentions(t) == ac.findMentions(t), s"<$t>")
    }
  }

  test("boundary semantics: underscore is a word char, non-ASCII is not") {
    val ac = AhoCorasick.build(Seq("spark"))
    assert(ac.findMentions("spark_x").isEmpty)   // '_' joins the word
    assert(ac.findMentions("x_spark").isEmpty)
    assert(ac.findMentions("ésparké").nonEmpty)  // é is a boundary (RE2 \b)
    assert(ac.findMentions("SPARK!").nonEmpty)
  }

  test("lowerPreserving never changes string length (offset safety)") {
    // String.toLowerCase would turn U+0130 into "i" + U+0307 (len 1 → 2),
    // shifting every later mention span; the per-char fold must not
    val tricky = Seq("İstanbul spark İ", "ẞHARP spark", "ÅNGSTRÖM spark",
      "ﬁn spark", "ＳＰＡＲＫ spark")
    tricky.foreach { t =>
      val low = AhoCorasick.lowerPreserving(t)
      assert(low.length == t.length, s"<$t>")
    }
    // and the spans it yields index the ORIGINAL text correctly
    val ac = AhoCorasick.build(Seq("spark"))
    tricky.foreach { t =>
      val hits = ac.findMentions(t)
      assert(hits.nonEmpty, s"<$t>")
      hits.foreach { case (b, e, _) =>
        assert(t.substring(b, e).equalsIgnoreCase("spark"), s"<$t>")
      }
    }
    // already-lowercase input returns the SAME instance (no copy)
    val plain = "already lower 123"
    assert(AhoCorasick.lowerPreserving(plain) eq plain)
  }

  test("Gazetteer refuses cross-type norm collisions, tolerates same-type dups") {
    // last-wins collapse would silently mistype every mention of the
    // losing entry (its triples then dropped by the claim-shape checks)
    intercept[IllegalArgumentException] {
      graft.link.Gazetteer(Seq(
        graft.link.GazEntry("ACHE", "Gene"),
        graft.link.GazEntry("ache", "AdverseEvent")))
    }
    // same type after folding is a plain duplicate — fine
    val gaz = graft.link.Gazetteer(Seq(
      graft.link.GazEntry("Aspirin", "Drug"),
      graft.link.GazEntry("ASPIRIN", "Drug")))
    assert(gaz.nodeType("aspirin").contains("Drug"))
  }

  test("evidence sentence never splits a surrogate pair") {
    val gaz = graft.link.Gazetteer(Seq(
      graft.link.GazEntry("aspirin", "Drug"),
      graft.link.GazEntry("tp53", "Gene")))
    val rules = Map("binds" -> ("DRUG_TARGET", "Drug", "Gene"))
    // an astral char (U+1F600, a surrogate PAIR) directly after the object
    // mention: its high surrogate is a boundary (non-word), and a char
    // end+1 cut would keep only that lone surrogate in the sentence
    val text = "aspirin binds tp53😀 trailing"
    val ts = graft.link.TripleExtractor.triplesOf(gaz, rules, "u", text)
    assert(ts.size == 1)
    val s = ts.head.sentence
    assert(s == "aspirin binds tp53😀", s"got <$s>")
    // no lone surrogates anywhere (round-trips through UTF-8 unchanged)
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    assert(new String(bytes, java.nio.charset.StandardCharsets.UTF_8) == s)
  }

  test("Gazetteer folds mixed-case entry norms (matchable + lookupable)") {
    val gaz = graft.link.Gazetteer(Seq(
      graft.link.GazEntry("Aspirin", "Drug"),
      graft.link.GazEntry("TP53", "Gene")))
    assert(gaz.nodeType("aspirin").contains("Drug"))
    val ments = graft.link.MentionDetector
      .mentionsOf(gaz, "u", "ASPIRIN binds tp53 today")
    assert(ments.map(_.norm).toSet == Set("aspirin", "tp53"))
    assert(ments.forall(m => gaz.nodeType(m.norm).nonEmpty))
  }
}
