package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.textnorm.{PyStr, TextNorm}

/** Exact-port fixtures for the normalization kernel
  * (reference: /root/reference/mvp/evaluation/eval.py:11-77,168-182).
  * Expected values hand-derived from the reference semantics.
  */
class TextNormSpec extends AnyFunSuite {

  test("PyStr.strip strips Python whitespace incl. NBSP and \\x1c-\\x1f") {
    assert(PyStr.strip("  x  ") == "x")
    assert(PyStr.strip(" ab ") == "ab")
    assert(PyStr.strip("") == "")
    assert(PyStr.strip("   ") == "")
    assert(PyStr.strip("no-trim") == "no-trim")
  }

  test("PyStr.split tokenizes on whitespace runs dropping empties") {
    assert(PyStr.split("  a  b\tc\n d ").toSeq == Seq("a", "b", "c", "d"))
    assert(PyStr.split("").isEmpty)
    assert(PyStr.split(" \t\n ").isEmpty)
    assert(PyStr.split("one").toSeq == Seq("one"))
  }

  test("N1: strip + escaped literal unescape") {
    assert(TextNorm.normalize("  Hello   World  ") == "hello world")
    assert(TextNorm.normalize("Line1\\nLine2") == "line1\nline2")
    assert(TextNorm.normalize("A\\tB") == "a\tb") // tab survives (only spaces collapse)
  }

  test("N3 order: spaces collapse before CRLF normalization") {
    assert(TextNorm.normalize("a  b\r\nc\rd") == "a b\nc\nd")
  }

  test("N5: styling strip order — bold before italics") {
    assert(TextNorm.normalize("**Bold** and *ital* and _under_ and `code`") ==
      "bold and ital and under and code")
    // bold must not be half-eaten by the italics pass
    assert(TextNorm.normalize("x **b** y") == "x b y")
  }

  test("N6: bullet normalization * and + to '- ', '-' untouched") {
    assert(TextNorm.normalize("* item one\n+ item two\n- item three") ==
      "- item one\n- item two\n- item three")
  }

  test("N6 quirk preserved: two *-bullets get eaten by the italics pass first") {
    // eval.py strips italics (step 5) before bullets (step 6):
    // "* a\n* b" -> italics \*([^*]+)\* matches "* a\n*" -> " a\n b"
    assert(TextNorm.normalize("* a\n* b") == "a\nb")
  }

  test("N7+N8: per-line trim and blank-line collapse") {
    assert(TextNorm.normalize("a\n\n\nb") == "a\nb")
    assert(TextNorm.normalize("  a  \n \n  b  ") == "a\nb")
  }

  test("N2: HTML table converted to pipe markdown, other tags stripped") {
    val in = "<p>Intro</p><table><tr><th>A</th><th>B</th></tr>" +
      "<tr><td>1</td><td>2</td></tr></table>After"
    assert(TextNorm.normalize(in) ==
      "intro| a | b |\n| --- | --- |\n| 1 | 2 |after")
  }

  test("N2: td-only header row accepted; empty rows dropped") {
    val in = "<table><tr><td>H1</td><td>H2</td></tr><tr></tr>" +
      "<tr><td>x</td><td>y</td></tr></table>"
    assert(TextNorm.normalize(in) ==
      "| h1 | h2 |\n| --- | --- |\n| x | y |")
  }

  test("N2: entities decoded, stray '<' survives as text") {
    assert(TextNorm.normalize("a &amp; b") == "a & b")
    assert(TextNorm.normalize("1 < 2 and 3 > 2") == "1 < 2 and 3 > 2")
    assert(TextNorm.normalize("<page_number>3</page_number>") == "3")
  }

  test("normalize is idempotent on already-normal text") {
    val once = TextNorm.normalize("## Head\nBody **b** text\n\n* x\n")
    assert(TextNorm.normalize(once) == once)
  }

  test("extract_table: pipe rows accumulate, non-pipe line closes a table") {
    val t = TextNorm.extractTable("| a | b |\n| --- | --- |\n| 1 | 2 |\ntext\n| x |")
    assert(t == Vector(
      Vector(Vector("a", "b"), Vector("---", "---"), Vector("1", "2")),
      Vector(Vector("x"))))
  }

  test("extract_table: all-empty-cell pipe line is skipped without closing") {
    val t = TextNorm.extractTable("| a |\n|  |\n| b |")
    assert(t == Vector(Vector(Vector("a"), Vector("b"))))
  }

  test("empty / null inputs") {
    assert(TextNorm.normalize("") == "")
    assert(TextNorm.normalize(null) == "")
  }

  test("named entity decoding covers the full HTML4 table") {
    import graft.html.Entities
    assert(Entities.named.size >= 253)
    // spot checks across the ranges: Latin-1, Greek, symbols, markup
    assert(Entities.decode("&Aacute;&aelig;&iquest;") == "\u00c1\u00e6\u00bf")
    assert(Entities.decode("&alpha;&Omega;&sigmaf;") == "\u03b1\u03a9\u03c2")
    assert(Entities.decode("&rarr;&hearts;&sum;&ne;") == "\u2192\u2665\u2211\u2260")
    assert(Entities.decode("&OElig;&permil;&sbquo;") == "\u0152\u2030\u201a")
    assert(Entities.decode("x&shy;y&nbsp;z") == "x\u00ady\u00a0z")
    // unknown + numeric forms unchanged
    assert(Entities.decode("&nosuch;&#65;&#x42;") == "&nosuch;AB")
  }
}

