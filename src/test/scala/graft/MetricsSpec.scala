package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.metrics.{Metrics, SequenceMatcher}

/** Metric-kernel fixtures (reference: /root/reference/mvp/evaluation/eval.py:145-267).
  * SequenceMatcher expectations pinned with CPython 3 difflib (incl. autojunk).
  */
class MetricsSpec extends AnyFunSuite {
  private val eps = 1e-12
  private def ~=(a: Double, b: Double) = math.abs(a - b) < eps

  test("cer: zero guards and known distances (eval.py:145-150)") {
    assert(~=(Metrics.cer("", ""), 0.0))
    assert(~=(Metrics.cer("", "x"), 1.0))
    assert(~=(Metrics.cer("abc", ""), 1.0))
    assert(~=(Metrics.cer("kitten", "sitting"), 3.0 / 6))
    assert(~=(Metrics.cer("  abc  ", "abc"), 0.0)) // strips first
  }

  test("wer: zero guards and token distances (eval.py:152-157)") {
    assert(~=(Metrics.wer("", ""), 0.0))
    assert(~=(Metrics.wer("", "word"), 1.0))
    assert(~=(Metrics.wer("the cat sat", "the cat mat"), 1.0 / 3))
    assert(~=(Metrics.wer("a b c d", "a b c"), 1.0 / 4))
  }

  test("word_accuracy: multiset not set (eval.py:159-166)") {
    assert(~=(Metrics.wordAccuracy("a a b", "a b b"), 2.0 / 3))
    assert(~=(Metrics.wordAccuracy("", "x"), 0.0))
    assert(~=(Metrics.wordAccuracy("A B", "a b"), 1.0)) // lowercased
    assert(~=(Metrics.wordAccuracy("x y z", "q r s"), 0.0))
  }

  test("table_accuracy: multiset cell overlap (eval.py:184-195)") {
    assert(~=(Metrics.tableAccuracy("| a | b |\n| a | c |", "| a | a | b |"), 3.0 / 4))
    assert(~=(Metrics.tableAccuracy("no tables here", "| a |"), 0.0))
    assert(~=(Metrics.tableAccuracy("| a |", "nothing"), 0.0))
  }

  test("table_structure_accuracy: exact first-match-with-break semantics") {
    val s = Metrics.tableStructureAccuracy("| a | b |\n| 1 | 2 |", "| a | b |\n| 1 | 2 |")
    assert(~=(s.rowAccuracy, 1.0) && ~=(s.columnAccuracy, 1.0) && ~=(s.cellAccuracy, 1.0))
    val none = Metrics.tableStructureAccuracy("plain", "| a |")
    assert(~=(none.rowAccuracy, 0.0) && ~=(none.columnAccuracy, 0.0) && ~=(none.cellAccuracy, 0.0))
  }

  test("table_structure_accuracy quirk: no-break cell loop can exceed 1.0") {
    // two hyp tables both match the single ref table's shape -> cells double-counted,
    // exactly as eval.py:229-234 does (loop has no break)
    val s = Metrics.tableStructureAccuracy(
      "| a | b |\n| 1 | 2 |",
      "| a | b |\n| 1 | 2 |\nx\n| c | d |\n| 3 | 4 |")
    assert(~=(s.rowAccuracy, 1.0))
    assert(~=(s.columnAccuracy, 1.0))
    assert(~=(s.cellAccuracy, 2.0))
  }

  test("SequenceMatcher.ratio matches CPython difflib (no autojunk)") {
    assert(~=(SequenceMatcher.ratio("", ""), 1.0))
    assert(~=(SequenceMatcher.ratio("abc", ""), 0.0))
    assert(~=(SequenceMatcher.ratio("abc", "abc"), 1.0))
    assert(~=(SequenceMatcher.ratio("abcd", "bcde"), 0.75))
    assert(~=(SequenceMatcher.ratio("kitten", "sitting"), 0.6153846153846154))
    assert(~=(SequenceMatcher.ratio("the quick brown fox", "the quick brown dog"), 0.8947368421052632))
    assert(~=(SequenceMatcher.ratio("private Thread currentThread;",
      "private volatile Thread currentThread;"), 0.8656716417910447))
  }

  test("SequenceMatcher.ratio matches CPython difflib autojunk path (len(b)>=200)") {
    assert(~=(SequenceMatcher.ratio("a" * 100 + "b" * 50, "a" * 150 + "b" * 100), 0.5))
    assert(~=(SequenceMatcher.ratio("x" + "ab" * 120, "y" + "ab" * 120 + "z"), 0.0))
    assert(~=(SequenceMatcher.ratio("hello world " * 30, "hello there world " * 25),
      0.014814814814814815))
  }

  test("SequenceMatcher.ratio matches CPython difflib on the 300-case fuzz corpus") {
    // fixtures/seqmatcher_cases.jsonl: seeded random + near-dup pairs,
    // 128 of them on the autojunk path, expected ratios computed by
    // CPython 3.11 difflib (generation commands in the file's git log)
    val src = scala.io.Source.fromFile("fixtures/seqmatcher_cases.jsonl", "UTF-8")
    val cases = try src.getLines().toVector finally src.close()
    assert(cases.size == 300)
    def field(line: String, k: String): String = {
      val i = line.indexOf("\"" + k + "\": ")
      val start = i + k.length + 4
      if (line.charAt(start) == '"') {
        val sb = new StringBuilder
        var j = start + 1
        while (line.charAt(j) != '"') { // corpus alphabet has no escapes except none
          sb.append(line.charAt(j)); j += 1
        }
        sb.toString
      } else line.substring(start).takeWhile(c => c != ',' && c != '}')
    }
    cases.foreach { line =>
      val a = field(line, "a"); val b = field(line, "b")
      val want = field(line, "ratio").toDouble
      val got = SequenceMatcher.ratio(a, b)
      assert(~=(got, want), s"drift: a=${a.take(40)}... b=${b.take(40)}... want=$want got=$got")
    }
  }

  test("evaluate_ocr: identical docs score perfectly; metric bounds hold") {
    val md = "# Title\n\nSome **bold** text.\n\n| a | b |\n| --- | --- |\n| 1 | 2 |"
    val m = Metrics.evaluateOcr(md, md)
    assert(~=(m.cer, 0.0) && ~=(m.wer, 0.0) && ~=(m.wordAcc, 1.0))
    assert(~=(m.tableAcc, 1.0) && ~=(m.sequenceSimilarity, 1.0))
    assert(~=(m.rowAccuracy, 1.0) && ~=(m.columnAccuracy, 1.0) && ~=(m.cellAccuracy, 1.0))
  }

  test("failed-row imputation values (eval.py:290-301)") {
    val f = Metrics.failedRow
    assert(f.cer == 1.0 && f.wer == 1.0 && f.wordAcc == 0.0 && f.tableAcc == 0.0 &&
      f.sequenceSimilarity == 0.0 && f.rowAccuracy == 0.0 &&
      f.columnAccuracy == 0.0 && f.cellAccuracy == 0.0)
  }
}
