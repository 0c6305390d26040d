package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.tools.GenGoldens

/** The north_rule invariant: byte-identical extracted text per url against
  * the frozen goldens (fixtures/goldens_v1.jsonl). Any drift in tokenizer,
  * pruning heuristics, renderer, or PDF parser fails here. Goldens are only
  * regenerated via `runMain graft.tools.GenGoldens --regenerate` + review.
  */
class GoldenSpec extends AnyFunSuite {

  private def loadGoldens(): Map[String, (String, String, Int, String, Array[Byte])] = {
    val src = scala.io.Source.fromFile(GenGoldens.GoldenPath, "UTF-8")
    try {
      src.getLines().map { line =>
        def field(k: String): String = {
          val i = line.indexOf("\"" + k + "\":")
          val vstart = line.indexOf('"', i + k.length + 3) + 1
          line.substring(vstart, line.indexOf('"', vstart))
        }
        def intField(k: String): Int = {
          val i = line.indexOf("\"" + k + "\":") + k.length + 3
          line.substring(i).takeWhile(_.isDigit).toInt
        }
        val url = field("url")
        url -> ((field("status"), field("content_type"), intField("pages"),
          field("spans"), Base64.getDecoder.decode(field("md_b64"))))
      }.toMap
    } finally src.close()
  }

  test("every golden byte-identical when regenerated in-process (kernel path)") {
    val goldens = loadGoldens()
    assert(goldens.size == GenGoldens.CorpusSize)
    var checked = 0
    (0L until GenGoldens.CorpusSize).foreach { i =>
      val p = graft.synth.Synth.page(GenGoldens.CorpusSeed, i)
      val e = graft.extract.Extractor.extract(p.url, p.html)
      val (status, ct, pages, spans, mdBytes) = goldens(p.url)
      assert(e.status == status, s"status drift at ${p.url}")
      assert(e.content_type == ct, s"content_type drift at ${p.url}")
      assert(e.pages == pages, s"page count drift at ${p.url}")
      assert(java.util.Arrays.equals(e.markdown.getBytes(UTF_8), mdBytes),
        s"BYTE DRIFT at ${p.url}")
      val gotSpans = e.spans.map(s => s"${s.start}:${s.end}:${s.kind}").mkString(",")
      assert(gotSpans == spans, s"SPAN DRIFT at ${p.url}")
      checked += 1
    }
    assert(checked == 500)
  }

  test("golden comparison join (J3): zero mismatches through the Spark path") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val goldens = loadGoldens().toSeq
      .map { case (url, (status, _, _, _, md)) => (url, status, new String(md, UTF_8)) }
      .toDF("url", "g_status", "g_markdown")
    val pages = graft.synth.Synth.pagesDs(spark, GenGoldens.CorpusSize,
      seed = GenGoldens.CorpusSeed, parallelism = 4).toDF()
    val out = graft.extract.ExtractJob.extractedDf(pages).select(
      $"url", $"extracted.status".as("status"), $"extracted.markdown".as("markdown"))
    // broadcast the golden side (small at test scale — SURVEY §2.3 J3)
    val joined = out.join(broadcast(goldens), Seq("url"), "inner")
    assert(joined.count() == GenGoldens.CorpusSize)
    val mismatches = joined.filter(
      !($"status" <=> $"g_status") || !($"markdown" <=> $"g_markdown")).count()
    assert(mismatches == 0)
  }
}
