package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.Base64
import graft.extract.Extractor
import graft.synth.Synth

/** Regenerates the frozen golden fixtures (north_rule: byte-identical
  * extracted text per url). Run ONLY with an explicit flag — goldens are
  * generated once, reviewed, committed, and any later byte drift is a
  * regression (SURVEY.md §5.2.2).
  *
  *   sbt "runMain graft.tools.GenGoldens --regenerate"
  *
  * Output: fixtures/goldens_v1.jsonl — one JSON object per line, sorted by
  * url: {"url","status","content_type","pages","md_b64","spans"} where
  * md_b64 is the base64 of the markdown's UTF-8 bytes (base64 so the
  * contract is exact bytes, immune to JSON-escaping subtleties) and spans
  * is the frozen "start:end:kind" list — the north_rule covers spans per
  * url, not just text.
  */
object GenGoldens {
  val CorpusSeed = 42L
  val CorpusSize = 500L
  val GoldenPath = "fixtures/goldens_v1.jsonl"

  def goldenLines(): Vector[String] = {
    (0L until CorpusSize).map { i =>
      val p = Synth.page(CorpusSeed, i)
      val e = Extractor.extract(p.url, p.html)
      val b64 = Base64.getEncoder.encodeToString(e.markdown.getBytes(UTF_8))
      val err = if (e.error == null) "" else e.error
      val spans = e.spans.map(s => s"${s.start}:${s.end}:${s.kind}").mkString(",")
      s"""{"url":"${p.url}","status":"${e.status}","content_type":"${e.content_type}","pages":${e.pages},"error":"$err","spans":"$spans","md_b64":"$b64"}"""
    }.sortBy(identity).toVector
  }

  def main(args: Array[String]): Unit = {
    require(args.contains("--regenerate"),
      "goldens are frozen; pass --regenerate to overwrite deliberately")
    val lines = goldenLines()
    Files.createDirectories(Paths.get("fixtures"))
    Files.write(Paths.get(GoldenPath),
      (lines.mkString("\n") + "\n").getBytes(UTF_8))
    println(s"wrote ${lines.length} goldens to $GoldenPath")
  }
}
