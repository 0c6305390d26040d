package graft.synth

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import graft.model.Page
import graft.pdf.PdfWriter
import graft.pdf.PdfWriter.PageSpec

/** Deterministic generator of the `pages` corpus (FIXTURES.md §1): Common-
  * Crawl-style web pages with Zipf-skewed hosts, ~90% HTML / ~10% PDF, a
  * malformed slice, boilerplate-heavy layouts, entity-laden text, and
  * 1-3 pipe-convertible tables. Seeded per-document (no wallclock, no shared
  * RNG state) so any row can be regenerated independently on any executor —
  * this is what makes the corpus safe to build distributed at 100 TB scale.
  */
object Synth {

  private val langs = Vector("en", "de", "es", "fr", "zh")
  private val baseEpoch = 1693872000000L // 2023-09-05T00:00:00Z, fixed

  private val wordBank: Vector[String] = Vector(
    "analysis", "report", "quarterly", "revenue", "growth", "market", "index",
    "signal", "measure", "capacity", "vector", "matrix", "stream", "batch",
    "window", "filter", "compact", "archive", "summary", "detail", "metric",
    "sample", "series", "season", "volume", "margin", "factor", "target",
    "budget", "output", "input", "model", "design", "system", "engine",
    "column", "record", "cursor", "buffer", "shard", "merge", "joint",
    "branch", "release", "version", "update", "change", "review", "audit")

  private val entities = Vector("&amp;", "&lt;", "&gt;", "&nbsp;", "&ndash;",
    "&eacute;", "&uuml;", "&copy;", "&hellip;", "&deg;")

  /** Deterministic splittable RNG: one instance per (seed, docIndex). */
  final class Rng(seed: Long) {
    private var state: Long = seed * 0x9e3779b97f4a7c15L + 0x123456789abcdefL
    def nextLong(): Long = { // splitmix64
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextInt(bound: Int): Int = {
      val r = nextLong() % bound
      (if (r < 0) r + bound else r).toInt
    }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  }

  /** Zipf-skewed host: host rank h with P(h) ∝ 1/(h+1); 100 hosts. */
  private def host(rng: Rng): String = {
    val u = rng.nextDouble()
    // inverse CDF of 1/(h+1) over h=0..99 (harmonic normalization ≈ 5.187)
    val hNorm = (1 to 100).map(1.0 / _).sum
    var acc = 0.0
    var h = 0
    var i = 1
    var found = false
    while (i <= 100 && !found) {
      acc += 1.0 / i / hNorm
      if (u < acc) { h = i - 1; found = true }
      i += 1
    }
    if (!found) h = 99
    f"host-$h%04d.example"
  }

  private def sentence(rng: Rng, words: Int): String = {
    val ws = (0 until words).map(_ => wordBank(rng.nextInt(wordBank.length)))
    ws.head.capitalize + " " + ws.tail.mkString(" ") + "."
  }

  private def maybeEntity(rng: Rng): String =
    if (rng.nextInt(4) == 0) " " + entities(rng.nextInt(entities.length)) + " " else " "

  private def htmlTable(rng: Rng, rows: Int, cols: Int): String = {
    val sb = new StringBuilder("<table>\n<tr>")
    (0 until cols).foreach(c => sb.append(s"<th>Col ${('A' + c).toChar}</th>"))
    sb.append("</tr>\n")
    (0 until rows).foreach { r =>
      sb.append("<tr>")
      (0 until cols).foreach { c =>
        val v = rng.nextInt(10000)
        if (c == 0 && rng.nextInt(3) == 0) sb.append(s"<td><b>$v</b></td>")
        else sb.append(s"<td>$v</td>")
      }
      sb.append("</tr>\n")
    }
    sb.append("</table>")
    sb.toString
  }

  /** One complete HTML page: nav/header/sidebar/footer boilerplate around a
    * main article with headings, paragraphs, list, tables, entities. */
  def htmlDoc(rng: Rng, docIdx: Long): String = {
    val title = sentence(rng, 3).dropRight(1)
    val nParas = 2 + rng.nextInt(5)
    val nTables = rng.nextInt(3)
    val sb = new StringBuilder
    sb.append("<!DOCTYPE html>\n<html>\n<head>\n")
    sb.append(s"<title>$title</title>\n")
    sb.append("<style>.x { color: red; }</style>\n")
    sb.append("<script>var tracker = 'should never appear';</script>\n")
    sb.append("</head>\n<body>\n")
    sb.append("<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> <a href=\"/contact\">Contact</a></nav>\n")
    sb.append("<header><h1>Site Banner Not Content</h1></header>\n")
    sb.append("<div class=\"sidebar\"><ul><li><a href=\"/x\">Link one</a></li><li><a href=\"/y\">Link two</a></li></ul></div>\n")
    sb.append("<div id=\"cookie-banner\">We use cookies.</div>\n")
    sb.append("<article>\n")
    sb.append(s"<h1>$title</h1>\n")
    (0 until nParas).foreach { p =>
      if (p > 0 && rng.nextInt(3) == 0)
        sb.append(s"<h2>${sentence(rng, 2).dropRight(1)}</h2>\n")
      val boldWord = wordBank(rng.nextInt(wordBank.length))
      sb.append(s"<p>${sentence(rng, 8 + rng.nextInt(10))}${maybeEntity(rng)}" +
        s"<strong>$boldWord</strong> ${sentence(rng, 6 + rng.nextInt(8))}</p>\n")
    }
    if (rng.nextInt(2) == 0) {
      sb.append("<ul>\n")
      (0 until 2 + rng.nextInt(3)).foreach(_ => sb.append(s"<li>${sentence(rng, 4)}</li>\n"))
      sb.append("</ul>\n")
    }
    (0 until nTables).foreach { _ =>
      sb.append(htmlTable(rng, 2 + rng.nextInt(4), 2 + rng.nextInt(3)))
      sb.append("\n")
    }
    sb.append("</article>\n")
    sb.append("<div class=\"related\"><a href=\"/r1\">Related A</a> <a href=\"/r2\">Related B</a></div>\n")
    sb.append("<footer>Copyright &copy; 2023 host. All rights reserved.</footer>\n")
    sb.append("</body>\n</html>\n")
    sb.toString
  }

  /** Minimal PDF payload via our own writer: 1-3 pages, 1-2 columns, mixed
    * compression, one deterministic rotated slice. */
  def pdfDoc(rng: Rng, docIdx: Long): Array[Byte] = {
    val nPages = 1 + rng.nextInt(3)
    val pages = (0 until nPages).map { p =>
      val cols = 1 + rng.nextInt(2)
      val linesPerCol = 3 + rng.nextInt(5)
      val columns = (0 until cols).map { c =>
        val heading = if (p == 0 && c == 0) Vector("# " + sentence(rng, 3).dropRight(1)) else Vector.empty
        heading ++ (0 until linesPerCol).map(_ => sentence(rng, 5 + rng.nextInt(5)))
      }.map(_.toVector).toVector
      // the rng draw stays (stream position feeds later draws); which
      // filter chain a compressed page gets derives from the index alone
      val compress = rng.nextInt(2) == 0
      val chain: Vector[PdfWriter.Filter] =
        if (!compress) Vector.empty
        else ((docIdx + p) % 5) match {
          case 0 => Vector(PdfWriter.FlateF)
          case 1 => Vector(PdfWriter.LzwF)
          case 2 => Vector(PdfWriter.Ascii85F, PdfWriter.FlateF)
          case 3 => Vector(PdfWriter.RunLengthF)
          case _ => Vector(PdfWriter.AsciiHexF, PdfWriter.LzwF)
        }
      PageSpec(columns,
        rotate = if (docIdx % 17 == 0 && p == 0) 90 else 0,
        filters = chain)
    }.toVector
    // xref + font flavors derive from the index alone (no rng draws!) so
    // the text content — and therefore the frozen goldens — is identical
    // across container/filter/font formats; only the PDF plumbing differs
    // (synth sentences are pure ASCII, losslessly expressible in all three
    // font encodings)
    val flavor =
      if (docIdx % 3 == 1)
        PdfWriter.XrefStream(objStm = (docIdx / 3) % 2 == 0, predictor = (docIdx / 6) % 2 == 0)
      else PdfWriter.Classic
    val font = (docIdx % 7) match {
      case 5 => PdfWriter.Type0Font
      case 6 => PdfWriter.DifferencesFont
      case _ => PdfWriter.WinAnsiFont
    }
    PdfWriter.write(pages, flavor, font, formXObject = docIdx % 11 == 3)
  }

  /** Malformed corpus slice (FIXTURES.md: must yield status='error' rows or
    * lenient degradation, never a job failure). */
  def malformedDoc(rng: Rng, kind: Int): Array[Byte] = kind match {
    case 0 => Array.emptyByteArray                                   // empty payload
    case 1 => Array[Byte](0xff.toByte, 0xfe.toByte, 0x00, 0x01, 0x80.toByte) // invalid UTF-8
    case 2 => "<html><body><div><p>Unclosed everywhere".getBytes(UTF_8)
    case 3 => ("<html><body><p>stray " + "< tags < here</p>").getBytes(UTF_8)
    case 4 =>
      val good = PdfWriter.write(Vector(PageSpec(Vector(Vector("truncated pdf")))))
      java.util.Arrays.copyOfRange(good, 0, good.length / 3) // truncated PDF
    case _ => "%PDF-1.4\ngarbage no xref".getBytes(UTF_8)
  }

  /** Non-text media payloads (real magic bytes, deterministic filler) —
    * a crawl always carries stray images/audio; the extractor must label
    * them content_type image/media with error=unsupported_media, never
    * mislabel them as broken HTML. */
  def mediaDoc(rng: Rng, i: Long): (String, Array[Byte]) = {
    val filler = new Array[Byte](64 + rng.nextInt(192))
    var j = 0
    while (j < filler.length) { filler(j) = rng.nextLong().toByte; j += 1 }
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    (i % 5) match {
      case 0 => ("jpg", b(0xff, 0xd8, 0xff, 0xe0) ++ "JFIF".getBytes(UTF_8) ++ filler)
      case 1 => ("png", b(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n') ++ filler)
      case 2 => ("gif", "GIF89a".getBytes(UTF_8) ++ filler)
      case 3 => ("webp", "RIFF".getBytes(UTF_8) ++ b(0, 1, 0, 0) ++ "WEBP".getBytes(UTF_8) ++ filler)
      case _ => ("wav", "RIFF".getBytes(UTF_8) ++ b(0, 1, 0, 0) ++ "WAVE".getBytes(UTF_8) ++ filler)
    }
  }

  /** Generate document i of a corpus with the given seed. ~87% HTML /
    * ~10% PDF / ~3% non-text media; every 23rd row malformed. */
  def page(seed: Long, i: Long): Page = {
    val rng = new Rng(seed ^ (i * 0x5851f42d4c957f2dL + 0x14057b7ef767814fL))
    val h = host(rng)
    val lang = langs(rng.nextInt(langs.length))
    val ts = new Timestamp(baseEpoch + i * 1000L)
    val isMalformed = i % 23 == 13
    // index-derived (no rng draw) so every non-media row's rng stream —
    // and therefore its frozen golden — is untouched by this slice
    val isMedia = !isMalformed && i % 29 == 11
    val isPdf = !isMalformed && rng.nextInt(10) == 0 && !isMedia
    if (isMalformed) {
      val kind = rng.nextInt(6)
      val ext = if (kind >= 4) "pdf" else "html"
      Page(f"https://$h/broken/doc-$i%07d.$ext", ts, malformedDoc(rng, kind), null, lang)
    } else if (isMedia) {
      val (ext, bytes) = mediaDoc(rng, i)
      Page(f"https://$h/media/asset-$i%07d.$ext", ts, bytes, null, lang)
    } else if (isPdf) {
      Page(f"https://$h/docs/doc-$i%07d.pdf", ts, pdfDoc(rng, i), null, lang)
    } else {
      val html = htmlDoc(rng, i)
      Page(f"https://$h/articles/art-$i%07d.html", ts, html.getBytes(UTF_8),
        null, lang)
    }
  }

  /** Deterministic opaque bytes: xorshift body between an optional magic
    * prefix/suffix, padded to exactly `len` (or the magic length if larger).
    * Seeded per call — safe to regenerate independently on any executor. */
  def detBytes(seed: Long, len: Int,
      prefix: Array[Byte] = Array.emptyByteArray,
      suffix: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val out = new Array[Byte](math.max(len, prefix.length + suffix.length))
    System.arraycopy(prefix, 0, out, 0, prefix.length)
    System.arraycopy(suffix, 0, out, out.length - suffix.length, suffix.length)
    var x = seed | 1L
    var i = prefix.length
    while (i < out.length - suffix.length) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      out(i) = (x & 0xff).toByte
      i += 1
    }
    out
  }

  /** Deterministic fake JPEG: real SOI/APP0 + EOI markers around seeded
    * filler — enough structure for magic-byte sniffing, zero codec work. */
  def fakeJpeg(seed: Long, len: Int): Array[Byte] =
    detBytes(seed, len,
      Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte),
      Array(0xff, 0xd9).map(_.toByte))

  /** Materialize [0, n) as a distributed Dataset — generation happens on the
    * executors (each row independently seeded), so corpus size is bounded by
    * cluster storage, not driver memory. */
  def pagesDs(spark: org.apache.spark.sql.SparkSession, n: Long, seed: Long = 42L,
              parallelism: Int = 0): org.apache.spark.sql.Dataset[Page] = {
    import spark.implicits._
    val p = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, p).map(i => page(seed, i))
  }
}
