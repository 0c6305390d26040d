package graft.pdf

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Deflater

/** Minimal deterministic PDF writer — exists so the from-scratch parser is
  * testable with zero external data (SURVEY.md §7.1.2). Emits PDF 1.4 with a
  * classic xref table, Helvetica text, per-page content streams (raw or
  * FlateDecode), optional /Rotate, 1-2 columns.
  *
  * Page geometry mirrors the reference's letter-at-72dpi view of a page
  * (/root/reference/mvp/utils/pdf_processor.py:35-39 renders at dpi/72 zoom).
  */
object PdfWriter {

  final case class PageSpec(
      columns: Vector[Vector[String]], // 1 or 2 columns of text lines
      rotate: Int = 0,                 // 0 / 90 / 180 / 270
      compress: Boolean = false)

  private val pageW = 612
  private val pageH = 792
  private val margin = 72
  private val leading = 14
  private val fontSize = 11

  /** Escape a PDF literal string. */
  private def esc(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c => c.toString
    }

  /** Map text to WinAnsi bytes (Latin-1 subset; others replaced by '?'). */
  private def winAnsi(s: String): String =
    s.map(c => if (c.toInt < 256) c else '?')

  private def contentStream(spec: PageSpec): Array[Byte] = {
    val sb = new StringBuilder
    val colX = if (spec.columns.length == 2) Vector(margin, pageW / 2 + 18) else Vector(margin)
    spec.columns.zipWithIndex.foreach { case (lines, ci) =>
      val x = colX(math.min(ci, colX.length - 1))
      sb.append(s"BT\n/F1 $fontSize Tf\n$leading TL\n$x ${pageH - margin} Td\n")
      lines.zipWithIndex.foreach { case (line, li) =>
        val t = esc(winAnsi(line))
        if (li == 0) sb.append(s"($t) Tj\n")
        else sb.append(s"T*\n($t) Tj\n")
      }
      sb.append("ET\n")
    }
    val raw = sb.toString.getBytes(ISO_8859_1)
    if (!spec.compress) raw
    else {
      val d = new Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length * 2 + 64)
      val out = new ByteArrayOutputStream()
      while (!d.finished()) {
        val n = d.deflate(buf)
        out.write(buf, 0, n)
      }
      d.end()
      out.toByteArray
    }
  }

  /** Build a complete PDF from page specs. */
  def write(pages: Vector[PageSpec]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]

    // object numbering: 1 catalog, 2 pages, 3 font,
    // then per page i: obj 4+2i page, obj 5+2i content
    val nPages = pages.length
    val total = 3 + 2 * nPages

    w("%PDF-1.4\n")
    def beginObj(n: Int): Unit = { offsets += out.size(); w(s"$n 0 obj\n") }

    beginObj(1)
    w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    val kids = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    w(s"<< /Type /Pages /Kids [$kids] /Count $nPages /MediaBox [0 0 $pageW $pageH] >>\nendobj\n")
    beginObj(3)
    w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>\nendobj\n")

    pages.zipWithIndex.foreach { case (spec, i) =>
      val pageObj = 4 + 2 * i
      val contObj = 5 + 2 * i
      beginObj(pageObj)
      val rot = if (spec.rotate != 0) s" /Rotate ${spec.rotate}" else ""
      w(s"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 3 0 R >> >> " +
        s"/Contents $contObj 0 R$rot >>\nendobj\n")
      beginObj(contObj)
      val data = contentStream(spec)
      val filter = if (spec.compress) " /Filter /FlateDecode" else ""
      w(s"<< /Length ${data.length}$filter >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }

    val xrefPos = out.size()
    w(s"xref\n0 ${total + 1}\n")
    w("0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${total + 1} /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }
}
