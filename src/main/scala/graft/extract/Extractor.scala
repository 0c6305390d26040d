package graft.extract

import graft.model.{Extracted, Span}
import graft.pdf.PdfParser

/** Content-type dispatch + unified per-document extraction kernel.
  *
  * The reference dispatches on HTTP content-type / filename extension
  * (/root/reference/mvp/orchestrator.py:21-24); here the payload is a
  * `binary` column, so dispatch is magic-byte sniffing (`%PDF-` prefix) with
  * the url extension as tiebreaker — SURVEY.md §2.2 P1.
  *
  * Per-row error capture (X7): any malformed document yields a
  * status='error' row; the job never fails (mirrors
  * ground_truth_prediciton.py:74-82).
  */
object Extractor {

  /** One document → Extracted. Pure, deterministic, total. */
  def extract(url: String, payload: Array[Byte]): Extracted = {
    try {
      if (payload == null || payload.isEmpty)
        Extracted("error", "unknown", "", Nil, 0, "empty_payload")
      else if (PdfParser.isPdf(payload) || urlExt(url) == "pdf") {
        PdfParser.parse(payload) match {
          case Right(r) =>
            if (r.text.isEmpty) Extracted("error", "pdf", "", Nil, 0, "pdf_no_text")
            else Extracted("ok", "pdf", r.text, pdfSpans(r.pageTexts), r.pages, null)
          case Left(err) => Extracted("error", "pdf", "", Nil, 0, err)
        }
      } else {
        HtmlExtractor.extractBytes(payload)
      }
    } catch {
      case e: Throwable => // belt and braces: kernels are total, but X7 demands it
        Extracted("error", "unknown", "", Nil, 0, "extract_failed:" + e.getClass.getSimpleName)
    }
  }

  /** filename extension dispatch (orchestrator.py:22), generalized to urls. */
  def urlExt(url: String): String = {
    if (url == null) return ""
    val path = url.takeWhile(c => c != '?' && c != '#')
    val dot = path.lastIndexOf('.')
    val slash = path.lastIndexOf('/')
    if (dot > slash && dot >= 0) path.substring(dot + 1).toLowerCase(java.util.Locale.ROOT)
    else ""
  }

  /** Page-level spans for PDF text: each page's [start,end) in the joined
    * text (pages joined by "\n\n"). */
  private def pdfSpans(pageTexts: Vector[String]): Seq[Span] = {
    val spans = Vector.newBuilder[Span]
    var start = 0L
    pageTexts.zipWithIndex.foreach { case (t, i) =>
      spans += Span(start, start + t.length, "page")
      start += t.length + (if (i < pageTexts.length - 1) 2 else 0)
    }
    spans.result()
  }
}
