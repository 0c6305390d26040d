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
            if (r.text.isEmpty) {
              // scanned-document split: a text-empty PDF that carries image
              // XObjects is a SCANNED doc, not a broken one — label it so a
              // pipeline can route it to PdfImages.imagesDf + a vision/OCR
              // stage (the reference OCRs these via rasterize+LLM,
              // pdf_processor.py:35-44) instead of discarding it as error
              val scanned = PdfParser.extractImages(payload)
                .map(_.nonEmpty).getOrElse(false)
              if (scanned) Extracted("error", "pdf", "", Nil, r.pages, "pdf_image_only")
              else Extracted("error", "pdf", "", Nil, 0, "pdf_no_text")
            } else Extracted("ok", "pdf", r.text, pdfSpans(r.pageTexts), r.pages, null)
          case Left(err) => Extracted("error", "pdf", "", Nil, 0, err)
        }
      } else {
        val media = sniffMedia(payload)
        if (media != null)
          // error-as-data with an HONEST label: without this, a JPEG in
          // the crawl lands in the HTML branch as content_type="html",
          // error="invalid_utf8" and poisons any filter on broken html
          Extracted("error", media, "", Nil, 0, "unsupported_media")
        else HtmlExtractor.extractBytes(payload)
      }
    } catch {
      case e: Throwable => // belt and braces: kernels are total, but X7 demands it
        Extracted("error", "unknown", "", Nil, 0, "extract_failed:" + e.getClass.getSimpleName)
    }
  }

  /** Magic-byte sniff for non-text media. The reference accepts arbitrary
    * uploads (orchestrator.py:69-81, any extension); here the equivalent is
    * labeling them honestly: JPEG/PNG/GIF/WEBP → "image", other RIFF
    * (WAV/AVI), OGG, MP3-with-ID3, MP4-family → "media". Returns null for
    * anything else (falls through to the HTML branch). */
  def sniffMedia(p: Array[Byte]): String = {
    def at(i: Int): Int = if (i < p.length) p(i) & 0xff else -1
    def ascii(off: Int, s: String): Boolean = {
      var k = 0
      while (k < s.length) { if (at(off + k) != s.charAt(k).toInt) return false; k += 1 }
      true
    }
    // short text-like magics carry extra structural checks so a plain-text
    // doc that merely STARTS with "ID3 ..." or "RIFF..." isn't swallowed:
    // OggS requires stream-structure version 0, ID3v2 sync-safe size bytes
    // (high bit clear), ftyp a plausible leading box size, generic RIFF an
    // uppercase 4CC form type
    def upper4(off: Int): Boolean =
      (0 until 4).forall { k => val c = at(off + k); (c >= 'A' && c <= 'Z') || c == ' ' }
    if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "image" // JPEG
    else if (at(0) == 0x89 && ascii(1, "PNG\r\n") && at(6) == 0x1a && at(7) == 0x0a) "image"
    else if (ascii(0, "GIF87a") || ascii(0, "GIF89a")) "image"
    else if (ascii(0, "RIFF") && ascii(8, "WEBP")) "image"
    else if (ascii(0, "RIFF") && upper4(8)) "media" // WAV / AVI / other RIFF
    else if (ascii(0, "OggS") && at(4) == 0) "media"
    else if (ascii(0, "ID3") && at(3) >= 2 && at(3) <= 4 // ID3v2.{2,3,4} version byte — a control char, never ASCII text
      && (6 to 9).forall(k => at(k) >= 0 && at(k) < 0x80)) "media"
    else if (ascii(4, "ftyp") && at(0) == 0 && at(1) == 0 && at(2) == 0) "media"
    else null
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
