package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pdf.PdfParser

/** Embedded-image harvest over a pages table: the scanned-document leg of
  * the extraction pipeline. Where the reference rasterizes whole pages and
  * OCRs the pixels (/root/reference/mvp/utils/pdf_processor.py:35-44,
  * ocr_client.py:14-29), this engine ships each embedded image XObject's
  * bytes UNDECODED as a typed binary row — a DCTDecode stream is already a
  * complete JPEG file — so a downstream vision/OCR stage (the multimodal
  * ops in [[graft.ops.Multimodal]]) gets exactly the input it wants
  * without the engine carrying raster codecs.
  *
  * Scale shape: purely narrow. The UDF emits a per-document array that
  * `explode` fans out inside the partition; no shuffle, no driver
  * involvement, and the payload bytes are touched exactly once.
  */
object PdfImages {

  /** Public (not private): the UDF's result serializer is codegen'd, and
    * Janino cannot call accessors on a private nested class — Spark then
    * silently falls back to interpreted serialization for every row
    * (observed as a CodeGenerator ERROR + stack trace per Verify run). */
  case class ImgRow(page: Int, img_name: String, format: String,
      width: Int, height: Int, color_space: String, bits: Int,
      data: Array[Byte])

  private val harvest = udf { payload: Array[Byte] =>
    if (payload == null || !PdfParser.isPdf(payload)) Seq.empty[ImgRow]
    else PdfParser.extractImages(payload) match {
      case Right(imgs) => imgs.map(i => ImgRow(i.page, i.name, i.format,
        i.width, i.height, i.colorSpace, i.bitsPerComponent, i.data))
      case Left(_) => Seq.empty[ImgRow]
    }
  }

  /** One row per embedded image XObject reference: (url, page, img_name,
    * format, width, height, color_space, bits, data). Documents without
    * images (or that aren't PDFs) simply produce no rows. */
  def imagesDf(pages: DataFrame, urlCol: String = "url",
      payloadCol: String = "payload"): DataFrame =
    pages
      .select(col(urlCol), explode(harvest(col(payloadCol))).as("img"))
      .select(col(urlCol), col("img.*"))
}
