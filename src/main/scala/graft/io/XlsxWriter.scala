package graft.io

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal dependency-free .xlsx writer (SURVEY §2.1 K2 — the reference's
  * two-sheet Excel report, eval.py:325-338 / ground_truth_prediciton.py:
  * 122-148). XLSX is a zip of OOXML parts; this emits the smallest valid
  * set ([Content_Types], rels, workbook, one worksheet per sheet, minimal
  * styles) with inline strings — no shared-string table, no external
  * libraries, deterministic bytes for a given input (fixed zip timestamps).
  *
  * Intended for REPORT-sized data (the eval summary/detail tables, bounded
  * by the golden set) — not a distributed sink; mirrors the reference's
  * driver-side pandas ExcelWriter.
  */
object XlsxWriter {

  final case class Sheet(name: String, header: Seq[String], rows: Seq[Seq[Any]])

  /** A1-style column name for 0-based index (0→A, 25→Z, 26→AA). */
  def colName(i: Int): String = {
    var n = i
    val sb = new StringBuilder
    while (n >= 0) {
      sb.insert(0, ('A' + n % 26).toChar)
      n = n / 26 - 1
    }
    sb.toString
  }

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => () // illegal in XML 1.0
      case c => sb.append(c)
    }
    sb.toString
  }

  private def cell(ref: String, v: Any): String = v match {
    case null => ""
    case n: Byte => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Short => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
    // NaN/Infinity are invalid inside a numeric <v> (Excel refuses the
    // whole workbook); eval metrics can go non-finite on degenerate
    // inputs, so surface them as inline strings instead
    case n: Float if java.lang.Float.isFinite(n) => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Double if java.lang.Double.isFinite(n) => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Float => s"""<c r="$ref" t="inlineStr"><is><t>$n</t></is></c>"""
    case n: Double => s"""<c r="$ref" t="inlineStr"><is><t>$n</t></is></c>"""
    case n: java.math.BigDecimal => s"""<c r="$ref"><v>${n.toPlainString}</v></c>"""
    case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
    case other => s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(other.toString)}</t></is></c>"""
  }

  private def sheetXml(s: Sheet): String = {
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    val all = s.header +: s.rows
    all.zipWithIndex.foreach { case (row, r) =>
      sb.append(s"""<row r="${r + 1}">""")
      row.zipWithIndex.foreach { case (v, c) =>
        sb.append(cell(s"${colName(c)}${r + 1}", v))
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    sb.toString
  }

  def write(path: String, sheets: Seq[Sheet]): Unit = {
    require(sheets.nonEmpty, "xlsx needs at least one sheet")
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
        sheets.indices.map(i =>
          s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString +
        """</Types>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>"""
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
        sheets.zipWithIndex.map { case (s, i) =>
          s"""<sheet name="${esc(s.name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString +
        """</sheets></workbook>"""
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        sheets.indices.map(i =>
          s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""").mkString +
        s"""<Relationship Id="rId${sheets.length + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
        """</Relationships>"""
    val styles =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        """<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>""" +
        """<fills count="1"><fill><patternFill patternType="none"/></fill></fills>""" +
        """<borders count="1"><border/></borders>""" +
        """<cellStyleXfs count="1"><xf/></cellStyleXfs>""" +
        """<cellXfs count="1"><xf xfId="0"/></cellXfs>""" +
        """</styleSheet>"""

    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      def put(name: String, content: String): Unit = {
        val e = new ZipEntry(name)
        e.setTime(0L) // deterministic bytes: fixed timestamp
        zos.putNextEntry(e)
        zos.write(content.getBytes(UTF_8))
        zos.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", wbRels)
      put("xl/styles.xml", styles)
      sheets.zipWithIndex.foreach { case (s, i) =>
        put(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(s))
      }
    } finally zos.close()
  }
}
