package graft.textnorm

import java.util.regex.Pattern
import graft.html.{Elem, TextN, TreeBuilder}

/** Exact behavioral port of the reference's text-normalization and
  * markdown-table kernels:
  *
  *  - `normalize` = `normalize_text` (/root/reference/mvp/evaluation/eval.py:11-77)
  *  - `htmlTableToMarkdown` = `html_table_to_markdown` (eval.py:79-117)
  *  - `extractTable` = `extract_table` (eval.py:168-182)
  *
  * Regexes are compiled with UNIX_LINES so `^` under MULTILINE matches only
  * after `\n`, as in Python, and Python's `\s` is replaced by the explicit
  * class [[PyStr.WS]].
  */
object TextNorm {

  private val WS = PyStr.WS
  // Step 3: collapse runs of ASCII space; then normalize newlines
  private val pSpaces  = Pattern.compile(" +")
  private val pNewline = Pattern.compile("\r\n|\r")
  // Step 5: styling strips — order matters (bold before italics)
  private val pBold    = Pattern.compile("\\*\\*([^*]+)\\*\\*")
  private val pItalic1 = Pattern.compile("\\*([^*]+)\\*")
  private val pItalic2 = Pattern.compile("_([^_]+)_")
  private val pCode    = Pattern.compile("`([^`]+)`")
  // Step 6: bullet normalization, MULTILINE with Python-\s and \n-only ^
  private val pBullet  = Pattern.compile(
    "^[" + WS + "]*[*+][" + WS + "]*", Pattern.MULTILINE | Pattern.UNIX_LINES)
  // Final cleanup: collapse blank lines
  private val pBlank   = Pattern.compile("\n[" + WS + "]*\n")
  // Fallback tag stripper (eval.py:45)
  private val pTag     = Pattern.compile("<[^>]+>")

  /** normalize_text — steps N1-N8 of SURVEY.md section 2.8. */
  def normalize(textIn: String): String = {
    if (textIn == null || textIn.isEmpty) return ""
    // N1: strip + unescape literal \n \t \r
    var text = PyStr.strip(textIn)
    text = text.replace("\\n", "\n").replace("\\t", "\t").replace("\\r", "\r")

    // N2: HTML tables -> markdown tables, then strip remaining tags (get_text)
    text =
      try {
        val root = TreeBuilder.parse(text)
        replaceTablesAndGetText(root)
      } catch {
        case _: Throwable => pTag.matcher(text).replaceAll("")
      }

    // N3: whitespace collapse (same order as eval.py:49-51)
    text = pSpaces.matcher(text).replaceAll(" ")
    text = pNewline.matcher(text).replaceAll("\n")

    // N4: lowercase
    text = PyStr.lower(text)

    // N5: styling strip (bold, then *italics*, then _italics_, then `code`)
    text = pBold.matcher(text).replaceAll("$1")
    text = pItalic1.matcher(text).replaceAll("$1")
    text = pItalic2.matcher(text).replaceAll("$1")
    text = pCode.matcher(text).replaceAll("$1")

    // N6: bullet normalization
    text = pBullet.matcher(text).replaceAll("- ")

    // N7: per-line Python strip
    text = text.split("\n", -1).map(PyStr.strip).mkString("\n")

    // N8: blank-line removal + final strip
    text = pBlank.matcher(text).replaceAll("\n")
    PyStr.strip(text)
  }

  /** Walk the tree; each <table> subtree is replaced by its pipe-markdown
    * rendering, everything else contributes its text (BS4
    * `table.replace_with(md)` + `soup.get_text()`, eval.py:37-42). */
  private def replaceTablesAndGetText(root: Elem): String = {
    val sb = new StringBuilder
    def rec(e: Elem): Unit = e.children.foreach {
      case t: TextN => sb.append(t.data)
      case el: Elem =>
        if (el.tag == "table") sb.append(htmlTableToMarkdown(el))
        else rec(el)
    }
    rec(root)
    sb.toString
  }

  /** html_table_to_markdown (eval.py:79-117): first <tr> supplies the header
    * (th or td cells, text stripped); remaining <tr>s supply data rows from
    * their <td>s only; empty rows dropped; render as pipe table with a
    * `---` separator sized to the header. */
  def htmlTableToMarkdown(table: Elem): String = {
    try {
      val trs = table.findAll("tr")
      val rows = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
      if (trs.nonEmpty) {
        val headerCells = cellsOf(trs.head, thToo = true)
        rows += headerCells // note: appended even if empty, as in eval.py:87-89
        trs.tail.foreach { tr =>
          val row = cellsOf(tr, thToo = false)
          if (row.nonEmpty) rows += row
        }
      }
      if (rows.isEmpty) return ""
      val lines = scala.collection.mutable.ArrayBuffer.empty[String]
      lines += rows.head.mkString("| ", " | ", " |")
      lines += Vector.fill(rows.head.length)("---").mkString("| ", " | ", " |")
      rows.tail.foreach(r => lines += r.mkString("| ", " | ", " |"))
      lines.mkString("\n")
    } catch {
      case _: Throwable => table.allText // fallback (eval.py:115-117)
    }
  }

  /** Cells of one <tr> in document order: th+td for the header row, td only
    * for data rows; get_text(strip=True) per cell. */
  private def cellsOf(tr: Elem, thToo: Boolean): Vector[String] = {
    val out = Vector.newBuilder[String]
    def rec(e: Elem): Unit = e.children.foreach {
      case el: Elem =>
        if (el.tag == "td" || (thToo && el.tag == "th")) out += el.strippedText
        else rec(el)
      case _ =>
    }
    rec(tr)
    out.result()
  }

  /** extract_table (eval.py:168-182): lines containing '|' accumulate rows
    * (cells split on '|', stripped, empties dropped); a line without '|'
    * closes the current table. Returns tables as rows of cells. */
  def extractTable(text: String): Vector[Vector[Vector[String]]] = {
    val tables = Vector.newBuilder[Vector[Vector[String]]]
    var current = Vector.newBuilder[Vector[String]]
    var currentNonEmpty = false
    // Python str.splitlines() splits on \n \r \r\n \v \f \x1c-\x1e \x85
    splitLines(text).foreach { line =>
      if (line.contains("|")) {
        val row = line.split("\\|", -1).toVector.map(PyStr.strip).filter(_.nonEmpty)
        if (row.nonEmpty) { current += row; currentNonEmpty = true }
      } else if (currentNonEmpty) {
        tables += current.result()
        current = Vector.newBuilder[Vector[String]]
        currentNonEmpty = false
      }
    }
    if (currentNonEmpty) tables += current.result()
    tables.result()
  }

  /** Python str.splitlines() line-boundary set. */
  def splitLines(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val n = s.length
    var start = 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val isBreak = c == '\n' || c == '\r' || c.toInt == 0x0b || c.toInt == 0x0c ||
        (c.toInt >= 0x1c && c.toInt <= 0x1e) || c.toInt == 0x85 ||
        c.toInt == 0x2028 || c.toInt == 0x2029
      if (isBreak) {
        out += s.substring(start, i)
        if (c == '\r' && i + 1 < n && s.charAt(i + 1) == '\n') i += 1
        i += 1
        start = i
      } else i += 1
    }
    if (start < n) out += s.substring(start, n)
    out.result()
  }
}
