package graft.fields

import scala.collection.immutable.ListMap

/** Schema-guided structured extraction (SURVEY §2.9 X5): the deterministic
  * replacement for the reference's second LLM pass
  * (/root/reference/mvp/utils/json_extractor.py:9-27). Given the
  * contract-markdown and a caller-supplied JSON schema (data, not
  * metadata — /root/reference/mvp/app.py:25-29), harvest values for the
  * schema's top-level properties from, in priority order:
  *
  *   1. `key: value` lines (incl. `**key:** value` styling),
  *   2. pipe-table columns (header cell → first data row's cell),
  *   3. headings (`# Key` → first following paragraph).
  *
  * Property names are matched case-/space-/punctuation-folded. Documents
  * where nothing matches yield null — the reference's "null for
  * irrelevant documents" rule (/root/reference/mvp/prompts/prompt.py:25-28).
  * Deterministic: first match in document order wins; property order
  * follows the schema.
  */
object FieldExtractor {

  /** Parse the top-level property names out of a JSON-schema string.
    * Tiny tolerant scanner (no external JSON lib): finds the
    * `"properties"` object and collects its immediate keys. Returns
    * None for malformed schemas (driver should fail fast, mirroring
    * app.py:30-31, but as an operator this is error-as-data). */
  def schemaProperties(schemaJson: String): Option[Vector[String]] = {
    if (schemaJson == null) return None
    val idx = schemaJson.indexOf("\"properties\"")
    if (idx < 0) return None
    var i = schemaJson.indexOf('{', idx)
    if (i < 0) return None
    val props = Vector.newBuilder[String]
    var depth = 0
    var inStr = false
    var escaped = false
    val cur = new StringBuilder
    var collecting = false
    var expectKey = true // at depth 1, a string before ':' is a key
    var ok = false
    while (i < schemaJson.length && !ok) {
      val c = schemaJson.charAt(i)
      if (inStr) {
        if (escaped) { cur.append(c); escaped = false }
        else if (c == '\\') escaped = true
        else if (c == '"') {
          inStr = false
          if (collecting && depth == 1 && expectKey) props += cur.toString
          collecting = false
        } else cur.append(c)
      } else c match {
        case '{' => depth += 1; expectKey = true
        case '}' => depth -= 1; if (depth == 0) ok = true
        case '[' => depth += 100 // arrays: never key context
        case ']' => depth -= 100
        case '"' => inStr = true; cur.clear(); collecting = true
        case ':' => expectKey = false
        case ',' => expectKey = true
        case _ => ()
      }
      i += 1
    }
    if (!ok) None else Some(props.result())
  }

  /** Fold a name for matching: lowercase, alphanumerics only. */
  def fold(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetterOrDigit(c)) sb.append(Character.toLowerCase(c))
      i += 1
    }
    sb.toString
  }

  private def stripStyling(s: String): String =
    s.replaceAll("\\*\\*([^*]+)\\*\\*", "$1").replaceAll("\\*([^*]+)\\*", "$1").trim

  /** Harvest `properties` from contract-markdown. Returns None when no
    * property matched (the null-for-irrelevant rule). */
  def harvest(markdown: String, properties: Vector[String]): Option[ListMap[String, String]] = {
    if (markdown == null || markdown.isEmpty || properties.isEmpty) return None
    val lines = markdown.split("\n", -1)
    val folded = properties.map(p => p -> fold(p))

    // pass 1: key: value lines
    val kvPattern = "^\\s*\\*{0,2}([^:|#]{1,80}?)\\*{0,2}\\s*:\\s*(.+?)\\s*$".r
    val kv = scala.collection.mutable.LinkedHashMap.empty[String, String]
    lines.foreach {
      case kvPattern(k, v) =>
        val fk = fold(k)
        if (fk.nonEmpty && !kv.contains(fk)) kv(fk) = stripStyling(v)
      case _ => ()
    }

    // pass 2: first table's header -> first data row
    val tableCells = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val tableLines = lines.dropWhile(l => !isTableLine(l))
    if (tableLines.nonEmpty) {
      val rows = tableLines.takeWhile(isTableLine).map(splitRow)
        .filterNot(_.forall(c => c.forall(ch => ch == '-' || ch == ' ')))
      if (rows.length >= 2) {
        val header = rows.head.map(h => fold(stripStyling(h)))
        val data = rows(1).map(stripStyling)
        header.zipWithIndex.foreach { case (h, i) =>
          if (h.nonEmpty && i < data.length && !tableCells.contains(h)) tableCells(h) = data(i)
        }
      }
    }

    // pass 3: headings -> first following non-blank, non-heading line
    val headings = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var li = 0
    while (li < lines.length) {
      val l = lines(li)
      if (l.startsWith("#")) {
        val name = fold(l.dropWhile(_ == '#'))
        if (name.nonEmpty && !headings.contains(name)) {
          var j = li + 1
          while (j < lines.length && lines(j).trim.isEmpty) j += 1
          if (j < lines.length && !lines(j).startsWith("#"))
            headings(name) = stripStyling(lines(j))
        }
      }
      li += 1
    }

    val out = ListMap.newBuilder[String, String]
    var any = false
    folded.foreach { case (orig, fk) =>
      val v = kv.get(fk).orElse(tableCells.get(fk)).orElse(headings.get(fk))
      v.foreach { value => out += (orig -> value); any = true }
    }
    if (any) Some(out.result()) else None
  }

  private def isTableLine(l: String): Boolean = {
    val t = l.trim
    t.startsWith("|") && t.endsWith("|") && t.length > 2
  }

  private def splitRow(l: String): Vector[String] = {
    val t = l.trim.stripPrefix("|").stripSuffix("|")
    // honor the escaped pipes the table renderer emits
    t.replace("\\|", "\u0001").split("\\|", -1).toVector
      .map(_.replace("\u0001", "|").trim)
  }

  /** The full X5 operator: markdown + schema string → matched fields, or
    * null (None) for irrelevant docs / malformed schema. */
  def extractFields(markdown: String, schemaJson: String): Option[Map[String, String]] =
    schemaProperties(schemaJson).flatMap(props => harvest(markdown, props))
}
