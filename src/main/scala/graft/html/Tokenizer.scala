package graft.html

import scala.collection.mutable.ArrayBuffer

/** HTML token stream. */
sealed trait Token
final case class StartTag(name: String, attrs: Map[String, String], selfClosing: Boolean) extends Token
final case class EndTag(name: String) extends Token
final case class Text(data: String) extends Token // already entity-decoded
final case class Comment(data: String) extends Token

/** From-scratch HTML tokenizer (no jsoup). Behavior modeled on Python's
  * `html.parser` lenient mode, which the reference relies on through
  * BeautifulSoup (`/root/reference/mvp/evaluation/eval.py:34`):
  *
  *  - `<` begins a tag only when followed by an ASCII letter, `/`, `!`, `?`;
  *    otherwise it is literal text (so `a < b` survives).
  *  - `<!-- ... -->` comments; `<!...>` / `<?...>` bogus markup, skipped.
  *  - Raw-text elements (`script`, `style`, `textarea`, `title`): content is
  *    swallowed verbatim until the matching case-insensitive close tag.
  *  - Attribute values: double-, single-, or un-quoted; entity-decoded.
  *  - Truncated markup at EOF is emitted as literal text (lenient).
  */
object Tokenizer {
  val rawTextElements: Set[String] = Set("script", "style", "textarea", "title")

  private def isAsciiLetter(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  def tokenize(input: String): Vector[Token] = tokenizeBuf(input).toVector

  /** Tokenize without the defensive Vector copy — the parse hot path. */
  private[graft] def tokenizeBuf(input: String): ArrayBuffer[Token] = {
    val out = ArrayBuffer.empty[Token]
    val n = input.length
    var i = 0
    val text = new StringBuilder

    def flushText(): Unit = if (text.nonEmpty) {
      out += Text(Entities.decode(text.toString)); text.clear()
    }

    while (i < n) {
      val c = input.charAt(i)
      if (c != '<') {
        // bulk-scan the text run to the next '<' — most of a document is
        // text between tags, and per-char appends dominate the profile
        val lt = input.indexOf('<', i)
        val end = if (lt < 0) n else lt
        text.underlying.append(input, i, end)
        i = end
      }
      else if (i + 1 >= n) { text.append(c); i += 1 } // trailing '<'
      else {
        val c1 = input.charAt(i + 1)
        if (isAsciiLetter(c1)) {
          parseStartTag(input, i) match {
            case Some((tok, next)) =>
              flushText(); out += tok
              // raw-text mode
              if (!tok.selfClosing && rawTextElements.contains(tok.name)) {
                val close = findCloseTag(input, next, tok.name)
                close match {
                  case Some((cs, ce)) =>
                    if (cs > next) out += Text(input.substring(next, cs)) // raw, NOT entity-decoded
                    out += EndTag(tok.name)
                    i = ce
                  case None =>
                    if (next < n) out += Text(input.substring(next))
                    i = n
                }
              } else i = next
            case None => text.append(c); i += 1 // malformed / truncated: literal '<'
          }
        } else if (c1 == '/') {
          if (i + 2 < n && isAsciiLetter(input.charAt(i + 2))) {
            parseEndTag(input, i) match {
              case Some((tok, next)) => flushText(); out += tok; i = next
              case None              => text.append(c); i += 1
            }
          } else { text.append(c); i += 1 }
        } else if (c1 == '!') {
          if (input.startsWith("<!--", i)) {
            val end = input.indexOf("-->", i + 4)
            flushText()
            if (end < 0) { out += Comment(input.substring(i + 4)); i = n }
            else { out += Comment(input.substring(i + 4, end)); i = end + 3 }
          } else {
            val end = input.indexOf('>', i + 2) // doctype / bogus: skip
            flushText()
            if (end < 0) i = n else i = end + 1
          }
        } else if (c1 == '?') {
          val end = input.indexOf('>', i + 2)
          flushText()
          if (end < 0) i = n else i = end + 1
        } else { text.append(c); i += 1 }
      }
    }
    flushText()
    out
  }

  /** Find `</name` followed by optional junk then '>'. Returns (startIdx, idxAfterGt). */
  private def findCloseTag(input: String, from: Int, name: String): Option[(Int, Int)] = {
    val needle = "</" + name
    var i = from
    val n = input.length
    while (i >= 0 && i < n) {
      i = indexOfIgnoreCase(input, needle, i)
      if (i < 0) return None
      var j = i + needle.length
      // must be followed by whitespace, '/', or '>'
      if (j < n && (input.charAt(j) == '>' || input.charAt(j) == '/' || Character.isWhitespace(input.charAt(j)))) {
        while (j < n && input.charAt(j) != '>') j += 1
        if (j < n) return Some((i, j + 1)) else return Some((i, n))
      } else i += 1
    }
    None
  }

  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val n = hay.length; val m = needle.length
    var i = from
    while (i + m <= n) {
      var k = 0
      while (k < m && Character.toLowerCase(hay.charAt(i + k)) == Character.toLowerCase(needle.charAt(k))) k += 1
      if (k == m) return i
      i += 1
    }
    -1
  }

  /** Parse a start tag at position i (input(i)=='<', letter next).
    * Returns (token, indexAfterGt) or None if truncated before '>'.
    */
  private def isNameChar(c: Char): Boolean =
    isAsciiLetter(c) || Character.isDigit(c) || c == '-' || c == '_' || c == ':'

  /** Lower-cased name slice; skips the StringBuilder when already lower.
    * Non-ASCII falls through to the slow path so unicode case mapping
    * matches a plain per-char Character.toLowerCase loop. */
  private def lowerName(input: String, from: Int, until: Int): String = {
    var k = from
    while (k < until && {
      val c = input.charAt(k)
      !((c >= 'A' && c <= 'Z') || c >= 0x80)
    }) k += 1
    if (k == until) input.substring(from, until)
    else {
      val sb = new java.lang.StringBuilder(until - from)
      var j = from
      while (j < until) { sb.append(Character.toLowerCase(input.charAt(j))); j += 1 }
      sb.toString
    }
  }

  private def parseStartTag(input: String, start: Int): Option[(StartTag, Int)] = {
    val n = input.length
    var i = start + 1
    val nameStart = i
    while (i < n && isNameChar(input.charAt(i))) i += 1
    val tagName = lowerName(input, nameStart, i)
    val attrs = Map.newBuilder[String, String]
    var selfClosing = false
    var done = false
    while (!done) {
      while (i < n && Character.isWhitespace(input.charAt(i))) i += 1
      if (i >= n) return None
      val c = input.charAt(i)
      if (c == '>') { i += 1; done = true }
      else if (c == '/') {
        if (i + 1 < n && input.charAt(i + 1) == '>') { selfClosing = true; i += 2; done = true }
        else i += 1
      } else {
        // attribute name: bulk-scan to the next delimiter, lower-case lazily
        val anStart = i
        while (i < n && !Character.isWhitespace(input.charAt(i)) &&
               input.charAt(i) != '=' && input.charAt(i) != '>' && input.charAt(i) != '/') i += 1
        val an = lowerName(input, anStart, i)
        while (i < n && Character.isWhitespace(input.charAt(i))) i += 1
        if (i < n && input.charAt(i) == '=') {
          i += 1
          while (i < n && Character.isWhitespace(input.charAt(i))) i += 1
          if (i >= n) return None
          val q = input.charAt(i)
          var av: String = null
          if (q == '"' || q == '\'') {
            val close = input.indexOf(q, i + 1)
            if (close < 0) return None
            av = input.substring(i + 1, close)
            i = close + 1
          } else {
            val avStart = i
            while (i < n && !Character.isWhitespace(input.charAt(i)) && input.charAt(i) != '>') i += 1
            av = input.substring(avStart, i)
          }
          if (an.nonEmpty) attrs += an -> Entities.decode(av)
        } else if (an.nonEmpty) attrs += an -> ""
      }
    }
    Some((StartTag(tagName, attrs.result(), selfClosing), i))
  }

  private def parseEndTag(input: String, start: Int): Option[(EndTag, Int)] = {
    val n = input.length
    var i = start + 2
    val nameStart = i
    while (i < n && isNameChar(input.charAt(i))) i += 1
    val tagName = lowerName(input, nameStart, i)
    while (i < n && input.charAt(i) != '>') i += 1
    if (i >= n) None else Some((EndTag(tagName), i + 1))
  }
}
