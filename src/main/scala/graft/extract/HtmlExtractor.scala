package graft.extract

import scala.collection.mutable.ArrayBuffer
import graft.html.{Elem, TextN, TreeBuilder, Node}
import graft.model.{Extracted, Span}

/** From-scratch main-content extractor for HTML (north_star: jsoup-free DOM
  * tokenizer + text-density / link-density heuristics a la Boilerpipe /
  * Readability, tag-tree pruning with per-node char / anchor-char ratios).
  *
  * Replaces the reference's image→LLM call
  * (/root/reference/mvp/utils/ocr_client.py:14-29); the OUTPUT obeys the
  * reference's markdown contract (/root/reference/mvp/prompts/prompt.py:9-22):
  * all visible text verbatim, pipe-markdown tables preserving row/col order
  * and `**bold**`, exact `#` headings, bullets only for real lists, no code
  * fences, no invented syntax.
  *
  * Fully deterministic: no wallclock, no randomness, stable traversal order.
  */
object HtmlExtractor {

  /** Tags whose subtrees are never content. */
  private val dropTags = Set(
    "script", "style", "noscript", "template", "iframe", "svg", "canvas",
    "form", "button", "select", "input", "textarea", "label", "object",
    "nav", "header", "footer", "aside")

  /** id/class tokens that mark boilerplate containers. */
  private val dropClassRe =
    ("(?:^|[\\s_-])(nav|navbar|menu|footer|header|sidebar|side-bar|advert|advertisement|ads?|banner|" +
      "breadcrumbs?|cookie|consent|social|share|sharing|comments?|related|widget|promo|" +
      "subscribe|newsletter|pagination|skip|masthead|byline-sharing)(?:$|[\\s_-])").r

  private val blockTags = Set(
    "p", "div", "section", "article", "main", "body", "html",
    "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li", "table",
    "blockquote", "pre", "figure", "figcaption", "dl", "dt", "dd",
    "tr", "td", "th", "thead", "tbody", "tfoot", "caption", "hr", "address")

  // ---------------------------------------------------------------- entry

  /** Extract from raw bytes. Strict UTF-8 first; if that fails, honor a
    * `<meta charset=...>` / http-equiv Content-Type declaration in the first
    * 2 KiB (crawl corpora are full of declared windows-1252 / iso-8859-1
    * pages). Undeclared or unknown-charset invalid UTF-8 stays an error row
    * — guessing encodings silently would break byte-reproducibility. */
  def extractBytes(payload: Array[Byte]): Extracted = {
    if (payload == null || payload.isEmpty)
      return Extracted("error", "html", "", Nil, 0, "empty_payload")
    val decoded =
      try {
        val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        Right(dec.decode(java.nio.ByteBuffer.wrap(payload)).toString)
      } catch {
        case _: java.nio.charset.CharacterCodingException =>
          declaredCharset(payload) match {
            case Some(cs) =>
              try Right(new String(payload, cs))
              catch { case _: Throwable => Left("invalid_" + cs.name.toLowerCase(java.util.Locale.ROOT)) }
            case None => Left("invalid_utf8")
          }
      }
    decoded match {
      case Left(err)   => Extracted("error", "html", "", Nil, 0, err)
      case Right(html) =>
        extract(if (html.nonEmpty && html.charAt(0) == '\ufeff') html.substring(1) else html)
    }
  }

  private val metaCharsetRe =
    "(?i)<meta[^>]+charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9_][A-Za-z0-9._-]*)".r

  /** Charset declared in the head of the document, if parseable and not
    * UTF-8 itself (a declared-UTF-8 page that failed strict decode is
    * genuinely malformed). */
  private def declaredCharset(payload: Array[Byte]): Option[java.nio.charset.Charset] = {
    val head = new String(payload, 0, math.min(2048, payload.length),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    metaCharsetRe.findFirstMatchIn(head).map(_.group(1)).flatMap { name =>
      try {
        val cs = java.nio.charset.Charset.forName(name)
        if (cs == java.nio.charset.StandardCharsets.UTF_8) None else Some(cs)
      } catch { case _: Throwable => None }
    }
  }

  /** Extract main content from an HTML string. Never throws. */
  def extract(html: String): Extracted =
    try {
      val root = TreeBuilder.parse(html)
      prune(root)
      val content = selectContent(root)
      val (markdown, spans) = render(content)
      if (markdown.isEmpty)
        Extracted("error", "html", "", Nil, 0, "no_content")
      else
        Extracted("ok", "html", markdown, spans, 1, null)
    } catch {
      case e: Throwable =>
        Extracted("error", "html", "", Nil, 0, "extract_failed:" + e.getClass.getSimpleName)
    }

  // ---------------------------------------------------------------- prune

  /** Remove non-content subtrees in place (tag- and class/id-based). */
  private def prune(e: Elem): Unit = {
    e.children.filterInPlace {
      case el: Elem =>
        !(dropTags.contains(el.tag) || isBoilerplateClass(el))
      case _ => true
    }
    e.children.foreach { case el: Elem => prune(el); case _ => }
  }

  private def isBoilerplateClass(el: Elem): Boolean = {
    if (el.attrs.isEmpty) return false // hot path: most elements carry no attrs
    val cls = el.attr("class"); val id = el.attr("id"); val role = el.attr("role")
    if (cls.isEmpty && id.isEmpty && role.isEmpty) return false
    val marker = (cls + " " + id + " " + role).toLowerCase(java.util.Locale.ROOT)
    dropClassRe.findFirstIn(" " + marker + " ").isDefined
  }

  // ------------------------------------------------------------- scoring

  /** (total text chars, chars under <a>) for a subtree — the per-node
    * char-count / anchor-char ratio of the north_star. */
  private def charCounts(e: Elem, underA: Boolean = false): (Long, Long) = {
    var chars = 0L
    var anchor = 0L
    e.children.foreach {
      case t: TextN =>
        val len = countNonWs(t.data)
        chars += len
        if (underA) anchor += len
      case el: Elem =>
        val (c, a) = charCounts(el, underA || el.tag == "a")
        chars += c; anchor += a
    }
    (chars, anchor)
  }

  private def countNonWs(s: String): Long = {
    var n = 0; var i = 0
    while (i < s.length) { if (!s.charAt(i).isWhitespace) n += 1; i += 1 }
    n.toLong
  }

  /** id/class tokens that mark the main content container (Readability's
    * positive-hint idea) — worth a score boost, not an absolute pick,
    * because link farms also like to call themselves "content". */
  private val contentClassRe =
    ("(?:^|[\\s_-])(article|content|entry|main|post|story|body|text|blog)" +
      "(?:$|[\\s_-])").r

  private def hasContentClass(el: Elem): Boolean = {
    if (el.attrs.isEmpty) return false
    val cls = el.attr("class"); val id = el.attr("id")
    if (cls.isEmpty && id.isEmpty) return false
    val marker = (cls + " " + id).toLowerCase(java.util.Locale.ROOT)
    contentClassRe.findFirstIn(" " + marker + " ").isDefined
  }

  /** Pick the content root: <main> if present, else <article>, else the
    * best-scoring block container (score = chars * (1 - linkDensity)^2,
    * ×2 for content-marked id/class, ties broken by document order). */
  private def selectContent(root: Elem): Elem = {
    root.findFirst("main").orElse(root.findFirst("article")).getOrElse {
      // (elem, boosted score, raw score, depth, pre-order idx): boosted picks
      // the winner, raw decides whether a deeper candidate is a thin-wrapper
      // strip. Counts come from ONE bottom-up pass (walk returns its
      // subtree's (chars, anchor-chars)) so deeply nested div soups stay
      // O(n) instead of O(depth*n); tie-breaks use the pre-order index so
      // selection order is identical to the old pre-order walk.
      val candidates = ArrayBuffer.empty[(Elem, Double, Double, Int, Int)]
      var preIdx = 0
      def walk(e: Elem, depth: Int): (Long, Long) = {
        val myIdx = preIdx
        preIdx += 1
        var chars = 0L; var anchor = 0L
        e.children.foreach {
          case t: TextN => chars += countNonWs(t.data)
          case el: Elem =>
            val (c, a) = walk(el, depth + 1)
            chars += c
            anchor += (if (el.tag == "a") c else a)
        }
        if ((e.tag == "div" || e.tag == "section" || e.tag == "body" || e.tag == "td")
            && chars > 0) {
          val ld = anchor.toDouble / chars
          val raw = chars * (1.0 - ld) * (1.0 - ld)
          val boost = if (hasContentClass(e)) 2.0 else 1.0
          candidates += ((e, raw * boost, raw, depth, myIdx))
        }
        (chars, anchor)
      }
      walk(root, 0)
      if (candidates.isEmpty) root
      else {
        // winner = max boosted score (doc-order first on ties). Then
        // descend to the DEEPEST candidate inside the winner's subtree
        // that retains >= 90% of the winner's RAW content mass — i.e. the
        // winner is just a thin wrapper adding <=10% residue around it.
        // Raw (unboosted) mass is the subset test on purpose: a
        // content-classed comments box holding 45% of the page would pass
        // a boosted-score comparison and silently drop the article.
        var top = candidates.head
        candidates.foreach { c =>
          if (c._2 > top._2 || (c._2 == top._2 && c._5 < top._5)) top = c
        }
        val inTop = java.util.Collections.newSetFromMap(
          new java.util.IdentityHashMap[Elem, java.lang.Boolean]())
        def mark(e: Elem): Unit = {
          inTop.add(e)
          e.children.foreach { case el: Elem => mark(el); case _ => }
        }
        mark(top._1)
        // deepest qualifying candidate, doc-order-first on depth ties
        candidates.filter(c => inTop.contains(c._1) && c._3 >= top._3 * 0.9)
          .maxBy(c => (c._4, -c._5))._1
      }
    }
  }

  // ------------------------------------------------------------ rendering

  /** Render a subtree to contract-markdown, recording block spans. */
  def render(content: Elem): (String, Vector[Span]) = {
    val sb = new StringBuilder
    val spans = Vector.newBuilder[Span]

    def emitBlock(text: String, kind: String): Unit = {
      val t = text.trim
      if (t.nonEmpty) {
        if (sb.nonEmpty) sb.append("\n\n")
        val start = sb.length.toLong
        sb.append(t)
        spans += Span(start, sb.length.toLong, kind)
      }
    }

    def walkBlocks(e: Elem): Unit = e.children.foreach {
      case t: TextN =>
        // stray text directly inside a container: para if non-blank
        val s = collapseWs(t.data)
        if (s.trim.nonEmpty) emitBlock(s, "para")
      case el: Elem => el.tag match {
        case h if h.length == 2 && h.charAt(0) == 'h' && h.charAt(1) >= '1' && h.charAt(1) <= '6' =>
          val level = h.charAt(1) - '0'
          emitBlock(("#" * level) + " " + inline(el), "heading")
        case "p" | "blockquote" | "figcaption" | "caption" | "address" | "dt" | "dd" =>
          // a paragraph that drowns in links is residual boilerplate
          val (c, a) = charCounts(el)
          if (c == 0 || a.toDouble / c <= 0.66 || c > 200) {
            emitBlock(inline(el), "para")
          }
        case "pre" =>
          // verbatim text, no code fences (contract rule 7)
          emitBlock(el.allText.trim, "para")
        case "ul" => emitBlock(renderList(el, ordered = false), "list")
        case "ol" => emitBlock(renderList(el, ordered = true), "list")
        case "table" => emitBlock(renderTable(el), "table")
        case "br" | "hr" | "img" => // no visible text of their own
        case "a" =>
          // a block-level anchor directly inside the content root is
          // visible text (contract rule 1: all visible text verbatim);
          // link FARMS are handled upstream by prune() and the paragraph
          // link-density rule, not by silently dropping anchors here
          emitBlock(inline(el), "para")
        case _ =>
          if (blockTags.contains(el.tag)) walkBlocks(el)
          else {
            // inline element floating at block level: render as paragraph
            val s = inline(el)
            if (s.trim.nonEmpty) emitBlock(s, "para")
          }
      }
    }

    walkBlocks(content)
    (sb.toString, spans.result())
  }

  /** Inline rendering: text with `**bold**` preserved (b/strong), HTML
    * whitespace collapsed; links contribute their anchor text only. */
  def inline(e: Elem): String = {
    val sb = new StringBuilder
    def rec(n: Node): Unit = n match {
      case t: TextN => sb.append(t.data)
      case el: Elem => el.tag match {
        case "b" | "strong" =>
          val innerSb = new StringBuilder
          el.children.foreach { c => renderInto(c, innerSb) }
          val inner = collapseWs(innerSb.toString).trim
          if (inner.nonEmpty) sb.append("**").append(inner).append("**")
        case "br" => sb.append('\n')
        case "script" | "style" => ()
        case _ => el.children.foreach(rec)
      }
    }
    def renderInto(n: Node, out: StringBuilder): Unit = n match {
      case t: TextN => out.append(t.data)
      case el: Elem if el.tag == "br" => out.append(' ')
      case el: Elem => el.children.foreach(c => renderInto(c, out))
    }
    e.children.foreach(rec)
    collapseWs(sb.toString).trim
  }

  /** Collapse HTML whitespace runs to single spaces, preserving \n from <br>. */
  private def collapseWs(s: String): String = {
    val sb = new StringBuilder(s.length)
    var lastWs = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\n') { // from <br>
        while (sb.nonEmpty && sb.charAt(sb.length - 1) == ' ') sb.setLength(sb.length - 1)
        sb.append('\n'); lastWs = true
      } else if (c.isWhitespace || c.toInt == 0xa0) {
        if (!lastWs) { sb.append(' '); lastWs = true }
        else if (sb.nonEmpty && sb.charAt(sb.length - 1) == '\n') () // swallow after \n
      } else { sb.append(c); lastWs = false }
      i += 1
    }
    sb.toString
  }

  /** Real lists only (contract rule 5): "- " bullets / "1." numbering. */
  private def renderList(list: Elem, ordered: Boolean): String = {
    val items = ArrayBuffer.empty[String]
    list.children.foreach {
      case el: Elem if el.tag == "li" =>
        val s = inline(el)
        if (s.nonEmpty) items += s
      case _ =>
    }
    items.zipWithIndex.map { case (s, i) =>
      if (ordered) s"${i + 1}. $s" else s"- $s"
    }.mkString("\n")
  }

  /** Pipe-markdown table preserving row/col order and **bold** (contract
    * rule 2). First tr = header (th or td); every row rendered; separator
    * sized to the header. */
  def renderTable(table: Elem): String = {
    val trs = table.findAll("tr")
    if (trs.isEmpty) return ""
    def cells(tr: Elem): Vector[String] = {
      val out = Vector.newBuilder[String]
      def rec(e: Elem): Unit = e.children.foreach {
        case el: Elem =>
          if (el.tag == "td" || el.tag == "th") out += inline(el).replace("|", "\\|").replace("\n", " ")
          else rec(el)
        case _ =>
      }
      rec(tr)
      out.result()
    }
    val rows = trs.map(cells).filter(_.nonEmpty)
    if (rows.isEmpty) return ""
    val lines = ArrayBuffer.empty[String]
    lines += rows.head.mkString("| ", " | ", " |")
    lines += Vector.fill(rows.head.length)("---").mkString("| ", " | ", " |")
    rows.tail.foreach(r => lines += r.mkString("| ", " | ", " |"))
    lines.mkString("\n")
  }
}
