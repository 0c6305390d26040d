package graft.html

import scala.collection.mutable.ArrayBuffer

/** Minimal DOM (from scratch — no jsoup). */
sealed trait Node {
  /** Concatenated text in document order (BS4 `get_text()` semantics:
    * every text node including raw-text elements, no separators). */
  def allText(sb: StringBuilder): Unit
  final def allText: String = { val sb = new StringBuilder; allText(sb); sb.toString }
}

final case class TextN(data: String) extends Node {
  def allText(sb: StringBuilder): Unit = sb.append(data)
}

final class Elem(val tag: String, val attrs: Map[String, String]) extends Node {
  val children: ArrayBuffer[Node] = ArrayBuffer.empty
  def allText(sb: StringBuilder): Unit = children.foreach(_.allText(sb))

  def attr(name: String): String = attrs.getOrElse(name, "")

  /** Descendant elements with the given tag (document order), self excluded. */
  def findAll(name: String): Vector[Elem] = {
    val out = Vector.newBuilder[Elem]
    def rec(e: Elem): Unit = e.children.foreach {
      case el: Elem => if (el.tag == name) out += el; rec(el)
      case _        =>
    }
    rec(this)
    out.result()
  }

  /** First descendant element with the given tag, document order. */
  def findFirst(name: String): Option[Elem] = {
    def rec(e: Elem): Option[Elem] = {
      var i = 0
      while (i < e.children.length) {
        e.children(i) match {
          case el: Elem =>
            if (el.tag == name) return Some(el)
            val r = rec(el); if (r.isDefined) return r
          case _ =>
        }
        i += 1
      }
      None
    }
    rec(this)
  }

  /** BS4 `get_text(strip=True)` semantics: each text node Python-stripped,
    * empties dropped, remainder joined with no separator. */
  def strippedText: String = {
    val sb = new StringBuilder
    def rec(e: Elem): Unit = e.children.foreach {
      case t: TextN =>
        val s = graft.textnorm.PyStr.strip(t.data)
        if (s.nonEmpty) sb.append(s)
      case el: Elem => rec(el)
    }
    rec(this)
    sb.toString
  }
}

/** Stack-based tree builder with the implied-end-tag subset that real web
  * boilerplate needs (p, li, tr, td/th, option). Unmatched close tags are
  * dropped; unclosed elements are closed at EOF. Lenient: never throws on
  * any token stream.
  */
object TreeBuilder {
  private val voidElements = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  // opening `key` implicitly closes any open element in the value set
  private val impliedClose: Map[String, Set[String]] = Map(
    "p"  -> Set("p"),
    "li" -> Set("li"),
    "tr" -> Set("tr", "td", "th"),
    "td" -> Set("td", "th"),
    "th" -> Set("td", "th"),
    "option" -> Set("option"),
    "thead" -> Set("tr", "td", "th"),
    "tbody" -> Set("tr", "td", "th", "thead"),
    "tfoot" -> Set("tr", "td", "th", "tbody"),
    // block starters close an open paragraph
    "div" -> Set("p"), "ul" -> Set("p"), "ol" -> Set("p"), "table" -> Set("p"),
    "h1" -> Set("p"), "h2" -> Set("p"), "h3" -> Set("p"),
    "h4" -> Set("p"), "h5" -> Set("p"), "h6" -> Set("p"),
    "blockquote" -> Set("p"), "pre" -> Set("p"), "section" -> Set("p"),
    "article" -> Set("p"), "aside" -> Set("p"), "nav" -> Set("p"),
    "header" -> Set("p"), "footer" -> Set("p"),
  )

  // when implicitly closing for `key`, don't pop past these containers
  private val closeBarrier = Set("table", "ul", "ol", "div", "section", "article",
    "body", "html", "aside", "nav", "header", "footer", "blockquote", "td", "th")

  def build(tokens: scala.collection.Seq[Token]): Elem = {
    val root = new Elem("#root", Map.empty)
    val stack = ArrayBuffer[Elem](root)
    def top = stack.last

    def popTo(target: String): Unit = {
      var idx = stack.length - 1
      while (idx > 0 && stack(idx).tag != target) idx -= 1
      if (idx > 0) stack.takeInPlace(idx) // pops idx..end; parent links already set
    }

    tokens.foreach {
      case Text(d)   => if (d.nonEmpty) top.children += TextN(d)
      case Comment(_) => // dropped (matches get_text: comments contribute nothing)
      case StartTag(name, attrs, selfClosing) =>
        impliedClose.get(name).foreach { closes =>
          var continue = true
          while (continue && stack.length > 1) {
            val t = top.tag
            if (closes.contains(t)) stack.remove(stack.length - 1)
            else if (closeBarrier.contains(t) && !closes.contains(t)) continue = false
            else continue = false
          }
        }
        val el = new Elem(name, attrs)
        top.children += el
        if (!selfClosing && !voidElements.contains(name)) stack += el
      case EndTag(name) =>
        if (voidElements.contains(name)) () // stray </br> etc: ignore
        else if (stack.exists(_.tag == name)) popTo(name)
        // else: unmatched close tag, dropped
    }
    root
  }

  def parse(html: String): Elem = build(Tokenizer.tokenizeBuf(html))
}
