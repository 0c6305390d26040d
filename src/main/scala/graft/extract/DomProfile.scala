package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.html.{Elem, TextN, TreeBuilder}

/** DOM structure profile — the tree-level twin of [[TemplateShape]]
  * (which fingerprints the tag SEQUENCE): element count, maximum
  * nesting depth, text codepoints, text-node count, per page. The
  * features that separate content pages from machine-generated div
  * soups (depth 40+ wrapper chains), parked domains (3 elements, no
  * text), and data tables BEFORE extraction heuristics run — and the
  * denominator set for text-density gates.
  *
  * Runs on the REAL tree builder ([[graft.html.TreeBuilder]] — implied
  * closes, void elements, close barriers), so the q169 oracle's
  * arithmetically-constructed expectations are a cross-engine
  * regression pin on the builder's nesting semantics, the same way
  * q161 pins the tokenizer: a void element wrongly pushed, or an
  * implied close missed, shifts depth/counts and breaks the hash.
  */
object DomProfile {

  /** Row type of [[profile]] (UDF-struct encoder). */
  case class DomStats(
      n_elems: Long, max_depth: Long, text_chars: Long, n_text_nodes: Long)

  /** Walk the built tree: elements (the synthetic #root excluded),
    * max element depth (top-level elements at 1), text CODEPOINTS
    * (codePointCount — the [[graft.ops.Dedup.polyHash]] discipline, and
    * what DuckDB's len() counts), text nodes. Total: null → zeros. */
  private[graft] def profileKernel(html: String): DomStats = {
    if (html == null) return DomStats(0L, 0L, 0L, 0L)
    var ne = 0L; var md = 0L; var tc = 0L; var nt = 0L
    def rec(e: Elem, depth: Long): Unit = e.children.foreach {
      case t: TextN =>
        tc += t.data.codePointCount(0, t.data.length); nt += 1
      case c: Elem =>
        ne += 1; if (depth + 1 > md) md = depth + 1; rec(c, depth + 1)
      case _ => ()
    }
    rec(TreeBuilder.parse(html), 0L)
    DomStats(ne, md, tc, nt)
  }

  /** Column form: html → struct(n_elems, max_depth, text_chars,
    * n_text_nodes). Narrow per-row kernel (the tree builder is
    * multi-pass imperative machinery — a UDF per CLAUDE.md's measured
    * HOF hazard); no shuffle. */
  def profile(html: Column): Column =
    udf((h: String) => profileKernel(h)).apply(html)

  /** Row type of [[linkDensity]]. */
  case class LinkStats(
      text_chars: Long, anchor_chars: Long, n_anchors: Long, density_micro: Long)

  /** LINK DENSITY — the single most load-bearing boilerplate feature
    * (Boilerpipe's anchor-text ratio; the content selector's per-node
    * char/anchor ratios, page-level): text codepoints under any `<a>`
    * subtree over all text codepoints. Nav blocks, footers, and listing
    * pages read near 10⁶; article bodies read near 0. Page-level gate +
    * the q175 cross-engine pin on anchor-subtree attribution in the
    * real tree builder (nested anchors count once — inA is sticky).
    * Narrow per-row UDF kernel, no shuffle. */
  private[graft] def linkDensityKernel(html: String): LinkStats = {
    if (html == null) return LinkStats(0L, 0L, 0L, 0L)
    var tc = 0L; var ac = 0L; var na = 0L
    def rec(e: Elem, inA: Boolean): Unit = e.children.foreach {
      case t: TextN =>
        val n = t.data.codePointCount(0, t.data.length)
        tc += n; if (inA) ac += n
      case c: Elem =>
        if (c.tag == "a") { na += 1; rec(c, true) } else rec(c, inA)
      case _ => ()
    }
    rec(TreeBuilder.parse(html), false)
    LinkStats(tc, ac, na, ac * 1000000L / math.max(tc, 1L))
  }

  def linkDensity(html: Column): Column =
    udf((h: String) => linkDensityKernel(h)).apply(html)
}
