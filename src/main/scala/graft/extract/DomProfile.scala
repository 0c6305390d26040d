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
}
