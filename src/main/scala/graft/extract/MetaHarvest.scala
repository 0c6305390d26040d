package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.html.{EndTag, StartTag, Text, Tokenizer}

/** Head metadata of a page. Empty string = absent (null-free so the
  * struct is stable across engines and sinks). */
final case class PageMeta(
    title: String,
    canonical: String,
    description: String,
    lang: String,
    noindex: Boolean)

/** HTML head-metadata harvest on the in-house tokenizer — the crawl
  * signals main-content extraction (X3) deliberately strips: `<link
  * rel=canonical>` (the URL-level dedup key the SITE declares — stronger
  * than any content hash when present), `<title>`, `<meta
  * name=description>`, `<html lang>` (the language-id prior), and `<meta
  * name=robots>` noindex (pages the publisher excluded from indexing are
  * usually excluded from training corpora too).
  *
  * One token-stream pass, first-occurrence-wins per field (the browser
  * rule for canonical), title text concatenated until its end tag, scan
  * stops at `</head>`/`<body>` (metadata after the head is out of
  * contract, exactly like browsers). Purely narrow as a Spark stage —
  * one kernel call per row, no shuffle; the q155 oracle drives the REAL
  * tokenizer over constructed pages and recomputes every field
  * relationally, so parser drift breaks the hash compare. */
object MetaHarvest {

  def harvest(html: String): PageMeta = {
    if (html == null) return PageMeta("", "", "", "", noindex = false)
    var title = ""
    var canonical = ""
    var description = ""
    var lang = ""
    var noindex = false
    var inTitle = false
    var titleDone = false
    val sb = new StringBuilder
    val it = Tokenizer.tokenizeBuf(html).iterator
    var stop = false
    while (it.hasNext && !stop) {
      it.next() match {
        case StartTag(name, attrs, _) => name match {
          case "html" =>
            if (lang.isEmpty) lang = attrs.getOrElse("lang", "").trim
          case "title" =>
            if (!titleDone) inTitle = true
          case "link" =>
            if (canonical.isEmpty &&
              attrs.get("rel").exists(_.trim.equalsIgnoreCase("canonical")))
              canonical = attrs.getOrElse("href", "").trim
          case "meta" =>
            val n = attrs.get("name").map(_.trim.toLowerCase)
            if (n.contains("description") && description.isEmpty)
              description = attrs.getOrElse("content", "").trim
            if (n.contains("robots") &&
              attrs.getOrElse("content", "").toLowerCase.contains("noindex"))
              noindex = true
          case "body" => stop = true
          case _ => ()
        }
        case EndTag(name) => name match {
          case "title" =>
            // the tokenizer treats <title> as raw text (one rule for all
            // raw-text elements); per HTML it is RCDATA — character
            // references decode — so decode here
            if (inTitle) {
              title = graft.html.Entities.decode(sb.toString).trim
              inTitle = false; titleDone = true
            }
          case "head" => stop = true
          case _ => ()
        }
        case Text(data) => if (inTitle) sb ++= data
        case _ => ()
      }
    }
    if (inTitle && !titleDone) title = graft.html.Entities.decode(sb.toString).trim
    PageMeta(title, canonical, description, lang, noindex)
  }

  /** DataFrame stage: html string column → meta struct column. */
  def harvested(df: DataFrame, htmlCol: String): DataFrame = {
    val u = udf((h: String) => harvest(h))
    df.withColumn("meta", u(col(htmlCol)))
  }

  /** One hreflang alternate: `<link rel=alternate hreflang href>`. */
  final case class AltLink(lang: String, href: String)

  /** The second-tier crawl metadata beyond [[PageMeta]] — fields a
    * curation pipeline mines for dating, dedup, multilingual pairing,
    * and redirect resolution. Empty string / -1 = absent. */
  final case class ExtMeta(
      pubSrc: String, pubDate: String,
      ogTitle: String, ogImage: String, ogType: String, twitterCard: String,
      refreshDelay: Long, refreshUrl: String,
      alternates: Seq[AltLink],
      feeds: Seq[String]) // rel=alternate rss/atom autodiscovery hrefs, in order

  /** Strict-enough ISO date check: `yyyy-mm-dd` prefix with a plausible
    * month/day; returns the 10-char date or "". */
  private def isoDate(s: String): String = {
    val t = s.trim
    if (t.length < 10) return ""
    val d = t.substring(0, 10)
    if (!d.matches("\\d{4}-\\d{2}-\\d{2}")) return ""
    val mo = d.substring(5, 7).toInt
    val da = d.substring(8, 10).toInt
    if (mo < 1 || mo > 12 || da < 1 || da > 31) "" else d
  }

  /** `<meta http-equiv=refresh>` content: `N[; url=TARGET]` — leading
    * integer delay, case-insensitive `url=`, optional quotes. */
  private def parseRefresh(content: String): (Long, String) = {
    val c = content.trim
    val digits = c.takeWhile(_.isDigit)
    if (digits.isEmpty) return (-1L, "")
    val delay = digits.toLong
    val lower = c.toLowerCase
    val ui = lower.indexOf("url=")
    val url =
      if (ui < 0) ""
      else c.substring(ui + 4).trim.stripPrefix("'").stripPrefix("\"")
        .stripSuffix("'").stripSuffix("\"").trim
    (delay, url)
  }

  /** Full-document single-pass harvest of [[ExtMeta]]: publish date
    * with source priority `article:published_time` > JSON-LD
    * `datePublished` > `<time datetime>` (the order of declared intent —
    * OG and schema.org are explicit publisher statements, a time element
    * may be any date on the page), Open Graph / twitter card fields
    * (first occurrence wins, the browser rule), meta-refresh redirects,
    * and hreflang alternate links. Invalid dates in a higher-priority
    * source FALL THROUGH to the next source. */
  def harvestExt(html: String): ExtMeta = {
    if (html == null) return ExtMeta("", "", "", "", "", "", -1L, "", Nil, Nil)
    var pubMeta = ""; var pubTime = ""
    var ogTitle = ""; var ogImage = ""; var ogType = ""; var twitterCard = ""
    var refreshDelay = -1L; var refreshUrl = ""
    val alts = Vector.newBuilder[AltLink]
    val feeds = Vector.newBuilder[String]
    val it = Tokenizer.tokenizeBuf(html).iterator
    while (it.hasNext) {
      it.next() match {
        case StartTag("meta", attrs, _) =>
          val prop = attrs.get("property").map(_.trim.toLowerCase)
          val name = attrs.get("name").map(_.trim.toLowerCase)
          val content = attrs.getOrElse("content", "").trim
          prop match {
            case Some("article:published_time") =>
              if (pubMeta.isEmpty) pubMeta = isoDate(content)
            case Some("og:title") => if (ogTitle.isEmpty) ogTitle = content
            case Some("og:image") => if (ogImage.isEmpty) ogImage = content
            case Some("og:type")  => if (ogType.isEmpty) ogType = content
            case _ => ()
          }
          if (name.contains("twitter:card") && twitterCard.isEmpty)
            twitterCard = content
          if (attrs.get("http-equiv").exists(_.trim.equalsIgnoreCase("refresh"))
            && refreshUrl.isEmpty && refreshDelay < 0) {
            val (d, u) = parseRefresh(content)
            refreshDelay = d; refreshUrl = u
          }
        case StartTag("time", attrs, _) =>
          if (pubTime.isEmpty)
            pubTime = isoDate(attrs.getOrElse("datetime", ""))
        case StartTag("link", attrs, _) =>
          if (attrs.get("rel").exists(_.trim.equalsIgnoreCase("alternate"))) {
            val lang = attrs.getOrElse("hreflang", "").trim.toLowerCase
            val href = attrs.getOrElse("href", "").trim
            if (lang.nonEmpty && href.nonEmpty) alts += AltLink(lang, href)
            // feed autodiscovery: type application/rss+xml / atom+xml
            val typ = attrs.getOrElse("type", "").trim.toLowerCase
            if (href.nonEmpty && (typ.contains("rss") || typ.contains("atom")))
              feeds += href
          }
        case _ => ()
      }
    }
    // JSON-LD datePublished: second priority, from the raw LD blocks
    val pubLd = jsonld(html).iterator
      .flatMap("\"datePublished\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(_))
      .map(m => isoDate(m.group(1))).find(_.nonEmpty).getOrElse("")
    val (src, date) =
      if (pubMeta.nonEmpty) ("meta", pubMeta)
      else if (pubLd.nonEmpty) ("jsonld", pubLd)
      else if (pubTime.nonEmpty) ("time", pubTime)
      else ("none", "")
    ExtMeta(src, date, ogTitle, ogImage, ogType, twitterCard,
      refreshDelay, refreshUrl, alts.result(), feeds.result())
  }

  /** DataFrame stage: html string column → ext-meta struct column. */
  def harvestedExt(df: DataFrame, htmlCol: String): DataFrame = {
    val u = udf((h: String) => harvestExt(h))
    df.withColumn("ext", u(col(htmlCol)))
  }

  /** Every `<a href>` of the page in document order — the link graph a
    * WAT export publishes. Empty/absent hrefs drop; values come back as
    * the tokenizer yields them (entity handling pinned by the q224
    * oracle). Capped at 10k links per page (link-stuffed spam exists;
    * the cap is far above any legitimate page and keeps a hostile row
    * from ballooning an executor). */
  def links(html: String, cap: Int = 10000): Seq[String] = {
    if (html == null) return Nil
    val out = Vector.newBuilder[String]
    var n = 0
    val it = Tokenizer.tokenizeBuf(html).iterator
    while (it.hasNext && n < cap) {
      it.next() match {
        case StartTag("a", attrs, _) =>
          val href = attrs.getOrElse("href", "").trim
          if (href.nonEmpty) { out += href; n += 1 }
        case _ => ()
      }
    }
    out.result()
  }

  /** WAT-style metadata frame over raw pages: one row per page shaped
    * for [[graft.sources.Warc.writeMetadata]] — the body is the WAT
    * JSON envelope (title + outlinks under the Common-Crawl-style
    * nesting), built declaratively with `to_json` so the only kernel
    * work is the tokenizer pass. */
  def watFrame(pages: DataFrame, urlCol: String, tsCol: String,
      htmlCol: String): DataFrame = {
    val titleU = udf((h: String) => harvest(h).title)
    val linksU = udf((h: String) => links(h))
    pages.select(
      col(urlCol).as("url"),
      col(tsCol).as("warc_ts"),
      org.apache.spark.sql.functions.lit(0).as("http_status"),
      org.apache.spark.sql.functions.lit("application/json").as("content_type"),
      encode(to_json(struct(
        struct(
          struct(col(urlCol).as("WARC-Target-URI")).as("WARC-Header-Metadata"),
          struct(
            struct(
              struct(titleU(col(htmlCol)).as("Title")).as("Head"),
              linksU(col(htmlCol)).as("Links")
            ).as("HTML-Metadata")
          ).as("Payload-Metadata")
        ).as("Envelope"))), "UTF-8").as("body"))
  }

  /** The [[watFrame]] body schema, for `from_json` on read-back. */
  val WatSchema: String =
    "Envelope STRUCT<`WARC-Header-Metadata` STRUCT<`WARC-Target-URI` STRING>, " +
      "`Payload-Metadata` STRUCT<`HTML-Metadata` STRUCT<Head STRUCT<Title STRING>, " +
      "Links ARRAY<STRING>>>>"

  /** Raw JSON-LD blocks of a page, in document order: the contents of
    * every `<script type="application/ld+json">` element (schema.org
    * structured data — the machine-readable article/product/breadcrumb
    * metadata publishers embed for search engines, and the highest-
    * precision field source a training-data pipeline gets for free).
    * Plain `<script>` JS never matches; whitespace-only blocks drop.
    * The tokenizer's raw-text rule keeps braces/quotes inside the JSON
    * from being parsed as markup, and the JSON stays RAW — field access
    * belongs to `get_json_object`/`from_json` downstream (codegen'd),
    * not to this kernel. One token-stream pass, purely narrow. */
  def jsonld(html: String): Seq[String] = {
    if (html == null) return Nil
    val out = Vector.newBuilder[String]
    val it = Tokenizer.tokenizeBuf(html).iterator
    var in = false
    val sb = new StringBuilder
    while (it.hasNext) {
      it.next() match {
        case StartTag("script", attrs, selfClosing) =>
          if (!selfClosing && attrs.get("type")
              .exists(_.trim.equalsIgnoreCase("application/ld+json"))) {
            in = true; sb.clear()
          }
        case EndTag("script") =>
          if (in) {
            val t = sb.toString.trim
            if (t.nonEmpty) out += t
            in = false
          }
        case Text(data) => if (in) sb ++= data
        case _ => ()
      }
    }
    out.result()
  }

  /** Column stage for [[jsonld]]: html → array of raw JSON strings. */
  def jsonldBlocks(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udf((h: String) => jsonld(h)).apply(html)
}
