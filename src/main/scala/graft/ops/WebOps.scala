package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL structure operators for web-corpus curation: host extraction,
  * registrable-domain grouping, path depth. Domain-level statistics and
  * caps (blocklists, per-site quotas via [[Curation.capPerKey]], domain
  * mix reporting) all key on the REGISTRABLE domain, not the raw host —
  * `news.bbc.co.uk` and `www.bbc.co.uk` are one site.
  *
  * Everything is pure Column DSL (regexp + list ops, codegen'd, no UDF,
  * no shuffle) and deliberately simple enough to replay in ANSI SQL: the
  * q52 DuckDB oracle recomputes host/domain/depth independently. The
  * multi-part-suffix table is a small embedded subset of the public
  * suffix list (the full PSL is a data file a production deployment
  * swaps in; the operator shape — last-2-vs-last-3-label selection — is
  * identical).
  */
object WebOps {

  /** Lowercased host of a URL: text between `scheme://` (skipping any
    * userinfo) and the first `/ : ? #`. Unparseable urls yield ''. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)", 1))

  /** SURT (Sort-friendly URI Reordering Transform) key — the canonical
    * URL key web archives sort and join on (OpenWayback/pywb convention,
    * the key column of the Common Crawl index): lowercase, scheme and
    * userinfo/port dropped, leading `www\d*.` stripped, host labels
    * REVERSED and comma-joined, `)` separator, path, `?` + query with
    * params sorted — so one host's pages are one contiguous key range
    * and equivalent urls collide. Pure per-row kernel; the q221/q223
    * DuckDB oracles replay it relationally. */
  private[graft] def surtKernel(url: String): String = {
    val u = url.trim.toLowerCase
    val schemeEnd = u.indexOf("://")
    val rest = if (schemeEnd >= 0) u.substring(schemeEnd + 3) else u
    val hostEnd = rest.indexWhere(c => c == '/' || c == '?' || c == '#') match {
      case -1 => rest.length
      case i  => i
    }
    var host = rest.substring(0, hostEnd)
    val at = host.lastIndexOf('@')
    if (at >= 0) host = host.substring(at + 1)
    val colon = host.indexOf(':')
    if (colon >= 0) host = host.substring(0, colon)
    host = host.replaceFirst("^www\\d*\\.", "")
    val revHost = host.split('.').reverse.mkString(",")
    val after = rest.substring(hostEnd)
    val hashIdx = after.indexOf('#')
    val noFrag = if (hashIdx >= 0) after.substring(0, hashIdx) else after
    val qIdx = noFrag.indexOf('?')
    val path = (if (qIdx >= 0) noFrag.substring(0, qIdx) else noFrag) match {
      case "" => "/"
      case p  => p
    }
    val query = if (qIdx >= 0) noFrag.substring(qIdx + 1) else ""
    val q = if (query.isEmpty) "" else "?" + query.split('&').sorted.mkString("&")
    revHost + ")" + path + q
  }

  /** Column form of [[surtKernel]]. */
  def surtKey(url: Column): Column = {
    val f = udf(surtKernel _)
    f(url)
  }

  /** RFC 3986 §5 reference resolution — the step that turns a page's
    * raw hrefs (WAT links, feed pointers, redirects) into the absolute
    * urls a link graph keys on: full §5.2.2 transform including
    * authority/path/query inheritance, path merge against the base, and
    * §5.2.4 dot-segment removal (excess `../` clamps at root, per spec).
    * Fragments resolve faithfully (the crawl layer strips them later via
    * [[canonicalizeUrl]]). Pure per-row kernel. */
  private[graft] def resolveUrlKernel(base: String, ref: String): String = {
    // (scheme, authority-or-null, path, query-or-null) of a URI sans fragment
    def split(u: String): (String, String, String, String) = {
      val hi = u.indexOf('#')
      var rest = if (hi >= 0) u.substring(0, hi) else u
      var scheme = ""
      val ci = rest.indexOf(':')
      if (ci > 0 && rest.substring(0, ci).matches("[A-Za-z][A-Za-z0-9+.-]*")) {
        scheme = rest.substring(0, ci)
        rest = rest.substring(ci + 1)
      }
      var auth: String = null
      if (rest.startsWith("//")) {
        val end = rest.indexWhere(c => c == '/' || c == '?', 2) match {
          case -1 => rest.length
          case i  => i
        }
        auth = rest.substring(2, end)
        rest = rest.substring(end)
      }
      val qi = rest.indexOf('?')
      if (qi >= 0) (scheme, auth, rest.substring(0, qi), rest.substring(qi + 1))
      else (scheme, auth, rest, null)
    }
    def removeDotSegments(input: String): String = {
      var in = input
      val out = new StringBuilder
      while (in.nonEmpty) {
        if (in.startsWith("../")) in = in.substring(3)
        else if (in.startsWith("./")) in = in.substring(2)
        else if (in.startsWith("/./")) in = "/" + in.substring(3)
        else if (in == "/.") in = "/"
        else if (in.startsWith("/../")) {
          in = "/" + in.substring(4)
          val i = out.lastIndexOf("/")
          out.setLength(math.max(i, 0))
        } else if (in == "/..") {
          in = "/"
          val i = out.lastIndexOf("/")
          out.setLength(math.max(i, 0))
        } else if (in == "." || in == "..") in = ""
        else {
          val start = if (in.startsWith("/")) 1 else 0
          val next = in.indexOf('/', start)
          val seg = if (next >= 0) in.substring(0, next) else in
          out.append(seg)
          in = if (next >= 0) in.substring(next) else ""
        }
      }
      out.toString
    }
    val fi = ref.indexOf('#')
    val frag = if (fi >= 0) ref.substring(fi + 1) else null
    val (bs, ba, bp, bq) = split(base)
    val (rs, ra, rp, rq) = split(ref)
    val (ts, ta, tp, tq) =
      if (rs.nonEmpty) (rs, ra, removeDotSegments(rp), rq)
      else if (ra != null) (bs, ra, removeDotSegments(rp), rq)
      else if (rp.isEmpty) (bs, ba, bp, if (rq != null) rq else bq)
      else if (rp.startsWith("/")) (bs, ba, removeDotSegments(rp), rq)
      else {
        // merge (§5.2.3): base path up to its last '/', then the ref
        val merged =
          if (ba != null && bp.isEmpty) "/" + rp
          else bp.substring(0, bp.lastIndexOf('/') + 1) + rp
        (bs, ba, removeDotSegments(merged), rq)
      }
    val sb = new StringBuilder
    if (ts.nonEmpty) sb.append(ts).append(':')
    if (ta != null) sb.append("//").append(ta)
    sb.append(tp)
    if (tq != null) sb.append('?').append(tq)
    if (frag != null) sb.append('#').append(frag)
    sb.toString
  }

  /** Column form of [[resolveUrlKernel]]. */
  def resolveUrl(base: Column, ref: Column): Column = {
    val f = udf(resolveUrlKernel _)
    f(base, ref)
  }

  /** HTTP cache-freshness verdict for recrawl planning (RFC 9111 §4.2):
    * given a stored response's Cache-Control, age inputs, and validator
    * presence, decide `fresh` (skip the fetch), `revalidate` (conditional
    * GET — cheap 304 path), or `refetch` (full GET). Freshness lifetime =
    * max-age, else Expires−Date, else the §4.2.2 heuristic
    * (Date−Last-Modified)/10; `no-store` always refetches, `no-cache`
    * always revalidates; a stale entry revalidates only when a validator
    * (ETag/Last-Modified) exists. All inputs in integer seconds so the
    * q231 oracle replays the arithmetic exactly; `ttl` = remaining
    * freshness (negative = seconds stale).
    *
    * Scale shape: a pure per-row kernel over the crawl-state table — the
    * fetch-vs-skip decision for 10¹² stored urls is one narrow
    * projection, no shuffle. */
  private[graft] def freshnessKernel(cacheControl: String, expiresSec: Long,
      lastModifiedSec: Long, dateSec: Long, nowSec: Long,
      hasValidator: Boolean): (String, Long) = {
    val directives = Option(cacheControl).getOrElse("").toLowerCase
      .split(',').map(_.trim).filter(_.nonEmpty)
    if (directives.contains("no-store")) return ("refetch", 0L)
    if (directives.contains("no-cache")) return ("revalidate", 0L)
    val maxAge = directives.collectFirst {
      case d if d.startsWith("max-age=") =>
        d.substring(8).takeWhile(_.isDigit) match {
          case "" => -1L
          case n  => n.toLong
        }
    }.filter(_ >= 0)
    val lifetime = maxAge.getOrElse {
      if (expiresSec > 0) math.max(0L, expiresSec - dateSec)
      else if (lastModifiedSec > 0 && dateSec > lastModifiedSec)
        (dateSec - lastModifiedSec) / 10
      else 0L
    }
    val age = nowSec - dateSec
    val ttl = lifetime - age
    if (ttl > 0) ("fresh", ttl)
    else if (hasValidator) ("revalidate", ttl)
    else ("refetch", ttl)
  }

  /** Column form of [[freshnessKernel]] → struct(verdict, ttl). */
  def freshness(cacheControl: Column, expiresSec: Column, lastModifiedSec: Column,
      dateSec: Column, nowSec: Column, hasValidator: Column): Column = {
    val f = udf(freshnessKernel _)
    f(cacheControl, expiresSec, lastModifiedSec, dateSec, nowSec, hasValidator)
  }

  /** Multi-part public suffixes recognized by [[registrableDomain]]. */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za")

  /** Registrable domain of a lowercased host: the last two labels, or the
    * last three when the last two form a multi-part public suffix
    * (`co.uk` etc.). Hosts with ≤ 2 labels pass through unchanged. */
  def registrableDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".",
      element_at(parts, -3), element_at(parts, -2), element_at(parts, -1))
    when(size(parts) <= 2, host)
      .when(last2.isin(MultiPartSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** Every dot-suffix of a host, most-specific first:
    * `a.b.c.net` → [a.b.c.net, b.c.net, c.net, net]. Pure Column DSL. */
  def hostSuffixes(host: Column): Column = {
    val parts = split(host, "\\.")
    transform(sequence(lit(1), size(parts)),
      i => array_join(slice(parts, i, size(parts)), "."))
  }

  /** Blocklist verdict: true iff the host or ANY parent domain appears in
    * `blocklist` — the suffix-match semantics URL filter lists (UT1 and
    * kin) specify, so `ads.tracker.example.com` is caught by an
    * `example.com` entry. Hosts are lowercased first; entries must be.
    *
    * Scale shape: purely narrow — a projection, no shuffle. The list
    * rides to executors once per task as a UDF-closure set (the Bloom
    * bitset pattern): production lists are ~10^6 entries, which a literal
    * `array_intersect` would re-materialize per ROW in codegen, and a
    * broadcast join would pay an explode + regroup exchange for. */
  def domainBlocked(host: Column, blocklist: Seq[String]): Column = {
    val set = blocklist.map(_.toLowerCase).toSet
    val hit = udf((suffixes: Seq[String]) =>
      suffixes != null && suffixes.exists(set.contains))
    hit(hostSuffixes(lower(host)))
  }

  /** Number of non-empty path segments of a URL (query/fragment
    * excluded): `https://a.com/x/y?q=1` → 2, `https://a.com/` → 0. */
  def pathDepth(url: Column): Column = {
    val path = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1)
    size(filter(split(path, "/"), seg => seg =!= lit("")))
  }

  /** Query parameters dropped by [[canonicalizeUrl]]: click/campaign
    * trackers that fragment otherwise-identical URLs across a crawl. */
  val TrackingParamRe = "^(utm_[a-z0-9_]+|gclid|fbclid|msclkid|ref)="

  /** Canonical form of a URL — the dedup-by-URL key every crawl pipeline
    * needs before exact content dedup:
    *
    *  1. scheme and host lowercased (paths stay case-sensitive);
    *  2. default ports dropped (`:80` for http, `:443` for https);
    *  3. fragment stripped;
    *  4. tracking query params dropped ([[TrackingParamRe]]), survivors
    *     SORTED (binary order) so param order never splits a URL;
    *  5. trailing path slashes trimmed, empty path normalized to `/`.
    *
    * Pure codegen'd Column DSL (regexp + list ops, no UDF, no shuffle),
    * RE2-safe patterns — the q60 DuckDB oracle replays it byte-for-byte.
    * Duplicate in-path slashes and userinfo are preserved (out of
    * contract). Unparseable urls (no `scheme://`) yield ''. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val rawPath = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(regexp_replace(rawPath, "/+$", "") === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "/+$", ""))
    val rawQuery = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_sort(filter(split(rawQuery, "&"),
      p => p =!= lit("") && !p.rlike(TrackingParamRe)))
    val query = when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
      .otherwise(lit(""))
    when(scheme === "", lit(""))
      .otherwise(concat(scheme, lit("://"), host, path, query))
  }

  /** robots.txt parse for the wildcard agent (RFC 9309 grouping): a
    * group is one-or-more consecutive `User-agent:` lines followed by
    * rules; a `User-agent:` line AFTER rules starts a new group; only
    * groups naming `*` contribute. Returns the group's non-empty
    * `Disallow:` path prefixes. Honest fences, documented: `Allow:`
    * precedence and `$`/`*` path wildcards are NOT implemented (rules
    * are plain prefixes — the pre-RFC core every crawler agrees on);
    * comments (`#`) and CRLF handled. */
  private[graft] def robotsDisallowKernel(txt: String): Array[String] = {
    if (txt == null) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var inStar = false
    var sawRule = true // first User-agent line always opens a new group
    txt.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase
        val v = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (sawRule) { inStar = v == "*"; sawRule = false }
            else inStar = inStar || v == "*"
          case "disallow" =>
            sawRule = true
            if (inStar && v.nonEmpty) out += v
          case "allow" | "crawl-delay" => sawRule = true
          case _ => () // sitemap etc: group-neutral per RFC
        }
      }
    }
    out.toArray
  }

  /** Star-group Allow AND Disallow rules, RFC 9309 shape: each entry is
    * `"A" + pattern` or `"D" + pattern` (flat strings so the UDF column
    * type stays `array<string>`). Empty-value rules drop (an empty
    * Disallow means allow-all, an empty Allow is a no-op). */
  private[graft] def robotsRulesKernel(txt: String): Array[String] = {
    if (txt == null) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var inStar = false
    var sawRule = true
    txt.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase
        val v = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (sawRule) { inStar = v == "*"; sawRule = false }
            else inStar = inStar || v == "*"
          case "disallow" =>
            sawRule = true
            if (inStar && v.nonEmpty) out += ("D" + v)
          case "allow" =>
            sawRule = true
            if (inStar && v.nonEmpty) out += ("A" + v)
          case "crawl-delay" => sawRule = true
          case _ => () // sitemap etc: group-neutral per RFC
        }
      }
    }
    out.toArray
  }

  /** RFC 9309 path-pattern match: `*` spans any characters, a trailing
    * `$` anchors the end, and the pattern is anchored at the path start. */
  private[graft] def robotsPathMatch(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val segs = pat.split("\\*", -1)
    // first segment anchored at 0
    if (!path.startsWith(segs(0))) return false
    var pos = segs(0).length
    var i = 1
    while (i < segs.length) {
      val s = segs(i)
      if (i == segs.length - 1 && anchored) {
        // last segment anchored at the end
        return path.length - pos >= s.length && path.endsWith(s)
      }
      if (s.isEmpty) { /* '*' absorbs freely */ }
      else {
        val at = path.indexOf(s, pos)
        if (at < 0) return false
        pos = at + s.length
      }
      i += 1
    }
    if (anchored) pos == path.length || (segs.length == 1 && segs(0).length == path.length)
    else true
  }

  /** RFC 9309 verdict: among matching rules the LONGEST pattern wins;
    * ties go to Allow; no match = allowed. Returns true = disallowed. */
  private[graft] def robotsVerdict(rules: Array[String], path: String): Boolean = {
    var bestLen = -1
    var bestDisallow = false
    var i = 0
    while (i < rules.length) {
      val r = rules(i)
      val pattern = r.substring(1)
      if (robotsPathMatch(pattern, path)) {
        val len = pattern.length
        val isAllow = r.charAt(0) == 'A'
        if (len > bestLen || (len == bestLen && bestDisallow && isAllow)) {
          bestLen = len
          bestDisallow = !isAllow
        }
      }
      i += 1
    }
    bestDisallow
  }

  /** Row type of [[robotsPolicy]]. */
  case class RobotsPolicy(crawl_delay: Long, n_rules: Long, n_sitemaps: Long)

  /** robots.txt POLICY summary — the fetch-scheduler inputs, where
    * [[robotsDisallowed]] is the compliance gate: the `*`-group's
    * `Crawl-delay` in whole seconds (-1 = none stated; same group
    * selection as the disallow kernel, last star-group value wins),
    * its rule count, and group-neutral `Sitemap:` lines (RFC 9309:
    * sitemaps live outside groups). The crawl-delay is what a per-host
    * politeness budget multiplies (T122 inter-arrival profiles measure
    * the observed side); invalid/fractional delays round down, negative
    * or unparsable → -1. One kernel pass per host row — the robots
    * frame is hosts-sized, tiny next to any corpus. */
  private[graft] def robotsPolicyKernel(txt: String): RobotsPolicy = {
    if (txt == null) return RobotsPolicy(-1L, 0L, 0L)
    var inStar = false
    var sawRule = true
    var delay = -1L; var rules = 0L; var sitemaps = 0L
    txt.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase
        val v = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (sawRule) { inStar = v == "*"; sawRule = false }
            else inStar = inStar || v == "*"
          case "disallow" =>
            sawRule = true
            if (inStar && v.nonEmpty) rules += 1L
          case "crawl-delay" =>
            sawRule = true
            if (inStar) delay =
              try { math.max(-1L, v.toDouble.toLong) }
              catch { case _: NumberFormatException => -1L }
          case "allow" => sawRule = true
          case "sitemap" => sitemaps += 1L // group-neutral per RFC
          case _ => ()
        }
      }
    }
    RobotsPolicy(delay, rules, sitemaps)
  }

  def robotsPolicy(txt: Column): Column =
    udf((t: String) => robotsPolicyKernel(t)).apply(txt)

  /** robots.txt disallow gate — the compliance filter a Common-Crawl
    * style corpus applies before anything else, with FULL RFC 9309
    * matching: `*`-group `Allow:` AND `Disallow:` rules, `*` wildcards,
    * `$` end anchors, and the longest-match precedence (ties go to
    * Allow) that real robots files rely on (`Disallow: /private` +
    * `Allow: /private/pub`). Hosts with no robots row, no `*` group, or
    * only empty rules allow everything.
    *
    * Scale shape: the kernel parses each robots.txt ONCE on the
    * hosts-sized `robots` frame (tiny next to the corpus), rules
    * collapse to one array row per host and BROADCAST; the page side is
    * a narrow host/path projection + a broadcast left join + a per-row
    * verdict kernel — the 10^12-row corpus never shuffles. Returns
    * (url, host, path, disallowed). */
  def robotsDisallowed(
      pages: DataFrame, urlCol: String,
      robots: DataFrame, hostCol: String, txtCol: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val parse = udf((t: String) => robotsRulesKernel(t))
    val ruleSets = robots
      .select(col(hostCol).as("host"), parse(col(txtCol)).as("__rules"))
      .filter(size(col("__rules")) > 0)
    val verdict = udf((rules: Seq[String], path: String) =>
      rules != null && robotsVerdict(rules.toArray, path))
    val u = col(urlCol)
    pages
      .select(u.as("url"), urlHost(u).as("host"),
        regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1).as("path"))
      .join(broadcast(ruleSets), Seq("host"), "left")
      .select(col("url"), col("host"), col("path"),
        verdict(col("__rules"), col("path")).as("disallowed"))
  }

  /** Soft-404 phrase lists — ONE constant drives both engines: the Spark
    * kernel folds `contains` flags over these exact strings and the
    * DuckDB oracle replays the same membership sum, so the lists can
    * grow without the two sides drifting. Lowercase ASCII by contract
    * (matched against `lower(...)`). */
  private[graft] val Soft404TitlePhrases: Seq[String] = Seq(
    "404", "page not found", "not found", "forbidden", "access denied",
    "server error")
  private[graft] val Soft404BodyPhrases: Seq[String] = Seq(
    "page not found", "does not exist", "no longer available",
    "has been removed", "check the url", "return to the homepage",
    "error 404")

  /** Soft-404 detection — pages that answer HTTP 200 but carry an error
    * body (expired listings, moved articles, CDN fallbacks). A crawl
    * can't see it in the status code, and at Common-Crawl scale these
    * are a real corpus fraction that poisons dedup (mirror error pages
    * cluster) and training mix alike — gate them BEFORE extraction.
    *
    * Heuristic: count title-phrase hits and body-phrase hits (shared
    * constants above), flag short bodies (< `shortTokens` whitespace
    * tokens); soft404 = any title hit, OR >= 2 body hits, OR a body hit
    * on a short page. Purely narrow codegen'd Column DSL — no shuffle,
    * no UDF; returns struct(n_title_hits, n_body_hits, short_body,
    * soft404). */
  def soft404Signals(title: Column, text: Column, shortTokens: Int = 40): Column = {
    val lt = lower(title)
    val lx = lower(text)
    val titleHits = Soft404TitlePhrases
      .map(p => when(lt.contains(p), lit(1L)).otherwise(lit(0L))).reduce(_ + _)
    val bodyHits = Soft404BodyPhrases
      .map(p => when(lx.contains(p), lit(1L)).otherwise(lit(0L))).reduce(_ + _)
    val short = TextOps.tokenCount(text) < shortTokens
    struct(
      titleHits.as("n_title_hits"),
      bodyHits.as("n_body_hits"),
      short.as("short_body"),
      (titleHits >= 1L || bodyHits >= 2L || (bodyHits >= 1L && short))
        .as("soft404"))
  }

  /** Bitext URL pair mining — the ParaCrawl/CCMatrix candidate step
    * (Bañón et al. 2020 §3: multilingual sites publish parallel pages at
    * language-coded paths): a url whose FIRST path segment is a 2-letter
    * language code is keyed by (host, rest-of-path), and pages of the
    * same site whose keys match across `langA`/`langB` are candidate
    * translation pairs — the cheap structural harvest that feeds
    * alignment models, long before any content comparison. Urls without
    * a language segment, or in other languages, drop out. Returns
    * (pair_key, url_a, url_b), one row per matched pair.
    *
    * Scale shape: a narrow regexp projection per side (raw page content
    * never enters — this is a url-column operator) and ONE equi-join on
    * the 8-to-60-byte pair_key; both sides are corpus-sized, so this is
    * a genuine shuffle join by design (neither side broadcasts), with
    * AQE handling per-site skew. A duplicate-url crawl multiplies pairs
    * — [[canonicalizeUrl]] + dedup runs upstream by contract. */
  def bitextPairs(
      pages: DataFrame, urlCol: String, langA: String, langB: String): DataFrame = {
    require(langA != langB && langA.matches("[a-z]{2}") && langB.matches("[a-z]{2}"))
    val u = col(urlCol)
    val parsed = pages.select(
        u.as("url"),
        regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)/([a-z]{2})/(.*)$", 1).as("__h"),
        regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)/([a-z]{2})/(.*)$", 2).as("__seg"),
        regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)/([a-z]{2})/(.*)$", 3).as("__rest"))
      .filter(col("__h") =!= "")
      .select(col("url"), col("__seg"),
        concat(lower(col("__h")), lit("/"), col("__rest")).as("pair_key"))
    val a = parsed.filter(col("__seg") === langA)
      .select(col("pair_key"), col("url").as("url_a"))
    val b = parsed.filter(col("__seg") === langB)
      .select(col("pair_key"), col("url").as("url_b"))
    a.join(b, Seq("pair_key"))
  }

  /** RFC 3492 §6.1 bias adaptation (base 36, tmin 1, tmax 26, damp 700,
    * skew 38 — the Punycode parameters). */
  private def punyAdapt(delta0: Int, numPoints: Int, first: Boolean): Int = {
    var delta = if (first) delta0 / 700 else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((36 - 1) * 26) / 2) { delta /= (36 - 1); k += 36 }
    k + (36 * delta) / (delta + 38)
  }

  /** RFC 3492 §6.2 Punycode decode of one label body (the part after
    * `xn--`): basic code points before the LAST delimiter, then
    * variable-length generalized integers inserting non-ASCII code
    * points. None on ANY malformed input — bad digit, arithmetic
    * overflow, surrogate/out-of-range code point, non-ASCII basic —
    * so callers keep the original label (the crawl-safe behavior;
    * a malformed xn-- label is data, not a crash). Verified against
    * CPython's punycode codec outputs in the spec. */
  private[graft] def punycodeDecode(s: String): Option[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val d = s.lastIndexOf('-')
    val basic = if (d > 0) s.substring(0, d) else ""
    val enc = if (d >= 0) s.substring(d + 1) else s
    if (enc.isEmpty) return None
    var bi = 0
    while (bi < basic.length) {
      val c = basic.charAt(bi)
      if (c >= 128) return None
      out += c.toInt; bi += 1
    }
    var n = 128; var i = 0; var bias = 72
    var p = 0
    while (p < enc.length) {
      val oldi = i; var w = 1; var k = 36
      var done = false
      while (!done) {
        if (p >= enc.length) return None
        val c = enc.charAt(p); p += 1
        val digit =
          if (c >= 'a' && c <= 'z') c - 'a'
          else if (c >= 'A' && c <= 'Z') c - 'A'
          else if (c >= '0' && c <= '9') c - '0' + 26
          else return None
        if (w != 0 && digit > (Int.MaxValue - i) / w) return None
        i += digit * w
        val t = if (k <= bias) 1 else if (k >= bias + 26) 26 else k - bias
        if (digit < t) done = true
        else {
          if (w > Int.MaxValue / (36 - t)) return None
          w *= (36 - t); k += 36
        }
      }
      val len1 = out.length + 1
      bias = punyAdapt(i - oldi, len1, oldi == 0)
      if (i / len1 > Int.MaxValue - n) return None
      n += i / len1
      i %= len1
      if (n < 0x80 || n > 0x10FFFF || (n >= 0xD800 && n <= 0xDFFF)) return None
      out.insert(i, n)
      i += 1
    }
    Some(out.iterator.map(cp => new String(Character.toChars(cp))).mkString)
  }

  /** IDN host decode: each dot label starting with `xn--` is Punycode-
    * decoded ([[punycodeDecode]]); malformed labels and plain-ASCII
    * labels pass through unchanged. The display/analysis form of an
    * IDNA host — [[registrableDomain]] grouping, blocklists (UT1 lists
    * carry unicode entries), and homograph screening all want the
    * DECODED host, not the wire form a crawler sees. */
  private[graft] def idnHostKernel(host: String): String = {
    if (host == null) return null
    host.split("\\.", -1).map { label =>
      if (label.length > 4 && label.toLowerCase.startsWith("xn--"))
        punycodeDecode(label.substring(4).toLowerCase).getOrElse(label)
      else label
    }.mkString(".")
  }

  /** Column form of [[idnHostKernel]]: narrow per-row UDF, no shuffle. */
  def decodeIdnHost(host: Column): Column =
    udf((h: String) => idnHostKernel(h)).apply(host)

  /** Row type of [[homographFlag]]. */
  case class HomographStats(n_labels: Long, n_mixed: Long, suspicious: Boolean)

  /** HOMOGRAPH screen over a DECODED host: a label mixing letters from
    * two or more scripts (Latin / Cyrillic / CJK, via
    * [[TextOps.scriptProfileKernel]]'s ranges) is the classic IDN
    * spoof — `раураl.com` with Cyrillic р/а/у reads as `paypal.com` —
    * and no legitimate registry allows it (IDNA2008 + registry policies
    * are single-script per label). Whole-label single-script hosts
    * (мир.example) are FINE and stay unflagged: the signal is the MIX,
    * not the script. Narrow per-row kernel over [[decodeIdnHost]]
    * output; no shuffle. */
  private[graft] def homographKernel(host: String): HomographStats = {
    if (host == null) return HomographStats(0L, 0L, false)
    val labels = host.split("\\.", -1)
    var mixed = 0L
    labels.foreach { l =>
      val p = TextOps.scriptProfileKernel(l)
      val scripts = Seq(p.n_latin > 0L, p.n_cyrillic > 0L, p.n_cjk > 0L).count(identity)
      if (scripts >= 2) mixed += 1L
    }
    HomographStats(labels.length.toLong, mixed, mixed > 0L)
  }

  def homographFlag(host: Column): Column =
    udf((h: String) => homographKernel(h)).apply(host)

  /** Row type of [[percentDecode]]. */
  case class PctDecoded(decoded: String, valid: Boolean)

  /** RFC 3986 percent-decoding with STRICT UTF-8 validation: `%XX` hex
    * pairs become bytes, the byte stream must decode as valid UTF-8
    * (REPORT mode — overlong encodings like `%C0%AF`, the classic
    * path-traversal smuggle, are rejected, as are truncated/non-hex
    * escapes), and any failure returns the ORIGINAL string with
    * valid=false — malformed urls are data, never a crash (the
    * [[punycodeDecode]] contract). `+` is deliberately NOT decoded:
    * that is form-encoding, not RFC 3986, and conflating them corrupts
    * paths containing literal plus. The decode urls need before T34/
    * T42/T160 analysis sees them. Narrow per-row kernel, no shuffle. */
  private[graft] def percentDecodeKernel(s: String): PctDecoded = {
    if (s == null) return PctDecoded(null, false)
    if (!s.contains('%')) return PctDecoded(s, true)
    def hex(c: Char): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else -1
    val bytes = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        if (i + 2 >= s.length) return PctDecoded(s, false)
        val h = hex(s.charAt(i + 1)); val l = hex(s.charAt(i + 2))
        if (h < 0 || l < 0) return PctDecoded(s, false)
        bytes.write(h * 16 + l); i += 3
      } else {
        val cp = s.codePointAt(i)
        val b = new String(Character.toChars(cp))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        bytes.write(b, 0, b.length)
        i += Character.charCount(cp)
      }
    }
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        .decode(java.nio.ByteBuffer.wrap(bytes.toByteArray)).toString
      PctDecoded(dec, true)
    } catch {
      case _: java.nio.charset.CharacterCodingException => PctDecoded(s, false)
    }
  }

  def percentDecode(c: Column): Column =
    udf((s: String) => percentDecodeKernel(s)).apply(c)

  /** Crawl FRONTIER expansion — the discovery step of an incremental
    * crawl: candidate outlink targets not already in the known-url set,
    * admitted under a per-host cap (the politeness/trap budget: a single
    * host discovering 10⁷ new urls in one cycle is a calendar trap or a
    * link farm, and fetch capacity is per-host anyway). Returns the
    * admitted frontier as (host, url), the [[urlPatternProfile]] and
    * robots gates' input for the next cycle.
    *
    * Scale shape: url-column operator end to end (no page content).
    * Distinct + left-anti both key on the url — one exchange family —
    * then the cap is a [[Curation.capPerKey]] rank filter on the host
    * that SPARK-37099 prunes map-side: a trap host ships at most
    * `perHostCap` rows per map partition, never its 10⁷ discoveries. */
  def frontierExpand(
      known: DataFrame, knownUrlCol: String,
      outlinks: DataFrame, linkCol: String, perHostCap: Int): DataFrame = {
    require(perHostCap >= 1)
    val k = known.select(col(knownUrlCol).as("url")).distinct()
    val cand = outlinks.select(col(linkCol).as("url")).distinct()
    val fresh = cand.join(k, Seq("url"), "left_anti")
      .select(urlHost(col("url")).as("host"), col("url"))
      .filter(col("host") =!= "")
    Curation.capPerKey(fresh, "host", "url", perHostCap)
  }

  /** Redirect-chain resolution by POINTER DOUBLING — every crawl holds a
    * (src → dst) redirect map (301/302/canonical hops) that fetch records
    * must be resolved through before dedup/grouping sees them. Following
    * chains hop-by-hop is O(maxHops) shuffle rounds; doubling the span
    * each round (f_{2k} = f_k ∘ f_k, the classic parallel
    * list-ranking/functional-graph move) resolves every chain of length
    * ≤ maxHops in ⌈log₂ maxHops⌉ self-joins — the difference between 32
    * exchanges and 5 at 10¹⁰ edges. Nodes whose final pointer still has
    * an outgoing edge after the budget are REDIRECT CYCLES (or
    * over-budget chains): flagged, never looped on.
    *
    * Input: one row per redirecting node (srcCol, dstCol); nodes absent
    * from srcCol are terminal. Output: (src, final_id NULL on cycle,
    * hops −1 on cycle, is_cycle). Hop counts compose additively through
    * the doubling, so they are exact for resolved chains. */
  def resolveRedirects(edges: DataFrame, srcCol: String, dstCol: String,
      maxHops: Int = 32): DataFrame = {
    require(maxHops >= 1, "positive hop budget")
    val base = edges.select(col(srcCol).as("node"), col(dstCol).as("reach")).distinct()
    var f = base.withColumn("hops", lit(1L))
    var span = 1
    while (span < maxHops) {
      val g = f.select(col("node").as("g_node"), col("reach").as("g_reach"),
        col("hops").as("g_hops"))
      // terminal reaches (no outgoing edge) miss the join and keep their row
      f = f.join(g, f("reach") === g("g_node"), "left")
        .select(col("node"),
          coalesce(col("g_reach"), col("reach")).as("reach"),
          (col("hops") + coalesce(col("g_hops"), lit(0L))).as("hops"))
      span *= 2
    }
    // a reach that still redirects after the budget is a cycle member
    val redirecting = base.select(col("node").as("t_node")).distinct()
    f.join(redirecting, f("reach") === col("t_node"), "left")
      .select(col("node").as("src"),
        when(col("t_node").isNull, col("reach")).as("final_id"),
        when(col("t_node").isNull, col("hops")).otherwise(lit(-1L)).as("hops"),
        col("t_node").isNotNull.as("is_cycle"))
  }

  /** URL PATTERN profile — the crawl-trap detector: every url's path is
    * collapsed to a SHAPE (digit runs → `#`, query dropped), and shapes
    * are profiled per host. A shape fanning out to millions of distinct
    * urls on one host is a calendar/session/pagination trap (the crawl
    * frontier pathology every Common-Crawl-scale fetcher fences), or a
    * parametrized template worth one representative, not millions —
    * [[canonicalizeUrl]] dedups EXACT urls, this groups the infinite
    * families canonicalization can't.
    *
    * Scale shape: narrow regexp projection → one map-combined
    * (host, shape) aggregate; the distinct-url count per shape is the
    * one Expand, over (host, shape, url) only. Returns
    * (host, pattern, n_urls, n_distinct) for shapes with at least
    * `minUrls` occurrences. */
  def urlPatternProfile(df: DataFrame, urlCol: String, minUrls: Long = 2L): DataFrame = {
    val u = col(urlCol)
    val path = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    df.select(urlHost(u).as("host"),
        regexp_replace(path, "[0-9]+", "#").as("pattern"), u.as("__u"))
      .filter(col("host") =!= "")
      .groupBy(col("host"), col("pattern"))
      .agg(count(lit(1)).as("n_urls"), countDistinct(col("__u")).as("n_distinct"))
      .filter(col("n_urls") >= minUrls)
  }

  /** Decode the five XML predefined entities plus numeric character
    * references (`&#dd;` / `&#xhh;`) in one scan; malformed references
    * pass through verbatim (a sitemap `<loc>` MUST entity-escape `&`,
    * so undecoded ampersands are producer bugs we surface, not mask). */
  private[graft] def xmlUnescape(s: String): String = {
    if (s == null || s.indexOf('&') < 0) return s
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { b.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        val name = if (semi > i && semi - i <= 10) s.substring(i + 1, semi) else null
        val rep: String = name match {
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case n if n != null && n.length > 1 && n.charAt(0) == '#' =>
            try {
              val cp = if (n.charAt(1) == 'x' || n.charAt(1) == 'X')
                Integer.parseInt(n.substring(2), 16)
              else Integer.parseInt(n.substring(1))
              if (Character.isValidCodePoint(cp) && cp > 0)
                new String(Character.toChars(cp))
              else null
            } catch { case _: NumberFormatException => null }
          case _ => null
        }
        if (rep == null) { b.append(c); i += 1 }
        else { b.append(rep); i = semi + 1 }
      }
    }
    b.toString
  }

  /** Exact-integer parse of a sitemap `<priority>` decimal into
    * micro-units (the repo-wide 10⁶ quantization — "0.8" → 800000L with
    * NO float step, so the DuckDB replay is `DECIMAL(18,6) * 1000000`).
    * Digits beyond the 6th fractional place truncate; anything that is
    * not plain `digits[.digits]` → -1 (absent/unparsable). */
  private[graft] def priorityMicro(s: String): Long = {
    if (s == null) return -1L
    val t = s.trim
    if (t.isEmpty) return -1L
    var i = 0; var intPart = 0L; var seen = false
    while (i < t.length && t.charAt(i) >= '0' && t.charAt(i) <= '9') {
      intPart = intPart * 10L + (t.charAt(i) - '0'); i += 1; seen = true
      if (intPart > 1000000L) return -1L
    }
    var frac = 0L; var fd = 0
    if (i < t.length && t.charAt(i) == '.') {
      i += 1
      while (i < t.length && t.charAt(i) >= '0' && t.charAt(i) <= '9') {
        if (fd < 6) { frac = frac * 10L + (t.charAt(i) - '0'); fd += 1 }
        i += 1; seen = true
      }
    }
    if (!seen || i != t.length) return -1L
    while (fd < 6) { frac *= 10L; fd += 1 }
    intPart * 1000000L + frac
  }

  /** One `<url>` entry of a urlset sitemap: entity-decoded `loc`,
    * whether `lastmod` starts with a W3C date (plus the raw value, for
    * the coverage audit's staleness compare), the validated (lowercase
    * enum) `changefreq` or null, and the exact-integer priority. */
  case class SitemapEntry(loc: String, lastmod_ok: Boolean, lastmod: String,
      changefreq: String, priority_micro: Long)

  /** Row type of [[sitemapParse]]: document kind plus urlset entries
    * and sitemapindex child locs (each empty for the other kind). */
  case class SitemapParse(kind: String, entries: Seq[SitemapEntry],
      children: Seq[String])

  private val changefreqEnum = Set(
    "always", "hourly", "daily", "weekly", "monthly", "yearly", "never")

  /** First `<tag>…</tag>` text inside `block`, or null. Tags are the
    * spec's lowercase literals; attributes never appear on sitemap
    * leaf elements so exact-tag matching is the honest contract. */
  private def tagText(block: String, tag: String): String = {
    val open = "<" + tag + ">"
    val i = block.indexOf(open)
    if (i < 0) return null
    val j = block.indexOf("</" + tag + ">", i + open.length)
    if (j < 0) return null
    block.substring(i + open.length, j).trim
  }

  /** sitemap.xml parser — the crawl DISCOVERY input that pairs with the
    * robots gates ([[robotsPolicy]] surfaces the `Sitemap:` pointers;
    * this reads what they point at): `<urlset>` entries with
    * entity-decoded `<loc>`, W3C-date-validated `<lastmod>`,
    * enum-validated `<changefreq>` and exact-integer `<priority>`
    * micro-units, or `<sitemapindex>` child locs; anything without a
    * recognizable root (HTML soft-404s serving as sitemaps are routine)
    * → kind `invalid`. Deliberately a scanner, not an XML library: one
    * left-to-right pass over `<url>`/`<sitemap>` blocks, entries missing
    * `<loc>` drop (they identify nothing).
    *
    * Scale shape: sitemaps live on a hosts-sized frame like robots.txt
    * — the kernel runs once per sitemap row, narrow projection, no
    * shuffle; downstream coverage joins key on the entry loc. */
  private[graft] def sitemapKernel(txt: String): SitemapParse = {
    if (txt == null) return SitemapParse("invalid", Nil, Nil)
    val iu = txt.indexOf("<urlset")
    val is = txt.indexOf("<sitemapindex")
    if (iu >= 0 && (is < 0 || iu < is)) {
      val entries = Vector.newBuilder[SitemapEntry]
      var pos = txt.indexOf("<url>", iu)
      while (pos >= 0) {
        val end = txt.indexOf("</url>", pos + 5)
        if (end < 0) pos = -1
        else {
          val block = txt.substring(pos + 5, end)
          val loc = tagText(block, "loc")
          if (loc != null && loc.nonEmpty) {
            val lastmod = tagText(block, "lastmod")
            val cfRaw = tagText(block, "changefreq")
            val cf = if (cfRaw == null) null else {
              val l = cfRaw.toLowerCase
              if (changefreqEnum.contains(l)) l else null
            }
            entries += SitemapEntry(
              xmlUnescape(loc),
              lastmod != null && lastmod.matches("\\d{4}-\\d{2}-\\d{2}.*"),
              lastmod, cf, priorityMicro(tagText(block, "priority")))
          }
          pos = txt.indexOf("<url>", end + 6)
        }
      }
      SitemapParse("urlset", entries.result(), Nil)
    } else if (is >= 0) {
      val kids = Vector.newBuilder[String]
      var pos = txt.indexOf("<sitemap>", is)
      while (pos >= 0) {
        val end = txt.indexOf("</sitemap>", pos + 9)
        if (end < 0) pos = -1
        else {
          val loc = tagText(txt.substring(pos + 9, end), "loc")
          if (loc != null && loc.nonEmpty) kids += xmlUnescape(loc)
          pos = txt.indexOf("<sitemap>", end + 10)
        }
      }
      SitemapParse("sitemapindex", Nil, kids.result())
    } else SitemapParse("invalid", Nil, Nil)
  }

  def sitemapParse(txt: Column): Column =
    udf((t: String) => sitemapKernel(t)).apply(txt)

  /** One feed item/entry: entity-decoded link and title plus whether the
    * item's date parses under the format its OWN feed dialect mandates
    * (RFC 1123 `pubDate` for RSS, W3C-datetime `updated` for Atom). */
  case class FeedItem(link: String, title: String, date_ok: Boolean)

  /** Row type of [[feedParse]]: dialect (`rss`/`atom`/`invalid`) plus
    * the link-bearing items (link-less items identify nothing → drop,
    * the same contract as loc-less sitemap entries). */
  case class FeedParse(kind: String, items: Seq[FeedItem])

  /** RFC 1123 / RFC 822 date shape RSS `pubDate` mandates:
    * `Tue, 10 Jun 2003 04:00:00 GMT` (2-digit-minute variant and
    * numeric zones allowed; RFC 822's optional weekday kept required —
    * every real feed writer emits it and its absence flags hand-rolled
    * producers whose dates we should not trust for refetch ordering). */
  private val rfc1123Re =
    ("^(Mon|Tue|Wed|Thu|Fri|Sat|Sun), \\d{1,2} " +
      "(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) \\d{4} " +
      "\\d{2}:\\d{2}(:\\d{2})? (UT|GMT|[ECMP][SD]T|[A-IK-Z]|[+-]\\d{4})$").r

  /** First `<tag …>text</tag>` in `block`, tolerating attributes on the
    * open tag (Atom `<title type="text">`); self-closing instances are
    * skipped. Null when no text-bearing instance exists. */
  private def tagTextAttr(block: String, tag: String): String = {
    var i = block.indexOf("<" + tag)
    while (i >= 0) {
      val after = i + 1 + tag.length
      if (after < block.length &&
          (block.charAt(after) == '>' || Character.isWhitespace(block.charAt(after)))) {
        val gt = block.indexOf('>', after)
        if (gt < 0) return null
        if (block.charAt(gt - 1) != '/') {
          val j = block.indexOf("</" + tag + ">", gt + 1)
          if (j < 0) return null
          return block.substring(gt + 1, j).trim
        }
      }
      i = block.indexOf("<" + tag, i + 1)
    }
    null
  }

  /** `href` attribute of the first `<link …>` tag in an Atom entry
    * block (Atom links are attribute-carried, unlike RSS text links). */
  private def atomLinkHref(block: String): String = {
    var i = block.indexOf("<link")
    while (i >= 0) {
      val gt = block.indexOf('>', i)
      if (gt < 0) return null
      val tag = block.substring(i, gt)
      val h = tag.indexOf("href=")
      if (h >= 0 && h + 6 < tag.length) {
        val quote = tag.charAt(h + 5)
        if (quote == '"' || quote == '\'') {
          val end = tag.indexOf(quote, h + 6)
          if (end > h + 6) return tag.substring(h + 6, end)
        }
      }
      i = block.indexOf("<link", gt)
    }
    null
  }

  /** RSS 2.0 / Atom feed parser — the third crawl-discovery input next
    * to robots `Sitemap:` pointers ([[robotsPolicy]]) and sitemaps
    * ([[sitemapParse]]): RSS `<item>` blocks (text `<link>`, RFC 1123
    * `<pubDate>`) or Atom `<entry>` blocks (attribute `<link href>`,
    * W3C `<updated>`); anything without an `<rss`/`<feed` root →
    * `invalid`. Same scanner discipline as the sitemap kernel: one
    * left-to-right pass, link-less items drop, entities decode once.
    *
    * Scale shape: feeds are a hosts-sized frame; the kernel is a narrow
    * per-row map, downstream freshness joins key on the item link. */
  private[graft] def feedKernel(txt: String): FeedParse = {
    if (txt == null) return FeedParse("invalid", Nil)
    val ir = txt.indexOf("<rss")
    val ia = txt.indexOf("<feed")
    def scan(open: String, close: String, from: Int,
        link: String => String, dateTag: String,
        dateOk: String => Boolean): Seq[FeedItem] = {
      val out = Vector.newBuilder[FeedItem]
      var pos = txt.indexOf(open, from)
      while (pos >= 0) {
        val end = txt.indexOf(close, pos + open.length)
        if (end < 0) pos = -1
        else {
          val block = txt.substring(pos + open.length, end)
          val l = link(block)
          if (l != null && l.nonEmpty) {
            val t = tagTextAttr(block, "title")
            val d = tagTextAttr(block, dateTag)
            out += FeedItem(xmlUnescape(l),
              if (t == null) null else xmlUnescape(t),
              d != null && dateOk(d))
          }
          pos = txt.indexOf(open, end + close.length)
        }
      }
      out.result()
    }
    if (ir >= 0 && (ia < 0 || ir < ia))
      FeedParse("rss", scan("<item>", "</item>", ir,
        b => tagTextAttr(b, "link"), "pubDate",
        d => rfc1123Re.matches(d)))
    else if (ia >= 0)
      FeedParse("atom", scan("<entry>", "</entry>", ia,
        atomLinkHref, "updated",
        d => d.matches("\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}.*")))
    else FeedParse("invalid", Nil)
  }

  def feedParse(txt: Column): Column =
    udf((t: String) => feedKernel(t)).apply(txt)

  /** Crawl-coverage audit: full-outer join of sitemap-listed locs
    * against crawled urls, aggregated per host — the refetch-planning
    * numbers a crawl operator reads off [[sitemapParse]]'s output:
    * how much of what the site declares did we fetch
    * (`n_both`/`n_listed_not_crawled`), what do we hold that the site
    * no longer lists (`n_crawled_not_listed`, deletion candidates), and
    * what has a declared `lastmod` NEWER than our fetch (`n_stale`, the
    * refetch set).
    *
    * Contracts: `listed` = (host, url, lastmod_day: nullable DATE) —
    * one row per sitemap entry; `crawled` = (host, url, crawl_day).
    * Scale shape: ONE exchange keyed on url (both sides are pages-sized;
    * neither broadcasts), then a hosts-sized aggregate with map-side
    * partials — no window, no driver collect. */
  def sitemapCoverage(listed: DataFrame, crawled: DataFrame): DataFrame = {
    val l = listed.select(col("host").as("l_host"), col("url"),
      col("lastmod_day"))
    val c = crawled.select(col("host").as("c_host"), col("url"),
      col("crawl_day"))
    l.join(c, Seq("url"), "full_outer")
      .groupBy(coalesce(col("l_host"), col("c_host")).as("host"))
      .agg(
        count(col("l_host")).as("n_listed"),
        count(col("c_host")).as("n_crawled"),
        sum(when(col("l_host").isNotNull && col("c_host").isNotNull, 1L)
          .otherwise(0L)).as("n_both"),
        sum(when(col("c_host").isNull, 1L).otherwise(0L))
          .as("n_listed_not_crawled"),
        sum(when(col("l_host").isNull, 1L).otherwise(0L))
          .as("n_crawled_not_listed"),
        sum(when(col("lastmod_day") > col("crawl_day"), 1L).otherwise(0L))
          .as("n_stale"))
  }

  /** Politeness fetch schedule: assign every frontier url a per-host
    * slot and a millisecond offset honoring that host's crawl-delay
    * ([[robotsPolicy]]'s `crawl_delay_ms`; hosts with no declared delay
    * get `defaultDelayMs`). Slots order by url — deterministic across
    * runs and cluster sizes, no wallclock involved; a scheduler adds its
    * own epoch. Output: input columns + `slot` (0-based) + `sched_ms`.
    *
    * Scale shape: delays are hosts-sized → broadcast left join (no url
    * exchange for the lookup); the one exchange is the per-host window,
    * and a hot host serializing through a single partition is not skew
    * to salt away — politeness IS per-host serialization, the host's
    * schedule length is its own fetch budget. */
  def politenessSchedule(urls: DataFrame, delays: DataFrame,
      defaultDelayMs: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("host")).orderBy(col("url"))
    urls.join(broadcast(delays.select(col("host"), col("delay_ms"))),
        Seq("host"), "left")
      .withColumn("slot", row_number().over(w) - 1)
      .withColumn("sched_ms",
        col("slot").cast("long") *
          coalesce(col("delay_ms"), lit(defaultDelayMs)))
      .drop("delay_ms")
  }
}
