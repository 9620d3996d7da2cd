package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus operators: URL canonicalization and URL-keyed dedup —
  * the first pass of every crawl pipeline (a page fetched under
  * `HTTPS://WWW.Site.com:443/a/?utm_source=x&ref=1#top` and
  * `https://www.site.com/a/?ref=1` is the SAME page and must collapse
  * before any content-level dedup spends shingles on it).
  *
  * Everything here is pure `Column` expression composition (regexes,
  * array ops — all codegen'd, no UDFs), so canonicalization is
  * map-only and runs at scan speed; the dedup itself is one hash-agg
  * shuffle keyed on the canonical URL, the exact-dedup shape that
  * scales linearly to 100 TB of crawl metadata.
  */
object Web {

  /** Canonical form of a URL, applying the standard equivalences:
    *
    *   - scheme and host lower-cased (RFC 3986 §6.2.2.1),
    *   - default port dropped (`:80` for http, `:443` for https),
    *   - fragment dropped (never sent to the server),
    *   - `utm_*` tracking parameters dropped,
    *   - remaining query parameters sorted (order is not significant
    *     to ~all servers; sorting makes equal param sets equal strings),
    *   - trailing slash dropped from a non-root path.
    *
    * Malformed input (no `scheme://host`) canonicalizes to NULL rather
    * than passing through unvalidated — callers decide whether to keep
    * or quarantine those rows. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val authNoPort =
      when(scheme === "http", regexp_replace(auth, ":80$", ""))
        .when(scheme === "https", regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    val rest = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$", 1)
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "(?<=.)/$", "")
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"),
      p => length(p) > 0 && !p.startsWith("utm_")))
    val queryOut = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    when(scheme === "" || auth === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), authNoPort, path, queryOut))
  }

  /** Registrable domain (eTLD+1-lite) of a URL — the unit that crawl
    * policy, rate limits, per-site caps, and quality priors attach
    * to. Deliberately dependency-free heuristic: the registrable
    * domain is the last TWO host labels, or the last THREE when the
    * suffix looks like a two-level public suffix of the common
    * `<sld>.<cc>` form (sld ∈ co|com|net|org|ac|gov|edu and a
    * 2-letter country code — covers co.uk, com.au, ac.jp, …). Exact
    * policy wants the full public-suffix list as a broadcast-joined
    * table; this column form is the scan-speed approximation. NULL
    * for unparseable URLs and single-label hosts; literal IP hosts
    * come out as their last two octets — quarantine those upstream
    * if they matter. Ports and RFC 3986 userinfo (`user:pass@`) are
    * excluded by extraction — pages fetched under different
    * credentials are still the same site. */
  def registrableDomain(url: Column): Column = {
    val host = lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]+)", 1))
    val labels = filter(split(host, "\\."), l => length(l) > 0)
    val n = size(labels)
    when(n < 2, lit(null).cast("string"))
      .when(n >= 3
          && element_at(labels, -2)
            .isin("co", "com", "net", "org", "ac", "gov", "edu")
          && length(element_at(labels, -1)) === 2,
        array_join(slice(labels, -3, 3), "."))
      .otherwise(array_join(slice(labels, -2, 2), "."))
  }

  /** Per-domain crawl census: document count and distinct-page count
    * per registrable domain — the table a crawler's frontier
    * prioritization, per-site caps (C4 kept ≤ a fixed share per
    * domain), and domain-level block/allow decisions read. URLs are
    * aggregated AS GIVEN — compose [[canonicalizeUrl]] upstream when
    * the crawl carries variant spellings of the same page.
    *
    * Scale: domain extraction is map-only regex/array work at scan
    * speed; the census is one hash-agg keyed on the domain with
    * two-phase distinct counts (partials map-side combine — the
    * heavy keys are the mega-domains and they pre-aggregate in
    * place). Never corpus×corpus.
    *
    * Output: (domain, n_docs, n_pages) — distinct documents and
    * distinct URLs, so a doc listed once per snapshot still counts
    * once. */
  def domainStats(docs: DataFrame, idCol: String, urlCol: String)
      : DataFrame =
    docs
      .select(col(idCol).as("__id"), col(urlCol).as("__url"),
        registrableDomain(col(urlCol)).as("domain"))
      .filter(col("domain").isNotNull)
      .groupBy(col("domain"))
      .agg(countDistinct(col("__id")).as("n_docs"),
        countDistinct(col("__url")).as("n_pages"))

  /** Block-splitting regex for [[mainBlocks]]: every opening OR
    * closing block-level tag is a boundary (jusText's segmentation
    * unit). Inline tags (`<a> <b> <span> <em>` …) stay INSIDE the
    * block so its link count survives segmentation. */
  val BlockTagRe: String =
    "(?i)</?(?:p|div|li|h[1-6]|br|ul|ol|table|thead|tbody|tr|td|th|" +
      "section|article|aside|header|footer|nav|main|blockquote|figure|" +
      "figcaption|form|fieldset|pre)\\b[^>]*>"

  /** The five named entities + the apostrophe reference that dominate
    * real crawl text. Specific entities unescape FIRST and `&amp;`
    * LAST, so `&amp;lt;` correctly yields the literal `&lt;` instead
    * of double-unescaping to `<`. */
  private def unescapeEntities(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (from, to)) =>
        replace(acc, lit(from), lit(to)) }

  /** Main-content blocks of an HTML page — the trafilatura/jusText
    * stage a crawl corpus needs BEFORE any text operator sees it
    * (reference analogue: the raw→typed normalize at ingest,
    * `src/roborock_collector.py:295-352` — same boundary, one level
    * rawer). Rule set (deliberately closed-form so a SQL oracle can
    * apply the identical rules):
    *
    *   1. `<script>`/`<style>` elements and HTML comments are dropped
    *      wholesale (their text is code, not content);
    *   2. the page splits into blocks at every block-level tag
    *      ([[BlockTagRe]]);
    *   3. per block: strip remaining tags, unescape the common
    *      entities, collapse whitespace, trim;
    *   4. a block survives iff its text has ≥ `minChars` chars AND
    *      its link density is low — `3 · n_links ≤ n_words` (a nav
    *      bar is one word per link; body prose with a citation link
    *      every few words sails through).
    *
    * Returns `array<struct<txt, n_links, n_words>>` of the SURVIVING
    * blocks in document order. Pure codegen'd expression composition
    * (regex + array ops, no UDF): map-only, runs at scan speed, and
    * at 100 TB it is exactly as parallel as the scan that feeds it.
    */
  def mainBlocks(html: Column, minChars: Int = 25): Column = {
    val noScript =
      regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val clean = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val scored = transform(split(clean, BlockTagRe), b => {
      val txt = trim(regexp_replace(
        unescapeEntities(regexp_replace(b, "<[^>]*>", " ")), "\\s+", " "))
      val nWords = size(filter(split(txt, " "), w => length(w) > 0))
      struct(txt.as("txt"),
        regexp_count(b, lit("(?i)<a\\b")).as("n_links"),
        nWords.as("n_words"))
    })
    filter(scored, s => length(s.getField("txt")) >= minChars &&
      s.getField("n_links") * lit(3) <= s.getField("n_words"))
  }

  /** Extracted main text: the surviving [[mainBlocks]] joined with
    * newlines — empty string when nothing survives (caller decides
    * whether an all-boilerplate page is droppable). */
  def extractText(html: Column, minChars: Int = 25): Column =
    array_join(transform(mainBlocks(html, minChars), _.getField("txt")), "\n")

  /** Raw `href` targets of a page's anchor tags, in document order —
    * the outlink side of the crawl graph. Quoted hrefs only (the
    * overwhelmingly dominant form), value cut at the first quote,
    * `#` (fragments never reach the server) or `>`; a fragment-only
    * link therefore extracts as the empty string, which
    * [[resolveUrl]] maps to NULL. Pure regexp_extract_all — map-only
    * at scan speed, like everything in this object. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html,
      lit("(?i)<a\\b[^>]*?\\bhref\\s*=\\s*[\"']([^\"'#>]*)"), lit(1))

  /** RFC-3986-lite reference resolution of `href` against the page's
    * absolute `base` URL — the four forms a crawler actually meets:
    *
    *   - absolute (`scheme://…`): taken as-is;
    *   - protocol-relative (`//host/…`): base's scheme prepended;
    *   - root-relative (`/path`): scheme://host prepended;
    *   - relative (`page.html`): resolved against the base's
    *     directory (last path segment dropped; `/` when the base
    *     path is empty).
    *
    * Non-hierarchical absolute URIs — a scheme with no `//`
    * (`mailto:`, `javascript:`, `tel:`, `data:`) — resolve to NULL:
    * they are real absolute references (RFC 3986 §4.2 forbids a colon
    * in a relative reference's first segment), but they never name a
    * fetchable page, and falling through to the relative branch would
    * mint garbage like `https://host/dir/mailto:a@b.com` whose "domain"
    * then pollutes the crawl graph. Empty hrefs and unparseable bases
    * also resolve to NULL — quarantine upstream. Dot-segment
    * normalization (`../`) is deliberately out of scope (compose a
    * regexp pass if a corpus needs it). */
  def resolveUrl(base: Column, href: Column): Column = {
    val scheme = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    val host = regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    val basePath =
      regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val dir = regexp_replace(basePath, "[^/]*$", "")
    when(href.isNull || href === "" || scheme === "" || host === "",
        lit(null).cast("string"))
      .when(href.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), href)
      .when(href.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), lit(null).cast("string"))
      .when(href.startsWith("//"), concat(scheme, lit(":"), href))
      .when(href.startsWith("/"), concat(scheme, lit("://"), host, href))
      .otherwise(concat(scheme, lit("://"), host,
        when(dir === "", lit("/")).otherwise(dir), href))
  }

  /** Crawl-policy verdicts, robots.txt-lite: `rules` is the parsed
    * policy table `(domain, directive ∈ allow|disallow, prefix)` —
    * one row per Allow/Disallow line of a domain's robots.txt for the
    * crawler's user-agent — and every URL gets the verdict of its
    * LONGEST matching path prefix, Allow winning exact ties (the
    * Google/RFC 9309 rule); a URL with no matching rule is allowed.
    * URLs whose domain fails to extract are dropped — quarantine
    * upstream.
    *
    * Scale: the rules table is domain-keyed and policy-sized (dozens
    * of lines per domain), so the join broadcasts; the winner is one
    * map-side-combinable max_by per URL — score = 2·|prefix| +
    * isAllow, an integer total order in which a longer prefix always
    * beats a shorter one and Allow beats Disallow at equal length
    * (equal scores imply equal verdicts, so ties are harmless). No
    * window, no corpus×rules blowup beyond each URL's own domain's
    * rules.
    *
    * Output: input columns + `domain` + `allowed` (boolean), one
    * output row per input row (verdicts are computed once per
    * DISTINCT (domain, path) and joined back, so duplicate frontier
    * rows pass through unmerged). */
  def robotsVerdicts(
      urls: DataFrame,
      urlCol: String,
      rules: DataFrame): DataFrame = {
    require(!urls.columns.contains("domain") &&
        !urls.columns.contains("allowed") &&
        !urls.columns.contains("__path"),
      "robotsVerdicts adds 'domain' and 'allowed' and works through " +
        "'__path' — rename those input columns (or drop them) before " +
        "calling")
    val rawPath = regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1)
    val withKey = urls
      .withColumn("domain", registrableDomain(col(urlCol)))
      .filter(col("domain").isNotNull)
      // RFC 9309: a URL with no path component is the root — a bare
      // `https://example.com` must match a `/` rule, not bypass it.
      .withColumn("__path",
        when(rawPath === "", lit("/")).otherwise(rawPath))
    val r = rules.select(col("domain"),
      (col("directive") === "allow").as("__isAllow"),
      col("prefix").as("__prefix"))
    val verdicts = withKey.select(col("domain"), col("__path")).distinct()
      .join(broadcast(r), Seq("domain"), "left")
      .withColumn("__hit",
        col("__prefix").isNotNull &&
          col("__path").startsWith(col("__prefix")))
      .withColumn("__score",
        when(col("__hit"), length(col("__prefix")) * 2 +
          col("__isAllow").cast("int")))
      .groupBy(col("domain"), col("__path"))
      .agg(coalesce(max_by(col("__isAllow"), col("__score")), lit(true))
        .as("allowed"))
    withKey.join(verdicts, Seq("domain", "__path")).drop("__path")
  }

  /** URL-keyed dedup: one surviving row per canonical URL — the
    * survivor is the MINIMUM id (deterministic, re-run-stable), with
    * the variant count kept for crawl forensics. Rows whose URL fails
    * to canonicalize (NULL) are dropped — they never name a page.
    *
    * Scale: canonicalization is map-only; the collapse is a single
    * hash-agg keyed on the canonical URL (map-side combinable — the
    * heavy keys ARE the duplicated URLs and they pre-aggregate in
    * place). Never corpus×corpus. */
  def urlDedup(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs
      .select(col(idCol), canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .filter(col("canonical_url").isNotNull)
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as(idCol),
        count(lit(1)).cast("long").as("n_variants"))
      .select(col(idCol), col("canonical_url"), col("n_variants"))
}
