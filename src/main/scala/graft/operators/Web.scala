package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Public-suffix-list-backed registrable domain — the EXACT policy
    * [[registrableDomain]]'s doc comment promises: `psl` is a
    * one-column (`rule`) table of publicsuffix.org rules in their
    * native syntax — plain suffixes (`com`, `co.uk`, `github.io`),
    * wildcards (`*.bd`: every direct child of .bd is a public
    * suffix), and exceptions (`!city.kawasaki.jp`: carved back OUT of
    * a wildcard) — and each URL's host resolves per the PSL
    * algorithm: among matching rules, an exception wins outright
    * (its suffix is the rule minus its first label), else the rule
    * with the MOST labels; no match falls back to the implicit `*`
    * rule (the bare TLD is the suffix). The registrable domain is
    * the suffix plus one more host label; a host that IS a public
    * suffix (or has no extra label) yields NULL, like the
    * heuristic's single-label NULL.
    *
    * Scale: hosts are extracted map-only and DISTINCT'd (site-sized,
    * not corpus-sized); each host explodes into its ≤ |labels|
    * suffix candidates and equi-joins the BROADCAST rules table
    * (the full PSL is ~10k rows — broadcast by construction); the
    * winner is one map-side-combinable max_by per host; the
    * host→domain map joins back onto the input. Never corpus×rules.
    *
    * Output: the input columns + `outCol` (NULL where the URL has no
    * parseable host or the host is itself a public suffix). */
  def registrableDomainPsl(
      urls: DataFrame,
      urlCol: String,
      psl: DataFrame,
      outCol: String = "domain_psl"): DataFrame = {
    require(!urls.columns.contains(outCol) &&
        !urls.columns.contains("__host"),
      s"registrableDomainPsl adds '$outCol' and works through '__host' — " +
        "rename those input columns before calling")
    val hostOf = lower(regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]+)", 1))
    val withHost = urls.withColumn("__host",
      when(hostOf === "", lit(null).cast("string")).otherwise(hostOf))
    // Rules normalized once: kind + the equi-join key (the rule minus
    // its '!'/'*.' marker) — policy-sized work.
    val rules = psl
      .select(lower(trim(col("rule"))).as("__rule"))
      .filter(length(col("__rule")) > 0)
      .select(
        when(col("__rule").startsWith("!"), lit(2))
          .when(col("__rule").startsWith("*."), lit(1))
          .otherwise(lit(0)).as("__kind"),
        when(col("__rule").startsWith("!"), expr("substring(__rule, 2)"))
          .when(col("__rule").startsWith("*."), expr("substring(__rule, 3)"))
          .otherwise(col("__rule")).as("__key"))
      .distinct()
    val hosts = withHost.select(col("__host")).filter(col("__host").isNotNull)
      .distinct()
      .select(col("__host"),
        filter(split(col("__host"), "\\."), l => length(l) > 0).as("__ls"))
      .select(col("__host"), col("__ls"), size(col("__ls")).as("__n"))
    // Every label-suffix of the host is a match candidate; the rule
    // kind maps a match at k labels to its public-suffix length.
    val cands = hosts
      .select(col("__host"), col("__n"), col("__ls"),
        explode(sequence(lit(1), col("__n"))).as("__k"))
      .withColumn("__cand",
        array_join(slice(col("__ls"), -col("__k"), col("__k")), "."))
    val matched = cands
      .join(broadcast(rules), col("__cand") === col("__key"))
      .withColumn("__pslen",
        when(col("__kind") === 2, col("__k") - 1)
          .when(col("__kind") === 1, col("__k") + 1)
          .otherwise(col("__k")))
      // A wildcard needs the extra label to exist on the host.
      .filter(col("__kind") =!= 1 || col("__pslen") <= col("__n"))
      .groupBy(col("__host"))
      // Exceptions (kind 2) outrank everything; then most labels.
      .agg(max_by(col("__pslen"),
        struct((col("__kind") === 2).as("exc"), col("__pslen"))).as("__win"))
    val resolved = hosts
      .join(matched, Seq("__host"), "left")
      .withColumn("__pslen", coalesce(col("__win"), lit(1)))
      .select(col("__host"),
        when(col("__n") > col("__pslen"),
          array_join(slice(col("__ls"),
            (-(col("__pslen") + 1)).cast("int"),
            (col("__pslen") + 1).cast("int")), "."))
          .as(outCol))
    withHost.join(resolved, Seq("__host"), "left").drop("__host")
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
      lit("(?i)<a\\b[^>]*?\\shref\\s*=\\s*[\"']([^\"'#>]*)"), lit(1))

  /** Anchor regex shared by [[extractAnchors]] and its SQL oracle
    * twin: group 1 = href (cut at quote/`#`/`>` like
    * [[extractLinks]] — the optional `(?:#[^"']*)?` consumes a
    * fragment SUFFIX so `/docs#install` still matches and yields
    * `/docs`; without it the pattern demanded a quote right after the
    * cut and silently dropped every fragment-suffixed anchor), group
    * 2 = the anchor's direct text (tag-free runs only — an anchor
    * wrapping inner markup contributes its text up to the first inner
    * tag, the dominant plain-link form; full main-content extraction
    * is [[extractText]]'s job). A fragment-ONLY href extracts as the
    * empty string, which [[resolveUrl]] quarantines to NULL — same
    * contract as [[extractLinks]]. The attribute name must follow
    * WHITESPACE (`\\s`, not `\\b`): `\\bhref` also matches inside
    * `data-href`/`ng-href` (the `-` is a word boundary), and with the
    * fragment suffix now consumable a `data-href="#sec"` would
    * otherwise win over the real href (RE2 oracles have no lookbehind
    * to exclude it; attributes are whitespace-separated, so `\\s` is
    * the faithful anchor). */
  private val anchorRe =
    "(?i)<a\\b[^>]*?\\shref\\s*=\\s*[\"']([^\"'#>]*)(?:#[^\"']*)?[\"'][^>]*>([^<]*)"

  /** (href, txt) pairs of a page's anchors in document order — the
    * anchor-TEXT side of the crawl graph ([[extractLinks]] keeps only
    * targets): what the web calls a page is a first-class relevance
    * signal (anchor-text aggregation per target is the classic
    * web-search feature). Pure regexp over the full matches — map-only
    * at scan speed. */
  def extractAnchors(html: Column): Column =
    transform(regexp_extract_all(html, lit(anchorRe), lit(0)),
      m => struct(
        regexp_extract(m, anchorRe, 1).as("href"),
        regexp_extract(m, anchorRe, 2).as("txt")))

  /** Anchor-text profile per target host: what the REST of the web
    * calls each host, as its top-k anchor terms by incoming-anchor
    * term count — the classic off-page relevance signal (and a strong
    * quality feature for crawl prioritization). Pipeline: extract
    * (href, txt) pairs, resolve against the page's base URL, drop
    * quarantined (NULL) targets, count (host, term), bounded top-k per
    * host — a mega-host (every page links example.com) costs k structs
    * of aggregate state, never a window partition.
    *
    * Output: (host, rank, term, cnt); ties broken by term ASC. */
  def anchorTermProfile(
      pages: DataFrame, baseCol: String, htmlCol: String, k: Int): DataFrame = {
    val hostRe = "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]+)"
    val anchors = pages
      .select(col(baseCol).as("__base"),
        explode(extractAnchors(col(htmlCol))).as("__a"))
      .select(resolveUrl(col("__base"), col("__a.href")).as("url"),
        col("__a.txt").as("txt"))
      .filter(col("url").isNotNull)
    val counts = anchors
      .select(regexp_extract(col("url"), hostRe, 1).as("host"),
        explode(graft.functions.TextFunctions.tokens(col("txt"))).as("term"))
      .groupBy(col("host"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    Ranking.groupTopK(counts, Seq("host"),
        Seq((-col("cnt")).as("neg_cnt"), col("term").as("term")), k)
      .select(col("host"), col("rank"), col("term"),
        (-col("neg_cnt")).cast("long").as("cnt"))
  }

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

  /** Compile one robots.txt path pattern into the Java/RE2-safe
    * regex both [[robotsVerdicts]] and its oracles match with:
    * regex metacharacters are escaped, `*` becomes `.*` (RFC 9309
    * §2.2.3 wildcard), and a TRAILING `$` anchors the end (a `$`
    * anywhere else is a literal path character, the Google-parser
    * behavior). The result is start-anchored: plain prefixes reduce
    * to the `startsWith` they always were. */
  private def robotsPatternRegex(pattern: Column): Column = {
    val anchored = pattern.endsWith("$")
    val core = when(anchored,
        pattern.substr(lit(1), length(pattern) - 1))
      .otherwise(pattern)
    // Escape every regex metacharacter except `*` (kept as the
    // wildcard), then widen `*` to `.*`. `$` inside the pattern is
    // escaped here — only the trailing one (already stripped) anchors.
    val esc = regexp_replace(core, "[.^$+?(){}\\[\\]|\\\\]", "\\\\$0")
    concat(lit("^"), replace(esc, lit("*"), lit(".*")),
      when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Crawl-policy verdicts, robots.txt: `rules` is the parsed
    * policy table `(domain, directive ∈ allow|disallow, prefix)` —
    * one row per Allow/Disallow line of a domain's robots.txt for the
    * crawler's user-agent ([[parseRobots]] produces exactly this
    * table) — and every URL gets the verdict of its MOST SPECIFIC
    * matching rule, Allow winning exact ties (the Google/RFC 9309
    * rule); a URL with no matching rule is allowed. Patterns support
    * the two RFC 9309 §2.2.3 metacharacters: `*` matches any char
    * sequence (including empty) and a TRAILING `$` anchors the match
    * at the end of the path; everything else is literal, so a plain
    * prefix behaves exactly like `startsWith`. URLs whose domain
    * fails to extract are dropped — quarantine upstream.
    *
    * Scale: the rules table is domain-keyed and policy-sized (dozens
    * of lines per domain), so the join broadcasts; the winner is one
    * map-side-combinable max_by per URL — score = 2·|pattern| +
    * isAllow, an integer total order in which a longer (more
    * specific, length measured on the raw pattern — the Google
    * specificity rule) pattern always beats a shorter one and Allow
    * beats Disallow at equal length (equal scores have equal parity,
    * hence equal isAllow, hence equal verdicts — ties are harmless
    * even among wildcard patterns). No window, no corpus×rules
    * blowup beyond each URL's own domain's rules.
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
    // The regex compiles from the pattern ONCE per rule row, before
    // the fan-out join — policy-sized work, not frontier-sized.
    val r = rules.select(col("domain"),
      (col("directive") === "allow").as("__isAllow"),
      col("prefix").as("__prefix"),
      robotsPatternRegex(col("prefix")).as("__rx"))
    val verdicts = withKey.select(col("domain"), col("__path")).distinct()
      .join(broadcast(r), Seq("domain"), "left")
      .withColumn("__hit",
        col("__prefix").isNotNull &&
          regexp_like(col("__path"), col("__rx")))
      .withColumn("__score",
        when(col("__hit"), length(col("__prefix")) * 2 +
          col("__isAllow").cast("int")))
      .groupBy(col("domain"), col("__path"))
      .agg(coalesce(max_by(col("__isAllow"), col("__score")), lit(true))
        .as("allowed"))
    withKey.join(verdicts, Seq("domain", "__path")).drop("__path")
  }

  /** Parse raw robots.txt BODY TEXT into the `(domain, directive,
    * prefix)` rules table [[robotsVerdicts]] consumes — the raw→typed
    * ingest boundary a real crawl has (robots bodies, not rules
    * tables; the reference's S1 normalize,
    * `src/roborock_collector.py:295-352`, is the same boundary one
    * level cooked). RFC 9309 §2 semantics, closed-form so a SQL
    * oracle can replay them:
    *
    *   1. a leading UTF-8 BOM is stripped; lines split on CRLF / CR /
    *      LF; `#` comments run to end of line; fields are
    *      case-insensitive and whitespace-tolerant
    *      (`DISALLOW : /x` parses);
    *   2. lines group into records: a run of consecutive
    *      `User-agent` lines opens a group that owns every
    *      Allow/Disallow until the next UA run; rules BEFORE any
    *      UA line belong to no group and are dropped (§2.2.1);
    *   3. group selection: if ANY group names `userAgent` exactly
    *      (case-insensitive product token match), the rules are the
    *      union of THOSE groups; otherwise the union of the `*`
    *      groups; otherwise no rules (everything allowed). This is
    *      the §2.2.1 most-specific-match rule restricted to exact
    *      tokens — substring product-token matching ("graftbot"
    *      matching "graftbot-images") is out of scope, documented;
    *   4. an EMPTY Allow/Disallow value is no rule (§2.2.2's
    *      "Disallow:" = allow everything); a value that starts with
    *      neither `/` nor `*` never matches a path and is dropped;
    *      `*`/`$` pattern metacharacters pass through verbatim for
    *      [[robotsVerdicts]] to interpret.
    *
    * Unknown fields (`Sitemap:`, `Crawl-delay:`, …) are ignored where
    * they stand — they do NOT break a group (the Google parser's
    * behavior, and the practical one: real robots.txt interleave
    * Crawl-delay inside groups).
    *
    * Scale: the split/field work is map-only; the grouping windows
    * partition BY DOMAIN and a robots body is capped small (RFC 9309
    * §2.4 requires parsers to honor only the first 500 KiB), so no
    * window partition can exceed one body's line count — this is the
    * bounded-partition window case, not the corpus-wide one the
    * Ranking operators exist to avoid. Output: (domain, directive ∈
    * allow|disallow, prefix), distinct. */
  def parseRobots(
      bodies: DataFrame,
      domainCol: String,
      bodyCol: String,
      userAgent: String): DataFrame =
    selectedGroupLines(bodies, domainCol, bodyCol, userAgent,
      Seq("allow", "disallow"))
      .filter(col("__value") =!= "" &&
        (col("__value").startsWith("/") || col("__value").startsWith("*")))
      .select(col("domain"), col("__field").as("directive"),
        col("__value").as("prefix"))
      .distinct()

  /** The shared parse scaffold behind [[parseRobots]] and
    * [[parseCrawlDelays]]: body text \u2192 comment/BOM-stripped lines \u2192
    * (field, value) pairs keeping only `user-agent` + `ruleFields` \u2192
    * UA-run record grouping \u2192 exact-beats-star group selection for
    * `userAgent`. Returns the NON-UA lines of the selected groups
    * with `domain`, `__field`, `__value` columns; each caller applies
    * its own field-specific value validation. Grouping sees only the
    * kept fields, so what counts as "breaking a UA run" is
    * per-parse-consistent: a `Crawl-delay` between two `User-agent`
    * lines splits the run for the delay parse (where it is a rule
    * line) but not for the allow/disallow parse (where it is an
    * ignored unknown field) \u2014 both coherent readings of RFC 9309
    * \u00A72.2.1's under-specified interleaving. */
  private def selectedGroupLines(
      bodies: DataFrame,
      domainCol: String,
      bodyCol: String,
      userAgent: String,
      ruleFields: Seq[String]): DataFrame = {
    val ua = userAgent.toLowerCase(java.util.Locale.ROOT).trim
    require(ua.nonEmpty && ua != "*",
      "userAgent must be a concrete product token (the '*' group is " +
        "the fallback, not an identity)")
    val lines = bodies.select(col(domainCol).as("domain"),
      posexplode(split(regexp_replace(col(bodyCol), "^\uFEFF", ""),
        "\r\n|\r|\n")).as(Seq("__ln", "__raw")))
    val fielded = lines
      .withColumn("__line", trim(regexp_replace(col("__raw"), "#.*$", "")))
      .withColumn("__field",
        lower(trim(regexp_extract(col("__line"), "^([^:]+):", 1))))
      .withColumn("__value",
        trim(regexp_extract(col("__line"), "^[^:]*:(.*)$", 1)))
      .filter(col("__field").isin("user-agent" +: ruleFields: _*))
      .withColumn("__isUa", col("__field") === "user-agent")
    val ordered = Window.partitionBy("domain").orderBy("__ln")
    val grouped = fielded
      .withColumn("__prevUa", lag(col("__isUa"), 1).over(ordered))
      .withColumn("__gstart", (col("__isUa") &&
        (col("__prevUa").isNull || !col("__prevUa"))).cast("int"))
      .withColumn("__gid", sum(col("__gstart")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val group = Window.partitionBy("domain", "__gid")
    val domainW = Window.partitionBy("domain")
    grouped
      .withColumn("__uaExact",
        max(col("__isUa") && lower(col("__value")) === ua).over(group))
      .withColumn("__uaStar",
        max(col("__isUa") && col("__value") === "*").over(group))
      .withColumn("__hasExact", max(col("__uaExact")).over(domainW))
      .filter(col("__gid") >= 1 && !col("__isUa"))
      .filter(when(col("__hasExact"), col("__uaExact"))
        .otherwise(col("__uaStar")))
  }

  /** Per-domain `Crawl-delay` for `userAgent` \u2014 the politeness half of
    * the robots parse, with the SAME group-selection semantics as
    * [[parseRobots]] (exact product-token groups beat `*` groups,
    * rules before any UA line are ownerless and dropped). The value
    * must be a plain nonnegative number (`12`, `2.5`); anything else
    * (`fast`, empty) is no directive \u2014 RFC 9309 doesn't define
    * Crawl-delay at all, so this follows the de-facto
    * Yandex/Bing reading. Multiple valid values across the selected
    * groups collapse to their MAX: the politeness-conservative choice
    * (crawl no faster than any group asked), and a deterministic one.
    * Domains with no selected valid delay emit no row \u2014 the caller
    * picks the default cadence.
    *
    * Scale: same bounded-by-body-size windows as [[parseRobots]] (a
    * parser honors only the first 500 KiB of robots.txt per RFC 9309
    * \u00A72.4); the collapse is one map-side-combinable hash agg on
    * domain. Output: (domain, delay_sec double). */
  def parseCrawlDelays(
      bodies: DataFrame,
      domainCol: String,
      bodyCol: String,
      userAgent: String): DataFrame =
    selectedGroupLines(bodies, domainCol, bodyCol, userAgent,
      Seq("crawl-delay"))
      .filter(regexp_like(col("__value"), lit("^[0-9]+(\\.[0-9]+)?$")))
      .groupBy(col("domain"))
      .agg(max(col("__value").cast("double")).as("delay_sec"))

  /** Politeness fetch schedule: order each domain's frontier URLs by
    * `orderCols` and space them `delay_sec` apart \u2014 URL i of a domain
    * fetches at offset `(i\u22121) \u00B7 round(delay_sec\u00B71000) ms`. `delays` is
    * [[parseCrawlDelays]] output (or any (domain, delay_sec) table);
    * domains absent from it run at `defaultDelaySec`. `orderCols` must
    * end in a per-domain-unique tiebreaker (the [[Ranking.groupRank]]
    * contract) so the schedule is deterministic.
    *
    * Scale: the per-domain position comes from [[Ranking.groupRank]]
    * (range-partitioned \u2014 a 10M-URL domain never lands on one task,
    * which is exactly the case crawl frontiers hit), and the delay
    * table is policy-sized, so it broadcast-joins. The ms arithmetic
    * is exact: one `round` per DOMAIN'S delay (not per row) then
    * integer multiply \u2014 no accumulating float error down a long
    * schedule. Output: input columns + `pos` (long, 1-based) +
    * `delay_sec` + `fetch_offset_ms` (long). */
  def politenessSchedule(
      frontier: DataFrame,
      domainCol: String,
      orderCols: Seq[String],
      delays: DataFrame,
      defaultDelaySec: Double): DataFrame = {
    val clash = Seq("pos", "rank", "delay_sec", "fetch_offset_ms",
      "__dd", "__ds").filter(frontier.columns.contains)
    require(clash.isEmpty,
      s"politenessSchedule adds/works through ${clash.mkString(", ")} — " +
        "rename those frontier columns (or drop them) before calling")
    val ranked = Ranking.groupRank(frontier, domainCol, orderCols)
      .withColumnRenamed("rank", "pos")
    ranked
      .join(broadcast(delays.select(col("domain").as("__dd"),
        col("delay_sec").as("__ds"))),
        col(domainCol) === col("__dd"), "left")
      .withColumn("delay_sec", coalesce(col("__ds"), lit(defaultDelaySec)))
      .withColumn("fetch_offset_ms",
        (col("pos") - 1) * round(col("delay_sec") * 1000).cast("long"))
      .drop("__dd", "__ds")
  }

  /** Decode the five XML character entities. `&amp;` LAST, so
    * double-escaped text (`&amp;lt;`) decodes one level per pass —
    * the standard order. */
  private def xmlUnescape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(c, "&lt;", "<"), "&gt;", ">"),
      "&quot;", "\""), "&apos;", "'"), "&amp;", "&")

  /** Sitemap XML parser (sitemaps.org protocol), regexp-grade like
    * [[parseRobots]] — the OTHER document robots.txt points a crawler
    * at: `<urlset>` page entries and `<sitemapindex>` child-sitemap
    * entries in one output, `(domain, kind ∈ url|sitemap, loc,
    * lastmod)`. `loc` is entity-decoded (sitemap locs legally carry
    * `&amp;` in query strings); entries with no/empty `<loc>` drop;
    * `lastmod` stays the raw string (W3C datetime parsing is the
    * caller's policy), NULL when absent. Case-insensitive, newline-
    * tolerant, attribute-tolerant; no backreferences so the same
    * patterns run on RE2 oracles. Map-only — explode of block matches
    * + per-block extracts at scan speed. */
  def parseSitemap(
      bodies: DataFrame, domainCol: String, bodyCol: String): DataFrame = {
    def blocks(re: String, kind: String): DataFrame =
      bodies.select(col(domainCol).as("domain"),
          explode(regexp_extract_all(col(bodyCol), lit(re), lit(1)))
            .as("__b"))
        .select(col("domain"), lit(kind).as("kind"),
          xmlUnescape(trim(regexp_extract(col("__b"),
            "(?is)<loc\\b[^>]*>\\s*(.*?)\\s*</loc>", 1))).as("loc"),
          trim(regexp_extract(col("__b"),
            "(?is)<lastmod\\b[^>]*>\\s*(.*?)\\s*</lastmod>", 1)).as("lastmod"))
        .filter(col("loc") =!= "")
    blocks("(?is)<url\\b[^>]*>(.*?)</url>", "url")
      .unionByName(blocks("(?is)<sitemap\\b[^>]*>(.*?)</sitemap>", "sitemap"))
      .withColumn("lastmod",
        when(col("lastmod") === "", lit(null).cast("string"))
          .otherwise(col("lastmod")))
  }

  /** `Sitemap:` references inside robots.txt bodies (RFC 9309 §2.3 —
    * the line [[parseRobots]] deliberately ignores, because it is
    * GLOBAL to the file, not part of any user-agent group). Output
    * (domain, loc) per reference, in body order, duplicates kept
    * (forensics); compose with [[parseSitemap]] for full discovery. */
  def sitemapRefs(
      bodies: DataFrame, domainCol: String, bodyCol: String): DataFrame =
    bodies.select(col(domainCol).as("domain"),
        explode(regexp_extract_all(
          regexp_replace(col(bodyCol), "^\uFEFF", ""),
          lit("(?im)^\\s*sitemap\\s*:\\s*(\\S+)"), lit(1))).as("loc"))
      .filter(col("loc") =!= "")

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

  /** URL → structural template: query string and fragment stripped,
    * every decimal-digit run replaced with `{n}` — so
    * `/item/8341?page=2` and `/item/77` collapse to `/item/{n}`. The
    * normalization behind crawler-trap mining: faceted navigation,
    * calendars, and session-id mazes mint unbounded CONCRETE URLs
    * over a handful of TEMPLATES, so template-level counting exposes
    * them where URL-level counting drowns. Digit runs in the
    * authority collapse too (`:80` → `:{n}`, IP hosts, `cdn7.`) —
    * numbered mirror hosts are exactly the kind of structural
    * repetition this wants to merge. Map-only; NULL in → NULL out. */
  def urlTemplate(url: Column): Column =
    regexp_replace(regexp_replace(url, "[?#].*$", ""), "[0-9]+", "{n}")

  /** Crawler-trap census over a crawl snapshot: group pages by
    * ([[registrableDomain]], [[urlTemplate]]), count concrete URLs
    * and DISTINCT content digests, and flag templates whose URL mass
    * vastly exceeds their content variety — `n_urls ≥ minUrls` and
    * `n_urls ≥ trapRatio · n_contents` marks a template minting many
    * URLs over near-constant content (session ids, sort-order
    * permutations, infinite calendars), the classic frontier
    * blocklist input.
    *
    * Scale: template + domain are map-only; the census is one
    * two-phase hash-agg on (domain, template) — trap keys are by
    * definition heavy and pre-aggregate map-side (distinct-digest
    * state is bounded by the template's true content variety, which
    * is small for exactly the rows that matter). Never URL×URL. Rows
    * with an unparseable domain drop (junk can't be scheduled
    * anyway). Output: (domain, template, n_urls, n_contents, trap). */
  def templateCensus(
      pages: DataFrame,
      urlCol: String,
      contentDigestCol: String,
      minUrls: Int,
      trapRatio: Int): DataFrame = {
    require(minUrls >= 1, "minUrls must be at least 1")
    require(trapRatio >= 1, "trapRatio must be at least 1")
    pages
      .select(registrableDomain(col(urlCol)).as("domain"),
        urlTemplate(col(urlCol)).as("template"),
        col(contentDigestCol).as("__digest"))
      .filter(col("domain").isNotNull)
      .groupBy(col("domain"), col("template"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("__digest")).as("n_contents"))
      .withColumn("trap",
        col("n_urls") >= minUrls &&
          col("n_urls") >= lit(trapRatio) * col("n_contents"))
  }

  /** Crawl snapshot diff — the incremental-recrawl primitive: given
    * two content-digest snapshots keyed by URL, classify every URL as
    * `added` (new only), `removed` (old only), `changed` (both, digest
    * differs), or `unchanged`. Per-domain change rates built on this
    * drive revisit scheduling (hot domains recrawl often, static ones
    * seldom) — the crawl twin of a CDC change feed.
    *
    * Inputs must be URL-distinct (one digest per URL per snapshot —
    * run [[urlDedup]] first); duplicates would fan the join out.
    * Enforced cheaply by contract, not a shuffle.
    *
    * Scale: one full-outer equi-join on the URL key — shuffle-bounded
    * on the key both sides are already grouped by; no window, no
    * corpus×corpus. Output: (url, status, old_digest, new_digest). */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      urlCol: String,
      digestCol: String): DataFrame = {
    // Presence rides explicit markers, NOT digest nullability — a URL
    // fetched in both crawls but with a NULL digest on one side (fetch
    // failed, digest skipped) is present-but-unknown, and inferring
    // absence from its payload would mislabel it added/removed. A NULL
    // digest on a present side compares as "changed" unless both are
    // NULL (null-safe equality): unknown-vs-known must schedule a
    // revisit.
    val o = oldSnap.select(col(urlCol).as("url"),
      col(digestCol).as("old_digest"), lit(true).as("__in_old"))
    val n = newSnap.select(col(urlCol).as("url"),
      col(digestCol).as("new_digest"), lit(true).as("__in_new"))
    o.join(n, Seq("url"), "full_outer")
      .select(col("url"),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(col("old_digest") <=> col("new_digest"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_digest"), col("new_digest"))
  }
}
