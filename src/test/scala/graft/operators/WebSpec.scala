package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WebSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): Option[String] =
    Seq(Tuple1(url)).toDF("u")
      .select(Web.canonicalizeUrl(col("u")).as("c"))
      .collect().headOption.flatMap(r => Option(r.getString(0)))

  test("canonicalizeUrl applies the standard equivalences") {
    // Scheme+host lower-cased, default port dropped, fragment dropped,
    // utm_* dropped, params sorted, trailing slash dropped.
    assert(canon("HTTPS://WWW.Site.COM:443/a/b/?utm_source=x&ref=1&a=2#top")
      .contains("https://www.site.com/a/b?a=2&ref=1"))
    assert(canon("http://Host.org:80/p").contains("http://host.org/p"))
    // Non-default port survives; path case survives.
    assert(canon("https://h.com:8443/A/B").contains("https://h.com:8443/A/B"))
    // Root path: slash kept.
    assert(canon("http://h.com/").contains("http://h.com/"))
    // Empty query after utm strip: no dangling '?'.
    assert(canon("http://h.com/x?utm_campaign=c").contains("http://h.com/x"))
  }

  test("canonicalizeUrl rejects malformed input as NULL") {
    assert(canon("no-scheme.example/path").isEmpty)
    assert(canon("://missing.scheme").isEmpty)
    assert(canon("").isEmpty)
  }

  test("urlDedup keeps min-id per canonical URL and counts variants") {
    val docs = Seq(
      (1L, "https://a.com/x?b=1&a=2"),
      (2L, "HTTPS://A.COM:443/x/?a=2&b=1#f"),  // same page, dirty
      (3L, "https://a.com/y"),
      (4L, "garbage")                           // drops
    ).toDF("id", "url")
    val out = Web.urlDedup(docs, "id", "url")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(
      (1L, "https://a.com/x?a=2&b=1", 2L),
      (3L, "https://a.com/y", 1L)))
  }

  test("registrableDomain: eTLD+1 heuristic, ports stripped, junk is NULL") {
    import org.apache.spark.sql.functions.col
    def dom(u: String): Option[String] =
      Seq(u).toDF("url")
        .select(Web.registrableDomain(col("url")).as("d"))
        .collect().headOption.flatMap(r => Option(r.getString(0)))
    assert(dom("https://news.example.co.uk/a/1") == Some("example.co.uk"))
    assert(dom("https://blog.example.com/p") == Some("example.com"))
    assert(dom("https://example.com/p") == Some("example.com"))
    assert(dom("http://mirror.site.org:8080/x") == Some("site.org"))
    assert(dom("HTTPS://WWW.Example.COM/q") == Some("example.com"))
    // 'com.ac' pattern: sld list + 2-letter cc takes three labels.
    assert(dom("https://a.b.gov.uk/") == Some("b.gov.uk"))
    // Two-label host where the LAST label is a listed sld: still two.
    assert(dom("https://example.org/") == Some("example.org"))
    assert(dom("https://localhost/x").isEmpty)   // single label
    assert(dom("not a url").isEmpty)
    assert(dom("").isEmpty)
    // RFC 3986 userinfo never reaches the domain: different creds,
    // same site.
    assert(dom("https://admin@example.com/x") == Some("example.com"))
    assert(dom("https://u:p@example.com/") == Some("example.com"))
  }

  test("domainStats: per-domain doc and distinct-page census") {
    val docs = Seq(
      (1L, "https://a.example.com/p/1"),
      (2L, "https://b.example.com/p/1"),   // same domain, distinct url
      (3L, "https://a.example.com/p/1"),   // exact repeat: same page
      (3L, "https://a.example.com/p/1"),   // doc relisted: counts ONCE
      (4L, "https://shop.example.co.uk/x"),
      (5L, "junk")
    ).toDF("id", "url")
    val out = Web.domainStats(docs, "id", "url")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out == Map(
      "example.com" -> ((3L, 2L)),
      "example.co.uk" -> ((1L, 1L))))
  }

  private def extract(html: String, minChars: Int = 25): String =
    Seq(Tuple1(html)).toDF("h")
      .select(Web.extractText(col("h"), minChars).as("t"))
      .collect().head.getString(0)

  test("extractText drops script/style/comments and strips tags") {
    val html =
      """<html><head><title>t</title>
        |<style>p { color: red; } .nav { display:none }</style>
        |<script>var x = "<p>not content</p>";</script></head>
        |<body><!-- boilerplate comment with many words in it -->
        |<p>This is the <b>actual</b> article body with enough words
        |to clear the minimum length bar.</p></body></html>""".stripMargin
    assert(extract(html) ==
      "This is the actual article body with enough words " +
        "to clear the minimum length bar.")
  }

  test("extractText drops link-dense blocks, keeps prose with a link") {
    val html =
      "<div><a href='/'>Home</a> <a href='/a'>About</a> " +
        "<a href='/c'>Contact</a> <a href='/p'>Products</a></div>" +
        "<p>Long-form prose paragraph that cites one " +
        "<a href='/ref'>reference</a> but is plainly body text with " +
        "many ordinary words around it.</p>" +
        "<footer>short footer</footer>"
    assert(extract(html) ==
      "Long-form prose paragraph that cites one reference but is " +
        "plainly body text with many ordinary words around it.")
  }

  test("extractText unescapes entities, &amp; last (no double unescape)") {
    val html = "<p>Tom &amp; Jerry say &quot;2 &lt; 3&quot; and the " +
      "literal sequence &amp;lt; stays escaped here&nbsp;too.</p>"
    assert(extract(html) ==
      "Tom & Jerry say \"2 < 3\" and the literal sequence &lt; " +
        "stays escaped here too.")
  }

  test("extractText keeps surviving blocks in document order") {
    val html = "<p>First paragraph of the body with plenty of words " +
      "in it to pass.</p><div><a>x</a> <a>y</a> <a>z</a></div>" +
      "<p>Second paragraph of the body, also long enough to pass " +
      "the bar.</p>"
    assert(extract(html) ==
      "First paragraph of the body with plenty of words in it to pass." +
        "\nSecond paragraph of the body, also long enough to pass the bar.")
  }

  test("extractText on an all-boilerplate page is empty") {
    assert(extract("<nav><a>a</a> <a>b</a></nav><footer>tiny</footer>") == "")
  }

  test("extractLinks pulls quoted hrefs in document order, cuts fragments") {
    val html = """<a href="https://a.com/x">one</a>
      |<A HREF='/rel'>two</A> <a class="z" href="page.html#sec">three</a>
      |<a href="#top">frag only</a> <a name="anchor">no href</a>""".stripMargin
    val links = Seq(Tuple1(html)).toDF("h")
      .select(Web.extractLinks(col("h")).as("l"))
      .collect().head.getSeq[String](0)
    assert(links == Seq("https://a.com/x", "/rel", "page.html", ""))
  }

  test("robotsVerdicts: longest prefix wins, allow breaks ties, default allow") {
    val rules = Seq(
      ("site.com", "disallow", "/private/"),
      ("site.com", "allow", "/private/pub"),
      ("site.com", "disallow", "/tmp"),
      ("tie.org", "disallow", "/x/"),
      ("tie.org", "allow", "/x/")
    ).toDF("domain", "directive", "prefix")
    val urls = Seq(
      (1L, "https://www.site.com/private/a"),      // disallow /private/
      (2L, "https://www.site.com/private/pub/ok"), // longer allow wins
      (3L, "https://www.site.com/open/page"),      // no rule → allow
      (4L, "https://www.site.com/tmpfile"),        // prefix match mid-word
      (5L, "https://sub.tie.org/x/y"),             // equal length → allow
      (6L, "not a url")                            // dropped
    ).toDF("id", "url")
    val out = Web.robotsVerdicts(urls, "url", rules)
      .select(col("id"), col("allowed"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true,
      4L -> false, 5L -> true))
  }

  test("robotsVerdicts: bare-origin URL matches '/' rules, dups pass through") {
    val rules = Seq(("blocked.com", "disallow", "/"))
      .toDF("domain", "directive", "prefix")
    val urls = Seq(
      (1L, "https://blocked.com"),       // no path — still disallowed
      (2L, "https://blocked.com/x"),
      (2L, "https://blocked.com/x"),     // duplicate frontier row survives
      (3L, "https://open.org")
    ).toDF("id", "url")
    val out = Web.robotsVerdicts(urls, "url", rules)
      .select(col("id"), col("allowed"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(out.length == 4, "duplicate input rows must not collapse")
    val m = out.toSet
    assert(m == Set((1L, false), (2L, false), (3L, true)))
  }

  test("registrableDomainPsl: plain/wildcard/exception rules, default TLD") {
    val psl = Seq("com", "io", "github.io", "uk", "co.uk", "us",
      "k12.ma.us", "pvt.k12.ma.us", "jp", "*.kawasaki.jp",
      "!city.kawasaki.jp", "*.bd").map(Tuple1(_)).toDF("rule")
    val urls = Seq(
      (0L, "https://alpha.github.io/r"),      // nested plain suffix
      (1L, "https://www.example.com/i"),      // ordinary com
      (2L, "https://news.example.co.uk/a"),   // two-level suffix
      (3L, "https://x.pvt.k12.ma.us/s"),      // four-level suffix
      (4L, "https://a.b.bd/z"),               // wildcard *.bd → b.bd suffix
      (5L, "https://w.city.kawasaki.jp/k"),   // exception carve-out
      (6L, "https://city.kawasaki.jp/k"),     // the exception host itself
      (7L, "https://github.io/"),             // host IS a public suffix
      (8L, "https://b.bd/"),                  // *.bd: b.bd IS a suffix
      (9L, "https://weird.zz/p"),             // unknown TLD → implicit *
      (10L, "https://localhost/"),            // single label
      (11L, "not a url")                      // unparseable
    ).toDF("id", "url")
    val out = Web.registrableDomainPsl(urls, "url", psl)
      .select(col("id"), col("domain_psl"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out == Map(
      0L -> "alpha.github.io", 1L -> "example.com", 2L -> "example.co.uk",
      3L -> "x.pvt.k12.ma.us", 4L -> "a.b.bd", 5L -> "city.kawasaki.jp",
      6L -> "city.kawasaki.jp", 7L -> null, 8L -> null, 9L -> "weird.zz",
      10L -> null, 11L -> null))
  }

  test("robotsVerdicts: * wildcards, trailing-$ anchors, literal metachars") {
    val rules = Seq(
      ("w.com", "disallow", "/*.pdf$"),   // any path ending .pdf
      ("w.com", "allow", "/docs/*.pdf$"), // longer → wins under /docs/
      ("w.com", "disallow", "/a*z"),      // gap wildcard, unanchored
      ("dot.net", "disallow", "/x.y"),    // '.' is LITERAL, not regex-any
      ("dol.org", "disallow", "/p$q")     // mid-$ is literal
    ).toDF("domain", "directive", "prefix")
    val urls = Seq(
      (1L, "https://w.com/f/report.pdf"),        // *.pdf$ → disallow
      (2L, "https://w.com/docs/report.pdf"),     // longer allow wins
      (3L, "https://w.com/f/report.pdf?x=1"),    // $ anchor: query breaks it
      (4L, "https://w.com/abcz-tail"),           // /a*z matches mid-path
      (5L, "https://dot.net/xzy"),               // literal dot must NOT match
      (6L, "https://dot.net/x.y"),               // literal dot matches itself
      (7L, "https://dol.org/p$q/deep"),          // literal mid-$ matches
      (8L, "https://dol.org/pq")                 // ...and only itself
    ).toDF("id", "url")
    val out = Web.robotsVerdicts(urls, "url", rules)
      .select(col("id"), col("allowed"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true, 4L -> false,
      5L -> true, 6L -> false, 7L -> false, 8L -> true))
  }

  test("parseRobots: groups, UA selection, comments/BOM/CRLF, empty rules") {
    val alpha = "﻿# alpha policy\r\n" +
      "User-Agent: *\r\n" +
      "Disallow: /private/\r\n" +
      "Allow: /private/ok\r\n" +
      "\r\n" +
      "User-agent: GraftBot\r\n" +
      "Crawl-delay: 10\r\n" +          // unknown field inside a group
      "DISALLOW : /tmp/\r\n" +         // case+space tolerant field
      "Disallow:\r\n" +                // empty value = no rule
      "Allow: /tmp/pub # inline comment\r\n"
    val beta = "User-agent: Googlebot\nUser-agent: *\n" +
      "Disallow: /a*z$\nAllow: /a\n" +
      "Sitemap: https://beta.org/sitemap.xml\n" +
      "Disallow: no-slash-rule\n"      // not / or * — dropped
    val gamma = "Disallow: /headless-rule\n" + // before any UA: dropped
      "User-agent: otherbot\nDisallow: /\n"    // group not ours
    val bodies = Seq(("alpha.com", alpha), ("beta.org", beta),
      ("gamma.net", gamma)).toDF("domain", "body")
    val rules = Web.parseRobots(bodies, "domain", "body", "graftbot")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(rules == Set(
      // alpha has an exact graftbot group → star group ignored.
      ("alpha.com", "disallow", "/tmp/"),
      ("alpha.com", "allow", "/tmp/pub"),
      // beta has no graftbot group → the (googlebot, *) group applies.
      ("beta.org", "disallow", "/a*z$"),
      ("beta.org", "allow", "/a")))
    // gamma: no matching group at all → zero rules → default allow
    // downstream; composition check through robotsVerdicts.
    val verdicts = Web.robotsVerdicts(
      Seq((1L, "https://alpha.com/tmp/x"), (2L, "https://alpha.com/tmp/pub2"),
        (3L, "https://alpha.com/private/x"), // star group NOT ours → allowed
        (4L, "https://beta.org/abcz"), (5L, "https://beta.org/abcz-more"),
        (6L, "https://gamma.net/anything")).toDF("id", "url"),
      "url", Web.parseRobots(bodies, "domain", "body", "graftbot"))
      .select(col("id"), col("allowed"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(verdicts == Map(1L -> false, 2L -> true, 3L -> true,
      4L -> false, 5L -> true, 6L -> true))
  }

  test("parseCrawlDelays: exact beats star, invalid dropped, max collapse") {
    val bodies = Seq(
      // Exact group (5) shadows star (1); a second exact group's 2
      // participates in the max.
      ("a.com", "User-agent: *\nCrawl-delay: 1\n\n" +
        "User-agent: GraftBot\nCrawl-delay: 5\nDisallow: /x/\n\n" +
        "User-agent: graftbot\nCrawl-delay: 2"),
      // Star group: invalid value skipped, decimal kept.
      ("b.org", "User-agent: *\nCrawl-delay: fast\nCrawl-delay: 2.5"),
      // Only another bot's group → no row.
      ("c.net", "User-agent: otherbot\nCrawl-delay: 9"),
      // Headless delay before any UA line → dropped → no row.
      ("d.io", "Crawl-delay: 7\nUser-agent: otherbot\nCrawl-delay: 3")
    ).toDF("domain", "body")
    val got = Web.parseCrawlDelays(bodies, "domain", "body", "graftbot")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a.com" -> 5.0, "b.org" -> 2.5))
  }

  test("politenessSchedule spaces each domain by its delay; default fills") {
    val delays = Seq(("a.com", 2.5)).toDF("domain", "delay_sec")
    val frontier = Seq(("a.com", 10L), ("a.com", 3L), ("a.com", 7L),
      ("z.org", 1L), ("z.org", 2L)).toDF("domain", "doc_id")
    val got = Web.politenessSchedule(frontier, "domain", Seq("doc_id"),
        delays, defaultDelaySec = 1.0)
      .collect()
      .map(r => (r.getAs[String]("domain"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("pos"), r.getAs[Double]("delay_sec"),
          r.getAs[Long]("fetch_offset_ms"))).toMap
    assert(got == Map(
      ("a.com", 3L) -> ((1L, 2.5, 0L)),
      ("a.com", 7L) -> ((2L, 2.5, 2500L)),
      ("a.com", 10L) -> ((3L, 2.5, 5000L)),
      ("z.org", 1L) -> ((1L, 1.0, 0L)),
      ("z.org", 2L) -> ((2L, 1.0, 1000L))))
  }

  test("resolveUrl handles the four reference forms and NULLs junk") {
    def res(base: String, href: String): Option[String] =
      Seq((base, href)).toDF("b", "h")
        .select(Web.resolveUrl(col("b"), col("h")).as("r"))
        .collect().headOption.flatMap(r => Option(r.getString(0)))
    val base = "https://www.site.com/docs/page1.html"
    assert(res(base, "http://other.org/z").contains("http://other.org/z"))
    assert(res(base, "//cdn.net/lib").contains("https://cdn.net/lib"))
    assert(res(base, "/about").contains("https://www.site.com/about"))
    assert(res(base, "page2.html")
      .contains("https://www.site.com/docs/page2.html"))
    // Root-path base: relative resolves against "/".
    assert(res("https://h.com", "x.html").contains("https://h.com/x.html"))
    // Empty href (fragment-only link) and junk base → NULL.
    assert(res(base, "").isEmpty)
    assert(res("not a url", "/about").isEmpty)
    // Non-hierarchical absolute URIs (scheme, no //) are NOT relative
    // references (RFC 3986 §4.2): NULL quarantine, never
    // https://host/dir/mailto:… garbage in the crawl graph.
    assert(res(base, "mailto:a@b.com").isEmpty)
    assert(res(base, "javascript:void(0)").isEmpty)
    assert(res(base, "tel:+1-555-0100").isEmpty)
    assert(res(base, "data:text/plain;base64,SGk=").isEmpty)
    // ...but a colon AFTER the first slash is an ordinary path char.
    assert(res(base, "a/b:c.html")
      .contains("https://www.site.com/docs/a/b:c.html"))
  }

  test("extractAnchors pairs hrefs with their text; edge forms drop or trim") {
    import spark.implicits._
    val html =
      """<html><A HREF='/a' class="x">First Link</A>
        |<a rel=nofollow href="https://b.com/p">to <b>B</b> site</a>
        |<a href="#frag">frag only</a>
        |<a name="no-href">not a link</a>
        |<a href="/docs#install">Install guide</a>
        |<a data-href="#sec" href="/real">Real link</a>
        |<a href="/c"></a></html>""".stripMargin
    val out = Seq(html).toDF("h")
      .select(explode(Web.extractAnchors(col("h"))).as("a"))
      .select(col("a.href"), col("a.txt"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // A fragment SUFFIX is cut ('/docs#install' -> '/docs' — same as
    // extractLinks), a fragment-ONLY href extracts empty (resolveUrl
    // quarantines it to NULL), the no-href anchor has no href, a
    // data-href decoy must NOT shadow the real href (whitespace-
    // anchored attribute name), and nested markup trims at the first
    // inner tag.
    assert(out == Seq(("/a", "First Link"), ("https://b.com/p", "to "),
      ("", "frag only"), ("/docs", "Install guide"),
      ("/real", "Real link"), ("/c", "")))
  }

  test("parseSitemap: entries, entities, case, loc-less drop; refs from robots") {
    import spark.implicits._
    val bodies = Seq(
      ("a.com", "<urlset><url><loc> https://a.com/?x=1&amp;y=2 </loc>" +
        "<lastmod>2024-01-01</lastmod></url>" +
        "<URL><LOC>https://a.com/b</LOC></URL>" +
        "<url><priority>0.5</priority></url></urlset>"),
      ("b.org", "<sitemapindex><sitemap><loc>https://b.org/s.xml</loc>" +
        "</sitemap></sitemapindex>"),
      // Attributed <loc> (xsi:type etc.) must still extract — the
      // documented attribute tolerance covers the inner tags too.
      ("e.dev", "<urlset><url><loc xsi:type=\"s\">https://e.dev/x</loc>" +
        "<lastmod tz=\"Z\">2024-02-02</lastmod></url></urlset>"),
      ("c.net", "plain text")).toDF("domain", "body")
    val out = Web.parseSitemap(bodies, "domain", "body")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        Option(r.getString(3)))).toSet
    assert(out == Set(
      ("a.com", "url", "https://a.com/?x=1&y=2", Some("2024-01-01")),
      ("a.com", "url", "https://a.com/b", None),
      ("e.dev", "url", "https://e.dev/x", Some("2024-02-02")),
      ("b.org", "sitemap", "https://b.org/s.xml", None)))

    val refs = Web.sitemapRefs(
        Seq(("d.io", "User-agent: *\nSitemap: https://d.io/s1.xml\n" +
          "sitemap: https://d.io/s2.xml\nDisallow: /")).toDF("domain", "body"),
        "domain", "body")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(refs == Seq(("d.io", "https://d.io/s1.xml"),
      ("d.io", "https://d.io/s2.xml")))
  }

  test("anchorTermProfile aggregates anchor terms per resolved host") {
    import spark.implicits._
    val pages = Seq(
      ("https://x.com/d/p1.html",
        """<a href="https://t.org/a">great docs</a><a href="n.html">next page</a>"""),
      ("https://y.com/p2.html",
        """<a href="//t.org/b">great tool</a><a href="mailto:a@b">mail me</a>"""))
      .toDF("base", "html")
    val out = Web.anchorTermProfile(pages, "base", "html", k = 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet
    // t.org gets 'great' ×2 (ranked 1), then 'docs' (tie with 'tool',
    // term ASC); x.com keeps its own relative link's terms; the
    // mailto anchor is quarantined with its text.
    assert(out == Set(
      ("t.org", 1, "great", 2L), ("t.org", 2, "docs", 1L),
      ("x.com", 1, "next", 1L), ("x.com", 2, "page", 1L)))
  }

  test("urlTemplate: digits collapse, query/fragment strip, NULL passes") {
    val got = Seq(
      "https://a.com/item/8341?page=2&sid=77",
      "https://a.com/item/77",
      "https://cdn7.a.com:8080/v2/img99.png#frag",
      "https://a.com/static/about",
      null)
      .toDF("url").select(Web.urlTemplate(col("url"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got(0) == "https://a.com/item/{n}")
    assert(got(1) == "https://a.com/item/{n}")
    assert(got(2) == "https://cdn{n}.a.com:{n}/v{n}/img{n}.png")
    assert(got(3) == "https://a.com/static/about")
    assert(got(4) == null)
  }

  test("templateCensus: URL-minting template over constant content flags trap") {
    // /cal/{n}: 4 URLs, 1 digest -> trap at minUrls=3, ratio 2.
    // /item/{n}: 3 URLs, 3 digests -> legit. Junk URL row drops.
    val pages = Seq(
      ("https://a.com/cal/1", "h0"), ("https://a.com/cal/2", "h0"),
      ("https://a.com/cal/3", "h0"), ("https://a.com/cal/4", "h0"),
      ("https://a.com/item/1", "h1"), ("https://a.com/item/2", "h2"),
      ("https://a.com/item/3", "h3"),
      ("garbage", "h9"))
      .toDF("url", "digest")
    val got = Web.templateCensus(pages, "url", "digest",
        minUrls = 3, trapRatio = 2)
      .collect().map(r => r.getString(1) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got == Map(
      "https://a.com/cal/{n}" -> ((4L, 1L, true)),
      "https://a.com/item/{n}" -> ((3L, 3L, false))))
  }

  test("snapshotDiff: added/removed/changed/unchanged classification") {
    val old = Seq(("u1", "h1"), ("u2", "h2"), ("u3", "h3")).toDF("u", "h")
    val neu = Seq(("u2", "h2"), ("u3", "h3x"), ("u4", "h4")).toDF("u", "h")
    val got = Web.snapshotDiff(old, neu, "u", "h")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("u1" -> "removed", "u2" -> "unchanged",
      "u3" -> "changed", "u4" -> "added"))
  }

  test("snapshotDiff: presence is the join, not digest nullability") {
    // u1 present BOTH crawls, old digest unknown (fetch failed):
    // neither added nor removed — unknown-vs-known is 'changed'
    // (schedule a revisit). u2: NULL on both sides = 'unchanged'.
    val old = Seq[(String, String)](("u1", null), ("u2", null))
      .toDF("u", "h")
    val neu = Seq[(String, String)](("u1", "h1"), ("u2", null))
      .toDF("u", "h")
    val got = Web.snapshotDiff(old, neu, "u", "h")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("u1" -> "changed", "u2" -> "unchanged"))
  }
}
