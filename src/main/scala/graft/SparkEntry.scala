package graft

import graft.functions.TextFunctions
import graft.functions.VectorFunctions
import graft.operators._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Numeric determinism policy (100 TB stance): floating-point SUMs are
  * order-dependent, so every aggregate over a double column goes
  * through per-row fixed-point quantization (`round(x*100)` → int64
  * "cents") and exact integer summation — bit-identical across
  * engines, partition counts, and reduction orders. Doubles appear in
  * outputs only as (a) per-row passthroughs or (b) single mirrored
  * IEEE ops over exact integers (one divide, one sqrt), which are
  * reproducible everywhere.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Graft.table(s, dir, name)

  /** q384's rolling Mann-Kendall gate body (kept factored out — the
    * r17 q384a-c diagnostics that shared it are retired). */
  private def rollingMkGate(s: SparkSession, dir: String): DataFrame =
    TimeSeries.rollingMannKendall(t(s, dir, "events"), "user_id",
      "ts", "event_id", "value", window = 16,
      thresholdMicro = 1959964L)

  /** The melted (feature, v, y) feature table shared by the q402
    * stump and q442 Youden gates (and their oracles' e/m CTEs). */
  private def meltedEvents(s: SparkSession, dir: String): DataFrame = {
    val y = ((col("user_id") + col("event_id")) % 2 === 0).as("y")
    t(s, dir, "events").select(y,
        explode(array(
          struct(lit("value").as("f"),
            col("value").cast("double").as("v")),
          struct(lit("hour").as("f"),
            (expr("unix_millis(ts) div 3600000") % 24)
              .cast("double").as("v")),
          struct(lit("residue").as("f"),
            (col("user_id") % 100).cast("double").as("v"))))
          .as("fv"))
      .select(col("fv.f").as("feature"), col("fv.v").as("v"),
        col("y"))
  }

  /** q402's decision-stump gate body (kept factored out — the r17
    * q402a-c diagnostics that shared it are retired). */
  private def stumpGate(s: SparkSession, dir: String): DataFrame =
    Profile.decisionStump(meltedEvents(s, dir), "feature", "v", "y")

  /** Per-row fixed-point: dollars-ish double → exact integer cents. */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** The synthetic crawl-URL column shared by q121/q149/q150/q152/
    * q155: five URL shapes (two-level eTLD, subdomain, bare domain,
    * explicit default port, junk) keyed on `id` residues — mirrored
    * verbatim in each gate's oracle SQL. `id` must be a non-negative
    * long (`/ 7` then cast truncates toward zero ≡ `div` there). */
  private def crawlUrlAt(id: Column): Column = {
    val page = (id / 7).cast("long").cast("string")
    when(id % 5 === 0,
        concat(lit("https://news.example.co.uk/a/"), page))
      .when(id % 5 === 1,
        concat(lit("https://blog.example.com/p/"), page))
      .when(id % 5 === 2,
        concat(lit("https://example.com/p/"), page))
      .when(id % 5 === 3,
        concat(lit("http://mirror.site.org:80/x/"), page))
      .otherwise(lit("not a url"))
  }

  private def crawlUrl: Column = crawlUrlAt(col("doc_id"))

  /** A self-cleaning scratch dir for the ACID round-trip gates
    * (q139/q140): the returned frame is read lazily AFTER the builder
    * returns, so the dir cannot be deleted eagerly. All scratch dirs
    * register in ONE shared list reaped by ONE shutdown hook — Bench
    * invokes each builder 3× and a long-lived driver (notebook /
    * Verify session) many more, so per-call hooks would accumulate
    * one thread each for the JVM lifetime. [[reapScratch]] lets such
    * a driver reclaim the space between runs without waiting for
    * shutdown (a re-invoked builder mints a fresh dir, so reaping
    * old ones never races a live query). */
  private val scratchDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => reapScratch()))
  }

  /** Best-effort delete of every scratch dir minted so far; safe to
    * call between Bench iterations or from a long-lived session. */
  def reapScratch(): Unit = {
    val it = scratchDirs.iterator()
    while (it.hasNext) {
      val d = it.next()
      // Deregister only AFTER a fully-successful delete: a partial
      // failure (transient IO, still-open handle) keeps the dir
      // registered so the shutdown hook retries it — otherwise a
      // mid-run failure would strand the tree permanently.
      try {
        java.nio.file.Files.walk(d)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        it.remove()
      } catch { case _: Throwable => () }
    }
  }

  private def scratchDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    scratchDirs.add(d)
    d.toString
  }

  /** The robots.txt BODY fixture shared by q151/q152/q155: three
    * domains matching [[crawlUrl]]'s registrables, exercising BOM,
    * CRLF, comments (line and inline), case/space-tolerant fields,
    * an unknown field inside a group, a star group shadowed by an
    * exact group, a multi-UA group, empty and bare-token rules,
    * wildcard `*`/`$` patterns, a headless rule before any UA line,
    * and a domain whose only group is another bot's. Mirrored
    * line-for-line in [[robotsBodiesSql]]. */
  private def robotsBodies(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("example.com", "\uFEFF# example.com policy\r\n" +
        "User-Agent: *\r\n" +
        "Disallow: /\r\n" +
        "\r\n" +
        "User-agent: GraftBot\r\n" +
        "Crawl-delay: 5\r\n" +
        "Disallow: /p/*4$\r\n" +
        "Allow: /p/\r\n" +
        "Disallow:\r\n" +
        "Disallow: bare-token"),
      ("example.co.uk", "User-agent: Googlebot\n" +
        "User-agent: *\n" +
        "Disallow: /a/*7$\n" +
        "Disallow: /a/2\n" +
        "Sitemap: https://example.co.uk/s.xml"),
      ("site.org", "Disallow: /headless\n" +
        "User-agent: otherbot\n" +
        "Disallow: /")
    ).toDF("domain", "body")
  }

  /** The PAN fixture payload shared by q172/q173: residue-keyed
    * suffixes with a Luhn-valid Visa test PAN, a checksum-failing
    * look-alike, a valid PAN beside an over-long (20-digit) run, and
    * no digits. Mirrored literally in both oracles. */
  private def panPayload: Column =
    when(col("doc_id") % 4 === 0, lit(" card 4111111111111111 ok"))
      .when(col("doc_id") % 4 === 1, lit(" num 4111111111111112 no"))
      .when(col("doc_id") % 4 === 2,
        lit(" pay 4012888888881881 ref 12345678901234567890 over"))
      .otherwise(lit(" no digits here"))

  /** The IBAN fixture payload for q322: the mod-97-valid canonical
    * IBAN, a one-digit-off invalid twin, and a shape-failing
    * uppercase run (extracted, then dropped by the country+check
    * shape filter — it still advances cand_idx). Mirrored literally
    * in the oracle. */
  private def ibanPayload: Column =
    when(col("doc_id") % 3 === 0,
      lit(" acct GB82WEST12345698765432 ok"))
      .when(col("doc_id") % 3 === 1,
        lit(" acct GB82WEST12345698765433 no"))
      .otherwise(lit(" ref 1234567890ABCDE x"))

  /** Crawl-delay fixture for q166: an exact group shadowing a star
    * group (5 beats 1), a star group with an invalid value before a
    * decimal one, and a domain whose only group belongs to another
    * bot (→ caller default). Disallow lines present to prove rule
    * lines of the OTHER parse don't perturb this one. Mirrored in the
    * q166 oracle's `dbod` CTE. */
  private def delayBodies(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("example.com", "User-agent: *\nCrawl-delay: 1\n\n" +
        "User-agent: GraftBot\nCrawl-delay: 5\nDisallow: /tmp/"),
      ("example.co.uk", "User-agent: *\nCrawl-delay: fast\n" +
        "Crawl-delay: 2.5\nDisallow: /a/"),
      ("site.org", "User-agent: otherbot\nCrawl-delay: 9")
    ).toDF("domain", "body")
  }

  /** Sitemap fixtures for q165: a namespaced urlset with whitespace,
    * entities, uppercase tags, and a loc-less entry; a sitemapindex;
    * a non-XML body. The SQL twin rebuilds the same strings. */
  private def sitemapBodies(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("example.com",
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
          "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
          " <url>\n  <loc>https://example.com/</loc>\n" +
          "  <lastmod>2024-01-05</lastmod>\n  <priority>1.0</priority>\n" +
          " </url>\n" +
          " <url><loc> https://example.com/p?a=1&amp;b=2 </loc></url>\n" +
          " <URL><LOC>https://example.com/caps</LOC>" +
          "<lastmod>2024-02-01T10:00:00+00:00</lastmod></URL>\n" +
          " <url><lastmod>2024-03-01</lastmod></url>\n" +
          "</urlset>"),
      ("example.co.uk",
        "<sitemapindex>\n" +
          " <sitemap><loc>https://example.co.uk/s1.xml</loc>" +
          "<lastmod>2024-01-01</lastmod></sitemap>\n" +
          " <sitemap>\n  <loc>https://example.co.uk/s2.xml</loc>\n" +
          " </sitemap>\n" +
          "</sitemapindex>"),
      ("site.org", "not xml at all")
    ).toDF("domain", "body")
  }

  /** The DuckDB twin of [[robotsBodies]] + `Web.parseRobots`: CTEs
    * `bodies` → … → `rules(domain, directive, prefix)` replaying the
    * RFC 9309 §2 parse (BOM/CRLF/comment strip, field extraction,
    * UA-run grouping via lag/sum windows, exact-beats-star group
    * selection, empty/non-path rule drop) in SQL. Spliced into the
    * q151/q152/q155 oracles. */
  private val robotsParseSql: String =
    """bodies AS (
      |  SELECT * FROM (VALUES
      |    ('example.com', chr(65279) || '# example.com policy'
      |     || chr(13)||chr(10) || 'User-Agent: *'
      |     || chr(13)||chr(10) || 'Disallow: /'
      |     || chr(13)||chr(10)
      |     || chr(13)||chr(10) || 'User-agent: GraftBot'
      |     || chr(13)||chr(10) || 'Crawl-delay: 5'
      |     || chr(13)||chr(10) || 'Disallow: /p/*4$'
      |     || chr(13)||chr(10) || 'Allow: /p/'
      |     || chr(13)||chr(10) || 'Disallow:'
      |     || chr(13)||chr(10) || 'Disallow: bare-token'),
      |    ('example.co.uk', 'User-agent: Googlebot' || chr(10) ||
      |     'User-agent: *' || chr(10) ||
      |     'Disallow: /a/*7$' || chr(10) || 'Disallow: /a/2' || chr(10) ||
      |     'Sitemap: https://example.co.uk/s.xml'),
      |    ('site.org', 'Disallow: /headless' || chr(10) ||
      |     'User-agent: otherbot' || chr(10) || 'Disallow: /')
      |  ) b(domain, body)),
      |rln AS (
      |  SELECT domain, ls[i] AS raw, i AS lno
      |  FROM (SELECT domain, string_split_regex(
      |          regexp_replace(body, '^' || chr(65279), ''),
      |          '\r\n|\r|\n') AS ls
      |        FROM bodies), UNNEST(generate_series(1, len(ls))) AS u(i)),
      |rf AS (
      |  SELECT domain, lno,
      |    lower(trim(regexp_extract(l, '^([^:]+):', 1))) AS field,
      |    trim(regexp_extract(l, '^[^:]*:(.*)$', 1)) AS value
      |  FROM (SELECT domain, lno, trim(regexp_replace(raw, '#.*$', '')) AS l
      |        FROM rln)),
      |rk AS (
      |  SELECT *, field = 'user-agent' AS isua FROM rf
      |  WHERE field IN ('user-agent', 'allow', 'disallow')),
      |rg AS (
      |  SELECT *, sum(CASE WHEN isua AND (prevua IS NULL OR NOT prevua)
      |                     THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY domain ORDER BY lno
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
      |  FROM (SELECT *, lag(isua) OVER (PARTITION BY domain ORDER BY lno)
      |          AS prevua FROM rk)),
      |rs AS (
      |  SELECT *,
      |    max(isua AND lower(value) = 'graftbot')
      |      OVER (PARTITION BY domain, gid) AS uaexact,
      |    max(isua AND value = '*') OVER (PARTITION BY domain, gid) AS uastar
      |  FROM rg),
      |rs2 AS (SELECT *, max(uaexact) OVER (PARTITION BY domain) AS hasexact
      |        FROM rs),
      |rules AS (
      |  SELECT DISTINCT domain, field AS directive, value AS prefix
      |  FROM rs2
      |  WHERE gid >= 1 AND NOT isua
      |    AND (CASE WHEN hasexact THEN uaexact ELSE uastar END)
      |    AND value <> ''
      |    AND (starts_with(value, '/') OR starts_with(value, '*')))"""
      .stripMargin

  /** The [[crawlUrl]] construction + path/eTLD+1 extraction as CTEs
    * `<p>u` → `<p>h` → `<p>d(doc_id, n_chars, url, path, domain)` —
    * the SQL twin of `documents.select(doc_id, crawlUrlAt(idExpr))` +
    * `Web.registrableDomain` + robotsVerdicts' path normalization.
    * `idExpr` is the residue key ("doc_id", or "doc_id + 1" for the
    * q155 successor-link edges); `p` prefixes the CTE names so two
    * chains can coexist in one WITH. Spliced into q152/q155. */
  private def crawlUrlChainSql(idExpr: String, p: String): String =
    s"""${p}u AS (
      |  SELECT doc_id, n_chars, CASE
      |    WHEN ($idExpr) % 5 = 0 THEN 'https://news.example.co.uk/a/'
      |      || CAST(($idExpr) // 7 AS VARCHAR)
      |    WHEN ($idExpr) % 5 = 1 THEN 'https://blog.example.com/p/'
      |      || CAST(($idExpr) // 7 AS VARCHAR)
      |    WHEN ($idExpr) % 5 = 2 THEN 'https://example.com/p/'
      |      || CAST(($idExpr) // 7 AS VARCHAR)
      |    WHEN ($idExpr) % 5 = 3 THEN 'http://mirror.site.org:80/x/'
      |      || CAST(($idExpr) // 7 AS VARCHAR)
      |    ELSE 'not a url' END AS url
      |  FROM documents),
      |${p}h AS (
      |  SELECT doc_id, n_chars, url,
      |    list_filter(string_split(lower(regexp_extract(url,
      |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]+)', 1)),
      |      '.'), x -> len(x) > 0) AS ls,
      |    regexp_extract(url,
      |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)', 1) AS path
      |  FROM ${p}u),
      |${p}d AS (
      |  SELECT doc_id, n_chars, url,
      |    CASE WHEN path = '' THEN '/' ELSE path END AS path,
      |    CASE WHEN len(ls) < 2 THEN NULL
      |         WHEN len(ls) >= 3
      |              AND ls[len(ls)-1] IN
      |                ('co','com','net','org','ac','gov','edu')
      |              AND len(ls[len(ls)]) = 2
      |           THEN array_to_string(
      |             list_slice(ls, len(ls)-2, len(ls)), '.')
      |         ELSE array_to_string(
      |             list_slice(ls, len(ls)-1, len(ls)), '.') END AS domain
      |  FROM ${p}h)""".stripMargin

  private val crawlUrlPathDomainSql: String = crawlUrlChainSql("doc_id", "")

  /** The robots pattern→regex compile + longest-match verdict in SQL
    * (the twin of `Web.robotsPatternRegex` + the max_by winner),
    * reading CTEs `rules` and `d(doc_id, url, path, domain)`.
    * Spliced into q152/q155. */
  private val robotsVerdictSql: String =
    """rx AS (
      |  SELECT domain, directive, prefix,
      |    '^' || replace(regexp_replace(
      |        CASE WHEN ends_with(prefix, '$')
      |             THEN substr(prefix, 1, len(prefix) - 1) ELSE prefix END,
      |        '([.^$+?(){}\[\]|\\])', '\\\1', 'g'), '*', '.*')
      |      || CASE WHEN ends_with(prefix, '$') THEN '$' ELSE '' END AS rxs
      |  FROM rules),
      |vj AS (
      |  SELECT d.doc_id, d.url, d.domain,
      |    CASE WHEN r.prefix IS NOT NULL AND regexp_matches(d.path, r.rxs)
      |      THEN len(r.prefix) * 2
      |        + CASE WHEN r.directive = 'allow' THEN 1 ELSE 0 END
      |    END AS score,
      |    r.directive = 'allow' AS is_allow
      |  FROM d LEFT JOIN rx r ON d.domain = r.domain
      |  WHERE d.domain IS NOT NULL),
      |verdicts AS (
      |  SELECT doc_id, url, domain,
      |    coalesce(arg_max(is_allow, score), TRUE) AS allowed
      |  FROM vj GROUP BY doc_id, url, domain)""".stripMargin

  /** P2 mapping used by the event-normalization queries. */
  private val stateMap = Map(
    "click" -> "cleaning", "view" -> "idle", "purchase" -> "spot_cleaning",
    "signup" -> "charging", "error" -> "error")

  /** The q28 input: events rows reshaped into device status samples.
    * Shared by the batch gate query and the streaming≡batch parity
    * spec so both paths see the IDENTICAL extraction. */
  def statusSamplesFromEvents(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[graft.sources.Schemas.StatusSample] = {
    import s.implicits._
    t(s, dir, "events").select(
      concat(lit("dev_"), col("user_id") % 50).as("deviceName"),
      col("ts"),
      // StatusSample.state is non-nullable — a NULL event_type would
      // NPE in the step function; treat missing as 'unknown'.
      coalesce(
        Normalize.normalizeEnum(col("event_type"), stateMap, "unknown"),
        lit("unknown")).as("state"),
      floor(coalesce(col("value"), lit(0.0))).cast("int").as("battery"),
      lit(null).cast("string").as("fanPower"),
      lit(null).cast("string").as("waterLevel"),
      lit(null).cast("string").as("mopMode"),
      lit(null).cast("int").as("errorCode"))
      .as[graft.sources.Schemas.StatusSample]
  }

  /** SQL twin of Normalize.normalizeEnum over stateMap — including its
    * null-through semantics (a bare CASE would turn NULL into the ELSE
    * branch and silently diverge from the Spark side). */
  private val stateCaseSql =
    """CASE WHEN event_type IS NULL THEN NULL ELSE CASE lower(event_type)
      | WHEN 'click' THEN 'cleaning' WHEN 'view' THEN 'idle'
      | WHEN 'purchase' THEN 'spot_cleaning' WHEN 'signup' THEN 'charging'
      | WHEN 'error' THEN 'error' ELSE 'unknown' END END""".stripMargin

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_daily_summary")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 — the Daily_Summary the reference declares but never computes
    // (pipeline.py:307): per-day count/sum/avg.
    "q01_daily_summary" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("total_value_cents"))
        .withColumn("avg_value",
          col("total_value_cents").cast("double") / 100.0 / col("n_events"))
    }),

    // S1/P2/P3/C8/C9 — scan + normalize: enum mapping, null-default,
    // string/int casts, regex extraction from the props payload.
    "q02_normalize" -> ((s, dir) => {
      t(s, dir, "events").select(
        col("event_id"),
        concat(lit("dev_"), col("user_id")).as("device_name"),
        Normalize.normalizeEnum(col("event_type"), stateMap, "unknown").as("state"),
        // regexp_extract yields '' on no match; cast('') → NULL.
        regexp_extract(col("props"), "[0-9]+", 0).cast("int").as("k_value"),
        coalesce(col("value"), lit(0.0)).as("value"))
    }),

    // C1/C2 — unit conversions with HALF_UP rounding parity.
    "q03_unit_conversions" -> ((s, dir) => {
      t(s, dir, "events").select(
        col("event_id"),
        Normalize.secToMin(col("value")).as("minutes"),
        Normalize.cm2ToM2(col("value")).as("area_m2"),
        (col("value") / 60).as("raw_minutes"))
    }),

    // F1/C5 — case-insensitive state-membership filter + count per key.
    "q04_state_filter" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("state",
          Normalize.normalizeEnum(col("event_type"), stateMap, "unknown"))
        .filter(Normalize.isCleaning(col("state")))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_active"))
    }),

    // F3 — completion-edge detection via lag window (batch twin of the
    // reference's keyed previous-state compare, pipeline.py:150-154).
    "q05_edge_detect" -> ((s, dir) => {
      Sessionize.edges(t(s, dir, "events"), "user_id", "ts", "event_id", "event_type")
        .filter(col("prev_event_type") === "click" && col("event_type") === "error")
        .select(col("user_id"), col("event_id"),
          col("prev_event_type").as("prev_type"), col("event_type").as("cur_type"))
    }),

    // T2 batch analog — gap-based sessionization + per-session stats.
    "q06_sessionize" -> ((s, dir) => {
      Sessionize.gapSessions(t(s, dir, "events"), "user_id", "ts", "event_id", 3600)
        .withColumn("ep", unix_timestamp(col("ts")))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ep")).as("start_s"),
          max(col("ep")).as("end_s"))
        .withColumn("duration_s", col("end_s") - col("start_s"))
    }),

    // F4/C6 — monotonic-counter delta with max(0, ·) clamp.
    "q07_delta_clamp" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("c", cents(col("value")))
        .withColumn("delta_cents",
          greatest(lit(0L), col("c") - coalesce(lag(col("c"), 1).over(w), col("c"))))
        .select(col("user_id"), col("event_id"), col("delta_cents"))
    }),

    // F5 — timestamp-watermark incremental filter.
    "q08_watermark_filter" -> ((s, dir) => {
      Incremental.afterWatermark(t(s, dir, "events"), "ts",
          to_timestamp(lit("2024-01-15 00:00:00")))
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    }),

    // L2/S6 — newest record per key (row_number window, rank 1).
    "q09_latest_per_key" -> ((s, dir) => {
      Incremental.newestPerKey(t(s, dir, "events"), "user_id", "ts", "event_id")
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
    }),

    // L1/L3 — global top-k with deterministic tie-break.
    "q10_topk_global" -> ((s, dir) => {
      t(s, dir, "events")
        .orderBy(col("value").desc, col("event_id"))
        .limit(100)
        .select(col("event_id"), col("value"))
    }),

    // J1/F4 — state-snapshot join (broadcast) + clamped new-work delta.
    "q11_state_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val cur = e.groupBy(col("user_id")).agg(count(lit(1)).as("cur_n"))
      val st = e.filter(col("ts") < to_timestamp(lit("2024-01-15 00:00:00")))
        .groupBy(col("user_id")).agg(count(lit(1)).as("last_count"))
      Incremental.stateDelta(cur, st, "user_id", "cur_n", "last_count")
        .select(col("user_id"), col("cur_n"), col("last_n"), col("new_n"))
    }),

    // A2 — lifetime totals per key (consistency check the reference lacks).
    "q12_lifetime_totals" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n"),
          sum(cents(col("value"))).as("total_cents"),
          max(cents(col("value"))).as("max_cents"))
    }),

    // Rollup — day→month→year subtotal hierarchy (README.md:254 idea).
    "q13_rollup" -> ((s, dir) => {
      t(s, dir, "events")
        .rollup(year(col("ts")).as("y"), month(col("ts")).as("m"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("total_cents"))
    }),

    // Cube — all grouping-set combinations over (type, month).
    "q32_cube" -> ((s, dir) => {
      t(s, dir, "events")
        .cube(col("event_type").as("etype"), month(col("ts")).as("m"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("total_cents"))
    }),

    // Frame-based window aggregate — per-user running total in event order.
    "q33_running_total" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("c", cents(col("value")))
        .select(col("user_id"), col("event_id"),
          sum(col("c")).over(w).as("running_cents"),
          avg(col("c")).over(w).as("running_avg"))
        .withColumn("running_avg", round(col("running_avg"), 4))
    }),

    // J2 — as-of join: latest 'error' at or before each 'purchase'.
    "q14_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
      val errors = e.filter(col("event_type") === "error")
      Incremental.asOfJoin(purchases, errors, "user_id", "ts", "event_id", "last_error_ts")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("last_error_ts")).as("last_error_s"))
    }),

    // Distinct-agg + exact interpolated percentiles per group.
    "q34_distinct_percentiles" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("c", cents(col("value")))
        .groupBy(col("event_type").as("etype"))
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          round(percentile(col("c"), lit(0.5)), 4).as("median_cents"),
          round(percentile(col("c"), lit(0.95)), 4).as("p95_cents"))
    }),

    // Left-semi / left-anti joins: purchasers with no RECENT error
    // (the anti side is time-bounded so the result discriminates).
    "q35_semi_anti" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val purchasers = e.filter(col("event_type") === "purchase")
        .select(col("user_id")).distinct()
      val erroring = e.filter(col("event_type") === "error"
          && col("ts") >= to_timestamp(lit("2024-01-28 00:00:00")))
        .select(col("user_id")).distinct()
      val users = e.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      users
        .join(purchasers, Seq("user_id"), "left_semi")
        .join(erroring, Seq("user_id"), "left_anti")
    }),

    // Multi-table equi-join with broadcast dims — revenue per region.
    "q15_region_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          count(lit(1)).as("n_lines"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_cents"))
    }),

    // TPC-H Q1-shaped pricing summary (flagship wide aggregate).
    "q16_pricing_summary" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= to_timestamp(lit("1997-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(cents(col("l_quantity"))).as("sum_qty_cents"),
          sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc_price_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax")))).as("sum_charge_cents"))
        .withColumn("avg_qty",
          col("sum_qty_cents").cast("double") / 100.0 / col("n"))
    }),

    // Exact dedup — canonical survivor (min id) per identical text.
    "q17_dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
    }),

    // MinHash LSH bands (K=16, r=4, 3-word shingles).
    "q18_minhash_bands" -> ((s, dir) => {
      Dedup.minhashBands(
        Dedup.minhashSignatures(t(s, dir, "documents"), "doc_id", "text", 16, 3),
        "doc_id", 16, 4)
    }),

    // Candidate near-dup pairs from the LSH bands.
    "q19_minhash_candidates" -> ((s, dir) => {
      Dedup.minhashCandidates(
        Dedup.minhashBands(
          Dedup.minhashSignatures(t(s, dir, "documents"), "doc_id", "text", 16, 3),
          "doc_id", 16, 4),
        "doc_id")
    }),

    // Full production near-dup pipeline: LSH candidates verified by
    // exact shingle-set Jaccard ≥ 0.6 — the end-to-end path a corpus
    // dedup job runs (bucketed candidates, never corpus×corpus).
    "q36_neardup_pipeline" -> ((s, dir) => {
      Dedup.minhashNearDups(t(s, dir, "documents"), "doc_id", "text")
        .withColumn("jaccard", round(col("jaccard"), 6))
    }),

    // Exact n-gram Jaccard over a bounded id range (brute-force oracle).
    "q20_jaccard_pairs" -> ((s, dir) => {
      Dedup.jaccardPairs(
        t(s, dir, "documents").filter(col("doc_id") < 300), "doc_id", "text", 3, 0.05)
    }),

    // 32-bit SimHash per document.
    "q21_simhash" -> ((s, dir) => {
      Dedup.simhash32(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Brute-force cosine top-k (exact-integer scoring).
    "q22_knn_bruteforce" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", 10)
    }),

    // SRP-LSH ANN (scale path; hash-checked via generated SQL mirror).
    "q23_knn_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 50),
        "vec_id", "embedding", 10, planes = 6, dim = 64)
    }),

    // Language-ID confusion counts (stopword-marker heuristic).
    "q24_lang_id" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("lang"), TextFunctions.langId(col("text")).as("pred_lang"))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
    }),

    // Quality signals per document.
    "q25_quality" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("q", TextFunctions.qualitySignals(col("text")))
        .select(col("doc_id"), col("q.n_chars").as("n_chars"),
          col("q.n_tokens").as("n_tokens"),
          col("q.mean_token_len").as("mean_token_len"),
          col("q.punct_ratio").as("punct_ratio"),
          col("q.stopword_ratio").as("stopword_ratio"))
    }),

    // Token statistics per source (whitespace + word-piece counts).
    "q26_token_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long")).as("n_tokens"),
          sum(TextFunctions.wordPieceCount(col("text")).cast("long")).as("n_pieces"))
    }),

    // Scalar string-function surface locked cross-engine.
    "q37_string_surface" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        upper(substring(col("text"), 1, 20)).as("head20"),
        length(col("text")).as("len"),
        instr(col("text"), "the").as("first_the"),
        regexp_replace(lower(col("text")), "[aeiou]", "").as("devoweled"),
        reverse(substring(col("text"), 1, 10)).as("rev10"),
        lpad(col("lang"), 5, "_").as("lang5"),
        concat_ws("|", col("lang"), col("source")).as("tag"))
    }),

    // Date/time-function surface: truncation, fields, arithmetic.
    "q38_date_surface" -> ((s, dir) => {
      t(s, dir, "events").select(
        col("event_id"),
        date_trunc("week", col("ts")).as("wk"),
        dayofweek(col("ts")).as("dow"),
        quarter(col("ts")).as("q"),
        hour(col("ts")).as("h"),
        last_day(col("ts")).as("eom"),
        date_add(to_date(col("ts")), 30).as("plus30"),
        unix_timestamp(col("ts")).as("epoch_s"))
    }),

    // Explode + frequency top-k — the canonical wordcount shape.
    "q39_wordcount" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50)
    }),

    // Order-invariant document fingerprint.
    "q27_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.sortedTokenFingerprint(col("text")).as("fp"))
    }),

    // T2 — the streaming sessionizer run in batch mode over
    // events-derived status samples: keyed state edge detection
    // (pipeline.py:132-163) through flatMapGroupsWithState.
    "q28_sessions_batch" -> ((s, dir) => {
      graft.streaming.Sessionizer.sessions(statusSamplesFromEvents(s, dir))(s)
        .select(col("deviceName").as("device"), col("timestamp").as("end_ts"),
          col("cleanTimeMin").as("clean_min"),
          col("batteryStart").as("battery_start"),
          col("batteryEnd").as("battery_end"))
    }),

    // IVF ANN (scale path #2; hash-checked via generated SQL mirror):
    // inverted-file index on 16 cells, probe the 4 nearest. NOTE: the
    // oracle selects centroids/queries by vec_id bounds, equivalent to
    // orderBy(id).limit(n) only while fixture ids are 0-based dense.
    "q31_knn_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
      val index = Similarity.ivfIndex(emb, "vec_id", "embedding",
        nCentroids = 16, centroids0 = Some(cents))
      Similarity.ivfTopK(index, cents, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 10, nProbe = 4)
    }),

    // Embedding-cosine near-dup: SRP-LSH buckets + in-bucket verify.
    "q30_embedding_neardup" -> ((s, dir) => {
      Dedup.embeddingNearDups(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.3, planes = 6, dim = 64)
    }),

    // Multimodal plumbing — binary content column through the batched
    // mapPartitions feature extractor (decode stage is the documented
    // deterministic stub; the Spark-side schema/batching is the test).
    "q29_media_features" -> ((s, dir) => {
      val media = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
      Multimodal.extractFeatures(media, "doc_id", "content", 4)
        .select(col("media_id"),
          element_at(col("features"), 1).as("f0"),
          element_at(col("features"), 4).as("f3"))
    }),

    // Pivot — event-type counts spread to columns per user (explicit
    // value list: deterministic schema, no extra distinct pass).
    "q40_pivot" -> ((s, dir) => {
      val types = Seq("click", "view", "purchase", "signup", "error")
      val p = t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      // Empty cells pivot to NULL; the conditional-aggregate twin
      // yields 0 — normalize to 0 (the analytics-friendly shape).
      types.foldLeft(p)((df, ty) =>
        df.withColumn(s"n_$ty", coalesce(col(ty), lit(0L))).drop(ty))
    }),

    // Set operations — INTERSECT / EXCEPT / UNION (distinct semantics).
    "q41_setops" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val purch = e.filter(col("event_type") === "purchase")
        .select(col("user_id")).distinct()
      val err = e.filter(col("event_type") === "error")
        .select(col("user_id")).distinct()
      purch.intersect(err).withColumn("tag", lit("both"))
        .unionByName(purch.except(err).withColumn("tag", lit("purchase_only")))
        .unionByName(err.except(purch).withColumn("tag", lit("error_only")))
        .unionByName(purch.union(err).distinct().withColumn("tag", lit("either")))
    }),

    // Cohort retention: users cohorted by first-activity day, activity
    // counted per (cohort, age-in-days) — the retention triangle.
    "q75_cohort_retention" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val w = Window.partitionBy(col("user_id"))
      e.withColumn("cohort", min(col("day")).over(w))
        .withColumn("age_days", datediff(col("day"), col("cohort")))
        .groupBy(col("cohort"), col("age_days"))
        .agg(countDistinct(col("user_id")).as("n_active"))
    }),

    // Funnel conversion: for each click, the user's FIRST purchase at
    // or after it (forward-min window over a conditional), converted =
    // within 1 h. One shuffle on the user key; no self-join.
    "q74_funnel" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("next_purchase_us",
          min(when(col("event_type") === "purchase", col("us"))).over(w))
        .filter(col("event_type") === "click")
        .withColumn("converted",
          col("next_purchase_us").isNotNull
            && col("next_purchase_us") - col("us") <= 3600000000L)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_clicks"),
          sum(when(col("converted"), 1L).otherwise(0L)).as("n_converted"))
    }),

    // Stratified corpus rebalancing: per-language deterministic
    // downsampling rates (hash-bucket membership, no RNG) — the
    // language-mix rebalance step of a training-data pipeline.
    "q72_stratified_sample" -> ((s, dir) => {
      val b = Sampling.hashBucket(col("doc_id"), 100)
      val rate = when(col("lang") === "en", 50)
        .when(col("lang") === "zh", 80)
        .otherwise(100)
      t(s, dir, "documents")
        .filter(b < rate)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"), min(col("doc_id")).as("min_id"))
    }),

    // Z-score standardization: per-group exact-integer moments joined
    // back to rows (broadcast — group stats are tiny), anomalies at
    // |z| > 2 censused. The join-stats-back pattern behind every
    // feature-normalization stage.
    "q73_zscore" -> ((s, dir) => {
      val e = t(s, dir, "events").withColumn("c", cents(col("value")))
      val stats = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sx"),
          sum(col("c") * col("c")).as("sxx"))
        .withColumn("mean_c", col("sx").cast("double") / col("n"))
        .withColumn("sd_c",
          sqrt((col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double") / col("n"))
            / (col("n") - 1)))
      e.join(broadcast(stats), Seq("event_type"))
        .withColumn("z", (col("c").cast("double") - col("mean_c")) / col("sd_c"))
        .groupBy(col("event_type").as("etype"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(abs(col("z")) > 2.0, 1L).otherwise(0L)).as("n_outliers"))
    }),

    // SCD2 versioned-dimension construction: each event opens a
    // validity interval closed by the key's next event (half-open
    // [from, to); open-ended current row flagged) — the
    // slowly-changing-dimension shape every warehouse build needs.
    "q71_scd2" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .select(col("user_id"), col("event_id"),
          col("us").as("valid_from_us"),
          lead(col("us"), 1).over(w).as("valid_to_us"))
        .withColumn("is_current", col("valid_to_us").isNull)
    }),

    // Prefix-filtered exact set-similarity join (PPJoin family):
    // EXACT recall at Jaccard >= 0.8, unlike the probabilistic LSH
    // variants — candidates via rare-first prefix equi-join. (0.8 is
    // the common near-dup dedup setting; lower thresholds widen the
    // prefix quadratically on this deliberately self-similar corpus.)
    "q70_prefix_filter_join" -> ((s, dir) => {
      Dedup.prefixJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
          shingleSize = 3, threshold = 0.8)
        .withColumn("jaccard", round(col("jaccard"), 6))
    }),

    // Numeric histogram: fixed-width value buckets per event type —
    // the distribution profile that sizes skew/salting decisions.
    "q68_histogram" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("bucket", floor(col("value") / 50).cast("long"))
        .groupBy(col("event_type").as("etype"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("value"))).as("bucket_cents"))
    }),

    // Arg-extremum aggregates: the priciest event per user via max_by
    // with a UNIQUE (cents, event_id) ordering key (bare max_by on a
    // non-unique key is tie-nondeterministic — the classic silent
    // flakiness in "latest row" aggregates).
    "q69_argmax" -> ((s, dir) => {
      t(s, dir, "events")
        // NULL values sort differently through Spark struct ordering
        // (nulls-first) vs the oracle's default NULLS LAST — exclude
        // them explicitly on BOTH sides.
        .filter(col("value").isNotNull)
        .withColumn("c", cents(col("value")))
        .groupBy(col("user_id"))
        .agg(
          max_by(col("event_id"), struct(col("c"), col("event_id")))
            .as("top_event_id"),
          max(col("c")).as("top_cents"),
          min_by(col("event_id"), struct(col("c"), col("event_id")))
            .as("bottom_event_id"))
    }),

    // Keyword extraction: top-3 terms per doc by an ALL-INTEGER tf-idf
    // proxy — weight = length(bin(N div df)) ≈ 1 + floor(log2(N/df)).
    // A float ln() idf is libm-rounding-dependent across engines; the
    // bit-length form is exact and order-preserving in the ranking.
    "q66_tfidf_rank" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      val tf = toks.groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val nDocs = t(s, dir, "documents")
        .agg(countDistinct(col("doc_id")).as("n_docs"))
      val scored = tf.join(dfreq, Seq("token"))
        .crossJoin(broadcast(nDocs))
        .withColumn("score", col("tf") * length(bin(expr("n_docs div df"))))
      // Top-3 via the bounded groupTopK aggregate (per-doc windows are
      // doc-length-bounded, but the aggregate form is strictly better:
      // k rows of state per doc instead of the doc's whole vocabulary).
      Ranking.groupTopK(scored, Seq("doc_id"),
          Seq((-col("score")).as("__neg"), col("token"),
            col("tf"), col("df"), col("score")), k = 3)
        .select(col("doc_id"), col("rank"), col("token"),
          col("tf"), col("df"), col("score"))
    }),

    // Quality filtering with REASON CODES — the production shape of a
    // corpus filter: each doc gets its first failing rule (or 'keep'),
    // and the gate checks the per-reason census.
    "q67_quality_filter" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("q", TextFunctions.qualitySignals(col("text")))
        .withColumn("reason",
          when(col("q.n_tokens") < 5, "too_short")
            .when(col("q.mean_token_len") > 12.0, "tokens_too_long")
            .when(col("q.punct_ratio") > 0.2, "too_much_punct")
            .when(col("q.stopword_ratio") < 0.01, "no_stopwords")
            .otherwise("keep"))
        .groupBy(col("lang"), col("reason"))
        .agg(count(lit(1)).as("n"))
    }),

    // Multi-match regex extraction: every "-ing" word per document,
    // exploded and frequency-ranked (regexp_extract_all + explode —
    // the multi-capture path q02's single-capture extract can't cover).
    "q65_regexp_all" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(lower(text), '[a-z]*ing', 0)"))
            .as("w"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n") >= 5)
    }),

    // Unpivot/melt — the inverse of q40: wide per-type count columns
    // back to (user, type, n) rows. unpivot(pivot(x)) == x minus the
    // zero cells, so the oracle is just the plain two-key aggregate.
    "q63_unpivot" -> ((s, dir) => {
      val wide = queries("q40_pivot")(s, dir)
      wide.unpivot(
          Array(col("user_id")),
          Array("n_click", "n_view", "n_purchase", "n_signup", "n_error")
            .map(col),
          "etype", "n")
        .withColumn("etype", expr("substring(etype, 3)"))
        .filter(col("n") > 0)
    }),

    // Bivariate exact-integer statistics: Pearson correlation between
    // spend and hour-of-day from six exact int64 sums, with the IEEE
    // op order mirrored in the oracle (built-in corr() is
    // summation-order-dependent; this is not).
    "q64_corr" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type").as("etype"),
          cents(col("value")).as("x"), hour(col("ts")).cast("long").as("y"))
        .groupBy(col("etype"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .withColumn("corr_xy",
          (col("n").cast("double") * col("sxy") - col("sx").cast("double") * col("sy"))
            / (sqrt(col("n").cast("double") * col("sxx") - col("sx").cast("double") * col("sx"))
              * sqrt(col("n").cast("double") * col("syy") - col("sy").cast("double") * col("sy"))))
    }),

    // HLL-shaped distinct sketch — mergeable two-level aggregation,
    // engine-portable md5 registers, bit-exact estimate (vs the
    // engine-private approx_count_distinct). exact_n alongside shows
    // the estimate lands within the ~1.04/√64 ≈ 13% design error.
    "q42_hll_distinct" -> ((s, dir) => {
      val src = t(s, dir, "events")
        .select(col("event_type").as("etype"), col("user_id"))
      Sketches.hllDistinct(src, col("user_id").cast("string"), Seq("etype"))
    }),

    // Binned interval join — purchases inside any [error, error+1h]
    // window of the same user: the band-join pattern (explode interval
    // into fixed-width bins, equi-join on bin) that replaces Spark's
    // BroadcastNestedLoopJoin fallback for range predicates.
    "q43_interval_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ep"))
      val windows = e.filter(col("event_type") === "error")
        .select(col("user_id"), unix_timestamp(col("ts")).as("lo"))
        .withColumn("hi", col("lo") + 3600)
      RangeJoin.pointInInterval(purchases, windows, "ep", "lo", "hi",
          binWidth = 3600, equiKeys = Seq("user_id"))
        .groupBy(col("event_id"), col("user_id"))
        .agg(count(lit(1)).as("n_windows"))
    }),

    // Statistical moments from exact integer sums: mean/variance/stddev
    // reproduced bit-exactly cross-engine by mirroring the IEEE op
    // order over exact (sum, sumsq) int64 accumulators. (At ≥ sf100
    // sumsq would need DECIMAL(38) — cents² ≈ 3e9 per row.)
    "q44_moments" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("c", cents(col("value")))
        .groupBy(col("event_type").as("etype"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("c")).as("sum_cents"),
          sum(col("c") * col("c")).as("sumsq_cents"),
          min(col("c")).as("min_cents"),
          max(col("c")).as("max_cents"))
        .withColumn("mean_cents",
          col("sum_cents").cast("double") / col("n"))
        // n=1 guard made explicit: Spark's non-ANSI /0 yields NULL while
        // DuckDB's IEEE ops yield Inf/NaN — both sides CASE to NULL.
        .withColumn("var_cents",
          when(col("n") > 1,
            (col("sumsq_cents").cast("double")
              - col("sum_cents").cast("double") * col("sum_cents").cast("double") / col("n"))
              / (col("n") - 1)))
        .withColumn("stddev_cents", sqrt(col("var_cents")))
    }),

    // Window-navigation surface: lead, first/last/nth over the full
    // frame, ntile, percent_rank, cume_dist — deterministic under the
    // total (ts, event_id) order.
    "q45_window_nav" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "events").select(
        col("user_id"), col("event_id"),
        lead(col("event_id"), 1).over(w).as("next_id"),
        first(col("event_id")).over(full).as("first_id"),
        last(col("event_id")).over(full).as("last_id"),
        nth_value(col("event_id"), 2).over(full).as("second_id"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
    }),

    // SimHash near-dup at Hamming ≤ 3 — byte-band LSH with exact
    // recall by pigeonhole, verified by bit_count(xor). Gate output is
    // the per-distance pair census (the raw pair set is ~11% of all
    // pairs on this templated corpus — the aggregate proves the same
    // computation without shipping megabytes through the compare).
    "q46_simhash_neardup" -> ((s, dir) => {
      Dedup.simhashNearDups(t(s, dir, "documents"), "doc_id", "text")
        .groupBy(col("hamming"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("a")).as("min_a"), max(col("b")).as("max_b"))
    }),

    // TF/DF components — the joinable core of tf-idf (the idf log is
    // deliberately left to the consumer: libm rounding is not
    // cross-engine-stable, integer tf/df are).
    "q47_tf_df" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      val tf = toks.groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      tf.join(dfreq, Seq("token"))
        .filter(col("tf") >= 4)
        .select(col("doc_id"), col("token"), col("tf"), col("df"))
    }),

    // Fixed-size chunk fingerprints over binary content — the
    // content-addressing / chunk-dedup primitive.
    "q48_media_chunks" -> ((s, dir) => {
      val media = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
      Multimodal.chunkFingerprints(media, "doc_id", "content", 16)
    }),

    // Tumbling event-time windows (the batch twin of the streaming
    // windowed aggregation): epoch-aligned 6 h buckets via window().
    "q49_tumbling_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "6 hours").as("w"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("value"))).as("total_cents"))
        .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
          col("n"), col("total_cents"))
    }),

    // Explicit GROUPING SETS with grouping indicators (rollup/cube's
    // general form; SQL-only surface in Spark's DataFrame API).
    "q50_grouping_sets" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type").as("etype"), month(col("ts")).as("m"),
          cents(col("value")).as("c"))
        .createOrReplaceTempView("gs_src")
      s.sql(
        """SELECT etype, m,
          |       CAST(grouping(etype) AS INT) AS g_etype,
          |       CAST(grouping(m) AS INT) AS g_m,
          |       count(*) AS n, sum(c) AS total_cents
          |FROM gs_src
          |GROUP BY GROUPING SETS ((etype), (m), ())""".stripMargin)
    }),

    // Native session windows (the built-in API twin of the lag-based
    // q06): NOTE the boundary differs — session_window closes at
    // ts + gap EXCLUSIVE (an event exactly `gap` later starts a new
    // session), while q06's lag formulation keeps it (> vs >=). The
    // oracle mirrors the session_window rule.
    "q61_session_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("session_cents"))
        .select(col("user_id"),
          unix_timestamp(col("w.start")).as("start_s"),
          unix_timestamp(col("w.end")).as("end_s"),
          col("n_events"), col("session_cents"))
    }),

    // Keyed upsert / MERGE: the fresh partial snapshot replaces rows
    // of the prior full snapshot per user; untouched users carry over.
    "q59_upsert" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val cut = to_timestamp(lit("2024-01-25 00:00:00"))
      val prior = e.filter(col("ts") < cut)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("cents"))
      val fresh = e.filter(col("ts") >= cut)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("cents"))
      Incremental.upsert(prior, fresh, Seq("user_id"))
    }),

    // Time-RANGE trailing window: per-user 7-day trailing spend, a
    // RANGE frame over epoch seconds (peers at equal ts aggregate
    // together, so the result is order-deterministic by construction).
    // Window = (now − 7 d, now]: 604799 preceding inclusive — the
    // day-aligned "N−1 days" idiom would only span 6 d on
    // second-resolution timestamps.
    "q60_trailing_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ep"))
        .rangeBetween(-(7L * 86400L - 1L), 0L)
      t(s, dir, "events")
        .withColumn("ep", unix_timestamp(col("ts")))
        .withColumn("c", cents(col("value")))
        .select(col("user_id"), col("event_id"), col("ep"),
          sum(col("c")).over(w).as("trail7_cents"),
          count(lit(1)).over(w).as("trail7_n"))
    }),

    // JSON scalar surface: path extraction, schema-based parsing, and
    // struct→JSON packing over the props payload.
    "q56_json_surface" -> ((s, dir) => {
      t(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_path"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k_schema"),
        to_json(struct(col("user_id").as("u"), col("event_type").as("t")))
          .as("packed"))
    }),

    // Time-series densification (gap fill): per-user calendar spine via
    // sequence+explode, left join daily counts, zero-fill — the
    // missing-period normalization every per-period metric needs.
    "q57_gapfill" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_day"))
      val cal = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      cal.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n_day"), lit(0L)).as("n_day"))
    }),

    // Fuzzy matching via edit distance, production shape: blocked
    // best-match linkage on a (lang, 4-char-prefix) compound block,
    // banded threshold Levenshtein, top-2 per left record through the
    // k-bounded aggregate. Prefix blocking keeps block sizes at
    // prefix-vocabulary scale (a length bucket degenerates here: every
    // head is the full 40 chars); its recall loss — a near-dup pair
    // that differs inside the first 4 chars — is the documented
    // blocked semantics, mirrored exactly by the oracle. The en
    // stratum keeps char-vs-byte Levenshtein semantics identical
    // across engines; the former doc_id < 150 brute-force bound is
    // retired — this runs over the whole corpus because candidates
    // come only from blocks.
    "q58_edit_distance" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .filter(col("lang") === "en")
        .select(col("doc_id"), col("lang"),
          substring(col("text"), 1, 40).as("head"))
        .withColumn("pfx", substring(col("head"), 1, 4))
      Linkage.bestMatches(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1),
        "doc_id", "doc_id", Seq("lang", "pfx"), "head", "head",
        maxDist = 20, k = 2)
    }),

    // Near-dup graph → connected components → dedup clusters: the
    // survivor-selection step of a production corpus dedup (min-label
    // propagation to fixpoint; survivor = component min id).
    "q54_dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.minhashNearDups(t(s, dir, "documents"), "doc_id", "text")
      Dedup.connectedComponents(pairs, "a", "b")
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_id"))
    }),

    // The one-call corpus dedup (LSH candidates → Jaccard verify → CC
    // clusters → keep min-id survivors), summarized per language.
    "q62_dedup_corpus" -> ((s, dir) => {
      Dedup.dedupCorpus(t(s, dir, "documents"), "doc_id", "text")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))
    }),

    // Deterministic hash-bucket train/val/test split — stable across
    // engines, retries, and reruns (no RNG), counted per language.
    "q55_split_counts" -> ((s, dir) => {
      Sampling.assignSplit(t(s, dir, "documents"), col("doc_id"), 80, 10)
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"))
    }),

    // One Lloyd refinement step over the IVF index — per-(cell, dim)
    // centroid means from narrow shuffle rows.
    "q53_ivf_lloyd" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfLloydStep(
        Similarity.ivfIndex(emb, "vec_id", "embedding", nCentroids = 16))
    }),

    // Hot-key-safe salted aggregation — two-stage (keys+salt partial,
    // then keys final) with a deterministic row-hash salt. The oracle
    // is the PLAIN single-stage aggregate: proves salting is purely a
    // physical rewrite (bit-identical results, since the partial sums
    // are exact integers).
    "q52_salted_agg" -> ((s, dir) => {
      Skew.saltedAggregate(
        t(s, dir, "events").withColumn("c", cents(col("value"))),
        keys = Seq("user_id"), salts = 16,
        partials = Seq("n_part" -> count(lit(1)), "sum_part" -> sum(col("c"))),
        finals = Seq(sum(col("n_part")).as("n"),
          sum(col("sum_part")).as("total_cents")))
    }),

    // Array-function surface over quantized embeddings: max/min/argmax,
    // L1 norm, reversed dot — exact integer element-wise ops.
    "q51_array_surface" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("vec_id"), VectorFunctions.quantize(col("embedding")).as("qv"))
        .select(
          col("vec_id"),
          size(col("qv")).as("dim"),
          array_max(col("qv")).as("qmax"),
          array_min(col("qv")).as("qmin"),
          array_position(col("qv"), array_max(col("qv"))).cast("int").as("argmax1"),
          aggregate(col("qv"), lit(0L), (acc, x) => acc + abs(x)).as("l1"),
          aggregate(zip_with(col("qv"), reverse(col("qv")), (a, b) => a * b),
            lit(0L), (acc, x) => acc + x).as("rev_dot"))
    }),

    // Token-budget sequence packing per source stratum (greedy
    // contiguous by start offset) — per-pack census. The prefix sum is
    // per-group, so no global single-partition window exists.
    "q76_sequence_pack" -> ((s, dir) => {
      Training.sequencePack(t(s, dir, "documents"),
          "doc_id", "text", "source", 2048)
        .groupBy(col("source"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("pack_tokens"))
    }),

    // Benchmark-contamination: 3-gram containment of each train doc
    // (doc_id % 20 != 0) against the eval slice (doc_id % 20 == 0).
    // Explode → distinct → shingle equi-join; never corpus×corpus.
    "q77_contamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Training.contamination(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", 3)
    }),

    // PII scrub: deterministic PII injected into every 7th doc, then
    // e-mail / phone / long-digit-run redaction (map-only, codegen'd
    // regexp_replace). Oracle mirrors injection + patterns exactly.
    "q78_pii_scrub" -> ((s, dir) => {
      val withPii = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or 555-123-4567 ref 1234567890")))
          .otherwise(col("text")).as("text"))
      Training.piiScrub(withPii, "doc_id", "text")
    }),

    // Deterministic training shards: md5(id) mod 32 (stable across
    // engines and cluster sizes), with per-shard doc/token census.
    "q79_shard_assign" -> ((s, dir) => {
      Training.shardAssign(t(s, dir, "documents"), "doc_id", 32)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long")).as("n_tokens"),
          min(col("doc_id")).as("min_id"))
    }),

    // Sentence-level exact dedup (the C4 boilerplate move): the corpus
    // has no punctuation, so both engines first assemble deterministic
    // 8-token "sentences"; the first global (doc,pos) occurrence of
    // each sentence survives, docs rebuild in original order, and
    // fully-duplicate docs vanish.
    "q80_sentence_dedup" -> ((s, dir) => {
      Dedup.sentenceDedup(sentencified(t(s, dir, "documents")), "doc_id", "text")
    }),

    // C4/Dolma-style quality rule filter: violated-rule list (fixed
    // emission order) + keep flag, map-only on qualitySignals.
    "q81_rule_filter" -> ((s, dir) => {
      Training.ruleFilter(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Quality-weighted deterministic resampling: token-rich docs keep
    // a 90% rate, the rest 25%; membership is a pure hash of the id,
    // so reruns keep byte-identical training sets.
    "q82_importance_resample" -> ((s, dir) => {
      val rated = t(s, dir, "documents").select(col("doc_id"),
        when(TextFunctions.tokenCount(col("text")) >= 40, lit(90))
          .otherwise(lit(25)).as("rate_percent"))
      Training.importanceResample(rated, "doc_id", col("rate_percent"))
    }),

    // Gopher-style repetition signals. Deterministic spam is injected
    // into every 9th doc (the clean corpus never trips the classic
    // thresholds); the gate checks the injected docs flag and the
    // clean ones don't.
    "q83_repetition" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 9 === 0,
          concat(col("text"), repeat(lit(" click here buy now"), 12)))
          .otherwise(col("text")).as("text"))
      Training.repetitionSignals(docs, "doc_id", "text")
    }),

    // Source-mixture rebalancing census: integer target weights from
    // the source id, 30k-token budget; per-source keep rate and what
    // actually survived the hash filter.
    "q84_mixture" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val weights = docs.select(col("source")).distinct()
        .withColumn("weight", expr("(CAST(substr(source, 4) AS INT) % 5) + 1"))
      Training.mixtureRebalance(docs, "doc_id", "text", "source",
          weights, budgetTokens = 30000L)
        .join(docs.select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
          Seq("doc_id"))
        .groupBy(col("source"), col("rate_percent"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("kept_tokens"))
    }),

    // Anti-clumping diversity cap: at most 40 vectors per IVF cell,
    // picked by stable content hash — bounded per-cluster contribution
    // to the training set.
    "q85_diversity_cap" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.diversityCap(
        Similarity.ivfIndex(emb, "vec_id", "embedding", 16), "vec_id", 40)
    }),

    // One-call decontamination: drop train docs (doc_id % 20 != 0)
    // whose 3-gram containment in the eval slice exceeds 0.5; short
    // docs and sub-threshold docs pass through.
    "q86_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Training.decontaminate(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0),
          "doc_id", "text", shingleSize = 3, maxContainment = 0.5)
        .select(col("doc_id"), col("source"), col("n_chars"))
    }),

    // Deterministic epoch shuffle: per-shard permutation from an
    // epoch-salted hash; epochs 1 and 2 give different orders, both
    // reproducible. Census pins every (shard, pos, doc) of epoch 2.
    "q87_epoch_shuffle" -> ((s, dir) => {
      Training.epochShuffle(t(s, dir, "documents"), "doc_id",
        nShards = 8, epoch = 2)
    }),

    // Unicode NFC canonicalization before hash-dedup: decomposed
    // accents injected into every 13th doc must compose (len shrinks,
    // digest matches DuckDB's nfc_normalize), everything else is
    // already NFC and passes through unchanged.
    "q88_nfc_normalize" -> ((s, dir) => {
      // The injected accents are DECOMPOSED (base char + combining
      // mark, bytes cc81/cc88) so NFC has real work to do.
      val injected = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 13 === 0,
          concat(col("text"), lit(" café naïve")))
          .otherwise(col("text")).as("text"))
      val nfc = functions.GraftExpressions.nfcNormalize(col("text"))
      injected.select(col("doc_id"),
        (nfc =!= col("text")).as("changed"),
        length(col("text")).as("len_raw"),
        length(nfc).as("len_nfc"),
        substring(md5(nfc), 1, 8).as("h8"))
    }),

    // ExactSubstr-lite: maximal ≥8-token spans repeated anywhere in
    // the corpus, per-doc duplicated-token mass. Exact-dup pairs light
    // up whole-doc spans; clean docs report zero.
    "q89_repeated_spans" -> ((s, dir) => {
      Dedup.repeatedSpans(t(s, dir, "documents"), "doc_id", "text", 8)
    }),

    // Collocation mining: frequent bigrams scored by the PMI ratio
    // c_xy*N/(c_x*c_y) in overflow-proof double math (each count cast
    // before the multiply) — log-free and bit-stable across engines.
    "q90_collocations" -> ((s, dir) => {
      Corpus.collocations(t(s, dir, "documents"), "text", minCount = 35L)
    }),

    // BPE tokenizer training, step 1: corpus-wide adjacent character
    // pair counts within tokens, top-20 by (count desc, pair asc) —
    // the total order makes the cut deterministic in both engines.
    "q91_bpe_pairs" -> ((s, dir) => {
      Corpus.bpePairCounts(t(s, dir, "documents"), "text", topK = 20)
    }),

    // Unigram-rarity quality signal: fraction of each doc's token
    // occurrences with corpus document-frequency < 4. Exact-integer
    // counts, one final IEEE divide.
    "q92_rare_tokens" -> ((s, dir) => {
      Corpus.rarityScores(t(s, dir, "documents"), "doc_id", "text",
        dfThreshold = 4L)
    }),

    // Corpus forensics: the cross-source duplication matrix — verified
    // near-dup pairs (LSH candidates, exact Jaccard >= 0.6) counted
    // per unordered source pair.
    "q93_source_overlap" -> ((s, dir) => {
      Dedup.sourceOverlap(t(s, dir, "documents"), "doc_id", "text", "source")
    }),

    // Incremental ingest dedup: every 5th doc plays the EXISTING
    // corpus, the rest arrive as the new batch — each new doc keeps
    // unless it verifies against the corpus or a smaller-id batch doc.
    "q94_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.dedupIncrement(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text")
    }),

    // URL canonicalization + dedup (the crawl pipeline's first pass).
    // URLs are synthesized deterministically: even ids carry the dirty
    // variant (upper-case host, default port, utm_ param, fragment,
    // trailing slash), odd ids the clean twin of the same page; ids
    // ≡ 9 (mod 10) are malformed and must canonicalize to NULL.
    "q95_url_dedup" -> ((s, dir) => {
      val g = expr("doc_id div 2").cast("string")
      val url = when(col("doc_id") % 10 === 9, lit("no-scheme.example/path"))
        .when(col("doc_id") % 2 === 0,
          concat(lit("HTTPS://WWW.Example.COM:443/docs/"), g,
            lit("/?utm_source=feed&ref=a&b=2#frag")))
        .otherwise(concat(lit("https://www.example.com/docs/"), g,
          lit("?b=2&ref=a")))
      Web.urlDedup(
        t(s, dir, "documents").select(col("doc_id"), url.as("url")),
        "doc_id", "url")
    }),

    // Context-window chunking: 16-token windows every 12 tokens, the
    // overlap (4 tokens) carrying cross-cut context. Map-only.
    "q96_chunk_overlap" -> ((s, dir) => {
      Training.chunkWithOverlap(t(s, dir, "documents"), "doc_id", "text",
        maxLen = 16, stride = 12)
    }),

    // DSIR importance weights: hashed-unigram log-likelihood ratio of
    // the src0 target distribution vs the whole corpus, integer
    // micro-nat quantization so doc scores are exact integer sums.
    "q97_dsir_weights" -> ((s, dir) => {
      Training.dsirWeights(t(s, dir, "documents"), "doc_id", "text",
        isTarget = col("source") === "src0", nBuckets = 256)
    }),

    // Content-defined chunking dedup signal: boundaries after tokens
    // with hash ≡ 0 (mod 8) — chunk cuts survive insertions, so
    // copied tails align across shifted documents.
    "q98_cdc_chunks" -> ((s, dir) => {
      Dedup.cdcChunks(t(s, dir, "documents"), "doc_id", "text",
        boundaryMod = 8)
    }),

    // Product-quantization ANN (Jégou et al. 2011): 64-dim vectors
    // compressed to 4 subspace codes against a 16-entry-per-subspace
    // codebook, searched by exact-integer asymmetric distance — the
    // memory-bound scale path where the scan never touches embeddings.
    "q99_pq_knn" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cb = Similarity.pqCodebook(emb, "vec_id", "embedding",
        m = 4, subDim = 16, nCodes = 16)
      val codes = Similarity.pqEncode(emb, "vec_id", "embedding", cb,
        m = 4, subDim = 16)
      Similarity.pqTopK(codes, cb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 10, m = 4, subDim = 16)
    }),

    // Vocabulary census per source (the Heaps'-law dashboard): token /
    // type / hapax counts, type-token ratio, hapax fraction — a
    // collapsing TTR is the corpus-level re-crawl smell.
    "q100_vocab_stats" -> ((s, dir) => {
      Corpus.vocabStats(t(s, dir, "documents"), "text", "source")
    }),

    // K-means cluster census over the 16-cell IVF index: member count
    // and exact-integer within-cluster sum of squares (the elbow-plot
    // inertia) via the n·Σx² − (Σx)² identity — no second data pass.
    "q101_kmeans_stats" -> ((s, dir) => {
      Similarity.kmeansStats(
        Similarity.ivfIndex(t(s, dir, "embeddings"), "vec_id", "embedding", 16))
    }),

    // SemDeDup: semantic near-duplicate pruning — within each of the
    // 16 IVF cells, drop vectors with a lower-id cell-mate at cosine
    // ≥ 0.35 (keeps the earliest representative per neighborhood).
    "q102_semdedup" -> ((s, dir) => {
      Similarity.semDedup(
        Similarity.ivfIndex(t(s, dir, "embeddings"), "vec_id", "embedding", 16),
        "vec_id", tau = 0.35)
    }),

    // Bigram-LM perplexity quality signal: add-one-smoothed bigram
    // model trained on the corpus itself; per-doc mean negative
    // log-probability in micro-nat-exact arithmetic.
    "q103_lm_perplexity" -> ((s, dir) => {
      Corpus.lmPerplexity(t(s, dir, "documents"), "doc_id", "text")
    }),

    // CCNet-style perplexity curriculum: per-source equal-frequency
    // NLL tertiles (head/middle/tail) via the scale-safe exact group
    // rank — no single-partition window.
    "q104_curriculum" -> ((s, dir) => {
      Training.perplexityCurriculum(t(s, dir, "documents"),
        "doc_id", "text", "source", nBuckets = 3)
    }),

    // Hard-negative mining: for 10 anchor vectors, top-8 neighbors in
    // the informative band 0.1 ≤ sim < 0.3 — above random, below the
    // near-dup zone that poisons contrastive labels.
    "q105_hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 8, lo = 0.1, hi = 0.3)
    }),

    // BM25 retrieval: every 100th doc's first 4 tokens play the query
    // set; top-10 docs per query by the micro-nat-exact score. The
    // top-k is Ranking.groupTopK — per-query candidate sets are
    // unbounded (a stopword-heavy query matches everything), so a
    // per-query row_number window would be a hot-partition risk; the
    // bounded aggregate never holds more than k rows per query.
    // Descending score = ascending −score (exact sign flip).
    "q106_bm25" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val qs = docs.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("qid"),
          array_join(slice(TextFunctions.tokens(col("text")), 1, 4), " ")
            .as("qtext"))
      val scored = Retrieval.bm25Scores(docs, "doc_id", "text", qs,
        "qid", "qtext")
      Ranking.groupTopK(scored, Seq("query_id"),
          Seq((-col("score")).as("__neg"), col("doc_id"),
            col("n_terms"), col("score")), k = 10)
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("n_terms"), col("score"))
    }),

    // Exact per-source quantiles of document length (tokens) by
    // distributed selection — no per-source sort on one task, no
    // sketch approximation.
    "q107_group_quantiles" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Ranking.groupQuantiles(
        docs.select(col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
          col("doc_id")),
        "source", "n_tokens", "doc_id", Seq(0.5, 0.9, 0.99))
    }),

    // Chunk→doc mean-pooling: runs of 10 consecutive vectors play a
    // document's chunks; exact-integer per-dimension means. Gated in
    // the long/narrow (parent, dim) form — fixed-width rows the oracle
    // can sort and hash (the array form crashed the r7 comparator) and
    // the honest shape at 100 TB: no per-group array reassembly.
    "q108_mean_pool" -> ((s, dir) => {
      Similarity.meanPoolLong(
        t(s, dir, "embeddings").withColumn("parent_id", expr("vec_id div 10")),
        "parent_id", "embedding")
    }),

    // Per-source Efraimidis–Spirakis weighted sample: 20 docs per
    // source, weight = token count — content-keyed, no RNG.
    "q109_weighted_sample" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Sampling.weightedSample(
        docs.select(col("source"), col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("w")),
        "source", "doc_id", "w", k = 20)
    }),

    // Per-source winsorized length: clip token counts into the exact
    // [p05, p95] band before any averaging — heavy-tail taming.
    "q113_winsorize" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Ranking.winsorize(
        docs.select(col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
          col("doc_id")),
        "source", "n_tokens", "doc_id", loQ = 0.05, hiQ = 0.95)
    }),

    // Robust per-source length standardization: exact median/MAD via
    // distributed selection; z in micro-exact units. Outlier docs
    // can't drag the baseline they're scored against.
    "q112_robust_z" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Ranking.robustZScores(
        docs.select(col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
          col("doc_id")),
        "source", "n_tokens", "doc_id")
    }),

    // Leave-one-out kNN label probe: majority vote over the exact
    // top-10 neighbors for 100 anchors, rolled into a confusion
    // matrix — the standard "are these embeddings any good" check.
    "q111_knn_confusion" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.knnClassify(emb, emb.filter(col("vec_id") < 100),
          "vec_id", "embedding", "label", k = 10)
        .join(emb.select(col("vec_id").as("query_id"), col("label")),
          Seq("query_id"))
        .groupBy(col("label"), col("pred_label"))
        .agg(count(lit(1)).as("n"))
    }),

    // Mergeable quantile sketch: per-source p50/p90/p99 of token
    // counts from the log-linear histogram state — the incrementally-
    // maintainable answer (Rollup.quantileSink keeps this state as a
    // streaming MV) to q107's exact-rank question; integer-only
    // buckets, bit-exact in both engines.
    "q114_quantile_sketch" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Sketches.lhQuantileEstimate(
        docs.select(col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
        col("n_tokens"), Seq("source"), Seq(0.5, 0.9, 0.99))
    }),

    // Count-min heavy-hitter probe: per-source frequency estimates for
    // the exact top-5 tokens per source, read from the mergeable CM
    // state (depth 4 × width 1024 counters per source — the streaming/
    // cross-day shape; estimates only ever over-count). The ranking
    // window runs over the vocabulary-sized exact counts, not
    // occurrences — bounded per source.
    "q115_cm_heavy_hitters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // ONE corpus explode: the exact (source, token) counts feed both
      // the ranking and the register build (weighted distinct keys ≡
      // per-occurrence counting); truncate so the two consumers don't
      // re-run the explode.
      val exact = Dedup.truncate(
        docs.select(col("source"),
            explode(TextFunctions.tokens(col("text"))).as("k"))
          .groupBy(col("source"), col("k"))
          .agg(count(lit(1)).as("c")))
      val state = Sketches.cmRegisters(exact, col("k"), Seq("source"),
        weight = col("c"))
      // Top-5 per source via the bounded aggregate (as q135): even a
      // vocabulary-sized partition needn't land on one window task.
      val keys = Ranking.groupTopK(
          exact.withColumn("negc", -col("c")),
          Seq("source"), Seq(col("negc"), col("k")), 5)
        .select(col("source"), col("k"))
      Sketches.cmEstimate(state, keys, "k", Seq("source"))
    }),

    // Bloom membership probe: every customer key tested against the
    // 128 KiB filter built from order keys — the broadcast pre-join
    // prune ("definitely no orders" customers never reach the real
    // join). Verdicts, including any false positives, are md5-
    // deterministic and bit-equal in DuckDB.
    "q116_bloom_membership" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val state = Sketches.bloomBits(orders,
        col("o_custkey").cast("string"), Nil)
      Sketches.bloomMightContain(state,
        cust.select(col("c_custkey").cast("string").as("k")), "k", Nil)
    }),

    // HLL set algebra: pairwise distinct-token overlap between sources
    // from per-source registers alone — union by register max-merge,
    // intersection by inclusion–exclusion. The raw corpus is read
    // once (to build registers); every pairwise estimate is register-
    // table arithmetic, unlike q93's exact matrix which re-shuffles
    // the corpus per run.
    "q117_hll_overlap" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val regs = Sketches.hllRegisters(
        docs.select(col("source"),
          explode(TextFunctions.tokens(col("text"))).as("tok")),
        col("tok"), Seq("source"))
      Sketches.hllOverlapEstimate(regs, "source")
    }),

    // End-to-end BPE: train 10 merges on the corpus (10 distributed
    // count rounds), then re-encode every doc at scan speed with the
    // native expression. The DuckDB oracle retrains the SAME 10 merges
    // with 10 unrolled SQL rounds (see bpeOracleSql) — training AND
    // encoding are both cross-engine verified; BpeSpec keeps the
    // unit-level greedy-apply cases.
    "q110_bpe_encode" -> ((s, dir) =>
      bpePieceCounts(t(s, dir, "documents"), Nil)),

    // The tagger-mix ensemble: rarity + repetition + LM perplexity,
    // each micro-quantized from its 6-dp value, one integer score.
    "q126_quality_ensemble" -> ((s, dir) => {
      Training.qualityEnsemble(t(s, dir, "documents"), "doc_id", "text",
        dfThreshold = 4L)
    }),

    // End-to-end percentile-gated filter: keep each source's best 80%
    // by ensemble score (low = clean) — the CCNet head/middle cut as
    // a batch keep-set. The bar is the type-1 ⌈0.8·n⌉-th score per
    // source, selected by Ranking.groupQuantiles — the scale-safe
    // exact-rank path (range repartition + offset census), never a
    // per-source window: a crawl source's corpus on one task is the
    // hot-partition failure mode the Ranking module exists to avoid.
    // The ⌈0.8·n⌉-th (score, doc_id)-ordered value IS the max score
    // among the first ⌈0.8·n⌉ rows, so the inclusive bar semantics
    // (everything at the bar passes together) are unchanged.
    "q127_percentile_filter" -> ((s, dir) => {
      // Pinned: the ensemble pipeline (rarity + repetition + LM) is
      // the expensive upstream and BOTH consumers below reference it
      // (the quantile bars and the final gate join) — without the
      // truncation it runs twice.
      val scored = Dedup.truncate(
        Training.qualityEnsemble(t(s, dir, "documents"),
          "doc_id", "text", dfThreshold = 4L)
          .join(t(s, dir, "documents").select(col("doc_id"), col("source")),
            Seq("doc_id")))
      val bars = Ranking.groupQuantiles(
          scored.select(col("source"), col("score_mu"), col("doc_id")),
          "source", "score_mu", "doc_id", Seq(0.8))
        .select(col("source"), col("score_mu").as("bar"))
      scored.join(broadcast(bars), Seq("source"))
        .filter(col("score_mu") <= col("bar"))
        .select(col("source"), col("doc_id"), col("score_mu"), col("bar"))
    }),

    // Tokenizer-aware packing: BPE-piece counts (the q110 encoder),
    // not whitespace tokens, size the packs — whitespace counts
    // mis-size the moment a real tokenizer is in play.
    "q125_bpe_pack" -> ((s, dir) => {
      val pieces = bpePieceCounts(t(s, dir, "documents"), Seq("source"))
        .select(col("source"), col("doc_id"), col("n_pieces"))
      Training.packByLength(pieces, "doc_id", "n_pieces", "source", 256)
        .groupBy(col("source"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_pieces")).as("pack_pieces"))
    }),

    // ANN quality evaluation: recall@10 of the IVF index against the
    // exact brute-force ground truth, per query — the metric that
    // keeps an approximate index honest (probe counts get tuned
    // against exactly this table).
    "q124_ann_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
      val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
      val index = Similarity.ivfIndex(emb, "vec_id", "embedding",
        nCentroids = 16, centroids0 = Some(cents))
      val ivf = Similarity.ivfTopK(index, cents, queries, "vec_id",
        "embedding", k = 10, nProbe = 4)
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", 10)
      Similarity.recallAtK(exact, ivf)
    }),

    // ANN recall for the SRP-LSH path: the q23 search (50 queries,
    // 6 planes) against the exact ground truth — the gate a user
    // tuning `planes` watches. Same composition as q124.
    "q130_lsh_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 50)
      val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
        k = 10, planes = 6, dim = 64)
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", 10)
      Similarity.recallAtK(exact, lsh)
    }),

    // ANN recall for the product-quantization path: the q99 search
    // (4×16 codebook, ADC) against the exact ground truth — the gate
    // that prices the 64× compression in recall. Same composition.
    "q131_pq_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      val cb = Similarity.pqCodebook(emb, "vec_id", "embedding",
        m = 4, subDim = 16, nCodes = 16)
      val codes = Similarity.pqEncode(emb, "vec_id", "embedding", cb,
        m = 4, subDim = 16)
      val pq = Similarity.pqTopK(codes, cb, queries, "vec_id",
        "embedding", k = 10, m = 4, subDim = 16)
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", 10)
      Similarity.recallAtK(exact, pq)
    }),

    // Community detection over the minhash candidate graph (the q128
    // edge set): 3 synchronous LPA rounds, min-label ties. Unlike the
    // q54 connected components (any path = one cluster), a thin
    // band-collision bridge between two dense near-dup families
    // cannot outvote either family — the census keeps them apart.
    "q132_label_propagation" -> ((s, dir) => {
      val cands = Dedup.minhashCandidates(
        Dedup.minhashBands(
          Dedup.minhashSignatures(t(s, dir, "documents"), "doc_id",
            "text", 16, 3),
          "doc_id", 16, 4),
        "doc_id")
      Graph.labelPropagation(cands, "a", "b", iters = 3)
        .select(col("node").as("doc_id"), col("label"))
    }),

    // Record linkage: every even-id doc fuzzy-matched against the
    // odd-id half, blocked on (lang, source) so candidates are
    // block-bounded, scored by exact Levenshtein over 40-char heads
    // (the DP is O(|a|·|b|) per pair — cap the prefix, not the
    // blocking), best match per left record via the bounded top-k
    // aggregate. The no-match census is the anti-join of this output.
    "q133_record_linkage" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          substring(col("text"), 1, 40).as("head"))
      Linkage.bestMatches(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "doc_id", Seq("lang", "source"), "head", "head",
        maxDist = 20, k = 1)
    }),

    // Event-rate anomaly detection: per-user daily event counts,
    // robust-z standardized within each user's own history (median/
    // MAD — a bursty outlier day cannot drag its own baseline), keep
    // |z| ≥ 3. The whole alert table is one aggregation + the
    // single-rank-pass robustZScores — no per-user window.
    "q134_rate_anomaly" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      Ranking.robustZScores(daily, "user_id", "n", "day")
        .filter(col("z").isNotNull && abs(col("z")) >= 3.0)
        .select(col("user_id"), col("day"), col("n"), col("med"),
          col("mad"), col("z"))
    }),

    // Hot-key join through the salt-replicate shape: the left side
    // salts, the small side replicates ×8, the join runs on
    // (key, salt) so one celebrity key spreads over 8 tasks — and the
    // result must be EXACTLY the plain join (the oracle), salting is
    // pure plan shape.
    "q141_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_quantity"))
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      Skew.saltedJoin(li, sup, "l_suppkey", salts = 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
    }),

    // Equal-frequency decile per doc within its source (integer-exact
    // cut: bucket = (rank−1)·10 div n) — the length-balanced
    // curriculum binning, ranks from the range-partitioned groupRank.
    "q142_group_buckets" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("source"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        col("doc_id"))
      Ranking.groupBuckets(docs, "source", Seq("n_tokens", "doc_id"), 10)
    }),

    // HTML main-content extraction: wrap each document in a
    // deterministic crawl-page shell (head with style+script, a nav
    // bar, the body paragraph, a link farm, a short footer), then
    // recover exactly the body through Web.extractText's closed-form
    // rule set. The oracle builds the identical page in SQL and
    // applies the identical rules — tag/script/comment stripping,
    // entity unescape, block segmentation, the link-density and
    // min-length bars are all under the cross-engine hash gate.
    "q143_html_extract" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><title>d</title><style>p{margin:0}</style>"),
        lit("<script>var a=\"<p>not content</p>\";</script></head><body>"),
        lit("<nav><a href=\"/\">Home</a> <a href=\"/s\">"), col("source"),
        lit("</a> <a href=\"/l\">"), col("lang"), lit("</a></nav>"),
        lit("<p>"), col("text"), lit("</p>"),
        lit("<div><a href=\"/c\">Contact</a> <a href=\"/p\">Privacy</a>"),
        lit(" <a href=\"/t\">Terms</a></div>"),
        lit("<footer>(c) 2026 Example Corp</footer></body></html>"))
      val blocks = Web.mainBlocks(html).as("blocks")
      t(s, dir, "documents")
        .select(col("doc_id"), blocks)
        .select(col("doc_id"),
          array_join(transform(col("blocks"), _.getField("txt")), "\n")
            .as("main_text"),
          size(col("blocks")).as("n_blocks"))
    }),

    // Crawl outlink extraction: each document wrapped in a page with
    // one link of every reference form (absolute, protocol-relative,
    // root-relative, relative, fragment-only), extracted with
    // Web.extractLinks, resolved against the page's base URL with
    // Web.resolveUrl, and tagged with the registrable domain — the
    // (page, outlink) edge table a crawl frontier and a link-graph
    // PageRank consume. The fragment-only link must vanish (empty
    // href → NULL), and the oracle replays extraction, all four
    // resolution rules, and the eTLD+1 heuristic in SQL.
    "q146_link_graph" -> ((s, dir) => {
      val idStr = col("doc_id").cast("string")
      val base = concat(lit("https://"), col("source"),
        lit(".example.com/docs/d"), idStr, lit(".html"))
      val html = concat(
        lit("<html><body><p>"), col("text"), lit("</p>"),
        lit("<a href=\"https://partner.example.org/ref?id="), idStr,
        lit("\">cite</a>"),
        lit("<a href=\"//mirror.example.net/m/"), col("source"),
        lit("\">mirror</a>"),
        lit("<a href=\"/about\">about</a>"),
        lit("<a href=\"d"), (col("doc_id") + 1).cast("string"),
        lit(".html\">next</a>"),
        lit("<a href=\"mailto:ops@example.com\">mail</a>"),
        lit("<a href=\"#top\">top</a></body></html>"))
      t(s, dir, "documents")
        .select(col("doc_id"), base.as("base"),
          Web.extractLinks(html).as("links"))
        .select(col("doc_id"), col("base"),
          posexplode(col("links")).as(Seq("link_idx", "href")))
        .select(col("doc_id"), col("link_idx").cast("int").as("link_idx"),
          Web.resolveUrl(col("base"), col("href")).as("url"))
        .filter(col("url").isNotNull)
        .withColumn("domain", Web.registrableDomain(col("url")))
    }),

    // Crawl-policy gate, robots.txt-lite: q121's URL construction
    // against a literal parsed-policy table; per URL, the verdict of
    // the longest matching path prefix, Allow winning exact ties
    // (RFC 9309), unmatched URLs allowed. The rules broadcast
    // (policy-sized); the winner is one map-side max_by over an
    // integer score — no window. The oracle replays prefix matching,
    // the 2·len+isAllow total order, and the default in SQL.
    "q150_robots_filter" -> ((s, dir) => {
      import s.implicits._
      val url = crawlUrl
      val rules = Seq(
        ("example.com", "disallow", "/p/"),
        ("example.com", "allow", "/p/1"),
        ("example.co.uk", "disallow", "/a/4"),
        ("site.org", "disallow", "/x/"),
        ("site.org", "allow", "/x/")
      ).toDF("domain", "directive", "prefix")
      Web.robotsVerdicts(
        t(s, dir, "documents").select(col("doc_id"), url.as("url")),
        "url", rules)
    }),

    // robots.txt raw→typed boundary: parse BODY TEXT (BOM, CRLF,
    // comments, case-tolerant fields, UA-run grouping, exact-beats-star
    // selection, empty/bare-token rule drop, */$ passthrough) into the
    // rules table q150/q152 consume. The oracle replays every parse
    // step in SQL over byte-identical bodies. Constant-sized output by
    // design — it's a parser gate; the corpus-scaling composition is
    // q152/q155.
    "q151_robots_parse" -> ((s, dir) =>
      Web.parseRobots(robotsBodies(s), "domain", "body", "graftbot")),

    // The parse COMPOSED with pattern-matching verdicts over the
    // corpus frontier: bodies → parseRobots → robotsVerdicts (with
    // RFC 9309 * wildcards and $ anchors compiled per rule, longest
    // raw pattern winning, allow on ties, default allow — including
    // site.org, whose robots has no group for us and therefore no
    // rules at all). The oracle replays parse + regex compile + match
    // + arg_max in SQL.
    "q152_robots_crawl" -> ((s, dir) => {
      val rules = Web.parseRobots(robotsBodies(s), "domain", "body",
        "graftbot")
      Web.robotsVerdicts(
        t(s, dir, "documents").select(col("doc_id"), crawlUrl.as("url")),
        "url", rules)
    }),

    // PSL-backed eTLD+1 vs the scan-speed heuristic, adjudicated on a
    // host mix the heuristic is KNOWN to mis-group (nested plain
    // suffixes like github.io, 4-level pvt.k12.ma.us, wildcard *.bd,
    // the !city.kawasaki.jp exception) plus agreeing cases — the
    // diverges column documents exactly where the approximation stops
    // being safe. The oracle replays the publicsuffix.org algorithm
    // (exception > most-labels > implicit *) in SQL.
    "q153_psl_domain" -> ((s, dir) => {
      import s.implicits._
      val psl = Seq("com", "io", "github.io", "uk", "co.uk", "us",
        "k12.ma.us", "pvt.k12.ma.us", "jp", "*.kawasaki.jp",
        "!city.kawasaki.jp", "*.bd", "br", "com.br")
        .map(Tuple1(_)).toDF("rule")
      val page = expr("doc_id div 7").cast("string")
      val url =
        when(col("doc_id") % 8 === 0,
            concat(lit("https://alpha.github.io/r/"), page))
          .when(col("doc_id") % 8 === 1,
            concat(lit("https://shop.com.br/p/"), page))
          .when(col("doc_id") % 8 === 2,
            concat(lit("https://news.example.co.uk/a/"), page))
          .when(col("doc_id") % 8 === 3,
            concat(lit("https://x.pvt.k12.ma.us/s/"), page))
          .when(col("doc_id") % 8 === 4,
            concat(lit("https://a.b.bd/z/"), page))
          .when(col("doc_id") % 8 === 5,
            concat(lit("https://w.city.kawasaki.jp/k/"), page))
          .when(col("doc_id") % 8 === 6,
            concat(lit("https://www.example.com/i/"), page))
          .otherwise(lit("not a url"))
      Web.registrableDomainPsl(
          t(s, dir, "documents").select(col("doc_id"), url.as("url")),
          "url", psl)
        .withColumn("domain_heur", Web.registrableDomain(col("url")))
        .withColumn("diverges",
          !(col("domain_heur") <=> col("domain_psl")))
    }),

    // Encoding repair + mojibake census: six residue-keyed corpus
    // strings — latin1-range double encoding, cp1252-range curly
    // quotes (including the undefined 0x9D byte a latin1-fallback
    // decoder leaves as a bare C1 control), CJK mojibake, clean
    // ASCII, and GENUINE UTF-8 that must never be "repaired". The
    // oracle pins the expected repair of each fixture (C1 controls
    // via chr()) — a golden-row gate over the general
    // translate→latin1-encode→UTF-8-reinterpret expression.
    "q154_fix_encoding" -> ((s, dir) => {
      val raw =
        when(col("doc_id") % 6 === 0, lit("cafÃ© au lait"))
          .when(col("doc_id") % 6 === 1, lit("naÃ¯ve rÃ©sumÃ©"))
          .when(col("doc_id") % 6 === 2,
            lit("itâ€™s â€œquotedâ€\u009D here"))
          .when(col("doc_id") % 6 === 3, lit("å¤§ä¸\u0080 text"))
          .when(col("doc_id") % 6 === 4, lit("plain ascii stays"))
          .otherwise(lit("déjà vu 中文"))
      t(s, dir, "documents").select(col("doc_id"), raw.as("raw"))
        .withColumn("fixed",
          graft.functions.TextFunctions.fixEncoding(col("raw")))
        .withColumn("is_moji",
          graft.functions.TextFunctions.isMojibake(col("raw")))
    }),

    // The crawl frontier composed end-to-end — the crawl twin of the
    // reference's composed smart_sync (pipeline.py:472-572): robots
    // bodies → parseRobots → robotsVerdicts gate the frontier, the
    // per-domain C4 cap bounds it (k-bounded aggregate, never a
    // window), and a domain PageRank over the residue-successor link
    // graph attaches crawl priority. Every stage is an operator other
    // gates already pin (q151/q152/q149/q147 shapes); this gate pins
    // their COMPOSITION. The domain graph derives map-only from the
    // same row (url at doc_id, url at doc_id+1) — no self-join.
    "q155_crawl_frontier" -> ((s, dir) => {
      val rules = Web.parseRobots(robotsBodies(s), "domain", "body",
        "graftbot")
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), crawlUrl.as("url"))
      val allowed = Web.robotsVerdicts(docs, "url", rules)
        .filter(col("allowed"))
      val capped = Ranking.groupTopK(allowed, Seq("domain"),
        Seq((-col("n_chars")).as("neg_chars"),
          col("doc_id").as("doc_id")), k = 25)
      val edges = t(s, dir, "documents")
        .select(Web.registrableDomain(crawlUrl).as("src"),
          Web.registrableDomain(crawlUrlAt(col("doc_id") + 1)).as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull &&
          col("src") =!= col("dst"))
        .distinct()
      val pr = Graph.pageRank(edges, "src", "dst", iters = 3)
        .select(col("node").as("domain"), col("rank").as("domain_rank"))
      capped
        .select(col("domain"), col("rank").as("pos"),
          (-col("neg_chars")).as("n_chars"), col("doc_id"))
        .join(broadcast(pr), Seq("domain"), "left")
    }),

    // Misra–Gries heavy hitters: the corpus token stream through the
    // k=64 mergeable MG aggregate (O(k) state map-side, on the wire,
    // and in the merge — one summary per partition crosses the
    // shuffle, never the token stream). MG weights are
    // order-dependent, so the gate pins the deterministic part of the
    // contract: every token with true count > n/(k+1) is GUARANTEED
    // in the sketch, so semi-joining the exact-heavy set against the
    // candidates must return it unchanged — with exact counts.
    "q156_mg_heavy_hitters" -> ((s, dir) => {
      val k = 64
      val toks = Dedup.truncate(t(s, dir, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("tok")))
      val cands = toks
        .agg(graft.functions.MisraGriesAggregate
          .misraGries(col("tok"), k).as("mg"))
        .select(explode(col("mg")).as("e"))
        .select(col("e.item").as("tok"))
      val totals = toks.agg(count(lit(1)).as("n"))
      toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(totals))
        .filter(col("cnt") * (k + 1) > col("n"))
        .join(cands, Seq("tok"), "left_semi")
        .select(col("tok"), col("cnt"))
    }),

    // Regular-grid resample of the purchase stream: 6-hour buckets
    // per user from first to last purchase, bucket averages on
    // observed cells, LOCF + linear interpolation on the gaps — the
    // cadence-normalization every poll-driven collector needs before
    // rates and deltas mean anything. Grid generated per key from its
    // own span (no driver calendar); fill windows are per-key bounded
    // groups (≤ span/step rows each).
    "q157_gap_fill" -> ((s, dir) => {
      TimeSeries.resampleGapFill(
        t(s, dir, "events").filter(col("event_type") === "purchase"),
        "user_id", "ts", "value", stepSeconds = 21600L)
    }),

    // k-anonymity generalization ladder over customer
    // quasi-identifiers (nation, segment, balance bin): per level, the
    // suppression cost of releasing the table k=5-anonymous. One scan,
    // one explode struct per (row, level), one hash-agg — the ladder
    // decision reads L census rows, never re-scans.
    "q158_k_anonymity" -> ((s, dir) => {
      val nat = col("c_nationkey")
      val seg = col("c_mktsegment")
      Privacy.generalizationLadder(t(s, dir, "customer"), Seq(
        0 -> Seq(nat.as("nat"), seg.as("seg"),
          floor(col("c_acctbal") / 100).as("bal")),
        1 -> Seq(nat.as("nat"), seg.as("seg"),
          floor(col("c_acctbal") / 1000).as("bal")),
        2 -> Seq(lit(null).cast("int").as("nat"), seg.as("seg"),
          floor(col("c_acctbal") / 1000).as("bal"))),
        k = 5)
    }),

    // ExactSubstr cleanup — the REWRITE q89/q120 only measure: every
    // ≥8-token span also present in a lower-doc_id document is
    // deleted (first corpus occurrence kept), survivors re-joined in
    // order, cleaned text pinned by md5 prefix. Gram ownership is one
    // hash-agg; coverage explodes matched grams only (×8 bounded).
    "q159_span_scrub" -> ((s, dir) => {
      Dedup.scrubCrossDocSpans(t(s, dir, "documents"),
        "doc_id", "text", spanTokens = 8)
    }),

    // Anchor-text profile per target host — what the rest of the web
    // calls each host: q146's synthesized page graph, now with
    // text-bearing anchors; (href, txt) extraction, RFC-3986-lite
    // resolution (mailto/fragment quarantine to NULL and drop), then
    // the top-5 anchor terms per host through the k-bounded
    // aggregate.
    "q160_anchor_text" -> ((s, dir) => {
      val idStr = col("doc_id").cast("string")
      val first2 = array_join(
        slice(TextFunctions.tokens(col("text")), 1, 2), " ")
      val base = concat(lit("https://"), col("source"),
        lit(".example.com/docs/d"), idStr, lit(".html"))
      val html = concat(
        lit("<html><body><p>"), col("text"), lit("</p>"),
        lit("<a href=\"https://partner.example.org/ref?id="), idStr,
        lit("\">"), first2, lit("</a>"),
        lit("<a href=\"//mirror.example.net/m/"), col("source"),
        lit("\">mirror "), col("source"), lit("</a>"),
        lit("<a href=\"/about\">about us</a>"),
        lit("<a href=\"d"), (col("doc_id") + 1).cast("string"),
        lit(".html\">read next</a>"),
        lit("<a href=\"mailto:ops@example.com\">mail ops</a>"),
        lit("<a href=\"#top\">top</a></body></html>"))
      Web.anchorTermProfile(
        t(s, dir, "documents").select(base.as("base"), html.as("html")),
        "base", "html", k = 5)
    }),

    // Positional phrase search: consecutive-token phrase occurrences
    // via the offset-vote trick (posting (t_j, pos) votes for start
    // pos−j; all m distinct offsets present = occurrence). Phrase 1
    // repeats a term (the distinct-j case), phrase 4 has zero corpus
    // hits and must vanish from the output.
    "q161_phrase_search" -> ((s, dir) => {
      import s.implicits._
      val phrases = Seq((1, "table table"), (2, "value table part"),
        (3, "agg join small"), (4, "the quick brown"))
        .toDF("phrase_id", "ptext")
      Retrieval.phraseSearch(t(s, dir, "documents"), "doc_id", "text",
        phrases, "phrase_id", "ptext")
    }),

    // Kneser–Ney-smoothed bigram perplexity (d=0.75, add-one'd
    // continuation): the KenLM-style corpus-filter score next to
    // q103's add-one baseline — same scale story (count hash-aggs,
    // model-keyed joins, 1-row totals broadcast, micro-nat integer
    // sums), different — and correct — smoothing.
    "q162_kn_perplexity" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.knScore(docs, Corpus.knModel(docs, "text"), "doc_id", "text")
    }),

    // Point-in-time enrichment — q71's SCD2 intervals composed with
    // the binned range join: each purchase picks up the signup-built
    // dimension version valid AT ITS TIME (valid_from ≤ ts < valid_to,
    // open current version capped at corpus max+1). (user_id, day-bin)
    // equi-join, never fact×dim; purchases before the user's first
    // version drop (inner PIT semantics).
    "q163_pit_enrich" -> ((s, dir) => {
      val e = t(s, dir, "events").withColumn("us", unix_micros(col("ts")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val mx = e.agg(max(col("us")).as("mu"))
      val dim = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("dim_event_id"),
          col("value").as("dim_value"), col("us").as("valid_from_us"),
          lead(col("us"), 1).over(w).as("valid_to_us"))
        .crossJoin(broadcast(mx))
        .select(col("user_id"), col("dim_event_id"), col("dim_value"),
          col("valid_from_us"),
          (coalesce(col("valid_to_us"), col("mu") + 1) - 1).as("hi_us"))
      val facts = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("us"),
          col("value").as("fact_value"))
      RangeJoin.pointInInterval(facts, dim, "us", "valid_from_us",
          "hi_us", binWidth = 86400000000L, equiKeys = Seq("user_id"))
        .select(col("user_id"), col("event_id"), col("dim_event_id"),
          round(col("fact_value"), 6).as("fact_value"),
          round(col("dim_value"), 6).as("dim_value"))
    }),

    // Scalar-quantization ANN (int8 per dimension, ADC cosine): the
    // compression family between SRP buckets and PQ codebooks —
    // corpus codes against per-dimension bounds, full-precision
    // queries, asymmetric scoring over decoded codes. Stats collapse
    // to one broadcast row; encode is map-only.
    "q164_sq_knn" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.sqTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 10)
    }),

    // Sitemap discovery census — the document robots.txt points a
    // crawler at: urlset entries + sitemapindex children from
    // sitemap XML bodies (entity-decoded locs, raw lastmod), plus
    // the global `Sitemap:` references from the robots fixtures —
    // completing RFC 9309 §2.3 discovery next to q151's group rules.
    "q165_sitemap_parse" -> ((s, dir) => {
      Web.parseSitemap(sitemapBodies(s), "domain", "body")
        .unionByName(
          Web.sitemapRefs(robotsBodies(s), "domain", "body")
            .select(col("domain"), lit("robots").as("kind"), col("loc"),
              lit(null).cast("string").as("lastmod")))
    }),

    // Politeness scheduling — the crawl-rate half of robots policy:
    // Crawl-delay parsed from body text with the same
    // exact-beats-star group selection as q151 (exact 5 s shadows the
    // star group's 1 s; an invalid 'fast' value is no directive; a
    // domain whose only group is another bot's falls to the default),
    // then each domain's frontier spaced delay_sec apart via the
    // range-partitioned rank — URL i fetches at (i−1)·delay ms. The
    // oracle replays parse, selection, validation, and the
    // row_number·delay schedule in SQL.
    "q166_politeness_schedule" -> ((s, dir) => {
      val delays = Web.parseCrawlDelays(delayBodies(s), "domain", "body",
        "graftbot")
      val frontier = t(s, dir, "documents")
        .select(col("doc_id"), crawlUrl.as("url"))
        .withColumn("domain", Web.registrableDomain(col("url")))
        .filter(col("domain").isNotNull)
        .select(col("domain"), col("doc_id"))
      Web.politenessSchedule(frontier, "domain", Seq("doc_id"), delays,
        defaultDelaySec = 1.0)
    }),

    // k-core peel (Seidman) over a chain+hub graph: every doc links
    // its successor (a crawl-tail chain) and its residue hub — chain
    // interiors sit exactly at degree 3, so the k=3 peel cascades one
    // node per round from each chain end while the hub-braced core
    // survives. 5 synchronous rounds, bit-deterministic; the oracle
    // unrolls the same rounds (degree census → keep ≥ k → edge
    // filter) and takes the same closing census.
    "q167_kcore" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val edges = docs.select(col("doc_id").as("src"),
          (col("doc_id") + 1).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          (lit(1000000000000L) + col("doc_id") % 97).as("dst")))
      Graph.kCore(edges, "src", "dst", k = 3, iters = 5)
    }),

    // Unicode-script census — the non-Latin language-ID backstop
    // (q24's stopword markers are blind outside Latin text):
    // residue-keyed script suffixes (Cyrillic, CJK+digits, Arabic,
    // Greek, none) appended to each doc, per-class char counts via
    // codegen'd regexp_count, dominant = leftmost max in the fixed
    // priority order. BMP-only ranges so UTF-16 counting (Spark) and
    // codepoint counting (DuckDB RE2 \x{…} classes) agree exactly.
    "q168_script_census" -> ((s, dir) => {
      val suffix =
        when(col("doc_id") % 5 === 0, lit(" привет мир"))
          .when(col("doc_id") % 5 === 1, lit(" 你好世界 2024"))
          .when(col("doc_id") % 5 === 2, lit(" مرحبا بالعالم"))
          .when(col("doc_id") % 5 === 3, lit(" γειά σου κόσμε"))
          .otherwise(lit(""))
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.scriptProfile(concat(col("text"), suffix)).as("p"))
        .select(col("doc_id"), col("p.*"))
    }),

    // Magic-byte content sniffing — the trust-nothing multimodal
    // ingest boundary (Content-Type headers lie; the prefix doesn't):
    // residue-keyed signatures (PNG, JPEG, GIF, PDF, RIFF/WAVE, ZIP,
    // gzip, none) prepended to each doc's bytes, sniffed back from
    // the binary column alone. The oracle rebuilds the same blobs
    // (unhex ∥ encode) and replays the hex-prefix match.
    "q169_content_sniff" -> ((s, dir) => {
      val magic =
        when(col("doc_id") % 8 === 0, unhex(lit("89504E470D0A1A0A")))
          .when(col("doc_id") % 8 === 1, unhex(lit("FFD8FFE000104A46")))
          .when(col("doc_id") % 8 === 2, unhex(lit("474946383961")))
          .when(col("doc_id") % 8 === 3, unhex(lit("255044462D312E37")))
          .when(col("doc_id") % 8 === 4,
            unhex(lit("524946462400000057415645")))
          .when(col("doc_id") % 8 === 5, unhex(lit("504B030414000000")))
          .when(col("doc_id") % 8 === 6, unhex(lit("1F8B080000000000")))
          .otherwise(lit(Array.empty[Byte]))
      t(s, dir, "documents")
        .select(col("doc_id"),
          concat(magic, col("text").cast("binary")).as("content"))
        .select(col("doc_id"),
          Multimodal.sniffType(col("content")).as("kind"),
          length(col("content")).cast("long").as("n_bytes"))
    }),

    // Matryoshka-style dimension-truncation recall: the exact 64-dim
    // brute-force top-10 vs the same search over the FIRST 16 dims
    // only — pricing a 4× embedding-storage cut in recall, the same
    // adjudication q124/q130/q131 give the IVF/LSH/PQ families.
    // Truncate-then-quantize ≡ quantize-then-slice, so the oracle
    // slices the shared quantized vectors.
    "q170_matryoshka_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val exact = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
      val trunc = emb.select(col("vec_id"),
        slice(col("embedding"), 1, 16).as("embedding"))
      val approx = Similarity.bruteForceTopK(trunc,
        trunc.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
      Similarity.recallAtK(exact, approx)
    }),

    // Deterministic per-key exemplar sample — the reproducible twin
    // of per-key reservoir sampling: 10 docs per source in
    // content-stable md5 order through the k-bounded aggregate (agg
    // state = k structs per key; a 10M-doc source never concentrates).
    // The oracle replays md5 ranking as a window.
    "q171_per_key_sample" -> ((s, dir) => {
      Sampling.uniformPerKey(
        t(s, dir, "documents").select(col("source"), col("doc_id")),
        "source", "doc_id", k = 10)
    }),

    // Luhn-gated payment-card census — the high-precision PII
    // detector a regex-only scrub lacks: residue-keyed payloads (a
    // valid Visa test PAN, a checksum-failing look-alike, a valid PAN
    // next to a 20-digit over-long run, no digits) appended to each
    // doc; maximal 13–19 digit runs extracted and checksummed. The
    // oracle replays run extraction AND the mod-10 arithmetic over
    // reversed digit lists.
    "q172_pan_census" -> ((s, dir) => {
      Privacy.panCandidates(
        t(s, dir, "documents")
          .select(col("doc_id"), concat(col("text"), panPayload).as("raw")),
        "doc_id", "raw")
    }),

    // The scrub composed on the same fixture: Luhn-VALID runs become
    // [PAN], the checksum-failing look-alike and the over-long
    // tracking number survive verbatim — golden-row oracle (the
    // payload is residue-keyed, so the expected scrub is literal).
    "q173_pan_scrub" -> ((s, dir) => {
      Privacy.scrubPans(
        t(s, dir, "documents")
          .select(col("doc_id"), concat(col("text"), panPayload).as("raw")),
        "doc_id", "raw")
        .select(col("doc_id"), col("scrubbed"))
    }),

    // Grid-bucketed spatial proximity join — the geo twin of the
    // LSH/band pattern: residue-derived integer micro-degree points,
    // cell = radius-sized grid square, candidates from the 3×3
    // neighborhood equi-join, exact Long squared-distance verify —
    // never point×point, no trig (libm sin/cos would leak last-ulp
    // engine differences). Each pair lands exactly once (a < b, one
    // home-cell hit).
    // (Coordinates are md5-derived, not a linear-congruential map —
    // id·p mod m puts every point on one lattice line whose minimum
    // inter-point gap exceeds any useful radius: zero pairs.)
    "q174_proximity_join" -> ((s, dir) => {
      def coord(axis: String) = hashMod(axis, col("event_id"), 1000000L)
      val pts = t(s, dir, "events").select(col("event_id").as("id"),
        coord("x").as("x"), coord("y").as("y"))
      // maxPerCell engaged so the benched plan is the 100 TB-shaped
      // one: the unguarded gate was the one superlinear ScaleBench
      // verdict (exp16 1.63, output-bound — pair count grows with
      // density²). 8 lowest-id points per cell bounds candidates at
      // 9·64/cell while leaving the sf0.01 oracle output unchanged
      // (mean density there is ~0.25 points/cell).
      Spatial.proximityJoin(pts, "id", "x", "y", radius = 5000,
        maxPerCell = 8)
    }),

    // Largest-remainder (Hare) budget apportionment — crawl fetch
    // slots ∝ per-user event mass, Σ alloc = budget EXACTLY (floor +
    // the R largest remainders get +1; plain rounding can't promise
    // the total). All-integer: base/remainder via Long div/mod, no
    // floats; the remainder rank runs through the range-partitioned
    // groupRank. The oracle replays quota, remainders, and the
    // tie-broken top-R window.
    "q175_budget_apportion" -> ((s, dir) => {
      val wts = t(s, dir, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).cast("long").as("n_events"))
      Ranking.apportionLargestRemainder(wts, "user_id", "n_events",
        budget = 1000000L)
    }),

    // Per-domain document cap (the C4 practice: no domain may
    // dominate the corpus): q121's URL construction, registrable
    // domains, then keep the top-25 docs per domain by
    // (n_chars DESC, doc_id) through the k-bounded aggregate — a
    // mega-domain costs k structs of agg state, never a window
    // partition. Junk URLs (NULL domain) drop.
    "q149_domain_cap" -> ((s, dir) => {
      val url = crawlUrl
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), url.as("url"))
        .withColumn("domain", Web.registrableDomain(col("url")))
        .filter(col("domain").isNotNull)
      Ranking.groupTopK(d, Seq("domain"),
          Seq((-col("n_chars")).as("neg_chars"),
            col("doc_id").as("doc_id")), k = 25)
        .select(col("domain"), col("rank"),
          (-col("neg_chars")).as("n_chars"), col("doc_id"))
    }),

    // Audio near-dup by envelope fingerprint — q144's shape one
    // modality over: the 33-window loudness envelope (md5 stub path,
    // SQL-mirrorable; the real WAV path is spec-proven gain-invariant)
    // quantizes to a 32-bit adjacent-comparison fingerprint, 4 byte
    // bands generate candidates, Hamming ≤ 3 verifies. The cloned
    // corpus guarantees positives; grid → fingerprint → bands →
    // verify all recompute in the oracle.
    "q148_audio_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val content = col("text").cast("binary").as("content")
      val media = docs.select(col("doc_id").as("media_id"), content)
        .unionByName(docs.select(
          (col("doc_id") + 1000000L).as("media_id"), content))
      Multimodal.audioNearDups(media, "media_id", "content", maxHamming = 3)
    }),

    // The crawl pipeline composed end-to-end: pages on a 7-site web
    // linking to rotating partner/CDN registrables and the next site,
    // links extracted (Web.extractLinks), resolved (resolveUrl),
    // collapsed to registrable-domain edges (self-loops dropped,
    // distinct), then ranked with the drift-free integer PageRank —
    // the frontier-prioritization table a crawler reads. The edge set
    // is residue-determined, so the graph is identical at every scale
    // factor; the oracle replays extraction, resolution, the eTLD+1
    // collapse AND five unrolled integer PR rounds in SQL.
    "q147_domain_pagerank" -> ((s, dir) => {
      val idStr = col("doc_id").cast("string")
      val base = concat(lit("https://www.site"),
        (col("doc_id") % 7).cast("string"), lit(".com/docs/d"), idStr,
        lit(".html"))
      val html = concat(
        lit("<html><body><p>"), col("text"), lit("</p>"),
        lit("<a href=\"https://partner"), (col("doc_id") % 5).cast("string"),
        lit("-press.org/ref?id="), idStr, lit("\">cite</a>"),
        lit("<a href=\"//cdn"), (col("doc_id") % 3).cast("string"),
        lit("media.net/lib\">cdn</a>"),
        lit("<a href=\"https://www.site"),
        ((col("doc_id") + 1) % 7).cast("string"), lit(".com/docs/d"),
        (col("doc_id") + 1).cast("string"), lit(".html\">next</a>"),
        lit("<a href=\"/about\">about</a>"),
        lit("<a href=\"#top\">top</a></body></html>"))
      val links = t(s, dir, "documents")
        .select(col("doc_id"), base.as("base"),
          explode(Web.extractLinks(html)).as("href"))
        .select(Web.registrableDomain(col("base")).as("src"),
          Web.registrableDomain(
            Web.resolveUrl(col("base"), col("href"))).as("dst"))
      val edges = links
        .filter(col("src").isNotNull && col("dst").isNotNull &&
          col("src") =!= col("dst"))
        .distinct()
      Graph.pageRank(edges, "src", "dst", iters = 5)
        .select(col("node").as("domain"), col("rank"))
    }),

    // Window ≡ Ranking parity: the same running sum computed through
    // the native per-user window AND through the range-partitioned
    // groupRunningSum, and the same per-user top-3 through a window
    // row_number AND through the k-bounded groupTopK — full-outer
    // joined so a membership difference surfaces as a NULL, with the
    // oracle computing each metric once and aliasing it twice. This
    // locks the scale-safe twins to the native window semantics: any
    // divergence (offset census, NULL ordering, tie order) breaks the
    // hash gate, which is what licenses using the twins wherever a
    // hot key would swamp a window partition.
    "q145_window_parity" -> ((s, dir) => {
      val e = t(s, dir, "events").withColumn("c", cents(col("value")))
        .select(col("user_id"), col("event_id"), col("ts"), col("c"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val runWin = e.select(col("user_id"), col("event_id"),
        sum(col("c")).over(w).as("metric_win"))
      val runScale = Ranking
        .groupRunningSum(e, "user_id", Seq("ts", "event_id"), "c")
        .select(col("user_id"), col("event_id"),
          col("running").as("metric_scale"))
      val running = runWin
        .join(runScale, Seq("user_id", "event_id"), "full_outer")
        .select(lit("running").as("part"), col("user_id"), col("event_id"),
          col("metric_win"), col("metric_scale"))
      val rw = Window.partitionBy(col("user_id"))
        .orderBy(col("c").desc, col("event_id"))
      val kWin = e.withColumn("rk", row_number().over(rw))
        .filter(col("rk") <= 3)
        .select(col("user_id"), col("event_id"),
          col("rk").cast("long").as("metric_win"))
      val kScale = Ranking.groupTopK(e, Seq("user_id"),
          Seq((-col("c")).as("neg_c"), col("event_id").as("event_id")), k = 3)
        .select(col("user_id"), col("event_id"),
          col("rank").cast("long").as("metric_scale"))
      val topk = kWin.join(kScale, Seq("user_id", "event_id"), "full_outer")
        .select(lit("topk").as("part"), col("user_id"), col("event_id"),
          col("metric_win"), col("metric_scale"))
      running.unionByName(topk)
    }),

    // Perceptual image near-dup: dHash each "image" (documents' bytes
    // through the codec boundary — non-PNG content takes the
    // deterministic md5 stub grid, the path a SQL oracle can mirror),
    // byte-band the 64-bit hash, candidates from the (band, byte)
    // equi-join, verify Hamming ≤ 6. A shifted copy of the corpus
    // guarantees real positives (every doc pairs with its clone at
    // Hamming 0), and the oracle recomputes grid → hash → bands →
    // verify from scratch in SQL — the full pipeline is under the
    // cross-engine hash gate.
    "q144_image_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val content = col("text").cast("binary").as("content")
      val media = docs.select(col("doc_id").as("media_id"), content)
        .unionByName(docs.select(
          (col("doc_id") + 1000000L).as("media_id"), content))
      Multimodal.imageNearDups(media, "media_id", "content", maxHamming = 6)
    }),

    // RESTORE round-trip through the ACID layer, end to end: commit a
    // correct per-priority order census, clobber it with a bad
    // snapshot, roll back with the zero-copy restore, read back. The
    // DuckDB oracle computes the v1 census directly from the raw
    // table — so commit, snapshot-replace, restore, manifest read,
    // stats carry-forward AND the aggregation itself are all under
    // the cross-engine hash gate, not just a spec.
    "q139_restore_roundtrip" -> ((s, dir) => {
      import graft.sources.ManifestTable
      val base = scratchDir("graft-q139")
      val v1 = t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
      ManifestTable.commit(v1, base, "census", "good")          // v1
      ManifestTable.commitMulti(s, base, "clobber",             // v2
        snapshots = Map("census" -> v1.limit(1)))
      ManifestTable.restore(s, base, "census", 1L, "rollback")  // v3
      ManifestTable.read(s, base, "census")
    }),

    // Change-data-feed round-trip: commit a keyed snapshot, MERGE a
    // delta that modifies the [5,10) overlap and inserts [10,15),
    // then read the NET insert/delete feed between the two versions
    // from the manifest log alone. The oracle recomputes both states
    // set-theoretically (EXCEPT ALL both ways) — so upsertKeyed's
    // file rewrites, the log reconstruction, AND the net-diff
    // algebra all sit under the cross-engine hash gate.
    "q140_change_feed" -> ((s, dir) => {
      import graft.sources.ManifestTable
      val base = scratchDir("graft-q140")
      val cust = t(s, dir, "customer").select(col("c_custkey"),
        col("c_nationkey"), cents(col("c_acctbal")).as("bal_cents"))
      ManifestTable.commit(cust.filter(col("c_nationkey") < 10),
        base, "c", "v1")
      val delta = cust
        .filter(col("c_nationkey") >= 5 && col("c_nationkey") < 15)
        .withColumn("bal_cents", col("bal_cents") + 1)
      ManifestTable.upsertKeyed(s, base, "c", delta, "c_custkey", "v2")
      ManifestTable.tableChanges(s, base, "c", 1L, 2L, netOnly = true)
    }),

    // Cross-source score calibration: every doc's quality-ensemble
    // score mapped to its percentile WITHIN its source (rank/n, the
    // CDF transform) — "top 10% of its own source" means the same
    // thing in a clean source and a noisy one, which is what a
    // cross-source mixing policy actually wants to threshold on.
    "q138_score_calibration" -> ((s, dir) => {
      val scored = Training.qualityEnsemble(t(s, dir, "documents"),
          "doc_id", "text", dfThreshold = 4L)
        .join(t(s, dir, "documents").select(col("doc_id"), col("source")),
          Seq("doc_id"))
        .select(col("source"), col("score_mu"), col("doc_id"))
      Ranking.percentileRanks(scored, "source", "score_mu", "doc_id")
    }),

    // Leakage-safe train/val/test split: the hash split keyed by the
    // near-dup COMPONENT, not the doc — a near-duplicate pair can
    // never straddle train/test (the contamination q76 hunts for
    // after the fact, prevented by construction). Same 80/10/10
    // buckets as q55's doc-keyed split.
    "q137_leakage_safe_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val comp = Dedup.connectedComponents(
          Dedup.minhashNearDups(docs, "doc_id", "text"), "a", "b")
        .withColumnRenamed("id", "doc_id")
      val keyed = docs.select(col("doc_id"))
        .join(comp, Seq("doc_id"), "left")
        .withColumn("component", coalesce(col("component"), col("doc_id")))
      Sampling.assignSplit(keyed, col("component"), 80, 10)
        .select(col("doc_id"), col("component"), col("split"))
    }),

    // Cluster survivorship: near-dup components with a QUALITY-chosen
    // canonical (longest doc wins, min-id ties) — the merge step of
    // record linkage, where q62's min-id survivor is arbitrary by
    // design. One row per cluster, singletons included.
    "q136_canonical_docs" -> ((s, dir) => {
      Dedup.canonicalSurvivors(t(s, dir, "documents"), "doc_id", "text",
        "n_chars")
    }),

    // Exact top-5 tokens per source through the BOUNDED top-k
    // aggregate — where q115 reads the same ranking back from
    // count-min estimates, this is the exact answer, and neither the
    // count nor the pick ever concentrates a source's vocabulary on
    // one task (map-side partials keep ≤ k rows per group).
    "q135_top_tokens" -> ((s, dir) => {
      val counts = t(s, dir, "documents")
        .select(col("source"),
          explode(TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("n"))
        .withColumn("neg_n", -col("n"))
      Ranking.groupTopK(counts, Seq("source"),
          Seq(col("neg_n"), col("tok")), 5)
        .select(col("source"), col("rank"), col("tok"),
          (-col("neg_n")).as("n"))
    }),

    // Feature-hashed TF-IDF doc vectors: signed hashing trick over
    // 64 dims, exact-integer bit-length idf — the model-free
    // text→vector bridge, emitted long-form (the distributed layout).
    "q123_hashed_vectors" -> ((s, dir) => {
      Training.hashedTfidfVectors(t(s, dir, "documents"), "doc_id",
        "text", dims = 64)
    }),

    // GloVe-shape skip-gram co-occurrence: unordered token pairs
    // within ±3 positions, raw + harmonic distance-weighted counts in
    // integer micro-units (1e6 div offset) — bit-equal in DuckDB.
    "q122_skipgram_counts" -> ((s, dir) => {
      Corpus.skipgramCounts(t(s, dir, "documents"), "text",
        window = 3, minCount = 30L)
    }),

    // Per-domain crawl census over synthesized URLs spanning plain,
    // two-level-suffix (co.uk), default-port, and unparseable hosts —
    // the registrable-domain heuristic plus a distinct-page count.
    "q121_domain_stats" -> ((s, dir) => {
      val url = crawlUrl
      Web.domainStats(
        t(s, dir, "documents").select(col("doc_id"), url.as("url")),
        "doc_id", "url")
    }),

    // Cross-document duplicated spans: ≥8-token spans appearing in ≥2
    // DISTINCT docs (boilerplate/mirror mass; within-doc repetition
    // scores zero — q89 measures the any-repeat axis).
    "q120_crossdoc_spans" -> ((s, dir) => {
      Dedup.crossDocSpans(t(s, dir, "documents"), "doc_id", "text", 8)
    }),

    // Triangle census of the minhash-candidate graph: per-node
    // triangle counts via the node-ordered wedge join — high local
    // density marks genuine duplicate clusters vs hash-noise edges.
    "q128_triangles" -> ((s, dir) => {
      val cands = Dedup.minhashCandidates(
        Dedup.minhashBands(
          Dedup.minhashSignatures(t(s, dir, "documents"), "doc_id",
            "text", 16, 3),
          "doc_id", 16, 4),
        "doc_id")
      Graph.triangleCounts(cands, "a", "b")
        .select(col("node").as("doc_id"), col("n_triangles"))
    }),

    // Integer-arithmetic PageRank over the minhash-candidate
    // similarity graph (crawl-prioritization / canonical-survivor
    // centrality): 5 Pregel-shaped rounds, all Long arithmetic, so
    // ranks are bit-equal in DuckDB with no IEEE summation drift.
    "q119_pagerank" -> ((s, dir) => {
      val cands = Dedup.minhashCandidates(
        Dedup.minhashBands(
          Dedup.minhashSignatures(t(s, dir, "documents"), "doc_id",
            "text", 16, 3),
          "doc_id", 16, 4),
        "doc_id")
      val edges = cands.select(col("a").as("src"), col("b").as("dst"))
        .union(cands.select(col("b").as("src"), col("a").as("dst")))
      Graph.pageRank(edges, "src", "dst", iters = 5)
        .select(col("node").as("doc_id"), col("rank"))
    }),

    // Similarity-weighted PageRank over the VERIFIED near-dup graph:
    // rank mass flows proportionally to milli-Jaccard edge weights
    // (exact floor(r·w/W) split — no overflow, no IEEE drift), so
    // centrality tracks how similar a doc's neighbors are, not how
    // many candidate edges survived banding.
    "q129_weighted_pagerank" -> ((s, dir) => {
      // Pinned: both union directions read it — the verify pipeline
      // (the most expensive upstream in the suite) must run once.
      val nd = Dedup.truncate(
        Dedup.minhashNearDups(t(s, dir, "documents"), "doc_id", "text"))
      val w = round(col("jaccard") * 1000).cast("long")
      val edges = nd
        .select(col("a").as("src"), col("b").as("dst"), w.as("w"))
        .union(nd.select(col("b").as("src"), col("a").as("dst"), w.as("w")))
      Graph.pageRankWeighted(edges, "src", "dst", "w", iters = 5)
        .select(col("node").as("doc_id"), col("rank"))
    }),

    // Frozen NB classifier (the fasttext-shape quality/domain filter):
    // train source-prediction on the even-id half of the corpus in one
    // pass, score the held-out odd half at scan speed. Integer
    // micro-nat weights make train AND score bit-equal in DuckDB.
    "q118_nb_classify" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = Corpus.nbModel(
        docs.filter(col("doc_id") % 2 === 0), "text", "source")
      Corpus.nbClassify(
        docs.filter(col("doc_id") % 2 === 1), model, "doc_id", "text")
    }),

    // Per-source boilerplate strip (the CCNet/RefinedWeb move, and
    // q80's corpus-level complement): a per-source cookie-notice
    // sentence is injected into ~4/7 of each source's docs (≥ minDocs
    // = 5, so it strips everywhere), while a cross-source "limited
    // offer" line lands in ~16 docs GLOBALLY but ≤ 2 per source — a
    // global census would strip it, the per-source census must keep
    // it. That asymmetry is what the gate checks.
    "q176_boilerplate_strip" -> ((s, dir) => {
      val fix = sentencified(t(s, dir, "documents"), "source")
        .withColumn("text", concat(col("text"),
          when(col("doc_id") % 7 < 4,
            concat(lit(". cookie notice for "), col("source")))
            .otherwise(lit("")),
          when(col("doc_id") % 31 === 1, lit(". limited offer today"))
            .otherwise(lit(""))))
      Dedup.boilerplateStrip(fix, "doc_id", "source", "text", minDocs = 5)
    }),

    // Crawl depth: BFS min-hop distance from a 50-node seed set over
    // a sparse md5-derived 20k-node link graph, 6-hop horizon — the
    // frontier-priority signal (seed-near pages first). The oracle
    // replays the level-synchronous expansion as a depth-bounded
    // recursive CTE + min.
    "q177_hop_distance" -> ((s, dir) => {
      def node(tag: String) = hashMod(tag, col("event_id"), 20000L)
      val e = t(s, dir, "events")
        .select(node("hs").as("src"), node("hd").as("dst"))
      val seeds = e.select(col("src").as("node"))
        .filter(col("node") < 50).distinct()
      Graph.hopDistance(e, "src", "dst", seeds, "node", maxHops = 6)
    }),

    // Crawler-trap mining: three URL families per residue — /item/{id}
    // (distinct content per URL: legit), /cal/{id} and /list?sid={id}
    // (unbounded URLs over ONE landing page: traps). Template
    // collapse (digits→{n}, query stripped) + per-template distinct-
    // digest census flags exactly the two trap templates.
    "q178_url_templates" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val url = concat(lit("https://shop.example.com/"),
        when(col("doc_id") % 3 === 0,
            concat(lit("item/"), col("doc_id").cast("string")))
          .when(col("doc_id") % 3 === 1,
            concat(lit("cal/"), col("doc_id").cast("string")))
          .otherwise(concat(lit("list?sid="), col("doc_id").cast("string"))))
      val pages = d.select(url.as("url"),
        md5(when(col("doc_id") % 3 === 0, col("text"))
          .otherwise(lit("landing page"))).as("digest"))
      Web.templateCensus(pages, "url", "digest", minUrls = 20, trapRatio = 4)
    }),

    // IP→network enrichment by longest-prefix match: md5-derived
    // 32-bit addresses route into a nation-derived CIDR table mixing
    // /4, /8 and /12 blocks — an address inside both a /4 and a /12
    // must take the /12. Pure equi-joins (one masked candidate per
    // distinct prefix length), broadcast route table, k-bounded
    // max_by winner; the oracle replays the same masks and picks the
    // winner with a window.
    "q179_ip_route" -> ((s, dir) => {
      val ips = t(s, dir, "events").select(col("event_id"),
        hashMod("ip", col("event_id"), 4294967296L).as("addr"))
      val rawNet = hashMod("net", col("n_nationkey"), 4294967296L)
      val routes = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"),
          ((col("n_nationkey") % 3) * 4 + 4).cast("int").as("prefix_len"),
          rawNet.as("__raw"))
        .withColumn("network",
          when(col("prefix_len") === 4, Net.maskToPrefix(col("__raw"), 4))
            .when(col("prefix_len") === 8, Net.maskToPrefix(col("__raw"), 8))
            .otherwise(Net.maskToPrefix(col("__raw"), 12)))
        // Masked nets can collide (16 possible /4 blocks, ~8 nations
        // drawing them) — collapse to one deterministic payload so the
        // LPM winner is unique.
        .groupBy(col("prefix_len"), col("network"))
        .agg(min(col("n_name")).as("net_name"))
      Net.lpmJoin(ips, "event_id", "addr", routes, Seq("net_name"))
    }),

    // Incremental-recrawl diff: two digest snapshots of the corpus
    // (docs 1,2 mod 3 = old crawl; 0,2 mod 3 = new crawl; the 2-mod-5
    // residue re-renders its content) full-outer-join on URL into
    // added/removed/changed/unchanged — the revisit-scheduling input.
    "q180_snapshot_diff" -> ((s, dir) => {
      val (oldSnap, newSnap) = snapshotFixture(t(s, dir, "documents"))
      Web.snapshotDiff(oldSnap, newSnap, "url", "digest")
    }),

    // Revisit scheduling composed end-to-end on q180's diff: per-
    // domain change activity (changed + added URLs) apportions a
    // 10,000-fetch recrawl budget by largest remainder (q175's
    // operator) — hot domains earn proportionally more slots, totals
    // sum to the budget EXACTLY, dead domains (no activity) get none.
    "q181_recrawl_priority" -> ((s, dir) => {
      val (oldSnap, newSnap) = snapshotFixture(t(s, dir, "documents"))
      val act = Web.snapshotDiff(oldSnap, newSnap, "url", "digest")
        .withColumn("domain", Web.registrableDomain(col("url")))
        .groupBy(col("domain"))
        .agg(sum(when(col("status").isin("changed", "added"), 1L)
          .otherwise(0L)).as("activity"))
      Ranking.apportionLargestRemainder(act, "domain", "activity",
        budget = 10000L)
    }),

    // HITS hubs/authorities over an md5-derived 2k-node directed
    // graph, 3 unnormalized integer rounds — link-list pages score as
    // hubs, cited pages as authorities, bit-identically in both
    // engines (no L2 norm, no floats). The oracle unrolls the three
    // auth/hub rounds as materialized CTEs.
    "q182_hits" -> ((s, dir) => {
      def node(tag: String) = hashMod(tag, col("event_id"), 2000L)
      val e = t(s, dir, "events")
        .select(node("hs").as("src"), node("hd").as("dst"))
      Graph.hits(e, "src", "dst", iters = 3)
    }),

    // Per-user activity trend: exact integer OLS slope of an md5-
    // derived metric over epoch-day x — rising/falling as the sign of
    // the EXACT rational (num, den), no IEEE division anywhere. One
    // five-sum aggregation pass, all map-side combinable.
    "q183_trend_slope" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"),
        datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).as("x"),
        hashMod("y", col("event_id"), 1000L).as("y"))
      TimeSeries.groupTrend(ev, "user_id", "x", "y")
    }),

    // Seed-personalized PageRank (the TrustRank shape): restart mass
    // only on the 20-node trusted seed set, 4 integer rounds over
    // q182's 2k-node graph — nodes a seed path never reaches score
    // EXACTLY 0 (the spam-demotion property vanilla PageRank lacks).
    // The oracle unrolls the seeded rounds with the same CASE base.
    "q184_trustrank" -> ((s, dir) => {
      def node(tag: String) = hashMod(tag, col("event_id"), 2000L)
      val e = t(s, dir, "events")
        .select(node("hs").as("src"), node("hd").as("dst"))
      val seeds = e.select(col("src").as("node"))
        .filter(col("node") < 20).distinct()
      Graph.pageRankSeeded(e, "src", "dst", seeds, "node", iters = 4)
    }),

    // Single-scan column profile (the deequ/GE pre-training drop
    // check): completeness, exact cardinality, typed min/max — over
    // an int64, an int32, a null-injected string, and a date column.
    // One wide aggregate pivoted AFTER aggregation: 4 columns or 400,
    // still one job.
    "q185_column_profile" -> ((s, dir) => {
      val b = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_returnflag") === "N", lit(null).cast("string"))
          .otherwise(col("l_returnflag")).as("rf_null"),
        to_date(col("l_shipdate")).as("l_shipday"))
      Profile.columnProfile(b,
        Seq("l_orderkey", "l_linenumber", "rf_null", "l_shipday"))
    }),

    // Constraint census + FK integrity in two scans: three row rules
    // (NULL verdicts count as violations) and a left-anti FK check
    // against orders with a residue-keyed corruption (every 97th
    // order key re-pointed at a nonexistent negative key).
    "q186_constraints" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val rowRules = Profile.checkConstraints(li, Seq(
        "quantity_le_30" -> (col("l_quantity") <= 30),
        "returnflag_domain" -> col("l_returnflag").isin("A", "N", "R"),
        "positive_price" -> (col("l_extendedprice") > 0)))
      val facts = li.select(
        when(col("l_orderkey") % 97 === 0,
          -col("l_orderkey") - 1000000000L)
          .otherwise(col("l_orderkey")).as("fk"))
      val fkRow = Profile
        .fkViolations(facts, "fk", t(s, dir, "orders"), "o_orderkey")
        .agg(count(lit(1)).as("n_violations"))
        .crossJoin(broadcast(li.agg(count(lit(1)).as("n_rows"))))
        .select(lit("fk_orderkey").as("rule"), col("n_rows"),
          col("n_violations"))
      rowRules.unionByName(fkRow)
    }),

    // The NATIVE as-of join (plans/AsOfJoinPlan: custom LogicalPlan +
    // Strategy + SparkPlan, one forward merge per co-partition, O(1)
    // state) attributing each purchase to the user's latest click at
    // or before it — adjudicated against DuckDB's own ASOF LEFT JOIN,
    // engine-native on both sides. Right (user, time) pairs dedupe to
    // max event_id first (the determinism contract); both inputs
    // share the events lineage, so the gate also exercises the
    // self-lineage re-rooting path.
    "q187_asof_native" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val l = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
      val r = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("click_us"),
          col("event_id"))
        .groupBy(col("user_id"), col("click_us"))
        .agg(max(col("event_id")).as("click_id"))
        .withColumn("click_at", col("click_us"))
      graft.plans.AsOfJoinPlan.join(l, r, Seq("user_id"), "us", "click_us")
    }),

    // First-order Markov transition census over each user's event
    // stream — funnel drop-off / UI-loop fingerprint: (from → to)
    // counts plus how many distinct users exhibit each transition.
    "q188_transitions" -> ((s, dir) => {
      Sessionize.transitionCounts(t(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type")
    }),

    // Wide per-user activity profile through the REAL pivot API
    // (explicit value list, so no distinct-scan job) — the reporting
    // shape; absent combinations land 0, not NULL.
    "q189_event_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .count()
        .select(col("user_id") +:
          types.map(tp => coalesce(col(tp), lit(0L)).as(s"n_$tp")): _*)
    }),

    // Metronome (bot-cadence) census: every 10th user's clock is
    // rewritten to a perfect 60 s cadence (per-user ordinal × 60 s —
    // a fixture window, bounded per user); exact integer gap variance
    // flags EXACTLY those users, and the humans' var_num stays an
    // exact Long the oracle replays.
    "q190_bot_regularity" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val us2 = when(col("user_id") % 10 === 0,
        lit(1700000000000000L) +
          row_number().over(w).cast("long") * 60000000L)
        .otherwise(unix_micros(col("ts")))
      val fix = t(s, dir, "events")
        .withColumn("ts2", timestamp_micros(us2))
      Sessionize.gapRegularity(fix, "user_id", "ts2", "event_id",
        minEvents = 3)
    }),

    // Cluster labeling (c-TF-IDF, log-free): IVF cells over the
    // embeddings × the aligned documents' token census — top-5
    // distinctive terms per cell by tf_cell · (16 − cell-df), an
    // EXACT integer c-TF-IDF surrogate (a term in every cell scores
    // 0; a cell-exclusive term scores 15·tf — same ranking intent as
    // Grootendorst's log form without libm crossing the engine
    // boundary). Top-k via the k-bounded aggregate, tie → term ASC.
    "q191_cluster_labels" -> ((s, dir) => {
      val cells = Similarity
        .ivfIndex(t(s, dir, "embeddings"), "vec_id", "embedding", 16)
        .select(col("vec_id").as("doc_id"), col("cell"))
      val toks = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
      val tf = toks.join(cells, Seq("doc_id"))
        .groupBy(col("cell"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val cdf = tf.groupBy(col("term"))
        .agg(countDistinct(col("cell")).as("cdf"))
      val scored = tf.join(cdf, Seq("term"))
        .withColumn("score", col("tf") * (lit(16L) - col("cdf")))
      Ranking.groupTopK(scored, Seq("cell"),
          Seq((-col("score")).as("neg_score"), col("term").as("term"),
            col("tf").as("tf"), col("cdf").as("cdf")), k = 5)
        .select(col("cell"), col("rank"), (-col("neg_score")).as("score"),
          col("term"), col("tf"), col("cdf"))
    }),

    // Winnowing (MOSS) near-dups: 4-token grams, 5-gram windows,
    // min-hash-per-window fingerprints — any shared verbatim run of
    // ≥ 8 tokens between two docs GUARANTEES a shared fingerprint
    // (deterministic local-copy detection, vs minhash's probabilistic
    // set similarity). Pairs share ≥ 2 rare (df ≤ 10) fingerprints.
    "q192_winnow_near_dups" -> ((s, dir) => {
      Dedup.winnowNearDups(t(s, dir, "documents"), "doc_id", "text",
        k = 4, w = 5, minShared = 2, maxDf = 10)
    }),

    // Concurrent-session detection: per-user hash-derived activity
    // intervals (60 s – 1 h), all overlapping pairs ONCE each via the
    // binned interval×interval join (first-overlapping-bin trick — no
    // distinct pass, no nested loop). The oracle replays the overlap
    // predicate directly at its scale.
    "q193_interval_overlap" -> ((s, dir) => {
      val iv = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("s0"))
        .withColumn("e0", col("s0") +
          hashMod("d", col("event_id"), 3600L) + 60L)
      RangeJoin.intervalOverlapJoin(iv, "event_id", "s0", "e0",
        binWidth = 3600L, keyCols = Seq("user_id"))
    }),

    // Hybrid retrieval: q106's BM25 top-10 and dense brute-force
    // cosine top-10 (doc/vec ids aligned, queries = the %100 residue)
    // fused by Reciprocal Rank Fusion in exact integer micro-units —
    // ranks fuse, scores never compare across systems. n_lists = 2
    // marks docs both retrievers agree on.
    "q194_rrf_fusion" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val qs = docs.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("qid"),
          array_join(slice(TextFunctions.tokens(col("text")), 1, 4), " ")
            .as("qtext"))
      val bm = Ranking.groupTopK(
          Retrieval.bm25Scores(docs, "doc_id", "text", qs, "qid", "qtext"),
          Seq("query_id"),
          Seq((-col("score")).as("__neg"), col("doc_id")), k = 10)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val emb = t(s, dir, "embeddings")
      val ann = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank"))
      Retrieval.rrfFuse(Seq(bm, ann), "query_id", "doc_id", "rank",
        kConst = 60, topK = 10)
    }),

    // Label-error detection (confident-learning-lite): every vector
    // classified by majority vote of its 10 nearest IVF-cell-mates;
    // rows whose own label loses the vote surface as mislabel
    // candidates — the training-data QA pass before a classifier
    // ever trains. Cell-bounded Σ|cell|² work, never corpus².
    "q195_knn_mislabels" -> ((s, dir) => {
      Similarity.knnMislabels(t(s, dir, "embeddings"), "vec_id",
        "embedding", "label", nCells = 16, k = 10)
    }),

    // Asymmetric shingle containment over the LSH candidates — the
    // quote/subset signal resemblance Jaccard misses: |A∩B|/|A| and
    // /|B| in exact integer micro-units, kept when either direction
    // ≥ 50%. Same candidate machinery as q18/q19, exact verify.
    "q196_containment" -> ((s, dir) => {
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        minContainMicro = 500000L)
    }),

    // Data-drift census between the two crawl snapshots (q180's
    // residue split): doc-length histogram (50-char buckets) on each
    // side, micro-proportions and their |delta| — the integer-exact
    // core of a PSI drift alert, no libm across the engine boundary.
    "q197_drift_census" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("bucket", expr("n_chars div 50L"))
      Profile.histogramDrift(
        d.filter(col("doc_id") % 3 =!= 0),
        d.filter(col("doc_id") % 3 =!= 1), "bucket")
    }),

    // Semi-supervised label spreading: 30 clamped seed nodes (label =
    // node mod 3) push topic labels over the 2k-node hash graph for 4
    // synchronous rounds — majority-of-labeled-neighbors, ties to the
    // smaller label, unreached nodes stay NULL. The transductive
    // classifier next to q132's unsupervised LPA.
    "q198_label_spread" -> ((s, dir) => {
      def node(tag: String) = hashMod(tag, col("event_id"), 2000L)
      val e = t(s, dir, "events")
        .select(node("hs").as("src"), node("hd").as("dst"))
      val seeds = e.select(col("src").as("node"))
        .filter(col("node") < 30).distinct()
        .withColumn("lbl", (col("node") % 3).cast("int"))
      Graph.labelSpread(e, "src", "dst", seeds, "node", "lbl", iters = 4)
    }),

    // Tokenizer fertility per language — the vocab-fairness audit run
    // before a tokenizer ships: BPE pieces per whitespace token and
    // per character, exact integer micro-ratios over the q110 encoder
    // (a language with high fertility pays more sequence length for
    // the same text).
    "q199_bpe_fertility" -> ((s, dir) => {
      bpePieceCounts(t(s, dir, "documents"), Seq("lang"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("n_pieces")).as("n_pieces"),
          sum(col("n_chars")).as("n_chars"))
        .withColumn("fertility_micro",
          expr("(1000000L * n_pieces) div n_tokens"))
        .withColumn("compression_micro",
          expr("(1000000L * n_pieces) div n_chars"))
    }),

    // The corpus-prep pipeline composed end-to-end (the capstone the
    // individual gates certify piecewise): exact dedup keeps min-id
    // survivors → C4/Dolma rule filter drops the junk → deterministic
    // hash sharding lays out the training set — reported as the final
    // per-shard census a data loader would consume. Three operators,
    // three shuffles, no windows, every stage scale-bounded.
    "q200_prep_pipeline" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val survivors = Dedup.exact(d, "doc_id", "text")
        .select(col("doc_id"))
      val surviving = d.join(survivors, Seq("doc_id"), "left_semi")
      val kept = Training.ruleFilter(surviving, "doc_id", "text")
        .filter(col("keep")).select(col("doc_id"))
      Training.shardAssign(
          surviving.join(kept, Seq("doc_id"), "left_semi"), "doc_id", 32)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long"))
            .as("n_tokens"),
          min(col("doc_id")).as("min_id"))
    }),

    // Item co-visitation with exact integer lift ("users who touched
    // X also touched Y") over the props item ids — per-actor bounded
    // pair explode with the standard power-user cut (> 55 distinct
    // items drops the actor), pairs with ≥ 40 shared users (above the
    // ~36 independence expectation, so the bar actually selects the
    // over-coupled tail), lift in micro-units.
    "q201_covisitation" -> ((s, dir) => {
      val inter = t(s, dir, "events").select(col("user_id"),
        regexp_extract(col("props"), "[0-9]+", 0).cast("int").as("item"))
      Recsys.covisitation(inter, "user_id", "item",
        minShared = 40, maxItemsPerActor = 55)
    }),

    // Behavioral anomaly by Markov NLL: the corpus transition model
    // (q188's census, add-one smoothed) scores each user's own event
    // stream in exact micro-nats — scripted/backwards behavior ranks
    // high. Same ln-micro-nat convention the LM gates pinned.
    "q202_markov_anomaly" -> ((s, dir) => {
      Sessionize.markovNll(t(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type")
    }),

    // Trending items under EXACT exponential decay: every interaction
    // is worth 1e6 micro-points halved per elapsed 7-day half-life
    // via arithmetic shift — recency weighting with zero floats (IEEE
    // pow would leak last-ulp diffs through the sum; >> cannot). Age
    // measured in days back from the corpus max date.
    "q203_decayed_counts" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val mx = ev.agg(max(to_date(col("ts"))).as("__mx"))
      val aged = ev.crossJoin(broadcast(mx))
        .select(regexp_extract(col("props"), "[0-9]+", 0).cast("int")
            .as("item"),
          datediff(col("__mx"), to_date(col("ts"))).as("age_days"))
      TimeSeries.decayedCounts(aged, "item", "age_days",
        lit(1000000L), halfLife = 7L)
    }),

    // Whitespace-variety tokenization: rebuild each doc with mixed
    // \n/\t/space separators plus a tabbed suffix — under a literal
    // single-space split "foo\nbar" stays ONE token, so these counts
    // and the order-invariant fingerprint would all be wrong; under
    // \s+ they are exact. The %7 rows append Cyrillic+CJK text:
    // wordPieceCount must score non-Latin letter/digit runs
    // (\p{L}\p{N}, not [a-z0-9] — an ASCII-only run class silently
    // zeroes quality signals for non-English corpora).
    "q204_whitespace_tokens" -> ((s, dir) => {
      val sep = when(col("doc_id") % 3 === 0, lit("\n"))
        .when(col("doc_id") % 3 === 1, lit("\t"))
        .otherwise(lit(" \n\t"))
      val wbase = concat(regexp_replace(col("text"), lit(" "), sep),
        lit("\ttail\ntok"))
      val wuni = concat(wbase,
        when(col("doc_id") % 7 === 0, lit("\nпривет мир42 你好"))
          .otherwise(lit("")))
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.tokenCount(wbase).cast("int").as("n_tokens"),
        TextFunctions.wordPieceCount(wuni).cast("int").as("n_pieces"),
        TextFunctions.sortedTokenFingerprint(wbase).as("fp"))
    }),

    // Script-aware near-dup over an unspaced-CJK corpus: each doc is
    // transliterated to CJK with spaces DELETED (translate's
    // shorter-to-string rule), paired with a 3-chars-shorter variant,
    // plus 20 untouched Latin controls that exercise the whitespace
    // branch of the router. Under whitespace tokens the CJK docs each
    // hash as ONE giant token (no 3-shingles ⇒ invisible to MinHash);
    // tokensScriptAware routes cjk-dominant docs to char bigrams, so
    // the near-dup pairs surface through the standard banded LSH +
    // exact-Jaccard pipeline.
    "q205_cjk_neardup" -> ((s, dir) => {
      Dedup.minhashNearDups(cjkCorpus(t(s, dir, "documents")),
          "doc_id", "text",
          tokenizer = TextFunctions.tokensScriptAware)
        .withColumn("jaccard", round(col("jaccard"), 6))
    }),

    // JPEG rows through the multimodal boundary: even ids carry the
    // REAL embedded baseline JPEG (Multimodal.JpegFixture — dhash is
    // actual decoded pixels, the oracle pins the decoder-locked
    // golden), odd ids a jpeg-magic-prefixed corrupt payload (decode
    // fails → deterministic chunk fingerprints still gate the bytes).
    // Sniff verdicts and hex-chunk md5s are computed by BOTH engines;
    // dhash rides only on decodable rows (DuckDB has no JPEG codec —
    // the full decode behavior itself is spec-locked on real bytes in
    // MultimodalSpec).
    "q206_jpeg_media" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 200)
      val content = when(col("doc_id") % 2 === 0,
          unhex(lit(Multimodal.JpegFixture.hex)))
        .otherwise(concat(unhex(lit("FFD8FFE000104A46")),
          col("text").cast("binary")))
      val media = d.select(col("doc_id").as("media_id"),
        content.as("content"))
      val sniffed = media.select(col("media_id"),
        Multimodal.sniffType(col("content")).as("kind"),
        length(col("content")).cast("long").as("n_bytes"))
      val fps = Multimodal.chunkFingerprints(media, "media_id", "content", 64)
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_chunks"), min(col("fp")).as("min_fp"))
      val dh = Multimodal.dhash(
        media.filter(col("media_id") % 2 === 0), "media_id", "content")
      sniffed.join(fps, "media_id")
        .join(dh, Seq("media_id"), "left")
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("n_chunks"), col("min_fp"), col("dhash"))
    }),

    // Metadata-only aggregates through the ACID layer: commit the
    // corpus, then answer count(*)/min/max from MANIFEST LINES alone
    // (per-file footer row counts + min/max stats) — zero data-file
    // reads, the way a 100 TB warehouse must serve `SELECT count(*)`.
    // The DuckDB oracle computes the same aggregates from the raw
    // table, so commit bookkeeping, stats merge AND the no-scan
    // answer all sit under the cross-engine hash gate
    // (ManifestTableSpec proves the zero-read property itself by
    // deleting the data files and asking again).
    "q207_manifest_stats" -> ((s, dir) => {
      import graft.sources.ManifestTable
      val base = scratchDir("graft-q207")
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), col("source"))
      ManifestTable.commitMulti(s, base, "stats-gate",
        snapshots = Map("docs" -> docs))
      ManifestTable.statsAgg(s, base, "docs",
        minMaxCols = Seq("doc_id", "n_chars"))
        .getOrElse(sys.error("manifest could not prove statsAgg"))
    }),

    // Truncated-window EWMA smoothing (α=0.25, W=8) of each user's
    // event-value series: the denoised monitoring twin of the raw
    // samples. All weights are micro-int literals and the numerator/
    // denominator are integer sums, so the smoothed series is
    // bit-identical in DuckDB.
    "q208_ewma" -> ((s, dir) => {
      TimeSeries.ewma(
        t(s, dir, "events").select(col("user_id"), col("ts"),
          col("event_id"), col("value")),
        "user_id", "ts", "event_id", "value", alpha = 0.25, window = 8)
    }),

    // Two-sided CUSUM drift pages per user (slack 10.0, threshold
    // 300.0 in value units): sustained level shifts alarm where
    // q134's robust z-score only sees single outlier points. Output
    // is the alarm rows — the control-room page, not the full chart.
    "q209_cusum" -> ((s, dir) => {
      TimeSeries.cusum(
        t(s, dir, "events").select(col("user_id"), col("ts"),
          col("event_id"), col("value")),
        "user_id", "ts", "event_id", "value",
        slackMicro = 10000000L, thresholdMicro = 300000000L)
        .filter(col("alarm_hi") || col("alarm_lo"))
    }),

    // ε-DP release of the per-event-type census (Laplace, ε=1,
    // seeded by md5(tag:key) — reproducible noise, micro-nat ln
    // quantization): the publishable twin of a raw GROUP BY count.
    "q210_dp_counts" -> ((s, dir) => {
      Privacy.dpCounts(t(s, dir, "events"), Seq("event_type"),
        epsilon = 1.0, tag = "graft-dp-r12")
    }),

    // Binary-quantization ANN: 1 bit/dim signatures (32× smaller than
    // float32, no training), Hamming XOR+popcount shortlist of 50,
    // exact integer-cosine rerank to top-10 for 5 query vectors.
    "q211_bq_knn" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bqTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 10, dim = 64, shortlist = 50)
    }),

    // BQ recall against the exact ground truth over 20 queries — the
    // gate a user tuning `shortlist` watches (the q124/q130/q131
    // composition for the fourth compression family).
    "q212_bq_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
      val bq = Similarity.bqTopK(emb, queries, "vec_id", "embedding",
        k = 10, dim = 64, shortlist = 50)
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", 10)
      Similarity.recallAtK(exact, bq)
    }),

    // Character-trigram Shannon entropy per doc (integer micro-nats):
    // the gibberish/boilerplate axis — base64 mash sits at the
    // uniform ceiling, template spam at the floor; both tails are
    // quality cut points next to q83's repetition signals.
    "q213_char_entropy" -> ((s, dir) => {
      Corpus.charEntropy(t(s, dir, "documents"), "doc_id", "text", 3)
    }),

    // Cohen's κ between the full C4/Dolma rule filter and the cheap
    // length heuristic (n_chars ≥ 200) — "can the cheap gate stand in
    // for the expensive one?" answered beyond-chance, exact-integer
    // contingency.
    "q214_filter_agreement" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val rf = Training.ruleFilter(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep").as("rule_keep"))
      val cheap = docs.select(col("doc_id"),
        (col("n_chars") >= 200L).as("len_keep"))
      Profile.cohenKappa(rf.join(cheap, "doc_id"), "rule_keep", "len_keep")
    }),

    // Per-dimension embedding-health census: micro-exact mean/std and
    // near-zero fraction per dim, collapse verdict — the encoder-
    // degeneration dashboard nobody can eyeball at 100 TB.
    "q215_embedding_health" -> ((s, dir) => {
      Profile.embeddingHealth(t(s, dir, "embeddings"), "embedding")
    }),

    // Benford first-digit census of doc lengths per source with an
    // exact-micro χ² — the fabricated-numbers smell test: a source
    // whose magnitude distribution was synthesized or truncated
    // explodes the χ² where organic growth follows log₁₀(1+1/d).
    "q216_benford" -> ((s, dir) => {
      Profile.benford(t(s, dir, "documents"), "source", "n_chars")
    }),

    // Approximate-FD census source → lang: per source the modal
    // language and its g₃ share, NULL-honest distinct counts — the
    // schema-discovery profile ("does source determine language?").
    "q217_fd_census" -> ((s, dir) => {
      Profile.fdCensus(t(s, dir, "documents"), "source", "lang")
    }),

    // Mixed-script (confusable) token census per source: homoglyph
    // spoof smell — tokens mixing Cyrillic/Greek INTO Latin words.
    // The corpus fixtures are pure-Latin, so two spoofed tails (a
    // Cyrillic-а "pаypal" every 7th doc, a Greek-α "αlpha" on
    // doc_id % 11 == 3) are appended deterministically; the oracle
    // twin appends the identical literals.
    "q218_spoof_census" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("text2",
        when(col("doc_id") % 7 === 0L,
          concat(col("text"), lit(" pаypal аdmin")))
          .when(col("doc_id") % 11 === 3L,
            concat(col("text"), lit(" αlpha")))
          .otherwise(col("text")))
      Corpus.spoofCensus(docs, "doc_id", "text2", "source")
    }),

    // Clauset–Shalizi–Newman power-law tail MLE over doc lengths,
    // xmin = 100 — the "is this still Zipf" drift check; α in exact
    // micro units from micro-nat ln terms.
    "q219_power_law" -> ((s, dir) => {
      Profile.powerLawAlpha(t(s, dir, "documents"), "n_chars", 100L)
    }),

    // Full per-user OLS of milli-quantized event value against
    // days-since-2024-01-01: exact rational slope + intercept, one
    // final double R² over exact integer operands.
    "q220_group_ols" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01")).as("day_x"),
        round(col("value") * 1e3).cast("long").as("val_mq"))
      TimeSeries.groupOls(ev, "user_id", "day_x", "val_mq")
    }),

    // Adamic–Adar affinity between orders sharing parts: rare shared
    // parts count for more (1/ln deg), hub parts (deg > 40) are
    // dropped as the wedge-blowup skew guard, and only ≥2-common
    // pairs surface.
    "q221_adamic_adar" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      Graph.adamicAdar(li, "l_orderkey", "l_partkey",
        maxDegree = 40, minCommon = 2)
    }),

    // TextRank keyword centrality over the corpus word-adjacency
    // graph — the graph-native complement to q66's tf-idf ranking.
    "q222_textrank" -> ((s, dir) => {
      Corpus.textRank(t(s, dir, "documents"), "text",
        minCount = 3, iters = 4)
    }),

    // Top principal direction of the embedding cloud by distributed
    // power iteration — mean + loadings in exact micro units.
    "q223_top_component" -> ((s, dir) => {
      Similarity.topComponent(t(s, dir, "embeddings"), "embedding",
        dim = 64, iters = 4)
    }),

    // "All-but-the-top" residual census: micro projection onto the
    // top component and exact residual squared norms (first 100 vecs).
    "q224_abtt" -> ((s, dir) => {
      Similarity.removeTop(t(s, dir, "embeddings"), "vec_id",
          "embedding", dim = 64, iters = 4)
        .filter(col("vec_id") < 100L)
        .select(col("vec_id"), col("proj_micro"),
          graft.functions.VectorFunctions.normSqQ(col("residual_micro"))
            .as("res_normsq"))
    }),

    // Pairwise Pearson census over lineitem's money columns in ONE
    // scan — centi-unit quantization, DECIMAL(38,0)-exact sufficient
    // statistics, one divide over two sqrts per pair.
    "q225_correlation" -> ((s, dir) => {
      Profile.correlationCensus(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        scale = 100.0)
    }),

    // Mutual information source ↔ lang in micro-nats with marginal
    // entropies and NMI — "how many nats does the source buy about
    // the language", the quantitative twin of q217's FD verdict.
    "q226_mutual_info" -> ((s, dir) => {
      Profile.mutualInfo(t(s, dir, "documents"), "source", "lang")
    }),

    // Mutual-argmax filter over q221's affinity pairs: keep (a, b)
    // only when each is the other's best partner — the
    // high-precision cut of a candidate list.
    "q227_reciprocal_best" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val pairs = Graph.adamicAdar(li, "l_orderkey", "l_partkey",
        maxDegree = 40, minCommon = 2)
      Linkage.reciprocalBest(pairs, "a", "b", "aa_micro")
    }),

    // Sentence census under Gopher-style counting. The corpus
    // fixture has no punctuation, so terminators are injected with
    // literal-pattern replaces (every " table "/" query " breaks a
    // sentence; doc_id % 3 == 0 docs get a terminal period) —
    // mirrored verbatim in the oracle.
    "q228_sentence_stats" -> ((s, dir) => {
      val t2 = regexp_replace(regexp_replace(col("text"),
        " table ", ". Table? "), " query ", " query! ")
      val docs = t(s, dir, "documents").withColumn("text2",
        when(col("doc_id") % 3 === 0L, concat(t2, lit(".")))
          .otherwise(t2))
      Corpus.sentenceStats(docs, "doc_id", "text2")
    }),

    // Line census over the newline-injected fixture — the C4/
    // RefinedWeb cleaning axis: blanks, bullets, shorts, terminal
    // punctuation, all micro-exact per doc.
    "q229_line_census" -> ((s, dir) => {
      Corpus.lineCensus(lineFixture(t(s, dir, "documents")),
        "doc_id", "text3")
    }),

    // C4's line-level scrub: keep terminal-punctuated ≥3-word lines,
    // rebuild the doc; the gate compares the rebuilt text by md5
    // plus the kept/dropped census.
    "q230_c4_line_scrub" -> ((s, dir) => {
      Corpus.scrubLines(lineFixture(t(s, dir, "documents")),
          "doc_id", "text3")
        .select(col("doc_id"), md5(col("text_clean")).as("clean_md5"),
          col("n_kept"), col("n_dropped"))
    }),

    // Corpus-frequent line census: trimmed lines shared by ≥ 3
    // distinct docs — the cross-doc boilerplate detector.
    "q231_frequent_lines" -> ((s, dir) => {
      Corpus.frequentLines(lineFixture(t(s, dir, "documents")),
        "doc_id", "text3", minDf = 3L)
    }),

    // CCNet/RefinedWeb frequent-line scrub: drop corpus-boilerplate
    // lines, rebuild docs in original order, md5-compared.
    "q232_frequent_line_scrub" -> ((s, dir) => {
      Corpus.scrubFrequentLines(lineFixture(t(s, dir, "documents")),
          "doc_id", "text3", maxDf = 3L)
        .select(col("doc_id"), md5(col("text_clean")).as("clean_md5"),
          col("n_kept"), col("n_dropped"))
    }),

    // Calibration reliability bins over a deterministic pseudo-score
    // (multiplicative-hash micro confidence vs the parity label) —
    // the gate pins the exact bin math, not the (junk) calibration.
    "q233_reliability" -> ((s, dir) => {
      val scored = t(s, dir, "embeddings").select(
        ((col("vec_id") * 2654435761L) % 1000000L).as("score_micro"),
        (col("label") % 2).as("y"))
      Profile.reliabilityBins(scored, "score_micro", "y", bins = 10)
    }),

    // Split-leakage census: what a NAIVE per-doc split costs — how
    // many near-dup clusters straddle train/val/test, and how many
    // docs sit in those leaky clusters. The diagnostic q137's
    // component-keyed split exists to zero out.
    "q235_split_leakage" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val comp = Dedup.connectedComponents(
          Dedup.minhashNearDups(docs, "doc_id", "text"), "a", "b")
        .withColumnRenamed("id", "doc_id")
      val keyed = docs.select(col("doc_id"))
        .join(comp, Seq("doc_id"), "left")
        .withColumn("component", coalesce(col("component"), col("doc_id")))
      Sampling.assignSplit(keyed, col("doc_id"), 80, 10)
        .groupBy(col("component"))
        .agg(countDistinct(col("split")).as("__ns"),
          count(lit(1)).as("__nd"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(when(col("__ns") > 1, 1L).otherwise(0L))
            .as("n_clusters_leaky"),
          sum(when(col("__ns") > 1, col("__nd")).otherwise(0L))
            .as("n_docs_in_leaky"))
    }),

    // Kaplan–Meier user-lifetime curves per cohort: duration = span
    // of a user's activity, churned = last activity before the
    // observation edge; survival kept in exact log space.
    "q244_kaplan_meier" -> ((s, dir) => {
      val lives = t(s, dir, "events").groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("__f"),
          max(to_date(col("ts"))).as("__l"))
        .select((col("user_id") % 3).as("cohort"),
          datediff(col("__l"), col("__f")).as("dur"),
          (col("__l") < lit("2024-01-25")).as("churned"))
      TimeSeries.kaplanMeier(lives, "cohort", "dur", "churned")
    }),

    // Median survival time per cohort off the q244 curve: first t
    // with S ≤ ½ (log ≤ −ln 2 µnats), NULL when never reached.
    "q246_median_survival" -> ((s, dir) => {
      val lives = t(s, dir, "events").groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("__f"),
          max(to_date(col("ts"))).as("__l"))
        .select((col("user_id") % 3).as("cohort"),
          datediff(col("__l"), col("__f")).as("dur"),
          (col("__l") < lit("2024-01-25")).as("churned"))
      TimeSeries.medianSurvival(
        TimeSeries.kaplanMeier(lives, "cohort", "dur", "churned"),
        "cohort")
    }),

    // Log-rank test between cohorts 0 and 1 of q244's lifetimes —
    // "do they churn at the same rate", hypergeometric O−E in exact
    // integers.
    "q245_logrank" -> ((s, dir) => {
      val lives = t(s, dir, "events").groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("__f"),
          max(to_date(col("ts"))).as("__l"))
        .select((col("user_id") % 3).as("cohort"),
          datediff(col("__l"), col("__f")).as("dur"),
          (col("__l") < lit("2024-01-25")).as("churned"))
      TimeSeries.logRank(lives, "cohort", "dur", "churned", "0", "1")
    }),

    // Per-source Spearman rank correlation of length vs doc id —
    // tie-exact doubled average ranks, Pearson over exact rank sums,
    // the monotone-association twin of q225's linear census.
    "q243_spearman" -> ((s, dir) => {
      Ranking.spearman(t(s, dir, "documents"), "source",
        "n_chars", "doc_id")
    }),

    // Pearson χ² of independence source × lang with Cramér's V —
    // the NHST twin of q226's mutual information, zero-observed
    // cells accounted through the margin cross.
    "q242_chi2_independence" -> ((s, dir) => {
      Profile.chiSquareIndependence(t(s, dir, "documents"),
        "source", "lang")
    }),

    // Rank-biased overlap per source between the length ranking and
    // the id ranking — the top-weighted "how much did the ranking
    // change" drift number, literal suffix-weight table both engines.
    "q241_rbo" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      def top(order: Column) = Ranking.groupTopK(
          docs.select(col("source"), col("doc_id"), order.as("__o")),
          Seq("source"), Seq(col("__o"), col("doc_id")), 10)
        .select(col("source"), col("doc_id"), col("rank"))
      Ranking.rbo(top(-col("n_chars").cast("long")),
        top(col("doc_id")), "source", "doc_id", "rank",
        k = 10, p = 0.9)
    }),

    // Source-concentration census per language: Gini + HHI over
    // per-source doc counts — "is this language's data captured by a
    // few sources", exact to one divide each.
    "q240_concentration" -> ((s, dir) => {
      val counts = t(s, dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"))
      Profile.concentration(counts, "lang", "source", "n_docs")
    }),

    // Heaps'-law vocabulary-growth census: exact cumulative
    // tokens-vs-types curve in doc order, milli-nat ln columns for
    // the q239 fit.
    "q238_vocab_growth" -> ((s, dir) => {
      Corpus.vocabGrowth(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Heaps' β by exact log-log OLS over q238's census — groupOls
    // composed on a derived table: slope_num/slope_den IS β as a
    // rational, R² says how law-like the growth is. Fixed literal
    // re-origins (−9000/−3000 milli-nats) keep groupOls's n·Σxy
    // products in int64 (its documented contract); the slope and R²
    // are translation-invariant.
    "q239_heaps_fit" -> ((s, dir) => {
      val census = Corpus.vocabGrowth(t(s, dir, "documents"),
          "doc_id", "text")
        .select(lit("all").as("corpus"),
          (col("ln_tokens_milli") - 9000L).as("lnt_c"),
          (col("ln_types_milli") - 3000L).as("lny_c"))
      TimeSeries.groupOls(census, "corpus", "lnt_c", "lny_c")
    }),

    // Consecutive-duplicate-line collapse over an injected stutter
    // (every " the " becomes two identical "repeat me" lines) —
    // the within-doc scraped-page echo cleanup.
    "q237_collapse_repeats" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("text4",
        regexp_replace(col("text"), " the ",
          "\nrepeat me\nrepeat me\n"))
      Corpus.collapseRepeatedLines(docs, "doc_id", "text4")
        .select(col("doc_id"), md5(col("text_clean")).as("clean_md5"),
          col("n_kept"), col("n_dropped"))
    }),

    // Exact Mann–Whitney AUC per source: can document length
    // separate English from the rest — tie-exact doubled rank sums,
    // range-partitioned prefix machinery, NULL on single-class.
    "q236_group_auc" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("source"),
        col("n_chars").as("score"), (col("lang") === "en").as("y"))
      Ranking.groupAuc(docs, "source", "score", "y")
    }),

    // NDCG@10 / MRR / P@10 of a length-ranked system against graded
    // language relevance, per source — the retrieval scorecard with
    // literal-table discounts on both engines.
    "q234_rank_eval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val results = Ranking.groupTopK(
          docs.select(col("source"), col("doc_id"),
            col("n_chars").cast("long").as("__nc")),
          Seq("source"), Seq((-col("__nc")).as("__nnc"), col("doc_id")),
          10)
        .select(col("source"), col("doc_id"), col("rank"))
      val truth = docs.select(col("source"), col("doc_id"),
        when(col("lang") === "en", 2L).when(col("lang") === "de", 1L)
          .otherwise(0L).as("rel"))
      Ranking.rankEval(results, truth, "source", "doc_id", "rank",
        "rel", k = 10)
    }),

    // CJK-aware sentence census (round-12 advice: the sentence unit
    // must not see a CJK document as one giant sentence): fullwidth
    // 。！？ runs now segment without requiring trailing whitespace,
    // so the same sentenceStats that powers the Gopher-style rules
    // counts real CJK sentences — ASCII controls ride the same gate.
    "q247_cjk_sentence_stats" -> ((s, dir) => {
      Corpus.sentenceStats(cjkSentenceFixture(t(s, dir, "documents")),
        "doc_id", "text2")
    }),

    // CJK sentence-grain dedup: the shared boilerplate ideograph
    // sentence survives only in the minimum (doc, pos) — every other
    // CJK doc sheds it, proving sentence dedup now operates at CJK
    // sentence grain (and the ASCII boilerplate dedups alongside).
    "q248_cjk_sentence_dedup" -> ((s, dir) => {
      Dedup.sentenceDedup(cjkSentenceFixture(t(s, dir, "documents")),
        "doc_id", "text2",
        splitter = TextFunctions.sentenceSplit, sep = "。")
    }),

    // Lossless WebP through the codec boundary (round-12 advice #4):
    // 0-mod-3 rows carry the real VP8L fixture (decoded by the
    // from-scratch RFC 9649 decoder), 1-mod-3 its PNG twin, 2-mod-3 a
    // magic-passing corrupt VP8L payload that must fall CLEANLY to
    // the stub. The shared dhash constant on both decodable formats
    // is the decoder lock (mirrors q206's pattern).
    "q249_webp_media" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 180)
      val content = when(col("doc_id") % 3 === 0,
          unhex(lit(Multimodal.WebpFixture.hex)))
        .when(col("doc_id") % 3 === 1,
          unhex(lit(Multimodal.WebpFixture.pngTwinHex)))
        .otherwise(concat(
          unhex(lit(Multimodal.WebpFixture.hex.take(42))),
          col("text").cast("binary")))
      val media = d.select(col("doc_id").as("media_id"),
        content.as("content"))
      val dh = Multimodal.dhash(
        media.filter(col("media_id") % 3 < 2), "media_id", "content")
      media.select(col("media_id"),
          Multimodal.sniffType(col("content")).as("kind"),
          length(col("content")).cast("long").as("n_bytes"))
        .join(dh, Seq("media_id"), "left")
        .select(col("media_id"), col("kind"), col("n_bytes"), col("dhash"))
    }),

    // The judge's "Done" criterion verbatim: a real WebP fixture
    // caught as a near-dup of its PNG twin — cross-format perceptual
    // dedup that byte-level content hashing can never see.
    "q250_webp_neardup" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .filter(col("doc_id") < 60 && col("doc_id") % 3 < 2)
      val media = d.select(col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0,
          unhex(lit(Multimodal.WebpFixture.hex)))
          .otherwise(unhex(lit(Multimodal.WebpFixture.pngTwinHex)))
          .as("content"))
      Multimodal.imageNearDups(media, "media_id", "content")
    }),

    // BPE fertility over the q205 unspaced-CJK corpus with the
    // script-aware tokenizer (round-12 advice #6): the bigram-token
    // route's budget math — token counts, pieces/token, pieces/char —
    // gated on unspaced scripts alongside the Latin controls, with
    // merges trained on the SAME mixed corpus (one shared vocab).
    "q251_cjk_fertility" -> ((s, dir) => {
      val docs = cjkCorpus(t(s, dir, "documents")).withColumn("lang",
        when(col("doc_id") < 100000L, lit("cjk")).otherwise(lit("latin")))
      bpePieceCounts(docs, Seq("lang"),
          tokenizer = TextFunctions.tokensScriptAware)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("n_pieces")).as("n_pieces"),
          sum(col("n_chars")).as("n_chars"))
        .withColumn("fertility_micro",
          expr("(1000000L * n_pieces) div n_tokens"))
        .withColumn("compression_micro",
          expr("(1000000L * n_pieces) div n_chars"))
    }),

    // Corpus-level BLEU-4 per source over the deterministic
    // candidate/reference fixture (cand = ref with ' table '→' desk '
    // and the last two words dropped — real clipping, real brevity
    // penalty): the generation-eval scorecard, per-term micro-nat ln
    // so both engines exponentiate identical rationals.
    "q252_bleu" -> ((s, dir) => {
      TextEval.bleu(genEvalFixture(t(s, dir, "documents")),
        "doc_id", "source", "cand", "ref")
    }),

    // chrF (char 1..6-grams, β=2) over the same pairs — the
    // morphology-robust twin; pure rational arithmetic, no libm.
    "q253_chrf" -> ((s, dir) => {
      TextEval.chrF(genEvalFixture(t(s, dir, "documents")),
        "doc_id", "source", "cand", "ref")
    }),

    // Newman modularity of a hash-labeled partition over the events
    // bipartite hash graph — the community-quality audit number for
    // any labeling (LPA, CC, external clusters); integer algebra,
    // one micro-rounded divide.
    "q254_modularity" -> ((s, dir) => {
      val edges = t(s, dir, "events")
        .select((col("user_id") % 400).as("a"),
          (hashMod("mod", col("event_id"), 300) + lit(400L)).as("b"))
        .distinct()
      val nodes = edges.select(col("a").as("node"))
        .unionByName(edges.select(col("b").as("node"))).distinct()
        .withColumn("lbl", col("node") % 7)
      Graph.modularity(edges, "a", "b", nodes, "node", "lbl")
    }),

    // Split-conformal coverage audit per source: q̂ from the
    // ⌈(n+1)(1−α)⌉-th calibration score (hash-derived, deterministic)
    // and the empirical held-out coverage — range-partitioned rank
    // selection, no per-group window.
    "q255_conformal" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
        hashMod("cf", col("doc_id"), 1000000L).as("score"),
        (col("doc_id") % 2 === 0).as("is_calib"))
      Profile.conformalCoverage(d, "doc_id", "source", "score",
        "is_calib", alpha = 0.1)
    }),

    // Jaro-Winkler blocked linkage over the q133 fixture shape — the
    // codegen'd native expression whose semantics were differentially
    // pinned against DuckDB's implementation (13k random pairs, 0
    // double-precision mismatches); micro-quantized sims, bounded-heap
    // top-1.
    "q256_jw_linkage" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          substring(col("text"), 1, 40).as("head"))
        .filter(col("doc_id") % 2 === 0)
      // the right side is every left record's a↔e-swapped twin under a
      // shifted id — a realistic typo'd-duplicate universe where the
      // true twin scores high and block-mates stay below the bar
      val twins = docs.select((col("doc_id") + 1000000L).as("doc_id"),
        col("lang"), col("source"),
        translate(col("head"), "ae", "ea").as("head"))
      Linkage.jwMatches(docs, twins,
        "doc_id", "doc_id", Seq("lang", "source"), "head", "head",
        minSimMicro = 820000L, k = 1)
    }),

    // Two-sample KS drift statistic per event type (even- vs odd-user
    // halves): exact integer cross-products through the
    // range-partitioned prefix machinery, one micro-rounded divide.
    "q257_ks_test" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("event_type"),
        col("value"), (col("user_id") % 2 === 0).as("side"))
      Profile.ksTest(ev, "event_type", "value", "side")
    }),

    // PSI per lang over length buckets with an INJECTED half-bucket
    // shift on the odd side — the smoothed drift index must light up,
    // per-bin micro-rounded terms summed as integers.
    "q258_psi" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("lang"),
        (col("doc_id") % 2 === 0).as("side"),
        expr("(n_chars + (CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 25 END))" +
          " div 50").as("bin"))
      Profile.psi(d, "lang", "bin", "side")
    }),

    // Entity resolution end-to-end: blocked JW candidates (top-3 per
    // record over the union of directed edges) → reciprocal-best
    // acceptance → connected components → cluster census. The
    // composition the individual gates certify piecewise, chained —
    // every stage scale-bounded (bounded heap, node-sized mutuality
    // join, checkpointed pointer jumping).
    "q259_er_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"), col("source"),
          substring(col("text"), 1, 40).as("head"))
      val twins = docs.select((col("doc_id") + 1000000L).as("doc_id"),
        col("lang"), col("source"),
        translate(col("head"), "ae", "ea").as("head"))
      val uni = docs.unionByName(twins)
      val cand = Linkage.jwMatches(uni, uni, "doc_id", "doc_id",
          Seq("lang", "source"), "head", "head",
          minSimMicro = 820000L, k = 3)
        .filter(col("left_id") < col("right_id"))
        .select(col("left_id").as("a"), col("right_id").as("b"),
          col("sim_micro"))
        .distinct()
      val accepted = Linkage.reciprocalBest(cand, "a", "b", "sim_micro")
      Dedup.connectedComponents(accepted, "a", "b")
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_id"))
    }),

    // l-diversity over (lang, length-bucket) classes with source as
    // the sensitive attribute — distinct-l plus the ungameable
    // entropy-l in micro-nats, charEntropy quantization.
    "q260_l_diversity" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("bucket", expr("n_chars div 200"))
      Privacy.lDiversity(d, Seq("lang", "bucket"), "source")
    }),

    // t-closeness of the same classes: variational distance to the
    // global source mix, absent-value tail folded into one integer
    // complement term.
    "q261_t_closeness" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("bucket", expr("n_chars div 200"))
      Privacy.tCloseness(d, Seq("lang", "bucket"), "source")
    }),

    // Seasonality detector per user: naive vs lag-4 seasonal-naive
    // in-sample MAE and their ratio — rank ordinals through the
    // range-partitioned prefix, lag taps as equi-joins, no windows.
    "q262_seasonal_eval" -> ((s, dir) => {
      TimeSeries.naiveForecastEval(t(s, dir, "events"),
        "user_id", "ts", "event_id", "value", period = 4)
    }),

    // Neyman-optimal eval-sample allocation across languages, sized
    // by n_chars dispersion: √(n·Σx²−(Σx)²) integer weights through
    // the exact Hare apportionment — Σ alloc = 10000 exactly.
    "q263_neyman_alloc" -> ((s, dir) => {
      Sampling.neymanAllocation(t(s, dir, "documents"),
        "lang", "n_chars", budget = 10000L)
    }),

    // Benjamini–Hochberg step-up selection per source over
    // hash-derived pseudo p-values at FDR 0.1 — the all-integer
    // cross-multiplied step condition, cutoff = max qualifying rank.
    "q264_bh_select" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
        when(col("doc_id") % 20 === 0,
          hashMod("bh", col("doc_id"), 2000L))
          .otherwise(hashMod("bh", col("doc_id"), 1000000L))
          .as("p_micro"))
      Profile.bhSelect(d, "source", "doc_id", "p_micro",
        alphaMicro = 100000L)
    }),

    // GIF through the codec boundary (the VERDICT's remaining image
    // format): 0-mod-3 rows carry the real 2-color GIF fixture
    // (JDK ImageIO reader), 1-mod-3 the PNG twin with the SAME
    // pixels, 2-mod-3 a magic-passing corrupt GIF that must fall
    // cleanly to the stub. All three decodable formats (GIF, PNG,
    // WebP) now share one decoder-locked dhash.
    "q265_gif_media" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 180)
      val content = when(col("doc_id") % 3 === 0,
          unhex(lit(Multimodal.GifFixture.hex)))
        .when(col("doc_id") % 3 === 1,
          unhex(lit(Multimodal.WebpFixture.pngTwinHex)))
        .otherwise(concat(unhex(lit("474946383961")),
          col("text").cast("binary")))
      val media = d.select(col("doc_id").as("media_id"),
        content.as("content"))
      val dh = Multimodal.dhash(
        media.filter(col("media_id") % 3 < 2), "media_id", "content")
      media.select(col("media_id"),
          Multimodal.sniffType(col("content")).as("kind"),
          length(col("content")).cast("long").as("n_bytes"))
        .join(dh, Seq("media_id"), "left")
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("dhash"))
    }),

    // Exact 1-Wasserstein drift magnitude per event type (same split
    // as q257's KS): consecutive-distinct-value terms via rank
    // equi-join, DECIMAL products, one micro-rounded divide.
    "q266_wasserstein" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("event_type"),
        col("value"), (col("user_id") % 2 === 0).as("side"))
      Profile.wasserstein1(ev, "event_type", "value", "side")
    }),

    // Mann–Whitney U on the same split as q257's KS: doubled-midrank
    // integer rank sums, tie-corrected z and rank-biserial effect
    // size as the only (micro-rounded) float steps.
    "q267_mann_whitney" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("event_type"),
        col("value"), (col("user_id") % 2 === 0).as("side"))
      Profile.mannWhitney(ev, "event_type", "value", "side")
    }),

    // McNemar's paired test per lang: two length-rule "classifiers"
    // disagreeing on a deterministic sliver of rows — the promotion
    // gate for swapping filter A (>= 500 chars) for filter B
    // (>= 480 chars, minus every 13th doc).
    "q268_mcnemar" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("lang"),
        (col("n_chars") >= 500).as("rule_a"),
        (col("n_chars") >= 480 && col("doc_id") % 13 =!= 0)
          .as("rule_b"))
      Profile.mcnemar(d, "lang", "rule_a", "rule_b")
    }),

    // Welch's unequal-variance t on the q257/q266/q267 split — the
    // parametric member of the drift family: exact DECIMAL sufficient
    // statistics, one float pass for t and the Satterthwaite df.
    "q269_welch_t" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("event_type"),
        col("value"), (col("user_id") % 2 === 0).as("side"))
      Profile.welchT(ev, "event_type", "value", "side")
    }),

    // Jensen–Shannon divergence over q258's exact binning fixture
    // (injected half-bucket shift on the odd side) — the bounded,
    // symmetric drift number next to PSI's unbounded index.
    "q270_jsd" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("lang"),
        (col("doc_id") % 2 === 0).as("side"),
        expr("(n_chars + (CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 25 END))" +
          " div 50").as("bin"))
      Profile.jsd(d, "lang", "bin", "side")
    }),

    // Autocorrelation census, lags 1..5, per event type — organic
    // driver data (no injection): integer cross-multiplied mean
    // elimination, one exploded-lag equi-join for all taps.
    "q271_acf" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      TimeSeries.acf(ev, "event_type", "ts", "event_id", "value",
        maxLag = 5)
    }),

    // Single changepoint per event type: best SSE split over the
    // organic value series, argmax via the bounded heap, ties to the
    // earliest split.
    "q272_changepoint" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      TimeSeries.changepoint(ev, "event_type", "ts", "event_id",
        "value")
    }),

    // Isotonic calibration per source: monotone fit of the English
    // share as a function of the length bin (organic data, 6 bins) —
    // minimax PAV over micro-rounded segment rates.
    "q273_isotonic" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("source"),
        expr("n_chars div 100").as("bin"),
        (col("lang") === "en").as("is_en"))
      Profile.isotonicFit(d, "source", "bin", "is_en")
    }),

    // ROUGE-1/2 over the q252 generation-eval pairs — the recall side
    // of the BLEU census, same per-row clipped gram machinery.
    "q274_rouge" -> ((s, dir) => {
      TextEval.rougeN(genEvalFixture(t(s, dir, "documents")),
        "doc_id", "source", "cand", "ref", maxN = 2)
    }),

    // Jaccard link prediction on the q221 order–part graph: capped
    // neighbor universe (deg ≤ 40) for intersection AND degrees,
    // ≥ 2 shared parts.
    "q275_link_jaccard" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      Graph.jaccardLinkPredict(edges, "l_orderkey", "l_partkey",
        maxDegree = 40, minCommon = 2)
    }),

    // Video-container metadata through the box walker: 0-mod-3 rows
    // carry the real minimal MP4 (ftyp isom + mvhd v0, 5500 ms),
    // 1-mod-3 a magic-passing truncated ftyp that must quarantine to
    // NULLs, 2-mod-3 plain text.
    "q276_video_meta" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 180)
      val content = when(col("doc_id") % 3 === 0,
          unhex(lit(Multimodal.Mp4Fixture.hex)))
        .when(col("doc_id") % 3 === 1,
          concat(unhex(lit("0000000866747970")),
            col("text").cast("binary")))
        .otherwise(col("text").cast("binary"))
      val media = d.select(col("doc_id").as("media_id"),
        content.as("content"))
      media.select(col("media_id"),
          Multimodal.sniffType(col("content")).as("kind"),
          length(col("content")).cast("long").as("n_bytes"))
        .join(Multimodal.videoMeta(media, "media_id", "content"),
          Seq("media_id"), "left")
    }),

    // BMP through the codec boundary: real fixture sharing the
    // quadrant dhash with its PNG twin, plus a magic-passing corrupt
    // BMP falling cleanly to the stub (NULL dhash via the join).
    "q277_bmp_media" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 180)
      val content = when(col("doc_id") % 3 === 0,
          unhex(lit(Multimodal.BmpFixture.hex)))
        .when(col("doc_id") % 3 === 1,
          unhex(lit(Multimodal.WebpFixture.pngTwinHex)))
        // magic + size + ZEROED reserved field (the structural byte
        // sniffType demands), then text — passes the sniff, fails
        // the codec.
        .otherwise(concat(unhex(lit("424D3603000000000000")),
          col("text").cast("binary")))
      val media = d.select(col("doc_id").as("media_id"),
        content.as("content"))
      val dh = Multimodal.dhash(
        media.filter(col("media_id") % 3 < 2), "media_id", "content")
      media.select(col("media_id"),
          Multimodal.sniffType(col("content")).as("kind"),
          length(col("content")).cast("long").as("n_bytes"))
        .join(dh, Seq("media_id"), "left")
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("dhash"))
    }),

    // Embedding-centroid drift per label: cosine of side sums (scale
    // cancels) + clamped L2 centroid shift — the vector member of
    // the q257/q258/q266 drift family.
    "q278_embedding_drift" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("label"),
        col("embedding"), (col("vec_id") % 2 === 0).as("side"))
      Similarity.centroidDrift(e, "label", "embedding", "side")
    }),

    // Holt level+trend smoothing per user (α=0.6, β=0.3, W=16):
    // q208's EWMA twin for TRENDING series — truncated A^m·c kernel,
    // micro-int tap sums, NULL until the kernel is full.
    "q279_holt" -> ((s, dir) => {
      TimeSeries.holt(
        t(s, dir, "events").select(col("user_id"), col("ts"),
          col("event_id"), col("value")),
        "user_id", "ts", "event_id", "value",
        alpha = 0.6, beta = 0.3, window = 16)
    }),

    // Per-community quality census on the q254 graph/labels:
    // nodes, internal edges, volume, cut, conductance.
    "q280_community_quality" -> ((s, dir) => {
      val edges = t(s, dir, "events")
        .select((col("user_id") % 400).as("a"),
          (hashMod("mod", col("event_id"), 300) + lit(400L)).as("b"))
        .distinct()
      val nodes = edges.select(col("a").as("node"))
        .unionByName(edges.select(col("b").as("node"))).distinct()
        .withColumn("lbl", col("node") % 7)
      Graph.communityQuality(edges, "a", "b", nodes, "node", "lbl")
    }),

    // Louvain-style pairwise merge gains over the same labeling:
    // candidates = inter-community edge census, ΔQ = e₁₂/m − d₁d₂/2m².
    "q281_merge_gain" -> ((s, dir) => {
      val edges = t(s, dir, "events")
        .select((col("user_id") % 400).as("a"),
          (hashMod("mod", col("event_id"), 300) + lit(400L)).as("b"))
        .distinct()
      val nodes = edges.select(col("a").as("node"))
        .unionByName(edges.select(col("b").as("node"))).distinct()
        .withColumn("lbl", col("node") % 7)
      Graph.mergeGain(edges, "a", "b", nodes, "node", "lbl")
    }),

    // Degree assortativity of the same bipartite hash graph —
    // Pearson over the 2m edge orientations, exact integer stats.
    "q282_assortativity" -> ((s, dir) => {
      val edges = t(s, dir, "events")
        .select((col("user_id") % 400).as("a"),
          (hashMod("mod", col("event_id"), 300) + lit(400L)).as("b"))
        .distinct()
      Graph.assortativity(edges, "a", "b")
    }),

    // Exact Levenshtein ≤ 1 self-join by deletion neighborhoods:
    // the engine does the (L+1)-variant equi-join; the oracle can
    // afford the quadratic cross join at gate scale — which is the
    // point. Even docs get a one-substitution twin ('0' never occurs
    // in the corpus, so those pairs are distance exactly 1).
    "q283_edit_join" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id").as("id"),
          substring(col("text"), 1, 12).as("h"))
      val twins = t(s, dir, "documents")
        .filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 1000000L).as("id"),
          concat(substring(col("text"), 1, 5), lit("0"),
            substring(col("text"), 7, 6)).as("h"))
      Linkage.editNeighborJoin(d.unionByName(twins), "id", "h")
    }),

    // Kish effective sample size of the n_chars importance weights
    // per source — the health number to read before trusting any
    // weighted estimate off q97-style weights.
    "q284_ess" -> ((s, dir) => {
      Sampling.effectiveSampleSize(
        t(s, dir, "documents").select(col("source"),
          col("n_chars").cast("double").as("w")),
        "source", "w")
    }),

    // Krippendorff's α per source over three deterministic "raters"
    // (two length rules + a hash rater that only rates every third
    // doc — real missing-data shape).
    "q285_krippendorff" -> ((s, dir) =>
      Profile.krippendorffAlpha(ratingsFixture(s, dir), "source",
        "item", "label")),

    // Majority-vote consolidation of the same ratings: winning
    // label (ties to the lexically smallest), share, unanimity.
    "q286_majority_vote" -> ((s, dir) =>
      Profile.majorityVote(ratingsFixture(s, dir), "source",
        "item", "label")),

    // Deterministic Poisson-bootstrap 95% CI for the mean event
    // value per type: 100 hash-weighted replicates through ONE
    // explode+aggregate, exact order-statistic endpoints.
    "q287_bootstrap_ci" -> ((s, dir) => {
      Sampling.bootstrapMeanCI(
        t(s, dir, "events").select(col("event_type"), col("event_id"),
          col("value")),
        "event_type", "event_id", "value", b = 100)
    }),

    // CUPED variance-reduced A/B readout on the q269 split: pooled
    // θ from exact DECIMAL sufficient stats, covariate = floor(value)
    // (a strongly-correlated pre-period proxy), ρ² reduction factor.
    "q288_cuped" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("event_type"),
        col("value"), floor(col("value")).cast("double").as("x"),
        (col("user_id") % 2 === 0).as("side"))
      Profile.cuped(ev, "event_type", "value", "x", "side")
    }),

    // Strictly-ordered view→click→purchase funnel: step 1 is a
    // min-agg, each later step ONE key equi-join + min-agg — no
    // per-key window anywhere; exact DECIMAL delta sums.
    "q289_funnel" -> ((s, dir) =>
      Sessionize.funnel(t(s, dir, "events"), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))),

    // Weekly cohort-retention matrix over pure integer epoch-µs
    // bucket division (no calendar): cohort = first active bucket,
    // cells = keys active again `offset` buckets later.
    "q290_retention" -> ((s, dir) =>
      Sessionize.cohortRetention(t(s, dir, "events"), "user_id",
        "ts", bucketDays = 7)),

    // Last-touch attribution of purchases to the most recent other
    // event within 24 h — union + running last-non-null struct (the
    // asOfJoin shape), "(none)" bucket for stale/absent touches.
    "q291_attribution" -> ((s, dir) =>
      Sessionize.attribution(t(s, dir, "events"), "user_id", "ts",
        "event_type", "value", "event_id",
        conversionType = "purchase", lookbackSec = 86400L)),

    // OSA/Damerau ≤ 1 self-join: odd docs get an adjacent-swap twin
    // (chars 6↔7 of the 12-char head) — invisible to plain
    // Levenshtein ≤ 1 (distance 2) but one OSA edit; the oracle's
    // damerau_levenshtein affords the quadratic form at gate scale.
    "q292_osa_join" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id").as("id"),
          substring(col("text"), 1, 12).as("h"))
      val twins = t(s, dir, "documents")
        .filter(col("doc_id") % 2 === 1)
        .select((col("doc_id") + 1000000L).as("id"),
          concat(substring(col("text"), 1, 5),
            substring(col("text"), 7, 1), substring(col("text"), 6, 1),
            substring(col("text"), 8, 5)).as("h"))
      Linkage.editNeighborJoin(d.unionByName(twins), "id", "h",
        transpositions = true)
    }),

    // Difference-in-differences per event type: treat = even users,
    // post = second half of the month — exact DECIMAL cell sums,
    // four-mean algebra once per group.
    "q293_did" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("event_type"),
        col("value"), (col("user_id") % 2 === 0).as("treat"),
        (unix_micros(col("ts")) >= 1705363200000000L).as("post"))
      Profile.diffInDiff(ev, "event_type", "value", "treat", "post")
    }),

    // Sample-ratio-mismatch χ² against the intended 50/50 split —
    // the pre-metric trust gate for q288/q293's arms.
    "q294_srm" -> ((s, dir) =>
      Profile.sampleRatioCheck(
        t(s, dir, "events").select(col("event_type"),
          (col("user_id") % 2 === 0).as("side")),
        "event_type", "side")),

    // Sturges auto-binned value histogram per event type — bins from
    // the exact bit length of n, integer bin assignment, exact micro
    // bounds; only occupied bins emit.
    "q295_sturges_hist" -> ((s, dir) =>
      Profile.sturgesHistogram(
        t(s, dir, "events").select(col("event_type"), col("value")),
        "event_type", "value")),

    // Wilson 95% interval for the long-document share per source —
    // literal z, one IEEE sqrt, engine-identical micro bounds.
    "q296_wilson" -> ((s, dir) =>
      Profile.wilsonInterval(
        t(s, dir, "documents").select(col("source"),
          (col("n_chars") >= 500).as("long_doc")),
        "source", "long_doc")),

    // Lorenz decile census of characters per source: which slice of
    // the corpus holds the mass (the WHERE to Gini's HOW MUCH).
    "q297_lorenz" -> ((s, dir) =>
      Profile.lorenzBuckets(
        t(s, dir, "documents").select(col("source"),
          col("n_chars").cast("double").as("w"), col("doc_id")),
        "source", "w", "doc_id", buckets = 10)),

    // Funnel time-to-convert distribution: exact p50/p90 of each
    // step's delta off the q289 chain (the mean hides the slow tail).
    "q298_funnel_latency" -> ((s, dir) => {
      val times = Sessionize.funnelTimes(t(s, dir, "events"),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      val deltas = times.filter(col("prev_us").isNotNull)
        .select(col("step"), (col("t_us") - col("prev_us")).as("delta_us"),
          col("user_id"))
      Ranking.groupQuantiles(deltas, "step", "delta_us", "user_id",
        Seq(0.5, 0.9))
    }),

    // Local clustering coefficient per node over the hash graph —
    // the per-node drill-down under the q119 triangle census; the
    // oracle closes triangles with the exhaustive three-way join.
    "q299_clustering" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        hashMod("cx", col("event_id"), 200).as("x"),
        hashMod("cy", col("event_id"), 200).as("y"))
      Graph.clusteringCoefficients(e, "x", "y")
    }),

    // STL-lite additive decomposition of the daily per-type value
    // series, weekly period: centered-MA trend by index equi-join
    // (partial kernels NULL), per-phase seasonal means, residual.
    "q300_stl" -> ((s, dir) => {
      val series = t(s, dir, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day_idx"),
          round(col("value").cast("double") * lit(1e6)).cast("long")
            .as("v"))
        .groupBy(col("event_type"), col("day_idx"))
        .agg(sum(col("v")).as("y"))
      TimeSeries.stlLite(series, "event_type", "day_idx", "y",
        period = 7)
    }),

    // Exact join cardinality WITHOUT running the join: Σ c_L·c_R
    // over the two key censuses — the pre-flight number that decides
    // whether the real join needs salting.
    "q301_join_cardinality" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Profile.joinCardinality(
        ev.select(col("user_id")), "user_id",
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id")), "user_id")
    }),

    // Key-skew diagnostic on a 90%-hot key (the bench skew shape):
    // hottest key, its share, and the integer salt factor it needs
    // over 32 reducers.
    "q302_key_skew" -> ((s, dir) => {
      val k = when(col("event_id") % 10 < 9, lit(1L))
        .otherwise(col("user_id"))
      Skew.keySkew(t(s, dir, "events").select(k.as("k")), "k",
        parts = 32)
    }),

    // MP3 stream metadata through the strict header walk (the q276
    // MP4 pattern): 0-mod-3 rows carry the real minimal MP3 (ID3v2.4
    // tag + four 128 kbps/44100 Hz frames, 104 ms), 1-mod-3 a
    // magic-passing corrupt ID3 that must quarantine to NULLs,
    // 2-mod-3 plain text.
    "q303_mp3_meta" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 180)
      val content = when(col("doc_id") % 3 === 0,
          unhex(lit(Multimodal.Mp3Fixture.hex)))
        // "ID3" + major version 4 (the structural control byte
        // sniffType demands), then text — passes the sniff, fails
        // the strict header walk.
        .when(col("doc_id") % 3 === 1,
          concat(unhex(lit("49443304")), col("text").cast("binary")))
        .otherwise(col("text").cast("binary"))
      val media = d.select(col("doc_id").as("media_id"),
        content.as("content"))
      media.select(col("media_id"),
          Multimodal.sniffType(col("content")).as("kind"),
          length(col("content")).cast("long").as("n_bytes"))
        .join(Multimodal.audioStreamMeta(media, "media_id", "content"),
          Seq("media_id"), "left")
    }),

    // Temperature-sampled mixture rates (α = 0.3, the low-resource
    // boost): n^α as exp(α·ln n) with micro-quantization BETWEEN the
    // libm steps; shares feed mixtureRebalance as its weights.
    "q304_temperature_mix" -> ((s, dir) =>
      Training.temperatureMixRates(t(s, dir, "documents"), "source",
        alpha = 0.3)),

    // Per-rater accuracy against the q286 consensus over the q285
    // ratings fixture — which rater drags the vendor's α down.
    "q305_rater_accuracy" -> ((s, dir) =>
      Profile.raterAccuracy(ratingsFixture(s, dir), "source",
        "item", "rater", "label")),

    // Day-of-week × hour traffic grid per event type in pure integer
    // epoch math (dow 0 = Monday via (day+3) mod 7 — no calendar
    // library on either engine).
    "q306_activity_grid" -> ((s, dir) =>
      TimeSeries.activityGrid(t(s, dir, "events"), "event_type", "ts")),

    // Two-proportion z-test on the q288/q294 arms: high-value share
    // per side, pooled variance, literal-z significance cut.
    "q307_two_proportion" -> ((s, dir) =>
      Profile.twoProportionTest(
        t(s, dir, "events").select(col("event_type"),
          (col("user_id") % 2 === 0).as("side"),
          (col("value") >= 100.0).as("hi")),
        "event_type", "side", "hi")),

    // Bradley–Terry strengths over the organic source-vs-source
    // matches (consecutive docs "compete" on n_chars): 5 unrolled
    // MM rounds, micro-quantized between rounds — the q119 fixpoint
    // discipline on the RLHF-preference shape.
    "q308_bradley_terry" -> ((s, dir) =>
      Preference.bradleyTerry(matchesFixture(s, dir),
        "winner", "loser", iters = 5)),

    // Pairwise win-rate matrix with Wilson 95% bounds over the same
    // matches — the per-matchup readout the BT fit summarizes away.
    "q309_win_rate" -> ((s, dir) =>
      Preference.winRateMatrix(matchesFixture(s, dir),
        "winner", "loser")),

    // Unbiased pass@k per (source, lang) task: attempts = docs,
    // pass = n_chars >= 450 (a sparse bar), k in {1, 5, 10} via the
    // micro-nat product convention.
    "q310_pass_at_k" -> ((s, dir) =>
      Preference.passAtK(
        t(s, dir, "documents").select(
          concat_ws(":", col("source"), col("lang")).as("task"),
          (col("n_chars") >= 450L).as("ok")),
        "task", "ok", Seq(1, 5, 10))),

    // Materialized training order for the q304 temperature mixture:
    // stride scheduling — doc i of a rate-r source at virtual time
    // (2i−1)/(2r), globally sorted. Reproducible row-for-row, no RNG.
    "q311_interleave_order" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Training.strideInterleave(d, "source", "doc_id",
        Training.temperatureMixRates(d, "source", alpha = 0.3))
    }),

    // Cluster-cohesion scorecard for the q53 IVF clustering:
    // simplified silhouette (centroid distances, not pairwise) per
    // cell — same assignment convention the index ships.
    "q312_silhouette" -> ((s, dir) =>
      Similarity.simplifiedSilhouette(t(s, dir, "embeddings"),
        "vec_id", "embedding", nCentroids = 16)),

    // FLAC stream metadata through the strict block walk (the q303
    // MP3 pattern): 0-mod-3 the real minimal FLAC (STREAMINFO,
    // 44100 Hz / 2 ch / 16-bit / 4410 samples = 100 ms), 1-mod-3 a
    // magic-passing corrupt chain that must quarantine, 2-mod-3 text.
    "q313_flac_meta" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 180)
      val content = when(col("doc_id") % 3 === 0,
          unhex(lit(Multimodal.FlacFixture.hex)))
        // 'fLaC' + STREAMINFO-first header byte (the sniff guard),
        // then text — passes the sniff, fails the strict walk.
        .when(col("doc_id") % 3 === 1,
          concat(unhex(lit("664C614300")), col("text").cast("binary")))
        .otherwise(col("text").cast("binary"))
      val media = d.select(col("doc_id").as("media_id"),
        content.as("content"))
      media.select(col("media_id"),
          Multimodal.sniffType(col("content")).as("kind"),
          length(col("content")).cast("long").as("n_bytes"))
        .join(Multimodal.flacMeta(media, "media_id", "content"),
          Seq("media_id"), "left")
    }),

    // TIFF dimensions through the IFD walk: 0-mod-3 the real LE
    // fixture (16×16), 1-mod-3 magic + text (the IFD offset lands
    // past the buffer → NULL quarantine), 2-mod-3 plain text.
    "q314_tiff_meta" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 180)
      val content = when(col("doc_id") % 3 === 0,
          unhex(lit(Multimodal.TiffFixture.hex)))
        .when(col("doc_id") % 3 === 1,
          concat(unhex(lit("49492A00")), col("text").cast("binary")))
        .otherwise(col("text").cast("binary"))
      val media = d.select(col("doc_id").as("media_id"),
        content.as("content"))
      media.select(col("media_id"),
          Multimodal.sniffType(col("content")).as("kind"),
          length(col("content")).cast("long").as("n_bytes"))
        .join(Multimodal.tiffDims(media, "media_id", "content"),
          Seq("media_id"), "left")
    }),

    // Flesch reading-ease + FK grade over the q228 punctuation-
    // injected fixture (the corpus has no sentence punctuation of
    // its own): vowel-group syllable proxy, shared sentence splitter.
    "q315_readability" -> ((s, dir) => {
      val t2 = regexp_replace(regexp_replace(col("text"),
        " table ", ". Table? "), " query ", " query! ")
      val docs = t(s, dir, "documents").withColumn("text2",
        when(col("doc_id") % 3 === 0L, concat(t2, lit(".")))
          .otherwise(t2))
      Corpus.readabilityCensus(docs, "doc_id", "text2")
    }),

    // Post-stratified ATE: arm = user parity, strata = event_type —
    // the exact-matching observational estimator, one summary row.
    "q316_stratified_ate" -> ((s, dir) =>
      Profile.postStratifiedAte(
        t(s, dir, "events").select(
          (col("user_id") % 2 === 0).as("arm"),
          col("event_type"), col("value")),
        "arm", "event_type", "value")),

    // Pre-experiment power: minimum detectable effect per event_type
    // at 95%/80% on the q307 outcome split.
    "q317_mde" -> ((s, dir) =>
      Profile.minDetectableEffect(
        t(s, dir, "events").select(col("event_type"),
          (col("user_id") % 2 === 0).as("arm"),
          (col("value") >= 100.0).as("hi")),
        "event_type", "arm", "hi")),

    // Phonetic key census over the part-name vocabulary — the
    // classic name-matching blocking function as a pure expression
    // chain (simplified Soundex, documented variant).
    "q318_phonetic_census" -> ((s, dir) =>
      t(s, dir, "part")
        .select(explode(graft.functions.TextFunctions.tokens(
          col("p_name"))).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n_parts"))
        .select(col("word"), Linkage.phoneticKey(col("word"))
          .as("code"), col("n_parts"))),

    // Sound-alike pairs by phonetic blocking over the same
    // vocabulary (red/rod collide organically at R300).
    "q319_phonetic_pairs" -> ((s, dir) =>
      Linkage.phoneticBlockedPairs(
        t(s, dir, "part").select(explode(
          graft.functions.TextFunctions.tokens(col("p_name")))
          .as("word")),
        "word", maxDf = 50)),

    // KMV distinct-vocabulary estimate per source (k = 32 smallest
    // word hashes — mergeable, exact when unfilled).
    "q320_kmv_words" -> ((s, dir) =>
      Sketches.kmvEstimate(
        Sketches.kmvSketch(
          t(s, dir, "documents").select(col("source"),
            explode(graft.functions.TextFunctions.tokens(col("text")))
              .as("w")),
          col("w"), Seq("source"), k = 32),
        Seq("source"), k = 32)),

    // Pairwise vocabulary-overlap estimates between sources off the
    // same sketches — the set-op KMV supports and HLL registers
    // cannot (group-pair census, the q117 precedent).
    "q321_kmv_intersect" -> ((s, dir) =>
      Sketches.kmvIntersectPairs(
        t(s, dir, "documents").select(col("source"),
          explode(graft.functions.TextFunctions.tokens(col("text")))
            .as("w")),
        col("w"), "source", k = 32)),

    // IBAN candidate census (the q172 PAN shape for bank accounts):
    // maximal [A-Z0-9] runs, ISO country+check shape, mod-97 verdict
    // via the positional 10^e mod 97 weight table.
    "q322_iban_census" -> ((s, dir) =>
      Privacy.ibanCandidates(
        t(s, dir, "documents")
          .select(col("doc_id"),
            concat(col("text"), ibanPayload).as("raw")),
        "doc_id", "raw")),

    // PACF (quantized Durbin–Levinson on the q271 ACF) — the
    // AR-order diagnostic: each level's coefficients micro-round
    // before the next level consumes them.
    "q323_pacf" -> ((s, dir) =>
      TimeSeries.pacf(t(s, dir, "events"),
        "event_type", "ts", "event_id", "value", maxLag = 5)),

    // RAKE keyword census: stopword-delimited phrase runs, word
    // degree/frequency scores, phrase = sum of word scores.
    "q324_rake" -> ((s, dir) =>
      Corpus.rakeKeywords(t(s, dir, "documents"), "doc_id", "text",
        stopwords = Seq("a", "the", "and", "of", "to", "in", "is",
          "on", "for"),
        maxPhraseWords = 8)),

    // Empirical-Bayes beta-binomial shrinkage of per-source long-doc
    // rates — the smoothed-CTR estimator, moments fit on exact
    // micro-rate sums.
    "q325_eb_shrinkage" -> ((s, dir) =>
      Profile.ebBetaBinomial(
        t(s, dir, "documents").select(col("source"),
          (col("n_chars") >= 400L).as("long_doc")),
        "source", "long_doc")),

    // Quantile treatment effects on the q293 arms: exact p50/p90
    // per arm via the range-partitioned selection machinery, diff
    // micro-rounded once.
    "q326_qte" -> ((s, dir) =>
      Profile.quantileTreatmentEffect(
        t(s, dir, "events").filter(col("value").isNotNull)
          .select(col("event_type"),
            (col("user_id") % 2 === 0).as("arm"),
            col("value"), col("event_id")),
        "event_type", "arm", "value", "event_id", Seq(0.5, 0.9))),

    // Off-policy IPS/SNIPS replay: target policy "always purchase",
    // logging propensities = the empirical global action rates,
    // segments = user id mod 4.
    "q327_off_policy" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
      val tot = ev.agg(count(lit(1)).as("__n"))
      val pr = ev.groupBy(col("event_type").as("__act"))
        .agg(count(lit(1)).as("__na"))
        .crossJoin(broadcast(tot))
        .select(col("__act"),
          round(lit(1e6) * col("__na").cast("double") /
            col("__n").cast("double")).cast("long").as("p_micro"))
      val logged = ev
        .select((col("user_id") % 4).cast("string").as("seg"),
          col("event_type"), col("value"))
        .join(broadcast(pr), col("event_type") === col("__act"))
        .withColumn("target", lit("purchase"))
      Profile.offPolicyValue(logged, "seg", "event_type", "value",
        "p_micro", "target")
    }),

    // Always-valid (peeking-proof) two-proportion mSPRT on the q307
    // shape: e-value + always-valid p at mixture scale tau = 0.1.
    "q328_always_valid" -> ((s, dir) =>
      Profile.alwaysValidTest(
        t(s, dir, "events").select(col("event_type"),
          (col("user_id") % 2 === 0).as("arm"),
          (col("value") >= 100.0).as("hi")),
        "event_type", "arm", "hi", tau = 0.1)),

    // Platt scaling by distributed Newton (5 one-pass rounds): fit
    // sigma(a*s + b) predicting the high-value label from a noised
    // score — the hash noise makes the classes overlap, so the MLE
    // is finite and the fit converges.
    "q329_platt_fit" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
      Profile.plattFit(
        ev.select(((col("value") +
          hashMod("pn", col("event_id"), 50L).cast("double")) /
          lit(100.0)).as("s"),
          (col("value") >= 100.0).as("y")),
        "s", "y", iters = 5)
    }),

    // Delta-method CI for the user-clustered value-per-event ratio —
    // the variance the naive row-level CI understates.
    "q330_ratio_ci" -> ((s, dir) =>
      Profile.ratioMetricCI(
        t(s, dir, "events").filter(col("value").isNotNull)
          .select(col("event_type"), col("user_id"), col("value"),
            lit(1.0).as("one")),
        "event_type", "user_id", "value", "one")),

    // Chapman mark-recapture estimate of per-type active users from
    // first-half vs second-half-of-month sightings.
    "q331_mark_recapture" -> ((s, dir) =>
      Profile.markRecapture(
        t(s, dir, "events").select(col("event_type"), col("user_id"),
          (dayofmonth(col("ts")) <= 15).as("in_a"),
          (dayofmonth(col("ts")) > 15).as("in_b")),
        "event_type", "user_id", "in_a", "in_b")),

    // Gzip member metadata through the real JDK inflate with ISIZE
    // verification (the q313 three-way fixture shape).
    "q332_gzip_meta" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 180)
      val content = when(col("doc_id") % 3 === 0,
          unhex(lit(Multimodal.GzipFixture.hex)))
        .when(col("doc_id") % 3 === 1,
          concat(unhex(lit("1F8B08")), col("text").cast("binary")))
        .otherwise(col("text").cast("binary"))
      val media = d.select(col("doc_id").as("media_id"),
        content.as("content"))
      media.select(col("media_id"),
          Multimodal.sniffType(col("content")).as("kind"),
          length(col("content")).cast("long").as("n_bytes"))
        .join(Multimodal.gzipMeta(media, "media_id", "content"),
          Seq("media_id"), "left")
    }),

    // Wilcoxon signed-rank over organic length pairs (doc vs its
    // +250 partner, per source) — the paired companion to q267.
    "q333_signed_rank" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val b = d.select((col("doc_id") - 250L).as("doc_id"),
        col("n_chars").as("__y"))
      Profile.wilcoxonSignedRank(
        d.join(b, Seq("doc_id"))
          .select(col("source"),
            col("n_chars").cast("double").as("x"),
            col("__y").cast("double").as("y")),
        "source", "x", "y")
    }),

    // Cochran's Q over three deterministic rule filters on the SAME
    // docs — the k-way McNemar: do the filters differ per source?
    "q334_cochran_q" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val v = d.select(col("source"), col("doc_id"),
          lit("len").as("trt"), (col("n_chars") >= 300L).as("y"))
        .union(d.select(col("source"), col("doc_id"),
          lit("tok").as("trt"),
          (graft.functions.TextFunctions.tokenCount(col("text"))
            >= 55).as("y")))
        .union(d.select(col("source"), col("doc_id"),
          lit("par").as("trt"), (col("n_chars") % 2 === 0).as("y")))
      Profile.cochranQ(v, "source", "doc_id", "trt", "y")
    }),

    // Friedman + Kendall's W: do languages rank consistently by
    // character mass across sources (blocks = sources, treatments =
    // langs, value = per-cell char total)?
    "q335_friedman" -> ((s, dir) => {
      val cell = t(s, dir, "documents")
        .groupBy(col("source"), col("lang"))
        .agg(sum(col("n_chars")).as("v"))
        .select(lit("all").as("g"), col("source"), col("lang"),
          col("v").cast("double").as("v"))
      Profile.friedman(cell, "g", "source", "lang", "v")
    }),

    // Kruskal-Wallis: do the 5 languages draw document lengths from
    // one distribution, per source? (k-sample MW, tie-corrected.)
    "q336_kruskal_wallis" -> ((s, dir) =>
      Profile.kruskalWallis(
        t(s, dir, "documents").select(col("source"), col("lang"),
          col("n_chars").cast("double").as("v")),
        "source", "lang", "v")),

    // One-way ANOVA: does mean event value move by epoch day-of-week,
    // per event type? (The parametric twin of q336.)
    "q337_anova_f" -> ((s, dir) => {
      val e = t(s, dir, "events")
      Profile.anovaF(
        e.select(col("event_type"),
          pmod(expr("unix_micros(ts) div 86400000000") + lit(3L),
            lit(7L)).as("dow"),
          col("value")),
        "event_type", "dow", "value")
    }),

    // Brown-Forsythe: do the 5 languages share a length VARIANCE per
    // source? (Median-centered Levene - the homoscedasticity gate
    // before trusting q337's pooled variance.)
    "q338_brown_forsythe" -> ((s, dir) =>
      Profile.brownForsythe(
        t(s, dir, "documents").select(col("source"), col("lang"),
          col("n_chars").cast("double").as("v")),
        "source", "lang", "v")),

    // Murphy decomposition of the Brier score per event type: p from
    // the value (milli, clamped), outcome = the >=100 rule with a
    // deterministic 1-in-7 label flip so the calibration curve is
    // informative but not degenerate.
    "q339_brier" -> ((s, dir) => {
      val e = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("event_type"),
          least(greatest(round(col("value") * lit(5.0)).cast("long"),
            lit(0L)), lit(1000L)).as("p_milli"),
          when(col("event_id") % 7L === 0L, col("value") < 100.0)
            .otherwise(col("value") >= 100.0).as("y"))
      Profile.brierDecomposition(e, "event_type", "p_milli", "y")
    }),

    // Ljung-Box portmanteau over q271's ACF lags: is each event
    // type's value series white noise?
    "q340_ljung_box" -> ((s, dir) =>
      TimeSeries.ljungBox(t(s, dir, "events"), "event_type", "ts",
        "event_id", "value", maxLag = 5)),

    // Good-Turing frequency-of-frequencies: adjusted counts r* and
    // unseen mass P0 per source, count spectrum r <= 5.
    "q341_good_turing" -> ((s, dir) =>
      Corpus.goodTuring(t(s, dir, "documents"), "source", "text",
        maxR = 5)),

    // One Dawid-Skene EM iteration over q285's three deterministic
    // raters: per-rater sensitivity/specificity on the soft truth,
    // before and after the E-step re-score.
    "q342_dawid_skene" -> ((s, dir) =>
      Profile.dawidSkeneBinary(ratingsFixture(s, dir), "source",
        "item", "rater", "label", "pos")),

    // Rank-1 ALS over the (user, event_type, mean value) matrix: two
    // exact alternations, closed-form scalar updates, per-item fit.
    "q343_als_rank1" -> ((s, dir) => {
      val r = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("user_id"), col("event_type"),
          round(col("value") * lit(1e6)).cast("long").as("__vm"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(round(sum(col("__vm")).cast("double") /
          (lit(1000.0) * count(lit(1)).cast("double"))).cast("long")
          .as("r_milli"))
      Recsys.alsRank1(r, "user_id", "event_type", "r_milli",
        iters = 2, lambdaReg = 0.1)
    }),

    // AMS F2 sketch vs exact self-join size over document tokens per
    // source: 16 one-hash bit-signs, mean and median-of-means.
    "q344_ams_f2" -> ((s, dir) =>
      Sketches.amsF2(
        t(s, dir, "documents").select(col("source"),
          explode(graft.functions.TextFunctions.tokens(col("text")))
            .as("token")),
        "source", "token")),

    // Additive Holt-Winters per user series: period 7, 5-period
    // truncated kernel (q279's holt with a rotating seasonal block).
    "q345_holt_winters" -> ((s, dir) =>
      TimeSeries.holtWinters(
        t(s, dir, "events").select(col("user_id"), col("ts"),
          col("event_id"), col("value")),
        "user_id", "ts", "event_id", "value",
        alpha = 0.5, beta = 0.2, gamma = 0.6, period = 7,
        window = 35)),

    // Neighborhood function: exact pair census vs HyperBall (HLL
    // registers routed over edges) on a 2000-node hash graph, r <= 2.
    "q346_neighborhood" -> ((s, dir) => {
      def node(tag: String) = hashMod(tag, col("event_id"), 2000L)
      val e = t(s, dir, "events")
        .select(node("nfs").as("src"), node("nfd").as("dst"))
      val est = Graph.hyperBall(e, "src", "dst", maxR = 2)
        .groupBy(col("r")).agg(sum(col("reach_est")).as("est_sum"))
      Graph.neighborhoodFunction(e, "src", "dst", maxR = 2)
        .join(est, Seq("r"))
        .select(col("r"), col("n_pairs"), col("est_sum"),
          round(lit(1e6) * abs(col("est_sum").cast("double") -
            col("n_pairs").cast("double")) /
            col("n_pairs").cast("double")).cast("long")
            .as("err_micro"))
    }),

    // Harman S-stemmer census: plural-stripping collapse per source.
    "q347_sstem" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("source"),
          explode(graft.functions.TextFunctions.tokens(col("text")))
            .as("w"))
        .withColumn("stem",
          graft.functions.TextFunctions.sStem(col("w")))
      toks.groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("stem") =!= col("w"), 1L).otherwise(0L))
            .as("n_changed"),
          countDistinct(col("stem")).as("n_stems"))
    }),

    // Lexical richness per source: TTR, Yule's K, Simpson's D off
    // one token spectrum.
    "q348_lexical_richness" -> ((s, dir) =>
      Corpus.lexicalRichness(t(s, dir, "documents"), "source",
        "text")),

    // Randomized-response debias: bits flipped with known p = 1/4
    // (deterministic hash coin), true >=400-chars rate recovered
    // with the widened Wald CI.
    "q349_rand_response" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("source"),
          ((col("n_chars") >= 400L) =!=
            (hashMod("rr", col("doc_id"), 4L) === 0L)).as("obs"))
      Privacy.randomizedResponse(d, "source", "obs", flipProb = 0.25)
    }),

    // Mann-Kendall trend + Sen's slope per user value series:
    // exact pairwise sign census, tie-corrected 18*Var, low-median
    // slope in rank spacing, two-sided 5% verdict.
    "q350_mann_kendall" -> ((s, dir) =>
      TimeSeries.mannKendall(t(s, dir, "events"), "user_id", "ts",
        "event_id", "value", maxN = 512)),

    // Theil T/L inequality per event type over the shifted value
    // (value - 100 leaves a real mix of kept and quarantined rows).
    "q351_theil" -> ((s, dir) =>
      Profile.theilIndex(
        t(s, dir, "events").select(col("event_type"),
          (col("value") - lit(100.0)).as("v")),
        "event_type", "v")),

    // Dunning G^2 keyness of English vs non-English documents:
    // exact token censuses, one micro-rounding, integer-sign
    // direction.
    "q352_keyness" -> ((s, dir) =>
      Corpus.keyness(
        t(s, dir, "documents").select(col("text"),
          (col("lang") === "en").as("is_en")),
        "text", "is_en", minTotal = 20L)),

    // Chao1 + ACE unseen-vocabulary estimators per source, off the
    // token frequency-of-frequencies spectrum.
    "q353_chao1" -> ((s, dir) =>
      Corpus.chao1Ace(t(s, dir, "documents"), "source", "text")),

    // Wald-Wolfowitz runs test per event type: low-median
    // dichotomy, window-free run transitions, exact variance
    // polynomials into one sqrt.
    "q354_runs_test" -> ((s, dir) =>
      TimeSeries.runsTest(t(s, dir, "events"), "event_type", "ts",
        "event_id", "value")),

    // Bartlett equal-variance test of n_chars across languages per
    // source: per-arm quantized ln terms, exact cross-arm sums.
    "q355_bartlett" -> ((s, dir) =>
      Profile.bartlett(t(s, dir, "documents"), "source", "lang",
        "n_chars")),

    // Burrows' Delta stylometric distance between sources over the
    // top-50 marker tokens: dense rate grid, quantized z-scores.
    "q356_burrows_delta" -> ((s, dir) =>
      Corpus.burrowsDelta(t(s, dir, "documents"), "source", "text",
        topK = 50)),

    // Exact 1-NN within radius for every point (q174's fixture):
    // bounded one-row-per-point output, NULL for isolated points.
    "q357_nn_join" -> ((s, dir) => {
      def coord(axis: String) = hashMod(axis, col("event_id"), 1000000L)
      val pts = t(s, dir, "events").select(col("event_id").as("id"),
        coord("x").as("x"), coord("y").as("y"))
      Spatial.nnWithinRadius(pts, "id", "x", "y", radius = 5000)
    }),

    // Deterministic DBSCAN over the same point cloud: min-id
    // clusters from core-core components, border attach, noise.
    // eps keeps the sf0.1 bench density BELOW the continuum-
    // percolation threshold (mean degree ~2, not ~8): above it the
    // core graph fuses into ONE giant component whose min-label
    // propagation is the dominant cost — that regime needs a grid
    // pre-partition, not a bigger benchmark budget.
    "q358_dbscan" -> ((s, dir) => {
      def coord(axis: String) = hashMod(axis, col("event_id"), 1000000L)
      val pts = t(s, dir, "events").select(col("event_id").as("id"),
        coord("x").as("x"), coord("y").as("y"))
      Spatial.dbscan(pts, "id", "x", "y", eps = 2500, minPts = 3)
    }),

    // Markov removal-effect attribution over user journeys (q291's
    // data-driven sibling): 8-hop quantized value iteration, one
    // chain variant per removed channel.
    "q359_markov_attribution" -> ((s, dir) =>
      Sessionize.markovAttribution(t(s, dir, "events"), "user_id",
        "ts", "event_id", "event_type", conversionType = "purchase",
        iters = 8)),

    // Hurst exponent by rescaled-range analysis per event type:
    // exact w-scaled block deviations, fixed log-log OLS weights.
    "q360_hurst" -> ((s, dir) =>
      TimeSeries.hurstRS(t(s, dir, "events"), "event_type", "ts",
        "event_id", "value")),

    // Hodges-Lehmann shift + Cliff's delta of English vs non-English
    // document lengths per source: exact pairwise census, low-median
    // selection, one rounded divide.
    "q361_hodges_lehmann" -> ((s, dir) =>
      Profile.hodgesLehmann(
        t(s, dir, "documents").select(col("source"), col("n_chars"),
          (col("lang") === "en").as("is_en"), col("doc_id")),
        "source", "n_chars", "is_en", "doc_id", maxN = 512)),

    // Welch's heteroscedastic ANOVA of n_chars across languages per
    // source (q337's anovaF without the equal-variance assumption).
    "q362_welch_anova" -> ((s, dir) =>
      Profile.welchAnova(t(s, dir, "documents"), "source", "lang",
        "n_chars")),

    // Fisher's exact 2x2 (English x long-doc) per source: bounded
    // table enumeration, Stirling ln-factorials, nano-exact sums.
    "q363_fisher_exact" -> ((s, dir) =>
      Profile.fisherExact(
        t(s, dir, "documents").select(col("source"),
          (col("lang") === "en").as("is_en"),
          (col("n_chars") >= 400L).as("is_long")),
        "source", "is_en", "is_long")),

    // Quadkey tile census + prefix rollup over the point cloud:
    // integer bit-interleave keys, rollup from the census.
    "q364_quadkey" -> ((s, dir) => {
      def coord(axis: String) = hashMod(axis, col("event_id"), 1000000L)
      Spatial.quadkeyCensus(
        t(s, dir, "events").select(coord("x").as("x"),
          coord("y").as("y")),
        "x", "y", extent = 1000000L, levels = 4)
    }),

    // Moran's I spatial autocorrelation over the occupied 32x32
    // tiles: exact integer pair/variance sums, one rounded divide.
    "q365_morans_i" -> ((s, dir) => {
      def coord(axis: String) = hashMod(axis, col("event_id"), 1000000L)
      Spatial.moransI(
        t(s, dir, "events").select(coord("x").as("x"),
          coord("y").as("y")),
        "x", "y", extent = 1000000L, levels = 5)
    }),

    // Kendall's tau-b of quantity vs extended price per return flag:
    // maxN-bounded pair concordance, exact tie corrections.
    "q366_kendall_tau" -> ((s, dir) =>
      Ranking.kendallTau(
        t(s, dir, "lineitem").select(col("l_returnflag"),
          col("l_quantity"), col("l_extendedprice"),
          (col("l_orderkey") * lit(10L) + col("l_linenumber"))
            .as("rid")),
        "l_returnflag", "l_quantity", "l_extendedprice", "rid",
        maxN = 512)),

    // Partial correlation of quantity and price given discount per
    // return flag: one ten-sum pass, staged micro rounding.
    "q367_partial_corr" -> ((s, dir) =>
      Profile.partialCorr(t(s, dir, "lineitem"), "l_returnflag",
        "l_quantity", "l_extendedprice", "l_discount")),

    // Geary's C local-roughness twin of q365 on the same tiles.
    "q368_gearys_c" -> ((s, dir) => {
      def coord(axis: String) = hashMod(axis, col("event_id"), 1000000L)
      Spatial.gearysC(
        t(s, dir, "events").select(coord("x").as("x"),
          coord("y").as("y")),
        "x", "y", extent = 1000000L, levels = 5)
    }),

    // Newey-West HAC error bar on the mean event value per type:
    // exact Bartlett-kernel lag sums, iid bar alongside.
    "q369_newey_west" -> ((s, dir) =>
      TimeSeries.neweyWest(t(s, dir, "events"), "event_type", "ts",
        "event_id", "value", maxLag = 5)),

    // BH false-discovery-rate correction over q363's 20 Fisher
    // p-values: ranked step-up, suffix-min adjusted q, alpha 0.05.
    "q370_bh_fdr" -> ((s, dir) =>
      Profile.bhFdr(
        Profile.fisherExact(
          t(s, dir, "documents").select(col("source"),
            (col("lang") === "en").as("is_en"),
            (col("n_chars") >= 400L).as("is_long")),
          "source", "is_en", "is_long")
          .select(lit("all").as("grp"), col("source"),
            col("p_micro")),
        "grp", "source", "p_micro", alpha = 0.05)),

    // Fisher's method over the same 20 p-values: one chi-square on
    // 2m degrees of freedom from micro-nat ln sums.
    "q371_fisher_combine" -> ((s, dir) =>
      Profile.fisherCombine(
        Profile.fisherExact(
          t(s, dir, "documents").select(col("source"),
            (col("lang") === "en").as("is_en"),
            (col("n_chars") >= 400L).as("is_long")),
          "source", "is_en", "is_long")
          .select(lit("all").as("grp"), col("p_micro")),
        "grp", "p_micro")),

    // Seasonal/trend strength per event type off q300's STL table.
    "q372_seasonal_strength" -> ((s, dir) => {
      val series = t(s, dir, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day_idx"),
          round(col("value").cast("double") * lit(1e6)).cast("long")
            .as("v"))
        .groupBy(col("event_type"), col("day_idx"))
        .agg(sum(col("v")).as("y"))
      TimeSeries.seasonalStrength(series, "event_type", "day_idx",
        "y", period = 7)
    }),

    // Entropy rate of the behavior chain vs the marginal entropy.
    "q373_entropy_rate" -> ((s, dir) =>
      Sessionize.entropyRate(t(s, dir, "events"), "user_id", "ts",
        "event_id", "event_type")),

    // SAX word census per event type: integer z-milli breakpoints,
    // complete 5-point PAA blocks, 4-letter words.
    "q374_sax_words" -> ((s, dir) =>
      TimeSeries.saxWords(t(s, dir, "events"), "event_type", "ts",
        "event_id", "value", blockSize = 5, wordBlocks = 4)),

    // MMR diversified re-rank of the brute-force top-20: 5 greedy
    // rounds, candidate-pair cosines micro-rounded once.
    "q375_mmr_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cands = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", 20)
        .select(col("query_id"), col("neighbor_id").as("cand_id"),
          round(col("sim") * lit(1e6)).cast("long").as("rel_micro"))
      Similarity.mmrRerank(cands,
        Similarity.prepare(emb, "vec_id", "embedding"), "vec_id",
        k = 5, lambdaMilli = 700)
    }),

    // Item-kNN recommendations over the order x part basket: cosine
    // neighbors (k=10), similarity-sum scores, top-5 unseen parts.
    "q376_item_knn_recs" -> ((s, dir) =>
      Recsys.itemKnnRecommend(t(s, dir, "lineitem"), "l_orderkey",
        "l_partkey", kNbrs = 10, topN = 5, maxItemsPerActor = 16)),

    // Cox one-step hazard ratio between q245's cohorts: Breslow
    // score/information sums off the exact risk-set table.
    "q377_cox_hazard" -> ((s, dir) => {
      val lives = t(s, dir, "events").groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("__f"),
          max(to_date(col("ts"))).as("__l"))
        .select((col("user_id") % 3).as("cohort"),
          datediff(col("__l"), col("__f")).as("dur"),
          (col("__l") < lit("2024-01-25")).as("churned"))
      TimeSeries.coxScore(lives, "cohort", "dur", "churned", "0", "1")
    }),

    // Yuen trimmed-mean t of English vs non-English doc lengths per
    // source: integer rank trims, winsorized variances.
    "q378_yuen_test" -> ((s, dir) =>
      Profile.yuenTest(
        t(s, dir, "documents").select(col("source"), col("n_chars"),
          (col("lang") === "en").as("is_en"), col("doc_id")),
        "source", "n_chars", "is_en", "doc_id", trimMilli = 200)),

    // Cronbach alpha (KR-20) + ICC(1,1) over q285's rater fixture:
    // complete-case subjects, exact variance polynomials.
    "q379_rater_reliability" -> ((s, dir) =>
      Profile.raterReliability(
        ratingsFixture(s, dir).select(col("source"), col("item"),
          col("rater"),
          when(col("label") === "pos", 1L).otherwise(0L).as("y")),
        "source", "item", "rater", "y")),

    // Theil-Sen robust price-per-quantity line per return flag:
    // median pairwise slope + median residual intercept.
    "q380_theil_sen" -> ((s, dir) =>
      TimeSeries.theilSen(
        t(s, dir, "lineitem").select(col("l_returnflag"),
          col("l_quantity"), col("l_extendedprice"),
          (col("l_orderkey") * lit(10L) + col("l_linenumber"))
            .as("rid")),
        "l_returnflag", "l_quantity", "l_extendedprice", "rid",
        maxN = 512)),

    // Anderson-Darling two-sample test of English vs non-English
    // doc lengths per source: exact pooled-rank terms, tail weights.
    "q381_anderson_darling" -> ((s, dir) =>
      Profile.andersonDarling(
        t(s, dir, "documents").select(col("source"), col("n_chars"),
          (col("lang") === "en").as("is_en"), col("doc_id")),
        "source", "n_chars", "is_en", "doc_id")),

    // NSW graph-ANN index build: per-IVF-cell kNN (degree 6)
    // symmetrized — the navigable edge list q383's beam search walks.
    "q382_nsw_build" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val index = Similarity.ivfIndex(emb, "vec_id", "embedding", 16)
      Similarity.nswBuild(index, "vec_id", degree = 6)
    }),

    // ANN recall for the graph (NSW) path: greedy beam search from
    // 3 centroid seeds, beam 4, 2 expansion rounds, against the
    // exact ground truth — the sixth recall-gated ANN family, same
    // composition as q124/q130/q131.
    "q383_nsw_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
      val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
      val index = Similarity.ivfIndex(emb, "vec_id", "embedding",
        nCentroids = 16, centroids0 = Some(cents))
      val graph = Similarity.nswBuild(index, "vec_id", degree = 6)
      val nsw = Similarity.nswSearch(graph, index, cents, queries,
        "vec_id", "embedding", k = 10, nSeeds = 3, beam = 4, rounds = 2)
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", 10)
      Similarity.recallAtK(exact, nsw)
    }),

    // Rolling Mann-Kendall drift pager (batch side of the
    // TrendStream parity pair): full-window MK S at every sample
    // over the trailing 16, via the pair delta-prefix construction.
    "q384_rolling_mk" -> ((s, dir) => rollingMkGate(s, dir)),

    // (The r17 q384a-c column-isolating diagnostic gates were
    // retired in r18 once the driver went hash-green — VERDICT r17
    // task 2. The decimal-output lint and the ScalaTest locks on the
    // rollingMk column groups remain.)

    // Jarque-Bera normality per event type: four exact milli power
    // sums, one mirrored moment chain, chi2_2 5% literal.
    "q385_jarque_bera" -> ((s, dir) =>
      Profile.jarqueBera(t(s, dir, "events"), "event_type", "value")),

    // Mood's median test across event types: global low median,
    // 2xk margin chi2.
    "q386_moods_median" -> ((s, dir) =>
      Profile.moodsMedian(t(s, dir, "events"), "event_type", "value")),

    // Weighted Slope One over (user, event_type) mean-value ratings:
    // predictions for every user x unrated-type with a bridge. The
    // event_id % 11 sample keeps ~6 events/user so real rating
    // sparsity exists (the full table rates every type for everyone).
    "q387_slope_one" -> ((s, dir) =>
      Recsys.slopeOne(t(s, dir, "events")
          .filter(col("event_id") % 11L === 0L)
          .select(col("user_id"), col("event_type"), col("value")),
        "user_id", "event_type", "value", maxItemsPerActor = 5)),

    // ESD-style iterative outlier census: 3 rounds per event type,
    // exact integer argmax, fixed G cut 2.0.
    "q388_esd_outliers" -> ((s, dir) =>
      Profile.esdOutliers(t(s, dir, "events"), "event_type",
        "event_id", "value", rounds = 3, gCutMicro = 2000000L)),

    // DFT periodogram per user series: 6 frequency bins, reduced
    // integer angles, micro-quantized cos/sin terms.
    "q389_periodogram" -> ((s, dir) =>
      TimeSeries.periodogram(t(s, dir, "events"), "user_id", "ts",
        "event_id", "value", maxK = 6)),

    // Partial correlation of quantity and price given discount, per
    // return flag: nine exact milli sums, one mirrored finish.
    "q390_partial_corr" -> ((s, dir) =>
      Profile.partialCorrelation(t(s, dir, "lineitem"),
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount")),

    // Cramer's V association of document source x language: full-grid
    // chi2 (empty cells count) + effect size.
    "q391_cramers_v" -> ((s, dir) =>
      Profile.cramersV(t(s, dir, "documents"), "source", "lang")),

    // Jonckheere-Terpstra ordered trend: does l_quantity rise with
    // the l_linenumber "dose" (1..7) — doubled pair-U machinery.
    "q392_jonckheere" -> ((s, dir) =>
      Profile.jonckheereTerpstra(
        t(s, dir, "lineitem").select(col("l_linenumber"),
          col("l_quantity")),
        "l_linenumber", "l_quantity")),

    // Method-of-moments gamma/log-normal fits per event type off
    // exact milli power and micro-nat log sums.
    "q393_moment_fit" -> ((s, dir) =>
      Profile.momentFit(t(s, dir, "events"), "event_type", "value")),

    // Distinct-3-gram diversity per source: self-repetition census.
    "q394_distinct_ngrams" -> ((s, dir) =>
      Corpus.distinctNgrams(t(s, dir, "documents"), "source", "text",
        n = 3)),

    // Propensity caliper matching: even users "treated", score =
    // value/200, nearest control within 0.05 (with replacement).
    "q395_ps_match" -> ((s, dir) =>
      Profile.psMatch(t(s, dir, "events")
          .select(col("event_id"), (col("user_id") % 2 === 0).as("t"),
            (col("value") / lit(200.0)).as("score")),
        "event_id", "t", "score", caliper = 0.05)),

    // Difference-in-differences on a deterministic 2x2: arm = even
    // user, post = event_id % 3 = 0.
    "q396_diff_in_diff" -> ((s, dir) =>
      Profile.diffInDiff(t(s, dir, "events")
          .select((col("user_id") % 2 === 0).as("arm"),
            (col("event_id") % 3 === 0).as("post"), col("value")),
        "arm", "post", "value")),

    // Hajek-stabilized IPW ATE: deterministic propensity
    // (user_id % 10 + 1)/20 in [0.1, 0.5], treated = even users.
    "q397_ipw_ate" -> ((s, dir) =>
      Profile.ipwAte(t(s, dir, "events")
          .select((col("user_id") % 2 === 0).as("t"),
            ((col("user_id") % 10 + 1).cast("double") / lit(20.0))
              .as("e"),
            col("value")),
        "t", "e", "value")),

    // Banded range join: milli values into 60 overlapping bands —
    // every (point, band) containment, one emission each.
    "q398_range_join" -> ((s, dir) => {
      val pts = t(s, dir, "events").select(col("event_id"),
        round(col("value").cast("double") * lit(1e3)).cast("long")
          .as("v"))
      val bands = s.range(60).select(col("id").as("band_id"),
        (col("id") * 5000L).as("lo"),
        (col("id") * 5000L + 12000L).as("hi"))
      Interval.rangeJoin(pts, "event_id", "v", bands, "band_id",
        "lo", "hi", bucketWidth = 16000L)
    }),

    // Interval overlap join: per-(user, day) activity windows,
    // same-day co-presence pairs with overlap length.
    "q399_overlap_join" -> ((s, dir) => {
      val iv = t(s, dir, "events")
        .groupBy(col("user_id"),
          expr("unix_millis(ts) div 86400000").as("day"))
        .agg(min(unix_millis(col("ts"))).as("lo"),
          max(unix_millis(col("ts"))).as("hi"))
        .select((col("user_id") * 100000L + col("day")).as("iid"),
          col("lo"), col("hi"))
      Interval.overlapJoin(iv, "iid", "lo", "hi",
          iv, "iid", "lo", "hi", bucketWidth = 86400000L)
        .filter(col("a_id") < col("b_id"))
    }),

    // WARC shard extraction — Content-Length-driven record walk over
    // the per-source crawl fixture: a warcinfo record then one
    // response/resource record per doc; response records peel their
    // HTTP envelope (status + body), other blocks pass through.
    "q400_warc_parse" -> ((s, dir) =>
      Warc.parseWarc(warcShards(s, dir), "source", "warc")
        .select(col("source"), col("rec_idx"), col("warc_type"),
          col("target_uri"), col("record_id"), col("content_length"),
          col("http_status"),
          length(col("body")).cast("long").as("body_chars"),
          md5(col("body")).as("body_md5"))),

    // Byte-mode WARC walk (the ISO 28500 contract for real crawl
    // shards): same shard shape as q400 but Content-Length counts
    // OCTETS and every body carries multi-byte UTF-8, so a
    // char-counting walk would mis-offset every record after the
    // first. The oracle is generative (it rebuilds the expected rows
    // from the same doc residues); the Spark side must actually
    // re-split the concatenated BINARY shard to reproduce them,
    // which oracle-locks Warc.parseShardBytes' octet arithmetic.
    "q439_warc_bytes" -> ((s, dir) =>
      Warc.parseWarcBytes(warcByteShards(s, dir), "source", "warc")
        .select(col("source"), col("rec_idx"), col("warc_type"),
          col("target_uri"), col("record_id"), col("content_length"),
          col("http_status"),
          length(col("body")).cast("long").as("body_bytes"),
          md5(col("body")).as("body_md5"))),

    // Fleiss' kappa per event type: items = users, m = the modal
    // per-user rating count, categories = value-milli % 3 — the
    // multi-judge agreement census, with the uniform-m quarantine
    // exercised hard by the naturally ragged per-user event counts.
    "q440_fleiss_kappa" -> ((s, dir) =>
      Profile.fleissKappa(t(s, dir, "events")
          .select(col("event_type"), col("user_id"),
            (abs(round(col("value").cast("double") * lit(1e3))
              .cast("long")) % 3).as("cat")),
        "event_type", "user_id", "cat")),

    // Matthews correlation per event type for the residue-keyed
    // (pred, label) pair — the imbalance-proof classifier number,
    // exact sign·clamped-isqrt micro.
    "q441_matthews" -> ((s, dir) =>
      Profile.matthewsCorr(t(s, dir, "events")
          .select(col("event_type"),
            (col("event_id") % 3 === 0).as("p"),
            ((col("user_id") + col("event_id")) % 2 === 0).as("y")),
        "event_type", "p", "y")),

    // Youden's J optimal threshold over the same melted features as
    // the q402 stump — TPR−FPR election on the exact integer
    // numerator (shared denominator per feature), ties to the
    // lowest threshold.
    "q442_youden_j" -> ((s, dir) =>
      Profile.youdenJ(meltedEvents(s, dir), "feature", "v", "y")),

    // Siegel-Tukey dispersion test per event type: even-vs-odd user
    // arms, alternating-extreme ranks, exact Wilcoxon-null z.
    "q443_siegel_tukey" -> ((s, dir) =>
      Profile.siegelTukey(t(s, dir, "events")
          .select(col("event_type"), col("value"),
            (col("user_id") % 2 === 0).as("arm"), col("event_id")),
        "event_type", "value", "arm", "event_id")),

    // Cuzick trend per event type: dose = user_id % 4 against the
    // value response — doubled pooled midranks, exact permutation
    // variance, clamped-isqrt z.
    "q445_cuzick" -> ((s, dir) =>
      Profile.cuzickTrend(t(s, dir, "events")
          .select(col("event_type"), (col("user_id") % 4).as("dose"),
            col("value")),
        "event_type", "dose", "value")),

    // End-to-end "corpus v2 refresh" (VERDICT r17 #8) — the whole
    // maintenance loop a training corpus runs per crawl drop, in TWO
    // atomic txns against one ManifestTable base. Txn 1 lands v1:
    // corpus (doc_id % 5 = 0), its per-source rollup, and the IVF
    // cell index, one commit. The batch (the other 4/5) then runs
    // the refresh legs: dedupIncrement against the corpus AS LANDED
    // (read back from the table, not the input frame), ruleFilter
    // quality gate, rollup DELTA folded into the v1 rollup state
    // (incremental maintenance — the corpus is never re-aggregated),
    // and the survivors' vectors assigned under the FROZEN v1
    // centroids (index maintenance without re-clustering). Txn 2
    // commits all three tables atomically (appends + rollup
    // snapshot); the change feed v1→v2 then prices what landed.
    // Output: one row per source stitching all four legs — rollup
    // state, CDF insert count, index census — so a fault in the
    // dedup, the filter, the txn machinery, the CDF reconstruction,
    // the rollup fold, or the cell assignment all hash-mismatch.
    "q446_corpus_refresh" -> ((s, dir) => {
      import graft.sources.ManifestTable
      val base = scratchDir("graft-q446")
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      val emb = t(s, dir, "embeddings")
      val landed = docs.filter(col("doc_id") % 5 === 0)
      val batch = docs.filter(col("doc_id") % 5 =!= 0)
      def rollupOf(d: DataFrame) = d.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col("text")).cast("long"))
          .as("n_tokens"))
      val embLanded = emb.join(
        landed.select(col("doc_id").as("vec_id")), Seq("vec_id"))
      val cents = Similarity.ivfCentroids(
        embLanded, "vec_id", "embedding", 16)
      val idx1 = Similarity.ivfIndex(
          embLanded, "vec_id", "embedding", 16, Some(cents))
        .select(col("vec_id"), col("cell"))
      ManifestTable.commitMulti(s, base, "v1", snapshots = Map(
        "corpus" -> landed, "rollup" -> rollupOf(landed),
        "ann" -> idx1)) // version 1
      val corpus1 = ManifestTable.read(s, base, "corpus")
      val surv = batch
        .join(Dedup.dedupIncrement(batch, corpus1, "doc_id", "text")
          .filter(col("keep")).select(col("doc_id")), Seq("doc_id"))
        .join(Training.ruleFilter(batch, "doc_id", "text")
          .filter(col("keep")).select(col("doc_id")), Seq("doc_id"))
      val rollup2 = ManifestTable.read(s, base, "rollup")
        .unionByName(rollupOf(surv))
        .groupBy(col("source")).agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"))
      val idxAdd = Similarity.ivfIndex(
          emb.join(surv.select(col("doc_id").as("vec_id")),
            Seq("vec_id")),
          "vec_id", "embedding", 16, Some(cents))
        .select(col("vec_id"), col("cell"))
      ManifestTable.commitMulti(s, base, "v2",
        appends = Map("corpus" -> surv, "ann" -> idxAdd),
        snapshots = Map("rollup" -> rollup2)) // version 2
      val added = ManifestTable
        .tableChanges(s, base, "corpus", 1L, 2L, netOnly = true)
        .filter(col("_change_type") === "insert")
        .groupBy(col("source")).agg(count(lit(1)).as("n_added"))
      val annCensus = ManifestTable.read(s, base, "ann")
        .join(docs.select(col("doc_id").as("vec_id"), col("source")),
          Seq("vec_id"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_indexed"),
          countDistinct(col("cell")).as("n_cells"))
      ManifestTable.read(s, base, "rollup")
        .join(added, Seq("source"), "left")
        .join(annCensus, Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("n_tokens"),
          coalesce(col("n_added"), lit(0L)).as("n_added"),
          coalesce(col("n_indexed"), lit(0L)).as("n_indexed"),
          coalesce(col("n_cells"), lit(0L)).as("n_cells"))
    }),

    // Quadratic-weighted kappa between the cents-residue "human"
    // rating and a noisy +1-clamped "model" rating — the ordinal
    // judge-calibration number as one exact rational.
    "q444_quadratic_kappa" -> ((s, dir) => {
      val cents = abs(round(col("value").cast("double") * lit(1e2))
        .cast("long"))
      Profile.quadraticKappa(t(s, dir, "events")
          .select((cents % 5).as("a"),
            least(cents % 5 +
              when(col("event_id") % 3 === 0, 1L).otherwise(0L),
              lit(4L)).as("b")),
        "a", "b")
    }),

    // Apriori depth-3 market-basket rules over order baskets (items
    // = part residues): every {x,y} -> z with support >= 5,
    // confidence and lift as exact integer micros.
    "q401_assoc_rules" -> ((s, dir) =>
      Recsys.assocRules(t(s, dir, "lineitem")
          .select(col("l_orderkey"),
            (col("l_partkey") % 50).as("item")),
        "l_orderkey", "item", minSup = 5L, maxItemsPerBasket = 16)),

    // CART root stump per melted event feature against the
    // (user+event parity) label: best Gini threshold, its gain, and
    // the left-split census.
    "q402_decision_stump" -> ((s, dir) => stumpGate(s, dir)),

    // (The r17 q402a-c diagnostic gates were retired in r18 with the
    // q384a-c trio — driver hash-green, VERDICT r17 task 2.)

    // Durbin-Watson on the per-type value-vs-time OLS residuals:
    // serial correlation of what the trend line leaves behind.
    "q403_durbin_watson" -> ((s, dir) =>
      Profile.durbinWatson(t(s, dir, "events")
          .select(col("event_type"),
            expr("unix_millis(ts)").as("ord"), col("event_id"),
            col("value")),
        "event_type", "ord", "event_id", "value")),

    // Chow structural-break F per event type: did value-vs-day
    // change slope/level between even and odd days.
    "q404_chow" -> ((s, dir) =>
      Profile.chowTest(t(s, dir, "events")
          .select(col("event_type"),
            (expr("unix_millis(ts) div 86400000") % 2 === 0)
              .as("seg"),
            expr("unix_millis(ts) div 86400000").cast("double")
              .as("day"),
            col("value")),
        "event_type", "seg", "day", "value")),

    // Cochran-Armitage dose trend: does P(quantity > 25) rise with
    // the line number, per return flag.
    "q405_cochran_armitage" -> ((s, dir) =>
      Profile.cochranArmitage(t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_linenumber"),
            (col("l_quantity") > 25.0).as("hi")),
        "l_returnflag", "l_linenumber", "hi")),

    // Ansari-Bradley scale test: do even/odd users differ in value
    // DISPERSION (not location) within each event type.
    "q406_ansari_bradley" -> ((s, dir) =>
      Profile.ansariBradley(t(s, dir, "events")
          .select(col("event_type"), col("value"),
            (col("user_id") % 2 === 0).as("side")),
        "event_type", "value", "side")),

    // Cramer-von Mises whole-CDF drift between open and closed line
    // statuses per return flag — catches spread-out departures KS'
    // single max misses.
    "q407_cramer_von_mises" -> ((s, dir) =>
      Profile.cramerVonMises(t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice"),
            (col("l_linestatus") === "O").as("side")),
        "l_returnflag", "l_extendedprice", "side")),

    // Kuiper V per event type: direction-aware ECDF drift between
    // even and odd event ids (D+ + D-).
    "q408_kuiper" -> ((s, dir) =>
      Profile.kuiper(t(s, dir, "events")
          .select(col("event_type"), col("value"),
            (col("event_id") % 2 === 0).as("side")),
        "event_type", "value", "side")),

    // Page trend over users x event types: do per-user milli-value
    // totals rise monotonically in event-type order (complete
    // blocks only; incomplete users censused).
    "q409_page_trend" -> ((s, dir) =>
      Profile.pageTrend(t(s, dir, "events")
          .filter(col("value").isNotNull)
          .groupBy(col("user_id"), col("event_type"))
          .agg(sum(round(col("value").cast("double") * lit(1e3))
            .cast("long")).as("sv"))
          .select(lit("all").as("g"), col("user_id"),
            col("event_type"), col("sv").cast("double").as("sv")),
        "g", "user_id", "event_type", "sv")),

    // Brunner-Munzel: rank-Welch between even and odd users per
    // event type — P(X<Y) estimate + variance-honest studentized W.
    "q410_brunner_munzel" -> ((s, dir) =>
      Profile.brunnerMunzel(t(s, dir, "events")
          .select(col("event_type"), col("value"),
            (col("user_id") % 2 === 0).as("side")),
        "event_type", "value", "side")),

    // Exact average precision of value as a retrieval score for the
    // rare (user_id % 7 = 0) positives, per event type; ties break
    // by (score desc, event_id asc) -- stated total order.
    "q411_average_precision" -> ((s, dir) =>
      Ranking.averagePrecision(t(s, dir, "events")
          .select(col("event_type"), col("event_id"), col("value"),
            (col("user_id") % 7 === 0).as("y")),
        "event_type", "event_id", "value", "y")),

    // Dickey-Fuller unit-root test per event type: is value a
    // mean-reverting series or a random walk in time order.
    "q412_dickey_fuller" -> ((s, dir) =>
      TimeSeries.dickeyFuller(t(s, dir, "events")
          .select(col("event_type"),
            expr("unix_millis(ts)").as("ord"), col("event_id"),
            col("value")),
        "event_type", "ord", "event_id", "value")),

    // Energy distance between even/odd users' value distributions
    // per event type: distance-weighted two-sample drift.
    "q413_energy_distance" -> ((s, dir) =>
      Profile.energyDistance(t(s, dir, "events")
          .select(col("event_type"), col("value"),
            (col("user_id") % 2 === 0).as("side")),
        "event_type", "value", "side")),

    // Binned TV / Bhattacharyya / Hellinger drift trio between
    // even/odd event ids per event type (20-unit value bins).
    "q414_hist_distances" -> ((s, dir) =>
      Profile.histDistances(t(s, dir, "events")
          .select(col("event_type"), col("value"),
            (col("event_id") % 2 === 0).as("side")),
        "event_type", "value", "side", binWidthMilli = 20000L)),

    // Nelson-Aalen cumulative hazard over the q244 user lifetimes:
    // the additive twin of the Kaplan-Meier curve.
    "q415_nelson_aalen" -> ((s, dir) => {
      val lives = t(s, dir, "events").groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("__f"),
          max(to_date(col("ts"))).as("__l"))
        .select((col("user_id") % 3).as("cohort"),
          datediff(col("__l"), col("__f")).as("dur"),
          (col("__l") < lit("2024-01-25")).as("churned"))
      TimeSeries.nelsonAalen(lives, "cohort", "dur", "churned")
    }),

    // KPSS level-stationarity per event type (Bartlett lags 1..4) —
    // the null-stationary complement of q412's Dickey-Fuller.
    "q416_kpss" -> ((s, dir) =>
      TimeSeries.kpss(t(s, dir, "events"), "event_type", "ts",
        "event_id", "value", maxLag = 4)),

    // Cucconi joint location-scale test between event_id residue
    // classes per event type.
    "q417_cucconi" -> ((s, dir) =>
      Profile.cucconi(t(s, dir, "events")
          .select(col("event_type"), col("value"),
            (col("event_id") % 3 === 0).as("side")),
        "event_type", "value", "side")),

    // WAT-style metadata extraction: WARC metadata records whose
    // blocks are JSON envelopes -> (uri, n_links, title) — the
    // Common Crawl WAT shape, composing q400's parser with the JSON
    // path functions.
    "q418_wat_extract" -> ((s, dir) =>
      Warc.parseWarc(watShards(s, dir), "source", "warc")
        .filter(col("warc_type") === "metadata")
        .select(col("source"), col("rec_idx"),
          get_json_object(col("body"), "$.uri").as("uri"),
          get_json_object(col("body"), "$.links").cast("long")
            .as("n_links"),
          get_json_object(col("body"), "$.ttl").as("title"))),

    // Hill tail index over the top-51 values per event type: how
    // heavy is the value tail (alpha <= 2 = infinite variance).
    "q419_hill_tail" -> ((s, dir) =>
      Profile.hillTail(t(s, dir, "events"), "event_type", "event_id",
        "value", k = 50)),

    // Gumbel method-of-moments fit per event type — the
    // extreme-value companion of q393's gamma/log-normal fits.
    "q420_gumbel_fit" -> ((s, dir) =>
      Profile.gumbelFit(t(s, dir, "events"), "event_type", "value")),

    // Fellegi-Sunter EM over consecutive-customer comparison
    // vectors: which field agreements actually signal a match
    // (m/u rates + prior, two micro-rounded EM rounds).
    "q421_fellegi_sunter" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val a = c.select(col("c_custkey").as("k"),
        col("c_nationkey").as("na"), col("c_mktsegment").as("sa"),
        (col("c_acctbal") > 0).as("ba"),
        (length(col("c_name")) % 3).as("la"))
      val b = c.select((col("c_custkey") - 1).as("k"),
        col("c_nationkey").as("nb"), col("c_mktsegment").as("sb"),
        (col("c_acctbal") > 0).as("bb"),
        (length(col("c_name")) % 3).as("lb"))
      val pairs = a.join(b, Seq("k"))
        .select(lit("all").as("g"),
          (col("na") === col("nb")).as("nation_eq"),
          (col("sa") === col("sb")).as("seg_eq"),
          (col("ba") === col("bb")).as("bal_eq"),
          (col("la") === col("lb")).as("name_eq"))
      Linkage.fellegiSunterEm(pairs, "g",
        Seq("nation_eq", "seg_eq", "bal_eq", "name_eq"))
    }),

    // Lepage joint location-scale page between user_id residue
    // classes per event type: z_W^2 + z_AB^2 against the chi2(2)
    // 5% cut.
    "q422_lepage" -> ((s, dir) =>
      Profile.lepage(t(s, dir, "events")
          .select(col("event_type"), col("value"),
            (col("user_id") % 4 === 0).as("side")),
        "event_type", "value", "side")),

    // Restricted mean survival time to day 20 off the q244 KM
    // curves: average days retained out of the first 20, per cohort.
    "q423_rmst" -> ((s, dir) => {
      val lives = t(s, dir, "events").groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("__f"),
          max(to_date(col("ts"))).as("__l"))
        .select((col("user_id") % 3).as("cohort"),
          datediff(col("__l"), col("__f")).as("dur"),
          (col("__l") < lit("2024-01-25")).as("churned"))
      TimeSeries.rmst(
        TimeSeries.kaplanMeier(lives, "cohort", "dur", "churned"),
        "cohort", tau = 20L)
    }),

    // Multi-layer HNSW build: deterministic hash-geometric levels
    // (div 4, max layer 2), per-layer cell-kNN graphs (degree 6)
    // over layer-local IVF indexes — the seventh ANN family's index
    // (q382's flat NSW gains the coarse-to-fine descent layers).
    "q424_hnsw_build" -> ((s, dir) =>
      Similarity.hnswBuild(t(s, dir, "embeddings"), "vec_id",
        "embedding", nCells = 16, degree = 6, layerDiv = 4,
        maxLayer = 2)),

    // HNSW recall: greedy descent from the top layer's centroids
    // (beam 8, 3 rounds per layer — the swept ef that beats the flat
    // q383 NSW gate's 0.755 mean recall at sf0.01 with 0.765) vs
    // exact brute force; the spec additionally asserts hnsw >= flat
    // at an EQUAL beam/round budget on a clustered corpus.
    "q425_hnsw_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
      val graph = Similarity.hnswBuild(emb, "vec_id", "embedding",
        nCells = 16, degree = 6, layerDiv = 4, maxLayer = 2)
      // beam 8, 2 rounds/layer (r17: was 3 — the third round found
      // no recall at gate scale and cost ~1/3 of the slowest-gate
      // wall clock; the oracle mirrors the same budget).
      val hnsw = Similarity.hnswSearch(graph, emb, queries, "vec_id",
        "embedding", nCells = 16, layerDiv = 4, maxLayer = 2, k = 10,
        beam = 8, roundsPerLayer = 2)
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", 10)
      Similarity.recallAtK(exact, hnsw)
    }),

    // Pettitt rank changepoint per user series: U_t curve from ONE
    // midrank prefix (U_t = t(n+1) - prefix(r2)), argmax |U| with
    // earliest-t ties — all integer keys (the r16 argmin discipline).
    "q426_pettitt" -> ((s, dir) =>
      TimeSeries.pettitt(t(s, dir, "events"), "user_id", "ts",
        "event_id", "value")),

    // Turning-point randomness test per user series: strict local
    // extrema census off two rank self-joins, exact-integer z via
    // the clamped isqrt (4e13·d^2 div (16n-29)).
    "q427_turning_point" -> ((s, dir) =>
      TimeSeries.turningPoint(t(s, dir, "events"), "user_id", "ts",
        "event_id", "value")),

    // Cox-Stuart fold-at-middle sign trend per user series: exact
    // binomial z (4e12·d^2 div n_eff), ties dropped.
    "q428_cox_stuart" -> ((s, dir) =>
      TimeSeries.coxStuart(t(s, dir, "events"), "user_id", "ts",
        "event_id", "value")),

    // Bartels rank von Neumann ratio per user series: doubled-
    // midrank consecutive-difference census, exact half-up micro.
    "q429_bartels_rank" -> ((s, dir) =>
      TimeSeries.bartelsRank(t(s, dir, "events"), "user_id", "ts",
        "event_id", "value")),

    // Goodman-Kruskal gamma: line number (order position) vs
    // quantity decile-bucket per return flag — ordinal association
    // off the contingency cells, exact integer pair algebra.
    "q430_gk_gamma" -> ((s, dir) =>
      Profile.goodmanKruskalGamma(
        t(s, dir, "lineitem").select(col("l_returnflag"),
          col("l_linenumber").as("x"),
          floor(col("l_quantity") / lit(10.0)).as("y")),
        "l_returnflag", "x", "y")),

    // Grubbs max-outlier statistic per event type: exact integer
    // G via D = max|n*v - sum| and the clamped isqrt.
    "q431_grubbs" -> ((s, dir) =>
      Profile.grubbs(t(s, dir, "events"), "event_type", "value")),

    // Kendall's W rater concordance per event type: raters = user
    // residue classes, items = event-id residues, one deterministic
    // value per (rater, item) via min() so blocks are complete.
    "q432_kendall_w" -> ((s, dir) =>
      Profile.kendallW(
        t(s, dir, "events")
          .groupBy(col("event_type"), (col("user_id") % 5).as("rater"),
            (col("event_id") % 8).as("item"))
          .agg(min(col("value")).as("v")),
        "event_type", "rater", "item", "v")),

    // Mood scale test per event type: did the user-parity split move
    // the SPREAD - doubled pooled midranks, exact two-step floor + z.
    "q433_mood_scale" -> ((s, dir) =>
      Profile.moodScale(
        t(s, dir, "events")
          .withColumn("side", col("user_id") % 2 === 0),
        "event_type", "value", "side")),

    // Permutation entropy (m=3) per user series: ordinal-pattern
    // census complexity in micro-nats.
    "q434_perm_entropy" -> ((s, dir) =>
      TimeSeries.permutationEntropy(t(s, dir, "events"), "user_id",
        "ts", "event_id", "value")),

    // Spectral entropy per user series: Shannon entropy of the
    // q389 periodogram's normalized bin powers — pure tone 0,
    // flat noise ln(bins).
    "q435_spectral_entropy" -> ((s, dir) =>
      TimeSeries.spectralEntropy(t(s, dir, "events"), "user_id",
        "ts", "event_id", "value", maxK = 6)),

    // Dixon's Q small-sample outlier ratios per event type: gap
    // over range from exact order statistics, duplicates honored.
    "q436_dixon_q" -> ((s, dir) =>
      Profile.dixonQ(t(s, dir, "events"), "event_type", "value")),

    // Sample entropy (m=2, r=0.5) per user series: canonical
    // Richman-Moorman pair census over the first 256 samples.
    "q437_sample_entropy" -> ((s, dir) =>
      TimeSeries.sampleEntropy(t(s, dir, "events"), "user_id", "ts",
        "event_id", "value", rMilli = 500L, maxN = 256)),

    // Quade weighted-blocks test per event type: blocks = user
    // residues, treatments = event-id residues, one deterministic
    // value per cell via min() so blocks complete; fully integer F.
    "q438_quade" -> ((s, dir) =>
      Profile.quade(
        t(s, dir, "events")
          .groupBy(col("event_type"), (col("user_id") % 7).as("blk"),
            (col("event_id") % 3).as("trt"))
          .agg(min(col("value")).as("v")),
        "event_type", "blk", "trt", "v"))
  )

  /** q400's crawl-shard fixture: one WARC string per document source
    * — a warcinfo record, then one response/resource record per doc
    * (doc_id % 7 = 0, CRs scrubbed and text ASCII so the oracle's
    * boundary-split replay is sound; the Spark parser itself is
    * Content-Length-driven and needs no such guarantee — WarcSpec
    * feeds it payloads containing `WARC/1.0`). Mirrored verbatim in
    * the q400 oracle. */
  private def warcShards(s: SparkSession, dir: String): DataFrame = {
    val crlf = "\r\n"
    val d = t(s, dir, "documents").filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("source"),
        regexp_replace(substring(col("text"), 1, 400), "\\r", " ")
          .as("txt"))
    val status = when(col("doc_id") % 5 === 0, lit("404 Not Found"))
      .otherwise(lit("200 OK"))
    val isResource = col("doc_id") % 3 === 0
    val block = when(isResource, col("txt"))
      .otherwise(concat(lit("HTTP/1.1 "), status,
        lit(crlf + "Content-Type: text/plain" + crlf + crlf),
        col("txt")))
    val typ = when(isResource, lit("resource"))
      .otherwise(lit("response"))
    val rec = concat(lit("WARC/1.0" + crlf + "WARC-Type: "), typ,
      lit(crlf + "WARC-Target-URI: https://"), col("source"),
      lit(".example.com/doc/"), col("doc_id").cast("string"),
      lit(crlf + "WARC-Record-ID: <urn:uuid:"),
      col("doc_id").cast("string"),
      lit(">" + crlf + "Content-Length: "),
      length(block).cast("string"), lit(crlf + crlf), block,
      lit(crlf + crlf))
    val info = concat(lit("software: graft/0.1\nisPartOf: "),
      col("source"))
    d.select(col("source"), col("doc_id"), rec.as("__rec"))
      .groupBy(col("source"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("doc_id").as("k"),
          col("__rec").as("r")))), x => x.getField("r")), "")
        .as("__body"))
      .select(col("source"),
        concat(
          lit("WARC/1.0" + crlf + "WARC-Type: warcinfo" + crlf +
            "WARC-Record-ID: <urn:uuid:shard-"), col("source"),
          lit(">" + crlf + "Content-Length: "),
          length(info).cast("string"), lit(crlf + crlf), info,
          lit(crlf + crlf), col("__body")).as("warc"))
  }

  /** q439's byte-mode WARC fixture: same shard shape as
    * [[warcShards]] but Content-Length counts OCTETS (ISO 28500 §5,
    * reference: src/collector.py's raw-capture path) and every body
    * starts with multi-byte UTF-8 ('Ünïcødé§' + a π✓ run keyed on
    * doc_id), so char-counted offsets would drift off every
    * subsequent record — the exact failure byte mode exists to
    * prevent. The shard column is BINARY (UTF-8 octets of the
    * composed text). Mirrored generatively in the q439 oracle. */
  private def warcByteShards(s: SparkSession, dir: String): DataFrame = {
    val crlf = "\r\n"
    val d = t(s, dir, "documents").filter(col("doc_id") % 7 === 3)
      .select(col("doc_id"), col("source"),
        concat(lit("Ünïcødé§"),
          expr("repeat('π✓', CAST(doc_id % 4 AS INT))"),
          regexp_replace(substring(col("text"), 1, 200), "\\r", " "))
          .as("txt"))
    val status = when(col("doc_id") % 5 === 0, lit("404 Not Found"))
      .otherwise(lit("200 OK"))
    val isResource = col("doc_id") % 3 === 0
    val block = when(isResource, col("txt"))
      .otherwise(concat(lit("HTTP/1.1 "), status,
        lit(crlf + "Content-Type: text/plain" + crlf + crlf),
        col("txt")))
    val typ = when(isResource, lit("resource"))
      .otherwise(lit("response"))
    val rec = concat(lit("WARC/1.0" + crlf + "WARC-Type: "), typ,
      lit(crlf + "WARC-Target-URI: https://"), col("source"),
      lit(".example.com/doc/"), col("doc_id").cast("string"),
      lit(crlf + "WARC-Record-ID: <urn:uuid:"),
      col("doc_id").cast("string"),
      lit(">" + crlf + "Content-Length: "),
      // OCTETS, not chars — the point of the gate.
      length(block.cast("binary")).cast("string"),
      lit(crlf + crlf), block, lit(crlf + crlf))
    val info = concat(lit("software: graft/0.1\nisPartOf: "),
      col("source"))
    d.select(col("source"), col("doc_id"), rec.as("__rec"))
      .groupBy(col("source"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("doc_id").as("k"),
          col("__rec").as("r")))), x => x.getField("r")), "")
        .as("__body"))
      .select(col("source"),
        concat(
          lit("WARC/1.0" + crlf + "WARC-Type: warcinfo" + crlf +
            "WARC-Record-ID: <urn:uuid:shard-"), col("source"),
          lit(">" + crlf + "Content-Length: "),
          length(info.cast("binary")).cast("string"),
          lit(crlf + crlf), info, lit(crlf + crlf), col("__body"))
          .cast("binary").as("warc"))
  }

  /** q418's WAT-style fixture: per-source shards of WARC `metadata`
    * records whose blocks are JSON envelopes (the Common Crawl WAT
    * shape). Mirrored verbatim in the q418 oracle. */
  private def watShards(s: SparkSession, dir: String): DataFrame = {
    val crlf = "\r\n"
    val d = t(s, dir, "documents").filter(col("doc_id") % 5 === 1)
    val block = concat(lit("{\"uri\":\"https://"), col("source"),
      lit(".example.com/doc/"), col("doc_id").cast("string"),
      lit("\",\"links\":"), (col("doc_id") % 7).cast("string"),
      lit(",\"ttl\":\"Doc "), col("doc_id").cast("string"),
      lit("\"}"))
    val rec = concat(lit("WARC/1.0" + crlf + "WARC-Type: metadata" +
      crlf + "WARC-Target-URI: https://"), col("source"),
      lit(".example.com/doc/"), col("doc_id").cast("string"),
      lit(crlf + "Content-Length: "), length(block).cast("string"),
      lit(crlf + crlf), block, lit(crlf + crlf))
    d.select(col("source"), col("doc_id"), rec.as("__rec"))
      .groupBy(col("source"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("doc_id").as("k"),
          col("__rec").as("r")))), x => x.getField("r")), "")
        .as("warc"))
  }

  /** q308/q309's shared match fixture — organic preference pairs:
    * consecutive doc_ids "play", the longer document's source wins;
    * ties and same-source games drop. Mirrored verbatim in both
    * oracles (`matchesSql`). */
  private def matchesFixture(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val b = d.select((col("doc_id") - 1L).as("doc_id"),
      col("source").as("__bs"), col("n_chars").as("__bn"))
    d.join(b, Seq("doc_id"))
      .filter(col("n_chars") =!= col("__bn") &&
        col("source") =!= col("__bs"))
      .select(
        when(col("n_chars") > col("__bn"), col("source"))
          .otherwise(col("__bs")).as("winner"),
        when(col("n_chars") > col("__bn"), col("__bs"))
          .otherwise(col("source")).as("loser"))
  }

  /** q285/q286's shared ratings fixture: three deterministic raters
    * over documents — the q268 length-rule pair plus a hash rater
    * that rates only every third doc (missing data). Mirrored
    * verbatim in both oracles. */
  private def ratingsFixture(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    def lab(c: Column) = when(c, lit("pos")).otherwise(lit("neg"))
    val r1 = d.select(col("source"), col("doc_id").as("item"),
      lit("len500").as("rater"), lab(col("n_chars") >= 500).as("label"))
    val r2 = d.select(col("source"), col("doc_id").as("item"),
      lit("len480").as("rater"),
      lab(col("n_chars") >= 480 && col("doc_id") % 13 =!= 0)
        .as("label"))
    val r3 = d.filter(col("doc_id") % 3 === 0)
      .select(col("source"), col("doc_id").as("item"),
        lit("hash").as("rater"),
        lab(hashMod("rate", col("doc_id"), 100) < 55).as("label"))
    r1.unionByName(r2).unionByName(r3)
  }

  /** q229/q230's shared fixture: the corpus is single-line, so line
    * structure is injected deterministically — " order " becomes a
    * terminal-punctuated line break, " data " opens a bullet line,
    * " value " breaks a plain line. The oracle applies the identical
    * literal-pattern chain. */
  private def lineFixture(d: DataFrame): DataFrame =
    d.withColumn("text3",
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        " order ", ".\n"),
        " data ", "\n- "),
        " value ", "\n"))

  /** q221's oracle (shared with q227, which post-processes the same
    * pair list): the order–part Adamic–Adar census with the 1/ln-deg
    * micro terms, deg ∈ [2, 40], ≥ 2 common parts. */
  /** q384's oracle body (exact-integer rolling Mann-Kendall twin of
    * TimeSeries.rollingMannKendall), kept factored out (the retired
    * r17 q384a-c diagnostics wrapped this text). Every final
    * column is cast to a driver-hashable type: the windowed running
    * sum srun is DECIMAL(38,0) in DuckDB and MUST be cast to BIGINT
    * before emission — arrow decimal128 output is the one result
    * type the driver's hasher normalizes differently from Spark's
    * int64 (r15/r16 q384/q402 two-round hash-red root cause; local
    * str() hides it, check.py now lints it). All // operands here
    * are provably non-negative (q4 = 72e12*srun^2 over a positive
    * window polynomial; u = isqrt(q4) >= 0), so floor-vs-truncate
    * division differences across DuckDB versions cannot bite. */
  private lazy val rollingMkOracleSql: String =
      """WITH b AS (
        |  SELECT user_id AS k, epoch_ms(ts) AS ts_ms, event_id AS id,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts), event_id) AS rn
        |  FROM events WHERE value IS NOT NULL),
        |p AS (
        |  SELECT a.k, a.rn AS ra, j.rn AS rb,
        |    CAST(sign(j.v - a.v) AS BIGINT) AS s
        |  FROM b a JOIN b j ON a.k = j.k AND j.rn > a.rn
        |    AND j.rn - a.rn < 16),
        |d AS (
        |  SELECT k, pos, CAST(sum(s) AS BIGINT) AS d FROM (
        |    SELECT k, rb AS pos, s FROM p
        |    UNION ALL SELECT k, ra + 16 AS pos, -s FROM p)
        |  GROUP BY 1, 2),
        |u AS (
        |  SELECT k, pos, 0 AS tag, d,
        |    CAST(NULL AS BIGINT) AS ts_ms, CAST(NULL AS BIGINT) AS id,
        |    CAST(NULL AS BIGINT) AS rn
        |  FROM d
        |  UNION ALL
        |  SELECT k, rn AS pos, 1 AS tag, 0 AS d, ts_ms, id, rn FROM b),
        |c AS (
        |  SELECT k, pos, tag, ts_ms, id, rn,
        |    least(rn, 16) AS n,
        |    sum(d) OVER (PARTITION BY k ORDER BY pos, tag
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS srun
        |  FROM u),
        |q AS (
        |  SELECT k, ts_ms, id, n, srun,
        |    CASE WHEN n >= 2 THEN
        |      (CAST(72000000000000 AS HUGEINT) * srun * srun)
        |        // (n * (n - 1) * (2 * n + 5)) END AS q4
        |  FROM c WHERE tag = 1),
        |sq AS (
        |  SELECT k, ts_ms, id, n, srun, q4,
        |    CAST(floor(sqrt(CAST(q4 AS DOUBLE))) AS HUGEINT) AS u0
        |  FROM q),
        |iq AS (
        |  SELECT k, ts_ms, id, n, srun,
        |    u0 + CASE WHEN (u0 + 2) * (u0 + 2) <= q4 THEN 2
        |      WHEN (u0 + 1) * (u0 + 1) <= q4 THEN 1
        |      WHEN u0 * u0 <= q4 THEN 0
        |      WHEN (u0 - 1) * (u0 - 1) <= q4 THEN -1 ELSE -2 END AS u
        |  FROM sq),
        |z AS (
        |  SELECT k, ts_ms, id, n, srun,
        |    CASE WHEN n >= 2 THEN CAST(CASE WHEN srun < 0
        |      THEN -((u + 1) // 2) ELSE (u + 1) // 2 END AS BIGINT)
        |    END AS z_micro
        |  FROM iq)
        |SELECT k AS user_id, ts_ms, id AS event_id,
        |  CAST(n AS INTEGER) AS n_win, CAST(srun AS BIGINT) AS s,
        |  z_micro,
        |  COALESCE(abs(z_micro) > 1959964, false) AS alarm
        |FROM z""".stripMargin

  /** q402's oracle body (exact-integer CART root stump twin of
    * Profile.decisionStump), kept factored out (the retired r17
    * q402a-c diagnostics wrapped this text). The windowed
    * running counts cn/cp are DECIMAL(38,0) in DuckDB and MUST be
    * cast to BIGINT before emission — arrow decimal128 output is the
    * one result type the driver's hasher normalizes differently from
    * Spark's int64 (r15/r16 two-round hash-red root cause). All //
    * operands are provably non-negative (gnum, gnnum are Gini
    * impurity/gain numerators, >= 0 by concavity; denominators
    * positive under WHERE cn < nn), so floor-vs-truncate division
    * differences across DuckDB versions cannot bite. */
  private lazy val decisionStumpOracleSql: String =
      """WITH e AS (
        |  SELECT (user_id + event_id) % 2 = 0 AS y, value,
        |    (epoch_ms(ts) // 3600000) % 24 AS hour,
        |    user_id % 100 AS residue
        |  FROM events),
        |m AS (
        |  SELECT 'value' AS feature,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS v,
        |    CASE WHEN y THEN 1 ELSE 0 END AS yy
        |  FROM e WHERE value IS NOT NULL
        |  UNION ALL
        |  SELECT 'hour',
        |    CAST(round(CAST(hour AS DOUBLE) * 1e3) AS BIGINT),
        |    CASE WHEN y THEN 1 ELSE 0 END
        |  FROM e
        |  UNION ALL
        |  SELECT 'residue',
        |    CAST(round(CAST(residue AS DOUBLE) * 1e3) AS BIGINT),
        |    CASE WHEN y THEN 1 ELSE 0 END
        |  FROM e),
        |cells AS (
        |  SELECT feature, v, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(yy) AS BIGINT) AS p
        |  FROM m GROUP BY 1, 2),
        |run AS (
        |  SELECT feature, v, n, p,
        |    sum(n) OVER w AS cn, sum(p) OVER w AS cp
        |  FROM cells
        |  WINDOW w AS (PARTITION BY feature ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (
        |  SELECT feature, CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum(p) AS BIGINT) AS pp
        |  FROM cells GROUP BY 1),
        |sc AS (
        |  SELECT run.feature, run.v, run.cn, run.cp, tot.nn, tot.pp,
        |    CAST(cp AS HUGEINT) * (cn - cp) * (nn - cn)
        |      + CAST(pp - cp AS HUGEINT)
        |        * ((nn - cn) - (pp - cp)) * cn AS gnum,
        |    CAST(cn AS HUGEINT) * (nn - cn) * nn AS gden,
        |    CAST(pp AS HUGEINT) * (nn - pp) * cn * (nn - cn)
        |      - CAST(nn AS HUGEINT)
        |        * (CAST(cp AS HUGEINT) * (cn - cp) * (nn - cn)
        |           + CAST(pp - cp AS HUGEINT)
        |             * ((nn - cn) - (pp - cp)) * cn) AS gnnum
        |  FROM run JOIN tot USING (feature)
        |  WHERE run.cn < tot.nn),
        |sc2 AS (
        |  SELECT feature, v, cn, cp, nn, pp,
        |    CAST((4000000 * gnum + gden) // (2 * gden) AS BIGINT)
        |      AS gini_micro,
        |    CAST((4000000 * gnnum + nn * gden) // (2 * nn * gden)
        |      AS BIGINT) AS gain_micro
        |  FROM sc)
        |SELECT feature, nn AS n, pp AS pos, v AS threshold_milli,
        |  gini_micro, gain_micro, CAST(cn AS BIGINT) AS n_le,
        |  CAST(cp AS BIGINT) AS pos_le
        |FROM sc2
        |QUALIFY row_number() OVER (PARTITION BY feature
        |  ORDER BY gini_micro, v) = 1"""
        .stripMargin

  private lazy val adamicAdarOracleSql: String =
    """WITH e AS (
      |  SELECT DISTINCT l_orderkey AS s, l_partkey AS z FROM lineitem),
      |zt AS (
      |  SELECT z, CAST(round(1e12
      |    / round(1e6 * ln(CAST(count(*) AS DOUBLE)))) AS BIGINT) AS aa
      |  FROM e GROUP BY z
      |  HAVING count(*) >= 2 AND count(*) <= 40),
      |l AS (SELECT e.s, e.z, zt.aa FROM e JOIN zt USING (z))
      |SELECT wa.s AS a, wb.s AS b,
      |  CAST(count(*) AS BIGINT) AS common_neighbors,
      |  CAST(sum(wa.aa) AS BIGINT) AS aa_micro
      |FROM l wa JOIN l wb ON wa.z = wb.z AND wa.s < wb.s
      |GROUP BY 1, 2
      |HAVING count(*) >= 2""".stripMargin

  /** q225's oracle, one pair: HUGEINT-exact sufficient statistics
    * (Σx² alone passes int64 at sf0.1) mirroring the operator's
    * DECIMAL(38,0) path, pairwise-complete rows, NULL on zero
    * variance. */
  private def corrPairSql(a: String, b: String, scale: String): String =
    s"""SELECT '$a' AS col_a, '$b' AS col_b, CAST(st.n AS BIGINT) AS n,
       |  CASE WHEN st.n * st.sxx - st.sx * st.sx <= 0
       |         OR st.n * st.syy - st.sy * st.sy <= 0 THEN NULL
       |       ELSE CAST(round(1e6
       |         * CAST(st.n * st.sxy - st.sx * st.sy AS DOUBLE)
       |         / (sqrt(CAST(st.n * st.sxx - st.sx * st.sx AS DOUBLE))
       |            * sqrt(CAST(st.n * st.syy - st.sy * st.sy AS DOUBLE))))
       |         AS BIGINT) END AS r_micro
       |FROM (
       |  SELECT CAST(count(*) AS HUGEINT) AS n,
       |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
       |    CAST(sum(x * y) AS HUGEINT) AS sxy,
       |    CAST(sum(x * x) AS HUGEINT) AS sxx,
       |    CAST(sum(y * y) AS HUGEINT) AS syy
       |  FROM (SELECT CAST(round($a * $scale) AS BIGINT) AS x,
       |               CAST(round($b * $scale) AS BIGINT) AS y
       |        FROM lineitem
       |        WHERE $a IS NOT NULL AND $b IS NOT NULL)) st""".stripMargin

  /** 36 consecutive CJK ideographs (U+4E00–U+4E23): the substitution
    * alphabet of q205's synthetic unspaced-CJK corpus. a–z0–9 map
    * 1:1; the trailing space in [[CjkFrom]] has no counterpart, so
    * `translate` deletes it — genuinely unspaced text. The SAME
    * Scala constant is interpolated into the oracle twin, so the two
    * sides cannot drift. */
  private val CjkAlpha: String =
    (0x4E00 until 0x4E00 + 36).map(_.toChar).mkString
  private val CjkFrom: String = "abcdefghijklmnopqrstuvwxyz0123456789 "

  /** q247/q248's shared fixture (injected — the driver corpus cannot
    * express CJK, per FIXTURES.md): docs < 150 become unspaced CJK
    * with sentence structure — ' table '→。, ' query '→！ BEFORE the
    * q205 transliteration (the fullwidth terminators are not in
    * [[CjkFrom]], so they survive `translate`), a shared 8-ideograph
    * boilerplate sentence prefixed to every doc (cross-doc dup bait
    * for sentence dedup), and a trailing 。 on the 0-mod-3 residue
    * (ends_punct bait). Docs 150–299 are ASCII controls with
    * ' table '→'. ' sentence structure and a shared
    * "all rights reserved. " boilerplate prefix, exercising the
    * ASCII branch of the same splitter in the same gate. */
  private val CjkBoiler: String = CjkAlpha.take(8)

  /** q205/q251's shared corpus: each doc < 150 transliterated to
    * unspaced CJK (ids 2k), paired with a 3-chars-shorter variant
    * (ids 2k+1), plus 20 untouched Latin controls at +100000 —
    * mirrored CTE-for-CTE in [[cjkCorpusSqlCtes]]. */
  private def cjkCorpus(d: DataFrame): DataFrame = {
    val ct = translate(lower(col("text")), CjkFrom, CjkAlpha)
    val cj = d.filter(col("doc_id") < 150)
      .select(col("doc_id"), ct.as("ct"))
    val a = cj.select((col("doc_id") * 2).as("doc_id"),
      col("ct").as("text"))
    val b = cj.select((col("doc_id") * 2 + 1).as("doc_id"),
      col("ct").substr(lit(1),
        greatest(length(col("ct")) - 3, lit(0))).as("text"))
    val ctrl = d.filter(col("doc_id") >= 150 && col("doc_id") < 170)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    a.unionByName(b).unionByName(ctrl)
  }

  /** The same corpus + script-aware tokenization as DuckDB CTEs,
    * ending in `toks(doc_id, w)` — shared by the q205 near-dup chain
    * and the q251 fertility oracle, so the token route cannot drift
    * between them. */
  private lazy val cjkCorpusToksSqlCtes: String =
    s"""cj AS (
         |  SELECT doc_id,
         |    translate(lower(text), '$CjkFrom', '$CjkAlpha') AS ct
         |  FROM documents WHERE doc_id < 150),
         |base AS (
         |  SELECT doc_id * 2 AS doc_id, ct AS text FROM cj
         |  UNION ALL
         |  SELECT doc_id * 2 + 1,
         |    substr(ct, 1, greatest(length(ct) - 3, 0)) FROM cj
         |  UNION ALL
         |  SELECT doc_id + 100000, text FROM documents
         |  WHERE doc_id >= 150 AND doc_id < 170),
         |cnt AS (
         |  SELECT doc_id, text,
         |    CAST(len(regexp_extract_all(text,
         |      '[A-Za-z\\x{00C0}-\\x{024F}]')) AS BIGINT) AS n_latin,
         |    CAST(len(regexp_extract_all(text,
         |      '[\\x{0400}-\\x{04FF}]')) AS BIGINT) AS n_cyrillic,
         |    CAST(len(regexp_extract_all(text,
         |      '[\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}\\x{AC00}-\\x{D7A3}]'))
         |      AS BIGINT) AS n_cjk,
         |    CAST(len(regexp_extract_all(text,
         |      '[\\x{0600}-\\x{06FF}]')) AS BIGINT) AS n_arabic,
         |    CAST(len(regexp_extract_all(text,
         |      '[\\x{0370}-\\x{03FF}]')) AS BIGINT) AS n_greek,
         |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT)
         |      AS n_digit
         |  FROM base),
         |dom AS (
         |  SELECT doc_id, text, CASE
         |    WHEN n_latin > 0 AND n_latin >= greatest(n_cyrillic, n_cjk,
         |      n_arabic, n_greek, n_digit) THEN 'latin'
         |    WHEN n_cyrillic > 0 AND n_cyrillic >= greatest(n_cjk,
         |      n_arabic, n_greek, n_digit) THEN 'cyrillic'
         |    WHEN n_cjk > 0 AND n_cjk >= greatest(n_arabic, n_greek,
         |      n_digit) THEN 'cjk'
         |    WHEN n_arabic > 0 AND n_arabic >= greatest(n_greek, n_digit)
         |      THEN 'arabic'
         |    WHEN n_greek > 0 AND n_greek >= n_digit THEN 'greek'
         |    WHEN n_digit > 0 THEN 'digit'
         |    ELSE 'und' END AS dominant
         |  FROM cnt),
         |cd0 AS (
         |  SELECT doc_id, text, dominant,
         |    regexp_replace(lower(text), '\\s+', '', 'g') AS cd
         |  FROM dom),
         |toks AS (
         |  SELECT doc_id, CASE WHEN dominant = 'cjk'
         |    THEN list_filter(list_transform(
         |           generate_series(1, greatest(length(cd) - 1, 0)),
         |           i -> substr(cd, i, 2)), s2 -> length(s2) = 2)
         |    ELSE list_filter(string_split_regex(lower(text), '\\s+'),
         |           t -> len(t) > 0) END AS w
         |  FROM cd0)""".stripMargin

  private def cjkSentenceFixture(d: DataFrame): DataFrame = {
    val terms = regexp_replace(regexp_replace(lower(col("text")),
      " table ", "。"), " query ", "！")
    val cjk = d.filter(col("doc_id") < 150)
      .select(col("doc_id"),
        concat(lit(CjkBoiler + "。"), translate(terms, CjkFrom, CjkAlpha),
          when(col("doc_id") % 3 === 0, lit("。")).otherwise(lit("")))
          .as("text2"))
    val ascii = d.filter(col("doc_id") >= 150 && col("doc_id") < 300)
      .select(col("doc_id"),
        concat(lit("all rights reserved. "),
          regexp_replace(lower(col("text")), " table ", ". ")).as("text2"))
    cjk.unionByName(ascii)
  }

  /** q252/q253's shared generation-eval fixture: candidate = the
    * reference with ' table '→' desk ' and its last two words
    * dropped — deterministic, with enough real divergence to exercise
    * clipping, the brevity penalty, and the chrF β-weighting. */
  private def genEvalFixture(d: DataFrame): DataFrame = {
    val w = TextFunctions.tokens(
      regexp_replace(col("text"), " table ", " desk "))
    d.select(col("doc_id"), col("source"),
      array_join(slice(w, lit(1), greatest(size(w) - 2, lit(1))), " ")
        .as("cand"),
      col("text").as("ref"))
  }

  private lazy val genEvalFixtureSql: String =
    """f AS (
      |  SELECT doc_id, source,
      |    COALESCE(array_to_string(
      |      list_slice(w, 1, greatest(len(w) - 2, 1)), ' '), '') AS cand,
      |    text AS ref
      |  FROM (SELECT doc_id, source, text,
      |          list_filter(string_split_regex(lower(
      |            regexp_replace(text, ' table ', ' desk ', 'g')), '\s+'),
      |            t -> len(t) > 0) AS w
      |        FROM documents)),
      |tok AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split_regex(lower(cand), '\s+'),
      |      t -> len(t) > 0) AS cw,
      |    list_filter(string_split_regex(lower(ref), '\s+'),
      |      t -> len(t) > 0) AS rw
      |  FROM f)""".stripMargin

  /** The same fixture as DuckDB SQL (one CTE named `f`) — the
    * Scala constants interpolate into both sides, so they cannot
    * drift. */
  private lazy val cjkSentenceFixtureSql: String =
    s"""f AS (
       |  SELECT doc_id,
       |    '$CjkBoiler' || '。' || translate(tm, '$CjkFrom', '$CjkAlpha')
       |      || CASE WHEN doc_id % 3 = 0 THEN '。' ELSE '' END AS text2
       |  FROM (SELECT doc_id,
       |          regexp_replace(regexp_replace(lower(text),
       |            ' table ', '。', 'g'), ' query ', '！', 'g') AS tm
       |        FROM documents WHERE doc_id < 150)
       |  UNION ALL
       |  SELECT doc_id,
       |    'all rights reserved. '
       |      || regexp_replace(lower(text), ' table ', '. ', 'g') AS text2
       |  FROM documents WHERE doc_id >= 150 AND doc_id < 300)""".stripMargin

  /** Shared fixture of q180/q181: two crawl snapshots of the corpus
    * keyed by a unique per-doc URL over four hosts (two of which
    * share the registrable domain example.com). Old crawl = residues
    * 1,2 mod 3; new crawl = 0,2 mod 3; the 2-mod-5 residue re-renders
    * its content in the new crawl. */
  private def snapshotFixture(d: DataFrame): (DataFrame, DataFrame) = {
    val host = element_at(array(lit("https://news.example.co.uk"),
      lit("https://blog.example.com"), lit("https://example.com"),
      lit("http://mirror.site.org")), (col("doc_id") % 4 + 1).cast("int"))
    val url = concat(host, lit("/p/"), col("doc_id").cast("string"))
    val oldSnap = d.filter(col("doc_id") % 3 =!= 0)
      .select(url.as("url"), md5(col("text")).as("digest"))
    val newSnap = d.filter(col("doc_id") % 3 =!= 1)
      .select(url.as("url"),
        md5(when(col("doc_id") % 5 === 2, concat(col("text"), lit("v2")))
          .otherwise(col("text"))).as("digest"))
    (oldSnap, newSnap)
  }

  /** Shared front of q110/q125: train 10 BPE merges on `docs`,
    * re-encode every doc at scan speed, and aggregate per-doc
    * token/piece/char counts (plus any `extraCols` carried through
    * the grouping). The two oracles both reuse [[bpeOracleSql]], so
    * the Spark side shares one implementation too — the encode path
    * cannot diverge between the queries. */
  private def bpePieceCounts(docs: DataFrame, extraCols: Seq[String],
      tokenizer: Column => Column = TextFunctions.tokens)
      : DataFrame = {
    val merges = Corpus.bpeTrain(docs, "text", nMerges = 10,
      tokenizer = tokenizer)
    val keys = col("doc_id") +: extraCols.map(col)
    docs.select(keys :+
        explode(tokenizer(col("text"))).as("tok"): _*)
      // bpeOracleSql's merge replay self-delimits symbols as <sym>,
      // which is sound only while tokens are '<'/'>'-free (true for
      // the current fixtures; see FIXTURES.md). Assert it here so a
      // markup-bearing fixture fails with THIS message instead of a
      // baffling oracle hash mismatch.
      .withColumn("tok",
        when(col("tok").rlike("[<>]"), raise_error(concat(
          lit("BPE oracle delimiter invariant violated — token " +
            "contains '<' or '>': "), col("tok"))))
          .otherwise(col("tok")))
      .select(keys :+
        size(functions.GraftExpressions.bpeEncode(col("tok"), merges))
          .as("np") :+
        length(col("tok")).as("nc"): _*)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("np").cast("long")).as("n_pieces"),
        sum(col("nc").cast("long")).as("n_chars"))
  }

  /** q80's input: rebuild each doc's token stream as '. '-joined
    * 8-token sentences (the corpus itself carries no punctuation).
    * Mirrored token-for-token in the DuckDB oracle. */
  /** Deterministic md5-derived value in [0, mod) keyed on an id
    * column — the shared fixture generator behind every hash-graph /
    * hash-coordinate gate (q174/q177/q179/q182/q184/q190/q198). Each
    * oracle replays the same `md5(tag || ':' || id)` 15-hex-digit
    * construction. */
  private[graft] def hashMod(tag: String, id: Column, mod: Long)
      : org.apache.spark.sql.Column =
    pmod(TextFunctions.hash60(concat(lit(tag + ":"), id.cast("string"))),
      lit(mod))

  private def sentencified(docs: DataFrame, extraCols: String*): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    docs.select(col("doc_id") +: extraCols.map(col) :+
      array_join(
        transform(sequence(lit(0), ((size(toks) - 1) / 8).cast("int")),
          i => concat_ws(" ", slice(toks, i * 8 + 1, lit(8)))),
        ". ").as("text"): _*)
  }

  // ------------------------------------------------------------- oracle SQL

  /** DuckDB-runnable ANSI SQL twins. Column names AND types are mirrored
    * (BIGINT for counts/sums, explicit casts where DuckDB widens). */
  def oracleSql: Map[String, String] = Map(
    "q01_daily_summary" ->
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
        |         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_value_cents
        |  FROM events GROUP BY 1)
        |SELECT day, n_events, total_value_cents,
        |       CAST(total_value_cents AS DOUBLE)/100.0/n_events AS avg_value
        |FROM d""".stripMargin,

    "q02_normalize" ->
      s"""SELECT event_id,
         |  'dev_' || CAST(user_id AS VARCHAR) AS device_name,
         |  $stateCaseSql AS state,
         |  TRY_CAST(NULLIF(regexp_extract(props, '[0-9]+'), '') AS INTEGER) AS k_value,
         |  coalesce(value, 0.0) AS value
         |FROM events""".stripMargin,

    "q03_unit_conversions" ->
      """SELECT event_id, round(value/60, 1) AS minutes,
        |       round(value/10000, 2) AS area_m2, value/60 AS raw_minutes
        |FROM events""".stripMargin,

    "q04_state_filter" ->
      s"""SELECT user_id, count(*) AS n_active
         |FROM (SELECT user_id, $stateCaseSql AS state FROM events)
         |WHERE lower(state) IN ('cleaning','segment_cleaning','zone_cleaning',
         |                       'spot_cleaning','segmentcleaning')
         |GROUP BY user_id""".stripMargin,

    "q05_edge_detect" ->
      """SELECT user_id, event_id, prev_type, cur_type FROM (
        |  SELECT user_id, event_id,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |         event_type AS cur_type
        |  FROM events)
        |WHERE prev_type = 'click' AND cur_type = 'error'""".stripMargin,

    "q06_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, (epoch_us(ts) // 1000000) AS ep
        |  FROM events),
        |y AS (
        |  SELECT user_id, event_id, ts, ep,
        |         lag(ep) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ep
        |  FROM x),
        |z AS (
        |  SELECT user_id, event_id, ts, ep,
        |         CASE WHEN prev_ep IS NULL OR ep - prev_ep > 3600 THEN 1 ELSE 0 END AS st
        |  FROM y),
        |w AS (
        |  SELECT user_id, ep,
        |         CAST(SUM(st) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                            ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
        |  FROM z)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       CAST(min(ep) AS BIGINT) AS start_s, CAST(max(ep) AS BIGINT) AS end_s,
        |       CAST(max(ep) - min(ep) AS BIGINT) AS duration_s
        |FROM w GROUP BY 1, 2""".stripMargin,

    "q07_delta_clamp" ->
      """SELECT user_id, event_id,
        |       CAST(greatest(0, c - coalesce(lag(c) OVER (PARTITION BY user_id ORDER BY ts, event_id), c)) AS BIGINT) AS delta_cents
        |FROM (SELECT user_id, event_id, ts, CAST(round(value*100) AS BIGINT) AS c FROM events)""".stripMargin,

    "q08_watermark_filter" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE ts > TIMESTAMP '2024-01-15 00:00:00'""".stripMargin,

    "q09_latest_per_key" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1""".stripMargin,

    "q10_topk_global" ->
      """SELECT event_id, value FROM events
        |ORDER BY value DESC, event_id LIMIT 100""".stripMargin,

    "q11_state_join" ->
      """WITH cur AS (SELECT user_id, count(*) AS cur_n FROM events GROUP BY 1),
        |st AS (SELECT user_id, count(*) AS last_count FROM events
        |       WHERE ts < TIMESTAMP '2024-01-15 00:00:00' GROUP BY 1)
        |SELECT c.user_id, c.cur_n,
        |       coalesce(s.last_count, 0) AS last_n,
        |       greatest(0, c.cur_n - coalesce(s.last_count, 0)) AS new_n
        |FROM cur c LEFT JOIN st s USING (user_id)""".stripMargin,

    "q12_lifetime_totals" ->
      """SELECT user_id, count(*) AS n,
        |       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents,
        |       CAST(max(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS max_cents
        |FROM events GROUP BY 1""".stripMargin,

    "q13_rollup" ->
      """SELECT CAST(year(ts) AS INTEGER) AS y, CAST(month(ts) AS INTEGER) AS m,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM events GROUP BY ROLLUP (1, 2)""".stripMargin,

    "q32_cube" ->
      """SELECT event_type AS etype, CAST(month(ts) AS INTEGER) AS m,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM events GROUP BY CUBE (1, 2)""".stripMargin,

    "q33_running_total" ->
      """SELECT user_id, event_id,
        |  CAST(sum(c) OVER w AS BIGINT) AS running_cents,
        |  round(avg(c) OVER w, 4) AS running_avg
        |FROM (SELECT user_id, event_id, ts, CAST(round(value*100) AS BIGINT) AS c
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "q14_asof_join" ->
      """SELECT p.event_id, p.user_id,
        |       (SELECT CAST(max(epoch_us(e.ts) // 1000000) AS BIGINT) FROM events e
        |        WHERE e.event_type = 'error' AND e.user_id = p.user_id AND e.ts <= p.ts)
        |         AS last_error_s
        |FROM events p WHERE p.event_type = 'purchase'""".stripMargin,

    "q34_distinct_percentiles" ->
      """SELECT event_type AS etype,
        |       count(DISTINCT user_id) AS n_users,
        |       round(quantile_cont(c, 0.5), 4) AS median_cents,
        |       round(quantile_cont(c, 0.95), 4) AS p95_cents
        |FROM (SELECT event_type, user_id, CAST(round(value*100) AS BIGINT) AS c
        |      FROM events)
        |GROUP BY 1""".stripMargin,

    "q35_semi_anti" ->
      """SELECT user_id, count(*) AS n_events FROM events e
        |WHERE EXISTS (SELECT 1 FROM events p
        |              WHERE p.event_type = 'purchase' AND p.user_id = e.user_id)
        |  AND NOT EXISTS (SELECT 1 FROM events x
        |                  WHERE x.event_type = 'error' AND x.user_id = e.user_id
        |                    AND x.ts >= TIMESTAMP '2024-01-28 00:00:00')
        |GROUP BY 1""".stripMargin,

    "q15_region_revenue" ->
      """SELECT r_name, count(*) AS n_lines,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q16_pricing_summary" ->
      """WITH a AS (
        |  SELECT l_returnflag, l_linestatus, count(*) AS n,
        |    CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
        |    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
        |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents
        |  FROM lineitem
        |  WHERE l_shipdate <= TIMESTAMP '1997-09-02 00:00:00'
        |  GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus, n, sum_qty_cents, sum_price_cents,
        |       sum_disc_price_cents, sum_charge_cents,
        |       CAST(sum_qty_cents AS DOUBLE)/100.0/n AS avg_qty
        |FROM a""".stripMargin,

    "q17_dedup_exact" ->
      """SELECT md5(text) AS digest, min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "q18_minhash_bands" -> minhashBandsSql,

    "q19_minhash_candidates" ->
      s"""WITH bands AS ($minhashBandsSql)
         |SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |FROM bands l JOIN bands r
         |  ON l.band_id = r.band_id AND l.band_key = r.band_key
         |WHERE l.doc_id < r.doc_id""".stripMargin,

    "q20_jaccard_pairs" ->
      s"""WITH sets AS (${shingleSetsSql("WHERE doc_id < 300")})
        |SELECT l.doc_id AS a, r.doc_id AS b,
        |       CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE)
        |         / CAST(len(list_distinct(list_concat(l.sh, r.sh))) AS DOUBLE) AS jaccard
        |FROM sets l, sets r
        |WHERE l.doc_id < r.doc_id
        |  AND len(list_distinct(list_concat(l.sh, r.sh))) > 0
        |  AND CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(l.sh, r.sh))) AS DOUBLE) >= 0.05""".stripMargin,

    "q21_simhash" -> simhashSql,

    "q36_neardup_pipeline" ->
      s"""WITH bands AS ($minhashBandsSql),
         |cands AS (
         |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |  FROM bands l JOIN bands r
         |    ON l.band_id = r.band_id AND l.band_key = r.band_key
         |  WHERE l.doc_id < r.doc_id),
         |sets AS (${shingleSetsSql("")})
         |SELECT a, b, round(j, 6) AS jaccard FROM (
         |  SELECT c.a, c.b,
         |    CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
         |         THEN CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |              / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE)
         |         ELSE 0.0 END AS j
         |  FROM cands c
         |  JOIN sets sa ON sa.doc_id = c.a
         |  JOIN sets sb ON sb.doc_id = c.b)
         |WHERE j >= 0.6""".stripMargin,

    "q22_knn_bruteforce" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id,
        |         list_transform(embedding, e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS qv
        |  FROM embeddings WHERE vec_id < 5),
        |c AS (
        |  SELECT vec_id AS neighbor_id,
        |         list_transform(embedding, e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS cv
        |  FROM embeddings),
        |n1 AS (SELECT query_id, qv,
        |         CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i]*qv[i])) AS BIGINT) AS qn
        |       FROM q),
        |n2 AS (SELECT neighbor_id, cv,
        |         CAST(list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i]*cv[i])) AS BIGINT) AS cn
        |       FROM c),
        |sc AS (
        |  SELECT query_id, neighbor_id,
        |         CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i]*cv[i])) AS BIGINT) AS dot,
        |         qn, cn
        |  FROM n1, n2 WHERE query_id <> neighbor_id),
        |r AS (
        |  SELECT query_id, neighbor_id,
        |         CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS sim
        |  FROM sc),
        |k AS (
        |  SELECT query_id, neighbor_id, sim,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM r)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim
        |FROM k WHERE rank <= 10""".stripMargin,

    "q24_lang_id" -> langIdSql,

    "q25_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_chars,
        |  CAST(len(w) AS INTEGER) AS n_tokens,
        |  CASE WHEN len(w) > 0
        |       THEN CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE) / CAST(len(w) AS DOUBLE)
        |       ELSE 0.0 END AS mean_token_len,
        |  CASE WHEN length(text) > 0
        |       THEN CAST(length(text) - length(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)
        |       ELSE 0.0 END AS punct_ratio,
        |  CASE WHEN len(w) > 0
        |       THEN CAST(len(list_filter(w, t -> list_contains([STOPWORDS], t))) AS DOUBLE) / CAST(len(w) AS DOUBLE)
        |       ELSE 0.0 END AS stopword_ratio
        |FROM (SELECT doc_id, text,
        |        list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS w
        |      FROM documents)""".stripMargin
        .replace("STOPWORDS", allStopwordsSqlList),

    "q26_token_stats" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0))) AS BIGINT) AS n_tokens,
        |  CAST(sum(len(list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'), t -> len(t) > 0))) AS BIGINT) AS n_pieces
        |FROM documents GROUP BY source""".stripMargin,

    "q27_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0))), ' ')) AS fp
        |FROM documents""".stripMargin,

    "q37_string_surface" ->
      """SELECT doc_id,
        |  upper(substr(text, 1, 20)) AS head20,
        |  CAST(length(text) AS INTEGER) AS len,
        |  CAST(strpos(text, 'the') AS INTEGER) AS first_the,
        |  regexp_replace(lower(text), '[aeiou]', '', 'g') AS devoweled,
        |  reverse(substr(text, 1, 10)) AS rev10,
        |  lpad(lang, 5, '_') AS lang5,
        |  concat_ws('|', lang, source) AS tag
        |FROM documents""".stripMargin,

    "q38_date_surface" ->
      """SELECT event_id,
        |  CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk,
        |  CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
        |  CAST(quarter(ts) AS INTEGER) AS q,
        |  CAST(hour(ts) AS INTEGER) AS h,
        |  CAST(last_day(ts) AS DATE) AS eom,
        |  CAST(CAST(ts AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30,
        |  CAST(epoch_us(ts) // 1000000 AS BIGINT) AS epoch_s
        |FROM events""".stripMargin,

    "q39_wordcount" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |                            t -> len(t) > 0)) AS token
        |  FROM documents)
        |GROUP BY 1 ORDER BY n DESC, token LIMIT 50""".stripMargin,

    "q28_sessions_batch" -> sessionsBatchSql,

    "q23_knn_lsh" -> lshTopKSql,

    "q31_knn_ivf" -> ivfTopKSql,

    "q30_embedding_neardup" -> embeddingNearDupSql,

    // Mirrors Multimodal.FakeCodec.channel: 48-bit md5 prefix of
    // (utf8 bytes ++ ":j"), mod 1e6, scaled to [0, 1).
    "q29_media_features" ->
      """SELECT doc_id AS media_id,
        |  (CAST(('0x' || substr(md5(text || ':0'), 1, 12)) AS BIGINT) % 1000000) / 1000000.0 AS f0,
        |  (CAST(('0x' || substr(md5(text || ':3'), 1, 12)) AS BIGINT) % 1000000) / 1000000.0 AS f3
        |FROM documents""".stripMargin,

    "q40_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        |FROM events GROUP BY user_id""".stripMargin,

    "q41_setops" ->
      """WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
        |e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
        |SELECT user_id, 'both' AS tag FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM e)
        |UNION ALL
        |SELECT user_id, 'purchase_only' AS tag FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM e)
        |UNION ALL
        |SELECT user_id, 'error_only' AS tag FROM (SELECT user_id FROM e EXCEPT SELECT user_id FROM p)
        |UNION ALL
        |SELECT user_id, 'either' AS tag FROM (SELECT user_id FROM p UNION SELECT user_id FROM e)""".stripMargin,

    "q63_unpivot" ->
      """SELECT user_id, event_type AS etype, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q75_cohort_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT user_id, day,
        |             min(day) OVER (PARTITION BY user_id) AS cohort
        |      FROM e)
        |SELECT cohort, CAST(day - cohort AS INTEGER) AS age_days,
        |       count(DISTINCT user_id) AS n_active
        |FROM c GROUP BY 1, 2""".stripMargin,

    "q74_funnel" ->
      """WITH x AS (
        |  SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us
        |  FROM events),
        |y AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' THEN us END)
        |         OVER (PARTITION BY user_id ORDER BY us, event_id
        |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |         AS next_purchase_us
        |  FROM x)
        |SELECT CAST(ts AS DATE) AS day, count(*) AS n_clicks,
        |       CAST(sum(CASE WHEN next_purchase_us IS NOT NULL
        |                      AND next_purchase_us - us <= 3600000000
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        |FROM y WHERE event_type = 'click'
        |GROUP BY 1""".stripMargin,

    "q72_stratified_sample" ->
      """SELECT lang, count(*) AS n_sampled, CAST(min(doc_id) AS BIGINT) AS min_id
        |FROM (
        |  SELECT lang, doc_id,
        |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
        |  FROM documents)
        |WHERE b < CASE WHEN lang = 'en' THEN 50 WHEN lang = 'zh' THEN 80 ELSE 100 END
        |GROUP BY 1""".stripMargin,

    "q73_zscore" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS c FROM events),
        |stats AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(sum(c) AS BIGINT) AS sx, CAST(sum(c*c) AS BIGINT) AS sxx
        |  FROM e GROUP BY 1),
        |st2 AS (
        |  SELECT event_type,
        |         CAST(sx AS DOUBLE) / n AS mean_c,
        |         sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)) AS sd_c
        |  FROM stats)
        |SELECT e.event_type AS etype, count(*) AS n_rows,
        |       CAST(sum(CASE WHEN abs((CAST(c AS DOUBLE) - mean_c) / sd_c) > 2.0
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM e JOIN st2 ON e.event_type = st2.event_type
        |GROUP BY 1""".stripMargin,

    "q71_scd2" ->
      """SELECT user_id, event_id,
        |  CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
        |  CAST(lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                ORDER BY epoch_us(ts), event_id) AS BIGINT)
        |    AS valid_to_us,
        |  lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |                           ORDER BY epoch_us(ts), event_id) IS NULL
        |    AS is_current
        |FROM events""".stripMargin,

    "q70_prefix_filter_join" ->
      s"""WITH sets0 AS (${shingleSetsSql("")}),
         |sets AS (SELECT doc_id, sh, len(sh) AS sz FROM sets0 WHERE len(sh) > 0),
         |ex AS (SELECT doc_id, sz, unnest(sh) AS s FROM sets),
         |dfreq AS (SELECT s, count(*) AS df FROM ex GROUP BY 1),
         |pref AS (
         |  SELECT s, doc_id FROM (
         |    SELECT e.s, e.doc_id, e.sz,
         |           row_number() OVER (PARTITION BY e.doc_id ORDER BY d.df, e.s) AS rn
         |    FROM ex e JOIN dfreq d USING (s))
         |  WHERE rn <= sz - CAST(ceil(0.8 * sz) AS INTEGER) + 1),
         |cands AS (
         |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |  FROM pref l JOIN pref r ON l.s = r.s AND l.doc_id < r.doc_id)
         |SELECT a, b, round(j, 6) AS jaccard FROM (
         |  SELECT c.a, c.b,
         |    CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |      / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE) AS j
         |  FROM cands c
         |  JOIN sets sa ON sa.doc_id = c.a
         |  JOIN sets sb ON sb.doc_id = c.b)
         |WHERE j >= 0.8""".stripMargin,

    "q68_histogram" ->
      """SELECT event_type AS etype, CAST(floor(value / 50) AS BIGINT) AS bucket,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS bucket_cents
        |FROM events GROUP BY 1, 2""".stripMargin,

    // DuckDB's min_by/max_by reject struct ordering keys — the unique
    // (c, event_id) tie-break is mirrored through row_number instead.
    "q69_argmax" ->
      """WITH x AS (
        |  SELECT user_id, event_id, CAST(round(value*100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT user_id, event_id, c,
        |         row_number() OVER (PARTITION BY user_id ORDER BY c DESC, event_id DESC) AS rd,
        |         row_number() OVER (PARTITION BY user_id ORDER BY c ASC, event_id ASC) AS ra
        |  FROM x)
        |SELECT user_id,
        |  max(CASE WHEN rd = 1 THEN event_id END) AS top_event_id,
        |  max(CASE WHEN rd = 1 THEN c END) AS top_cents,
        |  max(CASE WHEN ra = 1 THEN event_id END) AS bottom_event_id
        |FROM r GROUP BY 1""".stripMargin,

    "q66_tfidf_rank" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |                                    t -> len(t) > 0)) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
        |         CAST(tf.tf * length(bin(nd.n_docs // dfreq.df)) AS BIGINT) AS score
        |  FROM tf JOIN dfreq USING (token), nd)
        |SELECT doc_id, CAST(rank AS INTEGER) AS rank, token, tf, df, score FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |                               ORDER BY score DESC, token) AS rank
        |  FROM scored)
        |WHERE rank <= 3""".stripMargin,

    "q67_quality_filter" ->
      """WITH sig AS (
        |  SELECT lang,
        |    CAST(len(w) AS INTEGER) AS n_tokens,
        |    CASE WHEN len(w) > 0
        |         THEN CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE) / CAST(len(w) AS DOUBLE)
        |         ELSE 0.0 END AS mean_token_len,
        |    CASE WHEN length(text) > 0
        |         THEN CAST(length(text) - length(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)
        |         ELSE 0.0 END AS punct_ratio,
        |    CASE WHEN len(w) > 0
        |         THEN CAST(len(list_filter(w, t -> list_contains([STOPWORDS], t))) AS DOUBLE) / CAST(len(w) AS DOUBLE)
        |         ELSE 0.0 END AS stopword_ratio
        |  FROM (SELECT lang, text,
        |          list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS w
        |        FROM documents))
        |SELECT lang,
        |  CASE WHEN n_tokens < 5 THEN 'too_short'
        |       WHEN mean_token_len > 12.0 THEN 'tokens_too_long'
        |       WHEN punct_ratio > 0.2 THEN 'too_much_punct'
        |       WHEN stopword_ratio < 0.01 THEN 'no_stopwords'
        |       ELSE 'keep' END AS reason,
        |  count(*) AS n
        |FROM sig GROUP BY 1, 2""".stripMargin
        .replace("STOPWORDS", allStopwordsSqlList),

    "q65_regexp_all" ->
      """SELECT w, count(*) AS n, count(DISTINCT doc_id) AS n_docs FROM (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]*ing')) AS w
        |  FROM documents)
        |GROUP BY 1 HAVING count(*) >= 5""".stripMargin,

    "q64_corr" ->
      """WITH a AS (
        |  SELECT event_type AS etype, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
        |    CAST(sum(x*y) AS BIGINT) AS sxy
        |  FROM (SELECT event_type, CAST(round(value*100) AS BIGINT) AS x,
        |               CAST(hour(ts) AS BIGINT) AS y
        |        FROM events)
        |  GROUP BY 1)
        |SELECT etype, n, sx, sy, sxx, syy, sxy,
        |  (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |    / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |       * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS corr_xy
        |FROM a""".stripMargin,

    "q42_hll_distinct" -> Sketches.hllDistinctSql(
      "(SELECT event_type AS etype, user_id FROM events) src",
      "CAST(user_id AS VARCHAR)", Seq("etype")),

    "q43_interval_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) // 1000000 AS ep
        |           FROM events WHERE event_type = 'purchase'),
        |w AS (SELECT user_id, epoch_us(ts) // 1000000 AS lo
        |      FROM events WHERE event_type = 'error')
        |SELECT p.event_id, p.user_id, count(*) AS n_windows
        |FROM p JOIN w ON p.user_id = w.user_id
        |             AND p.ep >= w.lo AND p.ep <= w.lo + 3600
        |GROUP BY 1, 2""".stripMargin,

    "q44_moments" ->
      """WITH a AS (
        |  SELECT event_type AS etype, count(*) AS n,
        |    CAST(sum(c) AS BIGINT) AS sum_cents,
        |    CAST(sum(c*c) AS BIGINT) AS sumsq_cents,
        |    CAST(min(c) AS BIGINT) AS min_cents,
        |    CAST(max(c) AS BIGINT) AS max_cents
        |  FROM (SELECT event_type, CAST(round(value*100) AS BIGINT) AS c FROM events)
        |  GROUP BY 1)
        |SELECT etype, n, sum_cents, sumsq_cents, min_cents, max_cents,
        |  CAST(sum_cents AS DOUBLE) / n AS mean_cents,
        |  CASE WHEN n > 1 THEN (CAST(sumsq_cents AS DOUBLE) - CAST(sum_cents AS DOUBLE) * CAST(sum_cents AS DOUBLE) / n) / (n - 1) END AS var_cents,
        |  CASE WHEN n > 1 THEN sqrt((CAST(sumsq_cents AS DOUBLE) - CAST(sum_cents AS DOUBLE) * CAST(sum_cents AS DOUBLE) / n) / (n - 1)) END AS stddev_cents
        |FROM a""".stripMargin,

    "q45_window_nav" ->
      """SELECT user_id, event_id,
        |  lead(event_id) OVER w AS next_id,
        |  first_value(event_id) OVER wf AS first_id,
        |  last_value(event_id) OVER wf AS last_id,
        |  nth_value(event_id, 2) OVER wf AS second_id,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |  wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,

    "q46_simhash_neardup" ->
      s"""WITH sims AS ($simhashSql),
         |pairs AS (
         |  SELECT l.doc_id AS a, r.doc_id AS b,
         |         CAST(bit_count(xor(l.simhash, r.simhash)) AS INTEGER) AS hamming
         |  FROM sims l JOIN sims r ON l.doc_id < r.doc_id
         |  WHERE bit_count(xor(l.simhash, r.simhash)) <= 3)
         |SELECT hamming, count(*) AS n_pairs,
         |       CAST(min(a) AS BIGINT) AS min_a, CAST(max(b) AS BIGINT) AS max_b
         |FROM pairs GROUP BY 1""".stripMargin,

    "q47_tf_df" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |                                    t -> len(t) > 0)) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1)
        |SELECT tf.doc_id, tf.token, tf.tf, dfreq.df
        |FROM tf JOIN dfreq USING (token)
        |WHERE tf.tf >= 4""".stripMargin,

    // Chunking runs over the hex encoding (2 chars/byte) so the same
    // md5-per-chunk construction works without BLOB slicing.
    "q48_media_chunks" ->
      """WITH h AS (
        |  SELECT doc_id AS media_id, to_hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS nb
        |  FROM documents WHERE octet_length(encode(text)) > 0)
        |SELECT media_id, CAST(u.i AS BIGINT) AS chunk_idx,
        |       md5(substring(hx, CAST(u.i * 32 + 1 AS INTEGER), 32)) AS fp,
        |       CAST(length(substring(hx, CAST(u.i * 32 + 1 AS INTEGER), 32)) / 2 AS INTEGER) AS chunk_octets
        |FROM h, UNNEST(generate_series(0, (nb - 1) // 16)) AS u(i)""".stripMargin,

    // Epoch→timestamp via DATE arithmetic, NOT to_timestamp(): casting
    // a TIMESTAMPTZ to naive TIMESTAMP goes through DuckDB's session
    // TimeZone, which the harness does not pin — this form is TZ-free.
    "q49_tumbling_window" ->
      """SELECT TIMESTAMP '1970-01-01 00:00:00' + b * INTERVAL 21600 SECOND AS w_start,
        |       TIMESTAMP '1970-01-01 00:00:00' + (b + 1) * INTERVAL 21600 SECOND AS w_end,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM (SELECT epoch_us(ts) // 1000000 // 21600 AS b, value FROM events)
        |GROUP BY b""".stripMargin,

    "q50_grouping_sets" ->
      """SELECT event_type AS etype, CAST(month(ts) AS INTEGER) AS m,
        |       CAST(GROUPING(event_type) AS INTEGER) AS g_etype,
        |       CAST(GROUPING(month(ts)) AS INTEGER) AS g_m,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (month(ts)), ())""".stripMargin,

    "q52_salted_agg" ->
      """SELECT user_id, count(*) AS n,
        |       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM events GROUP BY 1""".stripMargin,

    // Session end = last event + gap (exclusive), new session at
    // gap >= 1 h — the session_window rule, NOT q06's > rule. The gap
    // compares EXACT microsecond epochs (Spark sessionizes at full
    // precision; second-floored gaps would split/merge differently
    // when fractional seconds straddle the boundary); only the OUTPUT
    // start_s/end_s floor to seconds.
    "q61_session_window" ->
      """WITH x AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |         CAST(round(value*100) AS BIGINT) AS c
        |  FROM events),
        |y AS (
        |  SELECT user_id, us, c,
        |         lag(us) OVER (PARTITION BY user_id ORDER BY us) AS prev_us
        |  FROM x),
        |z AS (
        |  SELECT user_id, us, c,
        |         CASE WHEN prev_us IS NULL OR us - prev_us >= 3600000000 THEN 1 ELSE 0 END AS st
        |  FROM y),
        |g AS (
        |  SELECT user_id, us, c,
        |         SUM(st) OVER (PARTITION BY user_id ORDER BY us
        |                       ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM z)
        |SELECT user_id,
        |       CAST(min(us) // 1000000 AS BIGINT) AS start_s,
        |       CAST(max(us) // 1000000 + 3600 AS BIGINT) AS end_s,
        |       count(*) AS n_events,
        |       CAST(sum(c) AS BIGINT) AS session_cents
        |FROM g GROUP BY user_id, grp""".stripMargin,

    "q59_upsert" ->
      """WITH prior AS (
        |  SELECT user_id, count(*) AS n,
        |         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE ts < TIMESTAMP '2024-01-25 00:00:00' GROUP BY 1),
        |fresh AS (
        |  SELECT user_id, count(*) AS n,
        |         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-25 00:00:00' GROUP BY 1)
        |SELECT coalesce(f.user_id, p.user_id) AS user_id,
        |       CASE WHEN f.n IS NOT NULL THEN f.n ELSE p.n END AS n,
        |       CASE WHEN f.n IS NOT NULL THEN f.cents ELSE p.cents END AS cents
        |FROM prior p FULL OUTER JOIN fresh f ON p.user_id = f.user_id""".stripMargin,

    "q60_trailing_window" ->
      """SELECT user_id, event_id, ep,
        |  CAST(sum(c) OVER w AS BIGINT) AS trail7_cents,
        |  CAST(count(*) OVER w AS BIGINT) AS trail7_n
        |FROM (SELECT user_id, event_id, epoch_us(ts) // 1000000 AS ep,
        |             CAST(round(value*100) AS BIGINT) AS c
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ep
        |             RANGE BETWEEN 604799 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q56_json_surface" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_path,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_schema,
        |  to_json(struct_pack(u := user_id, t := event_type)) AS packed
        |FROM events""".stripMargin,

    "q57_gapfill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_day
        |  FROM events GROUP BY 1, 2),
        |cal AS (
        |  SELECT user_id,
        |         CAST(unnest(generate_series(CAST(min(day) AS TIMESTAMP),
        |                                     CAST(max(day) AS TIMESTAMP),
        |                                     INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM daily GROUP BY user_id)
        |SELECT c.user_id, c.day, coalesce(d.n_day, 0) AS n_day
        |FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day""".stripMargin,

    // The identical blocked semantics: same blocks, same threshold,
    // same (dist, right_id) top-2 — via a window, which is fine at
    // oracle scale.
    "q58_edit_distance" ->
      """WITH d AS (
        |  SELECT doc_id, lang, substr(text, 1, 40) AS head,
        |         substr(text, 1, 4) AS pfx
        |  FROM documents WHERE lang = 'en'),
        |c AS (
        |  SELECT l.doc_id AS left_id, r.doc_id AS right_id,
        |         levenshtein(l.head, r.head) AS dist
        |  FROM d l JOIN d r
        |    ON l.lang = r.lang AND l.pfx = r.pfx
        |   AND l.doc_id % 2 = 0 AND r.doc_id % 2 = 1
        |  WHERE levenshtein(l.head, r.head) <= 20),
        |k AS (
        |  SELECT left_id, right_id, dist,
        |    row_number() OVER (PARTITION BY left_id
        |      ORDER BY dist, right_id) AS rank
        |  FROM c QUALIFY rank <= 2)
        |SELECT left_id, CAST(rank AS INTEGER) AS rank,
        |       CAST(dist AS INTEGER) AS dist, right_id
        |FROM k""".stripMargin,

    // Transitive closure by recursive CTE — tractable because the
    // sf0.01 near-dup graph is tiny; the Spark side scales via
    // per-round shuffles instead.
    "q54_dedup_clusters" ->
      s"""WITH RECURSIVE $dedupClosureCtes
         |SELECT component, count(*) AS n_members,
         |       CAST(max(id) AS BIGINT) AS max_id
         |FROM comp GROUP BY 1""".stripMargin,

    "q62_dedup_corpus" ->
      s"""WITH RECURSIVE $dedupClosureCtes,
         |exact_losers AS (
         |  SELECT doc_id AS id FROM (
         |    SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep
         |    FROM documents)
         |  WHERE doc_id <> keep),
         |losers AS (
         |  SELECT id FROM comp WHERE id <> component
         |  UNION SELECT id FROM exact_losers)
         |SELECT d.lang, count(*) AS n_kept,
         |       CAST(sum(d.doc_id) AS BIGINT) AS id_sum
         |FROM documents d LEFT JOIN losers l ON d.doc_id = l.id
         |WHERE l.id IS NULL
         |GROUP BY 1""".stripMargin,

    "q55_split_counts" ->
      """SELECT lang,
        |  CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
        |       WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n, CAST(min(doc_id) AS BIGINT) AS min_id
        |FROM documents GROUP BY 1, 2""".stripMargin,

    "q53_ivf_lloyd" ->
      s"""WITH $ivfAsgCtes
         |SELECT cell, CAST(u.i - 1 AS INTEGER) AS dim_idx, count(*) AS n,
         |       CAST(sum(qv[u.i]) AS DOUBLE) / count(*) AS centroid_q
         |FROM asg, UNNEST(generate_series(1, len(qv))) AS u(i)
         |GROUP BY 1, 2""".stripMargin,

    "q51_array_surface" ->
      """WITH q AS (
        |  SELECT vec_id,
        |         list_transform(embedding,
        |           e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS qv
        |  FROM embeddings)
        |SELECT vec_id,
        |  CAST(len(qv) AS INTEGER) AS dim,
        |  CAST(list_max(qv) AS BIGINT) AS qmax,
        |  CAST(list_min(qv) AS BIGINT) AS qmin,
        |  CAST(list_position(qv, list_max(qv)) AS INTEGER) AS argmax1,
        |  CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS l1,
        |  CAST(list_sum(list_transform(generate_series(1, len(qv)),
        |       i -> qv[i] * qv[len(qv) + 1 - i])) AS BIGINT) AS rev_dot
        |FROM q""".stripMargin,

    "q76_sequence_pack" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |         t -> len(t) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_tokens
        |  FROM d)
        |SELECT source,
        |  CAST(floor((run_tokens - n_tokens) / 2048) AS BIGINT) AS pack_id,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
        |FROM r GROUP BY 1, 2""".stripMargin,

    "q77_contamination" ->
      s"""WITH sets AS (${shingleSetsSql("")}),
        |tr AS (SELECT doc_id, sh, CAST(len(sh) AS BIGINT) AS n_shingles
        |       FROM sets WHERE doc_id % 20 <> 0 AND len(sh) > 0),
        |ev AS (SELECT DISTINCT s FROM
        |        (SELECT unnest(sh) AS s FROM sets
        |         WHERE doc_id % 20 = 0 AND len(sh) > 0)),
        |cont AS (
        |  SELECT t.doc_id, count(*) AS n_contaminated
        |  FROM (SELECT doc_id, unnest(sh) AS s FROM tr) t
        |  JOIN ev ON t.s = ev.s
        |  GROUP BY 1)
        |SELECT tr.doc_id, tr.n_shingles,
        |  CAST(COALESCE(c.n_contaminated, 0) AS BIGINT) AS n_contaminated,
        |  round(CAST(COALESCE(c.n_contaminated, 0) AS DOUBLE)
        |        / tr.n_shingles, 6) AS containment
        |FROM tr LEFT JOIN cont c ON tr.doc_id = c.doc_id""".stripMargin,

    "q78_pii_scrub" ->
      s"""WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |         THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
        |              || '@example.com or 555-123-4567 ref 1234567890'
        |         ELSE text END AS text
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, text,
        |    regexp_replace(regexp_replace(regexp_replace(text,
        |      '${graft.operators.Training.EmailPattern}', '<EMAIL>', 'g'),
        |      '${graft.operators.Training.PhonePattern}', '<PHONE>', 'g'),
        |      '${graft.operators.Training.LongDigitPattern}', '<ID>', 'g')
        |      AS text_scrubbed
        |  FROM d)
        |SELECT doc_id, text_scrubbed, (text_scrubbed <> text) AS changed
        |FROM s""".stripMargin,

    "q79_shard_assign" ->
      """SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |         AS BIGINT) % 32 AS shard,
        |  count(*) AS n_docs,
        |  CAST(sum(len(list_filter(string_split_regex(lower(text), '\s+'),
        |       t -> len(t) > 0))) AS BIGINT) AS n_tokens,
        |  CAST(min(doc_id) AS BIGINT) AS min_id
        |FROM documents GROUP BY 1""".stripMargin,

    "q80_sentence_dedup" ->
      """WITH w0 AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                             t -> len(t) > 0) AS w
        |  FROM documents),
        |d AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(generate_series(0, (len(w)-1)//8),
        |      i -> array_to_string(list_slice(w, i*8+1, i*8+8), ' ')),
        |      '. ') AS text
        |  FROM w0),
        |p AS (SELECT doc_id, string_split(text, '. ') AS parts FROM d),
        |s AS (SELECT doc_id,
        |        unnest(generate_series(1, len(parts))) AS pos,
        |        unnest(parts) AS sent
        |      FROM p),
        |k AS (SELECT doc_id, pos, sent,
        |        row_number() OVER (PARTITION BY sent ORDER BY doc_id, pos) AS rn
        |      FROM s WHERE len(sent) > 0)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |  string_agg(sent, '. ' ORDER BY pos) AS text_deduped
        |FROM k WHERE rn = 1 GROUP BY doc_id""".stripMargin,

    "q81_rule_filter" ->
      ("WITH " + ruleFilterChainSql("documents") + """
        |SELECT doc_id, n_tokens, reasons, keep FROM rf""".stripMargin),

    "q82_importance_resample" ->
      """WITH rated AS (
        |  SELECT doc_id,
        |    CASE WHEN len(list_filter(string_split_regex(lower(text), '\s+'),
        |                              t -> len(t) > 0)) >= 40
        |         THEN 90 ELSE 25 END AS rate_percent
        |  FROM documents)
        |SELECT doc_id, CAST(rate_percent AS INTEGER) AS rate_percent
        |FROM rated
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |           AS BIGINT) % 100 < rate_percent""".stripMargin,

    "q83_repetition" ->
      """WITH di AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 9 = 0
        |         THEN text || repeat(' click here buy now', 12)
        |         ELSE text END AS text
        |  FROM documents),
        |w0 AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                                  t -> len(t) > 0) AS w FROM di),
        |g2 AS (SELECT doc_id,
        |         unnest(CASE WHEN len(w) < 2 THEN CAST([] AS VARCHAR[])
        |           ELSE list_transform(generate_series(0, len(w)-2),
        |                  i -> array_to_string(list_slice(w, i+1, i+2), ' '))
        |           END) AS g
        |       FROM w0),
        |c2 AS (SELECT doc_id, count(*) AS c, count(*)*len(g) AS chars
        |       FROM g2 GROUP BY doc_id, g),
        |a2 AS (SELECT doc_id, CAST(max(chars) AS DOUBLE)/sum(chars) AS top2
        |       FROM c2 GROUP BY doc_id),
        |g3 AS (SELECT doc_id,
        |         unnest(CASE WHEN len(w) < 3 THEN CAST([] AS VARCHAR[])
        |           ELSE list_transform(generate_series(0, len(w)-3),
        |                  i -> array_to_string(list_slice(w, i+1, i+3), ' '))
        |           END) AS g
        |       FROM w0),
        |c3 AS (SELECT doc_id, count(*) AS c, count(*)*len(g) AS chars
        |       FROM g3 GROUP BY doc_id, g),
        |a3 AS (SELECT doc_id,
        |         CAST(sum(CASE WHEN c >= 2 THEN chars ELSE 0 END) AS DOUBLE)
        |           / sum(chars) AS dup3
        |       FROM c3 GROUP BY doc_id)
        |SELECT d.doc_id,
        |  round(COALESCE(a2.top2, 0.0), 6) AS top_2gram_frac,
        |  round(COALESCE(a3.dup3, 0.0), 6) AS dup_3gram_frac,
        |  (round(COALESCE(a2.top2, 0.0), 6) > 0.20
        |   OR round(COALESCE(a3.dup3, 0.0), 6) > 0.18) AS flagged
        |FROM di d
        |LEFT JOIN a2 ON d.doc_id = a2.doc_id
        |LEFT JOIN a3 ON d.doc_id = a3.doc_id""".stripMargin,

    // Intentional divergence from the engine on GAP data: the oracle's
    // `FROM s JOIN w` silently drops a source missing from the weights
    // table, while mixtureRebalance raise_errors on it (fail-loud
    // contract). The synthetic weights CTE below covers every source by
    // construction, so the two sides agree on all bench datasets; a
    // future dataset with uncovered sources would fail in the ENGINE
    // first, never as a silent parity mismatch.
    "q84_mixture" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |         t -> len(t) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents),
        |s AS (SELECT source, sum(n_tokens) AS src_tokens FROM d GROUP BY 1),
        |w AS (SELECT source,
        |        (CAST(substr(source, 4) AS INTEGER) % 5) + 1 AS weight
        |      FROM (SELECT DISTINCT source FROM documents)),
        |tw AS (SELECT sum(weight) AS w_total FROM w),
        |r AS (SELECT s.source,
        |        CAST(floor(LEAST(100.0, CAST(w.weight AS DOUBLE) * 30000 * 100
        |             / (CAST(tw.w_total AS DOUBLE) * CAST(s.src_tokens AS DOUBLE))))
        |          AS INTEGER) AS rate_percent
        |      FROM s JOIN w ON s.source = w.source, tw),
        |kept AS (
        |  SELECT d.doc_id, d.source, r.rate_percent, d.n_tokens
        |  FROM d JOIN r ON d.source = r.source
        |  WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
        |             AS BIGINT) % 100 < r.rate_percent)
        |SELECT source, rate_percent, count(*) AS n_kept,
        |  CAST(sum(n_tokens) AS BIGINT) AS kept_tokens
        |FROM kept GROUP BY 1, 2""".stripMargin,

    "q85_diversity_cap" ->
      s"""WITH $ivfAsgCtes
        |SELECT vec_id, cell, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT a.vec_id, a.cell,
        |    row_number() OVER (PARTITION BY a.cell ORDER BY
        |      CAST(('0x' || substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 15))
        |           AS BIGINT), a.vec_id) AS rk
        |  FROM asg a)
        |WHERE rk <= 40""".stripMargin,

    "q86_decontaminate" ->
      s"""WITH sets AS (${shingleSetsSql("")}),
        |tr AS (SELECT doc_id, sh, CAST(len(sh) AS BIGINT) AS n_shingles
        |       FROM sets WHERE doc_id % 20 <> 0 AND len(sh) > 0),
        |ev AS (SELECT DISTINCT s FROM
        |        (SELECT unnest(sh) AS s FROM sets
        |         WHERE doc_id % 20 = 0 AND len(sh) > 0)),
        |cont AS (
        |  SELECT t.doc_id, count(*) AS n_cont
        |  FROM (SELECT doc_id, unnest(sh) AS s FROM tr) t
        |  JOIN ev ON t.s = ev.s
        |  GROUP BY 1),
        |bad AS (
        |  SELECT tr.doc_id
        |  FROM tr LEFT JOIN cont c ON tr.doc_id = c.doc_id
        |  WHERE round(CAST(COALESCE(c.n_cont, 0) AS DOUBLE)
        |              / tr.n_shingles, 6) > 0.5)
        |SELECT doc_id, source, n_chars FROM documents
        |WHERE doc_id % 20 <> 0
        |  AND doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin,

    "q87_epoch_shuffle" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |         AS BIGINT) % 8 AS shard,
        |    CAST(('0x' || substr(md5('e2:' || CAST(doc_id AS VARCHAR)), 1, 15))
        |         AS BIGINT) AS k
        |  FROM documents)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
        |       AS BIGINT) AS pos
        |FROM s""".stripMargin,

    "q88_nfc_normalize" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0
        |         THEN text || ' cafe' || chr(769) || ' nai' || chr(776) || 've'
        |         ELSE text END AS text
        |  FROM documents),
        |n AS (SELECT doc_id, text, nfc_normalize(text) AS nfc FROM d)
        |SELECT doc_id, (nfc <> text) AS changed,
        |  CAST(length(text) AS INTEGER) AS len_raw,
        |  CAST(length(nfc) AS INTEGER) AS len_nfc,
        |  substr(md5(nfc), 1, 8) AS h8
        |FROM n""".stripMargin,

    "q89_repeated_spans" ->
      """WITH w0 AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                                       t -> len(t) > 0) AS w
        |            FROM documents),
        |g AS (SELECT doc_id,
        |        unnest(generate_series(1, len(w)-8+1)) AS pos,
        |        unnest(CASE WHEN len(w) < 8 THEN CAST([] AS VARCHAR[])
        |          ELSE list_transform(generate_series(0, len(w)-8),
        |                 i -> array_to_string(list_slice(w, i+1, i+8), ' '))
        |          END) AS gram
        |      FROM w0),
        |rep AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
        |p AS (SELECT g.doc_id, g.pos FROM g JOIN rep ON g.gram = rep.gram),
        |isl AS (SELECT doc_id, pos,
        |         CASE WHEN pos > lag(pos, 1, -1000000)
        |                OVER (PARTITION BY doc_id ORDER BY pos) + 8
        |              THEN 1 ELSE 0 END AS brk
        |        FROM p),
        |sp AS (SELECT doc_id, pos,
        |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
        |       FROM isl),
        |agg AS (SELECT doc_id, span_id, min(pos) AS s, max(pos) AS e
        |        FROM sp GROUP BY 1, 2),
        |per AS (SELECT doc_id, count(*) AS n_spans,
        |          CAST(sum(e - s + 8) AS BIGINT) AS dup_tokens
        |        FROM agg GROUP BY 1)
        |SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(per.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(COALESCE(per.dup_tokens, 0) AS BIGINT) AS dup_tokens,
        |  round(CAST(COALESCE(per.dup_tokens, 0) AS DOUBLE) / len(d.w), 6)
        |    AS dup_frac
        |FROM w0 d LEFT JOIN per ON d.doc_id = per.doc_id""".stripMargin,

    "q90_collocations" ->
      """WITH w0 AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                                       t -> len(t) > 0) AS w
        |            FROM documents),
        |uc AS (SELECT tok, count(*) AS c
        |       FROM (SELECT unnest(w) AS tok FROM w0) GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uc),
        |bc AS (SELECT bigram, count(*) AS c_xy FROM (
        |         SELECT unnest(CASE WHEN len(w) < 2 THEN CAST([] AS VARCHAR[])
        |           ELSE list_transform(generate_series(0, len(w)-2),
        |                  i -> array_to_string(list_slice(w, i+1, i+2), ' '))
        |           END) AS bigram
        |         FROM w0)
        |       GROUP BY 1 HAVING count(*) >= 35)
        |SELECT bc.bigram, bc.c_xy, ux.c AS c_x, uy.c AS c_y,
        |  round((CAST(bc.c_xy AS DOUBLE) * CAST(n.n AS DOUBLE))
        |        / (CAST(ux.c AS DOUBLE) * CAST(uy.c AS DOUBLE)), 6) AS pmi_ratio
        |FROM bc, n
        |JOIN uc ux ON string_split(bc.bigram, ' ')[1] = ux.tok
        |JOIN uc uy ON string_split(bc.bigram, ' ')[2] = uy.tok""".stripMargin,

    // range(1, len) is end-exclusive → positions 1..len-1, and the
    // len >= 2 filter mirrors the Spark side (where sequence(1, 0)
    // would count DOWN instead of yielding empty).
    "q91_bpe_pairs" ->
      """WITH toks AS (
        |  SELECT u.tok
        |  FROM documents d,
        |    UNNEST(list_filter(string_split_regex(lower(d.text), '\s+'),
        |                       t -> len(t) > 0)) AS u(tok)
        |  WHERE len(u.tok) >= 2),
        |pairs AS (
        |  SELECT substring(t.tok, CAST(r.i AS INT), 2) AS pair
        |  FROM toks t, UNNEST(range(1, len(t.tok))) AS r(i))
        |SELECT pair, count(*) AS cnt
        |FROM pairs GROUP BY 1
        |ORDER BY cnt DESC, pair ASC LIMIT 20""".stripMargin,

    "q93_source_overlap" ->
      s"""WITH bands AS ($minhashBandsSql),
         |cands AS (
         |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |  FROM bands l JOIN bands r
         |    ON l.band_id = r.band_id AND l.band_key = r.band_key
         |  WHERE l.doc_id < r.doc_id),
         |sets AS (${shingleSetsSql("")}),
         |nd AS (
         |  SELECT c.a, c.b
         |  FROM cands c
         |  JOIN sets sa ON sa.doc_id = c.a
         |  JOIN sets sb ON sb.doc_id = c.b
         |  WHERE len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
         |    AND CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |        / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE)
         |        >= 0.6)
         |SELECT least(da.source, db.source) AS src_x,
         |  greatest(da.source, db.source) AS src_y,
         |  count(*) AS n_pairs
         |FROM nd
         |JOIN documents da ON da.doc_id = nd.a
         |JOIN documents db ON db.doc_id = nd.b
         |GROUP BY 1, 2""".stripMargin,

    "q94_incremental_dedup" ->
      s"""WITH bands AS ($minhashBandsSql),
         |newb AS (SELECT * FROM bands WHERE doc_id % 5 <> 0),
         |oldb AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
         |sets AS (${shingleSetsSql("")}),
         |cand_c AS (
         |  SELECT DISTINCT n.doc_id AS nid, o.doc_id AS oid
         |  FROM newb n JOIN oldb o
         |    ON n.band_id = o.band_id AND n.band_key = o.band_key),
         |ver_c AS (
         |  SELECT c.nid, c.oid FROM cand_c c
         |  JOIN sets sa ON sa.doc_id = c.nid
         |  JOIN sets sb ON sb.doc_id = c.oid
         |  WHERE len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
         |    AND CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |        / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE)
         |        >= 0.6),
         |cand_b AS (
         |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |  FROM newb l JOIN newb r
         |    ON l.band_id = r.band_id AND l.band_key = r.band_key
         |  WHERE l.doc_id < r.doc_id),
         |ver_b AS (
         |  SELECT c.a, c.b FROM cand_b c
         |  JOIN sets sa ON sa.doc_id = c.a
         |  JOIN sets sb ON sb.doc_id = c.b
         |  WHERE len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
         |    AND CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |        / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE)
         |        >= 0.6),
         |dmin AS (
         |  SELECT doc_id, min(dup_of) AS dup_of FROM (
         |    SELECT nid AS doc_id, oid AS dup_of FROM ver_c
         |    UNION ALL SELECT b AS doc_id, a AS dup_of FROM ver_b)
         |  GROUP BY 1)
         |SELECT d.doc_id, (m.doc_id IS NULL) AS keep, m.dup_of
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 <> 0) d
         |LEFT JOIN dmin m ON d.doc_id = m.doc_id""".stripMargin,

    "q92_rare_tokens" ->
      s"""WITH $rarityCtes
         |SELECT doc_id, n_tokens, n_rare, rare_frac FROM rare"""
        .stripMargin,

    // Mirrors Web.canonicalizeUrl step-for-step. DuckDB's RE2 has no
    // lookbehind, so the trailing-slash strip is a CASE on the root
    // path instead of the Spark side's (?<=.)/$ — same result.
    "q95_url_dedup" ->
      """WITH u AS (
        |  SELECT doc_id, CASE
        |    WHEN doc_id % 10 = 9 THEN 'no-scheme.example/path'
        |    WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.Example.COM:443/docs/'
        |      || CAST(doc_id // 2 AS VARCHAR) || '/?utm_source=feed&ref=a&b=2#frag'
        |    ELSE 'https://www.example.com/docs/'
        |      || CAST(doc_id // 2 AS VARCHAR) || '?b=2&ref=a' END AS url
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, regexp_replace(url, '#.*$', '') AS nf FROM u),
        |x AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS auth,
        |    regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$', 1) AS rest
        |  FROM p),
        |y AS (
        |  SELECT doc_id, scheme, auth,
        |    CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
        |         WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
        |         ELSE auth END AS auth_np,
        |    regexp_extract(rest, '^([^?]*)', 1) AS path0,
        |    regexp_extract(rest, '\?(.*)$', 1) AS qs
        |  FROM x),
        |z AS (
        |  SELECT doc_id, scheme, auth, auth_np,
        |    CASE WHEN path0 = '/' THEN '/'
        |         ELSE regexp_replace(path0, '/$', '') END AS path,
        |    list_sort(list_filter(string_split(qs, '&'),
        |      q -> len(q) > 0 AND NOT starts_with(q, 'utm_'))) AS params
        |  FROM y),
        |c AS (
        |  SELECT doc_id,
        |    CASE WHEN scheme = '' OR auth = '' THEN NULL
        |         ELSE scheme || '://' || auth_np || path ||
        |           CASE WHEN len(params) > 0
        |                THEN '?' || array_to_string(params, '&') ELSE '' END
        |    END AS canonical_url
        |  FROM z)
        |SELECT min(doc_id) AS doc_id, canonical_url,
        |  CAST(count(*) AS BIGINT) AS n_variants
        |FROM c WHERE canonical_url IS NOT NULL
        |GROUP BY canonical_url""".stripMargin,

    "q96_chunk_overlap" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |    (greatest(len(toks) - 16, 0) + 11) // 12 + 1 AS n_chunks
        |  FROM tk WHERE len(toks) > 0),
        |c AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
        |    CAST(i * 12 + 1 AS INTEGER) AS start_tok,
        |    list_slice(toks, i * 12 + 1, i * 12 + 16) AS chunk
        |  FROM n, UNNEST(generate_series(0, n_chunks - 1)) AS u(i))
        |SELECT doc_id, chunk_idx, start_tok,
        |  CAST(len(chunk) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(chunk, ' ')) AS chunk_hash
        |FROM c""".stripMargin,

    // Integer micro-nat quantization the moment the weight leaves ln()
    // — doc scores are then exact integer sums, order-free in both
    // engines (the SparkEntry numeric-determinism policy).
    "q97_dsir_weights" ->
      """WITH occ AS (
        |  SELECT d.doc_id, (d.source = 'src0') AS is_t,
        |    CAST(('0x' || substr(md5(u.tok), 1, 15)) AS BIGINT) % 256 AS b
        |  FROM documents d,
        |    UNNEST(list_filter(string_split_regex(lower(d.text), '\s+'),
        |                       t -> len(t) > 0)) AS u(tok)),
        |counts AS (
        |  SELECT b, CAST(count(*) AS BIGINT) AS c_raw,
        |    CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS c_t
        |  FROM occ GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(c_raw) AS BIGINT) AS n_raw,
        |    CAST(sum(c_t) AS BIGINT) AS n_t FROM counts),
        |w AS (
        |  SELECT b, CAST(round(1e6 * ln(
        |      (CAST(c_t + 1 AS DOUBLE) / CAST(n_t + 256 AS DOUBLE)) /
        |      (CAST(c_raw + 1 AS DOUBLE) / CAST(n_raw + 256 AS DOUBLE))))
        |    AS BIGINT) AS w
        |  FROM counts, tot)
        |SELECT occ.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(w.w) AS BIGINT) AS score_micro,
        |  round(CAST(sum(w.w) AS DOUBLE) / 1e6 / count(*), 6) AS per_token
        |FROM occ JOIN w USING (b) GROUP BY 1""".stripMargin,

    "q98_cdc_chunks" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos, toks[i] AS tok,
        |    CASE WHEN CAST(('0x' || substr(md5(toks[i]), 1, 15)) AS BIGINT)
        |              % 8 = 0 THEN 1 ELSE 0 END AS cut
        |  FROM tk, UNNEST(generate_series(1, len(toks))) AS u(i)),
        |ck AS (
        |  SELECT doc_id, pos, tok,
        |    COALESCE(sum(cut) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
        |  FROM pos),
        |chunks AS (
        |  SELECT doc_id, chunk_id,
        |    CAST(count(*) AS BIGINT) AS c_tokens,
        |    md5(string_agg(tok, ' ' ORDER BY pos)) AS digest
        |  FROM ck GROUP BY 1, 2),
        |occ AS (SELECT digest, count(*) AS occ FROM chunks GROUP BY 1)
        |SELECT c.doc_id,
        |  CAST(sum(c.c_tokens) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN o.occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS dup_chunks,
        |  CAST(sum(CASE WHEN o.occ > 1 THEN c.c_tokens ELSE 0 END) AS BIGINT)
        |    AS dup_tokens,
        |  round(CAST(sum(CASE WHEN o.occ > 1 THEN c.c_tokens ELSE 0 END)
        |          AS DOUBLE) / sum(c.c_tokens), 6) AS dup_frac
        |FROM chunks c JOIN occ o USING (digest) GROUP BY 1""".stripMargin,

    // Mirrors pqCodebook/pqEncode/pqTopK: codes are row_number ranks of
    // the 16 lowest-id seed vectors; every distance is exact-integer
    // (nsq_a + nsq_c − 2·dot), so ADC sums and ranks are bit-stable.
    // CTEs shared with q131's recall gate (pqAdcCtes).
    "q99_pq_knn" ->
      s"""WITH $pqAdcCtes
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, adc_dist
        |FROM (SELECT query_id, neighbor_id, adc_dist,
        |        row_number() OVER (PARTITION BY query_id
        |          ORDER BY adc_dist, neighbor_id) AS rank
        |      FROM adc)
        |WHERE rank <= 10""".stripMargin,

    "q100_vocab_stats" ->
      """WITH tok AS (
        |  SELECT source,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |           t -> len(t) > 0)) AS tok
        |  FROM documents),
        |tc AS (SELECT source, tok, count(*) AS c FROM tok GROUP BY 1, 2)
        |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  count(*) AS n_types,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |  round(CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
        |    AS type_token_ratio,
        |  round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS hapax_frac
        |FROM tc GROUP BY 1""".stripMargin,

    // Parallel unnests zip positionally in DuckDB, so (v, dim_idx)
    // mirrors Spark's posexplode over the same quantized vectors.
    "q101_kmeans_stats" ->
      s"""WITH $ivfAsgCtes,
         |ex AS (
         |  SELECT cell, unnest(qv) AS v,
         |         unnest(generate_series(1, len(qv))) AS dim_idx
         |  FROM asg),
         |pd AS (
         |  SELECT cell, dim_idx, count(*) AS n,
         |         CAST(sum(v) AS BIGINT) AS s,
         |         CAST(sum(v*v) AS BIGINT) AS ss
         |  FROM ex GROUP BY 1, 2),
         |ag AS (
         |  SELECT cell, max(n) AS n,
         |    sum(CAST(n AS HUGEINT) * CAST(ss AS HUGEINT)
         |        - CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS wss_num
         |  FROM pd GROUP BY 1)
         |SELECT cell, n,
         |  round(CAST(wss_num AS DOUBLE) / CAST(n AS DOUBLE) / 1e12, 6) AS wss
         |FROM ag""".stripMargin,

    "q102_semdedup" ->
      s"""WITH $ivfAsgCtes,
         |d AS (
         |  SELECT r.vec_id
         |  FROM asg l JOIN asg r ON l.cell = r.cell AND l.vec_id < r.vec_id
         |  WHERE CAST(list_sum(list_transform(generate_series(1, len(l.qv)),
         |          i -> l.qv[i]*r.qv[i])) AS DOUBLE)
         |        / (sqrt(CAST(l.nsq AS DOUBLE)) * sqrt(CAST(r.nsq AS DOUBLE)))
         |        >= 0.35
         |  GROUP BY 1)
         |SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS kept
         |FROM asg a LEFT JOIN d ON a.vec_id = d.vec_id""".stripMargin,

    "q103_lm_perplexity" ->
      s"""WITH $lmNllCtes
         |SELECT doc_id, n_bigrams, nll FROM nlltab""".stripMargin,

    "q104_curriculum" ->
      s"""WITH $lmNllCtes,
         |s AS (
         |  SELECT n.doc_id, d.source, n.nll
         |  FROM nlltab n JOIN documents d USING (doc_id)),
         |r AS (
         |  SELECT doc_id, source, nll,
         |    row_number() OVER (PARTITION BY source ORDER BY nll, doc_id)
         |      AS rk,
         |    count(*) OVER (PARTITION BY source) AS cnt
         |  FROM s)
         |SELECT source, doc_id, nll, rk AS rank,
         |  CAST(((rk - 1) * 3) // cnt AS INTEGER) AS bucket
         |FROM r""".stripMargin,

    "q105_hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id,
        |         list_transform(embedding, e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS qv
        |  FROM embeddings WHERE vec_id < 10),
        |c AS (
        |  SELECT vec_id AS neighbor_id,
        |         list_transform(embedding, e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS cv
        |  FROM embeddings),
        |n1 AS (SELECT query_id, qv,
        |         CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i]*qv[i])) AS BIGINT) AS qn
        |       FROM q),
        |n2 AS (SELECT neighbor_id, cv,
        |         CAST(list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i]*cv[i])) AS BIGINT) AS cn
        |       FROM c),
        |sc AS (
        |  SELECT query_id, neighbor_id,
        |         CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i]*cv[i])) AS BIGINT) AS dot,
        |         qn, cn
        |  FROM n1, n2 WHERE query_id <> neighbor_id),
        |r AS (
        |  SELECT query_id, neighbor_id,
        |         CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS sim
        |  FROM sc),
        |k AS (
        |  SELECT query_id, neighbor_id, sim,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM r WHERE sim >= 0.1 AND sim < 0.3)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim
        |FROM k WHERE rank <= 8""".stripMargin,

    // Constants appear as the same runtime IEEE ops the engine runs:
    // (1.2 + 1), (1 - 0.75) — never pre-folded decimals.
    "q106_bm25" ->
      ("WITH " + bm25ChainSql + """
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, n_terms,
        |  score
        |FROM bmr WHERE rank <= 10""".stripMargin),

    "q107_group_quantiles" ->
      """WITH s AS (
        |  SELECT source,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |         t -> len(t) > 0)) AS BIGINT) AS n_tokens,
        |    doc_id
        |  FROM documents),
        |r AS (
        |  SELECT source, n_tokens,
        |    row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id)
        |      AS rk,
        |    count(*) OVER (PARTITION BY source) AS cnt
        |  FROM s)
        |SELECT source, q.q AS q, n_tokens
        |FROM r, (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q) q
        |WHERE rk = CAST(ceil(q.q * cnt) AS BIGINT)""".stripMargin,

    "q108_mean_pool" ->
      """WITH v AS (
        |  SELECT vec_id // 10 AS parent_id,
        |    list_transform(embedding,
        |      e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |ex AS (
        |  SELECT parent_id, unnest(qv) AS v,
        |         CAST(unnest(generate_series(0, len(qv) - 1)) AS INT)
        |           AS dim_idx
        |  FROM v)
        |SELECT parent_id, dim_idx,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(round(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) / 1e6
        |    AS mean
        |FROM ex GROUP BY 1, 2""".stripMargin,

    "q109_weighted_sample" ->
      """WITH s AS (
        |  SELECT source, doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |         t -> len(t) > 0)) AS BIGINT) AS w
        |  FROM documents),
        |k AS (
        |  SELECT source, doc_id,
        |    CAST(round(1e6 * ln(
        |        (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |              AS BIGINT) + 1)
        |        / CAST(1152921504606846976 AS DOUBLE))) AS BIGINT)
        |      / CAST(w AS DOUBLE) AS key
        |  FROM s WHERE w > 0),
        |r AS (
        |  SELECT source, doc_id, key,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY key DESC, doc_id) AS rank
        |  FROM k)
        |SELECT source, doc_id, key, rank FROM r WHERE rank <= 20""".stripMargin,

    "q113_winsorize" ->
      """WITH s AS (
        |  SELECT source,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |         t -> len(t) > 0)) AS BIGINT) AS n_tokens,
        |    doc_id
        |  FROM documents),
        |r AS (
        |  SELECT source, n_tokens,
        |    row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id)
        |      AS rk,
        |    count(*) OVER (PARTITION BY source) AS cnt
        |  FROM s),
        |b AS (
        |  SELECT source,
        |    min(CASE WHEN rk = CAST(ceil(0.05 * cnt) AS BIGINT)
        |             THEN n_tokens END) AS lo,
        |    min(CASE WHEN rk = CAST(ceil(0.95 * cnt) AS BIGINT)
        |             THEN n_tokens END) AS hi
        |  FROM r GROUP BY 1)
        |SELECT s.source, s.n_tokens, s.doc_id, b.lo, b.hi,
        |  greatest(least(s.n_tokens, b.hi), b.lo) AS clipped
        |FROM s JOIN b USING (source)""".stripMargin,

    "q112_robust_z" ->
      """WITH s AS (
        |  SELECT source,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |         t -> len(t) > 0)) AS BIGINT) AS n_tokens,
        |    doc_id
        |  FROM documents),
        |r AS (
        |  SELECT source, n_tokens, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id)
        |      AS rk,
        |    count(*) OVER (PARTITION BY source) AS cnt
        |  FROM s),
        |med AS (SELECT source, n_tokens AS med FROM r
        |        WHERE rk = CAST(ceil(0.5 * cnt) AS BIGINT)),
        |d AS (
        |  SELECT s.source, s.doc_id, s.n_tokens, med.med,
        |         abs(s.n_tokens - med.med) AS dev
        |  FROM s JOIN med USING (source)),
        |r2 AS (
        |  SELECT source, dev,
        |    row_number() OVER (PARTITION BY source ORDER BY dev, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY source) AS cnt
        |  FROM d),
        |mad AS (SELECT source, dev AS mad FROM r2
        |        WHERE rk = CAST(ceil(0.5 * cnt) AS BIGINT))
        |SELECT d.source, d.doc_id, d.n_tokens, d.med, mad.mad,
        |  CASE WHEN mad.mad > 0 THEN
        |    CAST(round(1e6 * CAST(d.n_tokens - d.med AS DOUBLE)
        |         / CAST(mad.mad AS DOUBLE)) AS BIGINT) / 1e6
        |  END AS z
        |FROM d JOIN mad USING (source)""".stripMargin,

    "q111_knn_confusion" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id,
        |         list_transform(embedding, e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS qv
        |  FROM embeddings WHERE vec_id < 100),
        |c AS (
        |  SELECT vec_id AS neighbor_id,
        |         list_transform(embedding, e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS cv
        |  FROM embeddings),
        |n1 AS (SELECT query_id, qv,
        |         CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i]*qv[i])) AS BIGINT) AS qn
        |       FROM q),
        |n2 AS (SELECT neighbor_id, cv,
        |         CAST(list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i]*cv[i])) AS BIGINT) AS cn
        |       FROM c),
        |sc AS (
        |  SELECT query_id, neighbor_id,
        |         CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i]*cv[i])) AS BIGINT) AS dot,
        |         qn, cn
        |  FROM n1, n2 WHERE query_id <> neighbor_id),
        |r AS (
        |  SELECT query_id, neighbor_id,
        |         CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS sim
        |  FROM sc),
        |topk AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        |    FROM r) WHERE rank <= 10),
        |votes AS (
        |  SELECT t.query_id, e.label AS nl, count(*) AS v
        |  FROM topk t JOIN embeddings e ON t.neighbor_id = e.vec_id
        |  GROUP BY 1, 2),
        |pred AS (
        |  SELECT query_id, nl AS pred_label FROM (
        |    SELECT query_id, nl,
        |           row_number() OVER (PARTITION BY query_id ORDER BY v DESC, nl) AS rn
        |    FROM votes) WHERE rn = 1)
        |SELECT e.label, p.pred_label, count(*) AS n
        |FROM pred p JOIN embeddings e ON p.query_id = e.vec_id
        |GROUP BY 1, 2""".stripMargin,

    "q110_bpe_encode" -> bpeOracleSql(10),

    "q114_quantile_sketch" -> graft.operators.Sketches.lhQuantilesSql(
      "documents",
      """CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |         t -> len(t) > 0)) AS BIGINT)""".stripMargin,
      Seq("source"), Seq(0.5, 0.9, 0.99)),

    "q117_hll_overlap" -> graft.operators.Sketches.hllOverlapSql(
      table = """(SELECT source,
                |   unnest(list_filter(string_split_regex(lower(text), '\s+'),
                |     t -> len(t) > 0)) AS tok
                | FROM documents)""".stripMargin,
      keySql = "tok", groupCol = "source"),

    "q116_bloom_membership" -> graft.operators.Sketches.bloomSql(
      fromSql = "SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders",
      keysSql = "SELECT CAST(c_custkey AS VARCHAR) AS k FROM customer",
      groupCols = Nil),

    "q115_cm_heavy_hitters" -> graft.operators.Sketches.cmEstimateSql(
      fromSql =
        """SELECT source, unnest(list_filter(string_split_regex(lower(text), '\s+'),
          |    t -> len(t) > 0)) AS k FROM documents""".stripMargin,
      keysSql =
        """SELECT source, k FROM (
          |    SELECT source, k,
          |      row_number() OVER (PARTITION BY source
          |        ORDER BY c DESC, k) AS r
          |    FROM (SELECT source, k, count(*) AS c FROM occ GROUP BY 1, 2))
          |  WHERE r <= 5""".stripMargin,
      groupCols = Seq("source")),

    "q119_pagerank" -> pageRankOracleSql(5),

    "q129_weighted_pagerank" -> weightedPageRankOracleSql(5),

    // Same candidate edges (already a < b distinct); wedge on the low
    // node, close on the (y, z) edge, explode corners.
    "q128_triangles" ->
      s"""WITH bands AS ($minhashBandsSql),
         |e AS (
         |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |  FROM bands l JOIN bands r
         |    ON l.band_id = r.band_id AND l.band_key = r.band_key
         |  WHERE l.doc_id < r.doc_id),
         |w AS (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b),
         |t AS (
         |  SELECT w.x, w.y, w.z
         |  FROM w JOIN e ON e.a = w.y AND e.b = w.z),
         |n AS (SELECT unnest([x, y, z]) AS doc_id FROM t)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
         |FROM n GROUP BY doc_id""".stripMargin,

    "q124_ann_recall" -> annRecallSql,

    "q130_lsh_recall" -> lshRecallSql,

    "q131_pq_recall" -> pqRecallSql,

    "q132_label_propagation" -> labelPropagationOracleSql(3),

    // The q112 two-pass robust-z replay over daily (user, day) counts,
    // same type-1 ⌈n/2⌉ selections, same micro-quantized z, |z| ≥ 3.
    "q134_rate_anomaly" ->
      """WITH h AS (
        |  SELECT user_id,
        |         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, n, day,
        |    row_number() OVER (PARTITION BY user_id ORDER BY n, day) AS rk,
        |    count(*) OVER (PARTITION BY user_id) AS cnt
        |  FROM h),
        |med AS (SELECT user_id, n AS med FROM r
        |        WHERE rk = CAST(ceil(0.5 * cnt) AS BIGINT)),
        |d AS (
        |  SELECT h.user_id, h.day, h.n, med.med,
        |         abs(h.n - med.med) AS dev
        |  FROM h JOIN med USING (user_id)),
        |r2 AS (
        |  SELECT user_id, dev,
        |    row_number() OVER (PARTITION BY user_id ORDER BY dev, day) AS rk,
        |    count(*) OVER (PARTITION BY user_id) AS cnt
        |  FROM d),
        |mad AS (SELECT user_id, dev AS mad FROM r2
        |        WHERE rk = CAST(ceil(0.5 * cnt) AS BIGINT)),
        |z AS (
        |  SELECT d.user_id, d.day, d.n, d.med, mad.mad,
        |    CASE WHEN mad.mad > 0 THEN
        |      CAST(round(1e6 * CAST(d.n - d.med AS DOUBLE)
        |           / CAST(mad.mad AS DOUBLE)) AS BIGINT) / 1e6
        |    END AS z
        |  FROM d JOIN mad USING (user_id))
        |SELECT user_id, day, n, med, mad, z FROM z
        |WHERE z IS NOT NULL AND abs(z) >= 3.0""".stripMargin,

    // Same literal rules VALUES, same eTLD+1 domain, same
    // 2·len+isAllow winner and default-allow.
    "q150_robots_filter" ->
      """WITH u AS (
        |  SELECT doc_id, CASE
        |    WHEN doc_id % 5 = 0 THEN 'https://news.example.co.uk/a/'
        |      || CAST(doc_id // 7 AS VARCHAR)
        |    WHEN doc_id % 5 = 1 THEN 'https://blog.example.com/p/'
        |      || CAST(doc_id // 7 AS VARCHAR)
        |    WHEN doc_id % 5 = 2 THEN 'https://example.com/p/'
        |      || CAST(doc_id // 7 AS VARCHAR)
        |    WHEN doc_id % 5 = 3 THEN 'http://mirror.site.org:80/x/'
        |      || CAST(doc_id // 7 AS VARCHAR)
        |    ELSE 'not a url' END AS url
        |  FROM documents),
        |rules AS (
        |  SELECT * FROM (VALUES
        |    ('example.com', 'disallow', '/p/'),
        |    ('example.com', 'allow', '/p/1'),
        |    ('example.co.uk', 'disallow', '/a/4'),
        |    ('site.org', 'disallow', '/x/'),
        |    ('site.org', 'allow', '/x/')) r(domain, directive, prefix)),
        |h AS (
        |  SELECT doc_id, url,
        |    list_filter(string_split(lower(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]+)', 1)),
        |      '.'), x -> len(x) > 0) AS ls,
        |    regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)', 1) AS path
        |  FROM u),
        |d AS (
        |  SELECT doc_id, url, path,
        |    CASE WHEN len(ls) < 2 THEN NULL
        |         WHEN len(ls) >= 3
        |              AND ls[len(ls)-1] IN
        |                ('co','com','net','org','ac','gov','edu')
        |              AND len(ls[len(ls)]) = 2
        |           THEN array_to_string(
        |             list_slice(ls, len(ls)-2, len(ls)), '.')
        |         ELSE array_to_string(
        |             list_slice(ls, len(ls)-1, len(ls)), '.') END AS domain
        |  FROM h),
        |j AS (
        |  SELECT d.doc_id, d.url, d.domain,
        |    CASE WHEN r.prefix IS NOT NULL
        |              AND starts_with(d.path, r.prefix)
        |      THEN len(r.prefix) * 2
        |        + CASE WHEN r.directive = 'allow' THEN 1 ELSE 0 END
        |    END AS score,
        |    r.directive = 'allow' AS is_allow
        |  FROM d LEFT JOIN rules r ON d.domain = r.domain
        |  WHERE d.domain IS NOT NULL)
        |SELECT doc_id, url, domain,
        |  coalesce(arg_max(is_allow, score), TRUE) AS allowed
        |FROM j GROUP BY doc_id, url, domain""".stripMargin,

    // NOTE: the robots oracles CONCATENATE pre-stripped fragments —
    // robotsParseSql contains '|| chr(13)' continuation lines that a
    // second stripMargin would mangle.
    "q151_robots_parse" ->
      ("WITH " + robotsParseSql +
        "\nSELECT domain, directive, prefix FROM rules"),

    "q152_robots_crawl" ->
      ("WITH " + robotsParseSql + ",\n" + crawlUrlPathDomainSql + ",\n" +
        robotsVerdictSql +
        "\nSELECT doc_id, url, domain, allowed FROM verdicts"),

    "q153_psl_domain" ->
      """WITH pslr AS (
        |  SELECT * FROM (VALUES ('com'),('io'),('github.io'),('uk'),
        |    ('co.uk'),('us'),('k12.ma.us'),('pvt.k12.ma.us'),('jp'),
        |    ('*.kawasaki.jp'),('!city.kawasaki.jp'),('*.bd'),('br'),
        |    ('com.br')) p(rule)),
        |pr AS (
        |  SELECT CASE WHEN starts_with(rule, '!') THEN 2
        |              WHEN starts_with(rule, '*.') THEN 1 ELSE 0 END AS kind,
        |         CASE WHEN starts_with(rule, '!') THEN substr(rule, 2)
        |              WHEN starts_with(rule, '*.') THEN substr(rule, 3)
        |              ELSE rule END AS key
        |  FROM pslr),
        |u AS (
        |  SELECT doc_id, CASE
        |    WHEN doc_id % 8 = 0 THEN 'https://alpha.github.io/r/'
        |      || CAST(doc_id // 7 AS VARCHAR)
        |    WHEN doc_id % 8 = 1 THEN 'https://shop.com.br/p/'
        |      || CAST(doc_id // 7 AS VARCHAR)
        |    WHEN doc_id % 8 = 2 THEN 'https://news.example.co.uk/a/'
        |      || CAST(doc_id // 7 AS VARCHAR)
        |    WHEN doc_id % 8 = 3 THEN 'https://x.pvt.k12.ma.us/s/'
        |      || CAST(doc_id // 7 AS VARCHAR)
        |    WHEN doc_id % 8 = 4 THEN 'https://a.b.bd/z/'
        |      || CAST(doc_id // 7 AS VARCHAR)
        |    WHEN doc_id % 8 = 5 THEN 'https://w.city.kawasaki.jp/k/'
        |      || CAST(doc_id // 7 AS VARCHAR)
        |    WHEN doc_id % 8 = 6 THEN 'https://www.example.com/i/'
        |      || CAST(doc_id // 7 AS VARCHAR)
        |    ELSE 'not a url' END AS url
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, url,
        |    list_filter(string_split(lower(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]+)', 1)),
        |      '.'), x -> len(x) > 0) AS ls
        |  FROM u),
        |hh AS (SELECT doc_id, url, ls, len(ls) AS n FROM h),
        |c AS (
        |  SELECT doc_id, n, k,
        |    array_to_string(list_slice(ls, n - k + 1, n), '.') AS cand
        |  FROM hh, UNNEST(generate_series(1, n)) AS g(k)),
        |m AS (
        |  SELECT c.doc_id,
        |    arg_max(CASE WHEN pr.kind = 2 THEN c.k - 1
        |                 WHEN pr.kind = 1 THEN c.k + 1 ELSE c.k END,
        |            CASE WHEN pr.kind = 2 THEN 1 ELSE 0 END * 100
        |              + CASE WHEN pr.kind = 2 THEN c.k - 1
        |                     WHEN pr.kind = 1 THEN c.k + 1
        |                     ELSE c.k END) AS win
        |  FROM c JOIN pr ON c.cand = pr.key
        |  WHERE NOT (pr.kind = 1 AND c.k + 1 > c.n)
        |  GROUP BY c.doc_id),
        |r AS (
        |  SELECT hh.doc_id, hh.url, hh.ls, hh.n,
        |    coalesce(m.win, 1) AS pslen
        |  FROM hh LEFT JOIN m ON hh.doc_id = m.doc_id),
        |f AS (
        |  SELECT doc_id, url,
        |    CASE WHEN n > pslen
        |      THEN array_to_string(list_slice(ls, n - pslen, n), '.')
        |    END AS domain_psl,
        |    CASE WHEN n < 2 THEN NULL
        |         WHEN n >= 3 AND ls[n-1] IN
        |             ('co','com','net','org','ac','gov','edu')
        |              AND len(ls[n]) = 2
        |           THEN array_to_string(list_slice(ls, n-2, n), '.')
        |         ELSE array_to_string(list_slice(ls, n-1, n), '.')
        |    END AS domain_heur
        |  FROM r)
        |SELECT doc_id, url, domain_heur, domain_psl,
        |  NOT (domain_heur IS NOT DISTINCT FROM domain_psl) AS diverges
        |FROM f""".stripMargin,

    // Golden-row oracle: each fixture's repaired form is pinned
    // literally (C1 controls via chr()), so the DuckDB side needs no
    // charset machinery — the Spark side runs the general repair.
    "q154_fix_encoding" ->
      """SELECT doc_id,
        |  CASE doc_id % 6
        |    WHEN 0 THEN 'cafÃ© au lait'
        |    WHEN 1 THEN 'naÃ¯ve rÃ©sumÃ©'
        |    WHEN 2 THEN 'itâ€™s â€œquotedâ€' || chr(157) || ' here'
        |    WHEN 3 THEN 'å¤§ä¸' || chr(128) || ' text'
        |    WHEN 4 THEN 'plain ascii stays'
        |    ELSE 'déjà vu 中文' END AS raw,
        |  CASE doc_id % 6
        |    WHEN 0 THEN 'café au lait'
        |    WHEN 1 THEN 'naïve résumé'
        |    WHEN 2 THEN 'it’s “quoted” here'
        |    WHEN 3 THEN '大一 text'
        |    WHEN 4 THEN 'plain ascii stays'
        |    ELSE 'déjà vu 中文' END AS fixed,
        |  doc_id % 6 <= 3 AS is_moji
        |FROM documents""".stripMargin,

    // Composition oracle: parse CTEs + verdict CTEs + the window-form
    // cap + successor-link edges + 3 unrolled PR rounds, all
    // MATERIALIZED fragments other oracles already exercise.
    "q155_crawl_frontier" ->
      ("WITH " + robotsParseSql + ",\n" +
        crawlUrlPathDomainSql + ",\n" +
        robotsVerdictSql + ",\n" +
        crawlUrlChainSql("doc_id + 1", "s") + ",\n" +
        """allowed AS (
          |  SELECT v.doc_id, v.domain, dd.n_chars
          |  FROM verdicts v JOIN d dd USING (doc_id)
          |  WHERE v.allowed),
          |capped AS (
          |  SELECT domain, doc_id, n_chars, rn AS pos FROM (
          |    SELECT domain, doc_id, n_chars,
          |      row_number() OVER (PARTITION BY domain
          |        ORDER BY n_chars DESC, doc_id) AS rn
          |    FROM allowed) t
          |  WHERE rn <= 25),
          |edges AS MATERIALIZED (
          |  SELECT DISTINCT d.domain AS src, sd.domain AS dst
          |  FROM d JOIN sd USING (doc_id)
          |  WHERE d.domain IS NOT NULL AND sd.domain IS NOT NULL
          |    AND d.domain <> sd.domain),
          |nodes AS MATERIALIZED (
          |  SELECT src AS node FROM edges
          |  UNION SELECT dst AS node FROM edges),
          |outdeg AS MATERIALIZED (
          |  SELECT src, CAST(count(*) AS BIGINT) AS deg
          |  FROM edges GROUP BY src),
          |r0 AS MATERIALIZED (
          |  SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes)"""
          .stripMargin + ",\n" +
        prRoundsSql(3).mkString(",\n") + "\n" +
        """SELECT c.domain, c.pos, c.n_chars, c.doc_id,
          |  r3.rank AS domain_rank
          |FROM capped c LEFT JOIN r3 ON r3.node = c.domain"""
          .stripMargin),

    // The MG membership guarantee makes the sketch side drop out of
    // the oracle: the gate's answer IS the exact-heavy set.
    "q156_mg_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> len(t) > 0)) AS tok FROM documents),
        |tot AS (SELECT count(*) AS n FROM toks)
        |SELECT tok, CAST(count(*) AS BIGINT) AS cnt
        |FROM toks, tot
        |GROUP BY tok, n
        |HAVING count(*) * 65 > n""".stripMargin,

    // Same TZ-free epoch→timestamp form as q49; IGNORE NULLS windows
    // mirror Spark's last/first(ignoreNulls) fills exactly.
    "q157_gap_fill" ->
      """WITH obs AS (
        |  SELECT user_id,
        |    (epoch_us(ts) // 1000000 // 21600) * 21600 AS b,
        |    avg(value) AS v
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY 1, 2),
        |span AS (SELECT user_id, min(b) AS lo, max(b) AS hi
        |         FROM obs GROUP BY 1),
        |grid AS (
        |  SELECT user_id, CAST(u.g AS BIGINT) AS b
        |  FROM span, UNNEST(generate_series(lo, hi, 21600)) AS u(g)),
        |j AS (
        |  SELECT g.user_id, g.b, o.v FROM grid g
        |  LEFT JOIN obs o ON g.user_id = o.user_id AND g.b = o.b),
        |w AS (
        |  SELECT user_id, b, v,
        |    last_value(v IGNORE NULLS) OVER pw AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
        |      OVER pw AS pb,
        |    first_value(v IGNORE NULLS) OVER fw AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
        |      OVER fw AS nb
        |  FROM j
        |  WINDOW pw AS (PARTITION BY user_id ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    fw AS (PARTITION BY user_id ORDER BY b
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id,
        |  TIMESTAMP '1970-01-01 00:00:00' + b * INTERVAL 1 SECOND
        |    AS bucket_start,
        |  v IS NOT NULL AS observed,
        |  round(v, 6) AS value_obs,
        |  round(pv, 6) AS value_locf,
        |  round(CASE WHEN v IS NOT NULL THEN v
        |             WHEN nv IS NULL THEN pv
        |             ELSE pv + (nv - pv) *
        |               (CAST(b - pb AS DOUBLE) / (nb - pb))
        |        END, 6) AS value_interp
        |FROM w""".stripMargin,

    "q158_k_anonymity" ->
      """WITH g AS (
        |  SELECT 0 AS level, c_nationkey AS nat, c_mktsegment AS seg,
        |         CAST(floor(c_acctbal/100) AS BIGINT) AS bal
        |  FROM customer
        |  UNION ALL
        |  SELECT 1, c_nationkey, c_mktsegment,
        |         CAST(floor(c_acctbal/1000) AS BIGINT) FROM customer
        |  UNION ALL
        |  SELECT 2, NULL, c_mktsegment,
        |         CAST(floor(c_acctbal/1000) AS BIGINT) FROM customer),
        |cls AS (
        |  SELECT level, nat, seg, bal, count(*) AS n
        |  FROM g GROUP BY 1, 2, 3, 4)
        |SELECT CAST(level AS INTEGER) AS level,
        |  CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_sub_k_classes,
        |  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
        |    AS n_suppressed_rows,
        |  round(CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS DOUBLE)
        |        / sum(n), 6) AS suppression_frac
        |FROM cls GROUP BY level""".stripMargin,

    // q89's shingle idiom, extended to the rewrite: min-doc_id gram
    // owners, coverage of foreign grams, order-preserving re-join.
    "q159_span_scrub" ->
      """WITH w0 AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                                       t -> len(t) > 0) AS w
        |            FROM documents),
        |g AS (SELECT doc_id,
        |        unnest(generate_series(1, len(w)-8+1)) AS pos,
        |        unnest(CASE WHEN len(w) < 8 THEN CAST([] AS VARCHAR[])
        |          ELSE list_transform(generate_series(0, len(w)-8),
        |                 i -> array_to_string(list_slice(w, i+1, i+8), ' '))
        |          END) AS gram
        |      FROM w0),
        |own AS (SELECT gram, min(doc_id) AS own FROM g GROUP BY gram),
        |cov AS (SELECT DISTINCT g.doc_id, CAST(u.tp AS BIGINT) AS tp
        |        FROM g JOIN own USING (gram),
        |          UNNEST(generate_series(g.pos, g.pos + 7)) AS u(tp)
        |        WHERE g.doc_id > own.own),
        |tok AS (SELECT doc_id,
        |          unnest(generate_series(1, len(w))) AS tp,
        |          unnest(w) AS tok
        |        FROM w0),
        |reb AS (SELECT t.doc_id,
        |          count(*) AS n_kept,
        |          string_agg(t.tok, ' ' ORDER BY t.tp) AS text_clean
        |        FROM tok t LEFT JOIN cov c
        |          ON t.doc_id = c.doc_id AND t.tp = c.tp
        |        WHERE c.tp IS NULL
        |        GROUP BY t.doc_id)
        |SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_tokens,
        |  CAST(len(d.w) - COALESCE(reb.n_kept, 0) AS BIGINT) AS n_removed,
        |  round(CAST(len(d.w) - COALESCE(reb.n_kept, 0) AS DOUBLE)
        |        / len(d.w), 6) AS scrub_frac,
        |  substring(md5(COALESCE(reb.text_clean, '')), 1, 8) AS h8
        |FROM w0 d LEFT JOIN reb ON d.doc_id = reb.doc_id""".stripMargin,

    // q146's page synthesis + URL resolution, anchors carrying text;
    // the per-host cap as a plain window at oracle scale.
    "q160_anchor_text" ->
      """WITH m AS (
        |  SELECT doc_id, source,
        |    'https://' || source || '.example.com/docs/d'
        |      || CAST(doc_id AS VARCHAR) || '.html' AS base,
        |    '<html><body><p>' || text || '</p>'
        |    || '<a href="https://partner.example.org/ref?id='
        |      || CAST(doc_id AS VARCHAR) || '">'
        |      || array_to_string(list_slice(list_filter(
        |           string_split_regex(lower(text), '\s+'), t -> len(t) > 0),
        |           1, 2), ' ') || '</a>'
        |    || '<a href="//mirror.example.net/m/' || source
        |      || '">mirror ' || source || '</a>'
        |    || '<a href="/about">about us</a>'
        |    || '<a href="d' || CAST(doc_id + 1 AS VARCHAR)
        |      || '.html">read next</a>'
        |    || '<a href="mailto:ops@example.com">mail ops</a>'
        |    || '<a href="#top">top</a></body></html>' AS html
        |  FROM documents),
        |a AS (
        |  SELECT doc_id, base, regexp_extract_all(html,
        |    '(?i)<a\b[^>]*?\shref\s*=\s*["'']([^"''#>]*)(?:#[^"'']*)?["''][^>]*>([^<]*)',
        |    0) AS ms
        |  FROM m),
        |p AS (
        |  SELECT doc_id, base,
        |    regexp_extract(ms[i],
        |      '(?i)<a\b[^>]*?\shref\s*=\s*["'']([^"''#>]*)(?:#[^"'']*)?["''][^>]*>([^<]*)',
        |      1) AS href,
        |    regexp_extract(ms[i],
        |      '(?i)<a\b[^>]*?\shref\s*=\s*["'']([^"''#>]*)(?:#[^"'']*)?["''][^>]*>([^<]*)',
        |      2) AS txt
        |  FROM a, UNNEST(generate_series(1, len(ms))) AS u(i)),
        |b AS (
        |  SELECT doc_id, href, txt,
        |    regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) AS bscheme,
        |    regexp_extract(base,
        |      '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)', 1) AS borigin,
        |    regexp_replace(regexp_extract(base,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1),
        |      '[^/]*$', '') AS bdir
        |  FROM p),
        |r AS (
        |  SELECT txt,
        |    CASE
        |      WHEN href = '' THEN NULL
        |      WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*://')
        |        THEN href
        |      WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*:')
        |        THEN NULL
        |      WHEN starts_with(href, '//') THEN bscheme || ':' || href
        |      WHEN starts_with(href, '/') THEN borigin || href
        |      ELSE borigin
        |        || CASE WHEN bdir = '' THEN '/' ELSE bdir END || href
        |    END AS url
        |  FROM b),
        |tc AS (
        |  SELECT regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]+)', 1)
        |      AS host,
        |    unnest(list_filter(string_split_regex(lower(txt), '\s+'),
        |      t -> len(t) > 0)) AS term
        |  FROM r WHERE url IS NOT NULL),
        |cnt AS (SELECT host, term, count(*) AS cnt FROM tc GROUP BY 1, 2),
        |rk AS (SELECT host, term, cnt, row_number() OVER (
        |         PARTITION BY host ORDER BY cnt DESC, term) AS rank
        |       FROM cnt)
        |SELECT host, CAST(rank AS INTEGER) AS rank, term,
        |  CAST(cnt AS BIGINT) AS cnt
        |FROM rk WHERE rank <= 5""".stripMargin,

    "q161_phrase_search" ->
      """WITH ph AS (SELECT * FROM (VALUES
        |    (1, 'table table'), (2, 'value table part'),
        |    (3, 'agg join small'), (4, 'the quick brown'))
        |    AS v(phrase_id, ptext)),
        |ptok AS (SELECT phrase_id,
        |           list_filter(string_split_regex(lower(ptext), '\s+'),
        |             t -> len(t) > 0) AS w
        |         FROM ph),
        |pt AS (SELECT phrase_id,
        |         unnest(generate_series(1, len(w))) - 1 AS j,
        |         unnest(w) AS term, len(w) AS m
        |       FROM ptok),
        |w0 AS (SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '\s+'),
        |           t -> len(t) > 0) AS w
        |       FROM documents),
        |post AS (SELECT doc_id,
        |           unnest(generate_series(1, len(w))) - 1 AS pos,
        |           unnest(w) AS term
        |         FROM w0),
        |v AS (SELECT pt.phrase_id, post.doc_id,
        |        post.pos - pt.j AS start, pt.j, pt.m
        |      FROM post JOIN pt USING (term)
        |      WHERE post.pos - pt.j >= 0),
        |occ AS (SELECT phrase_id, doc_id, start, m,
        |          count(DISTINCT j) AS nj
        |        FROM v GROUP BY 1, 2, 3, 4),
        |hit AS (SELECT phrase_id, doc_id, start FROM occ WHERE nj = m)
        |SELECT phrase_id, doc_id, CAST(count(*) AS BIGINT) AS n_hits,
        |  CAST(min(start) AS BIGINT) AS first_pos
        |FROM hit GROUP BY 1, 2""".stripMargin,

    // KN probability assembled with the exact IEEE chain of
    // Corpus.knScore; micro-nat quantization per occurrence.
    "q162_kn_perplexity" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |         t -> len(t) > 0) AS toks
        |  FROM documents),
        |occ AS (
        |  SELECT doc_id, toks[u.i] || ' ' || toks[u.i+1] AS bigram,
        |         toks[u.i] AS x, toks[u.i+1] AS y
        |  FROM w, UNNEST(generate_series(1, len(toks)-1)) AS u(i)),
        |big AS (SELECT bigram, count(*) AS c_xy FROM occ GROUP BY 1),
        |sp AS (SELECT bigram, c_xy,
        |         string_split(bigram, ' ')[1] AS x,
        |         string_split(bigram, ' ')[2] AS y
        |       FROM big),
        |ctx AS (SELECT x, CAST(sum(c_xy) AS BIGINT) AS ctx,
        |          count(*) AS n1p_l
        |        FROM sp GROUP BY 1),
        |cont AS (SELECT y, count(*) AS n1p_r FROM sp GROUP BY 1),
        |tot AS (SELECT count(*) AS n1pp, count(DISTINCT y) AS cv FROM sp),
        |lp AS (
        |  SELECT occ.doc_id,
        |    CAST(round(1e6 * ln(
        |      CASE WHEN ctx.ctx IS NOT NULL THEN
        |        greatest(CAST(COALESCE(big.c_xy, 0) AS DOUBLE) - 0.75, 0.0)
        |          / CAST(ctx.ctx AS DOUBLE)
        |        + ((0.75 * CAST(ctx.n1p_l AS DOUBLE))
        |            / CAST(ctx.ctx AS DOUBLE))
        |          * (CAST(COALESCE(cont.n1p_r, 0) + 1 AS DOUBLE)
        |             / CAST(tot.n1pp + tot.cv AS DOUBLE))
        |      ELSE CAST(COALESCE(cont.n1p_r, 0) + 1 AS DOUBLE)
        |           / CAST(tot.n1pp + tot.cv AS DOUBLE)
        |      END)) AS BIGINT) AS lp
        |  FROM occ
        |  LEFT JOIN big USING (bigram)
        |  LEFT JOIN ctx USING (x)
        |  LEFT JOIN cont USING (y), tot)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(CAST(-sum(lp) AS DOUBLE) / 1e6
        |    / CAST(count(*) AS DOUBLE), 6) AS nll
        |FROM lp GROUP BY 1""".stripMargin,

    "q163_pit_enrich" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us
        |  FROM events),
        |dim AS (
        |  SELECT user_id, event_id AS dim_event_id, value AS dim_value,
        |    us AS valid_from_us,
        |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS valid_to_us
        |  FROM e WHERE event_type = 'signup'),
        |mx AS (SELECT max(us) AS mu FROM e),
        |d2 AS (
        |  SELECT user_id, dim_event_id, dim_value, valid_from_us,
        |    COALESCE(valid_to_us, mu + 1) - 1 AS hi_us
        |  FROM dim, mx),
        |f AS (SELECT user_id, event_id, us, value
        |      FROM e WHERE event_type = 'purchase')
        |SELECT f.user_id, f.event_id, d.dim_event_id,
        |  round(f.value, 6) AS fact_value,
        |  round(d.dim_value, 6) AS dim_value
        |FROM f JOIN d2 d ON f.user_id = d.user_id
        |  AND f.us >= d.valid_from_us AND f.us <= d.hi_us""".stripMargin,

    // q22's scoring chain over SQ-decoded corpus codes; the
    // encode/decode floor chain mirrors Similarity.sqTopK exactly.
    "q164_sq_knn" ->
      """WITH c0 AS (
        |  SELECT vec_id AS neighbor_id,
        |    list_transform(embedding,
        |      e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |st AS (
        |  SELECT d, min(v) AS lo, max(v) AS hi FROM (
        |    SELECT unnest(generate_series(1, len(qv))) AS d,
        |           unnest(qv) AS v
        |    FROM c0)
        |  GROUP BY d),
        |sa AS (SELECT list(lo ORDER BY d) AS lo,
        |              list(hi ORDER BY d) AS hi FROM st),
        |enc AS (
        |  SELECT neighbor_id,
        |    list_transform(generate_series(1, len(qv)), i ->
        |      CAST(sa.lo[i] + floor(CAST(
        |        (CASE WHEN sa.hi[i] = sa.lo[i] THEN 0
        |              ELSE floor(CAST((qv[i] - sa.lo[i]) * 255 AS DOUBLE)
        |                   / CAST(sa.hi[i] - sa.lo[i] AS DOUBLE)) END)
        |        * (sa.hi[i] - sa.lo[i]) AS DOUBLE) / 255.0)
        |        AS BIGINT)) AS cv
        |  FROM c0, sa),
        |q AS (
        |  SELECT vec_id AS query_id,
        |    list_transform(embedding,
        |      e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS qv
        |  FROM embeddings WHERE vec_id < 5),
        |n1 AS (SELECT query_id, qv,
        |         CAST(list_sum(list_transform(generate_series(1, len(qv)),
        |           i -> qv[i]*qv[i])) AS BIGINT) AS qn
        |       FROM q),
        |n2 AS (SELECT neighbor_id, cv,
        |         CAST(list_sum(list_transform(generate_series(1, len(cv)),
        |           i -> cv[i]*cv[i])) AS BIGINT) AS cn
        |       FROM enc),
        |sc AS (
        |  SELECT query_id, neighbor_id,
        |         CAST(list_sum(list_transform(generate_series(1, len(qv)),
        |           i -> qv[i]*cv[i])) AS BIGINT) AS dot,
        |         qn, cn
        |  FROM n1, n2 WHERE query_id <> neighbor_id),
        |r AS (
        |  SELECT query_id, neighbor_id,
        |         CAST(dot AS DOUBLE)
        |           / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE)))
        |           AS sim
        |  FROM sc),
        |k AS (
        |  SELECT query_id, neighbor_id, sim,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM r)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim
        |FROM k WHERE rank <= 10""".stripMargin,

    "q165_sitemap_parse" ->
      ("WITH " + robotsParseSql + """,
        |smb AS (SELECT * FROM (VALUES
        |  ('example.com',
        |   '<?xml version="1.0" encoding="UTF-8"?>' || chr(10) ||
        |   '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        |     || chr(10) ||
        |   ' <url>' || chr(10) || '  <loc>https://example.com/</loc>'
        |     || chr(10) ||
        |   '  <lastmod>2024-01-05</lastmod>' || chr(10) ||
        |   '  <priority>1.0</priority>' || chr(10) ||
        |   ' </url>' || chr(10) ||
        |   ' <url><loc> https://example.com/p?a=1&amp;b=2 </loc></url>'
        |     || chr(10) ||
        |   ' <URL><LOC>https://example.com/caps</LOC>'
        |     || '<lastmod>2024-02-01T10:00:00+00:00</lastmod></URL>'
        |     || chr(10) ||
        |   ' <url><lastmod>2024-03-01</lastmod></url>' || chr(10) ||
        |   '</urlset>'),
        |  ('example.co.uk',
        |   '<sitemapindex>' || chr(10) ||
        |   ' <sitemap><loc>https://example.co.uk/s1.xml</loc>'
        |     || '<lastmod>2024-01-01</lastmod></sitemap>' || chr(10) ||
        |   ' <sitemap>' || chr(10)
        |     || '  <loc>https://example.co.uk/s2.xml</loc>' || chr(10)
        |     || ' </sitemap>' || chr(10) ||
        |   '</sitemapindex>'),
        |  ('site.org', 'not xml at all')) b(domain, body)),
        |ub AS (
        |  SELECT domain, 'url' AS kind,
        |    unnest(regexp_extract_all(body,
        |      '(?is)<url\b[^>]*>(.*?)</url>', 1)) AS blk
        |  FROM smb
        |  UNION ALL
        |  SELECT domain, 'sitemap',
        |    unnest(regexp_extract_all(body,
        |      '(?is)<sitemap\b[^>]*>(.*?)</sitemap>', 1))
        |  FROM smb),
        |ex AS (
        |  SELECT domain, kind,
        |    trim(regexp_extract(blk, '(?is)<loc\b[^>]*>\s*(.*?)\s*</loc>', 1))
        |      AS rawloc,
        |    trim(regexp_extract(blk,
        |      '(?is)<lastmod\b[^>]*>\s*(.*?)\s*</lastmod>', 1)) AS lastmod0
        |  FROM ub),
        |sm AS (
        |  SELECT domain, kind,
        |    replace(replace(replace(replace(replace(rawloc,
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |      '&apos;', ''''), '&amp;', '&') AS loc,
        |    CASE WHEN lastmod0 = '' THEN NULL ELSE lastmod0 END AS lastmod
        |  FROM ex WHERE rawloc <> ''),
        |rref AS (
        |  SELECT domain,
        |    unnest(regexp_extract_all(
        |      regexp_replace(body, '^' || chr(65279), ''),
        |      '(?im)^\s*sitemap\s*:\s*(\S+)', 1)) AS loc
        |  FROM bodies)
        |SELECT domain, kind, loc, lastmod FROM sm
        |UNION ALL
        |SELECT domain, 'robots' AS kind, loc, NULL AS lastmod
        |FROM rref WHERE loc <> ''""".stripMargin),

    // Crawl-delay parse replayed with the q151 CTE machinery
    // (restricted to user-agent + crawl-delay fields), then the
    // schedule as a plain row_number window at oracle scale.
    "q166_politeness_schedule" ->
      ("""WITH dbod AS (
        |  SELECT * FROM (VALUES
        |    ('example.com', 'User-agent: *' || chr(10) ||
        |     'Crawl-delay: 1' || chr(10) || chr(10) ||
        |     'User-agent: GraftBot' || chr(10) || 'Crawl-delay: 5'
        |       || chr(10) || 'Disallow: /tmp/'),
        |    ('example.co.uk', 'User-agent: *' || chr(10) ||
        |     'Crawl-delay: fast' || chr(10) || 'Crawl-delay: 2.5'
        |       || chr(10) || 'Disallow: /a/'),
        |    ('site.org', 'User-agent: otherbot' || chr(10) ||
        |     'Crawl-delay: 9')
        |  ) b(domain, body)),
        |dln AS (
        |  SELECT domain, ls[i] AS raw, i AS lno
        |  FROM (SELECT domain, string_split_regex(
        |          regexp_replace(body, '^' || chr(65279), ''),
        |          '\r\n|\r|\n') AS ls
        |        FROM dbod), UNNEST(generate_series(1, len(ls))) AS u(i)),
        |dfd AS (
        |  SELECT domain, lno,
        |    lower(trim(regexp_extract(l, '^([^:]+):', 1))) AS field,
        |    trim(regexp_extract(l, '^[^:]*:(.*)$', 1)) AS value
        |  FROM (SELECT domain, lno, trim(regexp_replace(raw, '#.*$', ''))
        |          AS l FROM dln)),
        |dk AS (
        |  SELECT *, field = 'user-agent' AS isua FROM dfd
        |  WHERE field IN ('user-agent', 'crawl-delay')),
        |dg AS (
        |  SELECT *, sum(CASE WHEN isua AND (prevua IS NULL OR NOT prevua)
        |                     THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY domain ORDER BY lno
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
        |  FROM (SELECT *, lag(isua) OVER (PARTITION BY domain ORDER BY lno)
        |          AS prevua FROM dk)),
        |dsl AS (
        |  SELECT *,
        |    max(isua AND lower(value) = 'graftbot')
        |      OVER (PARTITION BY domain, gid) AS uaexact,
        |    max(isua AND value = '*') OVER (PARTITION BY domain, gid)
        |      AS uastar
        |  FROM dg),
        |ds2 AS (SELECT *, max(uaexact) OVER (PARTITION BY domain)
        |          AS hasexact FROM dsl),
        |delays AS (
        |  SELECT domain, max(TRY_CAST(value AS DOUBLE)) AS delay_sec
        |  FROM ds2
        |  WHERE gid >= 1 AND NOT isua
        |    AND (CASE WHEN hasexact THEN uaexact ELSE uastar END)
        |    AND regexp_matches(value, '^[0-9]+(\.[0-9]+)?$')
        |  GROUP BY domain),
        |""".stripMargin +
        crawlUrlPathDomainSql + """,
        |fr AS (SELECT domain, doc_id FROM d WHERE domain IS NOT NULL),
        |rp AS (SELECT domain, doc_id,
        |  row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS pos
        |  FROM fr)
        |SELECT rp.domain, rp.doc_id, CAST(rp.pos AS BIGINT) AS pos,
        |  coalesce(dl.delay_sec, CAST(1.0 AS DOUBLE)) AS delay_sec,
        |  (CAST(rp.pos AS BIGINT) - 1)
        |    * CAST(round(coalesce(dl.delay_sec, CAST(1.0 AS DOUBLE))
        |        * 1000) AS BIGINT) AS fetch_offset_ms
        |FROM rp LEFT JOIN delays dl USING (domain)""".stripMargin),

    // The same 5 peel rounds unrolled, then the closing degree census.
    "q167_kcore" ->
      ("""WITH eraw AS (
        |  SELECT doc_id AS src, doc_id + 1 AS dst FROM documents
        |  UNION ALL
        |  SELECT doc_id, 1000000000000 + doc_id % 97 FROM documents),
        |e0 AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM eraw WHERE src <> dst),
        |""".stripMargin + kCoreRoundsSql(5, 3).mkString(",\n") + "\n" +
        """SELECT node, CAST(count(*) AS BIGINT) AS core_deg
        |FROM (SELECT a AS node FROM e5 UNION ALL SELECT b FROM e5)
        |GROUP BY node""".stripMargin),

    // Blob rebuild (unhex ∥ encode) + hex-prefix signature match.
    "q169_content_sniff" ->
      """WITH b AS (
        |  SELECT doc_id, CASE doc_id % 8
        |    WHEN 0 THEN unhex('89504E470D0A1A0A')
        |    WHEN 1 THEN unhex('FFD8FFE000104A46')
        |    WHEN 2 THEN unhex('474946383961')
        |    WHEN 3 THEN unhex('255044462D312E37')
        |    WHEN 4 THEN unhex('524946462400000057415645')
        |    WHEN 5 THEN unhex('504B030414000000')
        |    WHEN 6 THEN unhex('1F8B080000000000')
        |    ELSE unhex('') END || encode(text) AS content
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, content,
        |    substr(hex(content), 1, 24) AS hx,
        |    substr(hex(content), 17, 8) AS fmt
        |  FROM b)
        |SELECT doc_id,
        |  CASE WHEN starts_with(hx, '89504E470D0A1A0A') THEN 'png'
        |       WHEN starts_with(hx, 'FFD8FF') THEN 'jpeg'
        |       WHEN starts_with(hx, '47494638') THEN 'gif'
        |       WHEN starts_with(hx, '255044462D') THEN 'pdf'
        |       WHEN starts_with(hx, '52494646') AND fmt = '57415645'
        |         THEN 'wav'
        |       WHEN starts_with(hx, '52494646') THEN 'riff'
        |       WHEN starts_with(hx, '504B0304') THEN 'zip'
        |       WHEN starts_with(hx, '1F8B') THEN 'gzip'
        |       ELSE 'unknown' END AS kind,
        |  CAST(octet_length(content) AS BIGINT) AS n_bytes
        |FROM h""".stripMargin,

    // Exact 64-dim brute force vs the 16-dim truncation, shared
    // quantized vectors (truncate-then-quantize ≡ quantize-then-
    // slice), then the standard recall rollup.
    "q170_matryoshka_recall" ->
      ("""WITH vv AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |nf AS (
        |  SELECT vec_id, qv,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)),
        |      i -> qv[i]*qv[i])) AS BIGINT) AS nsq
        |  FROM vv),
        |tv AS (SELECT vec_id, list_slice(qv, 1, 16) AS qv FROM vv),
        |nt AS (
        |  SELECT vec_id, qv,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)),
        |      i -> qv[i]*qv[i])) AS BIGINT) AS nsq
        |  FROM tv),
        |sce AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.qv)),
        |      i -> q.qv[i]*c.qv[i])) AS DOUBLE)
        |      / (sqrt(CAST(q.nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE)))
        |      AS sim
        |  FROM nf q, nf c WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
        |ex AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY sim DESC, neighbor_id) AS rank
        |    FROM sce)
        |  WHERE rank <= 10),
        |sca AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.qv)),
        |      i -> q.qv[i]*c.qv[i])) AS DOUBLE)
        |      / (sqrt(CAST(q.nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE)))
        |      AS sim
        |  FROM nt q, nt c WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
        |apx AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY sim DESC, neighbor_id) AS rank
        |    FROM sca)
        |  WHERE rank <= 10)
        |""".stripMargin + recallRollupSql),

    // md5 rank replayed as a window at oracle scale.
    "q171_per_key_sample" ->
      """SELECT source, CAST(rn AS INT) AS rank, h, doc_id FROM (
        |  SELECT source, doc_id, h,
        |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
        |      AS rn
        |  FROM (SELECT source, doc_id,
        |          md5(source || ':' || CAST(doc_id AS VARCHAR)) AS h
        |        FROM documents))
        |WHERE rn <= 10""".stripMargin,

    // Maximal-run extraction + the mod-10 arithmetic over reversed
    // digit lists.
    "q172_pan_census" ->
      """WITH raws AS (
        |  SELECT doc_id, text || CASE doc_id % 4
        |    WHEN 0 THEN ' card 4111111111111111 ok'
        |    WHEN 1 THEN ' num 4111111111111112 no'
        |    WHEN 2 THEN ' pay 4012888888881881 ref '
        |      || '12345678901234567890 over'
        |    ELSE ' no digits here' END AS raw
        |  FROM documents),
        |runs AS (
        |  SELECT doc_id, l[i] AS cand, CAST(i - 1 AS INT) AS cand_idx
        |  FROM (SELECT doc_id, regexp_extract_all(raw, '[0-9]+') AS l
        |        FROM raws),
        |       UNNEST(generate_series(1, len(l))) AS u(i)),
        |c AS (SELECT doc_id, cand_idx, cand FROM runs
        |      WHERE len(cand) BETWEEN 13 AND 19)
        |SELECT doc_id, cand_idx, cand,
        |  list_sum(list_transform(generate_series(1, len(cand)), i ->
        |    CASE WHEN i % 2 = 0 THEN
        |      CASE WHEN 2 * CAST(reverse(cand)[i] AS INT) > 9
        |           THEN 2 * CAST(reverse(cand)[i] AS INT) - 9
        |           ELSE 2 * CAST(reverse(cand)[i] AS INT) END
        |    ELSE CAST(reverse(cand)[i] AS INT) END)) % 10 = 0 AS luhn_ok
        |FROM c""".stripMargin,

    // 3×3 neighbor-cell equi-join + exact integer distance verify.
    "q174_proximity_join" ->
      """WITH p0 AS (
        |  SELECT event_id AS id,
        |    CAST(('0x' || substr(md5('x:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 1000000 AS x,
        |    CAST(('0x' || substr(md5('y:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 1000000 AS y
        |  FROM events),
        |pk AS (
        |  SELECT id, x, y, row_number() OVER (
        |    PARTITION BY x // 5000, y // 5000 ORDER BY id) AS rk
        |  FROM p0),
        |p AS (SELECT id, x, y FROM pk WHERE rk <= 8),
        |pr AS (
        |  SELECT id AS a, x AS ax, y AS ay,
        |         x // 5000 + dx AS cx, y // 5000 + dy AS cy
        |  FROM p, UNNEST([-1, 0, 1]) AS ox(dx),
        |       UNNEST([-1, 0, 1]) AS oy(dy)),
        |bu AS (SELECT id AS b, x AS bx, y AS by,
        |         x // 5000 AS cx, y // 5000 AS cy
        |       FROM p)
        |SELECT a, b,
        |  (ax-bx)*(ax-bx) + (ay-by)*(ay-by) AS d2
        |FROM pr JOIN bu USING (cx, cy)
        |WHERE a < b
        |  AND (ax-bx)*(ax-bx) + (ay-by)*(ay-by) <= 25000000"""
        .stripMargin,

    // Quota, remainders, and the tie-broken top-R window.
    "q175_budget_apportion" ->
      """WITH w AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS weight
        |  FROM events GROUP BY user_id),
        |t AS (SELECT CAST(sum(weight) AS BIGINT) AS W FROM w),
        |b AS (SELECT user_id, weight,
        |        (1000000 * weight) // W AS base,
        |        (1000000 * weight) % W AS rem
        |      FROM w, t),
        |l AS (SELECT CAST(1000000 - sum(base) AS BIGINT) AS R FROM b),
        |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, user_id)
        |        AS rk FROM b)
        |SELECT user_id, weight, base,
        |  base + CASE WHEN rk <= R THEN 1 ELSE 0 END AS alloc
        |FROM r, l""".stripMargin,

    // Golden-row scrub: the payload is residue-keyed, so the expected
    // text is literal — valid PANs become [PAN], the look-alike and
    // the over-long run survive.
    "q173_pan_scrub" ->
      """SELECT doc_id, text || CASE doc_id % 4
        |  WHEN 0 THEN ' card [PAN] ok'
        |  WHEN 1 THEN ' num 4111111111111112 no'
        |  WHEN 2 THEN ' pay [PAN] ref 12345678901234567890 over'
        |  ELSE ' no digits here' END AS scrubbed
        |FROM documents""".stripMargin,

    // Same class ranges as RE2 \x{…} classes; dominant replayed as
    // the same leftmost-max CASE chain.
    "q168_script_census" ->
      """WITH s AS (
        |  SELECT doc_id, text || CASE doc_id % 5
        |    WHEN 0 THEN ' привет мир'
        |    WHEN 1 THEN ' 你好世界 2024'
        |    WHEN 2 THEN ' مرحبا بالعالم'
        |    WHEN 3 THEN ' γειά σου κόσμε'
        |    ELSE '' END AS t
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(t,
        |      '[A-Za-z\x{00C0}-\x{024F}]')) AS BIGINT) AS n_latin,
        |    CAST(len(regexp_extract_all(t,
        |      '[\x{0400}-\x{04FF}]')) AS BIGINT) AS n_cyrillic,
        |    CAST(len(regexp_extract_all(t,
        |      '[\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}\x{AC00}-\x{D7A3}]'))
        |      AS BIGINT) AS n_cjk,
        |    CAST(len(regexp_extract_all(t,
        |      '[\x{0600}-\x{06FF}]')) AS BIGINT) AS n_arabic,
        |    CAST(len(regexp_extract_all(t,
        |      '[\x{0370}-\x{03FF}]')) AS BIGINT) AS n_greek,
        |    CAST(len(regexp_extract_all(t, '[0-9]')) AS BIGINT) AS n_digit
        |  FROM s)
        |SELECT doc_id, n_latin, n_cyrillic, n_cjk, n_arabic, n_greek,
        |  n_digit,
        |  CASE
        |    WHEN n_latin > 0 AND n_latin >= greatest(n_cyrillic, n_cjk,
        |      n_arabic, n_greek, n_digit) THEN 'latin'
        |    WHEN n_cyrillic > 0 AND n_cyrillic >= greatest(n_cjk,
        |      n_arabic, n_greek, n_digit) THEN 'cyrillic'
        |    WHEN n_cjk > 0 AND n_cjk >= greatest(n_arabic, n_greek,
        |      n_digit) THEN 'cjk'
        |    WHEN n_arabic > 0 AND n_arabic >= greatest(n_greek, n_digit)
        |      THEN 'arabic'
        |    WHEN n_greek > 0 AND n_greek >= n_digit THEN 'greek'
        |    WHEN n_digit > 0 THEN 'digit'
        |    ELSE 'und' END AS dominant
        |FROM c""".stripMargin,

    // q121's URL + eTLD+1 logic with n_chars carried through, then the
    // cap as a plain window at oracle scale.
    "q149_domain_cap" ->
      """WITH u AS (
        |  SELECT doc_id, n_chars, CASE
        |    WHEN doc_id % 5 = 0 THEN 'https://news.example.co.uk/a/'
        |      || CAST(doc_id // 7 AS VARCHAR)
        |    WHEN doc_id % 5 = 1 THEN 'https://blog.example.com/p/'
        |      || CAST(doc_id // 7 AS VARCHAR)
        |    WHEN doc_id % 5 = 2 THEN 'https://example.com/p/'
        |      || CAST(doc_id // 7 AS VARCHAR)
        |    WHEN doc_id % 5 = 3 THEN 'http://mirror.site.org:80/x/'
        |      || CAST(doc_id // 7 AS VARCHAR)
        |    ELSE 'not a url' END AS url
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, n_chars,
        |    list_filter(string_split(lower(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]+)', 1)),
        |      '.'), x -> len(x) > 0) AS ls
        |  FROM u),
        |d AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN len(ls) < 2 THEN NULL
        |         WHEN len(ls) >= 3
        |              AND ls[len(ls)-1] IN
        |                ('co','com','net','org','ac','gov','edu')
        |              AND len(ls[len(ls)]) = 2
        |           THEN array_to_string(
        |             list_slice(ls, len(ls)-2, len(ls)), '.')
        |         ELSE array_to_string(
        |             list_slice(ls, len(ls)-1, len(ls)), '.') END AS domain
        |  FROM h),
        |k AS (
        |  SELECT domain, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY domain
        |      ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM d WHERE domain IS NOT NULL
        |  QUALIFY rank <= 25)
        |SELECT domain, CAST(rank AS INTEGER) AS rank,
        |       CAST(n_chars AS BIGINT) AS n_chars, doc_id
        |FROM k""".stripMargin,

    // The stub envelope is the q29 md5 construction (48-bit prefix mod
    // 1e6 per window — comparing the integer numerators equals
    // comparing the scaled doubles); 32 difference bits assemble from
    // the MSB into one nonnegative BIGINT, then the same byte-band
    // candidate join + Hamming ≤ 3 verify as the Spark side.
    "q148_audio_neardup" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS media_id, text FROM documents),
        |g AS (
        |  SELECT media_id,
        |    list_transform(range(33), i ->
        |      CAST(('0x' || substr(md5(text || ':' || i), 1, 12)) AS BIGINT)
        |        % 1000000) AS env
        |  FROM m),
        |h AS (
        |  SELECT media_id,
        |    list_sum(list_transform(range(32), p ->
        |      CASE WHEN env[p + 1] < env[p + 2]
        |        THEN CAST(1 AS BIGINT) << CAST(31 - p AS INTEGER)
        |        ELSE 0 END)) AS afp
        |  FROM g),
        |b AS (
        |  SELECT media_id, afp, CAST(r.range AS INTEGER) AS band_id,
        |    (afp >> CAST(r.range * 8 AS INTEGER)) & 255 AS band_byte
        |  FROM h, range(4) r)
        |SELECT DISTINCT l.media_id AS a, r.media_id AS b,
        |  CAST(bit_count(xor(l.afp, r.afp)) AS INTEGER) AS hamming
        |FROM b l JOIN b r
        |  ON l.band_id = r.band_id AND l.band_byte = r.band_byte
        |  AND l.media_id < r.media_id
        |WHERE bit_count(xor(l.afp, r.afp)) <= 3""".stripMargin,

    // Extraction + resolution + eTLD+1 + 5 unrolled integer-PR rounds.
    "q147_domain_pagerank" -> domainPageRankOracleSql(5),

    // Same page construction, same extraction regex, the four
    // resolution rules as a CASE, and q121's eTLD+1 list logic.
    "q146_link_graph" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    'https://' || source || '.example.com/docs/d'
        |      || CAST(doc_id AS VARCHAR) || '.html' AS base,
        |    '<html><body><p>' || text || '</p>'
        |    || '<a href="https://partner.example.org/ref?id='
        |      || CAST(doc_id AS VARCHAR) || '">cite</a>'
        |    || '<a href="//mirror.example.net/m/' || source || '">mirror</a>'
        |    || '<a href="/about">about</a>'
        |    || '<a href="d' || CAST(doc_id + 1 AS VARCHAR) || '.html">next</a>'
        |    || '<a href="mailto:ops@example.com">mail</a>'
        |    || '<a href="#top">top</a></body></html>' AS html
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, base,
        |    regexp_extract_all(html,
        |      '(?i)<a\b[^>]*?\shref\s*=\s*["'']([^"''#>]*)', 1) AS links
        |  FROM m),
        |e AS (
        |  SELECT doc_id, base, CAST(i - 1 AS INTEGER) AS link_idx,
        |         links[i] AS href
        |  FROM l, UNNEST(generate_series(1, len(links))) AS u(i)),
        |b AS (
        |  SELECT doc_id, link_idx, href,
        |    regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) AS bscheme,
        |    regexp_extract(base,
        |      '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)', 1) AS borigin,
        |    regexp_replace(regexp_extract(base,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1),
        |      '[^/]*$', '') AS bdir
        |  FROM e),
        |r AS (
        |  SELECT doc_id, link_idx,
        |    CASE
        |      WHEN href = '' THEN NULL
        |      WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*://')
        |        THEN href
        |      -- scheme with no '//' (mailto:, javascript:): absolute
        |      -- but non-hierarchical — NULL quarantine, not relative.
        |      WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*:')
        |        THEN NULL
        |      WHEN starts_with(href, '//') THEN bscheme || ':' || href
        |      WHEN starts_with(href, '/') THEN borigin || href
        |      ELSE borigin
        |        || CASE WHEN bdir = '' THEN '/' ELSE bdir END || href
        |    END AS url
        |  FROM b),
        |f AS (SELECT doc_id, link_idx, url FROM r WHERE url IS NOT NULL),
        |h AS (
        |  SELECT doc_id, link_idx, url,
        |    list_filter(string_split(lower(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]+)', 1)),
        |      '.'), x -> len(x) > 0) AS ls
        |  FROM f)
        |SELECT doc_id, link_idx, url,
        |  CASE WHEN len(ls) < 2 THEN NULL
        |       WHEN len(ls) >= 3
        |            AND ls[len(ls)-1] IN
        |              ('co','com','net','org','ac','gov','edu')
        |            AND len(ls[len(ls)]) = 2
        |         THEN array_to_string(list_slice(ls, len(ls)-2, len(ls)), '.')
        |       ELSE array_to_string(list_slice(ls, len(ls)-1, len(ls)), '.')
        |  END AS domain
        |FROM h""".stripMargin,

    // Each metric computed ONCE through the standard window form and
    // aliased into both columns — the Spark side must produce the
    // same value through two different physical plans.
    "q145_window_parity" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |         CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id,
        |    sum(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM e),
        |k AS (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY c DESC, event_id) AS rk
        |  FROM e QUALIFY rk <= 3)
        |SELECT 'running' AS part, user_id, event_id,
        |  CAST(run AS BIGINT) AS metric_win, CAST(run AS BIGINT) AS metric_scale
        |FROM r
        |UNION ALL
        |SELECT 'topk' AS part, user_id, event_id,
        |  CAST(rk AS BIGINT), CAST(rk AS BIGINT)
        |FROM k""".stripMargin,

    // The dHash pipeline recomputed from scratch: the stub 9×8 gray
    // grid is the 48-bit md5 prefix mod 256 per cell (exactly
    // FakeCodec.channel — same construction as q29's oracle), the
    // 64 gradient bits assemble row-major from the MSB as two 32-bit
    // halves (hi re-signed before the shift so the top bit lands
    // without BIGINT overflow), then the same byte-band candidate
    // join + Hamming ≤ 6 verify.
    "q144_image_neardup" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS media_id, text FROM documents),
        |g AS (
        |  SELECT media_id,
        |    list_transform(range(72), i ->
        |      CAST(('0x' || substr(md5(text || ':' || i), 1, 12)) AS BIGINT)
        |        % 256) AS gs
        |  FROM m),
        |h0 AS (
        |  SELECT media_id,
        |    list_sum(list_transform(range(32), p ->
        |      CASE WHEN gs[(p // 8) * 9 + (p % 8) + 1]
        |               < gs[(p // 8) * 9 + (p % 8) + 2]
        |        THEN CAST(1 AS BIGINT) << CAST(31 - p AS INTEGER)
        |        ELSE 0 END)) AS hi,
        |    list_sum(list_transform(range(32, 64), p ->
        |      CASE WHEN gs[(p // 8) * 9 + (p % 8) + 1]
        |               < gs[(p // 8) * 9 + (p % 8) + 2]
        |        THEN CAST(1 AS BIGINT) << CAST(63 - p AS INTEGER)
        |        ELSE 0 END)) AS lo
        |  FROM g),
        |h AS (
        |  SELECT media_id,
        |    CAST(hi - CASE WHEN hi >= 2147483648 THEN 4294967296 ELSE 0 END
        |      AS BIGINT) * 4294967296 + lo AS dhash
        |  FROM h0),
        |b AS (
        |  SELECT media_id, dhash, CAST(r.range AS INTEGER) AS band_id,
        |    (dhash >> CAST(r.range * 8 AS INTEGER)) & 255 AS band_byte
        |  FROM h, range(8) r)
        |SELECT DISTINCT l.media_id AS a, r.media_id AS b,
        |  CAST(bit_count(xor(l.dhash, r.dhash)) AS INTEGER) AS hamming
        |FROM b l JOIN b r
        |  ON l.band_id = r.band_id AND l.band_byte = r.band_byte
        |  AND l.media_id < r.media_id
        |WHERE bit_count(xor(l.dhash, r.dhash)) <= 6""".stripMargin,

    // The identical page shell + the identical closed-form rule set
    // (script/style/comment drop, block split on block-level tags,
    // tag strip, entity unescape with &amp; LAST, whitespace
    // collapse, min-25-chars AND 3·links ≤ words) re-expressed in
    // DuckDB list/regex SQL.
    "q143_html_extract" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>d</title><style>p{margin:0}</style>'
        |    || '<script>var a="<p>not content</p>";</script></head><body>'
        |    || '<nav><a href="/">Home</a> <a href="/s">' || source
        |    || '</a> <a href="/l">' || lang || '</a></nav>'
        |    || '<p>' || text || '</p>'
        |    || '<div><a href="/c">Contact</a> <a href="/p">Privacy</a>'
        |    || ' <a href="/t">Terms</a></div>'
        |    || '<footer>(c) 2026 Example Corp</footer></body></html>' AS html
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(html,
        |      '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
        |      '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
        |      '(?s)<!--.*?-->', ' ', 'g') AS body
        |  FROM h),
        |b AS (
        |  SELECT doc_id, string_split_regex(body,
        |    '(?i)</?(?:p|div|li|h[1-6]|br|ul|ol|table|thead|tbody|tr|td|th|section|article|aside|header|footer|nav|main|blockquote|figure|figcaption|form|fieldset|pre)\b[^>]*>') AS raw
        |  FROM c),
        |s AS (
        |  SELECT doc_id, list_transform(raw, x -> struct_pack(
        |    txt := trim(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(x, '<[^>]*>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |        '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
        |      '\s+', ' ', 'g')),
        |    n_links := len(regexp_extract_all(x, '(?i)<a\b')))) AS bs
        |  FROM b),
        |k AS (
        |  SELECT doc_id, list_filter(bs, e -> len(e.txt) >= 25
        |    AND e.n_links * 3 <= len(list_filter(string_split(e.txt, ' '),
        |                              w -> len(w) > 0))) AS ks
        |  FROM s)
        |SELECT doc_id,
        |  array_to_string(list_transform(ks, e -> e.txt), chr(10)) AS main_text,
        |  CAST(len(ks) AS INTEGER) AS n_blocks
        |FROM k""".stripMargin,

    // The PLAIN join — salting must be invisible in the result.
    "q141_salted_join" ->
      """SELECT s.s_nationkey,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |GROUP BY 1""".stripMargin,

    // The q112-style rank construction + the integer decile cut.
    "q142_group_buckets" ->
      """WITH s AS (
        |  SELECT source,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |         t -> len(t) > 0)) AS BIGINT) AS n_tokens,
        |    doc_id
        |  FROM documents),
        |r AS (
        |  SELECT source, n_tokens, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_tokens, doc_id) AS rank,
        |    count(*) OVER (PARTITION BY source) AS cnt
        |  FROM s)
        |SELECT source, n_tokens, doc_id, CAST(rank AS BIGINT) AS rank,
        |       CAST(((rank - 1) * 10) // cnt AS INTEGER) AS bucket
        |FROM r""".stripMargin,

    // Both states recomputed set-theoretically; net feed = EXCEPT ALL
    // both ways, tagged. Same scale-0 cents rounding (portable).
    "q140_change_feed" ->
      """WITH v1 AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer WHERE c_nationkey < 10),
        |delta AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(round(c_acctbal * 100) AS BIGINT) + 1 AS bal_cents
        |  FROM customer WHERE c_nationkey >= 5 AND c_nationkey < 15),
        |v2 AS (
        |  SELECT * FROM v1
        |  WHERE c_custkey NOT IN (SELECT c_custkey FROM delta)
        |  UNION ALL SELECT * FROM delta),
        |ins AS (SELECT *, 'insert' AS _change_type FROM
        |  (SELECT * FROM v2 EXCEPT ALL SELECT * FROM v1)),
        |del AS (SELECT *, 'delete' AS _change_type FROM
        |  (SELECT * FROM v1 EXCEPT ALL SELECT * FROM v2))
        |SELECT * FROM ins UNION ALL SELECT * FROM del""".stripMargin,

    // The v1 census computed directly — if the Spark side's commit →
    // clobber → restore → read loses or reshapes anything, the hash
    // gate catches it.
    "q139_restore_roundtrip" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key
        |FROM orders GROUP BY 1""".stripMargin,

    // q126's score CTEs + the q112-style rank construction; pct is
    // one IEEE divide of two exact longs — bit-identical unquantized.
    "q138_score_calibration" ->
      s"""WITH $ensembleMuSql,
         |sc AS (
         |  SELECT d.source, mu.doc_id,
         |    CAST(mu.rare_mu + mu.top2_mu + mu.dup3_mu + mu.nll_mu // 10
         |      AS BIGINT) AS score_mu
         |  FROM mu JOIN documents d USING (doc_id)),
         |r AS (
         |  SELECT source, doc_id, score_mu,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY score_mu, doc_id) AS rank,
         |    count(*) OVER (PARTITION BY source) AS cnt
         |  FROM sc)
         |SELECT source, doc_id, score_mu, CAST(rank AS BIGINT) AS rank,
         |       CAST(rank AS DOUBLE) / CAST(cnt AS DOUBLE) AS pct
         |FROM r""".stripMargin,

    // The q54 component closure + the q55 hash-bucket arithmetic,
    // keyed by the component id.
    "q137_leakage_safe_split" ->
      s"""WITH RECURSIVE $dedupClosureCtes,
         |allc AS (
         |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
         |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
         |SELECT doc_id, component,
         |  CASE WHEN CAST(('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
         |       WHEN CAST(('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM allc""".stripMargin,

    // The q54 closure CTEs give near-dup components; singletons are
    // their own component; survivor = (n_chars DESC, doc_id ASC).
    "q136_canonical_docs" ->
      s"""WITH RECURSIVE $dedupClosureCtes,
         |allc AS (
         |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
         |         d.n_chars
         |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
         |rk AS (
         |  SELECT component, doc_id,
         |    row_number() OVER (PARTITION BY component
         |      ORDER BY n_chars DESC, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY component) AS n_members
         |  FROM allc)
         |SELECT component, doc_id AS canonical_id,
         |       CAST(n_members AS BIGINT) AS n_members
         |FROM rk WHERE rn = 1""".stripMargin,

    // Exact counts, same (n DESC, tok ASC) pick as the bounded
    // aggregate's (-n, tok) ascending sort.
    "q135_top_tokens" ->
      """WITH tok AS (
        |  SELECT source,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> len(t) > 0)) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT source, tok, CAST(count(*) AS BIGINT) AS n
        |  FROM tok GROUP BY 1, 2),
        |k AS (
        |  SELECT source, tok, n,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n DESC, tok) AS rank
        |  FROM c)
        |SELECT source, CAST(rank AS INTEGER) AS rank, tok, n
        |FROM k WHERE rank <= 5""".stripMargin,

    // Same blocking, same 40-char heads, same (dist, right_id) best
    // pick. DuckDB runs the full Levenshtein DP; Spark runs the
    // BANDED threshold variant — distances are identical integers for
    // every pair within maxDist (the only ones either side keeps; the
    // Spark-side -1 over-threshold sentinel is filtered out).
    "q133_record_linkage" ->
      """WITH l AS (
        |  SELECT doc_id AS left_id, lang, source,
        |         substr(text, 1, 40) AS lt
        |  FROM documents WHERE doc_id % 2 = 0),
        |r AS (
        |  SELECT doc_id AS right_id, lang, source,
        |         substr(text, 1, 40) AS rt
        |  FROM documents WHERE doc_id % 2 = 1),
        |c AS (
        |  SELECT l.left_id, r.right_id,
        |         CAST(levenshtein(l.lt, r.rt) AS INTEGER) AS dist
        |  FROM l JOIN r USING (lang, source)
        |  WHERE levenshtein(l.lt, r.rt) <= 20),
        |k AS (
        |  SELECT left_id, right_id, dist,
        |         row_number() OVER (PARTITION BY left_id
        |           ORDER BY dist, right_id) AS rank
        |  FROM c)
        |SELECT left_id, CAST(rank AS INTEGER) AS rank, dist, right_id
        |FROM k WHERE rank <= 1""".stripMargin,

    // The three component CTE families verbatim (rarity dt/dfs,
    // repetition w0/g2../a3 over RAW documents, lmNllCtes), micro-
    // quantized from the same 6-dp values and summed in integers.
    "q126_quality_ensemble" ->
      s"""WITH $ensembleMuSql
         |SELECT doc_id, rare_mu, top2_mu, dup3_mu, nll_mu,
         |  CAST(rare_mu + top2_mu + dup3_mu + nll_mu // 10 AS BIGINT)
         |    AS score_mu
         |FROM mu""".stripMargin,

    // q126's CTEs (via ensembleMuSql) + a per-source rank window, the
    // ⌈0.8·n⌉-th score as the inclusive bar.
    "q127_percentile_filter" ->
      s"""WITH $ensembleMuSql,
         |sc AS (
         |  SELECT d.source, mu.doc_id,
         |    CAST(mu.rare_mu + mu.top2_mu + mu.dup3_mu + mu.nll_mu // 10
         |      AS BIGINT) AS score_mu
         |  FROM mu JOIN documents d USING (doc_id)),
         |rk AS (
         |  SELECT source, doc_id, score_mu,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY score_mu, doc_id) AS rk,
         |    count(*) OVER (PARTITION BY source) AS n
         |  FROM sc),
         |bars AS (
         |  SELECT source, max(score_mu) AS bar
         |  FROM rk WHERE rk <= CAST(ceil(0.8 * n) AS BIGINT)
         |  GROUP BY source)
         |SELECT r.source, r.doc_id, r.score_mu, b.bar
         |FROM rk r JOIN bars b USING (source)
         |WHERE r.score_mu <= b.bar""".stripMargin,

    // The q110 per-doc piece counts (same unrolled retrain) feed the
    // q76 pack window, budget 256 pieces.
    "q125_bpe_pack" ->
      s"""WITH bp AS (${bpeOracleSql(10)}),
         |j AS (
         |  SELECT d.source, bp.doc_id, bp.n_pieces
         |  FROM bp JOIN documents d USING (doc_id)),
         |r AS (
         |  SELECT source, doc_id, n_pieces,
         |    sum(n_pieces) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
         |  FROM j)
         |SELECT source,
         |  CAST(floor((run - n_pieces) / 256) AS BIGINT) AS pack_id,
         |  count(*) AS n_docs, CAST(sum(n_pieces) AS BIGINT) AS pack_pieces
         |FROM r GROUP BY 1, 2""".stripMargin,

    // Same md5-derived hash60, sign bit, and bit-length idf.
    "q123_hashed_vectors" ->
      """WITH occ AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |    t -> len(t) > 0)) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM occ GROUP BY 1, 2),
        |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
        |        FROM tf GROUP BY 1),
        |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |       FROM documents),
        |s AS (
        |  SELECT t.doc_id, CAST(t.h % 64 AS INTEGER) AS dim,
        |    (CASE WHEN (t.h // 64) % 2 = 0 THEN 1 ELSE -1 END)
        |      * t.tf * len(bin(nd.n_docs // t.df)) AS contrib
        |  FROM (SELECT tf.*, dfq.df,
        |          CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
        |        FROM tf JOIN dfq USING (tok)) t CROSS JOIN nd)
        |SELECT doc_id, dim, CAST(sum(contrib) AS BIGINT) AS v
        |FROM s GROUP BY doc_id, dim""".stripMargin,

    // Offsets × positions via generate_series (empty when the doc is
    // shorter than the offset), list_extract pairing, integer weights.
    "q122_skipgram_counts" ->
      """WITH w0 AS (
        |  SELECT list_filter(string_split_regex(lower(text), '\s+'),
        |         t -> len(t) > 0) AS w
        |  FROM documents),
        |o AS (
        |  SELECT w, unnest(generate_series(1, 3)) AS off FROM w0),
        |i AS (
        |  SELECT w, off,
        |    unnest(generate_series(1, len(w) - off)) AS i
        |  FROM o),
        |p AS (
        |  SELECT least(list_extract(w, i), list_extract(w, i + off)) AS a,
        |    greatest(list_extract(w, i), list_extract(w, i + off)) AS b,
        |    CAST(1000000 // off AS BIGINT) AS wt
        |  FROM i)
        |SELECT a, b, CAST(count(*) AS BIGINT) AS c,
        |  CAST(sum(wt) AS BIGINT) AS w_micro
        |FROM p GROUP BY a, b HAVING count(*) >= 30""".stripMargin,

    // Same URL synthesis; the registrable-domain rule mirrored with
    // 1-based list_slice arithmetic (labels[-2]/-3 forms).
    "q121_domain_stats" ->
      """WITH u AS (
        |  SELECT doc_id, CASE
        |    WHEN doc_id % 5 = 0 THEN 'https://news.example.co.uk/a/'
        |      || CAST(doc_id // 7 AS VARCHAR)
        |    WHEN doc_id % 5 = 1 THEN 'https://blog.example.com/p/'
        |      || CAST(doc_id // 7 AS VARCHAR)
        |    WHEN doc_id % 5 = 2 THEN 'https://example.com/p/'
        |      || CAST(doc_id // 7 AS VARCHAR)
        |    WHEN doc_id % 5 = 3 THEN 'http://mirror.site.org:80/x/'
        |      || CAST(doc_id // 7 AS VARCHAR)
        |    ELSE 'not a url' END AS url
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, url,
        |    list_filter(string_split(lower(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]+)', 1)),
        |      '.'), x -> len(x) > 0) AS ls
        |  FROM u),
        |d AS (
        |  SELECT doc_id, url,
        |    CASE WHEN len(ls) < 2 THEN NULL
        |         WHEN len(ls) >= 3
        |              AND ls[len(ls)-1] IN
        |                ('co','com','net','org','ac','gov','edu')
        |              AND len(ls[len(ls)]) = 2
        |           THEN array_to_string(
        |             list_slice(ls, len(ls)-2, len(ls)), '.')
        |         ELSE array_to_string(
        |             list_slice(ls, len(ls)-1, len(ls)), '.') END AS domain
        |  FROM h)
        |SELECT domain, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT url) AS BIGINT) AS n_pages
        |FROM d WHERE domain IS NOT NULL
        |GROUP BY domain""".stripMargin,

    // q89's twin with the shared-gram census on DISTINCT doc count.
    "q120_crossdoc_spans" ->
      """WITH w0 AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                                       t -> len(t) > 0) AS w
        |            FROM documents),
        |g AS (SELECT doc_id,
        |        unnest(generate_series(1, len(w)-8+1)) AS pos,
        |        unnest(CASE WHEN len(w) < 8 THEN CAST([] AS VARCHAR[])
        |          ELSE list_transform(generate_series(0, len(w)-8),
        |                 i -> array_to_string(list_slice(w, i+1, i+8), ' '))
        |          END) AS gram
        |      FROM w0),
        |rep AS (SELECT gram FROM g GROUP BY gram
        |        HAVING count(DISTINCT doc_id) >= 2),
        |p AS (SELECT g.doc_id, g.pos FROM g JOIN rep ON g.gram = rep.gram),
        |isl AS (SELECT doc_id, pos,
        |         CASE WHEN pos > lag(pos, 1, -1000000)
        |                OVER (PARTITION BY doc_id ORDER BY pos) + 8
        |              THEN 1 ELSE 0 END AS brk
        |        FROM p),
        |sp AS (SELECT doc_id, pos,
        |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
        |       FROM isl),
        |agg AS (SELECT doc_id, span_id, min(pos) AS s, max(pos) AS e
        |        FROM sp GROUP BY 1, 2),
        |per AS (SELECT doc_id, count(*) AS n_spans,
        |          CAST(sum(e - s + 8) AS BIGINT) AS dup_tokens
        |        FROM agg GROUP BY 1)
        |SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(per.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(COALESCE(per.dup_tokens, 0) AS BIGINT) AS dup_tokens,
        |  round(CAST(COALESCE(per.dup_tokens, 0) AS DOUBLE) / len(d.w), 6)
        |    AS dup_frac
        |FROM w0 d LEFT JOIN per ON d.doc_id = per.doc_id""".stripMargin,

    // NB train+score twin: identical add-one weights in integer
    // micro-nats (round(1e6·ln) of a double built from exact integer
    // counts — the shared quantization idiom), identical argmax
    // tie-break (score desc, class asc). ctc is MATERIALIZED: three
    // consumers (totals, vocab, densify) would otherwise re-inline it.
    "q118_nb_classify" ->
      """WITH tr AS MATERIALIZED (
        |  SELECT source AS cls,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> len(t) > 0)) AS tok
        |  FROM documents WHERE doc_id % 2 = 0),
        |ctc AS MATERIALIZED (
        |  SELECT cls, tok, CAST(count(*) AS BIGINT) AS c_tc
        |  FROM tr GROUP BY cls, tok),
        |nc AS (SELECT cls, CAST(sum(c_tc) AS BIGINT) AS n_c
        |       FROM ctc GROUP BY cls),
        |vocab AS (SELECT DISTINCT tok FROM ctc),
        |vn AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
        |w AS MATERIALIZED (
        |  SELECT vocab.tok, nc.cls,
        |    CAST(round(1000000 * ln(
        |      CAST(coalesce(ctc.c_tc, 0) + 1 AS DOUBLE)
        |        / CAST(nc.n_c + vn.v AS DOUBLE))) AS BIGINT) AS w_mnat
        |  FROM vocab CROSS JOIN nc CROSS JOIN vn
        |  LEFT JOIN ctc ON ctc.tok = vocab.tok AND ctc.cls = nc.cls),
        |dc AS (SELECT source AS cls, CAST(count(*) AS BIGINT) AS d_c
        |       FROM documents WHERE doc_id % 2 = 0 GROUP BY source),
        |dt AS (SELECT CAST(count(*) AS BIGINT) AS d
        |       FROM documents WHERE doc_id % 2 = 0),
        |pr AS (
        |  SELECT cls, CAST(round(1000000 * ln(
        |      CAST(d_c AS DOUBLE) / CAST(d AS DOUBLE))) AS BIGINT)
        |    AS prior_mnat
        |  FROM dc CROSS JOIN dt),
        |occ AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> len(t) > 0)) AS tok
        |  FROM documents WHERE doc_id % 2 = 1),
        |sc AS (
        |  SELECT o.doc_id, w.cls,
        |    CAST(sum(w.w_mnat) AS BIGINT) AS ev,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM occ o JOIN w ON w.tok = o.tok
        |  GROUP BY o.doc_id, w.cls),
        |tot AS (
        |  SELECT s.doc_id, s.cls, s.ev + p.prior_mnat AS score_mnat, s.n
        |  FROM sc s JOIN pr p USING (cls)),
        |r AS (
        |  SELECT doc_id, cls, score_mnat, n,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score_mnat DESC, cls) AS rk
        |  FROM tot)
        |SELECT doc_id, cls AS pred, score_mnat, n AS n_vocab_toks
        |FROM r WHERE rk = 1""".stripMargin,

    // Sentencify + injection replay, per-source distinct-doc census,
    // strip-and-rebuild; string_agg skips the boilerplate NULLs and
    // coalesce covers the all-boiler doc (Spark: empty array_join).
    "q176_boilerplate_strip" ->
      """WITH w0 AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> len(t) > 0) AS w
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, source,
        |    array_to_string(list_transform(generate_series(0, (len(w)-1)//8),
        |      i -> array_to_string(list_slice(w, i*8+1, i*8+8), ' ')),
        |      '. ') AS text
        |  FROM w0),
        |f AS (
        |  SELECT doc_id, source, text
        |    || CASE WHEN doc_id % 7 < 4
        |            THEN '. cookie notice for ' || source ELSE '' END
        |    || CASE WHEN doc_id % 31 = 1
        |            THEN '. limited offer today' ELSE '' END AS text
        |  FROM d),
        |p AS (SELECT doc_id, source, string_split(text, '. ') AS parts
        |      FROM f),
        |s AS (SELECT doc_id, source,
        |        unnest(generate_series(1, len(parts))) AS pos,
        |        unnest(parts) AS sent
        |      FROM p),
        |sn AS (SELECT * FROM s WHERE len(sent) > 0),
        |b AS (SELECT source, sent FROM sn
        |      GROUP BY source, sent HAVING count(DISTINCT doc_id) >= 5),
        |j AS (SELECT sn.doc_id, sn.pos, sn.sent,
        |        b.sent IS NOT NULL AS boiler
        |      FROM sn LEFT JOIN b
        |        ON sn.source = b.source AND sn.sent = b.sent)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN boiler THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed,
        |  coalesce(string_agg(CASE WHEN NOT boiler THEN sent END,
        |    '. ' ORDER BY pos), '') AS text_clean
        |FROM j GROUP BY doc_id""".stripMargin,

    // Depth-bounded recursive BFS; UNION dedups (node, dist) pairs so
    // cycles terminate, min picks the settled hop.
    "q177_hop_distance" ->
      """WITH RECURSIVE e AS (
        |  SELECT
        |    CAST(('0x' || substr(md5('hs:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 20000 AS src,
        |    CAST(('0x' || substr(md5('hd:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 20000 AS dst
        |  FROM events),
        |ed AS (SELECT DISTINCT src, dst FROM e),
        |sd AS (SELECT DISTINCT src AS node FROM ed WHERE src < 50),
        |walk(node, dist) AS (
        |  SELECT node, 0 FROM sd
        |  UNION
        |  SELECT ed.dst, w.dist + 1
        |  FROM walk w JOIN ed ON ed.src = w.node
        |  WHERE w.dist < 6)
        |SELECT node, CAST(min(dist) AS INT) AS dist
        |FROM walk GROUP BY node""".stripMargin,

    // Template collapse (query strip, digits→{n}) + distinct-digest
    // census; domain replays the eTLD+1 heuristic on the fixture host.
    "q178_url_templates" ->
      """WITH u AS (
        |  SELECT 'https://shop.example.com/' || CASE
        |      WHEN doc_id % 3 = 0 THEN 'item/' || CAST(doc_id AS VARCHAR)
        |      WHEN doc_id % 3 = 1 THEN 'cal/' || CAST(doc_id AS VARCHAR)
        |      ELSE 'list?sid=' || CAST(doc_id AS VARCHAR) END AS url,
        |    md5(CASE WHEN doc_id % 3 = 0 THEN text
        |             ELSE 'landing page' END) AS digest
        |  FROM documents),
        |tc AS (
        |  SELECT 'example.com' AS domain,
        |    regexp_replace(regexp_replace(url, '[?#].*$', ''),
        |      '[0-9]+', '{n}', 'g') AS template,
        |    digest
        |  FROM u)
        |SELECT domain, template,
        |  CAST(count(*) AS BIGINT) AS n_urls,
        |  CAST(count(DISTINCT digest) AS BIGINT) AS n_contents,
        |  count(*) >= 20 AND count(*) >= 4 * count(DISTINCT digest) AS trap
        |FROM tc GROUP BY domain, template""".stripMargin,

    // Same md5-derived addresses and nation CIDR blocks, masked with
    // the same power-of-two literals; the LPM winner is the max
    // prefix_len via a window over the candidate equi-join.
    "q179_ip_route" ->
      """WITH ips AS (
        |  SELECT event_id,
        |    CAST(('0x' || substr(md5('ip:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 4294967296 AS addr
        |  FROM events),
        |nr AS (
        |  SELECT n_nationkey, n_name,
        |    CAST((n_nationkey % 3) * 4 + 4 AS INT) AS prefix_len,
        |    CAST(('0x' || substr(md5('net:'
        |      || CAST(n_nationkey AS VARCHAR)), 1, 15)) AS BIGINT)
        |      % 4294967296 AS raw
        |  FROM nation),
        |routes AS (
        |  SELECT prefix_len,
        |    CASE prefix_len
        |      WHEN 4 THEN raw & 4026531840
        |      WHEN 8 THEN raw & 4278190080
        |      ELSE raw & 4293918720 END AS network,
        |    min(n_name) AS net_name
        |  FROM nr GROUP BY 1, 2),
        |cand AS (
        |  SELECT i.event_id, i.addr, l.prefix_len,
        |    CASE l.prefix_len
        |      WHEN 4 THEN i.addr & 4026531840
        |      WHEN 8 THEN i.addr & 4278190080
        |      ELSE i.addr & 4293918720 END AS network
        |  FROM ips i, UNNEST([4, 8, 12]) AS l(prefix_len)),
        |hits AS (
        |  SELECT c.event_id, c.addr, c.prefix_len, c.network, r.net_name,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY c.prefix_len DESC) AS rk
        |  FROM cand c
        |  JOIN routes r
        |    ON r.prefix_len = c.prefix_len AND r.network = c.network)
        |SELECT event_id, addr, CAST(prefix_len AS INT) AS prefix_len,
        |  network, net_name
        |FROM hits WHERE rk = 1""".stripMargin,

    // Two digest snapshots full-outer-joined on URL; the status CASE
    // mirrors snapshotDiff's branch order exactly.
    "q180_snapshot_diff" ->
      ("WITH " + snapshotDiffSql +
        "\nSELECT url, status, old_digest, new_digest FROM sdiff"),

    // q180's diff CTEs + per-domain activity + the q175-shape
    // largest-remainder apportionment (weight-0 domains drop, as the
    // operator documents).
    "q181_recrawl_priority" ->
      ("WITH " + snapshotDiffSql + ",\n" +
      """dd AS (
        |  SELECT CASE
        |      WHEN starts_with(url, 'https://news.example.co.uk')
        |        THEN 'example.co.uk'
        |      WHEN starts_with(url, 'http://mirror.site.org')
        |        THEN 'site.org'
        |      ELSE 'example.com' END AS domain,
        |    status
        |  FROM sdiff),
        |act AS (
        |  SELECT domain, CAST(sum(CASE WHEN status IN ('changed', 'added')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS weight
        |  FROM dd GROUP BY domain),
        |w AS (SELECT domain, weight FROM act WHERE weight > 0),
        |tw AS (SELECT CAST(sum(weight) AS BIGINT) AS W FROM w),
        |b AS (SELECT domain, weight,
        |        (10000 * weight) // W AS base,
        |        (10000 * weight) % W AS rem
        |      FROM w, tw),
        |lv AS (SELECT CAST(10000 - sum(base) AS BIGINT) AS R FROM b),
        |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, domain)
        |        AS rk FROM b)
        |SELECT domain, weight, base,
        |  base + CASE WHEN rk <= R THEN 1 ELSE 0 END AS alloc
        |FROM r, lv""".stripMargin),

    "q182_hits" -> hitsOracleSql(3),

    // Five exact sums per user, then the OLS numerator/denominator as
    // exact Longs; trend = sign, NULL when a single distinct x leaves
    // no slope. No division crosses the engine boundary.
    "q183_trend_slope" ->
      """WITH o AS (
        |  SELECT user_id,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
        |    CAST(('0x' || substr(md5('y:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 1000 AS y
        |  FROM events),
        |a AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM o GROUP BY user_id)
        |SELECT user_id, n,
        |  n * sxy - sx * sy AS slope_num,
        |  n * sxx - sx * sx AS slope_den,
        |  CAST(CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |       WHEN n * sxy - sx * sy > 0 THEN 1
        |       WHEN n * sxy - sx * sy < 0 THEN -1
        |       ELSE 0 END AS INT) AS trend
        |FROM a""".stripMargin,

    "q184_trustrank" -> trustRankOracleSql(4),

    // Four per-column aggregate blocks UNION ALLed — the SQL shape of
    // the pivoted single-row profile (DuckDB runs it as one scan per
    // block; Spark's stays one scan total).
    "q185_column_profile" ->
      """WITH b AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_returnflag = 'N' THEN NULL
        |         ELSE l_returnflag END AS rf_null,
        |    CAST(l_shipdate AS DATE) AS l_shipday
        |  FROM lineitem)
        |SELECT 'l_orderkey' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) - count(l_orderkey) AS BIGINT) AS n_null,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
        |  CAST(min(l_orderkey) AS VARCHAR) AS min_s,
        |  CAST(max(l_orderkey) AS VARCHAR) AS max_s
        |FROM b
        |UNION ALL
        |SELECT 'l_linenumber', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(l_linenumber) AS BIGINT),
        |  CAST(count(DISTINCT l_linenumber) AS BIGINT),
        |  CAST(min(l_linenumber) AS VARCHAR),
        |  CAST(max(l_linenumber) AS VARCHAR)
        |FROM b
        |UNION ALL
        |SELECT 'rf_null', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(rf_null) AS BIGINT),
        |  CAST(count(DISTINCT rf_null) AS BIGINT),
        |  CAST(min(rf_null) AS VARCHAR), CAST(max(rf_null) AS VARCHAR)
        |FROM b
        |UNION ALL
        |SELECT 'l_shipday', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(l_shipday) AS BIGINT),
        |  CAST(count(DISTINCT l_shipday) AS BIGINT),
        |  CAST(min(l_shipday) AS VARCHAR), CAST(max(l_shipday) AS VARCHAR)
        |FROM b""".stripMargin,

    // Row rules replay the NULL-verdict-fails coalesce; the FK census
    // is a NOT-IN-dim count over the residue-corrupted key.
    "q186_constraints" ->
      """WITH r1 AS (
        |  SELECT 'quantity_le_30' AS rule,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN coalesce(l_quantity <= 30, FALSE)
        |      THEN 0 ELSE 1 END) AS BIGINT) AS n_violations
        |  FROM lineitem),
        |r2 AS (
        |  SELECT 'returnflag_domain',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN coalesce(l_returnflag IN ('A', 'N', 'R'),
        |      FALSE) THEN 0 ELSE 1 END) AS BIGINT)
        |  FROM lineitem),
        |r3 AS (
        |  SELECT 'positive_price',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN coalesce(l_extendedprice > 0, FALSE)
        |      THEN 0 ELSE 1 END) AS BIGINT)
        |  FROM lineitem),
        |f AS (
        |  SELECT CASE WHEN l_orderkey % 97 = 0
        |      THEN -l_orderkey - 1000000000 ELSE l_orderkey END AS fk
        |  FROM lineitem),
        |r4 AS (
        |  SELECT 'fk_orderkey',
        |    CAST((SELECT count(*) FROM lineitem) AS BIGINT),
        |    CAST(sum(CASE WHEN fk IS NOT NULL AND NOT EXISTS
        |      (SELECT 1 FROM orders o WHERE o.o_orderkey = f.fk)
        |      THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM f)
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4"""
        .stripMargin,

    // DuckDB's engine-native ASOF LEFT JOIN (inclusive >=, greatest
    // right time ≤ left time) against graft's custom exec.
    "q187_asof_native" ->
      """WITH l AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us
        |  FROM events WHERE event_type = 'purchase'),
        |r0 AS (
        |  SELECT user_id, epoch_us(ts) AS click_us,
        |    max(event_id) AS click_id, epoch_us(ts) AS click_at
        |  FROM events WHERE event_type = 'click'
        |  GROUP BY user_id, epoch_us(ts))
        |SELECT l.user_id, l.event_id, l.us, r0.click_id, r0.click_at
        |FROM l ASOF LEFT JOIN r0
        |  ON l.user_id = r0.user_id AND l.us >= r0.click_us"""
        .stripMargin,

    // lead() per user in (ts, event_id) order, last events drop,
    // census with distinct-user counts.
    "q188_transitions" ->
      """WITH o AS (
        |  SELECT user_id, event_type AS from_state,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_state
        |  FROM events)
        |SELECT from_state, to_state,
        |  CAST(count(*) AS BIGINT) AS n_transitions,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys
        |FROM o WHERE to_state IS NOT NULL
        |GROUP BY from_state, to_state""".stripMargin,

    // The pivot replayed as conditional sums.
    "q189_event_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_view
        |FROM events GROUP BY user_id""".stripMargin,

    // Fixture clock rewrite (per-user ordinal cadence for every 10th
    // user), gap deltas via lag, exact five-sum variance numerator.
    "q190_bot_regularity" ->
      """WITH f AS (
        |  SELECT user_id, event_id,
        |    CASE WHEN user_id % 10 = 0
        |      THEN 1700000000000000 + 60000000 * CAST(row_number()
        |        OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT)
        |      ELSE epoch_us(ts) END AS us2
        |  FROM events),
        |d AS (
        |  SELECT user_id,
        |    us2 // 1000000 - lag(us2 // 1000000) OVER (PARTITION BY
        |      user_id ORDER BY us2, event_id) AS d
        |  FROM f),
        |g AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |    CAST(min(d) AS BIGINT) AS gap_min_s,
        |    CAST(max(d) AS BIGINT) AS gap_max_s,
        |    CAST(sum(d) AS BIGINT) AS sd, CAST(sum(d*d) AS BIGINT) AS sdd
        |  FROM d WHERE d IS NOT NULL GROUP BY user_id)
        |SELECT user_id, n_gaps, gap_min_s, gap_max_s,
        |  n_gaps * sdd - sd * sd AS var_num,
        |  n_gaps * n_gaps AS var_den,
        |  n_gaps * sdd - sd * sd = 0 AS metronome
        |FROM g WHERE n_gaps >= 2""".stripMargin,

    // IVF assignment CTEs + token census + the exact integer c-TF-IDF
    // surrogate, top-5 per cell via row_number (score DESC, term ASC).
    "q191_cluster_labels" ->
      s"""WITH $ivfAsgCtes,
         |cm AS (SELECT vec_id AS doc_id, cell FROM asg),
         |tk AS (
         |  SELECT doc_id,
         |    unnest(list_filter(string_split_regex(lower(text), '\\s+'),
         |      t -> len(t) > 0)) AS term
         |  FROM documents),
         |tf AS (
         |  SELECT cell, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM tk JOIN cm USING (doc_id) GROUP BY cell, term),
         |dfc AS (
         |  SELECT term, CAST(count(DISTINCT cell) AS BIGINT) AS cdf
         |  FROM tf GROUP BY term),
         |sc AS (
         |  SELECT cell, term, tf, cdf, tf * (16 - cdf) AS score
         |  FROM tf JOIN dfc USING (term)),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY cell
         |    ORDER BY score DESC, term) AS rk
         |  FROM sc)
         |SELECT cell, CAST(rk AS INT) AS rank, score, term, tf, cdf
         |FROM r WHERE rk <= 5""".stripMargin,

    // Gram hashes, window mins, per-doc distinct, df-capped pair join
    // — the winnowing replay over the same 48-bit md5 prefix hash.
    "q192_winnow_near_dups" ->
      """WITH w0 AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                             t -> len(t) > 0) AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, CASE WHEN len(w) >= 4
        |    THEN list_transform(generate_series(0, len(w) - 4),
        |      i -> CAST(('0x' || substr(md5(array_to_string(
        |        list_slice(w, i + 1, i + 4), ' ')), 1, 12)) AS BIGINT))
        |    ELSE CAST([] AS BIGINT[]) END AS gh
        |  FROM w0),
        |f0 AS (
        |  SELECT doc_id, CASE
        |    WHEN len(gh) = 0 THEN CAST([] AS BIGINT[])
        |    WHEN len(gh) < 5 THEN [list_min(gh)]
        |    ELSE list_transform(generate_series(1, len(gh) - 4),
        |      j -> list_min(list_slice(gh, j, j + 4))) END AS fps
        |  FROM g),
        |f AS (SELECT DISTINCT doc_id, unnest(fps) AS fp FROM f0),
        |r AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= 10),
        |pr AS (SELECT f.fp, f.doc_id FROM f JOIN r USING (fp)),
        |p AS (
        |  SELECT l.doc_id AS a, r2.doc_id AS b
        |  FROM pr l JOIN pr r2 USING (fp)
        |  WHERE l.doc_id < r2.doc_id)
        |SELECT a, b, CAST(count(*) AS BIGINT) AS n_shared
        |FROM p GROUP BY a, b HAVING count(*) >= 2""".stripMargin,

    // The overlap predicate run directly (oracle scale tolerates the
    // per-user quadratic join the binning avoids at 100 TB).
    "q193_interval_overlap" ->
      """WITH iv AS (
        |  SELECT user_id, event_id,
        |    epoch_us(ts) // 1000000 AS s0,
        |    epoch_us(ts) // 1000000
        |      + CAST(('0x' || substr(md5('d:' || CAST(event_id AS VARCHAR)),
        |          1, 15)) AS BIGINT) % 3600 + 60 AS e0
        |  FROM events)
        |SELECT l.user_id, l.event_id AS a, r.event_id AS b,
        |  least(l.e0, r.e0) - greatest(l.s0, r.s0) AS overlap
        |FROM iv l JOIN iv r
        |  ON l.user_id = r.user_id AND l.event_id < r.event_id
        |WHERE l.s0 < r.e0 AND r.s0 < l.e0""".stripMargin,

    // BM25 chain + dense cosine chain (an* CTE names; q22's shape with
    // the %100 query residue) + integer RRF merge.
    "q194_rrf_fusion" ->
      ("WITH " + bm25ChainSql + """,
        |aq AS (
        |  SELECT vec_id AS query_id,
        |    list_transform(embedding,
        |      e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS qv
        |  FROM embeddings WHERE vec_id % 100 = 0),
        |ac AS (
        |  SELECT vec_id AS neighbor_id,
        |    list_transform(embedding,
        |      e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS cv
        |  FROM embeddings),
        |an1 AS (SELECT query_id, qv,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)),
        |      i -> qv[i]*qv[i])) AS BIGINT) AS qn FROM aq),
        |an2 AS (SELECT neighbor_id, cv,
        |    CAST(list_sum(list_transform(generate_series(1, len(cv)),
        |      i -> cv[i]*cv[i])) AS BIGINT) AS cn FROM ac),
        |asc0 AS (
        |  SELECT query_id, neighbor_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)),
        |      i -> qv[i]*cv[i])) AS BIGINT) AS dot, qn, cn
        |  FROM an1, an2 WHERE query_id <> neighbor_id),
        |ar AS (
        |  SELECT query_id, neighbor_id,
        |    CAST(dot AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS sim
        |  FROM asc0),
        |ak AS (
        |  SELECT query_id, neighbor_id, row_number() OVER (
        |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM ar),
        |u AS (
        |  SELECT query_id, doc_id, rank FROM bmr WHERE rank <= 10
        |  UNION ALL
        |  SELECT query_id, neighbor_id AS doc_id, rank
        |  FROM ak WHERE rank <= 10),
        |fz AS (
        |  SELECT query_id, doc_id,
        |    CAST(sum(1000000 // (60 + rank)) AS BIGINT) AS rrf_micro,
        |    CAST(count(*) AS BIGINT) AS n_lists
        |  FROM u GROUP BY query_id, doc_id),
        |fr AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf_micro DESC, doc_id) AS rank
        |  FROM fz)
        |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf_micro,
        |  n_lists
        |FROM fr WHERE rank <= 10""".stripMargin),

    // IVF assignment + labels, within-cell cosine, top-10 by
    // (sim DESC, neighbor), majority vote (count DESC, label ASC).
    "q195_knn_mislabels" ->
      (s"""WITH $ivfAsgCtes,
         |al AS (
         |  SELECT a.vec_id, a.cell, a.qv, a.nsq, e.label
         |  FROM asg a JOIN embeddings e USING (vec_id)),
         |p AS (
         |  SELECT l.vec_id AS query_id, l.label, r.vec_id AS neighbor_id,
         |    r.label AS nl,
         |    CAST(list_sum(list_transform(generate_series(1, len(l.qv)),
         |      i -> l.qv[i]*r.qv[i])) AS DOUBLE)
         |      / (sqrt(CAST(l.nsq AS DOUBLE)) * sqrt(CAST(r.nsq AS DOUBLE)))
         |      AS sim
         |  FROM al l JOIN al r
         |    ON l.cell = r.cell AND l.vec_id <> r.vec_id),
         |tk AS (
         |  SELECT query_id, label, nl FROM (
         |    SELECT query_id, label, nl, row_number() OVER (
         |      PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk
         |    FROM p) WHERE rk <= 10),
         |vt AS (SELECT query_id, label, nl, count(*) AS nv
         |       FROM tk GROUP BY query_id, label, nl),
         |pr AS (
         |  SELECT query_id, label, nl AS pred_label,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY nv DESC, nl) AS rn,
         |    sum(nv) OVER (PARTITION BY query_id) AS n_votes
         |  FROM vt)
         |SELECT query_id AS vec_id, label, pred_label,
         |  CAST(n_votes AS BIGINT) AS n_votes,
         |  label <> pred_label AS mislabeled
         |FROM pr WHERE rn = 1""".stripMargin),

    // The q18/q19 band-candidate chain + exact set containment.
    "q196_containment" ->
      (s"""WITH bands AS ($minhashBandsSql),
         |cands AS (
         |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |  FROM bands l JOIN bands r
         |    ON l.band_id = r.band_id AND l.band_key = r.band_key
         |  WHERE l.doc_id < r.doc_id),
         |sets AS (${shingleSetsSql("")}),
         |p AS (
         |  SELECT c.a, c.b,
         |    CAST(len(sa.sh) AS BIGINT) AS n_a,
         |    CAST(len(sb.sh) AS BIGINT) AS n_b,
         |    CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS n_inter
         |  FROM cands c
         |  JOIN sets sa ON sa.doc_id = c.a
         |  JOIN sets sb ON sb.doc_id = c.b)
         |SELECT a, b, n_a, n_b, n_inter,
         |  (1000000 * n_inter) // n_a AS contain_a_micro,
         |  (1000000 * n_inter) // n_b AS contain_b_micro
         |FROM p
         |WHERE greatest((1000000 * n_inter) // n_a,
         |               (1000000 * n_inter) // n_b) >= 500000"""
        .stripMargin),

    // Per-bucket counts both snapshots, full-outer on bucket, exact
    // micro-proportions and |delta|.
    "q197_drift_census" ->
      """WITH b AS (SELECT doc_id, n_chars // 50 AS bucket FROM documents),
        |o AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_old
        |      FROM b WHERE doc_id % 3 <> 0 GROUP BY bucket),
        |n AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_new
        |      FROM b WHERE doc_id % 3 <> 1 GROUP BY bucket),
        |j AS (
        |  SELECT coalesce(o.bucket, n.bucket) AS bucket,
        |    coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
        |  FROM o FULL OUTER JOIN n ON o.bucket = n.bucket),
        |t AS (SELECT CAST(sum(n_old) AS BIGINT) AS xo,
        |             CAST(sum(n_new) AS BIGINT) AS xn FROM j)
        |SELECT bucket, n_old, n_new,
        |  (1000000 * n_old) // xo AS p_old_micro,
        |  (1000000 * n_new) // xn AS p_new_micro,
        |  abs((1000000 * n_old) // xo - (1000000 * n_new) // xn)
        |    AS delta_micro
        |FROM j, t""".stripMargin,

    "q198_label_spread" -> labelSpreadOracleSql(4),

    // The q110 train+encode replay rolled up per language with exact
    // micro-ratios.
    "q199_bpe_fertility" ->
      (s"""WITH bp AS (${bpeOracleSql(10)}),
         |j AS (
         |  SELECT d.lang, bp.n_tokens AS nt, bp.n_pieces AS np,
         |    bp.n_chars AS nc
         |  FROM bp JOIN documents d USING (doc_id)),
         |a AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(nt) AS BIGINT) AS n_tokens,
         |    CAST(sum(np) AS BIGINT) AS n_pieces,
         |    CAST(sum(nc) AS BIGINT) AS n_chars
         |  FROM j GROUP BY lang)
         |SELECT lang, n_docs, n_tokens, n_pieces, n_chars,
         |  (1000000 * n_pieces) // n_tokens AS fertility_micro,
         |  (1000000 * n_pieces) // n_chars AS compression_micro
         |FROM a""".stripMargin),

    // Dedup survivors → the shared rule-filter chain over them →
    // hash-shard census: the same three stages, chained.
    "q200_prep_pipeline" ->
      ("""WITH surv AS (
        |  SELECT d.doc_id, d.text FROM documents d
        |  JOIN (SELECT md5(text) AS dg, min(doc_id) AS keep_id
        |        FROM documents GROUP BY md5(text)) k
        |    ON d.doc_id = k.keep_id),
        |""".stripMargin + ruleFilterChainSql("surv") + """,
        |fin AS (
        |  SELECT s.doc_id, s.text
        |  FROM surv s JOIN rf ON rf.doc_id = s.doc_id AND rf.keep)
        |SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |         AS BIGINT) % 32 AS shard,
        |  count(*) AS n_docs,
        |  CAST(sum(len(list_filter(string_split_regex(lower(text), '\s+'),
        |       t -> len(t) > 0))) AS BIGINT) AS n_tokens,
        |  CAST(min(doc_id) AS BIGINT) AS min_id
        |FROM fin GROUP BY 1""".stripMargin),

    // Distinct (actor, item), power-user cut, per-actor pair join,
    // exact lift against the independence baseline.
    "q201_covisitation" ->
      """WITH ai AS (
        |  SELECT DISTINCT user_id AS actor,
        |    TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS INT) AS item
        |  FROM events),
        |ai2 AS (SELECT * FROM ai WHERE item IS NOT NULL),
        |ka AS (SELECT actor FROM ai2 GROUP BY actor
        |       HAVING count(*) <= 55),
        |k2 AS (SELECT ai2.* FROM ai2 JOIN ka USING (actor)),
        |tot AS (SELECT CAST(count(DISTINCT actor) AS BIGINT) AS nu
        |        FROM k2),
        |ic AS (SELECT item, CAST(count(*) AS BIGINT) AS n
        |       FROM k2 GROUP BY item),
        |p AS (
        |  SELECT l.item AS item_a, r.item AS item_b,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM k2 l JOIN k2 r ON l.actor = r.actor AND l.item < r.item
        |  GROUP BY l.item, r.item HAVING count(*) >= 40)
        |SELECT item_a, item_b, n_ab, a.n AS n_a, b.n AS n_b,
        |  CAST((CAST(1000000 AS HUGEINT) * n_ab * nu)
        |    // (CAST(a.n AS HUGEINT) * b.n) AS BIGINT) AS lift_micro
        |FROM p
        |JOIN ic a ON a.item = p.item_a
        |JOIN ic b ON b.item = p.item_b, tot""".stripMargin,

    // lead() transitions, add-one model, micro-nat scores, per-user
    // NLL sum.
    "q202_markov_anomaly" ->
      """WITH o AS (
        |  SELECT user_id, event_type AS from_state,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_state
        |  FROM events),
        |tr AS (SELECT * FROM o WHERE to_state IS NOT NULL),
        |cft AS (SELECT from_state, to_state, count(*) AS cft
        |        FROM tr GROUP BY from_state, to_state),
        |cf AS (SELECT from_state, count(*) AS cf
        |       FROM tr GROUP BY from_state),
        |v AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS nv
        |      FROM events),
        |m AS (
        |  SELECT cft.from_state, cft.to_state,
        |    CAST(round(1e6 * ln((cft.cft + 1.0) / (cf.cf + nv)))
        |      AS BIGINT) AS s
        |  FROM cft JOIN cf USING (from_state), v)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_trans,
        |  CAST(-sum(s) AS BIGINT) AS nll_micro
        |FROM tr JOIN m USING (from_state, to_state)
        |GROUP BY user_id""".stripMargin,

    // Same arithmetic-shift decay: 1e6 >> (age_days // 7), capped 62.
    "q203_decayed_counts" ->
      """WITH mx AS (SELECT max(CAST(ts AS DATE)) AS m FROM events),
        |a AS (
        |  SELECT TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS INT)
        |      AS item,
        |    CAST(m - CAST(ts AS DATE) AS BIGINT) AS age
        |  FROM events, mx)
        |SELECT item, CAST(count(*) AS BIGINT) AS n_obs,
        |  CAST(sum(1000000 >> CAST(least(greatest(age, 0) // 7, 62)
        |    AS INT)) AS BIGINT) AS decayed
        |FROM a GROUP BY item""".stripMargin,

    "q204_whitespace_tokens" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    regexp_replace(text, ' ',
        |      CASE WHEN doc_id % 3 = 0 THEN chr(10)
        |           WHEN doc_id % 3 = 1 THEN chr(9)
        |           ELSE ' ' || chr(10) || chr(9) END, 'g')
        |      || chr(9) || 'tail' || chr(10) || 'tok' AS wbase
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, wbase,
        |    wbase || CASE WHEN doc_id % 7 = 0
        |      THEN chr(10) || 'привет мир42 你好' ELSE '' END AS wuni
        |  FROM b)
        |SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(lower(wbase), '\s+'),
        |    t -> len(t) > 0)) AS INTEGER) AS n_tokens,
        |  CAST(len(list_filter(
        |    string_split_regex(lower(wuni), '[^\p{L}\p{N}]+'),
        |    t -> len(t) > 0)) AS INTEGER) AS n_pieces,
        |  md5(array_to_string(list_sort(list_distinct(list_filter(
        |    string_split_regex(lower(wbase), '\s+'),
        |    t -> len(t) > 0))), ' ')) AS fp
        |FROM u""".stripMargin,

    "q205_cjk_neardup" -> nearDupChainSqlOver(cjkCorpusToksSqlCtes),

    "q206_jpeg_media" ->
      s"""WITH m AS (
         |  SELECT doc_id AS media_id,
         |    CASE WHEN doc_id % 2 = 0
         |      THEN unhex('${graft.operators.Multimodal.JpegFixture.hex}')
         |      ELSE unhex('FFD8FFE000104A46') || encode(text) END AS content
         |  FROM documents WHERE doc_id < 200),
         |h AS (
         |  SELECT media_id, hex(content) AS hx,
         |    octet_length(content) AS nb
         |  FROM m),
         |c AS (
         |  SELECT media_id,
         |    md5(substring(hx, CAST(u.i * 128 + 1 AS INTEGER), 128)) AS fp
         |  FROM h, UNNEST(generate_series(0, (nb - 1) // 64)) AS u(i)),
         |f AS (
         |  SELECT media_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |    min(fp) AS min_fp
         |  FROM c GROUP BY media_id)
         |SELECT h.media_id,
         |  CASE WHEN starts_with(hx, '89504E470D0A1A0A') THEN 'png'
         |       WHEN starts_with(hx, 'FFD8FF') THEN 'jpeg'
         |       ELSE 'unknown' END AS kind,
         |  CAST(nb AS BIGINT) AS n_bytes,
         |  f.n_chunks, f.min_fp,
         |  CASE WHEN h.media_id % 2 = 0
         |    THEN CAST(${graft.operators.Multimodal.JpegFixture.dhash} AS BIGINT)
         |    ELSE NULL END AS dhash
         |FROM h JOIN f USING (media_id)""".stripMargin,

    "q207_manifest_stats" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt,
        |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
        |  min(n_chars) AS min_n_chars, max(n_chars) AS max_n_chars
        |FROM documents""".stripMargin,

    "q208_ewma" -> ewmaOracleSql,

    "q209_cusum" -> cusumOracleSql,

    "q210_dp_counts" -> dpCountsOracleSql,

    "q211_bq_knn" ->
      s"""WITH ${bqCtes("q.vec_id < 5", 50)}
         |SELECT query_id, rank, neighbor_id, hamming, sim
         |FROM apx""".stripMargin,

    "q216_benford" -> benfordOracleSql,

    "q217_fd_census" ->
      """WITH c AS (
        |  SELECT source, COALESCE(CAST(lang AS VARCHAR), ' NULL') AS dep,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |r AS (
        |  SELECT source, dep, c,
        |         row_number() OVER (PARTITION BY source ORDER BY c DESC, dep) AS rk
        |  FROM c),
        |g AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_rows,
        |         CAST(count(*) AS BIGINT) AS n_distinct_dep
        |  FROM c GROUP BY 1)
        |SELECT g.source, g.n_rows, g.n_distinct_dep, r.dep AS top_dep,
        |  CAST(round(1e6 * CAST(r.c AS DOUBLE) / CAST(g.n_rows AS DOUBLE)) AS BIGINT) AS top_share_micro,
        |  g.n_distinct_dep = 1 AS fd_holds
        |FROM g JOIN r ON r.source = g.source AND r.rk = 1""".stripMargin,

    "q213_char_entropy" ->
      """WITH d AS (
        |  SELECT doc_id, lower(text) AS t FROM documents
        |  WHERE length(lower(text)) >= 3),
        |g AS (
        |  SELECT doc_id,
        |         unnest(list_transform(generate_series(1, length(t) - 2),
        |           i -> substr(t, i, 3))) AS g
        |  FROM d),
        |c AS (
        |  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
        |  FROM g GROUP BY 1, 2),
        |r AS (
        |  SELECT doc_id,
        |         CAST(sum(c) AS BIGINT) AS n_grams,
        |         CAST(count(*) AS BIGINT) AS distinct_grams,
        |         CAST(sum(c * CAST(round(1e6 * ln(CAST(c AS DOUBLE))) AS BIGINT)) AS BIGINT) AS s
        |  FROM c GROUP BY 1)
        |SELECT doc_id, n_grams, distinct_grams,
        |  CAST(round(1e6 * ln(CAST(n_grams AS DOUBLE))) AS BIGINT)
        |    - CAST(round(CAST(s AS DOUBLE) / CAST(n_grams AS DOUBLE)) AS BIGINT)
        |    AS entropy_mnat
        |FROM r""".stripMargin,

    "q214_filter_agreement" ->
      ("WITH " + ruleFilterChainSql("documents") + """,
        |j AS (
        |  SELECT rf.keep AS a, (d.n_chars >= 200) AS b
        |  FROM rf JOIN documents d USING (doc_id)),
        |cells AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        |    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        |    CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        |    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
        |  FROM j WHERE a IS NOT NULL AND b IS NOT NULL)
        |SELECT n, n11, n10, n01, n00,
        |  CAST(round(1e6 * CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS po_micro,
        |  CAST(round(1e6 * CAST((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) AS DOUBLE)
        |    / CAST(n * n AS DOUBLE)) AS BIGINT) AS pe_micro,
        |  CASE WHEN n * n = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
        |       THEN NULL
        |       ELSE CAST(round(1e6 * CAST(n * (n11 + n00)
        |              - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) AS DOUBLE)
        |         / CAST(n * n - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) AS DOUBLE)) AS BIGINT)
        |  END AS kappa_micro
        |FROM cells""".stripMargin),

    "q215_embedding_health" ->
      """WITH v AS (
        |  SELECT list_transform(embedding,
        |           e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |x AS (
        |  SELECT CAST(unnest(generate_series(0, len(qv) - 1)) AS INT) AS dim,
        |         unnest(qv) AS v
        |  FROM v),
        |g AS (
        |  SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(v) AS BIGINT) AS s,
        |         CAST(sum(v * v) AS BIGINT) AS s2,
        |         CAST(sum(CASE WHEN abs(v) < 1000 THEN 1 ELSE 0 END) AS BIGINT) AS nz
        |  FROM x GROUP BY 1),
        |f AS (
        |  SELECT dim, n,
        |    CAST(round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS mean_micro,
        |    CAST(round(sqrt(CAST(n * s2 - s * s AS DOUBLE)) / CAST(n AS DOUBLE)) AS BIGINT) AS std_micro,
        |    CAST(round(1e6 * CAST(nz AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS nearzero_frac_micro
        |  FROM g)
        |SELECT dim, n, mean_micro, std_micro, nearzero_frac_micro,
        |       std_micro < 10000 AS collapsed
        |FROM f""".stripMargin,

    "q212_bq_recall" ->
      (s"""WITH ${bqCtes("q.vec_id < 20", 50)},
          |sce AS (
          |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          |         CAST(list_sum(list_transform(generate_series(1, len(q.qv)), i -> q.qv[i]*c.qv[i])) AS DOUBLE)
          |           / (sqrt(CAST(q.nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE))) AS sim
          |  FROM n q, n c WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
          |ex AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT query_id, neighbor_id,
          |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
          |    FROM sce)
          |  WHERE rank <= 10)
          |""".stripMargin + recallRollupSql),

    "q218_spoof_census" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' pаypal аdmin'
        |         WHEN doc_id % 11 = 3 THEN text || ' αlpha'
        |         ELSE text END AS text2
        |  FROM documents),
        |tok AS (
        |  SELECT source,
        |    len(list_filter(string_split_regex(lower(text2), '\s+'),
        |      t -> len(t) > 0
        |        AND regexp_matches(t, '[\p{Cyrillic}\p{Greek}]')
        |        AND regexp_matches(t, '[a-z]'))) AS nm
        |  FROM d)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN nm > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_mixed,
        |  CAST(sum(nm) AS BIGINT) AS n_mixed_tokens
        |FROM tok GROUP BY source""".stripMargin,

    "q219_power_law" ->
      """WITH f AS (
        |  SELECT CAST(round(1e6 * ln(CAST(n_chars AS DOUBLE) / 99.5)) AS BIGINT) AS lnq
        |  FROM documents WHERE n_chars >= 100),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(lnq) AS BIGINT) AS sum_ln_mnat
        |  FROM f)
        |SELECT n, sum_ln_mnat,
        |  CASE WHEN n = 0 THEN NULL
        |       ELSE 1000000 + CAST(round(1e12 * CAST(n AS DOUBLE)
        |         / CAST(sum_ln_mnat AS DOUBLE)) AS BIGINT) END AS alpha_micro
        |FROM s""".stripMargin,

    "q220_group_ols" ->
      """WITH e AS (
        |  SELECT user_id,
        |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
        |    CAST(round(value * 1e3) AS BIGINT) AS y
        |  FROM events),
        |a AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM e GROUP BY user_id)
        |SELECT user_id, n,
        |  n * sxy - sx * sy AS slope_num,
        |  n * sxx - sx * sx AS slope_den,
        |  sy * sxx - sx * sxy AS icept_num,
        |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
        |       ELSE CAST(round(1e6
        |         * (CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
        |         / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)
        |  END AS r2_micro
        |FROM a""".stripMargin,

    "q221_adamic_adar" -> adamicAdarOracleSql,

    "q222_textrank" -> textRankOracleSql(minCount = 3, iters = 4),

    "q223_top_component" ->
      (s"WITH ${topComponentCtes(4)}\n" +
        """SELECT mud.j - 1 AS dim, mud.m AS mean_micro,
          |  vv.v AS loading_micro
          |FROM mud JOIN v4 vv ON vv.j = mud.j""".stripMargin),

    "q224_abtt" ->
      (s"WITH ${topComponentCtes(4)},\n" +
        """p AS (
          |  SELECT cx.vec_id,
          |    CAST(round(CAST(sum(vv.v * cx.c) AS DOUBLE) / 1e6) AS BIGINT)
          |      AS proj
          |  FROM cx JOIN v4 vv ON vv.j = cx.j GROUP BY cx.vec_id),
          |r AS (
          |  SELECT cx.vec_id, cx.c
          |    - CAST(round(CAST(p.proj AS DOUBLE) * CAST(vv.v AS DOUBLE)
          |        / 1e6) AS BIGINT) AS r
          |  FROM cx JOIN p ON p.vec_id = cx.vec_id
          |  JOIN v4 vv ON vv.j = cx.j)
          |SELECT r.vec_id, p.proj AS proj_micro,
          |  CAST(sum(r.r * r.r) AS BIGINT) AS res_normsq
          |FROM r JOIN p ON p.vec_id = r.vec_id
          |WHERE r.vec_id < 100
          |GROUP BY 1, 2""".stripMargin),

    "q225_correlation" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      (for { i <- cols.indices; j <- i + 1 until cols.size }
        yield corrPairSql(cols(i), cols(j), "100")).mkString("\nUNION ALL\n")
    },

    "q226_mutual_info" ->
      """WITH c AS (
        |  SELECT COALESCE(CAST(source AS VARCHAR), ' NULL') AS a,
        |         COALESCE(CAST(lang AS VARCHAR), ' NULL') AS b,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |ca AS (SELECT a, CAST(sum(c) AS BIGINT) AS ca FROM c GROUP BY a),
        |cb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM c GROUP BY b),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |             CAST(count(*) AS BIGINT) AS cells FROM c),
        |s AS (
        |  SELECT CAST(sum(c.c * (
        |      CAST(round(1e6 * ln(CAST(c.c AS DOUBLE))) AS BIGINT)
        |    + CAST(round(1e6 * ln(CAST(t.n AS DOUBLE))) AS BIGINT)
        |    - CAST(round(1e6 * ln(CAST(ca.ca AS DOUBLE))) AS BIGINT)
        |    - CAST(round(1e6 * ln(CAST(cb.cb AS DOUBLE))) AS BIGINT)))
        |    AS BIGINT) AS s
        |  FROM c JOIN ca USING (a) JOIN cb USING (b) CROSS JOIN t),
        |sa AS (
        |  SELECT CAST(sum(ca *
        |    CAST(round(1e6 * ln(CAST(ca AS DOUBLE))) AS BIGINT))
        |    AS BIGINT) AS sa
        |  FROM ca),
        |sb AS (
        |  SELECT CAST(sum(cb *
        |    CAST(round(1e6 * ln(CAST(cb AS DOUBLE))) AS BIGINT))
        |    AS BIGINT) AS sb
        |  FROM cb),
        |f AS (
        |  SELECT t.n, t.cells AS n_cells,
        |    CAST(round(CAST(s.s AS DOUBLE) / CAST(t.n AS DOUBLE))
        |      AS BIGINT) AS mi_mnat,
        |    CAST(round(1e6 * ln(CAST(t.n AS DOUBLE))) AS BIGINT)
        |      - CAST(round(CAST(sa.sa AS DOUBLE) / CAST(t.n AS DOUBLE))
        |        AS BIGINT) AS h_a_mnat,
        |    CAST(round(1e6 * ln(CAST(t.n AS DOUBLE))) AS BIGINT)
        |      - CAST(round(CAST(sb.sb AS DOUBLE) / CAST(t.n AS DOUBLE))
        |        AS BIGINT) AS h_b_mnat
        |  FROM t, s, sa, sb)
        |SELECT n, n_cells, mi_mnat, h_a_mnat, h_b_mnat,
        |  CASE WHEN least(h_a_mnat, h_b_mnat) <= 0 THEN NULL
        |       ELSE CAST(round(1e6 * CAST(mi_mnat AS DOUBLE)
        |         / CAST(least(h_a_mnat, h_b_mnat) AS DOUBLE)) AS BIGINT)
        |  END AS nmi_micro
        |FROM f""".stripMargin,

    "q227_reciprocal_best" ->
      (s"""WITH pr AS (
          |$adamicAdarOracleSql
          |),
          |""".stripMargin +
        """d AS (
          |  SELECT a AS x, b AS y, aa_micro AS s FROM pr
          |  UNION ALL SELECT b AS x, a AS y, aa_micro AS s FROM pr),
          |rb AS (
          |  SELECT x, y, s,
          |    row_number() OVER (PARTITION BY x ORDER BY s DESC, y ASC)
          |      AS rn
          |  FROM d),
          |b1 AS (SELECT x, y, s FROM rb WHERE rn = 1)
          |SELECT p.x AS a, p.y AS b, p.s AS aa_micro
          |FROM b1 p JOIN b1 q
          |  ON p.x = q.y AND p.y = q.x AND p.x < p.y""".stripMargin),

    "q228_sentence_stats" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN t2 || '.' ELSE t2 END AS text2
        |  FROM (
        |    SELECT doc_id,
        |      regexp_replace(regexp_replace(text,
        |        ' table ', '. Table? ', 'g'),
        |        ' query ', ' query! ', 'g') AS t2
        |    FROM documents)),
        |s AS (
        |  SELECT doc_id,
        |    list_transform(
        |      list_filter(string_split_regex(text2, '[.!?]+\s+'),
        |        x -> len(trim(x)) > 0),
        |      x -> CAST(len(trim(x)) AS BIGINT)) AS ls,
        |    regexp_matches(rtrim(text2), '[.!?]$') AS ends_punct
        |  FROM d)
        |SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_sentences,
        |  CASE WHEN len(ls) = 0 THEN NULL
        |       ELSE CAST(round(1e6 * CAST(list_sum(ls) AS DOUBLE)
        |         / CAST(len(ls) AS DOUBLE)) AS BIGINT) END AS mean_len_micro,
        |  CASE WHEN len(ls) = 0 THEN NULL ELSE list_max(ls) END AS max_len,
        |  ends_punct
        |FROM s""".stripMargin,

    "q229_line_census" ->
      (s"WITH $lineFixtureSql,\n" +
        """l AS (
          |  SELECT doc_id, str_split(text3, chr(10)) AS al,
          |    list_filter(str_split(text3, chr(10)),
          |      x -> len(trim(x)) > 0) AS nb
          |  FROM lf)
          |SELECT doc_id, CAST(len(al) AS BIGINT) AS n_lines,
          |  CAST(len(al) - len(nb) AS BIGINT) AS n_blank,
          |  CASE WHEN len(nb) = 0 THEN NULL
          |       ELSE CAST(round(1e6 * CAST(len(list_filter(nb,
          |         x -> regexp_matches(trim(x), '^[-*•]'))) AS DOUBLE)
          |         / CAST(len(nb) AS DOUBLE)) AS BIGINT)
          |  END AS bullet_frac_micro,
          |  CASE WHEN len(nb) = 0 THEN NULL
          |       ELSE CAST(round(1e6 * CAST(len(list_filter(nb,
          |         x -> len(trim(x)) < 10)) AS DOUBLE)
          |         / CAST(len(nb) AS DOUBLE)) AS BIGINT)
          |  END AS short_frac_micro,
          |  CASE WHEN len(nb) = 0 THEN NULL
          |       ELSE CAST(round(1e6 * CAST(len(list_filter(nb,
          |         x -> regexp_matches(rtrim(x), '[.!?"]$'))) AS DOUBLE)
          |         / CAST(len(nb) AS DOUBLE)) AS BIGINT)
          |  END AS terminal_frac_micro
          |FROM l""".stripMargin),

    "q230_c4_line_scrub" ->
      (s"WITH $lineFixtureSql,\n" +
        """k AS (
          |  SELECT doc_id, str_split(text3, chr(10)) AS al,
          |    list_filter(str_split(text3, chr(10)), x ->
          |      regexp_matches(rtrim(x), '[.!?"]$')
          |      AND len(string_split_regex(trim(x), '\s+')) >= 3) AS kl
          |  FROM lf)
          |SELECT doc_id,
          |  md5(COALESCE(array_to_string(kl, chr(10)), '')) AS clean_md5,
          |  CAST(len(kl) AS BIGINT) AS n_kept,
          |  CAST(len(al) - len(kl) AS BIGINT) AS n_dropped
          |FROM k""".stripMargin),

    "q231_frequent_lines" ->
      (s"WITH $lineFixtureSql,\n" +
        """e AS (
          |  SELECT doc_id, trim(unnest(str_split(text3, chr(10)))) AS k
          |  FROM lf)
          |SELECT k AS line, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
          |FROM e WHERE len(k) > 0
          |GROUP BY k HAVING count(DISTINCT doc_id) >= 3""".stripMargin),

    "q232_frequent_line_scrub" ->
      (s"WITH $lineFixtureSql,\n" +
        """l AS (SELECT doc_id, str_split(text3, chr(10)) AS al FROM lf),
          |e AS (
          |  SELECT doc_id, u.i, al[u.i] AS line, trim(al[u.i]) AS k
          |  FROM l, UNNEST(generate_series(1, len(al))) AS u(i)),
          |fq AS (
          |  SELECT k FROM e WHERE len(k) > 0
          |  GROUP BY k HAVING count(DISTINCT doc_id) >= 3),
          |kept AS (
          |  SELECT e.doc_id, e.i, e.line
          |  FROM e LEFT JOIN fq ON fq.k = e.k
          |  WHERE fq.k IS NULL),
          |re AS (
          |  SELECT doc_id,
          |    array_to_string(list(line ORDER BY i), chr(10)) AS tc,
          |    CAST(count(*) AS BIGINT) AS n_kept
          |  FROM kept GROUP BY doc_id)
          |SELECT l.doc_id, md5(COALESCE(re.tc, '')) AS clean_md5,
          |  COALESCE(re.n_kept, 0) AS n_kept,
          |  CAST(len(l.al) AS BIGINT) - COALESCE(re.n_kept, 0)
          |    AS n_dropped
          |FROM l LEFT JOIN re ON re.doc_id = l.doc_id""".stripMargin),

    "q233_reliability" ->
      """WITH s AS (
        |  SELECT (vec_id * 2654435761) % 1000000 AS sm,
        |         (label % 2) <> 0 AS pos
        |  FROM embeddings),
        |b AS (
        |  SELECT least(9, (sm * 10) // 1000000) AS bin, sm, pos FROM s)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
        |  CAST(round(CAST(sum(sm) AS DOUBLE) / count(*)) AS BIGINT)
        |    AS mean_score_micro,
        |  CAST(round(1e6 * CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*)) AS BIGINT) AS pos_rate_micro,
        |  abs(CAST(round(CAST(sum(sm) AS DOUBLE) / count(*)) AS BIGINT)
        |    - CAST(round(1e6 * CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END)
        |      AS DOUBLE) / count(*)) AS BIGINT)) AS gap_micro
        |FROM b GROUP BY bin""".stripMargin,

    "q234_rank_eval" -> rankEvalOracleSql(10),

    "q235_split_leakage" ->
      s"""WITH RECURSIVE $dedupClosureCtes,
         |allc AS (
         |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
         |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
         |sp AS (
         |  SELECT component,
         |    CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
         |         WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM allc),
         |per AS (
         |  SELECT component, CAST(count(DISTINCT split) AS BIGINT) AS ns,
         |         CAST(count(*) AS BIGINT) AS nd
         |  FROM sp GROUP BY component)
         |SELECT CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_clusters_leaky,
         |  CAST(sum(CASE WHEN ns > 1 THEN nd ELSE 0 END) AS BIGINT)
         |    AS n_docs_in_leaky
         |FROM per""".stripMargin,

    "q236_group_auc" ->
      """WITH c AS (
        |  SELECT source, n_chars AS sc, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS pos
        |  FROM documents GROUP BY 1, 2),
        |r AS (
        |  SELECT source, cnt, pos,
        |    sum(cnt) OVER (PARTITION BY source ORDER BY sc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
        |      AS cb
        |  FROM c),
        |a AS (
        |  SELECT source, CAST(sum(pos) AS BIGINT) AS n1,
        |    CAST(sum(cnt - pos) AS BIGINT) AS n0,
        |    CAST(sum(pos * (2 * cb + cnt + 1)) AS BIGINT) AS trs
        |  FROM r GROUP BY source)
        |SELECT source, n1 AS n_pos, n0 AS n_neg,
        |  CASE WHEN n1 = 0 OR n0 = 0 THEN NULL
        |       ELSE CAST(round(1e6 * CAST(trs - n1 * (n1 + 1) AS DOUBLE)
        |         / (2.0 * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)))
        |         AS BIGINT)
        |  END AS auc_micro
        |FROM a""".stripMargin,

    "q241_rbo" -> rboOracleSql(10, 0.9),

    "q244_kaplan_meier" -> kaplanMeierOracleSql,

    "q246_median_survival" ->
      (s"""WITH km AS (
          |$kaplanMeierOracleSql
          |)
          |""".stripMargin +
        """SELECT cohort,
          |  min(CASE WHEN log_surv_mnat IS NULL
          |             OR log_surv_mnat <= -693147 THEN t END)
          |    AS median_t
          |FROM km GROUP BY cohort""".stripMargin),

    "q245_logrank" ->
      """WITH lv AS (
        |  SELECT CAST(user_id % 3 AS VARCHAR) AS g,
        |    CAST(datediff('day', min(CAST(ts AS DATE)),
        |      max(CAST(ts AS DATE))) AS BIGINT) AS t,
        |    max(CAST(ts AS DATE)) < DATE '2024-01-25' AS churned
        |  FROM events GROUP BY user_id
        |  HAVING CAST(user_id % 3 AS VARCHAR) IN ('0', '1')),
        |c AS (
        |  SELECT g, t,
        |    CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d,
        |    CAST(count(*) AS BIGINT) AS dc
        |  FROM lv GROUP BY 1, 2),
        |tots AS (SELECT g, CAST(sum(dc) AS BIGINT) AS N FROM c GROUP BY g),
        |grid AS (
        |  SELECT u.t, tots.g, tots.N,
        |    COALESCE(c.d, 0) AS d, COALESCE(c.dc, 0) AS dc
        |  FROM (SELECT DISTINCT t FROM c) u
        |  CROSS JOIN tots
        |  LEFT JOIN c ON c.g = tots.g AND c.t = u.t),
        |ar AS (
        |  SELECT t, g, d,
        |    N - (sum(dc) OVER (PARTITION BY g ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - dc)
        |      AS ar
        |  FROM grid),
        |tm AS (
        |  SELECT a.t, a.ar AS n1, b.ar AS n2, a.d AS d1, b.d AS d2,
        |    a.ar + b.ar AS n, a.d + b.d AS dt
        |  FROM ar a JOIN ar b ON b.t = a.t AND a.g = '0' AND b.g = '1'
        |  WHERE a.ar + b.ar > 1),
        |q AS (
        |  SELECT d1,
        |    CAST(round(1e6 * CAST(dt * n1 AS DOUBLE)
        |      / CAST(n AS DOUBLE)) AS BIGINT) AS e1,
        |    CAST(round(1e12
        |      * (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |         * CAST(dt AS DOUBLE) * CAST(n - dt AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |         * CAST(n - 1 AS DOUBLE))) AS BIGINT) AS v
        |  FROM tm),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_times,
        |    CAST(sum(d1) AS BIGINT) AS o1,
        |    CAST(sum(e1) AS BIGINT) AS e1_micro,
        |    CAST(sum(1000000 * d1 - e1) AS BIGINT) AS oe_sum_micro,
        |    CAST(sum(v) AS BIGINT) AS v_sum_pico
        |  FROM q)
        |SELECT n_times, o1, e1_micro, oe_sum_micro, v_sum_pico,
        |  CASE WHEN COALESCE(v_sum_pico, 0) <= 0 THEN NULL
        |       ELSE CAST(round(1e6
        |         * (CAST(oe_sum_micro AS DOUBLE)
        |            * CAST(oe_sum_micro AS DOUBLE))
        |         / CAST(v_sum_pico AS DOUBLE)) AS BIGINT)
        |  END AS chi2_micro
        |FROM s""".stripMargin,

    "q243_spearman" ->
      """WITH b AS (
        |  SELECT source, n_chars AS x, doc_id AS y FROM documents
        |  WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL),
        |cx AS (
        |  SELECT source, x, CAST(count(*) AS BIGINT) AS cnt
        |  FROM b GROUP BY 1, 2),
        |rx AS (
        |  SELECT source, x,
        |    2 * (sum(cnt) OVER (PARTITION BY source ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
        |      + cnt + 1 AS r
        |  FROM cx),
        |cy AS (
        |  SELECT source, y, CAST(count(*) AS BIGINT) AS cnt
        |  FROM b GROUP BY 1, 2),
        |ry AS (
        |  SELECT source, y,
        |    2 * (sum(cnt) OVER (PARTITION BY source ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
        |      + cnt + 1 AS r
        |  FROM cy),
        |j AS (
        |  SELECT b.source, rx.r AS rxv, ry.r AS ryv
        |  FROM b
        |  JOIN rx ON rx.source = b.source AND rx.x = b.x
        |  JOIN ry ON ry.source = b.source AND ry.y = b.y),
        |a AS (
        |  SELECT source, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(rxv) AS HUGEINT) AS sx,
        |    CAST(sum(ryv) AS HUGEINT) AS sy,
        |    CAST(sum(rxv * ryv) AS HUGEINT) AS sxy,
        |    CAST(sum(rxv * rxv) AS HUGEINT) AS sxx,
        |    CAST(sum(ryv * ryv) AS HUGEINT) AS syy
        |  FROM j GROUP BY source)
        |SELECT source, CAST(n AS BIGINT) AS n,
        |  CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0
        |       THEN NULL
        |       ELSE CAST(round(1e6
        |         * CAST(n * sxy - sx * sy AS DOUBLE)
        |         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))))
        |         AS BIGINT)
        |  END AS rho_micro
        |FROM a""".stripMargin,

    "q242_chi2_independence" ->
      """WITH c AS (
        |  SELECT COALESCE(CAST(source AS VARCHAR), ' NULL') AS a,
        |         COALESCE(CAST(lang AS VARCHAR), ' NULL') AS b,
        |         CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |ca AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM c GROUP BY a),
        |cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS cc FROM c GROUP BY b),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |             CAST(count(DISTINCT a) AS BIGINT) AS rl,
        |             CAST(count(DISTINCT b) AS BIGINT) AS cl FROM c),
        |z AS (
        |  SELECT CAST(sum(CAST(round(1e6 * CAST(ca.r * cb.cc AS DOUBLE)
        |    / CAST(t.n AS DOUBLE)) AS BIGINT)) AS BIGINT) AS z
        |  FROM ca, cb, t),
        |p AS (
        |  SELECT CAST(sum(
        |      CAST(round(1e6
        |        * (CAST(c.o * t.n - ca.r * cb.cc AS DOUBLE)
        |           * CAST(c.o * t.n - ca.r * cb.cc AS DOUBLE))
        |        / (CAST(ca.r AS DOUBLE) * CAST(cb.cc AS DOUBLE)
        |           * CAST(t.n AS DOUBLE))) AS BIGINT)
        |    - CAST(round(1e6 * CAST(ca.r * cb.cc AS DOUBLE)
        |        / CAST(t.n AS DOUBLE)) AS BIGINT)) AS BIGINT) AS p
        |  FROM c JOIN ca USING (a) JOIN cb USING (b) CROSS JOIN t),
        |f AS (
        |  SELECT t.n, t.rl AS r_levels, t.cl AS c_levels,
        |    (t.rl - 1) * (t.cl - 1) AS dof,
        |    CASE WHEN (t.rl - 1) * (t.cl - 1) = 0 THEN NULL
        |         ELSE z.z + p.p END AS chi2_micro
        |  FROM t, z, p)
        |SELECT n, r_levels, c_levels, dof, chi2_micro,
        |  CASE WHEN chi2_micro IS NULL THEN NULL
        |       ELSE CAST(round(1e6 * sqrt(CAST(chi2_micro AS DOUBLE)
        |         / 1e6 / (CAST(n AS DOUBLE)
        |           * CAST(least(r_levels - 1, c_levels - 1) AS DOUBLE))))
        |         AS BIGINT)
        |  END AS cramers_v_micro
        |FROM f""".stripMargin,

    "q240_concentration" ->
      """WITH c AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS v
        |  FROM documents GROUP BY 1, 2),
        |r AS (
        |  SELECT lang, v,
        |    row_number() OVER (PARTITION BY lang ORDER BY v, source)
        |      AS rk
        |  FROM c),
        |a AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS total,
        |    CAST(sum(rk * v) AS BIGINT) AS rx,
        |    CAST(sum(v * v) AS BIGINT) AS x2
        |  FROM r GROUP BY lang)
        |SELECT lang, n, total,
        |  CASE WHEN total <= 0 THEN NULL
        |       ELSE CAST(round(1e6 * CAST(2 * rx - (n + 1) * total
        |           AS DOUBLE) / CAST(n * total AS DOUBLE)) AS BIGINT)
        |  END AS gini_micro,
        |  CASE WHEN total <= 0 THEN NULL
        |       ELSE CAST(round(1e6 * CAST(x2 AS DOUBLE)
        |         / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)))
        |         AS BIGINT)
        |  END AS hhi_micro
        |FROM a""".stripMargin,

    "q238_vocab_growth" ->
      (s"WITH $vocabGrowthCtes\n" + "SELECT * FROM census"),

    "q239_heaps_fit" ->
      (s"WITH $vocabGrowthCtes,\n" +
        """cc AS (
          |  SELECT ln_tokens_milli - 9000 AS x, ln_types_milli - 3000 AS y
          |  FROM census),
          |a AS (
          |  SELECT CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |    CAST(sum(x * y) AS BIGINT) AS sxy,
          |    CAST(sum(x * x) AS BIGINT) AS sxx,
          |    CAST(sum(y * y) AS BIGINT) AS syy
          |  FROM cc)
          |SELECT 'all' AS corpus, n,
          |  n * sxy - sx * sy AS slope_num,
          |  n * sxx - sx * sx AS slope_den,
          |  sy * sxx - sx * sxy AS icept_num,
          |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
          |       THEN NULL
          |       ELSE CAST(round(1e6
          |         * (CAST(n * sxy - sx * sy AS DOUBLE)
          |            * CAST(n * sxy - sx * sy AS DOUBLE))
          |         / (CAST(n * sxx - sx * sx AS DOUBLE)
          |            * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)
          |  END AS r2_micro
          |FROM a""".stripMargin),

    "q237_collapse_repeats" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    regexp_replace(text, ' the ',
        |      chr(10) || 'repeat me' || chr(10) || 'repeat me' || chr(10),
        |      'g') AS text4
        |  FROM documents),
        |l AS (SELECT doc_id, str_split(text4, chr(10)) AS al FROM d),
        |k AS (
        |  SELECT doc_id, al,
        |    list_filter(al, (x, i) -> i = 1 OR trim(x) <> trim(al[i - 1]))
        |      AS kl
        |  FROM l)
        |SELECT doc_id,
        |  md5(COALESCE(array_to_string(kl, chr(10)), '')) AS clean_md5,
        |  CAST(len(kl) AS BIGINT) AS n_kept,
        |  CAST(len(al) - len(kl) AS BIGINT) AS n_dropped
        |FROM k""".stripMargin,

    "q247_cjk_sentence_stats" ->
      (s"WITH $cjkSentenceFixtureSql,\n" +
        """s AS (
          |  SELECT doc_id,
          |    list_transform(
          |      list_filter(
          |        string_split_regex(text2, '[.!?]+\s+|[。！？]+\s*'),
          |        x -> len(trim(x)) > 0),
          |      x -> CAST(len(trim(x)) AS BIGINT)) AS ls,
          |    regexp_matches(rtrim(text2), '[.!?。！？]$') AS ends_punct
          |  FROM f)
          |SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_sentences,
          |  CASE WHEN len(ls) = 0 THEN NULL
          |       ELSE CAST(round(1e6 * CAST(list_sum(ls) AS DOUBLE)
          |         / CAST(len(ls) AS DOUBLE)) AS BIGINT)
          |  END AS mean_len_micro,
          |  CASE WHEN len(ls) = 0 THEN NULL ELSE list_max(ls) END
          |    AS max_len,
          |  ends_punct
          |FROM s""".stripMargin),

    "q248_cjk_sentence_dedup" ->
      (s"WITH $cjkSentenceFixtureSql,\n" +
        """p AS (
          |  SELECT doc_id,
          |    list_filter(
          |      string_split_regex(text2, '[.!?]+\s+|[。！？]+\s*'),
          |      x -> len(trim(x)) > 0) AS parts
          |  FROM f),
          |s AS (
          |  SELECT doc_id,
          |    unnest(generate_series(1, len(parts))) AS pos,
          |    unnest(parts) AS sent
          |  FROM p),
          |k AS (
          |  SELECT doc_id, pos, sent,
          |    row_number() OVER (PARTITION BY sent ORDER BY doc_id, pos)
          |      AS rn
          |  FROM s WHERE len(sent) > 0)
          |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
          |  string_agg(sent, '。' ORDER BY pos) AS text_deduped
          |FROM k WHERE rn = 1 GROUP BY doc_id""".stripMargin),

    "q249_webp_media" ->
      s"""SELECT doc_id AS media_id,
         |  CASE WHEN doc_id % 3 = 1 THEN 'png' ELSE 'webp' END AS kind,
         |  CASE doc_id % 3
         |    WHEN 0 THEN CAST(octet_length(unhex(
         |      '${graft.operators.Multimodal.WebpFixture.hex}')) AS BIGINT)
         |    WHEN 1 THEN CAST(octet_length(unhex(
         |      '${graft.operators.Multimodal.WebpFixture.pngTwinHex}'))
         |      AS BIGINT)
         |    ELSE CAST(21 + octet_length(encode(text)) AS BIGINT)
         |  END AS n_bytes,
         |  CASE WHEN doc_id % 3 < 2
         |    THEN CAST(${graft.operators.Multimodal.WebpFixture.dhash}
         |      AS BIGINT)
         |    ELSE NULL END AS dhash
         |FROM documents WHERE doc_id < 180""".stripMargin,

    "q250_webp_neardup" ->
      """WITH ids AS (
        |  SELECT doc_id AS id FROM documents
        |  WHERE doc_id < 60 AND doc_id % 3 < 2)
        |SELECT a.id AS a, b.id AS b, CAST(0 AS INTEGER) AS hamming
        |FROM ids a JOIN ids b ON a.id < b.id""".stripMargin,

    "q251_cjk_fertility" ->
      (s"""WITH bp AS (${bpeOracleSqlOverCtes(10, cjkCorpusToksSqlCtes)}),
         |a AS (
         |  SELECT CASE WHEN doc_id < 100000 THEN 'cjk' ELSE 'latin' END
         |      AS lang,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |    CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
         |    CAST(sum(n_chars) AS BIGINT) AS n_chars
         |  FROM bp GROUP BY 1)
         |SELECT lang, n_docs, n_tokens, n_pieces, n_chars,
         |  (1000000 * n_pieces) // n_tokens AS fertility_micro,
         |  (1000000 * n_pieces) // n_chars AS compression_micro
         |FROM a""".stripMargin),

    "q252_bleu" -> bleuOracleSql,

    "q253_chrf" -> chrfOracleSql,

    "q254_modularity" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id % 400 AS a,
        |    400 + CAST(('0x' || substr(md5('mod:'
        |      || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 300 AS b
        |  FROM events),
        |lab AS (
        |  SELECT a % 7 AS la, b % 7 AS lb FROM e WHERE a <> b),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |    CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_within
        |  FROM lab),
        |ends AS (SELECT la AS l FROM lab UNION ALL SELECT lb FROM lab),
        |dc AS (SELECT l, CAST(count(*) AS BIGINT) AS d FROM ends
        |       GROUP BY 1),
        |sd AS (SELECT COALESCE(CAST(sum(CAST(d AS HUGEINT) * d)
        |         AS HUGEINT), 0) AS sumd2 FROM dc)
        |SELECT tot.n_edges, tot.n_within,
        |  CASE WHEN tot.n_edges > 0
        |    THEN CAST(round(1e6 * CAST(4 * CAST(tot.n_edges AS HUGEINT)
        |        * tot.n_within - sd.sumd2 AS DOUBLE)
        |      / (4.0 * CAST(tot.n_edges AS DOUBLE)
        |        * CAST(tot.n_edges AS DOUBLE))) AS BIGINT)
        |    ELSE NULL END AS q_micro
        |FROM tot, sd""".stripMargin,

    "q255_conformal" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substr(md5('cf:' || CAST(doc_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 1000000 AS score,
        |    doc_id % 2 = 0 AS is_calib
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, source,
        |    CAST(round(CAST(score AS DOUBLE) * 1e6) AS BIGINT) AS s,
        |    is_calib
        |  FROM d),
        |c AS (
        |  SELECT source, s, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY s, doc_id)
        |      AS rk
        |  FROM b WHERE is_calib),
        |n AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_calib,
        |    CAST(ceil(CAST(count(*) + 1 AS DOUBLE) * 0.9) AS BIGINT)
        |      AS target
        |  FROM c GROUP BY 1),
        |q AS (
        |  SELECT c.source, c.s AS qhat_micro
        |  FROM c JOIN n USING (source) WHERE c.rk = n.target),
        |e AS (
        |  SELECT b.source, CAST(count(*) AS BIGINT) AS n_eval,
        |    CAST(sum(CASE WHEN q.qhat_micro IS NULL
        |      OR b.s <= q.qhat_micro THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_covered
        |  FROM b LEFT JOIN q USING (source)
        |  WHERE NOT is_calib GROUP BY 1)
        |SELECT n.source, n.n_calib, q.qhat_micro,
        |  COALESCE(e.n_eval, 0) AS n_eval,
        |  COALESCE(e.n_covered, 0) AS n_covered,
        |  CASE WHEN COALESCE(e.n_eval, 0) > 0
        |    THEN CAST(round(1e6 * CAST(e.n_covered AS DOUBLE)
        |      / CAST(e.n_eval AS DOUBLE)) AS BIGINT)
        |    ELSE NULL END AS coverage_micro
        |FROM n LEFT JOIN q USING (source) LEFT JOIN e USING (source)""".stripMargin,

    "q256_jw_linkage" ->
      """WITH l AS (
        |  SELECT doc_id AS left_id, lang, source,
        |         substr(text, 1, 40) AS lt
        |  FROM documents WHERE doc_id % 2 = 0),
        |r AS (
        |  SELECT left_id + 1000000 AS right_id, lang, source,
        |         translate(lt, 'ae', 'ea') AS rt
        |  FROM l),
        |c AS (
        |  SELECT l.left_id, r.right_id,
        |    CAST(round(jaro_winkler_similarity(l.lt, r.rt) * 1e6)
        |      AS BIGINT) AS sim_micro
        |  FROM l JOIN r USING (lang, source)),
        |f AS (SELECT * FROM c WHERE sim_micro >= 820000),
        |k AS (
        |  SELECT left_id, right_id, sim_micro,
        |    row_number() OVER (PARTITION BY left_id
        |      ORDER BY sim_micro DESC, right_id) AS rank
        |  FROM f)
        |SELECT left_id, CAST(rank AS INTEGER) AS rank, sim_micro,
        |  right_id
        |FROM k WHERE rank <= 1""".stripMargin,

    "q257_ks_test" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v,
        |    user_id % 2 = 0 AS a
        |  FROM events WHERE value IS NOT NULL),
        |cells AS (
        |  SELECT g, v,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM b GROUP BY 1, 2),
        |run AS (
        |  SELECT g, v, ca, cb,
        |    sum(ca) OVER (PARTITION BY g ORDER BY v) AS ra,
        |    sum(cb) OVER (PARTITION BY g ORDER BY v) AS rb
        |  FROM cells),
        |tot AS (
        |  SELECT g, CAST(sum(ca) AS BIGINT) AS n_a,
        |    CAST(sum(cb) AS BIGINT) AS n_b
        |  FROM cells GROUP BY 1)
        |SELECT r.g AS event_type, t.n_a, t.n_b,
        |  CASE WHEN t.n_a > 0 AND t.n_b > 0
        |    THEN CAST(round(1e6 * CAST(max(abs(
        |        CAST(r.ra AS HUGEINT) * t.n_b
        |        - CAST(r.rb AS HUGEINT) * t.n_a)) AS DOUBLE)
        |      / (CAST(t.n_a AS DOUBLE) * CAST(t.n_b AS DOUBLE)))
        |      AS BIGINT)
        |    ELSE NULL END AS d_micro
        |FROM run r JOIN tot t USING (g)
        |GROUP BY 1, 2, 3""".stripMargin,

    "q258_psi" ->
      """WITH b AS (
        |  SELECT lang AS g,
        |    (n_chars + (CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 25 END))
        |      // 50 AS bin,
        |    doc_id % 2 = 0 AS a
        |  FROM documents),
        |cells AS (
        |  SELECT g, bin,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM b GROUP BY 1, 2),
        |tot AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n_bins,
        |    CAST(sum(ca) AS BIGINT) AS n_a,
        |    CAST(sum(cb) AS BIGINT) AS n_b
        |  FROM cells GROUP BY 1),
        |terms AS (
        |  SELECT c.g, t.n_bins, t.n_a, t.n_b,
        |    CAST(round(1e6
        |      * (CAST(c.ca + 1 AS DOUBLE)
        |          / CAST(t.n_a + t.n_bins AS DOUBLE)
        |        - CAST(c.cb + 1 AS DOUBLE)
        |          / CAST(t.n_b + t.n_bins AS DOUBLE))
        |      * ln((CAST(c.ca + 1 AS DOUBLE)
        |          / CAST(t.n_a + t.n_bins AS DOUBLE))
        |        / (CAST(c.cb + 1 AS DOUBLE)
        |          / CAST(t.n_b + t.n_bins AS DOUBLE)))) AS BIGINT) AS tm
        |  FROM cells c JOIN tot t USING (g))
        |SELECT g AS lang, n_bins, n_a, n_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN CAST(sum(tm) AS BIGINT)
        |    ELSE NULL END AS psi_micro
        |FROM terms GROUP BY 1, 2, 3, 4""".stripMargin,

    "q259_er_clusters" ->
      """WITH RECURSIVE u AS (
        |  SELECT doc_id, lang, source, substr(text, 1, 40) AS head
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, lang, source,
        |    translate(substr(text, 1, 40), 'ae', 'ea')
        |  FROM documents WHERE doc_id % 2 = 0),
        |c AS (
        |  SELECT l.doc_id AS left_id, r.doc_id AS right_id,
        |    CAST(round(jaro_winkler_similarity(l.head, r.head) * 1e6)
        |      AS BIGINT) AS sim
        |  FROM u l JOIN u r USING (lang, source)),
        |k3 AS (
        |  SELECT left_id, right_id, sim,
        |    row_number() OVER (PARTITION BY left_id
        |      ORDER BY sim DESC, right_id) AS rk
        |  FROM c WHERE sim >= 820000),
        |cand AS (
        |  SELECT DISTINCT left_id AS a, right_id AS b, sim
        |  FROM k3 WHERE rk <= 3 AND left_id < right_id),
        |d AS (SELECT a AS x, b AS y, sim AS s FROM cand
        |      UNION ALL SELECT b, a, sim FROM cand),
        |best AS (
        |  SELECT x, y FROM (
        |    SELECT x, y,
        |      row_number() OVER (PARTITION BY x ORDER BY s DESC, y)
        |        AS rn
        |    FROM d)
        |  WHERE rn = 1),
        |mutual AS (
        |  SELECT p.x AS a, p.y AS b
        |  FROM best p JOIN best q
        |    ON p.x = q.y AND p.y = q.x AND p.x < p.y),
        |e AS (SELECT a AS x, b AS y FROM mutual
        |      UNION SELECT b, a FROM mutual),
        |reach AS (
        |  SELECT x, y FROM e
        |  UNION
        |  SELECT r.x, e2.y FROM reach r JOIN e e2 ON e2.x = r.y
        |),
        |comp AS (
        |  SELECT x AS id, least(x, min(y)) AS component
        |  FROM reach GROUP BY x)
        |SELECT component, count(*) AS n_members,
        |  CAST(max(id) AS BIGINT) AS max_id
        |FROM comp GROUP BY 1""".stripMargin,

    "q260_l_diversity" ->
      """WITH b AS (
        |  SELECT lang, n_chars // 200 AS bucket,
        |    COALESCE(CAST(source AS VARCHAR), ' NULL') AS v
        |  FROM documents),
        |cells AS (
        |  SELECT lang, bucket, v, CAST(count(*) AS BIGINT) AS c
        |  FROM b GROUP BY 1, 2, 3)
        |SELECT lang, bucket, CAST(sum(c) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS l_distinct,
        |  CAST(round(1e6 * ln(CAST(sum(c) AS DOUBLE))) AS BIGINT)
        |    - CAST(round(CAST(sum(c * CAST(round(1e6
        |        * ln(CAST(c AS DOUBLE))) AS BIGINT)) AS DOUBLE)
        |      / CAST(sum(c) AS DOUBLE)) AS BIGINT) AS entropy_mnat
        |FROM cells GROUP BY 1, 2""".stripMargin,

    "q261_t_closeness" ->
      """WITH b AS (
        |  SELECT lang, n_chars // 200 AS bucket,
        |    COALESCE(CAST(source AS VARCHAR), ' NULL') AS v
        |  FROM documents),
        |g AS (SELECT v, CAST(count(*) AS BIGINT) AS gc FROM b
        |      GROUP BY 1),
        |tot AS (SELECT CAST(sum(gc) AS BIGINT) AS N FROM g),
        |cells AS (
        |  SELECT lang, bucket, v, CAST(count(*) AS BIGINT) AS c
        |  FROM b GROUP BY 1, 2, 3),
        |ct AS (SELECT lang, bucket, CAST(sum(c) AS BIGINT) AS n
        |       FROM cells GROUP BY 1, 2)
        |SELECT c.lang, c.bucket, ct.n,
        |  CAST(round(1e6 * CAST(sum(abs(CAST(c.c AS HUGEINT) * tot.N
        |      - CAST(g.gc AS HUGEINT) * ct.n))
        |    + CAST(ct.n AS HUGEINT) * (tot.N - sum(g.gc)) AS DOUBLE)
        |    / (2.0 * CAST(ct.n AS DOUBLE) * CAST(tot.N AS DOUBLE)))
        |    AS BIGINT) AS t_micro
        |FROM cells c
        |JOIN ct USING (lang, bucket)
        |JOIN g USING (v), tot
        |GROUP BY 1, 2, 3, tot.N""".stripMargin,

    "q262_seasonal_eval" ->
      """WITH b AS (
        |  SELECT user_id AS k, ts, event_id AS id,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT k, v,
        |    row_number() OVER (PARTITION BY k ORDER BY ts, id) AS rk
        |  FROM b),
        |j AS (
        |  SELECT c.k, c.v, l1.v AS v1, lp.v AS vp
        |  FROM r c
        |  JOIN r l1 ON l1.k = c.k AND l1.rk = c.rk - 1
        |  JOIN r lp ON lp.k = c.k AND lp.rk = c.rk - 4)
        |SELECT k AS user_id, CAST(count(*) AS BIGINT) AS n_scored,
        |  CAST(round(CAST(sum(abs(v - v1)) AS DOUBLE) / count(*))
        |    AS BIGINT) AS mae_naive_micro,
        |  CAST(round(CAST(sum(abs(v - vp)) AS DOUBLE) / count(*))
        |    AS BIGINT) AS mae_seasonal_micro,
        |  CASE WHEN sum(abs(v - v1)) > 0
        |    THEN CAST(round(1e6 * CAST(sum(abs(v - vp)) AS DOUBLE)
        |      / CAST(sum(abs(v - v1)) AS DOUBLE)) AS BIGINT)
        |    ELSE NULL END AS ratio_micro
        |FROM j GROUP BY 1""".stripMargin,

    "q263_neyman_alloc" ->
      """WITH st AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |    CAST(round(1e3 * sqrt(CAST(count(*) * sum(n_chars * n_chars)
        |      - sum(n_chars) * sum(n_chars) AS DOUBLE))) AS BIGINT)
        |      AS weight
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |w AS (SELECT lang, weight FROM st WHERE weight > 0),
        |t AS (SELECT CAST(sum(weight) AS BIGINT) AS W FROM w),
        |b AS (SELECT lang, weight,
        |        (10000 * weight) // W AS base,
        |        (10000 * weight) % W AS rem
        |      FROM w, t),
        |l AS (SELECT CAST(10000 - sum(base) AS BIGINT) AS R FROM b),
        |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, lang)
        |        AS rk FROM b),
        |app AS (
        |  SELECT lang, CAST(base AS BIGINT) AS base,
        |    CAST(base + CASE WHEN rk <= R THEN 1 ELSE 0 END AS BIGINT)
        |      AS alloc
        |  FROM r, l)
        |SELECT st.lang, st.n, st.weight,
        |  COALESCE(app.base, 0) AS base, COALESCE(app.alloc, 0) AS alloc
        |FROM st LEFT JOIN app USING (lang)""".stripMargin,

    "q264_bh_select" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    CASE WHEN doc_id % 20 = 0
        |      THEN CAST(('0x' || substr(md5('bh:'
        |        || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2000
        |      ELSE CAST(('0x' || substr(md5('bh:'
        |        || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000
        |    END AS p
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id, p,
        |    row_number() OVER (PARTITION BY source ORDER BY p, doc_id)
        |      AS rk
        |  FROM d),
        |m AS (SELECT source, CAST(count(*) AS BIGINT) AS m
        |      FROM d GROUP BY 1),
        |c AS (
        |  SELECT r.source, max(r.rk) AS cut
        |  FROM r JOIN m USING (source)
        |  WHERE r.p * m.m <= r.rk * 100000 GROUP BY 1)
        |SELECT r.source, r.doc_id, r.p AS p_micro,
        |  CAST(r.rk AS BIGINT) AS rank,
        |  r.rk <= COALESCE(c.cut, 0) AS discovery
        |FROM r LEFT JOIN c USING (source)""".stripMargin,

    "q265_gif_media" ->
      s"""SELECT doc_id AS media_id,
         |  CASE WHEN doc_id % 3 = 1 THEN 'png' ELSE 'gif' END AS kind,
         |  CASE doc_id % 3
         |    WHEN 0 THEN CAST(octet_length(unhex(
         |      '${graft.operators.Multimodal.GifFixture.hex}')) AS BIGINT)
         |    WHEN 1 THEN CAST(octet_length(unhex(
         |      '${graft.operators.Multimodal.WebpFixture.pngTwinHex}'))
         |      AS BIGINT)
         |    ELSE CAST(6 + octet_length(encode(text)) AS BIGINT)
         |  END AS n_bytes,
         |  CASE WHEN doc_id % 3 < 2
         |    THEN CAST(${graft.operators.Multimodal.WebpFixture.dhash}
         |      AS BIGINT)
         |    ELSE NULL END AS dhash
         |FROM documents WHERE doc_id < 180""".stripMargin,

    "q266_wasserstein" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v,
        |    user_id % 2 = 0 AS a
        |  FROM events WHERE value IS NOT NULL),
        |cells AS (
        |  SELECT g, v,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM b GROUP BY 1, 2),
        |run AS (
        |  SELECT g, v,
        |    sum(ca) OVER (PARTITION BY g ORDER BY v) AS ra,
        |    sum(cb) OVER (PARTITION BY g ORDER BY v) AS rb,
        |    lead(v) OVER (PARTITION BY g ORDER BY v) AS vn
        |  FROM cells),
        |tot AS (
        |  SELECT g, CAST(sum(ca) AS BIGINT) AS n_a,
        |    CAST(sum(cb) AS BIGINT) AS n_b
        |  FROM cells GROUP BY 1),
        |terms AS (
        |  SELECT r.g,
        |    sum(CAST(r.vn - r.v AS HUGEINT)
        |      * abs(CAST(r.ra AS HUGEINT) * t.n_b
        |        - CAST(r.rb AS HUGEINT) * t.n_a)) AS num
        |  FROM run r JOIN tot t USING (g)
        |  WHERE r.vn IS NOT NULL GROUP BY 1)
        |SELECT t.g AS event_type, t.n_a, t.n_b,
        |  CASE WHEN t.n_a > 0 AND t.n_b > 0
        |    THEN CAST(round(CAST(COALESCE(x.num, 0) AS DOUBLE)
        |      / (CAST(t.n_a AS DOUBLE) * CAST(t.n_b AS DOUBLE)))
        |      AS BIGINT)
        |    ELSE NULL END AS w1_micro
        |FROM tot t LEFT JOIN terms x USING (g)""".stripMargin,

    "q267_mann_whitney" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v,
        |    user_id % 2 = 0 AS a
        |  FROM events WHERE value IS NOT NULL),
        |cells AS (
        |  SELECT g, v,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS cb,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM b GROUP BY 1, 2),
        |run AS (
        |  SELECT g, ca, cb, c,
        |    sum(c) OVER (PARTITION BY g ORDER BY v) - c AS r
        |  FROM cells),
        |st AS (
        |  SELECT g, CAST(sum(ca) AS BIGINT) AS n_a,
        |    CAST(sum(cb) AS BIGINT) AS n_b,
        |    CAST(sum(ca * (2 * r + c + 1)) AS BIGINT) AS r2a,
        |    sum(CAST(c AS HUGEINT) * c * c - c) AS ties
        |  FROM run GROUP BY 1),
        |f AS (
        |  SELECT g, n_a, n_b,
        |    r2a - n_a * (n_a + 1) AS u2a,
        |    CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) AS nn,
        |    CAST(n_a + n_b AS DOUBLE) AS bign,
        |    CAST(ties AS DOUBLE) AS td
        |  FROM st),
        |f2 AS (
        |  SELECT g, n_a, n_b, u2a, nn,
        |    nn / 12.0 * (bign + 1.0 - td / (bign * (bign - 1.0)))
        |      AS sigma2
        |  FROM f)
        |SELECT g AS event_type, n_a, n_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN u2a ELSE NULL END AS u2_a,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND sigma2 > 0.0
        |    THEN CAST(round(1e6 * (CAST(u2a AS DOUBLE) - nn)
        |      / (2.0 * sqrt(sigma2))) AS BIGINT)
        |    ELSE NULL END AS z_micro,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |    THEN CAST(round(1e6 * (1.0 - CAST(u2a AS DOUBLE) / nn))
        |      AS BIGINT)
        |    ELSE NULL END AS rbc_micro
        |FROM f2""".stripMargin,

    "q268_mcnemar" ->
      """WITH b AS (
        |  SELECT lang,
        |    n_chars >= 500 AS ra,
        |    n_chars >= 480 AND doc_id % 13 <> 0 AS rb
        |  FROM documents),
        |c AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n01,
        |    CAST(sum(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n10
        |  FROM b GROUP BY 1)
        |SELECT lang, n, n01, n10,
        |  CASE WHEN n01 + n10 > 0
        |    THEN CAST(round(1e6
        |      * (CAST(abs(n01 - n10) AS DOUBLE) - 1.0)
        |      * (CAST(abs(n01 - n10) AS DOUBLE) - 1.0)
        |      / CAST(n01 + n10 AS DOUBLE)) AS BIGINT)
        |    ELSE NULL END AS chi2_micro
        |FROM c""".stripMargin,

    "q269_welch_t" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v,
        |    user_id % 2 = 0 AS a
        |  FROM events WHERE value IS NOT NULL),
        |st AS (
        |  SELECT g,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    sum(CASE WHEN a THEN v ELSE 0 END) AS s_a,
        |    sum(CASE WHEN a THEN CAST(v AS HUGEINT) * v
        |      ELSE 0 END) AS q_a,
        |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    sum(CASE WHEN NOT a THEN v ELSE 0 END) AS s_b,
        |    sum(CASE WHEN NOT a THEN CAST(v AS HUGEINT) * v
        |      ELSE 0 END) AS q_b
        |  FROM b GROUP BY 1),
        |f AS (
        |  SELECT g, n_a, n_b,
        |    CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |      - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS dm,
        |    (CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE)
        |        * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |      / (CAST(n_a AS DOUBLE) - 1.0) / CAST(n_a AS DOUBLE)
        |      AS va,
        |    (CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE)
        |        * CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |      / (CAST(n_b AS DOUBLE) - 1.0) / CAST(n_b AS DOUBLE)
        |      AS vb
        |  FROM st)
        |SELECT g AS event_type, n_a, n_b,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND va + vb > 0.0
        |    THEN CAST(round(1e6 * dm / sqrt(va + vb)) AS BIGINT)
        |    ELSE NULL END AS t_micro,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND va + vb > 0.0
        |      AND (va > 0.0 OR vb > 0.0)
        |    THEN CAST(round(1e6 * (va + vb) * (va + vb)
        |      / (va * va / (CAST(n_a AS DOUBLE) - 1.0)
        |        + vb * vb / (CAST(n_b AS DOUBLE) - 1.0))) AS BIGINT)
        |    ELSE NULL END AS df_micro
        |FROM f""".stripMargin,

    "q270_jsd" ->
      """WITH b AS (
        |  SELECT lang AS g,
        |    (n_chars + (CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 25 END))
        |      // 50 AS bin,
        |    doc_id % 2 = 0 AS a
        |  FROM documents),
        |cells AS (
        |  SELECT g, bin,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM b GROUP BY 1, 2),
        |tot AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n_bins,
        |    CAST(sum(ca) AS BIGINT) AS n_a,
        |    CAST(sum(cb) AS BIGINT) AS n_b
        |  FROM cells GROUP BY 1),
        |terms AS (
        |  SELECT c.g, t.n_bins, t.n_a, t.n_b,
        |    CAST(round(1e6
        |      * ((CAST(c.ca + 1 AS DOUBLE)
        |            / CAST(t.n_a + t.n_bins AS DOUBLE))
        |          * ln((CAST(c.ca + 1 AS DOUBLE)
        |              / CAST(t.n_a + t.n_bins AS DOUBLE))
        |            / (((CAST(c.ca + 1 AS DOUBLE)
        |                / CAST(t.n_a + t.n_bins AS DOUBLE))
        |              + (CAST(c.cb + 1 AS DOUBLE)
        |                / CAST(t.n_b + t.n_bins AS DOUBLE))) / 2.0))
        |        + (CAST(c.cb + 1 AS DOUBLE)
        |            / CAST(t.n_b + t.n_bins AS DOUBLE))
        |          * ln((CAST(c.cb + 1 AS DOUBLE)
        |              / CAST(t.n_b + t.n_bins AS DOUBLE))
        |            / (((CAST(c.ca + 1 AS DOUBLE)
        |                / CAST(t.n_a + t.n_bins AS DOUBLE))
        |              + (CAST(c.cb + 1 AS DOUBLE)
        |                / CAST(t.n_b + t.n_bins AS DOUBLE))) / 2.0)))
        |      / 2.0) AS BIGINT) AS tm
        |  FROM cells c JOIN tot t USING (g))
        |SELECT g AS lang, n_bins, n_a, n_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN CAST(sum(tm) AS BIGINT)
        |    ELSE NULL END AS jsd_micro
        |FROM terms GROUP BY 1, 2, 3, 4""".stripMargin,

    "q271_acf" ->
      """WITH b AS (
        |  SELECT event_type AS k, ts, event_id,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT k,
        |    row_number() OVER (PARTITION BY k ORDER BY ts, event_id)
        |      AS rk,
        |    v
        |  FROM b),
        |tot AS (
        |  SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(v AS HUGEINT)) AS s,
        |    sum(CAST(v AS HUGEINT) * v) AS q
        |  FROM r GROUP BY 1),
        |p AS (
        |  SELECT h.k, t.rk - h.rk AS lag,
        |    CAST(count(*) AS BIGINT) AS n_pairs,
        |    sum(CAST(h.v AS HUGEINT) * t.v) AS pp,
        |    sum(CAST(h.v AS HUGEINT)) AS hh,
        |    sum(CAST(t.v AS HUGEINT)) AS tt
        |  FROM r h JOIN r t
        |    ON h.k = t.k AND t.rk - h.rk BETWEEN 1 AND 5
        |  GROUP BY 1, 2)
        |SELECT p.k AS event_type, CAST(p.lag AS BIGINT) AS lag,
        |  tot.n, p.n_pairs,
        |  CASE WHEN (tot.q * tot.n - tot.s * tot.s) * tot.n > 0
        |    THEN CAST(round(1e6
        |      * CAST(p.pp * tot.n * tot.n
        |          - tot.s * (p.hh + p.tt) * tot.n
        |          + tot.s * tot.s * p.n_pairs AS DOUBLE)
        |      / CAST((tot.q * tot.n - tot.s * tot.s) * tot.n
        |          AS DOUBLE)) AS BIGINT)
        |    ELSE NULL END AS acf_micro
        |FROM p JOIN tot USING (k)""".stripMargin,

    "q272_changepoint" ->
      """WITH b AS (
        |  SELECT event_type AS k, ts, event_id,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT k,
        |    row_number() OVER (PARTITION BY k ORDER BY ts, event_id)
        |      AS rk,
        |    v
        |  FROM b),
        |pre AS (
        |  SELECT k, rk,
        |    sum(v) OVER (PARTITION BY k ORDER BY rk) AS p
        |  FROM r),
        |tot AS (
        |  SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS s
        |  FROM r GROUP BY 1),
        |cand AS (
        |  SELECT pre.k, tot.n,
        |    CAST(round((CAST(pre.p AS DOUBLE) * CAST(pre.p AS DOUBLE)
        |          / CAST(pre.rk AS DOUBLE)
        |        + (CAST(tot.s AS DOUBLE) - CAST(pre.p AS DOUBLE))
        |          * (CAST(tot.s AS DOUBLE) - CAST(pre.p AS DOUBLE))
        |          / (CAST(tot.n AS DOUBLE) - CAST(pre.rk AS DOUBLE))
        |        - CAST(tot.s AS DOUBLE) * CAST(tot.s AS DOUBLE)
        |          / CAST(tot.n AS DOUBLE)) / 1e6) AS BIGINT)
        |      AS gain_micro,
        |    CAST(pre.rk AS BIGINT) AS split_rank,
        |    CAST(round(CAST(pre.p AS DOUBLE) / CAST(pre.rk AS DOUBLE))
        |      AS BIGINT) AS mean_left_micro,
        |    CAST(round((CAST(tot.s AS DOUBLE) - CAST(pre.p AS DOUBLE))
        |      / (CAST(tot.n AS DOUBLE) - CAST(pre.rk AS DOUBLE)))
        |      AS BIGINT) AS mean_right_micro
        |  FROM pre JOIN tot USING (k)
        |  WHERE pre.rk < tot.n),
        |pick AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY k
        |      ORDER BY gain_micro DESC, split_rank ASC) AS rn
        |  FROM cand)
        |SELECT k AS event_type, n, split_rank, gain_micro,
        |  mean_left_micro, mean_right_micro
        |FROM pick WHERE rn = 1""".stripMargin,

    "q273_isotonic" ->
      """WITH b AS (
        |  SELECT source AS g, n_chars // 100 AS bin, lang = 'en' AS y
        |  FROM documents),
        |bins AS (
        |  SELECT g, bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM b GROUP BY 1, 2),
        |pre AS (
        |  SELECT g, bin, n, pos,
        |    row_number() OVER (PARTITION BY g ORDER BY bin) AS rk,
        |    sum(n) OVER (PARTITION BY g ORDER BY bin) AS cn,
        |    sum(pos) OVER (PARTITION BY g ORDER BY bin) AS cp
        |  FROM bins),
        |seg AS (
        |  SELECT l.g, l.rk AS i, r.rk AS j,
        |    CAST(round(1e6
        |      * CAST(r.cp - l.cp + l.pos AS DOUBLE)
        |      / CAST(r.cn - l.cn + l.n AS DOUBLE)) AS BIGINT) AS rm
        |  FROM pre l JOIN pre r ON l.g = r.g AND l.rk <= r.rk),
        |inner_min AS (
        |  SELECT s.g, p.rk AS k, s.i, min(s.rm) AS mn
        |  FROM seg s JOIN pre p
        |    ON s.g = p.g AND s.i <= p.rk AND p.rk <= s.j
        |  GROUP BY 1, 2, 3),
        |fit AS (
        |  SELECT g, k, max(mn) AS fit_micro
        |  FROM inner_min GROUP BY 1, 2)
        |SELECT pre.g AS source, pre.bin, pre.n, pre.pos,
        |  CAST(round(1e6 * CAST(pre.pos AS DOUBLE)
        |    / CAST(pre.n AS DOUBLE)) AS BIGINT) AS rate_micro,
        |  CAST(f.fit_micro AS BIGINT) AS fit_micro
        |FROM pre JOIN fit f ON pre.g = f.g AND pre.rk = f.k""".stripMargin,

    "q274_rouge" -> rougeOracleSql,

    "q275_link_jaccard" ->
      """WITH e AS (
        |  SELECT DISTINCT l_orderkey AS s, l_partkey AS z
        |  FROM lineitem),
        |zu AS (SELECT z FROM e GROUP BY z HAVING count(*) <= 40),
        |u AS (SELECT e.s, e.z FROM e JOIN zu USING (z)),
        |deg AS (
        |  SELECT s, CAST(count(*) AS BIGINT) AS deg FROM u GROUP BY 1),
        |w AS (
        |  SELECT a.s AS a, b.s AS b,
        |    CAST(count(*) AS BIGINT) AS common
        |  FROM u a JOIN u b ON a.z = b.z AND a.s < b.s
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT w.a, w.b, w.common AS common_neighbors,
        |  da.deg AS deg_a, db.deg AS deg_b,
        |  CAST(round(1e6 * CAST(w.common AS DOUBLE)
        |    / CAST(da.deg + db.deg - w.common AS DOUBLE)) AS BIGINT)
        |    AS jaccard_micro
        |FROM w JOIN deg da ON w.a = da.s JOIN deg db ON w.b = db.s"""
      .stripMargin,

    "q276_video_meta" ->
      s"""SELECT doc_id AS media_id,
         |  CASE WHEN doc_id % 3 IN (0, 1) THEN 'mp4'
         |    WHEN substr(hex(encode(text)), 1, 4) = '0000'
         |      AND substr(hex(encode(text)), 9, 8) = '66747970'
         |      THEN 'mp4'
         |    ELSE 'unknown' END AS kind,
         |  CASE doc_id % 3
         |    WHEN 0 THEN CAST(octet_length(unhex(
         |      '${graft.operators.Multimodal.Mp4Fixture.hex}')) AS BIGINT)
         |    WHEN 1 THEN CAST(8 + octet_length(encode(text)) AS BIGINT)
         |    ELSE CAST(octet_length(encode(text)) AS BIGINT)
         |  END AS n_bytes,
         |  CASE WHEN doc_id % 3 = 0 THEN 'isom' ELSE NULL END AS brand,
         |  CASE WHEN doc_id % 3 = 0 THEN CAST(1000 AS BIGINT)
         |    ELSE NULL END AS timescale,
         |  CASE WHEN doc_id % 3 = 0 THEN CAST(5500 AS BIGINT)
         |    ELSE NULL END AS duration,
         |  CASE WHEN doc_id % 3 = 0 THEN CAST(5500 AS BIGINT)
         |    ELSE NULL END AS duration_ms
         |FROM documents WHERE doc_id < 180""".stripMargin,

    "q277_bmp_media" ->
      s"""SELECT doc_id AS media_id,
         |  CASE WHEN doc_id % 3 = 1 THEN 'png' ELSE 'bmp' END AS kind,
         |  CASE doc_id % 3
         |    WHEN 0 THEN CAST(octet_length(unhex(
         |      '${graft.operators.Multimodal.BmpFixture.hex}')) AS BIGINT)
         |    WHEN 1 THEN CAST(octet_length(unhex(
         |      '${graft.operators.Multimodal.WebpFixture.pngTwinHex}'))
         |      AS BIGINT)
         |    ELSE CAST(10 + octet_length(encode(text)) AS BIGINT)
         |  END AS n_bytes,
         |  CASE WHEN doc_id % 3 < 2
         |    THEN CAST(${graft.operators.Multimodal.WebpFixture.dhash}
         |      AS BIGINT)
         |    ELSE NULL END AS dhash
         |FROM documents WHERE doc_id < 180""".stripMargin,

    "q278_embedding_drift" ->
      """WITH v AS (
        |  SELECT label AS g, vec_id % 2 = 0 AS a,
        |    list_transform(embedding,
        |      e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS qv
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |cnt AS (
        |  SELECT g,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b
        |  FROM v GROUP BY 1),
        |ex AS (
        |  SELECT g, a, unnest(qv) AS c,
        |    CAST(unnest(generate_series(0, len(qv) - 1)) AS INT) AS dim
        |  FROM v),
        |dims AS (
        |  SELECT g, dim,
        |    CAST(sum(CASE WHEN a THEN c ELSE 0 END) AS BIGINT) AS sa,
        |    CAST(sum(CASE WHEN NOT a THEN c ELSE 0 END) AS BIGINT) AS sb
        |  FROM ex GROUP BY 1, 2),
        |agg AS (
        |  SELECT g, sum(CAST(sa AS HUGEINT) * sb) AS dot,
        |    sum(CAST(sa AS HUGEINT) * sa) AS na2,
        |    sum(CAST(sb AS HUGEINT) * sb) AS nb2
        |  FROM dims GROUP BY 1)
        |SELECT cnt.g AS label, cnt.n_a, cnt.n_b,
        |  CASE WHEN cnt.n_a > 0 AND cnt.n_b > 0
        |      AND agg.na2 > 0 AND agg.nb2 > 0
        |    THEN CAST(round(1e6 * CAST(agg.dot AS DOUBLE)
        |      / (sqrt(CAST(agg.na2 AS DOUBLE))
        |        * sqrt(CAST(agg.nb2 AS DOUBLE)))) AS BIGINT)
        |    ELSE NULL END AS cos_micro,
        |  CASE WHEN cnt.n_a > 0 AND cnt.n_b > 0
        |    THEN CAST(round(sqrt(greatest(0.0,
        |      CAST(agg.na2 AS DOUBLE)
        |        / (CAST(cnt.n_a AS DOUBLE) * CAST(cnt.n_a AS DOUBLE))
        |      - 2.0 * CAST(agg.dot AS DOUBLE)
        |        / (CAST(cnt.n_a AS DOUBLE) * CAST(cnt.n_b AS DOUBLE))
        |      + CAST(agg.nb2 AS DOUBLE)
        |        / (CAST(cnt.n_b AS DOUBLE) * CAST(cnt.n_b AS DOUBLE)))))
        |      AS BIGINT)
        |    ELSE NULL END AS shift_micro
        |FROM cnt JOIN agg USING (g)""".stripMargin,

    "q279_holt" -> holtOracleSql,

    "q280_community_quality" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id % 400 AS a,
        |    400 + CAST(('0x' || substr(md5('mod:'
        |      || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 300 AS b
        |  FROM events),
        |nodes AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT a AS node FROM e UNION ALL SELECT b FROM e)),
        |lab AS (
        |  SELECT a % 7 AS la, b % 7 AS lb FROM e WHERE a <> b),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM lab),
        |vol AS (
        |  SELECT l, CAST(count(*) AS BIGINT) AS volume FROM (
        |    SELECT la AS l FROM lab UNION ALL SELECT lb FROM lab)
        |  GROUP BY 1),
        |ein AS (
        |  SELECT la AS l, CAST(count(*) AS BIGINT) AS e_in
        |  FROM lab WHERE la = lb GROUP BY 1),
        |nn AS (
        |  SELECT node % 7 AS l, CAST(count(*) AS BIGINT) AS n_nodes
        |  FROM nodes GROUP BY 1),
        |j AS (
        |  SELECT nn.l, nn.n_nodes,
        |    COALESCE(ein.e_in, 0) AS e_in,
        |    COALESCE(vol.volume, 0) AS volume, m.m
        |  FROM nn LEFT JOIN vol USING (l) LEFT JOIN ein USING (l), m)
        |SELECT l AS lbl, n_nodes, e_in, volume,
        |  volume - 2 * e_in AS cut,
        |  CASE WHEN least(volume, 2 * m - volume) > 0
        |    THEN CAST(round(1e6
        |      * CAST(volume - 2 * e_in AS DOUBLE)
        |      / CAST(least(volume, 2 * m - volume) AS DOUBLE))
        |      AS BIGINT)
        |    ELSE NULL END AS conductance_micro
        |FROM j""".stripMargin,

    "q281_merge_gain" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id % 400 AS a,
        |    400 + CAST(('0x' || substr(md5('mod:'
        |      || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 300 AS b
        |  FROM events),
        |lab AS (
        |  SELECT a % 7 AS la, b % 7 AS lb FROM e WHERE a <> b),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM lab),
        |deg AS (
        |  SELECT l, CAST(count(*) AS BIGINT) AS d FROM (
        |    SELECT la AS l FROM lab UNION ALL SELECT lb FROM lab)
        |  GROUP BY 1),
        |bw AS (
        |  SELECT least(la, lb) AS label_a, greatest(la, lb) AS label_b,
        |    CAST(count(*) AS BIGINT) AS e_between
        |  FROM lab WHERE la <> lb GROUP BY 1, 2)
        |SELECT bw.label_a, bw.label_b, bw.e_between,
        |  da.d AS d_a, db.d AS d_b,
        |  CAST(round(1e6
        |    * CAST(2 * CAST(m.m AS HUGEINT) * bw.e_between
        |        - CAST(da.d AS HUGEINT) * db.d AS DOUBLE)
        |    / (2.0 * CAST(m.m AS DOUBLE) * CAST(m.m AS DOUBLE)))
        |    AS BIGINT) AS dq_micro
        |FROM bw
        |JOIN deg da ON bw.label_a = da.l
        |JOIN deg db ON bw.label_b = db.l, m""".stripMargin,

    "q282_assortativity" ->
      """WITH e0 AS (
        |  SELECT DISTINCT user_id % 400 AS a,
        |    400 + CAST(('0x' || substr(md5('mod:'
        |      || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 300 AS b
        |  FROM events),
        |e AS (
        |  SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
        |  FROM e0 WHERE a <> b),
        |deg AS (
        |  SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
        |    SELECT a AS n FROM e UNION ALL SELECT b FROM e)
        |  GROUP BY 1),
        |o AS (
        |  SELECT a AS s, b AS t FROM e
        |  UNION ALL SELECT b, a FROM e),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(dx.d AS HUGEINT)) AS sx,
        |    sum(CAST(dx.d AS HUGEINT) * dy.d) AS sxy,
        |    sum(CAST(dx.d AS HUGEINT) * dx.d) AS sx2
        |  FROM o JOIN deg dx ON o.s = dx.n JOIN deg dy ON o.t = dy.n),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
        |SELECT CAST(st.n / 2 AS BIGINT) AS n_edges, nn.n_nodes,
        |  CASE WHEN CAST(st.n AS HUGEINT) * st.sx2 - st.sx * st.sx > 0
        |    THEN CAST(round(1e6
        |      * CAST(CAST(st.n AS HUGEINT) * st.sxy - st.sx * st.sx
        |          AS DOUBLE)
        |      / CAST(CAST(st.n AS HUGEINT) * st.sx2 - st.sx * st.sx
        |          AS DOUBLE)) AS BIGINT)
        |    ELSE NULL END AS r_micro
        |FROM st, nn""".stripMargin,

    "q283_edit_join" ->
      """WITH u AS (
        |  SELECT doc_id AS id, substr(text, 1, 12) AS s FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    substr(text, 1, 5) || '0' || substr(text, 7, 6)
        |  FROM documents WHERE doc_id % 2 = 0)
        |SELECT a.id AS left_id, b.id AS right_id,
        |  a.s AS left_s, b.s AS right_s,
        |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM u a JOIN u b ON a.id < b.id
        |WHERE levenshtein(a.s, b.s) <= 1""".stripMargin,

    "q284_ess" ->
      """WITH b AS (
        |  SELECT source AS g,
        |    CAST(round(CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) AS w
        |  FROM documents
        |  WHERE CAST(round(CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) > 0),
        |st AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(w AS HUGEINT)) AS s,
        |    sum(CAST(w AS HUGEINT) * w) AS q
        |  FROM b GROUP BY 1),
        |gg AS (SELECT DISTINCT source AS g FROM documents)
        |SELECT gg.g AS source, COALESCE(st.n, 0) AS n,
        |  CASE WHEN st.q IS NOT NULL
        |    THEN CAST(round(1e6 * CAST(st.s * st.s AS DOUBLE)
        |      / CAST(st.q AS DOUBLE)) AS BIGINT)
        |    ELSE NULL END AS ess_micro,
        |  CASE WHEN st.q IS NOT NULL
        |    THEN CAST(round(1e6 * CAST(st.s * st.s AS DOUBLE)
        |      / (CAST(st.q AS DOUBLE) * CAST(st.n AS DOUBLE)))
        |      AS BIGINT)
        |    ELSE NULL END AS ess_ratio_micro
        |FROM gg LEFT JOIN st USING (g)""".stripMargin,

    "q285_krippendorff" ->
      s"""WITH $ratingsFixtureSql,
         |cells AS (
         |  SELECT source AS g, item AS u, label AS c,
         |    CAST(count(*) AS BIGINT) AS nc
         |  FROM r GROUP BY 1, 2, 3),
         |units AS (
         |  SELECT g, u, CAST(sum(nc) AS BIGINT) AS m,
         |    CAST(sum(nc * nc) AS BIGINT) AS sc2
         |  FROM cells GROUP BY 1, 2 HAVING sum(nc) >= 2),
         |ud AS (
         |  SELECT g, u, m,
         |    CAST(round(1e6 * CAST(m * m - sc2 AS DOUBLE)
         |      / CAST(m - 1 AS DOUBLE)) AS BIGINT) AS dou
         |  FROM units),
         |tot AS (
         |  SELECT g, CAST(count(*) AS BIGINT) AS n_units,
         |    CAST(sum(m) AS BIGINT) AS n_ratings,
         |    CAST(sum(dou) AS BIGINT) AS dosum
         |  FROM ud GROUP BY 1),
         |lt AS (
         |  SELECT c.g, c.c, CAST(sum(c.nc) AS BIGINT) AS ncg
         |  FROM cells c JOIN units USING (g, u) GROUP BY 1, 2),
         |sc AS (
         |  SELECT g, sum(CAST(ncg AS HUGEINT) * ncg) AS sc2g
         |  FROM lt GROUP BY 1)
         |SELECT tot.g AS source, tot.n_units, tot.n_ratings,
         |  CASE WHEN CAST(tot.n_ratings AS HUGEINT) * tot.n_ratings
         |      - sc.sc2g > 0
         |    THEN CAST(round(1e6
         |      - CAST(tot.n_ratings - 1 AS DOUBLE)
         |        * CAST(tot.dosum AS DOUBLE)
         |      / CAST(CAST(tot.n_ratings AS HUGEINT) * tot.n_ratings
         |          - sc.sc2g AS DOUBLE)) AS BIGINT)
         |    ELSE NULL END AS alpha_micro
         |FROM tot JOIN sc USING (g)""".stripMargin,

    "q286_majority_vote" ->
      s"""WITH $ratingsFixtureSql,
         |cells AS (
         |  SELECT source AS g, item AS u, label AS c,
         |    CAST(count(*) AS BIGINT) AS nc
         |  FROM r GROUP BY 1, 2, 3),
         |tot AS (
         |  SELECT g, u, CAST(sum(nc) AS BIGINT) AS n_votes
         |  FROM cells GROUP BY 1, 2),
         |top AS (
         |  SELECT g, u, c, nc,
         |    row_number() OVER (PARTITION BY g, u
         |      ORDER BY nc DESC, c ASC) AS rn
         |  FROM cells)
         |SELECT tot.g AS source, tot.u AS item, tot.n_votes,
         |  top.c AS top_label,
         |  CAST(round(1e6 * CAST(top.nc AS DOUBLE)
         |    / CAST(tot.n_votes AS DOUBLE)) AS BIGINT) AS share_micro,
         |  top.nc = tot.n_votes AS unanimous
         |FROM tot JOIN top ON tot.g = top.g AND tot.u = top.u
         |  AND top.rn = 1""".stripMargin,

    "q287_bootstrap_ci" -> bootstrapOracleSql,

    "q288_cuped" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS y,
        |    CAST(round(CAST(floor(value) AS DOUBLE) * 1e6) AS BIGINT)
        |      AS x,
        |    user_id % 2 = 0 AS a
        |  FROM events WHERE value IS NOT NULL),
        |st AS (
        |  SELECT g,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    sum(CASE WHEN a THEN y ELSE 0 END) AS ya,
        |    sum(CASE WHEN NOT a THEN y ELSE 0 END) AS yb,
        |    sum(CASE WHEN a THEN x ELSE 0 END) AS xa,
        |    sum(CASE WHEN NOT a THEN x ELSE 0 END) AS xb,
        |    CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM b GROUP BY 1),
        |f AS (
        |  SELECT g, n_a, n_b,
        |    CAST(sxy AS DOUBLE) - CAST(xa + xb AS DOUBLE)
        |      * CAST(ya + yb AS DOUBLE) / CAST(n AS DOUBLE) AS covn,
        |    CAST(sxx AS DOUBLE) - CAST(xa + xb AS DOUBLE)
        |      * CAST(xa + xb AS DOUBLE) / CAST(n AS DOUBLE) AS varx,
        |    CAST(syy AS DOUBLE) - CAST(ya + yb AS DOUBLE)
        |      * CAST(ya + yb AS DOUBLE) / CAST(n AS DOUBLE) AS vary,
        |    CASE WHEN n_a > 0 AND n_b > 0 THEN
        |      CAST(ya AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - CAST(yb AS DOUBLE) / CAST(n_b AS DOUBLE) END AS dy,
        |    CASE WHEN n_a > 0 AND n_b > 0 THEN
        |      CAST(xa AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - CAST(xb AS DOUBLE) / CAST(n_b AS DOUBLE) END AS dx
        |  FROM st)
        |SELECT g AS event_type, n_a, n_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND varx > 0.0
        |    THEN CAST(round(1e6 * (covn / varx)) AS BIGINT)
        |    ELSE NULL END AS theta_micro,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |    THEN CAST(round(dy) AS BIGINT)
        |    ELSE NULL END AS diff_micro,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND varx > 0.0
        |    THEN CAST(round(dy - (covn / varx) * dx) AS BIGINT)
        |    ELSE NULL END AS adj_diff_micro,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND varx > 0.0 AND vary > 0.0
        |    THEN CAST(round(1e6 * covn * covn / (varx * vary))
        |      AS BIGINT)
        |    ELSE NULL END AS var_reduction_micro
        |FROM f""".stripMargin,

    "q289_funnel" ->
      """WITH ev AS (
        |  SELECT user_id AS k, epoch_us(ts) AS us, event_type AS t
        |  FROM events),
        |s1 AS (
        |  SELECT k, min(us) AS p FROM ev WHERE t = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT ev.k, min(ev.us) AS p, min(s1.p) AS f
        |  FROM ev JOIN s1 ON ev.k = s1.k
        |  WHERE ev.t = 'click' AND ev.us > s1.p GROUP BY 1),
        |s3 AS (
        |  SELECT ev.k, min(ev.us) AS p, min(s2.p) AS f
        |  FROM ev JOIN s2 ON ev.k = s2.k
        |  WHERE ev.t = 'purchase' AND ev.us > s2.p GROUP BY 1),
        |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s1),
        |r AS (
        |  SELECT 1 AS step, 'view' AS step_name,
        |    (SELECT n FROM n1) AS n_users, CAST(NULL AS HUGEINT) AS sumd
        |  UNION ALL
        |  SELECT 2, 'click', CAST(count(*) AS BIGINT),
        |    sum(CAST(p - f AS HUGEINT)) FROM s2
        |  UNION ALL
        |  SELECT 3, 'purchase', CAST(count(*) AS BIGINT),
        |    sum(CAST(p - f AS HUGEINT)) FROM s3)
        |SELECT CAST(step AS BIGINT) AS step, step_name, n_users,
        |  CASE WHEN (SELECT n FROM n1) > 0
        |    THEN CAST(round(1e6 * CAST(n_users AS DOUBLE)
        |      / CAST((SELECT n FROM n1) AS DOUBLE)) AS BIGINT)
        |    ELSE NULL END AS conv_micro,
        |  CASE WHEN sumd IS NOT NULL AND n_users > 0
        |    THEN CAST(round(CAST(sumd AS DOUBLE)
        |      / CAST(n_users AS DOUBLE)) AS BIGINT)
        |    ELSE NULL END AS avg_sec_from_prev_micro
        |FROM r""".stripMargin,

    "q290_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id AS k,
        |    epoch_us(ts) // 604800000000 AS b
        |  FROM events),
        |c AS (SELECT k, min(b) AS cb FROM a GROUP BY 1),
        |n AS (
        |  SELECT c.cb AS cohort_bucket, a.b - c.cb AS offset_idx,
        |    CAST(count(*) AS BIGINT) AS n_active
        |  FROM a JOIN c USING (k) GROUP BY 1, 2),
        |s AS (
        |  SELECT cohort_bucket, n_active AS sz FROM n
        |  WHERE offset_idx = 0)
        |SELECT n.cohort_bucket, n.offset_idx, n.n_active,
        |  CAST(round(1e6 * CAST(n.n_active AS DOUBLE)
        |    / CAST(s.sz AS DOUBLE)) AS BIGINT) AS retention_micro
        |FROM n JOIN s USING (cohort_bucket)""".stripMargin,

    "q291_attribution" ->
      """WITH t AS (
        |  SELECT user_id AS k, epoch_us(ts) AS us,
        |    arg_max(event_type, event_id) AS ch
        |  FROM events WHERE event_type <> 'purchase' GROUP BY 1, 2),
        |c AS (
        |  SELECT user_id AS k, epoch_us(ts) AS us, value AS v
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT c.us, c.v, t.us AS tus, t.ch
        |  FROM c ASOF LEFT JOIN t ON c.k = t.k AND c.us >= t.us),
        |a AS (
        |  SELECT v, us - tus AS lag_us,
        |    CASE WHEN tus IS NOT NULL AND us - tus <= 86400000000
        |      THEN ch ELSE '(none)' END AS channel
        |  FROM j)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_conv,
        |  CAST(sum(CAST(round(1e6 * v) AS HUGEINT)) AS BIGINT)
        |    AS sum_value_micro,
        |  CASE WHEN channel = '(none)' THEN NULL
        |    ELSE CAST(round(CAST(sum(CAST(lag_us AS HUGEINT)) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE)) AS BIGINT) END
        |    AS avg_lag_sec_micro
        |FROM a GROUP BY channel""".stripMargin,

    "q292_osa_join" ->
      """WITH u AS (
        |  SELECT doc_id AS id, substr(text, 1, 12) AS s FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    substr(text, 1, 5) || substr(text, 7, 1) ||
        |      substr(text, 6, 1) || substr(text, 8, 5)
        |  FROM documents WHERE doc_id % 2 = 1)
        |SELECT a.id AS left_id, b.id AS right_id,
        |  a.s AS left_s, b.s AS right_s,
        |  CAST(damerau_levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM u a JOIN u b ON a.id < b.id
        |WHERE damerau_levenshtein(a.s, b.s) <= 1""".stripMargin,

    "q293_did" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS y,
        |    user_id % 2 = 0 AS t,
        |    epoch_us(ts) >= 1705363200000000 AS p
        |  FROM events WHERE value IS NOT NULL),
        |st AS (
        |  SELECT g,
        |    CAST(sum(CASE WHEN t AND NOT p THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_tpre,
        |    CAST(sum(CASE WHEN t AND p THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_tpost,
        |    CAST(sum(CASE WHEN NOT t AND NOT p THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_cpre,
        |    CAST(sum(CASE WHEN NOT t AND p THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_cpost,
        |    sum(CASE WHEN t AND NOT p THEN y ELSE 0 END) AS stpre,
        |    sum(CASE WHEN t AND p THEN y ELSE 0 END) AS stpost,
        |    sum(CASE WHEN NOT t AND NOT p THEN y ELSE 0 END) AS scpre,
        |    sum(CASE WHEN NOT t AND p THEN y ELSE 0 END) AS scpost
        |  FROM b GROUP BY 1),
        |f AS (
        |  SELECT g, n_tpre, n_tpost, n_cpre, n_cpost,
        |    CASE WHEN n_tpre > 0 AND n_tpost > 0 THEN
        |      CAST(stpost AS DOUBLE) / CAST(n_tpost AS DOUBLE)
        |        - CAST(stpre AS DOUBLE) / CAST(n_tpre AS DOUBLE)
        |      END AS td,
        |    CASE WHEN n_cpre > 0 AND n_cpost > 0 THEN
        |      CAST(scpost AS DOUBLE) / CAST(n_cpost AS DOUBLE)
        |        - CAST(scpre AS DOUBLE) / CAST(n_cpre AS DOUBLE)
        |      END AS cd
        |  FROM st)
        |SELECT g AS event_type, n_tpre, n_tpost, n_cpre, n_cpost,
        |  CAST(round(td) AS BIGINT) AS treat_delta_micro,
        |  CAST(round(cd) AS BIGINT) AS control_delta_micro,
        |  CASE WHEN td IS NOT NULL AND cd IS NOT NULL
        |    THEN CAST(round(td - cd) AS BIGINT)
        |    ELSE NULL END AS did_micro
        |FROM f""".stripMargin,

    "q294_srm" ->
      """WITH st AS (
        |  SELECT event_type AS g,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b
        |  FROM events GROUP BY 1)
        |SELECT g AS event_type, n_a, n_b,
        |  CAST(round(1e6 * (
        |    (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) * 0.5)
        |      * (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) * 0.5)
        |      / (CAST(n_a + n_b AS DOUBLE) * 0.5)
        |    + (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) * 0.5)
        |      * (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) * 0.5)
        |      / (CAST(n_a + n_b AS DOUBLE) * 0.5))) AS BIGINT)
        |    AS chi2_micro,
        |  ((CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) * 0.5)
        |      * (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) * 0.5)
        |      / (CAST(n_a + n_b AS DOUBLE) * 0.5)
        |    + (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) * 0.5)
        |      * (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) * 0.5)
        |      / (CAST(n_a + n_b AS DOUBLE) * 0.5)) > 3.841459 AS srm
        |FROM st""".stripMargin
  ) ++ analyticsOracleSql

  /** q295–q298 oracle twins: Sturges bit-length bins, Wilson score
    * with the identical float op chain, Lorenz rank buckets, and the
    * funnel-delta quantiles over the q289 chain. */
  private val analyticsOracleSql: Map[String, String] = Map(
    "q295_sturges_hist" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL),
        |st AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    min(x) AS lo, max(x) AS hi
        |  FROM b GROUP BY 1),
        |st2 AS (
        |  SELECT g, CAST(length(bin(n)) AS BIGINT) AS n_bins, lo, hi
        |  FROM st),
        |bb AS (
        |  SELECT b.g, st2.n_bins, st2.lo AS lo_micro,
        |    st2.hi AS hi_micro,
        |    CASE WHEN st2.hi = st2.lo THEN 0
        |      ELSE least(((b.x - st2.lo) * st2.n_bins)
        |        // (st2.hi - st2.lo), st2.n_bins - 1) END AS bin
        |  FROM b JOIN st2 USING (g))
        |SELECT g AS event_type, n_bins, bin, lo_micro, hi_micro,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM bb GROUP BY 1, 2, 3, 4, 5""".stripMargin,

    "q296_wilson" ->
      """WITH st AS (
        |  SELECT source AS g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k
        |  FROM documents GROUP BY 1),
        |f AS (
        |  SELECT g, n, k,
        |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
        |    1.959964 * 1.959964 AS z2,
        |    CAST(n AS DOUBLE) AS nd
        |  FROM st)
        |SELECT g AS source, n, k,
        |  CAST(round(1e6 * p) AS BIGINT) AS p_micro,
        |  CAST(round(1e6 * ((p + z2 / (2.0 * nd)) / (1.0 + z2 / nd)
        |    - 1.959964 * sqrt((p * (1.0 - p) + z2 / (4.0 * nd)) / nd)
        |      / (1.0 + z2 / nd))) AS BIGINT) AS lo_micro,
        |  CAST(round(1e6 * ((p + z2 / (2.0 * nd)) / (1.0 + z2 / nd)
        |    + 1.959964 * sqrt((p * (1.0 - p) + z2 / (4.0 * nd)) / nd)
        |      / (1.0 + z2 / nd))) AS BIGINT) AS hi_micro
        |FROM f""".stripMargin,

    "q297_lorenz" ->
      """WITH a AS (
        |  SELECT source AS g,
        |    CAST(round(CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) AS v,
        |    doc_id AS t
        |  FROM documents WHERE n_chars IS NOT NULL),
        |spine AS (
        |  SELECT g, CAST(sum(CASE WHEN v < 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS nd
        |  FROM a GROUP BY 1),
        |b AS (SELECT * FROM a WHERE v >= 0),
        |r AS (
        |  SELECT g, v,
        |    row_number() OVER (PARTITION BY g ORDER BY v, t) AS rnk
        |  FROM b),
        |tt AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(v AS HUGEINT)) AS tot
        |  FROM b GROUP BY 1),
        |c AS (
        |  SELECT r.g, (r.rnk * 10 + tt.n - 1) // tt.n AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    sum(CAST(r.v AS HUGEINT)) AS s
        |  FROM r JOIN tt USING (g) GROUP BY 1, 2),
        |cum AS (
        |  SELECT c1.g, c1.bucket, sum(c2.s) AS cs
        |  FROM c c1 JOIN c c2 ON c1.g = c2.g AND c2.bucket <= c1.bucket
        |  GROUP BY 1, 2)
        |SELECT spine.g AS source, CAST(c.bucket AS BIGINT) AS bucket,
        |  COALESCE(c.n_rows, 0) AS n_rows, spine.nd AS n_dropped,
        |  CASE WHEN tt.tot > 0 THEN CAST(round(1e6
        |    * CAST(c.s AS DOUBLE) / CAST(tt.tot AS DOUBLE)) AS BIGINT)
        |    ELSE NULL END AS share_micro,
        |  CASE WHEN tt.tot > 0 THEN CAST(round(1e6
        |    * CAST(cum.cs AS DOUBLE) / CAST(tt.tot AS DOUBLE))
        |    AS BIGINT)
        |    ELSE NULL END AS cum_share_micro
        |FROM spine
        |LEFT JOIN (c JOIN cum USING (g, bucket) JOIN tt USING (g))
        |  ON spine.g = c.g""".stripMargin,

    "q298_funnel_latency" ->
      """WITH ev AS (
        |  SELECT user_id AS k, epoch_us(ts) AS us, event_type AS t
        |  FROM events),
        |s1 AS (
        |  SELECT k, min(us) AS p FROM ev WHERE t = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT ev.k, min(ev.us) AS p, min(s1.p) AS f
        |  FROM ev JOIN s1 ON ev.k = s1.k
        |  WHERE ev.t = 'click' AND ev.us > s1.p GROUP BY 1),
        |s3 AS (
        |  SELECT ev.k, min(ev.us) AS p, min(s2.p) AS f
        |  FROM ev JOIN s2 ON ev.k = s2.k
        |  WHERE ev.t = 'purchase' AND ev.us > s2.p GROUP BY 1),
        |d AS (
        |  SELECT 2 AS step, k, p - f AS delta FROM s2
        |  UNION ALL
        |  SELECT 3, k, p - f FROM s3),
        |r AS (
        |  SELECT step, delta,
        |    row_number() OVER (PARTITION BY step ORDER BY delta, k)
        |      AS rnk,
        |    count(*) OVER (PARTITION BY step) AS cnt
        |  FROM d),
        |qs AS (SELECT 0.5 AS q UNION ALL SELECT 0.9)
        |SELECT CAST(r.step AS BIGINT) AS step,
        |  CAST(qs.q AS DOUBLE) AS q, r.delta AS delta_us
        |FROM r JOIN qs
        |  ON r.rnk = CAST(ceil(qs.q * r.cnt) AS BIGINT)""".stripMargin,

    "q299_clustering" ->
      """WITH e0 AS (
        |  SELECT DISTINCT
        |    CAST(('0x' || substr(md5('cx:'
        |      || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |      % 200 AS x,
        |    CAST(('0x' || substr(md5('cy:'
        |      || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |      % 200 AS y
        |  FROM events),
        |e AS (
        |  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
        |  FROM e0 WHERE x <> y),
        |deg AS (
        |  SELECT n AS node, CAST(count(*) AS BIGINT) AS degree FROM (
        |    SELECT a AS n FROM e UNION ALL SELECT b FROM e)
        |  GROUP BY 1),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
        |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        |tn AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS t FROM (
        |    SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
        |    UNION ALL SELECT z FROM tri)
        |  GROUP BY 1)
        |SELECT deg.node, deg.degree,
        |  COALESCE(tn.t, 0) AS n_triangles,
        |  CASE WHEN deg.degree >= 2 THEN CAST(round(1e6
        |    * (2.0 * CAST(COALESCE(tn.t, 0) AS DOUBLE))
        |    / (CAST(deg.degree AS DOUBLE)
        |      * CAST(deg.degree - 1 AS DOUBLE))) AS BIGINT)
        |    ELSE NULL END AS coef_micro
        |FROM deg LEFT JOIN tn USING (node)""".stripMargin,

    "q300_stl" ->
      """WITH s AS (
        |  SELECT event_type AS k, epoch_us(ts) // 86400000000 AS d,
        |    CAST(sum(CAST(round(CAST(value AS DOUBLE) * 1e6)
        |      AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT s.k, s.d + o.o AS t2, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(s.y) AS BIGINT) AS sm
        |  FROM s, (SELECT unnest(generate_series(-3, 3)) AS o) o
        |  GROUP BY 1, 2),
        |tr AS (
        |  SELECT k, t2 AS d,
        |    CAST(round(CAST(sm AS DOUBLE) / 7.0) AS BIGINT) AS trend
        |  FROM c WHERE cnt = 7),
        |j AS (
        |  SELECT s.k, s.d, s.y, tr.trend, s.y - tr.trend AS det,
        |    ((s.d % 7) + 7) % 7 AS phase
        |  FROM s LEFT JOIN tr USING (k, d)),
        |se AS (
        |  SELECT k, phase, CAST(round(CAST(sum(det) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS seas
        |  FROM j WHERE det IS NOT NULL GROUP BY 1, 2)
        |SELECT j.k AS event_type, j.d AS day_idx, j.y AS y_micro,
        |  j.trend AS trend_micro, se.seas AS seasonal_micro,
        |  j.y - j.trend - se.seas AS resid_micro
        |FROM j LEFT JOIN se USING (k, phase)""".stripMargin,

    "q301_join_cardinality" ->
      """WITH lc AS (
        |  SELECT CAST(user_id AS VARCHAR) AS k,
        |    CAST(count(*) AS BIGINT) AS cl
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |rc AS (
        |  SELECT CAST(user_id AS VARCHAR) AS k,
        |    CAST(count(*) AS BIGINT) AS cr
        |  FROM events
        |  WHERE event_type = 'purchase' AND user_id IS NOT NULL
        |  GROUP BY 1),
        |j AS (
        |  SELECT lc.k, CAST(lc.cl AS HUGEINT) * rc.cr AS p
        |  FROM lc JOIN rc USING (k)),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS matched_keys,
        |    CAST(sum(p) AS DECIMAL(38,0)) AS join_rows
        |  FROM j),
        |top AS (
        |  SELECT k AS top_key, CAST(p AS DECIMAL(38,0)) AS top_contrib
        |  FROM j ORDER BY p DESC, k DESC LIMIT 1),
        |n AS (SELECT CAST(count(user_id) AS BIGINT) AS n_left
        |  FROM events),
        |m AS (SELECT CAST(count(user_id) AS BIGINT) AS n_right
        |  FROM events WHERE event_type = 'purchase')
        |SELECT n.n_left, m.n_right,
        |  COALESCE(tot.matched_keys, 0) AS matched_keys,
        |  CAST(CAST(COALESCE(tot.join_rows, 0) AS DECIMAL(38,0))
        |    AS VARCHAR) AS join_rows,
        |  top.top_key, CAST(top.top_contrib AS VARCHAR)
        |    AS top_contrib
        |FROM n, m, tot, top""".stripMargin,

    "q302_key_skew" ->
      """WITH b AS (
        |  SELECT CAST(CASE WHEN event_id % 10 < 9 THEN 1
        |    ELSE user_id END AS VARCHAR) AS k
        |  FROM events),
        |c AS (SELECT k, CAST(count(*) AS BIGINT) AS c
        |  FROM b GROUP BY 1),
        |ag AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN k IS NULL THEN c ELSE 0 END) AS BIGINT)
        |      AS n_null_keys,
        |    CAST(count(CASE WHEN k IS NOT NULL THEN 1 END) AS BIGINT)
        |      AS n_keys
        |  FROM c),
        |top AS (
        |  SELECT k AS top_key, c AS top_count FROM c
        |  WHERE k IS NOT NULL ORDER BY c DESC, k DESC LIMIT 1)
        |SELECT ag.n_rows, ag.n_null_keys, ag.n_keys, top.top_key,
        |  top.top_count,
        |  CAST(round(1e6 * CAST(top.top_count AS DOUBLE)
        |    / CAST(ag.n_rows AS DOUBLE)) AS BIGINT) AS top_share_micro,
        |  greatest(1, (top.top_count * 32 + ag.n_rows - 1)
        |    // ag.n_rows) AS suggested_salts
        |FROM ag, top""".stripMargin,

    "q303_mp3_meta" ->
      s"""SELECT doc_id AS media_id,
         |  CASE WHEN doc_id % 3 IN (0, 1) THEN 'mp3'
         |    ELSE 'unknown' END AS kind,
         |  CASE doc_id % 3
         |    WHEN 0 THEN CAST(octet_length(unhex(
         |      '${graft.operators.Multimodal.Mp3Fixture.hex}')) AS BIGINT)
         |    WHEN 1 THEN CAST(4 + octet_length(encode(text)) AS BIGINT)
         |    ELSE CAST(octet_length(encode(text)) AS BIGINT)
         |  END AS n_bytes,
         |  CASE WHEN doc_id % 3 = 0 THEN CAST(20 AS BIGINT)
         |    ELSE NULL END AS tag_bytes,
         |  CASE WHEN doc_id % 3 = 0 THEN CAST(4 AS BIGINT)
         |    ELSE NULL END AS n_frames,
         |  CASE WHEN doc_id % 3 = 0 THEN CAST(128 AS BIGINT)
         |    ELSE NULL END AS bitrate_kbps,
         |  CASE WHEN doc_id % 3 = 0 THEN CAST(44100 AS BIGINT)
         |    ELSE NULL END AS sample_rate,
         |  CASE WHEN doc_id % 3 = 0 THEN CAST(104 AS BIGINT)
         |    ELSE NULL END AS duration_ms
         |FROM documents WHERE doc_id < 180""".stripMargin,

    "q304_temperature_mix" ->
      """WITH c AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |l AS (
        |  SELECT source, n,
        |    CAST(round(1e6 * ln(CAST(n AS DOUBLE))) AS BIGINT) AS lnm
        |  FROM c),
        |r AS (
        |  SELECT source, n,
        |    CAST(round(1e6 * exp(0.3 * (CAST(lnm AS DOUBLE) / 1e6)))
        |      AS BIGINT) AS rate_micro
        |  FROM l),
        |t AS (SELECT CAST(sum(rate_micro) AS BIGINT) AS tot FROM r)
        |SELECT r.source, r.n AS n_docs, r.rate_micro,
        |  CAST(round(1e6 * CAST(r.rate_micro AS DOUBLE)
        |    / CAST(t.tot AS DOUBLE)) AS BIGINT) AS share_micro
        |FROM r, t""".stripMargin,

    "q305_rater_accuracy" ->
      s"""WITH $ratingsFixtureSql,
         |cells AS (
         |  SELECT source AS g, item AS u, label AS c,
         |    CAST(count(*) AS BIGINT) AS nc
         |  FROM r GROUP BY 1, 2, 3),
         |top AS (
         |  SELECT g, u, c AS top_label,
         |    row_number() OVER (PARTITION BY g, u
         |      ORDER BY nc DESC, c ASC) AS rn
         |  FROM cells),
         |t1 AS (SELECT g, u, top_label FROM top WHERE rn = 1),
         |v AS (SELECT source AS g, item AS u, rater, label FROM r)
         |SELECT v.g AS source, v.rater,
         |  CAST(count(*) AS BIGINT) AS n_votes,
         |  CAST(sum(CASE WHEN v.label = t1.top_label
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
         |  CAST(round(1e6 * CAST(sum(CASE WHEN v.label = t1.top_label
         |      THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS acc_micro
         |FROM v JOIN t1 USING (g, u)
         |GROUP BY 1, 2""".stripMargin,

    "q306_activity_grid" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow,
        |    (epoch_us(ts) // 3600000000) % 24 AS hour
        |  FROM events),
        |c AS (
        |  SELECT g, dow, hour, CAST(count(*) AS BIGINT) AS n_events
        |  FROM b GROUP BY 1, 2, 3),
        |t AS (SELECT g, CAST(sum(n_events) AS BIGINT) AS tot
        |  FROM c GROUP BY 1)
        |SELECT c.g AS event_type, c.dow, c.hour, c.n_events,
        |  CAST(round(1e6 * CAST(c.n_events AS DOUBLE)
        |    / CAST(t.tot AS DOUBLE)) AS BIGINT) AS share_micro
        |FROM c JOIN t USING (g)""".stripMargin,

    "q307_two_proportion" ->
      """WITH b AS (
        |  SELECT event_type AS g, user_id % 2 = 0 AS s,
        |    value >= 100.0 AS hi
        |  FROM events WHERE value IS NOT NULL),
        |st AS (
        |  SELECT g,
        |    CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN s AND hi THEN 1 ELSE 0 END) AS BIGINT)
        |      AS k_a,
        |    CAST(sum(CASE WHEN NOT s THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN NOT s AND hi THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k_b
        |  FROM b GROUP BY 1),
        |f AS (
        |  SELECT g, n_a, k_a, n_b, k_b,
        |    CASE WHEN n_a > 0 AND n_b > 0 AND k_a + k_b > 0
        |        AND k_a + k_b < n_a + n_b THEN
        |      CAST(round(1e6 *
        |        (CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |          - CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |        / sqrt((CAST(k_a + k_b AS DOUBLE)
        |            / CAST(n_a + n_b AS DOUBLE))
        |          * (1.0 - CAST(k_a + k_b AS DOUBLE)
        |            / CAST(n_a + n_b AS DOUBLE))
        |          * (1.0 / CAST(n_a AS DOUBLE)
        |            + 1.0 / CAST(n_b AS DOUBLE)))) AS BIGINT)
        |      ELSE NULL END AS z_micro
        |  FROM st)
        |SELECT g AS event_type, n_a, k_a, n_b, k_b, z_micro,
        |  COALESCE(abs(z_micro) > 1959964, false) AS significant
        |FROM f""".stripMargin,

    "q308_bradley_terry" -> btOracleSql(5),

    "q309_win_rate" ->
      s"""WITH mt AS ($matchesSql),
         |st AS (
         |  SELECT least(w, l) AS player_a, greatest(w, l) AS player_b,
         |    CAST(count(*) AS BIGINT) AS n_games,
         |    CAST(sum(CASE WHEN w <= l THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_wins_a
         |  FROM mt GROUP BY 1, 2),
         |f AS (
         |  SELECT player_a, player_b, n_games, n_wins_a,
         |    CAST(n_wins_a AS DOUBLE) / CAST(n_games AS DOUBLE) AS p,
         |    1.959964 * 1.959964 AS z2,
         |    CAST(n_games AS DOUBLE) AS nd
         |  FROM st)
         |SELECT player_a, player_b, n_games, n_wins_a,
         |  CAST(round(1e6 * p) AS BIGINT) AS p_micro,
         |  CAST(round(1e6 * ((p + z2 / (2.0 * nd)) / (1.0 + z2 / nd)
         |    - 1.959964 * sqrt((p * (1.0 - p) + z2 / (4.0 * nd)) / nd)
         |      / (1.0 + z2 / nd))) AS BIGINT) AS lo_micro,
         |  CAST(round(1e6 * ((p + z2 / (2.0 * nd)) / (1.0 + z2 / nd)
         |    + 1.959964 * sqrt((p * (1.0 - p) + z2 / (4.0 * nd)) / nd)
         |      / (1.0 + z2 / nd))) AS BIGINT) AS hi_micro
         |FROM f""".stripMargin,

    // Same micro-nat product convention as the Spark side: per-k ln
    // terms micro-round to integers, sum exactly, ONE exp.
    "q310_pass_at_k" ->
      """WITH st AS (
        |  SELECT source || ':' || lang AS task,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN n_chars >= 450 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c
        |  FROM documents GROUP BY 1),
        |wk AS (
        |  SELECT task, n, c, CAST(u.k AS BIGINT) AS k
        |  FROM st, UNNEST([1, 5, 10]) AS u(k)
        |  WHERE u.k <= n),
        |mid AS (
        |  SELECT task, k,
        |    CAST(sum(CAST(round(1e6 * ln(
        |      CAST(n - c - i AS DOUBLE) / CAST(n - i AS DOUBLE)))
        |      AS BIGINT)) AS BIGINT) AS s
        |  FROM (SELECT task, n, c, k, CAST(g.i AS BIGINT) AS i
        |        FROM wk, UNNEST(generate_series(0, CAST(k AS INTEGER)
        |          - 1)) AS g(i)
        |        WHERE c > 0 AND n - c >= k)
        |  GROUP BY 1, 2)
        |SELECT wk.task, wk.k, wk.n, wk.c,
        |  CASE WHEN wk.c = 0 THEN 0
        |    WHEN wk.n - wk.c < wk.k THEN 1000000
        |    ELSE CAST(round(1e6 *
        |      (1.0 - exp(CAST(mid.s AS DOUBLE) / 1e6))) AS BIGINT)
        |  END AS pass_micro
        |FROM wk LEFT JOIN mid USING (task, k)""".stripMargin,

    // q304's rate CTEs verbatim, then the stride: vt = (2i−1)/(2r)
    // as ONE scalar IEEE divide, global order by (vt, source, id).
    "q311_interleave_order" ->
      """WITH c AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |l AS (
        |  SELECT source, n,
        |    CAST(round(1e6 * ln(CAST(n AS DOUBLE))) AS BIGINT) AS lnm
        |  FROM c),
        |r AS (
        |  SELECT source, n,
        |    CAST(round(1e6 * exp(0.3 * (CAST(lnm AS DOUBLE) / 1e6)))
        |      AS BIGINT) AS rate_micro
        |  FROM l),
        |rk AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id)
        |      AS rr
        |  FROM documents),
        |v AS (
        |  SELECT rk.source, rk.doc_id,
        |    CAST(round(1e12 * CAST(2 * rr - 1 AS DOUBLE)
        |      / (2.0 * CAST(r.rate_micro AS DOUBLE))) AS BIGINT)
        |      AS vt_micro
        |  FROM rk JOIN r USING (source) WHERE r.rate_micro > 0)
        |SELECT source, doc_id, vt_micro,
        |  row_number() OVER (ORDER BY vt_micro, source, doc_id)
        |    AS order_idx
        |FROM v""".stripMargin,

    // The q53 centroid CTEs, then: own = argmax cosine (tie → min
    // cell), second = max over other centroids, s = (b−a)/max(a,b)
    // micro-rounded per vector, exact-sum mean per cell.
    "q312_silhouette" ->
      s"""WITH $ivfAsgCtes,
         |sims AS (
         |  SELECT n.vec_id, cent.cell,
         |    CAST(list_sum(list_transform(generate_series(1,
         |      len(n.qv)), i -> n.qv[i]*cent.cv[i])) AS DOUBLE)
         |      / (sqrt(CAST(n.nsq AS DOUBLE))
         |        * sqrt(CAST(cent.cnsq AS DOUBLE))) AS csim
         |  FROM n, cent),
         |own AS (
         |  SELECT vec_id, cell, csim FROM (
         |    SELECT vec_id, cell, csim,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY csim DESC, cell) AS rn
         |    FROM sims) WHERE rn = 1),
         |oth AS (
         |  SELECT s.vec_id, max(s.csim) AS second
         |  FROM sims s JOIN own o
         |    ON o.vec_id = s.vec_id AND s.cell <> o.cell
         |  GROUP BY 1),
         |sv AS (
         |  SELECT o.cell,
         |    CASE WHEN greatest(1.0 - o.csim, 1.0 - t.second) > 0
         |      THEN CAST(round(1e6 * ((1.0 - t.second)
         |        - (1.0 - o.csim))
         |        / greatest(1.0 - o.csim, 1.0 - t.second)) AS BIGINT)
         |      ELSE 0 END AS s_micro
         |  FROM own o JOIN oth t ON t.vec_id = o.vec_id)
         |SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors,
         |  CAST(round(CAST(sum(s_micro) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_s_micro
         |FROM sv GROUP BY cell""".stripMargin,

    "q313_flac_meta" ->
      s"""SELECT doc_id AS media_id,
         |  CASE WHEN doc_id % 3 IN (0, 1) THEN 'flac'
         |    ELSE 'unknown' END AS kind,
         |  CASE doc_id % 3
         |    WHEN 0 THEN CAST(octet_length(unhex(
         |      '${graft.operators.Multimodal.FlacFixture.hex}')) AS BIGINT)
         |    WHEN 1 THEN CAST(5 + octet_length(encode(text)) AS BIGINT)
         |    ELSE CAST(octet_length(encode(text)) AS BIGINT)
         |  END AS n_bytes,
         |  CASE WHEN doc_id % 3 = 0 THEN CAST(44100 AS BIGINT)
         |    ELSE NULL END AS sample_rate,
         |  CASE WHEN doc_id % 3 = 0 THEN CAST(2 AS BIGINT)
         |    ELSE NULL END AS channels,
         |  CASE WHEN doc_id % 3 = 0 THEN CAST(16 AS BIGINT)
         |    ELSE NULL END AS bits_per_sample,
         |  CASE WHEN doc_id % 3 = 0 THEN CAST(4410 AS BIGINT)
         |    ELSE NULL END AS total_samples,
         |  CASE WHEN doc_id % 3 = 0 THEN CAST(100 AS BIGINT)
         |    ELSE NULL END AS duration_ms
         |FROM documents WHERE doc_id < 180""".stripMargin,

    "q314_tiff_meta" ->
      s"""SELECT doc_id AS media_id,
         |  CASE WHEN doc_id % 3 IN (0, 1) THEN 'tiff'
         |    ELSE 'unknown' END AS kind,
         |  CASE doc_id % 3
         |    WHEN 0 THEN CAST(octet_length(unhex(
         |      '${graft.operators.Multimodal.TiffFixture.hex}')) AS BIGINT)
         |    WHEN 1 THEN CAST(4 + octet_length(encode(text)) AS BIGINT)
         |    ELSE CAST(octet_length(encode(text)) AS BIGINT)
         |  END AS n_bytes,
         |  CASE WHEN doc_id % 3 = 0 THEN 'II' ELSE NULL END
         |    AS byte_order,
         |  CASE WHEN doc_id % 3 = 0 THEN CAST(16 AS BIGINT)
         |    ELSE NULL END AS width,
         |  CASE WHEN doc_id % 3 = 0 THEN CAST(16 AS BIGINT)
         |    ELSE NULL END AS height
         |FROM documents WHERE doc_id < 180""".stripMargin,

    // q228's injected-punctuation CTE, then the three counters and
    // the two scalar formulas, micro-rounded identically.
    "q315_readability" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN t2 || '.' ELSE t2 END AS text2
        |  FROM (
        |    SELECT doc_id,
        |      regexp_replace(regexp_replace(text,
        |        ' table ', '. Table? ', 'g'),
        |        ' query ', ' query! ', 'g') AS t2
        |    FROM documents)),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(text2),
        |      '\s+'), t -> len(t) > 0)) AS BIGINT) AS n_words,
        |    CAST(len(list_filter(string_split_regex(text2,
        |      '[.!?]+\s+|[。！？]+\s*'), x -> len(trim(x)) > 0))
        |      AS BIGINT) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text2), '[aeiouy]+'))
        |      AS BIGINT) AS n_syllables
        |  FROM d)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words > 0 AND n_sentences > 0 THEN
        |    CAST(round(1e6 * (206.835
        |      - 1.015 * (CAST(n_words AS DOUBLE)
        |        / CAST(n_sentences AS DOUBLE))
        |      - 84.6 * (CAST(n_syllables AS DOUBLE)
        |        / CAST(n_words AS DOUBLE)))) AS BIGINT)
        |    ELSE NULL END AS fre_micro,
        |  CASE WHEN n_words > 0 AND n_sentences > 0 THEN
        |    CAST(round(1e6 * (0.39 * (CAST(n_words AS DOUBLE)
        |        / CAST(n_sentences AS DOUBLE))
        |      + 11.8 * (CAST(n_syllables AS DOUBLE)
        |        / CAST(n_words AS DOUBLE)) - 15.59)) AS BIGINT)
        |    ELSE NULL END AS fk_grade_micro
        |FROM c""".stripMargin,

    "q316_stratified_ate" ->
      """WITH b AS (
        |  SELECT event_type AS s, user_id % 2 = 0 AS t,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |st AS (
        |  SELECT s,
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nc,
        |    sum(CASE WHEN t THEN CAST(v AS HUGEINT) ELSE 0 END) AS stt,
        |    sum(CASE WHEN NOT t THEN CAST(v AS HUGEINT) ELSE 0 END)
        |      AS sc
        |  FROM b GROUP BY 1),
        |d AS (
        |  SELECT st.*, nt > 0 AND nc > 0 AS used,
        |    CASE WHEN nt > 0 AND nc > 0 THEN
        |      CAST(round(CAST(stt AS DOUBLE) / CAST(nt AS DOUBLE)
        |        - CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)) AS BIGINT)
        |      ELSE NULL END AS diff
        |  FROM st)
        |SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |  CAST(sum(CASE WHEN used THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_strata_used,
        |  CAST(sum(CASE WHEN used THEN nt ELSE 0 END) AS BIGINT)
        |    AS n_treat,
        |  CAST(sum(CASE WHEN used THEN nc ELSE 0 END) AS BIGINT)
        |    AS n_ctrl,
        |  CAST(sum(CASE WHEN NOT used THEN nt + nc ELSE 0 END)
        |    AS BIGINT) AS n_dropped_rows,
        |  CASE WHEN sum(CASE WHEN used THEN 1 ELSE 0 END) > 0 THEN
        |    CAST(round(CAST(sum(CASE WHEN used
        |        THEN CAST(nt + nc AS HUGEINT) * diff ELSE 0 END)
        |      AS DOUBLE)
        |      / CAST(sum(CASE WHEN used THEN nt ELSE 0 END)
        |        + sum(CASE WHEN used THEN nc ELSE 0 END) AS DOUBLE))
        |      AS BIGINT)
        |    ELSE NULL END AS ate_micro
        |FROM d""".stripMargin,

    "q317_mde" ->
      """WITH b AS (
        |  SELECT event_type AS g, user_id % 2 = 0 AS a,
        |    value >= 100.0 AS y
        |  FROM events WHERE value IS NOT NULL),
        |st AS (
        |  SELECT g,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM b GROUP BY 1),
        |f AS (
        |  SELECT g, n_a, n_b, k,
        |    CAST(k AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS p,
        |    n_a > 0 AND n_b > 0 AND k > 0 AND k < n_a + n_b AS live
        |  FROM st)
        |SELECT g AS event_type, n_a, n_b,
        |  CAST(round(1e6 * p) AS BIGINT) AS p_micro,
        |  CASE WHEN live THEN CAST(round(1e6
        |    * ((1.959964 + 0.841621) * sqrt(p * (1.0 - p)
        |      * (1.0 / CAST(n_a AS DOUBLE)
        |        + 1.0 / CAST(n_b AS DOUBLE))))) AS BIGINT)
        |    ELSE NULL END AS mde_micro,
        |  CASE WHEN live THEN CAST(round(1e6
        |    * ((1.959964 + 0.841621) * sqrt(p * (1.0 - p)
        |      * (1.0 / CAST(n_a AS DOUBLE)
        |        + 1.0 / CAST(n_b AS DOUBLE)))) / p) AS BIGINT)
        |    ELSE NULL END AS mde_rel_micro
        |FROM f""".stripMargin,

    "q318_phonetic_census" ->
      s"""WITH words AS (
         |  SELECT u.t AS word, CAST(count(*) AS BIGINT) AS n_parts
         |  FROM part, UNNEST(list_filter(string_split_regex(
         |    lower(p_name), '\\s+'), t -> len(t) > 0)) AS u(t)
         |  GROUP BY 1),
         |$phoneticKeyCtes
         |SELECT word, code, n_parts FROM keys""".stripMargin,

    "q319_phonetic_pairs" ->
      s"""WITH words AS (
         |  SELECT u.t AS word, CAST(count(*) AS BIGINT) AS n_parts
         |  FROM part, UNNEST(list_filter(string_split_regex(
         |    lower(p_name), '\\s+'), t -> len(t) > 0)) AS u(t)
         |  GROUP BY 1),
         |$phoneticKeyCtes,
         |kk AS (SELECT code FROM keys WHERE code IS NOT NULL
         |  GROUP BY 1 HAVING count(*) <= 50)
         |SELECT a.code, a.word AS word_a, b.word AS word_b,
         |  a.n_parts AS n_a, b.n_parts AS n_b
         |FROM keys a
         |JOIN keys b ON a.code = b.code AND a.word < b.word
         |JOIN kk ON kk.code = a.code""".stripMargin,

    "q320_kmv_words" ->
      Sketches.kmvDistinctSql(sourceWordsSql, "source", 32),

    "q321_kmv_intersect" ->
      Sketches.kmvIntersectSql(sourceWordsSql, 32),

    // Same maximal-run extraction and the identical positional
    // mod-97 weight table, interpolated from Privacy.Pow10Mod97.
    "q322_iban_census" ->
      s"""WITH raws AS (
         |  SELECT doc_id, text || CASE doc_id % 3
         |    WHEN 0 THEN ' acct GB82WEST12345698765432 ok'
         |    WHEN 1 THEN ' acct GB82WEST12345698765433 no'
         |    ELSE ' ref 1234567890ABCDE x' END AS raw
         |  FROM documents),
         |runs AS (
         |  SELECT doc_id, l[i] AS cand, CAST(i - 1 AS INT) AS cand_idx
         |  FROM (SELECT doc_id, regexp_extract_all(raw, '[A-Z0-9]+')
         |          AS l
         |        FROM raws),
         |       UNNEST(generate_series(1, len(l))) AS u(i)),
         |c AS (SELECT doc_id, cand_idx, cand FROM runs
         |      WHERE len(cand) BETWEEN 15 AND 34
         |        AND regexp_matches(cand, '^[A-Z]{2}[0-9]{2}')),
         |d AS (
         |  SELECT doc_id, cand_idx, cand,
         |    substr(cand, 5) || substr(cand, 1, 4) AS r
         |  FROM c),
         |e AS (
         |  SELECT doc_id, cand_idx, cand,
         |    list_aggregate(list_transform(generate_series(1, len(r)),
         |      i -> CASE WHEN r[i] >= '0' AND r[i] <= '9' THEN r[i]
         |        ELSE CAST(ascii(r[i]) - 55 AS VARCHAR) END),
         |      'string_agg', '') AS dig
         |  FROM d)
         |SELECT doc_id, cand_idx, cand,
         |  list_sum(list_transform(generate_series(1, len(dig)), i ->
         |    CAST(dig[i] AS BIGINT)
         |      * ([${graft.operators.Privacy.Pow10Mod97.mkString(", ")}]
         |        )[len(dig) - i + 1])) % 97 = 1 AS iban_ok
         |FROM e""".stripMargin,

    "q323_pacf" -> pacfOracleSql(5),

    // Same TAB-sentinel phrase split, occurrence-level word census,
    // distinct-phrase score join.
    "q324_rake" ->
      """WITH mk AS (
        |  SELECT doc_id,
        |    list_transform(list_filter(string_split_regex(lower(text),
        |      '\s+'), t -> len(t) > 0),
        |      t -> CASE WHEN t IN ('a', 'the', 'and', 'of', 'to',
        |        'in', 'is', 'on', 'for') THEN chr(9) ELSE t END) AS m
        |  FROM documents),
        |sp AS (
        |  SELECT doc_id,
        |    string_split_regex(array_to_string(m, ' '),
        |      '( ?\t ?)+') AS l
        |  FROM mk),
        |ph AS (
        |  SELECT doc_id, u.i AS pidx, l[u.i] AS phrase,
        |    CAST(len(string_split(l[u.i], ' ')) AS BIGINT) AS n_words
        |  FROM sp, UNNEST(generate_series(1, len(l))) AS u(i)
        |  WHERE len(l[u.i]) > 0
        |    AND len(string_split(l[u.i], ' ')) <= 8),
        |w AS (
        |  SELECT q.w, ph.n_words
        |  FROM ph, UNNEST(string_split(ph.phrase, ' ')) AS q(w)),
        |s AS (
        |  SELECT w,
        |    CAST(round(1e6 * CAST(sum(n_words) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE)) AS BIGINT) AS sc
        |  FROM w GROUP BY 1),
        |census AS (
        |  SELECT phrase, n_words, CAST(count(*) AS BIGINT) AS n_occ,
        |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |  FROM ph GROUP BY 1, 2),
        |dp AS (SELECT DISTINCT phrase FROM ph),
        |ps AS (
        |  SELECT dp.phrase, CAST(sum(s.sc) AS BIGINT) AS score_micro
        |  FROM dp, UNNEST(string_split(dp.phrase, ' ')) AS q(w)
        |  JOIN s ON s.w = q.w
        |  GROUP BY 1)
        |SELECT census.phrase, census.n_words, census.n_occ,
        |  census.n_docs, ps.score_micro
        |FROM census JOIN ps USING (phrase)""".stripMargin,

    "q325_eb_shrinkage" ->
      """WITH st AS (
        |  SELECT source AS g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k
        |  FROM documents GROUP BY 1),
        |r AS (
        |  SELECT g, n, k,
        |    CAST(round(1e6 * CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |      AS BIGINT) AS rate_micro
        |  FROM st),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS gg,
        |    CAST(sum(rate_micro) AS BIGINT) AS s1,
        |    CAST(sum(rate_micro * rate_micro) AS BIGINT) AS s2
        |  FROM r),
        |f AS (
        |  SELECT r.*, mom.gg,
        |    CAST(s1 AS DOUBLE) / CAST(gg AS DOUBLE) / 1e6 AS m,
        |    (CAST(s2 AS DOUBLE) / CAST(gg AS DOUBLE)
        |      - (CAST(s1 AS DOUBLE) / CAST(gg AS DOUBLE))
        |        * (CAST(s1 AS DOUBLE) / CAST(gg AS DOUBLE))) / 1e12
        |      AS v
        |  FROM r, mom),
        |h AS (
        |  SELECT f.*, m * (1.0 - m) / v - 1.0 AS st FROM f)
        |SELECT g AS source, n, k, rate_micro,
        |  CASE WHEN gg > 1 AND v > 0.0 AND st > 0.0 THEN
        |    CAST(round(1e6 * (CAST(k AS DOUBLE) + m * st)
        |      / (CAST(n AS DOUBLE) + st)) AS BIGINT)
        |    ELSE rate_micro END AS shrunk_micro,
        |  CASE WHEN gg > 1 AND v > 0.0 AND st > 0.0 THEN
        |    CAST(round(1e6 * st) AS BIGINT)
        |    ELSE NULL END AS prior_strength_micro
        |FROM h""".stripMargin,

    "q326_qte" ->
      """WITH b AS (
        |  SELECT event_type AS g, user_id % 2 = 0 AS a, value AS v,
        |    event_id AS t
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT g, a, v,
        |    row_number() OVER (PARTITION BY g, a ORDER BY v, t) AS rk,
        |    count(*) OVER (PARTITION BY g, a) AS cnt
        |  FROM b),
        |sel AS (
        |  SELECT g, a, q.q AS q, v
        |  FROM r, (SELECT CAST(unnest([0.5, 0.9]) AS DOUBLE) AS q) q
        |  WHERE rk = CAST(ceil(q.q * cnt) AS BIGINT)),
        |tr AS (SELECT g, q, v AS q_treat FROM sel WHERE a),
        |ct AS (SELECT g, q, v AS q_ctrl FROM sel WHERE NOT a)
        |SELECT tr.g AS event_type, tr.q, tr.q_treat, ct.q_ctrl,
        |  CAST(round(1e6 * (CAST(q_treat AS DOUBLE)
        |    - CAST(q_ctrl AS DOUBLE))) AS BIGINT) AS qte_micro
        |FROM tr JOIN ct USING (g, q)""".stripMargin,

    "q327_off_policy" ->
      """WITH ev AS (SELECT * FROM events WHERE value IS NOT NULL),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ev),
        |pr AS (
        |  SELECT event_type AS act,
        |    CAST(round(1e6 * CAST(count(*) AS DOUBLE)
        |      / CAST(tot.n AS DOUBLE)) AS BIGINT) AS p
        |  FROM ev, tot GROUP BY 1, tot.n),
        |b AS (
        |  SELECT CAST(user_id % 4 AS VARCHAR) AS s,
        |    ev.event_type = 'purchase' AS m,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS r,
        |    CASE WHEN ev.event_type = 'purchase'
        |      THEN CAST(round(1e12 / CAST(pr.p AS DOUBLE)) AS BIGINT)
        |      ELSE 0 END AS w
        |  FROM ev JOIN pr ON pr.act = ev.event_type),
        |agg AS (
        |  SELECT s, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_matched,
        |    CAST(0 AS BIGINT) AS n_bad,
        |    sum(CAST(w AS HUGEINT) * r) AS rw,
        |    CAST(sum(w) AS BIGINT) AS sw
        |  FROM b GROUP BY 1)
        |SELECT s AS seg, n, n_matched, n_bad,
        |  CASE WHEN n > 0 THEN CAST(round(CAST(rw AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * 1e6)) AS BIGINT)
        |    ELSE NULL END AS ips_micro,
        |  CASE WHEN sw > 0 THEN CAST(round(1e6 * CAST(rw AS DOUBLE)
        |    / (CAST(sw AS DOUBLE) * 1e6)) AS BIGINT)
        |    ELSE NULL END AS snips_micro
        |FROM agg""".stripMargin,

    "q328_always_valid" -> alwaysValidOracleSql(0.1),

    "q329_platt_fit" -> plattOracleSql(5),

    "q330_ratio_ci" ->
      """WITH u AS (
        |  SELECT event_type AS g, user_id AS un,
        |    CAST(sum(CAST(round(CAST(value AS DOUBLE) * 1e6)
        |      AS BIGINT)) AS HUGEINT) AS ux,
        |    CAST(sum(1000000) AS HUGEINT) AS uy
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |st AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n_units,
        |    sum(ux) AS sx, sum(uy) AS sy,
        |    sum(ux * ux) AS sxx, sum(ux * uy) AS sxy,
        |    sum(uy * uy) AS syy
        |  FROM u GROUP BY 1),
        |f AS (
        |  SELECT g, n_units,
        |    CAST(n_units AS DOUBLE) AS nd,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |    CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd,
        |    CAST(syy AS DOUBLE) AS syyd,
        |    sy > 0 AS ypos
        |  FROM st),
        |h AS (
        |  SELECT f.*, sxd / syd AS r,
        |    (sxxd - sxd * sxd / nd) / (nd - 1.0) AS varx,
        |    (syyd - syd * syd / nd) / (nd - 1.0) AS vary,
        |    (sxyd - sxd * syd / nd) / (nd - 1.0) AS covxy,
        |    syd / nd AS ybar
        |  FROM f),
        |e AS (
        |  SELECT h.*,
        |    sqrt(greatest((varx - 2.0 * r * covxy + r * r * vary)
        |      / (nd * ybar * ybar), 0.0)) AS se
        |  FROM h)
        |SELECT g AS event_type, n_units,
        |  CASE WHEN ypos THEN CAST(round(1e6 * r) AS BIGINT)
        |    ELSE NULL END AS ratio_micro,
        |  CASE WHEN n_units > 1 AND ypos THEN
        |    CAST(round(1e6 * se) AS BIGINT) ELSE NULL END AS se_micro,
        |  CASE WHEN n_units > 1 AND ypos THEN
        |    CAST(round(1e6 * (r - 1.959964 * se)) AS BIGINT)
        |    ELSE NULL END AS lo_micro,
        |  CASE WHEN n_units > 1 AND ypos THEN
        |    CAST(round(1e6 * (r + 1.959964 * se)) AS BIGINT)
        |    ELSE NULL END AS hi_micro
        |FROM e""".stripMargin,

    "q331_mark_recapture" ->
      """WITH fl AS (
        |  SELECT event_type AS g, user_id AS u,
        |    bool_or(extract('day' FROM ts) <= 15) AS ia,
        |    bool_or(extract('day' FROM ts) > 15) AS ib
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT g,
        |    CAST(sum(CASE WHEN ia THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN ib THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN ia AND ib THEN 1 ELSE 0 END)
        |      AS BIGINT) AS m
        |  FROM fl GROUP BY 1)
        |SELECT g AS event_type, n1, n2, m,
        |  CAST(round(1e6 * (CAST(n1 + 1 AS DOUBLE)
        |    * CAST(n2 + 1 AS DOUBLE) / CAST(m + 1 AS DOUBLE) - 1.0))
        |    AS BIGINT) AS n_hat_micro,
        |  CAST(round(1e6 * sqrt(CAST(n1 + 1 AS DOUBLE)
        |    * CAST(n2 + 1 AS DOUBLE)
        |    * CAST(n1 - m AS DOUBLE) * CAST(n2 - m AS DOUBLE)
        |    / (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE)
        |      * CAST(m + 2 AS DOUBLE)))) AS BIGINT) AS se_micro
        |FROM st""".stripMargin,

    "q332_gzip_meta" ->
      s"""SELECT doc_id AS media_id,
         |  CASE WHEN doc_id % 3 IN (0, 1) THEN 'gzip'
         |    ELSE 'unknown' END AS kind,
         |  CASE doc_id % 3
         |    WHEN 0 THEN CAST(octet_length(unhex(
         |      '${graft.operators.Multimodal.GzipFixture.hex}')) AS BIGINT)
         |    WHEN 1 THEN CAST(3 + octet_length(encode(text)) AS BIGINT)
         |    ELSE CAST(octet_length(encode(text)) AS BIGINT)
         |  END AS n_bytes,
         |  CASE WHEN doc_id % 3 = 0 THEN CAST(0 AS BIGINT)
         |    ELSE NULL END AS mtime,
         |  CASE WHEN doc_id % 3 = 0 THEN CAST(148 AS BIGINT)
         |    ELSE NULL END AS isize,
         |  CASE WHEN doc_id % 3 = 0 THEN CAST(148 AS BIGINT)
         |    ELSE NULL END AS n_inflated
         |FROM documents WHERE doc_id < 180""".stripMargin,

    // The q267 doubled-midrank cell machinery on paired diffs, with
    // the zero-diff spine keeping all-tied groups visible.
    "q333_signed_rank" ->
      """WITH d AS (
        |  SELECT a.source AS g,
        |    CAST(round(CAST(a.n_chars AS DOUBLE) * 1e6) AS BIGINT)
        |      - CAST(round(CAST(b.n_chars AS DOUBLE) * 1e6)
        |        AS BIGINT) AS dd
        |  FROM documents a
        |  JOIN documents b ON b.doc_id = a.doc_id + 250),
        |sp AS (
        |  SELECT g, CAST(sum(CASE WHEN dd = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_zero
        |  FROM d GROUP BY 1),
        |cells AS (
        |  SELECT g, abs(dd) AS ad,
        |    CAST(sum(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cp,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM d WHERE dd <> 0 GROUP BY 1, 2),
        |run AS (
        |  SELECT g, cp, c,
        |    sum(c) OVER (PARTITION BY g ORDER BY ad) - c AS r
        |  FROM cells),
        |st AS (
        |  SELECT g, CAST(sum(c) AS BIGINT) AS n,
        |    sum(CAST(cp AS HUGEINT) * (2 * r + c + 1)) AS w2,
        |    sum(CAST(c AS HUGEINT) * c * c - c) AS ties
        |  FROM run GROUP BY 1),
        |f AS (
        |  SELECT sp.g, sp.n_zero, st.n, st.w2,
        |    CAST(st.n AS DOUBLE) AS nd,
        |    CAST(st.w2 AS DOUBLE) AS w2d,
        |    CAST(st.ties AS DOUBLE) AS td
        |  FROM sp LEFT JOIN st ON st.g = sp.g),
        |h AS (
        |  SELECT f.*,
        |    nd * (nd + 1.0) * (2.0 * nd + 1.0) / 6.0 - td / 12.0
        |      AS sigma2
        |  FROM f)
        |SELECT g AS source, COALESCE(n, 0) AS n_pairs, n_zero,
        |  CASE WHEN n > 0 THEN CAST(w2 AS BIGINT) ELSE NULL END
        |    AS w2_plus,
        |  CASE WHEN n > 0 AND sigma2 > 0.0 THEN
        |    CAST(round(1e6 * (w2d - nd * (nd + 1.0) / 2.0)
        |      / sqrt(sigma2)) AS BIGINT)
        |    ELSE NULL END AS z_micro
        |FROM h""".stripMargin,

    "q334_cochran_q" ->
      """WITH v AS (
        |  SELECT source AS g, doc_id AS i, 'len' AS t,
        |    n_chars >= 300 AS y FROM documents
        |  UNION ALL
        |  SELECT source, doc_id, 'tok',
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      w -> len(w) > 0)) >= 55 FROM documents
        |  UNION ALL
        |  SELECT source, doc_id, 'par', n_chars % 2 = 0
        |  FROM documents),
        |b AS (
        |  SELECT g, i, t, CASE WHEN y THEN 1 ELSE 0 END AS yy
        |  FROM v WHERE y IS NOT NULL),
        |kp AS (
        |  SELECT g, CAST(count(DISTINCT t) AS BIGINT) AS k
        |  FROM b GROUP BY 1),
        |it AS (
        |  SELECT g, i, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(yy) AS BIGINT) AS l
        |  FROM b GROUP BY 1, 2),
        |itk AS (
        |  SELECT it.*, kp.k, it.cnt = kp.k AS complete
        |  FROM it JOIN kp USING (g)),
        |dr AS (
        |  SELECT g, CAST(sum(CASE WHEN NOT complete THEN 1 ELSE 0
        |    END) AS BIGINT) AS n_dropped_items
        |  FROM itk GROUP BY 1),
        |ls AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n_items,
        |    CAST(sum(l) AS BIGINT) AS sl,
        |    CAST(sum(l * l) AS BIGINT) AS sll
        |  FROM itk WHERE complete GROUP BY 1),
        |gs AS (
        |  SELECT b.g, CAST(sum(gj * gj) AS BIGINT) AS sgg
        |  FROM (
        |    SELECT b.g, b.t, CAST(sum(b.yy) AS BIGINT) AS gj
        |    FROM b JOIN itk ON itk.g = b.g AND itk.i = b.i
        |      AND itk.complete
        |    GROUP BY 1, 2) b
        |  GROUP BY 1)
        |SELECT kp.g AS source, kp.k,
        |  COALESCE(ls.n_items, 0) AS n_items, dr.n_dropped_items,
        |  CASE WHEN ls.n_items > 0 AND kp.k * ls.sl - ls.sll > 0 THEN
        |    CAST(round(1e6 * CAST((kp.k - 1)
        |      * (kp.k * gs.sgg - ls.sl * ls.sl) AS DOUBLE)
        |      / CAST(kp.k * ls.sl - ls.sll AS DOUBLE)) AS BIGINT)
        |    ELSE NULL END AS q_micro
        |FROM kp JOIN dr USING (g)
        |LEFT JOIN ls USING (g) LEFT JOIN gs USING (g)""".stripMargin,

    "q335_friedman" ->
      """WITH cell AS (
        |  SELECT 'all' AS g, source AS bb, lang AS t,
        |    CAST(round(CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE)
        |      * 1e6) AS BIGINT) AS v
        |  FROM documents GROUP BY 2, 3),
        |kp AS (
        |  SELECT g, CAST(count(DISTINCT t) AS BIGINT) AS k
        |  FROM cell GROUP BY 1),
        |bl AS (
        |  SELECT cell.g, bb, CAST(count(*) AS BIGINT) AS cnt, kp.k,
        |    count(*) = kp.k AS complete
        |  FROM cell JOIN kp USING (g) GROUP BY cell.g, bb, kp.k),
        |dr AS (
        |  SELECT g, CAST(sum(CASE WHEN NOT complete THEN 1 ELSE 0
        |    END) AS BIGINT) AS n_dropped_blocks
        |  FROM bl GROUP BY 1),
        |rw AS (
        |  SELECT cell.* FROM cell
        |  JOIN bl ON bl.g = cell.g AND bl.bb = cell.bb
        |    AND bl.complete),
        |rk AS (
        |  SELECT x.g, x.bb, x.t, x.v,
        |    2 * sum(CASE WHEN y.v < x.v THEN 1 ELSE 0 END)
        |      + sum(CASE WHEN y.v = x.v THEN 1 ELSE 0 END) + 1 AS r2
        |  FROM rw x JOIN rw y ON x.g = y.g AND x.bb = y.bb
        |  GROUP BY 1, 2, 3, 4),
        |np AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n_blocks
        |  FROM bl WHERE complete GROUP BY 1),
        |rj AS (
        |  SELECT rk.g, rk.t, CAST(sum(r2) AS HUGEINT) AS rjs
        |  FROM rk GROUP BY 1, 2),
        |ss AS (
        |  SELECT rj.g,
        |    sum((rjs - np.n_blocks * (kp.k + 1))
        |      * (rjs - np.n_blocks * (kp.k + 1))) AS s
        |  FROM rj JOIN np USING (g) JOIN kp USING (g)
        |  GROUP BY 1),
        |aa AS (
        |  SELECT g, sum(CAST(r2 AS HUGEINT) * r2) AS a2
        |  FROM rk GROUP BY 1),
        |fin AS (
        |  SELECT kp.g, kp.k, COALESCE(np.n_blocks, 0) AS n_blocks,
        |    dr.n_dropped_blocks, ss.s,
        |    aa.a2 - np.n_blocks * kp.k * (kp.k + 1) * (kp.k + 1)
        |      AS den
        |  FROM kp JOIN dr USING (g)
        |  LEFT JOIN np USING (g) LEFT JOIN ss USING (g)
        |  LEFT JOIN aa USING (g))
        |SELECT g, k, n_blocks, n_dropped_blocks,
        |  CASE WHEN n_blocks > 0 AND den > 0 THEN
        |    CAST(round(1e6 * CAST((k - 1) * s AS DOUBLE)
        |      / CAST(den AS DOUBLE)) AS BIGINT)
        |    ELSE NULL END AS chi2_micro,
        |  CASE WHEN n_blocks > 0 AND den > 0 THEN
        |    CAST(round(1e6 * CAST((k - 1) * s AS DOUBLE)
        |      / CAST(den AS DOUBLE)
        |      / CAST(n_blocks * (k - 1) AS DOUBLE)) AS BIGINT)
        |    ELSE NULL END AS w_micro
        |FROM fin""".stripMargin,

    "q336_kruskal_wallis" ->
      """WITH base AS (
        |  SELECT source AS g, lang AS t,
        |    CAST(round(CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM documents WHERE n_chars IS NOT NULL),
        |vc AS (
        |  SELECT g, v, CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1, 2),
        |rn AS (
        |  SELECT g, v, c,
        |    2 * (sum(c) OVER (PARTITION BY g ORDER BY v) - c)
        |      + c + 1 AS r2
        |  FROM vc),
        |gs AS (
        |  SELECT g, CAST(sum(c) AS BIGINT) AS n,
        |    sum(CAST(c AS HUGEINT) * r2 * r2) AS sumr2sq
        |  FROM rn GROUP BY 1),
        |ts AS (
        |  SELECT tc.g, tc.t, CAST(sum(tc.ct) AS BIGINT) AS nj,
        |    sum(CAST(tc.ct AS HUGEINT) * rn.r2) AS rj
        |  FROM (
        |    SELECT g, t, v, CAST(count(*) AS BIGINT) AS ct
        |    FROM base GROUP BY 1, 2, 3) tc
        |  JOIN rn ON rn.g = tc.g AND rn.v = tc.v
        |  GROUP BY 1, 2),
        |pg AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS k,
        |    sum(CAST(round(CAST(rj * rj AS DOUBLE)
        |      / CAST(nj AS DOUBLE)) AS HUGEINT)) AS ssbq
        |  FROM ts GROUP BY 1),
        |fin AS (
        |  SELECT gs.g, pg.k, gs.n,
        |    greatest(CAST(pg.ssbq - CAST(gs.n AS HUGEINT)
        |      * (gs.n + 1) * (gs.n + 1) AS DOUBLE), 0.0) AS ssb2,
        |    gs.sumr2sq - CAST(gs.n AS HUGEINT) * (gs.n + 1)
        |      * (gs.n + 1) AS sst2
        |  FROM gs JOIN pg USING (g))
        |SELECT g AS source, k, n,
        |  CASE WHEN k >= 2 AND sst2 > 0 THEN
        |    CAST(round(1e6 * CAST(n - 1 AS DOUBLE) * ssb2
        |      / CAST(sst2 AS DOUBLE)) AS BIGINT) ELSE NULL END
        |    AS h_micro,
        |  CASE WHEN k >= 2 AND sst2 > 0 THEN
        |    CAST(round(1e6 * ssb2 / CAST(sst2 AS DOUBLE)) AS BIGINT)
        |    ELSE NULL END AS eps2_micro
        |FROM fin""".stripMargin,

    "q337_anova_f" ->
      """WITH base AS (
        |  SELECT event_type AS g,
        |    ((epoch_us(ts) // 86400000000) + 3) % 7 AS t,
        |    CAST(round(value * 1e6) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |pt AS (
        |  SELECT g, t, CAST(count(*) AS BIGINT) AS nj,
        |    CAST(sum(v) AS HUGEINT) AS sj
        |  FROM base GROUP BY 1, 2),
        |pg AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(nj) AS BIGINT) AS n, sum(sj) AS s,
        |    sum(CAST(round(CAST(sj * sj AS DOUBLE)
        |      / CAST(nj AS DOUBLE)) AS HUGEINT)) AS ssbq
        |  FROM pt GROUP BY 1),
        |q2 AS (
        |  SELECT g, sum(CAST(v AS HUGEINT) * v) AS q2
        |  FROM base GROUP BY 1),
        |fin AS (
        |  SELECT pg.g, pg.k, pg.n,
        |    greatest(CAST(pg.ssbq - gm AS DOUBLE), 0.0) AS ssb,
        |    q2.q2 - gm AS sst,
        |    CAST(q2.q2 - gm AS DOUBLE)
        |      - greatest(CAST(pg.ssbq - gm AS DOUBLE), 0.0) AS ssw
        |  FROM pg JOIN q2 USING (g),
        |  LATERAL (SELECT CAST(round(CAST(pg.s * pg.s AS DOUBLE)
        |    / CAST(pg.n AS DOUBLE)) AS HUGEINT) AS gm))
        |SELECT g AS event_type, k, n,
        |  CASE WHEN k >= 2 AND n > k AND ssw > 0.0 THEN
        |    CAST(round(1e6 * (ssb / CAST(k - 1 AS DOUBLE))
        |      / (ssw / CAST(n - k AS DOUBLE))) AS BIGINT)
        |    ELSE NULL END AS f_micro,
        |  CASE WHEN sst > 0 THEN
        |    CAST(round(1e6 * ssb / CAST(sst AS DOUBLE)) AS BIGINT)
        |    ELSE NULL END AS eta2_micro
        |FROM fin""".stripMargin,

    "q338_brown_forsythe" ->
      """WITH base AS (
        |  SELECT source AS g, lang AS t,
        |    CAST(round(CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM documents WHERE n_chars IS NOT NULL),
        |vc AS (
        |  SELECT g, t, v, CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1, 2, 3),
        |rn AS (
        |  SELECT g, t, v, c,
        |    sum(c) OVER (PARTITION BY g, t ORDER BY v) AS running,
        |    CAST(sum(c) OVER (PARTITION BY g, t) AS BIGINT) AS nn
        |  FROM vc),
        |med AS (
        |  SELECT g, t, min(v) AS med
        |  FROM rn WHERE running >= (nn + 1) // 2 GROUP BY 1, 2),
        |dev AS (
        |  SELECT base.g, base.t, abs(base.v - med.med) AS v
        |  FROM base JOIN med ON med.g = base.g AND med.t = base.t),
        |pt AS (
        |  SELECT g, t, CAST(count(*) AS BIGINT) AS nj,
        |    CAST(sum(v) AS HUGEINT) AS sj
        |  FROM dev GROUP BY 1, 2),
        |pg AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(nj) AS BIGINT) AS n, sum(sj) AS s,
        |    sum(CAST(round(CAST(sj * sj AS DOUBLE)
        |      / CAST(nj AS DOUBLE)) AS HUGEINT)) AS ssbq
        |  FROM pt GROUP BY 1),
        |q2 AS (
        |  SELECT g, sum(CAST(v AS HUGEINT) * v) AS q2
        |  FROM dev GROUP BY 1),
        |fin AS (
        |  SELECT pg.g, pg.k, pg.n,
        |    greatest(CAST(pg.ssbq - gm AS DOUBLE), 0.0) AS ssb,
        |    q2.q2 - gm AS sst,
        |    CAST(q2.q2 - gm AS DOUBLE)
        |      - greatest(CAST(pg.ssbq - gm AS DOUBLE), 0.0) AS ssw
        |  FROM pg JOIN q2 USING (g),
        |  LATERAL (SELECT CAST(round(CAST(pg.s * pg.s AS DOUBLE)
        |    / CAST(pg.n AS DOUBLE)) AS HUGEINT) AS gm))
        |SELECT g AS source, k, n,
        |  CASE WHEN k >= 2 AND n > k AND ssw > 0.0 THEN
        |    CAST(round(1e6 * (ssb / CAST(k - 1 AS DOUBLE))
        |      / (ssw / CAST(n - k AS DOUBLE))) AS BIGINT)
        |    ELSE NULL END AS f_micro,
        |  CASE WHEN sst > 0 THEN
        |    CAST(round(1e6 * ssb / CAST(sst AS DOUBLE)) AS BIGINT)
        |    ELSE NULL END AS eta2_micro
        |FROM fin""".stripMargin,

    "q339_brier" ->
      """WITH base AS (
        |  SELECT event_type AS g,
        |    least(greatest(CAST(round(value * 5.0) AS BIGINT), 0),
        |      1000) AS p,
        |    CASE WHEN (CASE WHEN event_id % 7 = 0 THEN value < 100.0
        |      ELSE value >= 100.0 END) THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |bins AS (
        |  SELECT g, least(p // 100, 9) AS b,
        |    CAST(count(*) AS BIGINT) AS nb,
        |    CAST(sum(p) AS BIGINT) AS sb, CAST(sum(y) AS BIGINT) AS ob,
        |    sum(CAST((p - 1000 * y) * (p - 1000 * y) AS HUGEINT))
        |      AS b2
        |  FROM base GROUP BY 1, 2),
        |tot AS (
        |  SELECT g, CAST(sum(nb) AS BIGINT) AS n,
        |    CAST(sum(ob) AS BIGINT) AS o, sum(b2) AS b2t
        |  FROM bins GROUP BY 1),
        |binq AS (
        |  SELECT bins.g,
        |    sum(CAST(round(CAST(CAST(sb - 1000 * ob AS HUGEINT)
        |      * (sb - 1000 * ob) AS DOUBLE) / CAST(nb AS DOUBLE))
        |      AS HUGEINT)) AS relq,
        |    sum(CAST(round(CAST((CAST(ob AS HUGEINT) * n
        |      - CAST(nb AS HUGEINT) * o)
        |      * (CAST(ob AS HUGEINT) * n - CAST(nb AS HUGEINT) * o)
        |      AS DOUBLE) / CAST(nb AS DOUBLE)) AS HUGEINT)) AS resq
        |  FROM bins JOIN tot USING (g) GROUP BY 1)
        |SELECT tot.g AS event_type, tot.n,
        |  CAST(round(CAST(b2t AS DOUBLE) / CAST(n AS DOUBLE))
        |    AS BIGINT) AS brier_micro,
        |  CAST(round(CAST(relq AS DOUBLE) / CAST(n AS DOUBLE))
        |    AS BIGINT) AS rel_micro,
        |  CAST(round(1e6 * CAST(resq AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * n * n)) AS BIGINT) AS res_micro,
        |  CAST(round(1e6 * CAST(o AS DOUBLE) * CAST(n - o AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * n)) AS BIGINT) AS unc_micro
        |FROM tot JOIN binq USING (g)""".stripMargin,

    "q340_ljung_box" ->
      """WITH b AS (
        |  SELECT event_type AS k, ts, event_id,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT k,
        |    row_number() OVER (PARTITION BY k ORDER BY ts, event_id)
        |      AS rk,
        |    v
        |  FROM b),
        |tot AS (
        |  SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(v AS HUGEINT)) AS s,
        |    sum(CAST(v AS HUGEINT) * v) AS q
        |  FROM r GROUP BY 1),
        |p AS (
        |  SELECT h.k, t.rk - h.rk AS lag,
        |    CAST(count(*) AS BIGINT) AS n_pairs,
        |    sum(CAST(h.v AS HUGEINT) * t.v) AS pp,
        |    sum(CAST(h.v AS HUGEINT)) AS hh,
        |    sum(CAST(t.v AS HUGEINT)) AS tt
        |  FROM r h JOIN r t
        |    ON h.k = t.k AND t.rk - h.rk BETWEEN 1 AND 5
        |  GROUP BY 1, 2),
        |a AS (
        |  SELECT p.k, CAST(p.lag AS BIGINT) AS lag, tot.n,
        |    CASE WHEN (tot.q * tot.n - tot.s * tot.s) * tot.n > 0
        |      THEN CAST(round(1e6
        |        * CAST(p.pp * tot.n * tot.n
        |            - tot.s * (p.hh + p.tt) * tot.n
        |            + tot.s * tot.s * p.n_pairs AS DOUBLE)
        |        / CAST((tot.q * tot.n - tot.s * tot.s) * tot.n
        |            AS DOUBLE)) AS BIGINT)
        |      ELSE NULL END AS acf_micro
        |  FROM p JOIN tot USING (k)),
        |lb AS (
        |  SELECT k, CAST(max(n) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_lags,
        |    sum(CAST(round(CAST(CAST(acf_micro AS HUGEINT)
        |      * acf_micro AS DOUBLE) / CAST(n - lag AS DOUBLE))
        |      AS HUGEINT)) AS s
        |  FROM a WHERE acf_micro IS NOT NULL GROUP BY 1)
        |SELECT k AS event_type, n, n_lags,
        |  CAST(round(CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE)
        |    * CAST(s AS DOUBLE) / 1e6) AS BIGINT) AS q_micro
        |FROM lb""".stripMargin,

    "q341_good_turing" ->
      """WITH tok AS (
        |  SELECT g, w, CAST(count(*) AS BIGINT) AS r FROM (
        |    SELECT source AS g,
        |      unnest(list_filter(string_split_regex(lower(text),
        |        '\s+'), t -> len(t) > 0)) AS w
        |    FROM documents)
        |  GROUP BY 1, 2),
        |sp AS (
        |  SELECT g, r, CAST(count(*) AS BIGINT) AS n_r
        |  FROM tok GROUP BY 1, 2),
        |tot AS (
        |  SELECT g, CAST(sum(r * n_r) AS BIGINT) AS t,
        |    CAST(sum(CASE WHEN r = 1 THEN n_r END) AS BIGINT) AS n1
        |  FROM sp GROUP BY 1)
        |SELECT sp.g AS source, sp.r, sp.n_r,
        |  CAST(round(1e6 * CAST(sp.r + 1 AS DOUBLE)
        |    * CAST(nx.n_r AS DOUBLE) / CAST(sp.n_r AS DOUBLE))
        |    AS BIGINT) AS r_star_micro,
        |  CAST(round(1e6 * CAST(COALESCE(tot.n1, 0) AS DOUBLE)
        |    / CAST(tot.t AS DOUBLE)) AS BIGINT) AS p0_micro
        |FROM sp LEFT JOIN sp nx ON nx.g = sp.g AND nx.r = sp.r + 1
        |JOIN tot ON tot.g = sp.g
        |WHERE sp.r <= 5""".stripMargin,

    "q342_dawid_skene" ->
      s"""WITH $ratingsFixtureSql,
         |v AS (
         |  SELECT source AS g, item AS i, rater AS rr,
         |    CASE WHEN label = 'pos' THEN 1 ELSE 0 END AS y
         |  FROM r),
         |pi1 AS (
         |  SELECT g, i, CAST(round(1e6 * CAST(sum(y) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS pi
         |  FROM v GROUP BY 1, 2),
         |m1 AS (
         |  SELECT v.g, v.rr, CAST(count(*) AS BIGINT) AS n_votes,
         |    sum(CAST(pi AS HUGEINT)) AS wp,
         |    sum(CASE WHEN y = 1 THEN CAST(pi AS HUGEINT)
         |      ELSE 0 END) AS wpp,
         |    sum(CAST(1000000 - pi AS HUGEINT)) AS wn,
         |    sum(CASE WHEN y = 0 THEN CAST(1000000 - pi AS HUGEINT)
         |      ELSE 0 END) AS wnn
         |  FROM v JOIN pi1 USING (g, i) GROUP BY 1, 2),
         |t1 AS (
         |  SELECT g, rr, n_votes,
         |    CASE WHEN wp > 0 THEN CAST(round(1e6
         |      * CAST(wpp AS DOUBLE) / CAST(wp AS DOUBLE)) AS BIGINT)
         |      END AS tpp,
         |    CASE WHEN wn > 0 THEN CAST(round(1e6
         |      * CAST(wnn AS DOUBLE) / CAST(wn AS DOUBLE)) AS BIGINT)
         |      END AS tnn
         |  FROM m1),
         |pr1 AS (
         |  SELECT g, CAST(round(CAST(sum(pi) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS pr
         |  FROM pi1 GROUP BY 1),
         |f AS (
         |  SELECT v.g, v.i, v.rr,
         |    CASE WHEN y = 1 THEN COALESCE(tpp, 500000)
         |      ELSE 1000000 - COALESCE(tpp, 500000) END AS fp,
         |    CASE WHEN y = 1 THEN 1000000 - COALESCE(tnn, 500000)
         |      ELSE COALESCE(tnn, 500000) END AS fn
         |  FROM v JOIN t1 ON t1.g = v.g AND t1.rr = v.rr),
         |prod AS (
         |  SELECT g, i,
         |    CAST(COALESCE(max(CASE WHEN rr = 'len500' THEN fp END),
         |        1) AS HUGEINT)
         |      * COALESCE(max(CASE WHEN rr = 'len480' THEN fp END), 1)
         |      * COALESCE(max(CASE WHEN rr = 'hash' THEN fp END), 1)
         |      AS ppos,
         |    CAST(COALESCE(max(CASE WHEN rr = 'len500' THEN fn END),
         |        1) AS HUGEINT)
         |      * COALESCE(max(CASE WHEN rr = 'len480' THEN fn END), 1)
         |      * COALESCE(max(CASE WHEN rr = 'hash' THEN fn END), 1)
         |      AS pneg
         |  FROM f GROUP BY 1, 2),
         |pi2 AS (
         |  SELECT prod.g, prod.i,
         |    CASE WHEN CAST(pr AS HUGEINT) * ppos
         |        + CAST(1000000 - pr AS HUGEINT) * pneg > 0
         |      THEN CAST(round(1e6
         |        * CAST(CAST(pr AS HUGEINT) * ppos AS DOUBLE)
         |        / CAST(CAST(pr AS HUGEINT) * ppos
         |            + CAST(1000000 - pr AS HUGEINT) * pneg
         |          AS DOUBLE)) AS BIGINT)
         |      ELSE pr END AS pi
         |  FROM prod JOIN pr1 USING (g)),
         |m2 AS (
         |  SELECT v.g, v.rr,
         |    sum(CAST(pi AS HUGEINT)) AS wp,
         |    sum(CASE WHEN y = 1 THEN CAST(pi AS HUGEINT)
         |      ELSE 0 END) AS wpp,
         |    sum(CAST(1000000 - pi AS HUGEINT)) AS wn,
         |    sum(CASE WHEN y = 0 THEN CAST(1000000 - pi AS HUGEINT)
         |      ELSE 0 END) AS wnn
         |  FROM v JOIN pi2 ON pi2.g = v.g AND pi2.i = v.i
         |  GROUP BY 1, 2),
         |t2 AS (
         |  SELECT g, rr,
         |    CASE WHEN wp > 0 THEN CAST(round(1e6
         |      * CAST(wpp AS DOUBLE) / CAST(wp AS DOUBLE)) AS BIGINT)
         |      END AS tpp,
         |    CASE WHEN wn > 0 THEN CAST(round(1e6
         |      * CAST(wnn AS DOUBLE) / CAST(wn AS DOUBLE)) AS BIGINT)
         |      END AS tnn
         |  FROM m2),
         |pr2 AS (
         |  SELECT g, CAST(round(CAST(sum(pi) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS pr2
         |  FROM pi2 GROUP BY 1)
         |SELECT t1.g AS source, t1.rr AS rater, t1.n_votes,
         |  t1.tpp AS tpp_micro, t1.tnn AS tnn_micro,
         |  pr1.pr AS prior_micro, t2.tpp AS tpp2_micro,
         |  t2.tnn AS tnn2_micro, pr2.pr2 AS prior2_micro
         |FROM t1 JOIN t2 ON t2.g = t1.g AND t2.rr = t1.rr
         |JOIN pr1 ON pr1.g = t1.g JOIN pr2 ON pr2.g = t1.g"""
      .stripMargin,

    "q343_als_rank1" ->
      """WITH base AS (
        |  SELECT u, i, CAST(round(CAST(sv AS DOUBLE) / (1000.0 * c))
        |    AS BIGINT) AS r
        |  FROM (
        |    SELECT user_id AS u, event_type AS i,
        |      sum(CAST(round(value * 1e6) AS BIGINT)) AS sv,
        |      CAST(count(*) AS BIGINT) AS c
        |    FROM events WHERE value IS NOT NULL GROUP BY 1, 2)),
        |i0 AS (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS v
        |  FROM base),
        |u1 AS (
        |  SELECT u, CAST(round(1e9
        |    * CAST(sum(CAST(r AS HUGEINT) * v) AS DOUBLE)
        |    / CAST(sum(CAST(v AS HUGEINT) * v) + 100000000000
        |      AS DOUBLE)) AS BIGINT) AS f
        |  FROM base JOIN i0 USING (i) GROUP BY 1),
        |i1 AS (
        |  SELECT i, CAST(round(1e9
        |    * CAST(sum(CAST(r AS HUGEINT) * f) AS DOUBLE)
        |    / CAST(sum(CAST(f AS HUGEINT) * f) + 100000000000
        |      AS DOUBLE)) AS BIGINT) AS v
        |  FROM base JOIN u1 USING (u) GROUP BY 1),
        |u2 AS (
        |  SELECT u, CAST(round(1e9
        |    * CAST(sum(CAST(r AS HUGEINT) * v) AS DOUBLE)
        |    / CAST(sum(CAST(v AS HUGEINT) * v) + 100000000000
        |      AS DOUBLE)) AS BIGINT) AS f
        |  FROM base JOIN i1 USING (i) GROUP BY 1),
        |i2 AS (
        |  SELECT i, CAST(count(*) AS BIGINT) AS n_ratings,
        |    CAST(round(1e9
        |    * CAST(sum(CAST(r AS HUGEINT) * f) AS DOUBLE)
        |    / CAST(sum(CAST(f AS HUGEINT) * f) + 100000000000
        |      AS DOUBLE)) AS BIGINT) AS v
        |  FROM base JOIN u2 USING (u) GROUP BY 1),
        |e AS (
        |  SELECT base.i, base.r * 1000
        |    - CAST(round(CAST(CAST(f AS HUGEINT) * v AS DOUBLE)
        |      / 1e6) AS BIGINT) AS err
        |  FROM base JOIN u2 USING (u) JOIN i2 USING (i)),
        |fit AS (
        |  SELECT i, CAST(round(sqrt(
        |    CAST(sum(CAST(err AS HUGEINT) * err) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE))) AS BIGINT) AS rmse_micro
        |  FROM e GROUP BY 1)
        |SELECT i2.i AS event_type, i2.n_ratings, i2.v AS v_micro,
        |  fit.rmse_micro
        |FROM i2 JOIN fit USING (i)""".stripMargin,

    "q344_ams_f2" -> amsF2OracleSql,

    "q345_holt_winters" -> holtWintersOracleSql,

    "q346_neighborhood" -> neighborhoodOracleSql,

    "q347_sstem" ->
      """WITH tok AS (
        |  SELECT source,
        |    unnest(list_filter(string_split_regex(lower(text),
        |      '\s+'), t -> len(t) > 0)) AS w
        |  FROM documents),
        |st AS (
        |  SELECT source, w,
        |    CASE WHEN len(w) >= 4 AND w LIKE '%ies'
        |        AND (w LIKE '%eies' OR w LIKE '%aies') THEN w
        |    WHEN len(w) >= 4 AND w LIKE '%ies'
        |      THEN substr(w, 1, len(w) - 3) || 'y'
        |    WHEN len(w) >= 4 AND w LIKE '%es'
        |        AND (w LIKE '%aes' OR w LIKE '%ees'
        |          OR w LIKE '%oes') THEN w
        |    WHEN len(w) >= 4 AND w LIKE '%es'
        |      THEN substr(w, 1, len(w) - 1)
        |    WHEN len(w) >= 4 AND w LIKE '%s'
        |        AND w NOT LIKE '%us' AND w NOT LIKE '%ss'
        |      THEN substr(w, 1, len(w) - 1)
        |    ELSE w END AS stem
        |  FROM tok)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN stem <> w THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_changed,
        |  CAST(count(DISTINCT stem) AS BIGINT) AS n_stems
        |FROM st GROUP BY 1""".stripMargin,

    "q348_lexical_richness" ->
      """WITH tok AS (
        |  SELECT source AS g,
        |    unnest(list_filter(string_split_regex(lower(text),
        |      '\s+'), t -> len(t) > 0)) AS w
        |  FROM documents),
        |c AS (
        |  SELECT g, w, CAST(count(*) AS BIGINT) AS r
        |  FROM tok GROUP BY 1, 2),
        |a AS (
        |  SELECT g, CAST(sum(r) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    sum(CAST(r AS HUGEINT) * r) AS s2,
        |    sum(CAST(r AS HUGEINT) * (r - 1)) AS s11
        |  FROM c GROUP BY 1)
        |SELECT g AS source, n_tokens, n_types,
        |  CAST(round(1e6 * CAST(n_types AS DOUBLE)
        |    / CAST(n_tokens AS DOUBLE)) AS BIGINT) AS ttr_micro,
        |  CAST(round(1e10 * CAST(s2 - n_tokens AS DOUBLE)
        |    / (CAST(n_tokens AS DOUBLE) * n_tokens)) AS BIGINT)
        |    AS yule_k_micro,
        |  CASE WHEN n_tokens > 1 THEN
        |    CAST(round(1e6 * CAST(s11 AS DOUBLE)
        |      / (CAST(n_tokens AS DOUBLE) * (n_tokens - 1.0)))
        |      AS BIGINT) END AS simpson_micro
        |FROM a""".stripMargin,

    "q349_rand_response" ->
      """WITH b AS (
        |  SELECT source,
        |    (n_chars >= 400) <> (CAST(('0x' || substr(md5('rr:'
        |      || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 4
        |      = 0) AS obs
        |  FROM documents),
        |a AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pos
        |  FROM b GROUP BY 1),
        |a2 AS (
        |  SELECT source, n, n_pos,
        |    ((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)) - 0.25)
        |      / 0.5 AS pi,
        |    sqrt((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (1.0 - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
        |      / CAST(n AS DOUBLE)) / 0.5 AS se
        |  FROM a)
        |SELECT source, n, n_pos,
        |  CAST(round(1e6 * pi) AS BIGINT) AS pi_micro,
        |  CAST(round(1e6 * (pi - 1.96 * se)) AS BIGINT)
        |    AS ci_lo_micro,
        |  CAST(round(1e6 * (pi + 1.96 * se)) AS BIGINT)
        |    AS ci_hi_micro
        |FROM a2""".stripMargin,

    "q350_mann_kendall" ->
      """WITH b AS (
        |  SELECT user_id AS k, ts, event_id,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT k,
        |    row_number() OVER (PARTITION BY k ORDER BY ts, event_id)
        |      AS rk,
        |    v
        |  FROM b
        |  QUALIFY rk <= 512),
        |pairs AS (
        |  SELECT a.k,
        |    CAST(CASE WHEN t.v > a.v THEN 1 WHEN t.v < a.v THEN -1
        |      ELSE 0 END AS BIGINT) AS sgn,
        |    CAST(round(CAST(t.v - a.v AS DOUBLE)
        |      / CAST(t.rk - a.rk AS DOUBLE)) AS BIGINT) AS slope
        |  FROM r a JOIN r t ON a.k = t.k AND a.rk < t.rk),
        |sagg AS (
        |  SELECT k, CAST(sum(sgn) AS BIGINT) AS s_stat,
        |    CAST(count(*) AS BIGINT) AS m
        |  FROM pairs GROUP BY 1),
        |sen AS (
        |  SELECT p.k, p.slope AS sen_micro FROM (
        |    SELECT k, slope,
        |      row_number() OVER (PARTITION BY k ORDER BY slope) AS rn
        |    FROM pairs) p
        |  JOIN sagg ON p.k = sagg.k AND p.rn = (sagg.m + 1) // 2),
        |nn AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM r
        |  GROUP BY 1),
        |ties AS (
        |  SELECT k, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
        |    AS tie18
        |  FROM (SELECT k, v, CAST(count(*) AS BIGINT) AS t FROM r
        |    GROUP BY 1, 2)
        |  GROUP BY 1),
        |fin AS (
        |  SELECT nn.k, nn.n, sagg.s_stat,
        |    nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie18 AS var18,
        |    sen.sen_micro
        |  FROM nn JOIN ties USING (k) JOIN sagg ON nn.k = sagg.k
        |  JOIN sen ON nn.k = sen.k),
        |z AS (
        |  SELECT *,
        |    CASE WHEN var18 > 0 THEN
        |      CAST(round(1e6 * (CAST(s_stat AS DOUBLE)
        |        - CAST(sign(s_stat) AS DOUBLE))
        |        / sqrt(CAST(var18 AS DOUBLE) / 18.0)) AS BIGINT)
        |    END AS z_micro
        |  FROM fin)
        |SELECT k AS user_id, n, s_stat, var18, sen_micro, z_micro,
        |  CASE WHEN z_micro > 1959964 THEN 1
        |    WHEN z_micro < -1959964 THEN -1
        |    WHEN z_micro IS NOT NULL THEN 0 END AS trend
        |FROM z""".stripMargin,

    "q351_theil" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value - 100.0 AS DOUBLE) * 1e6) AS BIGINT)
        |      AS v
        |  FROM events),
        |spine AS (
        |  SELECT g, CAST(sum(CASE WHEN v IS NULL OR v <= 0 THEN 1
        |    ELSE 0 END) AS BIGINT) AS n_dropped
        |  FROM b GROUP BY 1),
        |base AS (SELECT g, v FROM b WHERE v > 0),
        |tot AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(v AS HUGEINT)) AS tot
        |  FROM base GROUP BY 1),
        |terms AS (
        |  SELECT base.g,
        |    sum(CAST(round(1e6 * (CAST(v AS DOUBLE)
        |      * CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
        |      * ln(CAST(v AS DOUBLE) * CAST(n AS DOUBLE)
        |        / CAST(tot AS DOUBLE))) AS HUGEINT)) AS st,
        |    sum(CAST(round(1e6 * ln(CAST(v AS DOUBLE)
        |      * CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)))
        |      AS HUGEINT)) AS sl
        |  FROM base JOIN tot USING (g) GROUP BY 1)
        |SELECT spine.g AS event_type, coalesce(tot.n, 0) AS n,
        |  spine.n_dropped, CAST(tot.tot AS VARCHAR) AS total_micro,
        |  CAST(round(CAST(st AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |    AS BIGINT) AS theil_t_micro,
        |  CAST(round(-CAST(sl AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |    AS BIGINT) AS theil_l_micro
        |FROM spine LEFT JOIN tot ON spine.g = tot.g
        |LEFT JOIN terms ON spine.g = terms.g""".stripMargin,

    "q352_keyness" ->
      """WITH tok AS (
        |  SELECT (lang = 'en') AS f,
        |    unnest(list_filter(string_split_regex(lower(text),
        |      '\s+'), t -> len(t) > 0)) AS token
        |  FROM documents),
        |c0 AS (
        |  SELECT token,
        |    CAST(sum(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c_focus,
        |    CAST(sum(CASE WHEN f THEN 0 ELSE 1 END) AS BIGINT)
        |      AS c_ref
        |  FROM tok GROUP BY 1),
        |tot AS (
        |  SELECT sum(CAST(c_focus AS HUGEINT)) AS ca,
        |    sum(CAST(c_ref AS HUGEINT)) AS cb
        |  FROM c0),
        |c AS (
        |  SELECT * FROM c0 WHERE c_focus + c_ref >= 20)
        |SELECT token, c_focus, c_ref,
        |  CAST(round(2e6 * (
        |    (CASE WHEN c_focus > 0 THEN CAST(c_focus AS DOUBLE)
        |      * ln(CAST(c_focus AS DOUBLE)
        |        * (CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE))
        |        / ((CAST(c_focus AS DOUBLE) + CAST(c_ref AS DOUBLE))
        |          * CAST(ca AS DOUBLE))) ELSE 0.0 END)
        |    + (CASE WHEN c_ref > 0 THEN CAST(c_ref AS DOUBLE)
        |      * ln(CAST(c_ref AS DOUBLE)
        |        * (CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE))
        |        / ((CAST(c_focus AS DOUBLE) + CAST(c_ref AS DOUBLE))
        |          * CAST(cb AS DOUBLE))) ELSE 0.0 END)))
        |    AS BIGINT) AS g2_micro,
        |  CAST(sign(CAST(CAST(c_focus AS HUGEINT) * cb
        |    - CAST(c_ref AS HUGEINT) * ca AS DOUBLE)) AS INTEGER)
        |    AS direction
        |FROM c, tot""".stripMargin,

    "q353_chao1" ->
      """WITH tok AS (
        |  SELECT source AS g,
        |    unnest(list_filter(string_split_regex(lower(text),
        |      '\s+'), t -> len(t) > 0)) AS w
        |  FROM documents),
        |cnt AS (
        |  SELECT g, w, CAST(count(*) AS BIGINT) AS r
        |  FROM tok GROUP BY 1, 2),
        |a AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS s_obs,
        |    CAST(sum(r) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS f1,
        |    CAST(sum(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS f2,
        |    CAST(sum(CASE WHEN r <= 10 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS srare,
        |    CAST(sum(CASE WHEN r <= 10 THEN r ELSE 0 END) AS BIGINT)
        |      AS nrare,
        |    sum(CASE WHEN r <= 10 THEN CAST(r AS HUGEINT) * (r - 1)
        |      ELSE 0 END) AS sumrr1
        |  FROM cnt GROUP BY 1),
        |a2 AS (
        |  SELECT *, 1.0 - CAST(f1 AS DOUBLE) / CAST(nrare AS DOUBLE)
        |    AS chat
        |  FROM a),
        |a3 AS (
        |  SELECT *, greatest(0.0, CAST(srare AS DOUBLE)
        |    * CAST(sumrr1 AS DOUBLE)
        |    / (chat * CAST(nrare AS DOUBLE)
        |      * (CAST(nrare AS DOUBLE) - 1.0)) - 1.0) AS gamma2
        |  FROM a2)
        |SELECT g AS source, s_obs, n_tokens, f1, f2,
        |  1000000 * s_obs + CAST(round(1e6
        |    * CAST(f1 * (f1 - 1) AS DOUBLE)
        |    / CAST(2 * (f2 + 1) AS DOUBLE)) AS BIGINT) AS chao1_micro,
        |  CASE WHEN nrare > 1 AND f1 < nrare THEN
        |    1000000 * (s_obs - srare) + CAST(round(1e6
        |      * (CAST(srare AS DOUBLE) / chat
        |        + CAST(f1 AS DOUBLE) * gamma2 / chat)) AS BIGINT)
        |  END AS ace_micro
        |FROM a3""".stripMargin,

    "q354_runs_test" ->
      """WITH b AS (
        |  SELECT event_type AS k, ts, event_id,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT k,
        |    row_number() OVER (PARTITION BY k ORDER BY ts, event_id)
        |      AS r0,
        |    v
        |  FROM b),
        |m AS (
        |  SELECT k, v AS med FROM (
        |    SELECT k, v,
        |      row_number() OVER (PARTITION BY k ORDER BY v) AS vr,
        |      count(*) OVER (PARTITION BY k) AS n
        |    FROM r)
        |  WHERE vr = (n + 1) // 2),
        |f AS (
        |  SELECT r.k, r.r0,
        |    CASE WHEN v > med THEN 1 WHEN v < med THEN 0 END AS up
        |  FROM r JOIN m ON r.k = m.k),
        |counts AS (
        |  SELECT k,
        |    CAST(sum(CASE WHEN up = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_above,
        |    CAST(sum(CASE WHEN up = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_below,
        |    CAST(sum(CASE WHEN up IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_dropped
        |  FROM f GROUP BY 1),
        |kept AS (
        |  SELECT k, up,
        |    row_number() OVER (PARTITION BY k ORDER BY r0) AS rk
        |  FROM f WHERE up IS NOT NULL),
        |ch AS (
        |  SELECT a.k,
        |    CAST(sum(CASE WHEN a.up <> p.up THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nch
        |  FROM kept a JOIN kept p ON a.k = p.k AND a.rk = p.rk + 1
        |  GROUP BY 1),
        |fin AS (
        |  SELECT counts.k, n_above, n_below, n_dropped,
        |    CASE WHEN n_above + n_below > 0
        |      THEN coalesce(nch, 0) + 1 END AS runs,
        |    2 * CAST(n_above AS HUGEINT) * n_below AS twoab,
        |    CAST(n_above + n_below AS HUGEINT) AS ntot
        |  FROM counts LEFT JOIN ch ON counts.k = ch.k)
        |SELECT k AS event_type, n_above, n_below, n_dropped, runs,
        |  CASE WHEN runs IS NOT NULL
        |    AND twoab * (twoab - ntot) > 0 THEN
        |    CAST(round(1e6 * (CAST(runs AS DOUBLE)
        |      - (CAST(twoab AS DOUBLE) / CAST(ntot AS DOUBLE) + 1.0))
        |      / sqrt(CAST(twoab * (twoab - ntot) AS DOUBLE)
        |        / CAST(ntot * ntot * (ntot - 1) AS DOUBLE)))
        |      AS BIGINT)
        |  END AS z_micro
        |FROM fin""".stripMargin,

    "q355_bartlett" ->
      """WITH b AS (
        |  SELECT source AS g, lang AS t,
        |    CAST(round(CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM documents WHERE n_chars IS NOT NULL),
        |arms AS (
        |  SELECT g, t, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(v AS HUGEINT)) AS s,
        |    sum(CAST(v AS HUGEINT) * v) AS q
        |  FROM b GROUP BY 1, 2),
        |pa AS (
        |  SELECT g, n,
        |    CASE WHEN n * q - s * s > 0 THEN
        |      CAST(round(1e6 * CAST(n - 1 AS DOUBLE)
        |        * ln(CAST(n * q - s * s AS DOUBLE)
        |          / CAST(n * (n - 1) AS DOUBLE))) AS BIGINT)
        |    END AS term,
        |    CASE WHEN n * q - s * s > 0 THEN 0 ELSE 1 END AS zv,
        |    CAST(round(CAST(n * q - s * s AS DOUBLE)
        |      / CAST(n AS DOUBLE)) AS HUGEINT) AS w,
        |    CAST(round(1e12 / CAST(n - 1 AS DOUBLE)) AS BIGINT)
        |      AS inv
        |  FROM arms WHERE n >= 2),
        |ga AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(zv) AS BIGINT) AS n_zerovar,
        |    CAST(sum(term) AS BIGINT) AS terms,
        |    sum(w) AS sw, sum(CAST(inv AS HUGEINT)) AS sinv
        |  FROM pa GROUP BY 1),
        |dr AS (
        |  SELECT g, CAST(sum(CASE WHEN n < 2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dropped_arms
        |  FROM arms GROUP BY 1)
        |SELECT dr.g AS source, coalesce(k, 0) AS k,
        |  coalesce(ga.n, 0) AS n, n_dropped_arms,
        |  coalesce(n_zerovar, 0) AS n_zerovar,
        |  CASE WHEN k >= 2 AND n_zerovar = 0 THEN
        |    CAST(round(CAST(CAST(round(1e6
        |        * CAST(ga.n - k AS DOUBLE)
        |        * ln(CAST(sw AS DOUBLE) / CAST(ga.n - k AS DOUBLE)))
        |        AS BIGINT) - terms AS DOUBLE)
        |      / (1.0 + (CAST(sinv AS DOUBLE) / 1e12
        |        - 1.0 / CAST(ga.n - k AS DOUBLE))
        |        / (3.0 * CAST(k - 1 AS DOUBLE)))) AS BIGINT)
        |  END AS chi2_micro,
        |  CASE WHEN k >= 2 THEN
        |    CAST(round(1e6 * (1.0 + (CAST(sinv AS DOUBLE) / 1e12
        |      - 1.0 / CAST(ga.n - k AS DOUBLE))
        |      / (3.0 * CAST(k - 1 AS DOUBLE)))) AS BIGINT)
        |  END AS c_micro
        |FROM dr LEFT JOIN ga ON dr.g = ga.g""".stripMargin,

    "q356_burrows_delta" ->
      """WITH tok AS (
        |  SELECT source AS a,
        |    unnest(list_filter(string_split_regex(lower(text),
        |      '\s+'), t -> len(t) > 0)) AS w
        |  FROM documents),
        |counts AS (
        |  SELECT a, w, CAST(count(*) AS BIGINT) AS c
        |  FROM tok GROUP BY 1, 2),
        |totals AS (
        |  SELECT a, CAST(sum(c) AS BIGINT) AS t
        |  FROM counts GROUP BY 1),
        |top AS (
        |  SELECT w FROM (
        |    SELECT w, sum(CAST(c AS HUGEINT)) AS tot
        |    FROM counts GROUP BY 1)
        |  ORDER BY tot DESC, w ASC LIMIT 50),
        |grid AS (
        |  SELECT totals.a, top.w,
        |    CAST(round(1e6 * CAST(coalesce(c, 0) AS DOUBLE)
        |      / CAST(t AS DOUBLE)) AS BIGINT) AS f
        |  FROM totals CROSS JOIN top
        |  LEFT JOIN counts
        |    ON counts.a = totals.a AND counts.w = top.w),
        |stats AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS na,
        |    CAST(sum(f) AS BIGINT) AS s,
        |    sum(CAST(f AS HUGEINT) * f) AS q
        |  FROM grid GROUP BY 1),
        |z AS (
        |  SELECT a, grid.w,
        |    CAST(round(1e6 * CAST(f * na - s AS DOUBLE)
        |      / sqrt(CAST(na * q - CAST(s AS HUGEINT) * s
        |        AS DOUBLE))) AS BIGINT) AS z
        |  FROM grid JOIN stats ON grid.w = stats.w
        |  WHERE na * q - CAST(s AS HUGEINT) * s > 0)
        |SELECT l.a AS author_a, r.a AS author_b,
        |  CAST(count(*) AS BIGINT) AS k_used,
        |  CAST(round(CAST(sum(abs(l.z - r.z)) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS delta_micro
        |FROM z l JOIN z r ON l.w = r.w AND l.a < r.a
        |GROUP BY 1, 2""".stripMargin,

    "q357_nn_join" ->
      """WITH p AS (
        |  SELECT event_id AS id,
        |    CAST(('0x' || substr(md5('x:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 1000000 AS x,
        |    CAST(('0x' || substr(md5('y:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 1000000 AS y
        |  FROM events),
        |pr AS (
        |  SELECT id AS a, x AS ax, y AS ay,
        |         x // 5000 + dx AS cx, y // 5000 + dy AS cy
        |  FROM p, UNNEST([-1, 0, 1]) AS ox(dx),
        |       UNNEST([-1, 0, 1]) AS oy(dy)),
        |bu AS (SELECT id AS b, x AS bx, y AS by,
        |         x // 5000 AS cx, y // 5000 AS cy
        |       FROM p),
        |cand AS (
        |  SELECT a, b,
        |    (ax-bx)*(ax-bx) + (ay-by)*(ay-by) AS d2
        |  FROM pr JOIN bu USING (cx, cy)
        |  WHERE a <> b
        |    AND (ax-bx)*(ax-bx) + (ay-by)*(ay-by) <= 25000000),
        |best AS (
        |  SELECT a, b, d2 FROM (
        |    SELECT a, b, d2,
        |      row_number() OVER (PARTITION BY a ORDER BY d2, b) AS rn
        |    FROM cand)
        |  WHERE rn = 1)
        |SELECT p.id AS a, best.b, best.d2
        |FROM p LEFT JOIN best ON p.id = best.a""".stripMargin,

    "q358_dbscan" ->
      """WITH RECURSIVE p AS (
        |  SELECT event_id AS id,
        |    CAST(('0x' || substr(md5('x:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 1000000 AS x,
        |    CAST(('0x' || substr(md5('y:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 1000000 AS y
        |  FROM events),
        |pr AS (
        |  SELECT id AS a, x AS ax, y AS ay,
        |         x // 2500 + dx AS cx, y // 2500 + dy AS cy
        |  FROM p, UNNEST([-1, 0, 1]) AS ox(dx),
        |       UNNEST([-1, 0, 1]) AS oy(dy)),
        |bu AS (SELECT id AS b, x AS bx, y AS by,
        |         x // 2500 AS cx, y // 2500 AS cy
        |       FROM p),
        |pairs AS (
        |  SELECT a, b
        |  FROM pr JOIN bu USING (cx, cy)
        |  WHERE a < b
        |    AND (ax-bx)*(ax-bx) + (ay-by)*(ay-by) <= 6250000),
        |deg AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS d FROM (
        |    SELECT a AS id FROM pairs
        |    UNION ALL SELECT b FROM pairs)
        |  GROUP BY 1),
        |ann AS (
        |  SELECT p.id, coalesce(d, 0) AS n_nbrs,
        |    coalesce(d, 0) + 1 >= 3 AS core
        |  FROM p LEFT JOIN deg ON p.id = deg.id),
        |ce AS (
        |  SELECT a, b FROM pairs
        |  JOIN ann ca ON ca.id = pairs.a AND ca.core
        |  JOIN ann cb ON cb.id = pairs.b AND cb.core),
        |e AS (SELECT a AS x, b AS y FROM ce
        |  UNION SELECT b, a FROM ce),
        |reach AS (
        |  SELECT x, y FROM e
        |  UNION
        |  SELECT r.x, e2.y FROM reach r JOIN e e2 ON e2.x = r.y),
        |comp AS (
        |  SELECT x AS id, least(x, min(y)) AS component
        |  FROM reach GROUP BY x),
        |corelab AS (
        |  SELECT ann.id, coalesce(component, ann.id) AS clust
        |  FROM ann LEFT JOIN comp ON ann.id = comp.id
        |  WHERE ann.core),
        |sym AS (
        |  SELECT a AS nid, b AS cid FROM pairs
        |  UNION ALL SELECT b, a FROM pairs),
        |borderlab AS (
        |  SELECT nid, min(clust) AS bclust
        |  FROM sym JOIN corelab ON sym.cid = corelab.id
        |  GROUP BY 1)
        |SELECT ann.id, n_nbrs,
        |  CASE WHEN core THEN 'core'
        |    WHEN bclust IS NOT NULL THEN 'border'
        |    ELSE 'noise' END AS role,
        |  CASE WHEN core THEN clust ELSE bclust END AS cluster
        |FROM ann
        |LEFT JOIN corelab ON ann.id = corelab.id
        |LEFT JOIN borderlab ON ann.id = borderlab.nid""".stripMargin,

    "q359_markov_attribution" -> markovAttributionOracleSql,

    "q360_hurst" ->
      """WITH b AS (
        |  SELECT event_type AS k, ts, event_id,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT k,
        |    row_number() OVER (PARTITION BY k ORDER BY ts, event_id)
        |      AS rk,
        |    v
        |  FROM b),
        |nn AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM r
        |  GROUP BY 1),
        |rws AS (
        |  SELECT k, w, (rk - 1) // w AS bl,
        |    rk - ((rk - 1) // w) * w AS t, rk, v
        |  FROM r, UNNEST([CAST(8 AS BIGINT), 16, 32, 64]) AS uw(w)),
        |pref AS (
        |  SELECT k, w, bl, t,
        |    sum(v) OVER (PARTITION BY k, w, bl ORDER BY rk) AS p
        |  FROM rws),
        |blocks AS (
        |  SELECT k, w, bl, count(*) AS cnt,
        |    CAST(sum(v) AS BIGINT) AS s,
        |    sum(CAST(v AS HUGEINT) * v) AS q
        |  FROM rws GROUP BY 1, 2, 3
        |  HAVING count(*) = w),
        |dev AS (
        |  SELECT pref.k, pref.w, pref.bl,
        |    pref.w * p - t * CAST(s AS BIGINT) AS z,
        |    CAST(pref.w AS HUGEINT) * q - CAST(s AS HUGEINT) * s
        |      AS vnum
        |  FROM pref JOIN blocks ON pref.k = blocks.k
        |    AND pref.w = blocks.w AND pref.bl = blocks.bl),
        |pb AS (
        |  SELECT k, w, bl,
        |    CAST(round(1e6 * CAST(max(z) - min(z) AS DOUBLE)
        |      / sqrt(CAST(max(vnum) AS DOUBLE))) AS BIGINT) AS rs
        |  FROM dev GROUP BY 1, 2, 3
        |  HAVING max(vnum) > 0),
        |ps AS (
        |  SELECT k, w, CAST(count(*) AS BIGINT) AS nb,
        |    CAST(round(CAST(sum(rs) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE)) AS BIGINT) AS avgrs
        |  FROM pb GROUP BY 1, 2),
        |pv AS (
        |  SELECT k, CAST(sum(nb) AS BIGINT) AS n_blocks,
        |    min(CASE WHEN w = 8 THEN avgrs END) AS rs8,
        |    min(CASE WHEN w = 16 THEN avgrs END) AS rs16,
        |    min(CASE WHEN w = 32 THEN avgrs END) AS rs32,
        |    min(CASE WHEN w = 64 THEN avgrs END) AS rs64
        |  FROM ps GROUP BY 1)
        |SELECT nn.k AS event_type, nn.n,
        |  rs8 AS rs8_micro, rs16 AS rs16_micro,
        |  rs32 AS rs32_micro, rs64 AS rs64_micro,
        |  coalesce(n_blocks, 0) AS n_blocks,
        |  CASE WHEN rs8 IS NOT NULL AND rs16 IS NOT NULL
        |    AND rs32 IS NOT NULL AND rs64 IS NOT NULL THEN
        |    CAST(round((-1.5 * CAST(round(1e6
        |        * ln(CAST(rs8 AS DOUBLE))) AS BIGINT)
        |      - 0.5 * CAST(round(1e6
        |        * ln(CAST(rs16 AS DOUBLE))) AS BIGINT)
        |      + 0.5 * CAST(round(1e6
        |        * ln(CAST(rs32 AS DOUBLE))) AS BIGINT)
        |      + 1.5 * CAST(round(1e6
        |        * ln(CAST(rs64 AS DOUBLE))) AS BIGINT))
        |      / 3.4657359027997265) AS BIGINT)
        |  END AS hurst_micro
        |FROM nn LEFT JOIN pv ON nn.k = pv.k""".stripMargin,

    "q361_hodges_lehmann" ->
      """WITH b AS (
        |  SELECT source AS g,
        |    CAST(round(CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) AS v,
        |    (lang = 'en') AS a, doc_id AS t
        |  FROM documents WHERE n_chars IS NOT NULL),
        |aa AS (
        |  SELECT g, v AS va FROM (
        |    SELECT g, v,
        |      row_number() OVER (PARTITION BY g ORDER BY v, t) AS rk
        |    FROM b WHERE a)
        |  WHERE rk <= 512),
        |bb AS (
        |  SELECT g, v AS vb FROM (
        |    SELECT g, v,
        |      row_number() OVER (PARTITION BY g ORDER BY v, t) AS rk
        |    FROM b WHERE NOT a)
        |  WHERE rk <= 512),
        |pairs AS (
        |  SELECT aa.g, va - vb AS d FROM aa JOIN bb ON aa.g = bb.g),
        |agg AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS gt,
        |    CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS lt
        |  FROM pairs GROUP BY 1),
        |med AS (
        |  SELECT p.g, p.d AS hl_micro FROM (
        |    SELECT g, d,
        |      row_number() OVER (PARTITION BY g ORDER BY d) AS rn
        |    FROM pairs) p
        |  JOIN agg ON p.g = agg.g AND p.rn = (agg.m + 1) // 2),
        |na AS (SELECT g, CAST(count(*) AS BIGINT) AS n_a FROM aa
        |  GROUP BY 1),
        |nb AS (SELECT g, CAST(count(*) AS BIGINT) AS n_b FROM bb
        |  GROUP BY 1)
        |SELECT agg.g AS source, n_a, n_b, hl_micro,
        |  CAST(round(1e6 * CAST(gt - lt AS DOUBLE)
        |    / CAST(m AS DOUBLE)) AS BIGINT) AS cliffs_micro
        |FROM agg JOIN med ON agg.g = med.g
        |JOIN na ON agg.g = na.g JOIN nb ON agg.g = nb.g"""
        .stripMargin,

    "q362_welch_anova" ->
      """WITH b AS (
        |  SELECT source AS g, lang AS t,
        |    CAST(round(CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM documents WHERE n_chars IS NOT NULL),
        |arms0 AS (
        |  SELECT g, t, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(v AS HUGEINT)) AS s,
        |    sum(CAST(v AS HUGEINT) * v) AS q
        |  FROM b GROUP BY 1, 2),
        |dr AS (
        |  SELECT g, CAST(sum(CASE WHEN n < 2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dropped_arms
        |  FROM arms0 GROUP BY 1),
        |arms AS (
        |  SELECT g, n,
        |    CAST(round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |      AS BIGINT) AS m,
        |    CASE WHEN n * q - s * s > 0 THEN
        |      CAST(round(1e18 * CAST(n AS DOUBLE)
        |        / (CAST(n * q - s * s AS DOUBLE)
        |          / CAST(n * (n - 1) AS DOUBLE))) AS HUGEINT)
        |    END AS w,
        |    CASE WHEN n * q - s * s > 0 THEN 0 ELSE 1 END AS zv
        |  FROM arms0 WHERE n >= 2),
        |g1 AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(zv) AS BIGINT) AS n_zerovar,
        |    sum(w) AS bigw, sum(w * m) AS swm
        |  FROM arms GROUP BY 1),
        |g2 AS (
        |  SELECT *, CAST(round(CAST(swm AS DOUBLE)
        |    / CAST(bigw AS DOUBLE)) AS BIGINT) AS mbar
        |  FROM g1),
        |terms AS (
        |  SELECT arms.g,
        |    sum(w * (CAST(m - mbar AS HUGEINT) * (m - mbar))) AS sa,
        |    sum(CAST(round(1e12
        |      * ((1.0 - CAST(w AS DOUBLE) / CAST(bigw AS DOUBLE))
        |        * (1.0 - CAST(w AS DOUBLE) / CAST(bigw AS DOUBLE)))
        |      / CAST(arms.n - 1 AS DOUBLE)) AS BIGINT)) AS sh
        |  FROM arms JOIN g2 ON arms.g = g2.g GROUP BY 1)
        |SELECT dr.g AS source, coalesce(k, 0) AS k,
        |  coalesce(g2.n, 0) AS n, n_dropped_arms,
        |  coalesce(n_zerovar, 0) AS n_zerovar,
        |  CASE WHEN k >= 2 AND n_zerovar = 0 AND sh > 0 THEN
        |    CAST(round(1e6
        |      * (CAST(sa AS DOUBLE) / 1e18 / CAST(k - 1 AS DOUBLE))
        |      / (1.0 + 2.0 * CAST(k - 2 AS DOUBLE)
        |        * (CAST(sh AS DOUBLE) / 1e12)
        |        / CAST(k * k - 1 AS DOUBLE))) AS BIGINT)
        |  END AS f_micro,
        |  CASE WHEN k >= 2 AND n_zerovar = 0 AND sh > 0 THEN
        |    CAST(round(1e6 * CAST(k * k - 1 AS DOUBLE)
        |      / (3.0 * (CAST(sh AS DOUBLE) / 1e12))) AS BIGINT)
        |  END AS df2_micro
        |FROM dr LEFT JOIN g2 ON dr.g = g2.g
        |LEFT JOIN terms ON dr.g = terms.g""".stripMargin,

    "q363_fisher_exact" -> fisherOracleSql,

    "q370_bh_fdr" ->
      s"""WITH fx AS (
         |  SELECT source, p_micro FROM ($fisherOracleSql)),
         |r AS (
         |  SELECT 'all' AS grp, source, p_micro,
         |    row_number() OVER (ORDER BY p_micro, source) AS rank,
         |    CAST(count(*) OVER () AS BIGINT) AS m
         |  FROM fx WHERE p_micro IS NOT NULL),
         |q AS (
         |  SELECT *, CAST(round(CAST(CAST(p_micro AS HUGEINT) * m
         |    AS DOUBLE) / CAST(rank AS DOUBLE)) AS BIGINT) AS qraw
         |  FROM r),
         |adj AS (
         |  SELECT *, least(1000000, min(qraw) OVER (
         |    ORDER BY rank DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |    AS q_micro
         |  FROM q)
         |SELECT grp, source, p_micro, CAST(rank AS BIGINT) AS rank,
         |  m, q_micro, q_micro <= 50000 AS rejected
         |FROM adj""".stripMargin,

    "q371_fisher_combine" ->
      s"""WITH fx AS (
         |  SELECT p_micro FROM ($fisherOracleSql)),
         |b AS (
         |  SELECT greatest(1, p_micro) AS p FROM fx
         |  WHERE p_micro IS NOT NULL)
         |SELECT 'all' AS grp, CAST(count(*) AS BIGINT) AS m,
         |  CAST(2 * count(*) AS BIGINT) AS df,
         |  CAST(-2 * sum(CAST(round(1e6
         |    * ln(CAST(p AS DOUBLE) / 1e6)) AS BIGINT)) AS BIGINT)
         |    AS chi2_micro
         |FROM b""".stripMargin,

    "q372_seasonal_strength" ->
      """WITH s AS (
        |  SELECT event_type AS k, epoch_us(ts) // 86400000000 AS d,
        |    CAST(sum(CAST(round(CAST(value AS DOUBLE) * 1e6)
        |      AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT s.k, s.d + o.o AS t2, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(s.y) AS BIGINT) AS sm
        |  FROM s, (SELECT unnest(generate_series(-3, 3)) AS o) o
        |  GROUP BY 1, 2),
        |tr AS (
        |  SELECT k, t2 AS d,
        |    CAST(round(CAST(sm AS DOUBLE) / 7.0) AS BIGINT) AS trend
        |  FROM c WHERE cnt = 7),
        |j AS (
        |  SELECT s.k, s.d, s.y, tr.trend, s.y - tr.trend AS det,
        |    ((s.d % 7) + 7) % 7 AS phase
        |  FROM s LEFT JOIN tr USING (k, d)),
        |se AS (
        |  SELECT k, phase, CAST(round(CAST(sum(det) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS seas
        |  FROM j WHERE det IS NOT NULL GROUP BY 1, 2),
        |outp AS (
        |  SELECT j.k, se.seas, j.trend,
        |    j.y - j.trend - se.seas AS resid
        |  FROM j LEFT JOIN se USING (k, phase)),
        |nall AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM outp
        |  GROUP BY 1),
        |u AS (
        |  SELECT k, resid AS r, seas + resid AS sr,
        |    trend + resid AS tr2
        |  FROM outp WHERE resid IS NOT NULL),
        |agg AS (
        |  SELECT k, CAST(count(*) AS BIGINT) AS n_used,
        |    sum(CAST(r AS HUGEINT)) AS sr1,
        |    sum(CAST(r AS HUGEINT) * r) AS qr,
        |    sum(CAST(sr AS HUGEINT)) AS ss1,
        |    sum(CAST(sr AS HUGEINT) * sr) AS qs,
        |    sum(CAST(tr2 AS HUGEINT)) AS st1,
        |    sum(CAST(tr2 AS HUGEINT) * tr2) AS qt
        |  FROM u GROUP BY 1)
        |SELECT nall.k AS event_type, n,
        |  coalesce(n_used, 0) AS n_used,
        |  CASE WHEN n_used * qs - ss1 * ss1 > 0 THEN
        |    greatest(0, CAST(round(1e6 * (1.0
        |      - CAST(n_used * qr - sr1 * sr1 AS DOUBLE)
        |      / CAST(n_used * qs - ss1 * ss1 AS DOUBLE)))
        |      AS BIGINT))
        |  END AS f_seasonal_micro,
        |  CASE WHEN n_used * qt - st1 * st1 > 0 THEN
        |    greatest(0, CAST(round(1e6 * (1.0
        |      - CAST(n_used * qr - sr1 * sr1 AS DOUBLE)
        |      / CAST(n_used * qt - st1 * st1 AS DOUBLE)))
        |      AS BIGINT))
        |  END AS f_trend_micro
        |FROM nall LEFT JOIN agg ON nall.k = agg.k""".stripMargin,

    "q373_entropy_rate" ->
      """WITH trn AS (
        |  SELECT event_type AS f,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS t
        |  FROM events),
        |cft AS (
        |  SELECT f, t, CAST(count(*) AS BIGINT) AS cft
        |  FROM trn WHERE t IS NOT NULL GROUP BY 1, 2),
        |cf AS (SELECT f, CAST(sum(cft) AS BIGINT) AS cf FROM cft
        |  GROUP BY 1),
        |j AS (SELECT cft.f, cft.cft, cf.cf FROM cft JOIN cf
        |  USING (f)),
        |tot AS (
        |  SELECT CAST(sum(cft) AS BIGINT) AS n,
        |    CAST(count(DISTINCT f) AS BIGINT) AS n_states
        |  FROM j),
        |rate AS (
        |  SELECT CAST(sum(CAST(round(1e6 * CAST(cft AS DOUBLE)
        |    * ln(CAST(cft AS DOUBLE) / CAST(cf AS DOUBLE)))
        |    AS BIGINT)) AS BIGINT) AS srate
        |  FROM j),
        |marg AS (
        |  SELECT CAST(sum(CAST(round(1e6 * CAST(c AS DOUBLE)
        |    * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))
        |    AS BIGINT)) AS BIGINT) AS smarg
        |  FROM (SELECT f, max(cf) AS c FROM j GROUP BY 1), tot)
        |SELECT n AS n_transitions, n_states,
        |  CAST(round(-CAST(srate AS DOUBLE) / CAST(n AS DOUBLE))
        |    AS BIGINT) AS h_rate_mnat,
        |  CAST(round(-CAST(smarg AS DOUBLE) / CAST(n AS DOUBLE))
        |    AS BIGINT) AS h_marginal_mnat
        |FROM tot, rate, marg""".stripMargin,

    "q374_sax_words" ->
      """WITH b AS (
        |  SELECT event_type AS k, ts, event_id,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT k,
        |    row_number() OVER (PARTITION BY k ORDER BY ts, event_id)
        |      AS rk,
        |    v
        |  FROM b),
        |tot AS (
        |  SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(v AS HUGEINT)) AS s,
        |    sum(CAST(v AS HUGEINT) * v) AS q
        |  FROM r GROUP BY 1),
        |z AS (
        |  SELECT r.k, rk,
        |    CAST(round(1000.0
        |      * CAST(CAST(v AS HUGEINT) * n - s AS DOUBLE)
        |      / sqrt(CAST(n * q - s * s AS DOUBLE))) AS BIGINT) AS z
        |  FROM r JOIN tot ON r.k = tot.k
        |  WHERE n * q - s * s > 0),
        |blocks AS (
        |  SELECT k, (rk - 1) // 5 AS bl,
        |    CAST(round(CAST(sum(z) AS DOUBLE) / 5.0) AS BIGINT)
        |      AS paa
        |  FROM z GROUP BY 1, 2 HAVING count(*) = 5),
        |sym AS (
        |  SELECT k, bl,
        |    CASE WHEN paa < -674 THEN 'a' WHEN paa < 0 THEN 'b'
        |      WHEN paa <= 674 THEN 'c' ELSE 'd' END AS s2
        |  FROM blocks),
        |words AS (
        |  SELECT k, bl // 4 AS w,
        |    min(CASE WHEN bl % 4 = 0 THEN s2 END) AS p0,
        |    min(CASE WHEN bl % 4 = 1 THEN s2 END) AS p1,
        |    min(CASE WHEN bl % 4 = 2 THEN s2 END) AS p2,
        |    min(CASE WHEN bl % 4 = 3 THEN s2 END) AS p3
        |  FROM sym GROUP BY 1, 2 HAVING count(*) = 4)
        |SELECT k AS event_type, p0 || p1 || p2 || p3 AS word,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM words GROUP BY 1, 2""".stripMargin,

    "q375_mmr_rerank" -> mmrOracleSql,

    "q381_anderson_darling" ->
      """WITH b AS (
        |  SELECT source AS g,
        |    CAST(round(CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) AS v,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
        |    doc_id AS tb
        |  FROM documents WHERE n_chars IS NOT NULL),
        |r AS (
        |  SELECT g, a,
        |    row_number() OVER (PARTITION BY g ORDER BY v, tb) AS rk,
        |    sum(a) OVER (PARTITION BY g ORDER BY v, tb
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS m
        |  FROM b),
        |tot AS (
        |  SELECT g, CAST(sum(a) AS BIGINT) AS n_a,
        |    CAST(sum(1 - a) AS BIGINT) AS n_b,
        |    CAST(count(*) AS BIGINT) AS nn
        |  FROM b GROUP BY 1
        |  HAVING sum(a) > 0 AND sum(1 - a) > 0),
        |dv AS (
        |  SELECT r.g, rk, nn,
        |    CAST(m AS HUGEINT) * nn - CAST(rk AS HUGEINT) * n_a
        |      AS dev
        |  FROM r JOIN tot ON r.g = tot.g
        |  WHERE rk < nn),
        |terms AS (
        |  SELECT g,
        |    sum(CAST(CAST(round(1e6 * CAST(dev * dev AS DOUBLE)
        |      / CAST(rk * (nn - rk) AS DOUBLE)) AS BIGINT)
        |      AS HUGEINT)) AS s
        |  FROM dv GROUP BY 1)
        |SELECT tot.g AS source, n_a, n_b,
        |  CAST(round(CAST(s AS DOUBLE)
        |    / CAST(n_a * n_b AS DOUBLE)) AS BIGINT) AS a2_micro,
        |  CAST(round(CAST(s AS DOUBLE)
        |    / CAST(n_a * n_b AS DOUBLE)) AS BIGINT) > 2492000
        |    AS significant
        |FROM tot JOIN terms ON tot.g = terms.g""".stripMargin,

    "q382_nsw_build" -> nswBuildSql,
    "q383_nsw_recall" -> nswRecallSql,

    "q384_rolling_mk" -> rollingMkOracleSql,


    "q385_jarque_bera" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |s AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(v AS HUGEINT)) AS s1,
        |    sum(CAST(v AS HUGEINT) * v) AS s2,
        |    sum(CAST(v AS HUGEINT) * v * v) AS s3,
        |    sum(CAST(v AS HUGEINT) * v * v * v) AS s4
        |  FROM b GROUP BY 1),
        |m AS (
        |  SELECT g, n, CAST(n AS DOUBLE) AS nd,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    CAST(s2 AS DOUBLE) AS d2, CAST(s3 AS DOUBLE) AS d3,
        |    CAST(s4 AS DOUBLE) AS d4
        |  FROM s),
        |c AS (
        |  SELECT g, n, nd, mu,
        |    d2 / nd - mu * mu AS m2,
        |    d3 / nd - 3.0 * mu * (d2 / nd) + 2.0 * mu * mu * mu AS m3,
        |    d4 / nd - 4.0 * mu * (d3 / nd)
        |      + 6.0 * mu * mu * (d2 / nd)
        |      - 3.0 * mu * mu * mu * mu AS m4
        |  FROM m),
        |f AS (
        |  SELECT g, n, nd, m2,
        |    m3 / sqrt(m2 * m2 * m2) AS g1,
        |    m4 / (m2 * m2) - 3.0 AS g2
        |  FROM c)
        |SELECT g AS event_type, n,
        |  CASE WHEN n >= 4 AND m2 > 0.0
        |    THEN CAST(round(1e6 * g1) AS BIGINT) END AS skew_micro,
        |  CASE WHEN n >= 4 AND m2 > 0.0
        |    THEN CAST(round(1e6 * g2) AS BIGINT) END AS exkurt_micro,
        |  CASE WHEN n >= 4 AND m2 > 0.0
        |    THEN CAST(round(1e6 * (nd * (g1 * g1 / 6.0
        |      + g2 * g2 / 24.0))) AS BIGINT) END AS jb_micro,
        |  CASE WHEN n >= 4 AND m2 > 0.0
        |    THEN CAST(round(1e6 * (nd * (g1 * g1 / 6.0
        |      + g2 * g2 / 24.0))) AS BIGINT) > 5991000 END
        |    AS reject_normal
        |FROM f""".stripMargin,

    "q386_moods_median" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |tot0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
        |med AS (
        |  SELECT v AS m FROM (
        |    SELECT v, row_number() OVER (ORDER BY v) AS rn FROM b),
        |    tot0
        |  WHERE rn = (n + 1) // 2),
        |cells AS (
        |  SELECT g,
        |    CAST(sum(CASE WHEN v > m THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN v <= m THEN 1 ELSE 0 END) AS BIGINT) AS bb
        |  FROM b, med GROUP BY 1),
        |mar AS (
        |  SELECT CAST(sum(a) AS BIGINT) AS ta,
        |    CAST(sum(bb) AS BIGINT) AS tb,
        |    CAST(count(*) AS BIGINT) AS n_groups
        |  FROM cells),
        |terms AS (
        |  SELECT CAST(round(1e6 * (
        |      (CAST(a AS DOUBLE) - CAST(a + bb AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(ta + tb AS DOUBLE))
        |        * (CAST(a AS DOUBLE) - CAST(a + bb AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(ta + tb AS DOUBLE))
        |        / (CAST(a + bb AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(ta + tb AS DOUBLE))
        |      + (CAST(bb AS DOUBLE) - CAST(a + bb AS DOUBLE) * CAST(tb AS DOUBLE) / CAST(ta + tb AS DOUBLE))
        |        * (CAST(bb AS DOUBLE) - CAST(a + bb AS DOUBLE) * CAST(tb AS DOUBLE) / CAST(ta + tb AS DOUBLE))
        |        / (CAST(a + bb AS DOUBLE) * CAST(tb AS DOUBLE) / CAST(ta + tb AS DOUBLE))))
        |    AS BIGINT) AS t
        |  FROM cells, mar WHERE a + bb > 0),
        |chi AS (SELECT CAST(sum(t) AS BIGINT) AS chi2_micro FROM terms)
        |SELECT tot0.n AS n, mar.n_groups, med.m AS median_milli,
        |  chi.chi2_micro,
        |  CASE WHEN mar.n_groups BETWEEN 2 AND 11 THEN
        |    chi.chi2_micro > ([3841459, 5991465, 7814728, 9487729,
        |      11070498, 12591587, 14067140, 15507313, 16918978,
        |      18307038])[CAST(mar.n_groups - 1 AS INTEGER)]
        |  END AS significant
        |FROM tot0, mar, med, chi""".stripMargin,

    "q387_slope_one" ->
      """WITH raw AS (
        |  SELECT user_id AS actor, event_type AS item,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS r
        |  FROM events
        |  WHERE event_id % 11 = 0 AND user_id IS NOT NULL
        |    AND event_type IS NOT NULL AND value IS NOT NULL),
        |ai AS (
        |  SELECT actor, item,
        |    CAST(round(CAST(sum(r) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE)) AS BIGINT) AS r
        |  FROM raw GROUP BY 1, 2),
        |kept AS (
        |  SELECT * FROM ai WHERE actor IN (
        |    SELECT actor FROM ai GROUP BY actor
        |    HAVING count(*) <= 5)),
        |devs AS (
        |  SELECT a.item AS i, b.item AS j,
        |    CAST(sum(a.r - b.r) AS BIGINT) AS sumdev,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM kept a JOIN kept b ON a.actor = b.actor
        |    AND a.item <> b.item
        |  GROUP BY 1, 2),
        |contrib AS (
        |  SELECT k.actor, d.i,
        |    d.sumdev + d.c * k.r AS num, d.c
        |  FROM kept k JOIN devs d ON d.j = k.item),
        |unrated AS (
        |  SELECT c.actor, c.i, c.num, c.c FROM contrib c
        |  LEFT JOIN kept k ON k.actor = c.actor AND k.item = c.i
        |  WHERE k.item IS NULL)
        |SELECT actor AS user_id, i AS event_type,
        |  CAST(round(CAST(sum(num) AS DOUBLE)
        |    / CAST(sum(c) AS DOUBLE)) AS BIGINT) AS pred_micro,
        |  CAST(count(*) AS BIGINT) AS n_pairs
        |FROM unrated GROUP BY 1, 2""".stripMargin,

    "q388_esd_outliers" -> esdOracleSql(3, 2000000L),

    "q389_periodogram" -> periodogramSql,

    "q392_jonckheere" ->
      """WITH b AS (
        |  SELECT CAST(l_linenumber AS BIGINT) AS g,
        |    CAST(round(CAST(l_quantity AS DOUBLE) * 1e6) AS BIGINT)
        |      AS v
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_linenumber IS NOT NULL),
        |gs AS (SELECT DISTINCT g FROM b),
        |pr AS (
        |  SELECT CAST(least(b.g, o.g) AS VARCHAR) || '|'
        |      || CAST(greatest(b.g, o.g) AS VARCHAR) AS pk,
        |    b.g > o.g AS a, b.v
        |  FROM b JOIN gs o ON b.g <> o.g),
        |cells AS (
        |  SELECT pk, v,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cb,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM pr GROUP BY 1, 2),
        |run AS (
        |  SELECT pk, ca, c,
        |    sum(c) OVER (PARTITION BY pk ORDER BY v) - c AS r
        |  FROM cells),
        |pp AS (
        |  SELECT pk, CAST(sum(ca) AS BIGINT) AS na,
        |    sum(CAST(ca AS HUGEINT) * (2 * r + c + 1)) AS r2a
        |  FROM run GROUP BY 1),
        |jt AS (
        |  SELECT sum(r2a - CAST(na AS HUGEINT) * (na + 1)) AS jt2
        |  FROM pp),
        |sz AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    sum(CAST(n AS HUGEINT) * n) AS sq,
        |    sum(CAST(n AS HUGEINT) * n * (2 * n + 3)) AS cu,
        |    CAST(count(*) AS BIGINT) AS k_groups
        |  FROM (SELECT g, CAST(count(*) AS BIGINT) AS n
        |        FROM b GROUP BY 1)),
        |f AS (
        |  SELECT k_groups, nn, jt2,
        |    (nn * nn - CAST(sq AS BIGINT)) // 2 AS mean2,
        |    CAST(CAST(nn AS HUGEINT) * nn - sq AS DOUBLE) AS mean2d,
        |    (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
        |      * (2.0 * CAST(nn AS DOUBLE) + 3.0)
        |      - CAST(cu AS DOUBLE)) / 72.0 AS vard
        |  FROM jt, sz)
        |SELECT k_groups, nn AS n, CAST(jt2 AS BIGINT) AS jt2, mean2,
        |  CASE WHEN vard > 0.0
        |    THEN CAST(round(1e6 * ((CAST(jt2 AS DOUBLE) - mean2d / 2.0)
        |      / (2.0 * sqrt(vard)))) AS BIGINT) END AS z_micro,
        |  CASE WHEN vard > 0.0
        |    THEN abs(CAST(round(1e6 * ((CAST(jt2 AS DOUBLE)
        |      - mean2d / 2.0) / (2.0 * sqrt(vard)))) AS BIGINT))
        |      > 1959964 END AS significant
        |FROM f""".stripMargin,

    "q393_moment_fit" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |s AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN v <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_nonpos,
        |    sum(CAST(v AS HUGEINT)) AS s1,
        |    sum(CAST(v AS HUGEINT) * v) AS s2,
        |    sum(CASE WHEN v > 0 THEN CAST(v AS HUGEINT) ELSE 0 END)
        |      AS p1,
        |    sum(CASE WHEN v > 0 THEN CAST(v AS HUGEINT) * v ELSE 0 END)
        |      AS p2,
        |    CAST(sum(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS np,
        |    sum(CASE WHEN v > 0 THEN CAST(round(1e6
        |      * ln(CAST(v AS DOUBLE) / 1e3)) AS HUGEINT) ELSE 0 END)
        |      AS l1,
        |    sum(CASE WHEN v > 0 THEN CAST(round(1e6
        |        * ln(CAST(v AS DOUBLE) / 1e3)) AS HUGEINT)
        |      * CAST(round(1e6 * ln(CAST(v AS DOUBLE) / 1e3))
        |        AS HUGEINT) ELSE 0 END) AS l2
        |  FROM b GROUP BY 1),
        |m AS (
        |  SELECT g, n, n_nonpos, np,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1e3 AS mean,
        |    (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
        |        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) / 1e6
        |      AS vr,
        |    CAST(p1 AS DOUBLE) / CAST(np AS DOUBLE) / 1e3 AS pm,
        |    (CAST(p2 AS DOUBLE) / CAST(np AS DOUBLE)
        |      - CAST(p1 AS DOUBLE) / CAST(np AS DOUBLE)
        |        * (CAST(p1 AS DOUBLE) / CAST(np AS DOUBLE))) / 1e6
        |      AS pv,
        |    CAST(l1 AS DOUBLE) / CAST(np AS DOUBLE) / 1e6 AS muln,
        |    (CAST(l2 AS DOUBLE) / CAST(np AS DOUBLE)
        |      - CAST(l1 AS DOUBLE) / CAST(np AS DOUBLE)
        |        * (CAST(l1 AS DOUBLE) / CAST(np AS DOUBLE))) / 1e12
        |      AS vln
        |  FROM s)
        |SELECT g AS event_type, n, n_nonpos,
        |  CAST(round(1e6 * mean) AS BIGINT) AS mean_micro,
        |  CAST(round(1e6 * vr) AS BIGINT) AS var_micro,
        |  CASE WHEN np >= 2 AND pv > 0.0 AND vln > 0.0
        |    THEN CAST(round(1e6 * (pm * pm / pv)) AS BIGINT) END
        |    AS gamma_shape_micro,
        |  CASE WHEN np >= 2 AND pv > 0.0 AND vln > 0.0
        |    THEN CAST(round(1e6 * (pv / pm)) AS BIGINT) END
        |    AS gamma_scale_micro,
        |  CASE WHEN np >= 2 AND pv > 0.0 AND vln > 0.0
        |    THEN CAST(round(1e6 * muln) AS BIGINT) END
        |    AS lnorm_mu_micro,
        |  CASE WHEN np >= 2 AND pv > 0.0 AND vln > 0.0
        |    THEN CAST(round(1e6 * sqrt(vln)) AS BIGINT) END
        |    AS lnorm_sigma_micro
        |FROM m""".stripMargin,

    "q394_distinct_ngrams" ->
      """WITH d AS (
        |  SELECT source AS g,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> len(t) > 0) AS t
        |  FROM documents),
        |spine AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN len(t) < 3 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_short
        |  FROM d GROUP BY 1),
        |grams AS (
        |  SELECT g, unnest(list_transform(generate_series(1,
        |      len(t) - 2),
        |    i -> array_to_string(list_slice(t, i, i + 2), ' ')))
        |    AS ng
        |  FROM d WHERE len(t) >= 3),
        |st AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(count(DISTINCT ng) AS BIGINT) AS n_distinct
        |  FROM grams GROUP BY 1)
        |SELECT spine.g AS source, n_docs, n_short,
        |  COALESCE(n_grams, 0) AS n_grams,
        |  COALESCE(n_distinct, 0) AS n_distinct,
        |  CASE WHEN n_grams IS NOT NULL
        |    THEN CAST(round(1e6 * CAST(n_distinct AS DOUBLE)
        |      / CAST(n_grams AS DOUBLE)) AS BIGINT) END
        |    AS distinct_ratio_micro
        |FROM spine LEFT JOIN st ON spine.g = st.g""".stripMargin,

    "q395_ps_match" ->
      """WITH b AS (
        |  SELECT event_id AS id, user_id % 2 = 0 AS t,
        |    CAST(round(CAST(value AS DOUBLE) / 200.0 * 1e6) AS BIGINT)
        |      AS s
        |  FROM events WHERE value IS NOT NULL),
        |ctrl AS (
        |  SELECT id AS ctrl_id, s AS cs, s // 50000 AS bkt
        |  FROM b WHERE NOT t),
        |pro AS (
        |  SELECT id, s, s // 50000 + d.o AS bkt
        |  FROM b, (SELECT unnest([-1, 0, 1]) AS o) d WHERE t),
        |cand AS (
        |  SELECT p.id, p.s, c.ctrl_id, c.cs
        |  FROM pro p JOIN ctrl c USING (bkt)
        |  WHERE abs(p.s - c.cs) <= 50000),
        |best AS (
        |  SELECT id, s, ctrl_id, cs FROM (
        |    SELECT id, s, ctrl_id, cs,
        |      row_number() OVER (PARTITION BY id
        |        ORDER BY abs(s - cs), ctrl_id) AS rn
        |    FROM cand)
        |  WHERE rn = 1)
        |SELECT id AS event_id, ctrl_id, s AS t_score_micro,
        |  cs AS c_score_micro, s - cs AS diff_micro
        |FROM best""".stripMargin,

    "q396_diff_in_diff" ->
      """WITH b AS (
        |  SELECT user_id % 2 = 0 AS a, event_id % 3 = 0 AS p,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |s AS (
        |  SELECT
        |    CAST(sum(CASE WHEN a AND NOT p THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_t_pre,
        |    CAST(sum(CASE WHEN a AND p THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_t_post,
        |    CAST(sum(CASE WHEN NOT a AND NOT p THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_c_pre,
        |    CAST(sum(CASE WHEN NOT a AND p THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_c_post,
        |    sum(CASE WHEN a AND NOT p THEN CAST(v AS HUGEINT)
        |      ELSE 0 END) AS stp0,
        |    sum(CASE WHEN a AND p THEN CAST(v AS HUGEINT) ELSE 0 END)
        |      AS stp1,
        |    sum(CASE WHEN NOT a AND NOT p THEN CAST(v AS HUGEINT)
        |      ELSE 0 END) AS scp0,
        |    sum(CASE WHEN NOT a AND p THEN CAST(v AS HUGEINT)
        |      ELSE 0 END) AS scp1
        |  FROM b)
        |SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
        |  CASE WHEN n_t_pre > 0 THEN CAST(round(CAST(stp0 AS DOUBLE)
        |    / CAST(n_t_pre AS DOUBLE)) AS BIGINT) END
        |    AS mean_t_pre_micro,
        |  CASE WHEN n_t_post > 0 THEN CAST(round(CAST(stp1 AS DOUBLE)
        |    / CAST(n_t_post AS DOUBLE)) AS BIGINT) END
        |    AS mean_t_post_micro,
        |  CASE WHEN n_c_pre > 0 THEN CAST(round(CAST(scp0 AS DOUBLE)
        |    / CAST(n_c_pre AS DOUBLE)) AS BIGINT) END
        |    AS mean_c_pre_micro,
        |  CASE WHEN n_c_post > 0 THEN CAST(round(CAST(scp1 AS DOUBLE)
        |    / CAST(n_c_post AS DOUBLE)) AS BIGINT) END
        |    AS mean_c_post_micro,
        |  CASE WHEN n_t_pre > 0 AND n_t_post > 0 AND n_c_pre > 0
        |      AND n_c_post > 0
        |    THEN CAST(round(CAST(stp1 AS DOUBLE)
        |        / CAST(n_t_post AS DOUBLE)
        |      - CAST(stp0 AS DOUBLE) / CAST(n_t_pre AS DOUBLE)
        |      - (CAST(scp1 AS DOUBLE) / CAST(n_c_post AS DOUBLE)
        |        - CAST(scp0 AS DOUBLE) / CAST(n_c_pre AS DOUBLE)))
        |      AS BIGINT) END AS did_micro
        |FROM s""".stripMargin,

    "q397_ipw_ate" ->
      """WITH b AS (
        |  SELECT user_id % 2 = 0 AS t,
        |    CAST(round(CAST(CAST(user_id % 10 + 1 AS DOUBLE) / 20.0
        |      AS DOUBLE) * 1e6) AS BIGINT) AS e,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS y
        |  FROM events),
        |drp AS (
        |  SELECT CAST(sum(CASE WHEN e IS NULL OR y IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped FROM b),
        |c AS (
        |  SELECT t,
        |    e < 10000 OR e > 990000 AS clipped,
        |    least(greatest(e, 10000), 990000) AS ec, y
        |  FROM b WHERE e IS NOT NULL AND y IS NOT NULL),
        |w AS (
        |  SELECT t, clipped,
        |    CASE WHEN t THEN CAST(round(1e6
        |        / (CAST(ec AS DOUBLE) / 1e6)) AS BIGINT)
        |      ELSE CAST(round(1e6 / (1.0 - CAST(ec AS DOUBLE) / 1e6))
        |        AS BIGINT) END AS w,
        |    CASE WHEN t THEN CAST(round(CAST(y AS DOUBLE)
        |        / (CAST(ec AS DOUBLE) / 1e6)) AS BIGINT)
        |      ELSE CAST(round(CAST(y AS DOUBLE)
        |        / (1.0 - CAST(ec AS DOUBLE) / 1e6)) AS BIGINT) END
        |      AS wy
        |  FROM c),
        |agg AS (
        |  SELECT
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_treat,
        |    CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_ctrl,
        |    CAST(sum(CASE WHEN clipped THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_clipped,
        |    sum(CASE WHEN t THEN CAST(w AS HUGEINT) ELSE 0 END)
        |      AS wt,
        |    sum(CASE WHEN t THEN CAST(wy AS HUGEINT) ELSE 0 END)
        |      AS wyt,
        |    sum(CASE WHEN NOT t THEN CAST(w AS HUGEINT) ELSE 0 END)
        |      AS wc,
        |    sum(CASE WHEN NOT t THEN CAST(wy AS HUGEINT) ELSE 0 END)
        |      AS wyc
        |  FROM w)
        |SELECT n_treat, n_ctrl, n_clipped, drp.n_dropped,
        |  CASE WHEN n_treat > 0 AND n_ctrl > 0
        |    THEN CAST(round(CAST(wyt AS DOUBLE) / CAST(wt AS DOUBLE)
        |        * 1e6
        |      - CAST(wyc AS DOUBLE) / CAST(wc AS DOUBLE) * 1e6)
        |      AS BIGINT) END AS ate_micro
        |FROM agg, drp""".stripMargin,

    "q398_range_join" ->
      """WITH p AS (
        |  SELECT event_id,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |b AS (
        |  SELECT i AS band_id, i * 5000 AS lo, i * 5000 + 12000 AS hi
        |  FROM (SELECT unnest(generate_series(0, 59)) AS i))
        |SELECT p.event_id, b.band_id, p.v, b.lo, b.hi
        |FROM p, b
        |WHERE p.v >= 0 AND p.v >= b.lo AND p.v <= b.hi""".stripMargin,

    "q399_overlap_join" ->
      """WITH iv AS (
        |  SELECT user_id * 100000 + epoch_ms(ts) // 86400000 AS iid,
        |    CAST(min(epoch_ms(ts)) AS BIGINT) AS lo,
        |    CAST(max(epoch_ms(ts)) AS BIGINT) AS hi
        |  FROM events
        |  GROUP BY user_id, epoch_ms(ts) // 86400000)
        |SELECT a.iid AS a_id, b.iid AS b_id,
        |  least(a.hi, b.hi) - greatest(a.lo, b.lo) AS overlap_len
        |FROM iv a, iv b
        |WHERE a.lo <= b.hi AND b.lo <= a.hi AND a.iid < b.iid"""
        .stripMargin,

    // Replays the q400 fixture (same record strings, string_agg in
    // doc order), then parses by splitting on the full record
    // boundary (sound here: payloads are CR-scrubbed doc text) and
    // extracting each block via its declared Content-Length — the
    // same chars the Spark side's offset walk yields.
    "q400_warc_parse" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    replace(substr(text, 1, 400), chr(13), ' ') AS txt
        |  FROM documents WHERE doc_id % 7 = 0),
        |r0 AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 3 = 0 THEN 'resource'
        |         ELSE 'response' END AS typ,
        |    CASE WHEN doc_id % 3 = 0 THEN txt
        |      ELSE 'HTTP/1.1 ' ||
        |        CASE WHEN doc_id % 5 = 0 THEN '404 Not Found'
        |             ELSE '200 OK' END ||
        |        e'\r\nContent-Type: text/plain\r\n\r\n' || txt
        |      END AS block
        |  FROM d),
        |recs AS (
        |  SELECT source, doc_id,
        |    e'WARC/1.0\r\nWARC-Type: ' || typ ||
        |    e'\r\nWARC-Target-URI: https://' || source ||
        |    '.example.com/doc/' || CAST(doc_id AS VARCHAR) ||
        |    e'\r\nWARC-Record-ID: <urn:uuid:' ||
        |    CAST(doc_id AS VARCHAR) || e'>\r\nContent-Length: ' ||
        |    CAST(length(block) AS VARCHAR) || e'\r\n\r\n' || block ||
        |    e'\r\n\r\n' AS rec
        |  FROM r0),
        |sh AS (
        |  SELECT source,
        |    e'WARC/1.0\r\nWARC-Type: warcinfo\r\n' ||
        |    'WARC-Record-ID: <urn:uuid:shard-' || source ||
        |    e'>\r\nContent-Length: ' ||
        |    CAST(length('software: graft/0.1' || chr(10) ||
        |      'isPartOf: ' || source) AS VARCHAR) || e'\r\n\r\n' ||
        |    'software: graft/0.1' || chr(10) || 'isPartOf: ' ||
        |    source || e'\r\n\r\n' ||
        |    string_agg(rec, '' ORDER BY doc_id) AS blob
        |  FROM recs GROUP BY source),
        |p AS (
        |  SELECT source,
        |    string_split(replace(blob, e'\r\n\r\nWARC/1.0\r\n',
        |      chr(30) || e'WARC/1.0\r\n'), chr(30)) AS parts
        |  FROM sh),
        |rp AS (
        |  SELECT source, i - 1 AS rec_idx, parts[CAST(i AS INT)] AS part
        |  FROM p, UNNEST(generate_series(1, len(parts))) AS u(i)),
        |hx AS (
        |  SELECT source, rec_idx,
        |    split_part(part, e'\r\n\r\n', 1) AS hdr,
        |    substr(part,
        |      length(split_part(part, e'\r\n\r\n', 1)) + 5) AS rest
        |  FROM rp),
        |cl AS (
        |  SELECT source, rec_idx, hdr, rest,
        |    CAST(regexp_extract(hdr,
        |      '(?im)^Content-Length:[ \t]*([0-9]+)', 1) AS BIGINT)
        |      AS content_length
        |  FROM hx),
        |fx AS (
        |  SELECT source, rec_idx, content_length,
        |    regexp_extract(hdr, '(?im)^WARC-Type:[ \t]*(\S+)', 1)
        |      AS warc_type,
        |    nullif(regexp_extract(hdr,
        |      '(?im)^WARC-Target-URI:[ \t]*(\S+)', 1), '')
        |      AS target_uri,
        |    nullif(regexp_extract(hdr,
        |      '(?im)^WARC-Record-ID:[ \t]*(\S+)', 1), '')
        |      AS record_id,
        |    substr(rest, 1, content_length) AS block
        |  FROM cl),
        |bd AS (
        |  SELECT source, rec_idx, warc_type, target_uri, record_id,
        |    content_length,
        |    CASE WHEN warc_type = 'response' AND block LIKE 'HTTP/%'
        |      THEN CAST(regexp_extract(block,
        |        '^HTTP/[0-9.]+ ([0-9]{3})', 1) AS BIGINT)
        |      END AS http_status,
        |    CASE WHEN warc_type = 'response' AND block LIKE 'HTTP/%'
        |      THEN substr(block, strpos(block, e'\r\n\r\n') + 4)
        |      ELSE block END AS body
        |  FROM fx)
        |SELECT source, rec_idx, warc_type, target_uri, record_id,
        |  content_length, http_status,
        |  CAST(length(body) AS BIGINT) AS body_chars,
        |  md5(body) AS body_md5
        |FROM bd"""
        .stripMargin,

    // Generative twin of the q439 byte-shard fixture: strlen() is
    // DuckDB's OCTET length (length() is chars), so content_length /
    // body_bytes count the same UTF-8 octets the Spark parser must
    // walk to land each record boundary.
    "q439_warc_bytes" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    'Ünïcødé§' || repeat('π✓', CAST(doc_id % 4 AS INT)) ||
        |      replace(substr(text, 1, 200), chr(13), ' ') AS txt
        |  FROM documents WHERE doc_id % 7 = 3),
        |r0 AS (
        |  SELECT doc_id, source, txt,
        |    CASE WHEN doc_id % 3 = 0 THEN 'resource'
        |         ELSE 'response' END AS typ,
        |    CASE WHEN doc_id % 3 = 0 THEN txt
        |      ELSE 'HTTP/1.1 ' ||
        |        CASE WHEN doc_id % 5 = 0 THEN '404 Not Found'
        |             ELSE '200 OK' END ||
        |        e'\r\nContent-Type: text/plain\r\n\r\n' || txt
        |      END AS block
        |  FROM d),
        |recs AS (
        |  SELECT source, doc_id, typ, block, txt AS body,
        |    CASE WHEN typ = 'response' THEN
        |      CASE WHEN doc_id % 5 = 0 THEN 404 ELSE 200 END
        |      END AS http_status,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id)
        |      AS rn
        |  FROM r0),
        |info AS (
        |  SELECT DISTINCT source,
        |    'software: graft/0.1' || chr(10) || 'isPartOf: ' ||
        |      source AS inf
        |  FROM d)
        |SELECT source, CAST(0 AS BIGINT) AS rec_idx,
        |  'warcinfo' AS warc_type,
        |  CAST(NULL AS VARCHAR) AS target_uri,
        |  '<urn:uuid:shard-' || source || '>' AS record_id,
        |  CAST(strlen(inf) AS BIGINT) AS content_length,
        |  CAST(NULL AS BIGINT) AS http_status,
        |  CAST(strlen(inf) AS BIGINT) AS body_bytes,
        |  md5(inf) AS body_md5
        |FROM info
        |UNION ALL
        |SELECT source, rn AS rec_idx, typ AS warc_type,
        |  'https://' || source || '.example.com/doc/' ||
        |    CAST(doc_id AS VARCHAR) AS target_uri,
        |  '<urn:uuid:' || CAST(doc_id AS VARCHAR) || '>' AS record_id,
        |  CAST(strlen(block) AS BIGINT) AS content_length,
        |  CAST(http_status AS BIGINT) AS http_status,
        |  CAST(strlen(body) AS BIGINT) AS body_bytes,
        |  md5(body) AS body_md5
        |FROM recs""".stripMargin,

    "q440_fleiss_kappa" ->
      """WITH b AS (
        |  SELECT event_type AS g, user_id AS item,
        |    abs(CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT))
        |      % 3 AS cat
        |  FROM events WHERE value IS NOT NULL),
        |icnt AS (
        |  SELECT g, item, CAST(count(*) AS BIGINT) AS cnt
        |  FROM b GROUP BY 1, 2),
        |md AS (
        |  SELECT g, cnt AS m FROM (
        |    SELECT g, cnt, count(*) AS n_items
        |    FROM icnt GROUP BY 1, 2)
        |  QUALIFY row_number() OVER (PARTITION BY g
        |    ORDER BY n_items DESC, cnt DESC) = 1),
        |kept AS (
        |  SELECT icnt.g, icnt.item
        |  FROM icnt JOIN md ON icnt.g = md.g AND icnt.cnt = md.m
        |  WHERE md.m >= 2),
        |dropped AS (
        |  SELECT icnt.g,
        |    CAST(sum(CASE WHEN kept.item IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_dropped_items
        |  FROM icnt LEFT JOIN kept
        |    ON icnt.g = kept.g AND icnt.item = kept.item
        |  GROUP BY 1),
        |cells AS (
        |  SELECT b.g, b.item, b.cat, CAST(count(*) AS BIGINT) AS nij
        |  FROM b JOIN kept ON b.g = kept.g AND b.item = kept.item
        |  GROUP BY 1, 2, 3),
        |s AS (
        |  SELECT g, CAST(count(DISTINCT item) AS BIGINT) AS n_items,
        |    CAST(sum(nij * (nij - 1)) AS BIGINT) AS ss
        |  FROM cells GROUP BY 1),
        |cmar AS (
        |  SELECT g, CAST(sum(CAST(cj AS HUGEINT) * cj) AS HUGEINT)
        |    AS cc
        |  FROM (
        |    SELECT g, cat, CAST(sum(nij) AS BIGINT) AS cj
        |    FROM cells GROUP BY 1, 2)
        |  GROUP BY 1),
        |k AS (
        |  SELECT s.g, s.n_items, md.m, cmar.cc, s.ss,
        |    CAST(s.n_items AS HUGEINT) * md.m AS nm
        |  FROM s JOIN md ON s.g = md.g JOIN cmar ON s.g = cmar.g),
        |r AS (
        |  SELECT g, n_items, m,
        |    CAST(ss AS HUGEINT) * nm * nm - cc * nm * (m - 1) AS num,
        |    CAST(nm AS HUGEINT) * (m - 1) * (nm * nm - cc) AS den
        |  FROM k)
        |SELECT r.g AS event_type, r.n_items, CAST(r.m AS BIGINT) AS m,
        |  d.n_dropped_items,
        |  CASE WHEN den > 0 THEN CAST(
        |    CASE WHEN num < 0 THEN
        |      -((2000000 * (-num) + den) // (2 * den))
        |    ELSE (2000000 * num + den) // (2 * den) END AS BIGINT)
        |  END AS kappa_micro
        |FROM r JOIN dropped d ON r.g = d.g""".stripMargin,

    "q441_matthews" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    event_id % 3 = 0 AS p,
        |    (user_id + event_id) % 2 = 0 AS y
        |  FROM events),
        |c AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN p AND y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS tp,
        |    CAST(sum(CASE WHEN p AND NOT y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN NOT p AND y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN NOT p AND NOT y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tn
        |  FROM b GROUP BY 1),
        |m AS (
        |  SELECT g, n, tp, fp, fn, tn,
        |    CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn
        |      AS num,
        |    CAST(tp + fp AS HUGEINT) * (tp + fn) * (tn + fp)
        |      * (tn + fn) AS dd
        |  FROM c),
        |q AS (
        |  SELECT g, n, tp, fp, fn, tn, num,
        |    CASE WHEN dd > 0 THEN
        |      (CAST(4000000000000 AS HUGEINT) * num * num) // dd
        |    END AS q4
        |  FROM m),
        |sq AS (
        |  SELECT *, CAST(floor(sqrt(CAST(q4 AS DOUBLE))) AS HUGEINT)
        |    AS u0
        |  FROM q),
        |iq AS (
        |  SELECT g, n, tp, fp, fn, tn, num, q4,
        |    u0 + CASE WHEN (u0 + 2) * (u0 + 2) <= q4 THEN 2
        |      WHEN (u0 + 1) * (u0 + 1) <= q4 THEN 1
        |      WHEN u0 * u0 <= q4 THEN 0
        |      WHEN (u0 - 1) * (u0 - 1) <= q4 THEN -1 ELSE -2 END AS u
        |  FROM sq)
        |SELECT g AS event_type, n, tp, fp, fn, tn,
        |  CASE WHEN q4 IS NOT NULL THEN CAST(CASE WHEN num < 0
        |    THEN -((u + 1) // 2) ELSE (u + 1) // 2 END AS BIGINT)
        |  END AS mcc_micro
        |FROM iq""".stripMargin,

    "q442_youden_j" ->
      """WITH e AS (
        |  SELECT (user_id + event_id) % 2 = 0 AS y, value,
        |    (epoch_ms(ts) // 3600000) % 24 AS hour,
        |    user_id % 100 AS residue
        |  FROM events),
        |m AS (
        |  SELECT 'value' AS feature,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS v,
        |    CASE WHEN y THEN 1 ELSE 0 END AS yy
        |  FROM e WHERE value IS NOT NULL
        |  UNION ALL
        |  SELECT 'hour',
        |    CAST(round(CAST(hour AS DOUBLE) * 1e3) AS BIGINT),
        |    CASE WHEN y THEN 1 ELSE 0 END
        |  FROM e
        |  UNION ALL
        |  SELECT 'residue',
        |    CAST(round(CAST(residue AS DOUBLE) * 1e3) AS BIGINT),
        |    CASE WHEN y THEN 1 ELSE 0 END
        |  FROM e),
        |cells AS (
        |  SELECT feature, v, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(yy) AS BIGINT) AS p
        |  FROM m GROUP BY 1, 2),
        |run AS (
        |  SELECT feature, v, n, p,
        |    CAST(sum(n) OVER w AS BIGINT) AS cn,
        |    CAST(sum(p) OVER w AS BIGINT) AS cp
        |  FROM cells
        |  WINDOW w AS (PARTITION BY feature ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (
        |  SELECT feature, CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum(p) AS BIGINT) AS pp
        |  FROM cells GROUP BY 1
        |  HAVING sum(p) > 0 AND sum(n) > sum(p)),
        |sc AS (
        |  SELECT run.feature, run.v, run.cn, run.cp, tot.nn, tot.pp,
        |    CAST(pp - cp AS HUGEINT) * (nn - pp)
        |      - CAST((nn - pp) - (cn - cp) AS HUGEINT) * pp AS jnum,
        |    CAST(pp AS HUGEINT) * (nn - pp) AS jden
        |  FROM run JOIN tot USING (feature)
        |  WHERE run.cn < tot.nn),
        |el AS (
        |  SELECT feature, nn, pp, v, cn, cp, jnum, jden
        |  FROM sc
        |  QUALIFY row_number() OVER (PARTITION BY feature
        |    ORDER BY jnum DESC, v) = 1)
        |SELECT feature, nn AS n, pp AS pos, v AS threshold_milli,
        |  CAST(CASE WHEN jnum < 0 THEN
        |      -((2000000 * (-jnum) + jden) // (2 * jden))
        |    ELSE (2000000 * jnum + jden) // (2 * jden) END AS BIGINT)
        |    AS j_micro,
        |  CAST((2000000 * CAST(pp - cp AS HUGEINT) + pp)
        |    // (2 * CAST(pp AS HUGEINT)) AS BIGINT) AS tpr_micro,
        |  CAST((2000000 * CAST((nn - pp) - (cn - cp) AS HUGEINT)
        |    + (nn - pp)) // (2 * CAST(nn - pp AS HUGEINT)) AS BIGINT)
        |    AS fpr_micro,
        |  cn AS n_le, cp AS pos_le
        |FROM el""".stripMargin,

    "q443_siegel_tukey" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS v,
        |    event_id AS tb, user_id % 2 = 0 AS arm
        |  FROM events WHERE value IS NOT NULL),
        |rk AS (
        |  SELECT g, v, tb, arm,
        |    row_number() OVER (PARTITION BY g ORDER BY v, tb) AS i,
        |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM b),
        |st AS (
        |  SELECT g, arm, n,
        |    CASE WHEN i < n + 1 - i THEN
        |           CASE WHEN i % 2 = 1 THEN 2 * i - 1 ELSE 2 * i END
        |         WHEN n + 1 - i < i THEN
        |           CASE WHEN (n + 1 - i) % 2 = 1 THEN 2 * (n + 1 - i)
        |                ELSE 2 * (n + 1 - i) - 1 END
        |         ELSE n END AS str
        |  FROM rk),
        |agg AS (
        |  SELECT g, max(n) AS n,
        |    CAST(sum(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT)
        |      AS na,
        |    CAST(sum(CASE WHEN arm THEN 0 ELSE 1 END) AS BIGINT)
        |      AS nb,
        |    CAST(sum(CASE WHEN arm THEN str ELSE 0 END) AS BIGINT)
        |      AS w
        |  FROM st GROUP BY 1),
        |d AS (
        |  SELECT g, n, na, nb, w,
        |    2 * w - na * (n + 1) AS d2,
        |    CASE WHEN na > 0 AND nb > 0 THEN
        |      (CAST(12000000000000 AS HUGEINT)
        |        * (2 * w - na * (n + 1)) * (2 * w - na * (n + 1)))
        |        // (CAST(na AS HUGEINT) * nb * (n + 1)) END AS q4
        |  FROM agg),
        |sq AS (
        |  SELECT *, CAST(floor(sqrt(CAST(q4 AS DOUBLE))) AS HUGEINT)
        |    AS u0
        |  FROM d),
        |iq AS (
        |  SELECT g, na, nb, w, d2, q4,
        |    u0 + CASE WHEN (u0 + 2) * (u0 + 2) <= q4 THEN 2
        |      WHEN (u0 + 1) * (u0 + 1) <= q4 THEN 1
        |      WHEN u0 * u0 <= q4 THEN 0
        |      WHEN (u0 - 1) * (u0 - 1) <= q4 THEN -1 ELSE -2 END AS u
        |  FROM sq)
        |SELECT g AS event_type, na AS n_a, nb AS n_b, w,
        |  CASE WHEN q4 IS NOT NULL THEN CAST(CASE WHEN d2 < 0
        |    THEN -((u + 1) // 2) ELSE (u + 1) // 2 END AS BIGINT)
        |  END AS z_micro
        |FROM iq""".stripMargin,

    // The whole refresh recomputed set-theoretically: q94's
    // incremental-dedup chain (bands/sets verbatim) ∩ the rule-filter
    // keeps = survivors; rollup/CDF/index legs derive from the
    // survivor set directly, so every Spark-side txn mechanism
    // (commitMulti, read-back, tableChanges, the rollup fold, frozen
    // centroids) must reproduce plain relational algebra.
    "q446_corpus_refresh" ->
      s"""WITH bands AS MATERIALIZED ($minhashBandsSql),
         |newb AS (SELECT * FROM bands WHERE doc_id % 5 <> 0),
         |oldb AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
         |sets AS MATERIALIZED (${shingleSetsSql("")}),
         |cand_c AS (
         |  SELECT DISTINCT n.doc_id AS nid, o.doc_id AS oid
         |  FROM newb n JOIN oldb o
         |    ON n.band_id = o.band_id AND n.band_key = o.band_key),
         |ver_c AS (
         |  SELECT c.nid FROM cand_c c
         |  JOIN sets sa ON sa.doc_id = c.nid
         |  JOIN sets sb ON sb.doc_id = c.oid
         |  WHERE len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
         |    AND CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |        / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE)
         |        >= 0.6),
         |cand_b AS (
         |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |  FROM newb l JOIN newb r
         |    ON l.band_id = r.band_id AND l.band_key = r.band_key
         |  WHERE l.doc_id < r.doc_id),
         |ver_b AS (
         |  SELECT c.b FROM cand_b c
         |  JOIN sets sa ON sa.doc_id = c.a
         |  JOIN sets sb ON sb.doc_id = c.b
         |  WHERE len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
         |    AND CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |        / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE)
         |        >= 0.6),
         |dupd AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT nid AS doc_id FROM ver_c
         |    UNION ALL SELECT b AS doc_id FROM ver_b)),
         |batch AS MATERIALIZED (
         |  SELECT doc_id, source, text FROM documents WHERE doc_id % 5 <> 0),
         |${ruleFilterChainSql("batch")},
         |surv AS MATERIALIZED (
         |  SELECT d.doc_id, d.source, d.text
         |  FROM batch d
         |  JOIN rf ON rf.doc_id = d.doc_id AND rf.keep
         |  WHERE d.doc_id NOT IN (SELECT doc_id FROM dupd)),
         |corpus2 AS MATERIALIZED (
         |  SELECT doc_id, source, text FROM documents WHERE doc_id % 5 = 0
         |  UNION ALL SELECT doc_id, source, text FROM surv),
         |roll AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(len(list_filter(string_split_regex(lower(text), '\\s+'),
         |                                  t -> len(t) > 0))) AS BIGINT) AS n_tokens
         |  FROM corpus2 GROUP BY 1),
         |addc AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_added
         |  FROM surv GROUP BY 1),
         |va AS (
         |  SELECT vec_id, list_transform(embedding,
         |    e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |na AS MATERIALIZED (
         |  SELECT vec_id, qv,
         |         CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i]*qv[i])) AS BIGINT) AS nsq
         |  FROM va),
         |centl AS (
         |  SELECT vec_id AS cell, qv AS cv, nsq AS cnsq FROM na
         |  WHERE vec_id % 5 = 0 ORDER BY vec_id LIMIT 16),
         |mem AS (
         |  SELECT na.vec_id, na.qv, na.nsq, d.source
         |  FROM na JOIN (SELECT doc_id, source FROM corpus2) d
         |    ON d.doc_id = na.vec_id),
         |asg AS (
         |  SELECT vec_id, source, cell FROM (
         |    SELECT m.vec_id, m.source, c.cell,
         |           row_number() OVER (PARTITION BY m.vec_id ORDER BY
         |             ${cosSql("m.qv", "c.cv", "m.nsq", "c.cnsq")} DESC,
         |             c.cell) AS rn
         |    FROM mem m, centl c)
         |  WHERE rn = 1),
         |annc AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_indexed,
         |         CAST(count(DISTINCT cell) AS BIGINT) AS n_cells
         |  FROM asg GROUP BY 1)
         |SELECT r.source, r.n_docs, r.n_tokens,
         |       CAST(coalesce(a.n_added, 0) AS BIGINT) AS n_added,
         |       CAST(coalesce(x.n_indexed, 0) AS BIGINT) AS n_indexed,
         |       CAST(coalesce(x.n_cells, 0) AS BIGINT) AS n_cells
         |FROM roll r LEFT JOIN addc a USING (source)
         |LEFT JOIN annc x USING (source)""".stripMargin,

    "q445_cuzick" ->
      """WITH b AS (
        |  SELECT event_type AS g, user_id % 4 AS l,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |cells AS (
        |  SELECT g, v, CAST(count(*) AS BIGINT) AS c
        |  FROM b GROUP BY 1, 2),
        |run AS (
        |  SELECT g, v, c,
        |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM cells),
        |r2t AS (
        |  SELECT g, v, 2 * (cum - c) + c + 1 AS r2 FROM run),
        |j AS (
        |  SELECT b.g, b.l, r2t.r2
        |  FROM b JOIN r2t ON b.g = r2t.g AND b.v = r2t.v),
        |agg AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(l) AS BIGINT) AS l1,
        |    CAST(sum(l * l) AS BIGINT) AS l2,
        |    CAST(sum(CAST(l AS HUGEINT) * r2) AS HUGEINT) AS t2,
        |    CAST(sum(CAST(r2 AS HUGEINT) * r2) AS HUGEINT) AS sr22
        |  FROM j GROUP BY 1),
        |d AS (
        |  SELECT g, n, t2,
        |    t2 - CAST(n + 1 AS HUGEINT) * l1 AS dd,
        |    CAST(n AS HUGEINT) * l2 - CAST(l1 AS HUGEINT) * l1 AS a,
        |    sr22 - CAST(n AS HUGEINT) * (n + 1) * (n + 1) AS s2
        |  FROM agg),
        |q AS (
        |  SELECT g, n, t2, dd,
        |    CASE WHEN a > 0 AND s2 > 0 AND n >= 2 THEN
        |      (CAST(4000000000000 AS HUGEINT) * dd * dd * n * (n - 1))
        |        // (a * s2) END AS q4
        |  FROM d),
        |sq AS (
        |  SELECT *, CAST(floor(sqrt(CAST(q4 AS DOUBLE))) AS HUGEINT)
        |    AS u0
        |  FROM q),
        |iq AS (
        |  SELECT g, n, t2, dd, q4,
        |    u0 + CASE WHEN (u0 + 2) * (u0 + 2) <= q4 THEN 2
        |      WHEN (u0 + 1) * (u0 + 1) <= q4 THEN 1
        |      WHEN u0 * u0 <= q4 THEN 0
        |      WHEN (u0 - 1) * (u0 - 1) <= q4 THEN -1 ELSE -2 END AS u
        |  FROM sq)
        |SELECT g AS event_type, n, CAST(t2 AS BIGINT) AS t2,
        |  CASE WHEN q4 IS NOT NULL THEN CAST(CASE WHEN dd < 0
        |    THEN -((u + 1) // 2) ELSE (u + 1) // 2 END AS BIGINT)
        |  END AS z_micro
        |FROM iq""".stripMargin,

    "q444_quadratic_kappa" ->
      """WITH b AS (
        |  SELECT
        |    abs(CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT))
        |      % 5 AS a,
        |    least(abs(CAST(round(CAST(value AS DOUBLE) * 100)
        |        AS BIGINT)) % 5 +
        |      CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END, 4) AS bb
        |  FROM events WHERE value IS NOT NULL),
        |t AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum((a - bb) * (a - bb)) AS BIGINT) AS swo
        |  FROM b),
        |ra AS (SELECT a, CAST(count(*) AS BIGINT) AS r
        |       FROM b GROUP BY 1),
        |cb AS (SELECT bb, CAST(count(*) AS BIGINT) AS c
        |       FROM b GROUP BY 1),
        |e AS (
        |  SELECT CAST(sum(CAST((ra.a - cb.bb) * (ra.a - cb.bb)
        |      AS HUGEINT) * ra.r * cb.c) AS HUGEINT) AS swrc
        |  FROM ra CROSS JOIN cb)
        |SELECT n, swo AS sum_wo,
        |  CASE WHEN swrc > 0 THEN CAST(
        |    CASE WHEN (swrc - CAST(n AS HUGEINT) * swo) < 0 THEN
        |      -((2000000 * (CAST(n AS HUGEINT) * swo - swrc) + swrc)
        |        // (2 * swrc))
        |    ELSE (2000000 * (swrc - CAST(n AS HUGEINT) * swo) + swrc)
        |      // (2 * swrc)
        |    END AS BIGINT) END AS kappa_micro
        |FROM t CROSS JOIN e""".stripMargin,

    "q401_assoc_rules" ->
      """WITH b0 AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey % 50 AS i
        |  FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |keep AS (
        |  SELECT b FROM b0 GROUP BY b
        |  HAVING count(*) BETWEEN 3 AND 16),
        |bk AS (SELECT b0.b, b0.i FROM b0 JOIN keep USING (b)),
        |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_baskets FROM keep),
        |ic AS (SELECT i, CAST(count(*) AS BIGINT) AS n_i FROM bk
        |  GROUP BY 1),
        |pr AS (
        |  SELECT x.b, x.i AS ia, y.i AS ib
        |  FROM bk x JOIN bk y ON x.b = y.b AND x.i < y.i),
        |pc AS (SELECT ia, ib, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM pr GROUP BY 1, 2),
        |tr AS (
        |  SELECT pr.ia, pr.ib, z.i AS ic3,
        |    CAST(count(*) AS BIGINT) AS n_abc
        |  FROM pr JOIN bk z ON pr.b = z.b AND z.i > pr.ib
        |  GROUP BY 1, 2, 3 HAVING count(*) >= 5),
        |rules AS (
        |  SELECT ia AS ant_a, ib AS ant_b, ic3 AS cons, n_abc FROM tr
        |  UNION ALL
        |  SELECT ia, ic3, ib, n_abc FROM tr
        |  UNION ALL
        |  SELECT ib, ic3, ia, n_abc FROM tr)
        |SELECT r.ant_a, r.ant_b, r.cons, r.n_abc,
        |  pc.n_ab AS n_ant, ic.n_i AS n_cons, nb.n_baskets,
        |  (1000000 * r.n_abc) // pc.n_ab AS conf_micro,
        |  CAST((CAST(1000000 AS HUGEINT) * r.n_abc * nb.n_baskets)
        |    // (CAST(pc.n_ab AS HUGEINT) * ic.n_i) AS BIGINT)
        |    AS lift_micro
        |FROM rules r
        |JOIN pc ON r.ant_a = pc.ia AND r.ant_b = pc.ib
        |JOIN ic ON r.cons = ic.i
        |CROSS JOIN nb"""
        .stripMargin,

    "q402_decision_stump" -> decisionStumpOracleSql,

    "q403_durbin_watson" ->
      """WITH b AS (
        |  SELECT event_type AS g, epoch_ms(ts) AS x, event_id AS tb,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
        |s AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM b GROUP BY 1),
        |ab AS (
        |  SELECT g, n, sx, sy,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS det,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b1
        |  FROM s),
        |e AS (
        |  SELECT b.g, b.x, b.tb,
        |    CAST(round(1e3 * (CAST(b.y AS DOUBLE)
        |      - (CAST(ab.sy AS DOUBLE) - ab.b1 * CAST(ab.sx AS DOUBLE))
        |        / CAST(ab.n AS DOUBLE)
        |      - ab.b1 * CAST(b.x AS DOUBLE))) AS BIGINT) AS e
        |  FROM b JOIN ab ON b.g = ab.g WHERE ab.det > 0),
        |d AS (
        |  SELECT g, e,
        |    lag(e) OVER (PARTITION BY g ORDER BY x, tb) AS pe
        |  FROM e),
        |agg AS (
        |  SELECT g, sum(CAST(e AS HUGEINT) * e) AS se2,
        |    sum(CASE WHEN pe IS NOT NULL
        |      THEN CAST(e - pe AS HUGEINT) * (e - pe) END) AS sd2
        |  FROM d GROUP BY 1)
        |SELECT s.g AS event_type, s.n,
        |  CASE WHEN ab.det > 0 AND s.n >= 2 AND agg.se2 > 0
        |      AND agg.sd2 IS NOT NULL
        |    THEN CAST(round(1e6 * CAST(agg.sd2 AS DOUBLE)
        |      / CAST(agg.se2 AS DOUBLE)) AS BIGINT) END AS dw_micro
        |FROM s JOIN ab ON s.g = ab.g LEFT JOIN agg ON s.g = agg.g"""
        .stripMargin,

    "q404_chow" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    (epoch_ms(ts) // 86400000) % 2 = 0 AS s,
        |    CAST(round(CAST(epoch_ms(ts) // 86400000 AS DOUBLE) * 1e3)
        |      AS BIGINT) AS x,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
        |ss AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS np,
        |    sum(CAST(x AS HUGEINT)) AS sxp,
        |    sum(CAST(y AS HUGEINT)) AS syp,
        |    sum(CAST(x AS HUGEINT) * x) AS sxxp,
        |    sum(CAST(x AS HUGEINT) * y) AS sxyp,
        |    sum(CAST(y AS HUGEINT) * y) AS syyp,
        |    CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    sum(CASE WHEN s THEN CAST(x AS HUGEINT) ELSE 0 END) AS sx1,
        |    sum(CASE WHEN s THEN CAST(y AS HUGEINT) ELSE 0 END) AS sy1,
        |    sum(CASE WHEN s THEN CAST(x AS HUGEINT) * x ELSE 0 END)
        |      AS sxx1,
        |    sum(CASE WHEN s THEN CAST(x AS HUGEINT) * y ELSE 0 END)
        |      AS sxy1,
        |    sum(CASE WHEN s THEN CAST(y AS HUGEINT) * y ELSE 0 END)
        |      AS syy1,
        |    CAST(sum(CASE WHEN s THEN 0 ELSE 1 END) AS BIGINT) AS n2,
        |    sum(CASE WHEN s THEN 0 ELSE CAST(x AS HUGEINT) END) AS sx2,
        |    sum(CASE WHEN s THEN 0 ELSE CAST(y AS HUGEINT) END) AS sy2,
        |    sum(CASE WHEN s THEN 0 ELSE CAST(x AS HUGEINT) * x END)
        |      AS sxx2,
        |    sum(CASE WHEN s THEN 0 ELSE CAST(x AS HUGEINT) * y END)
        |      AS sxy2,
        |    sum(CASE WHEN s THEN 0 ELSE CAST(y AS HUGEINT) * y END)
        |      AS syy2
        |  FROM b GROUP BY 1),
        |f AS (
        |  SELECT g, np, n1, n2,
        |    CASE WHEN np >= 2 AND CAST(sxxp AS DOUBLE)
        |        - CAST(sxp AS DOUBLE) * CAST(sxp AS DOUBLE)
        |          / CAST(np AS DOUBLE) > 0
        |      THEN CAST(syyp AS DOUBLE)
        |        - CAST(syp AS DOUBLE) * CAST(syp AS DOUBLE)
        |          / CAST(np AS DOUBLE)
        |        - (CAST(sxyp AS DOUBLE) - CAST(sxp AS DOUBLE)
        |            * CAST(syp AS DOUBLE) / CAST(np AS DOUBLE))
        |          * (CAST(sxyp AS DOUBLE) - CAST(sxp AS DOUBLE)
        |            * CAST(syp AS DOUBLE) / CAST(np AS DOUBLE))
        |          / (CAST(sxxp AS DOUBLE) - CAST(sxp AS DOUBLE)
        |            * CAST(sxp AS DOUBLE) / CAST(np AS DOUBLE))
        |      END AS ssep,
        |    CASE WHEN n1 >= 2 AND CAST(sxx1 AS DOUBLE)
        |        - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE)
        |          / CAST(n1 AS DOUBLE) > 0
        |      THEN CAST(syy1 AS DOUBLE)
        |        - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE)
        |          / CAST(n1 AS DOUBLE)
        |        - (CAST(sxy1 AS DOUBLE) - CAST(sx1 AS DOUBLE)
        |            * CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |          * (CAST(sxy1 AS DOUBLE) - CAST(sx1 AS DOUBLE)
        |            * CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |          / (CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE)
        |            * CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |      END AS sse1,
        |    CASE WHEN n2 >= 2 AND CAST(sxx2 AS DOUBLE)
        |        - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE)
        |          / CAST(n2 AS DOUBLE) > 0
        |      THEN CAST(syy2 AS DOUBLE)
        |        - CAST(sy2 AS DOUBLE) * CAST(sy2 AS DOUBLE)
        |          / CAST(n2 AS DOUBLE)
        |        - (CAST(sxy2 AS DOUBLE) - CAST(sx2 AS DOUBLE)
        |            * CAST(sy2 AS DOUBLE) / CAST(n2 AS DOUBLE))
        |          * (CAST(sxy2 AS DOUBLE) - CAST(sx2 AS DOUBLE)
        |            * CAST(sy2 AS DOUBLE) / CAST(n2 AS DOUBLE))
        |          / (CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE)
        |            * CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE))
        |      END AS sse2
        |  FROM ss)
        |SELECT g AS event_type, n1 AS n_a, n2 AS n_b,
        |  CASE WHEN np > 4 AND ssep IS NOT NULL AND sse1 IS NOT NULL
        |      AND sse2 IS NOT NULL AND sse1 + sse2 > 0
        |    THEN CAST(round(1e6 * ((ssep - sse1 - sse2) / 2.0
        |      / ((sse1 + sse2) / (CAST(np AS DOUBLE) - 4.0))))
        |      AS BIGINT) END AS f_micro
        |FROM f"""
        .stripMargin,

    "q405_cochran_armitage" ->
      """WITH b AS (
        |  SELECT l_returnflag AS g, CAST(l_linenumber AS BIGINT) AS w,
        |    CASE WHEN CAST(l_quantity AS DOUBLE) > 25.0 THEN 1
        |         ELSE 0 END AS y
        |  FROM lineitem
        |  WHERE l_linenumber IS NOT NULL AND l_quantity IS NOT NULL),
        |c AS (
        |  SELECT g, w, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS r
        |  FROM b GROUP BY 1, 2),
        |s AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS k_doses,
        |    CAST(sum(n) AS BIGINT) AS n, CAST(sum(r) AS BIGINT)
        |      AS n_pos,
        |    sum(CAST(r AS HUGEINT) * w) AS t,
        |    sum(CAST(n AS HUGEINT) * w) AS s1,
        |    sum(CAST(n AS HUGEINT) * w * w) AS s2
        |  FROM c GROUP BY 1)
        |SELECT g AS l_returnflag, k_doses, n, n_pos,
        |  CASE WHEN (CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (1.0 - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |        * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) > 0
        |    THEN CAST(round(1e6 * (CAST(t AS DOUBLE)
        |      - (CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
        |        * CAST(s1 AS DOUBLE))
        |      / sqrt((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (1.0 - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |          * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))))
        |      AS BIGINT) END AS z_micro
        |FROM s"""
        .stripMargin,

    "q406_ansari_bradley" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v,
        |    user_id % 2 = 0 AS a
        |  FROM events WHERE value IS NOT NULL),
        |c AS (
        |  SELECT g, v,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM b GROUP BY 1, 2),
        |c2 AS (SELECT g, v, ca, cb, ca + cb AS c FROM c),
        |t AS (
        |  SELECT g, CAST(sum(ca) AS BIGINT) AS n_a,
        |    CAST(sum(cb) AS BIGINT) AS n_b
        |  FROM c2 GROUP BY 1),
        |r AS (
        |  SELECT g, v, ca, cb, c,
        |    sum(c) OVER (PARTITION BY g ORDER BY v) AS cum
        |  FROM c2),
        |sc AS (
        |  SELECT r.g, ca, cb, c, t.n_a, t.n_b, t.n_a + t.n_b AS nt,
        |    least(2 * (cum - c) + c + 1,
        |      2 * (t.n_a + t.n_b + 1) - (2 * (cum - c) + c + 1)) AS s2
        |  FROM r JOIN t ON r.g = t.g),
        |agg AS (
        |  SELECT g, max(n_a) AS n_a, max(n_b) AS n_b,
        |    max(nt) AS nn,
        |    sum(CAST(ca AS HUGEINT) * s2) AS ab2,
        |    sum(CAST(c AS HUGEINT) * s2) AS ss,
        |    sum(CAST(c AS HUGEINT) * s2 * s2) AS ssq
        |  FROM sc GROUP BY 1)
        |SELECT g AS event_type, n_a, n_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN CAST(ab2 AS BIGINT)
        |    END AS ab2,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |      AND CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
        |        * (CAST(nn AS DOUBLE) * CAST(ssq AS DOUBLE)
        |          - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
        |        / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
        |          * (CAST(nn AS DOUBLE) - 1.0)) > 0
        |    THEN CAST(round(1e6 * (CAST(ab2 AS DOUBLE)
        |      - CAST(n_a AS DOUBLE) * CAST(ss AS DOUBLE)
        |        / CAST(nn AS DOUBLE))
        |      / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
        |        * (CAST(nn AS DOUBLE) * CAST(ssq AS DOUBLE)
        |          - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
        |        / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
        |          * (CAST(nn AS DOUBLE) - 1.0)))) AS BIGINT)
        |    END AS z_micro
        |FROM agg"""
        .stripMargin,

    "q407_cramer_von_mises" ->
      """WITH b AS (
        |  SELECT l_returnflag AS g,
        |    CAST(round(CAST(l_extendedprice AS DOUBLE) * 1e6)
        |      AS BIGINT) AS v,
        |    l_linestatus = 'O' AS a
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |c AS (
        |  SELECT g, v,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM b GROUP BY 1, 2),
        |c2 AS (SELECT g, v, ca, cb, ca + cb AS c FROM c),
        |r AS (
        |  SELECT g, v, ca, cb, c,
        |    sum(c) OVER w AS cum, sum(ca) OVER w AS cuma,
        |    sum(cb) OVER w AS cumb
        |  FROM c2
        |  WINDOW w AS (PARTITION BY g ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |u AS (
        |  SELECT g, ca, cb, c,
        |    2 * (cum - c) + c + 1 AS m2,
        |    2 * (cum - c) + c + 1 - 2 * (cuma - ca) AS kka,
        |    2 * (cum - c) + c + 1 - 2 * (cumb - cb) AS kkb
        |  FROM r),
        |agg AS (
        |  SELECT g, CAST(sum(ca) AS BIGINT) AS n_a,
        |    CAST(sum(cb) AS BIGINT) AS n_b,
        |    sum(CASE WHEN ca > 0
        |      THEN CAST(ca AS HUGEINT) * kka * kka
        |        - 2 * CAST(kka AS HUGEINT) * ca * (ca + 1)
        |        + (4 * CAST(ca AS HUGEINT) * (ca + 1) * (2 * ca + 1))
        |          // 6
        |      ELSE 0 END) AS ua,
        |    sum(CASE WHEN cb > 0
        |      THEN CAST(cb AS HUGEINT) * kkb * kkb
        |        - 2 * CAST(kkb AS HUGEINT) * cb * (cb + 1)
        |        + (4 * CAST(cb AS HUGEINT) * (cb + 1) * (2 * cb + 1))
        |          // 6
        |      ELSE 0 END) AS ub
        |  FROM u GROUP BY 1)
        |SELECT g AS l_returnflag, n_a, n_b,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |    THEN CAST(round(1e6 * (
        |      CAST(CAST(n_a AS HUGEINT) * ua + CAST(n_b AS HUGEINT)
        |        * ub AS DOUBLE) / 4.0
        |        / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
        |          * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
        |      - (4.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
        |          - 1.0)
        |        / (6.0 * (CAST(n_a AS DOUBLE)
        |          + CAST(n_b AS DOUBLE))))) AS BIGINT)
        |    END AS t_micro
        |FROM agg"""
        .stripMargin,

    "q408_kuiper" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v,
        |    event_id % 2 = 0 AS a
        |  FROM events WHERE value IS NOT NULL),
        |c AS (
        |  SELECT g, v,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM b GROUP BY 1, 2),
        |t AS (
        |  SELECT g, CAST(sum(ca) AS BIGINT) AS n_a,
        |    CAST(sum(cb) AS BIGINT) AS n_b
        |  FROM c GROUP BY 1),
        |r AS (
        |  SELECT g, v, ca, cb,
        |    sum(ca) OVER w AS ra, sum(cb) OVER w AS rb
        |  FROM c
        |  WINDOW w AS (PARTITION BY g ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |agg AS (
        |  SELECT r.g, max(t.n_a) AS n_a, max(t.n_b) AS n_b,
        |    max(greatest(CAST(ra AS HUGEINT) * t.n_b
        |      - CAST(rb AS HUGEINT) * t.n_a, 0)) AS dp,
        |    max(greatest(-(CAST(ra AS HUGEINT) * t.n_b
        |      - CAST(rb AS HUGEINT) * t.n_a), 0)) AS dm
        |  FROM r JOIN t ON r.g = t.g GROUP BY 1)
        |SELECT g AS event_type, n_a, n_b,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |    THEN CAST(round(1e6 * (CAST(dp AS DOUBLE)
        |      + CAST(dm AS DOUBLE))
        |      / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
        |      AS BIGINT) END AS v_micro
        |FROM agg"""
        .stripMargin,

    "q409_page_trend" ->
      """WITH pv AS (
        |  SELECT user_id AS b, event_type AS t,
        |    CAST(sum(CAST(round(CAST(value AS DOUBLE) * 1e3)
        |      AS BIGINT)) AS BIGINT) AS sv
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |base AS (
        |  SELECT 'all' AS g, b, t,
        |    CAST(round(CAST(sv AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM pv),
        |kp AS (SELECT g, CAST(count(DISTINCT t) AS BIGINT) AS k
        |  FROM base GROUP BY 1),
        |ti AS (
        |  SELECT g, t, CAST(row_number() OVER (PARTITION BY g
        |    ORDER BY t) AS BIGINT) AS idx
        |  FROM (SELECT DISTINCT g, t FROM base)),
        |bl AS (
        |  SELECT base.g, b, CAST(count(*) AS BIGINT) AS cnt, kp.k
        |  FROM base JOIN kp ON base.g = kp.g GROUP BY 1, 2, 4),
        |dropped AS (
        |  SELECT g, CAST(sum(CASE WHEN cnt = k THEN 0 ELSE 1 END)
        |    AS BIGINT) AS n_dropped_blocks
        |  FROM bl GROUP BY 1),
        |rows_ AS (
        |  SELECT base.* FROM base
        |  JOIN (SELECT g, b FROM bl WHERE cnt = k) cb
        |    ON base.g = cb.g AND base.b = cb.b),
        |rk AS (
        |  SELECT x.g, x.b, x.t,
        |    2 * sum(CASE WHEN y.v < x.v THEN 1 ELSE 0 END)
        |      + sum(CASE WHEN y.v = x.v THEN 1 ELSE 0 END) + 1 AS r2
        |  FROM rows_ x JOIN rows_ y ON x.g = y.g AND x.b = y.b
        |  GROUP BY x.g, x.b, x.t, x.v),
        |l2 AS (
        |  SELECT rk.g, sum(CAST(ti.idx AS HUGEINT) * rk.r2) AS l2
        |  FROM rk JOIN ti ON rk.g = ti.g AND rk.t = ti.t
        |  GROUP BY 1),
        |np AS (SELECT g, CAST(count(*) AS BIGINT) AS n_blocks
        |  FROM bl WHERE cnt = k GROUP BY 1)
        |SELECT kp.g, kp.k,
        |  COALESCE(np.n_blocks, 0) AS n_blocks,
        |  dropped.n_dropped_blocks,
        |  CASE WHEN np.n_blocks > 0 THEN CAST(l2.l2 AS BIGINT)
        |    END AS l2,
        |  CASE WHEN np.n_blocks > 0 AND kp.k >= 3
        |      AND CAST(np.n_blocks AS DOUBLE) * CAST(kp.k AS DOUBLE)
        |        * CAST(kp.k AS DOUBLE)
        |        * (CAST(kp.k AS DOUBLE) + 1.0)
        |        * (CAST(kp.k AS DOUBLE) * CAST(kp.k AS DOUBLE) - 1.0)
        |        / 36.0 > 0
        |    THEN CAST(round(1e6 * (CAST(l2.l2 AS DOUBLE)
        |      - CAST(np.n_blocks AS DOUBLE) * CAST(kp.k AS DOUBLE)
        |        * (CAST(kp.k AS DOUBLE) + 1.0)
        |        * (CAST(kp.k AS DOUBLE) + 1.0) / 2.0)
        |      / sqrt(CAST(np.n_blocks AS DOUBLE)
        |        * CAST(kp.k AS DOUBLE) * CAST(kp.k AS DOUBLE)
        |        * (CAST(kp.k AS DOUBLE) + 1.0)
        |        * (CAST(kp.k AS DOUBLE) * CAST(kp.k AS DOUBLE) - 1.0)
        |        / 36.0)) AS BIGINT) END AS z_micro
        |FROM kp JOIN dropped ON kp.g = dropped.g
        |LEFT JOIN np ON kp.g = np.g
        |LEFT JOIN l2 ON kp.g = l2.g"""
        .stripMargin,

    "q410_brunner_munzel" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v,
        |    user_id % 2 = 0 AS a
        |  FROM events WHERE value IS NOT NULL),
        |c AS (
        |  SELECT g, v,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM b GROUP BY 1, 2),
        |c2 AS (SELECT g, v, ca, cb, ca + cb AS c FROM c),
        |r AS (
        |  SELECT g, v, ca, cb, c,
        |    sum(c) OVER w AS cum, sum(ca) OVER w AS cuma,
        |    sum(cb) OVER w AS cumb
        |  FROM c2
        |  WINDOW w AS (PARTITION BY g ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |u AS (
        |  SELECT g, ca, cb,
        |    2 * (cum - c) + c + 1 AS m2,
        |    2 * (cum - c) + c + 1 - (2 * (cuma - ca) + ca + 1)
        |      AS da2,
        |    2 * (cum - c) + c + 1 - (2 * (cumb - cb) + cb + 1)
        |      AS db2
        |  FROM r),
        |agg AS (
        |  SELECT g, CAST(sum(ca) AS BIGINT) AS n_a,
        |    CAST(sum(cb) AS BIGINT) AS n_b,
        |    sum(CAST(ca AS HUGEINT) * m2) AS r2a,
        |    sum(CAST(cb AS HUGEINT) * m2) AS r2b,
        |    sum(CAST(ca AS HUGEINT) * da2) AS s1a,
        |    sum(CAST(ca AS HUGEINT) * da2 * da2) AS s2a,
        |    sum(CAST(cb AS HUGEINT) * db2) AS s1b,
        |    sum(CAST(cb AS HUGEINT) * db2 * db2) AS s2b
        |  FROM u GROUP BY 1),
        |v AS (
        |  SELECT g, n_a, n_b,
        |    CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
        |    CAST(r2a AS DOUBLE) / (2.0 * CAST(n_a AS DOUBLE)) AS ra,
        |    CAST(r2b AS DOUBLE) / (2.0 * CAST(n_b AS DOUBLE)) AS rb,
        |    (CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE)
        |      * CAST(s1a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |      / (CAST(n_a AS DOUBLE) - 1.0) / 4.0 AS va,
        |    (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE)
        |      * CAST(s1b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |      / (CAST(n_b AS DOUBLE) - 1.0) / 4.0 AS vb
        |  FROM agg)
        |SELECT g AS event_type, n_a, n_b,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |    THEN CAST(round(1e6 * (rb - (nbd + 1.0) / 2.0) / nad)
        |      AS BIGINT) END AS p_hat_micro,
        |  CASE WHEN n_a > 1 AND n_b > 1 AND nad * va + nbd * vb > 0
        |    THEN CAST(round(1e6 * nad * nbd * (rb - ra)
        |      / ((nad + nbd) * sqrt(nad * va + nbd * vb))) AS BIGINT)
        |  END AS w_micro
        |FROM v"""
        .stripMargin,

    "q411_average_precision" ->
      """WITH b AS (
        |  SELECT event_type AS g, event_id AS id,
        |    -CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS ns,
        |    CASE WHEN user_id % 7 = 0 THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT g, y,
        |    CAST(row_number() OVER w AS BIGINT) AS rnk,
        |    sum(y) OVER (PARTITION BY g ORDER BY ns, id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS j
        |  FROM b
        |  WINDOW w AS (PARTITION BY g ORDER BY ns, id)),
        |p AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS np,
        |    CAST(sum((1000000 * j) // rnk) AS BIGINT) AS sp
        |  FROM r WHERE y = 1 GROUP BY 1),
        |t AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM b
        |  GROUP BY 1)
        |SELECT t.g AS event_type, t.n,
        |  COALESCE(p.np, 0) AS n_pos,
        |  CASE WHEN p.np > 0 AND p.np < t.n
        |    THEN CAST(round(CAST(p.sp AS DOUBLE)
        |      / CAST(p.np AS DOUBLE)) AS BIGINT) END AS ap_micro
        |FROM t LEFT JOIN p ON t.g = p.g"""
        .stripMargin,

    "q412_dickey_fuller" ->
      """WITH b AS (
        |  SELECT event_type AS g, epoch_ms(ts) AS o, event_id AS tb,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
        |pr AS (
        |  SELECT g, y,
        |    lag(y) OVER (PARTITION BY g ORDER BY o, tb) AS py
        |  FROM b),
        |p AS (
        |  SELECT g, py AS x, y - py AS z FROM pr
        |  WHERE py IS NOT NULL),
        |s AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n_pairs,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(z AS HUGEINT))
        |      AS sz,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(x AS HUGEINT) * z) AS sxz,
        |    sum(CAST(z AS HUGEINT) * z) AS szz
        |  FROM p GROUP BY 1),
        |d AS (
        |  SELECT g, n_pairs,
        |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |      * CAST(sx AS DOUBLE) / CAST(n_pairs AS DOUBLE) AS sxc,
        |    CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE)
        |      * CAST(sz AS DOUBLE) / CAST(n_pairs AS DOUBLE) AS szc,
        |    CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE)
        |      * CAST(sz AS DOUBLE) / CAST(n_pairs AS DOUBLE) AS sxzc
        |  FROM s),
        |f AS (
        |  SELECT g, n_pairs, sxc,
        |    sxzc / sxc AS beta,
        |    (szc - (sxzc / sxc) * sxzc)
        |      / (CAST(n_pairs AS DOUBLE) - 2.0) AS s2
        |  FROM d)
        |SELECT g AS event_type, n_pairs,
        |  CASE WHEN n_pairs >= 3 AND sxc > 0
        |    THEN CAST(round(1e6 * beta) AS BIGINT) END AS beta_micro,
        |  CASE WHEN n_pairs >= 3 AND sxc > 0 AND s2 > 0
        |    THEN CAST(round(1e6 * (beta / sqrt(s2 / sxc)))
        |      AS BIGINT) END AS df_t_micro,
        |  CASE WHEN n_pairs >= 3 AND sxc > 0 AND s2 > 0
        |    THEN CAST(round(1e6 * (beta / sqrt(s2 / sxc)))
        |      AS BIGINT) < -2860000 END AS stationary_5pct
        |FROM f"""
        .stripMargin,

    "q413_energy_distance" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v,
        |    user_id % 2 = 0 AS a
        |  FROM events WHERE value IS NOT NULL),
        |c AS (
        |  SELECT g, v,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM b GROUP BY 1, 2),
        |c2 AS (
        |  SELECT g, v, ca, cb,
        |    CAST(ca AS HUGEINT) * v AS wa,
        |    CAST(cb AS HUGEINT) * v AS wb
        |  FROM c),
        |r AS (
        |  SELECT g, v, ca, cb, wa, wb,
        |    sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb,
        |    sum(wa) OVER w AS cwa, sum(wb) OVER w AS cwb
        |  FROM c2
        |  WINDOW w AS (PARTITION BY g ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (
        |  SELECT g, CAST(sum(ca) AS BIGINT) AS n_a,
        |    CAST(sum(cb) AS BIGINT) AS n_b,
        |    sum(wa) AS swa, sum(wb) AS swb
        |  FROM c2 GROUP BY 1),
        |agg AS (
        |  SELECT r.g, max(t.n_a) AS n_a, max(t.n_b) AS n_b,
        |    sum(CAST(ca AS HUGEINT) *
        |      (CAST(v AS HUGEINT) * (cumb - cb) - (cwb - wb)
        |        + (t.swb - cwb)
        |        - CAST(v AS HUGEINT) * (t.n_b - cumb))) AS sab,
        |    sum(CAST(ca AS HUGEINT) *
        |      (CAST(v AS HUGEINT) * (cuma - ca) - (cwa - wa)))
        |      AS saa,
        |    sum(CAST(cb AS HUGEINT) *
        |      (CAST(v AS HUGEINT) * (cumb - cb) - (cwb - wb)))
        |      AS sbb
        |  FROM r JOIN t ON r.g = t.g GROUP BY 1)
        |SELECT g AS event_type, n_a, n_b,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |    THEN CAST(round(
        |      2.0 * CAST(sab AS DOUBLE)
        |        / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
        |      - 2.0 * CAST(saa AS DOUBLE)
        |        / (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE))
        |      - 2.0 * CAST(sbb AS DOUBLE)
        |        / (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE)))
        |      AS BIGINT) END AS e_micro,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |    THEN CAST(round(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
        |      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
        |      * (2.0 * CAST(sab AS DOUBLE)
        |        / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
        |      - 2.0 * CAST(saa AS DOUBLE)
        |        / (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE))
        |      - 2.0 * CAST(sbb AS DOUBLE)
        |        / (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE))))
        |      AS BIGINT) END AS t_stat_micro
        |FROM agg"""
        .stripMargin,

    "q414_hist_distances" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(floor(CAST(CAST(round(CAST(value AS DOUBLE) * 1e3)
        |      AS BIGINT) AS DOUBLE) / 20000.0) AS BIGINT) AS bin,
        |    event_id % 2 = 0 AS a
        |  FROM events WHERE value IS NOT NULL),
        |c AS (
        |  SELECT g, bin,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM b GROUP BY 1, 2),
        |t AS (
        |  SELECT g, CAST(sum(ca) AS BIGINT) AS n_a,
        |    CAST(sum(cb) AS BIGINT) AS n_b
        |  FROM c GROUP BY 1),
        |agg AS (
        |  SELECT c.g, max(t.n_a) AS n_a, max(t.n_b) AS n_b,
        |    CAST(count(*) AS BIGINT) AS n_bins,
        |    sum(abs(CAST(ca AS HUGEINT) * t.n_b
        |      - CAST(cb AS HUGEINT) * t.n_a)) AS tvnum,
        |    CAST(sum(CAST(round(1e6 * sqrt(CAST(CAST(ca AS HUGEINT)
        |      * cb AS DOUBLE))) AS BIGINT)) AS BIGINT) AS bcsum
        |  FROM c JOIN t ON c.g = t.g GROUP BY 1)
        |SELECT g AS event_type, n_a, n_b, n_bins,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |    THEN CAST(round(1e6 * (0.5 * CAST(tvnum AS DOUBLE)
        |      / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))))
        |      AS BIGINT) END AS tv_micro,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |    THEN CAST(round(1e6 * (CAST(bcsum AS DOUBLE) / 1e6
        |      / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))))
        |      AS BIGINT) END AS bc_micro,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |    THEN CAST(round(1e6 * sqrt(greatest(0.0,
        |      1.0 - CAST(bcsum AS DOUBLE) / 1e6
        |        / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))))
        |      AS BIGINT) END AS hellinger_micro
        |FROM agg"""
        .stripMargin,

    "q415_nelson_aalen" ->
      """WITH lv AS (
        |  SELECT user_id % 3 AS cohort,
        |    datediff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE)))
        |      AS dur,
        |    max(CAST(ts AS DATE)) < DATE '2024-01-25' AS churned
        |  FROM events GROUP BY user_id),
        |c AS (
        |  SELECT cohort, CAST(dur AS BIGINT) AS t,
        |    CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_deaths,
        |    CAST(sum(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_censored
        |  FROM lv GROUP BY 1, 2),
        |w AS (
        |  SELECT cohort, t, n_deaths, n_censored,
        |    CAST(sum(n_deaths + n_censored) OVER (PARTITION BY cohort)
        |      - (sum(n_deaths + n_censored) OVER (PARTITION BY cohort
        |           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
        |           CURRENT ROW)
        |         - (n_deaths + n_censored)) AS BIGINT) AS n_at_risk
        |  FROM c),
        |tm AS (
        |  SELECT cohort, t, n_at_risk, n_deaths, n_censored,
        |    CAST(round(1e6 * CAST(n_deaths AS DOUBLE)
        |      / CAST(n_at_risk AS DOUBLE)) AS BIGINT) AS term
        |  FROM w)
        |SELECT cohort, t, n_at_risk, n_deaths, n_censored,
        |  CAST(sum(term) OVER (PARTITION BY cohort ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_hazard_micro
        |FROM tm"""
        .stripMargin,

    "q416_kpss" ->
      """WITH b AS (
        |  SELECT event_type AS g, epoch_ms(ts) AS o, event_id AS tb,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT g, y,
        |    CAST(row_number() OVER wo AS BIGINT) AS rnk,
        |    sum(y) OVER (PARTITION BY g ORDER BY o, tb
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS pref
        |  FROM b WINDOW wo AS (PARTITION BY g ORDER BY o, tb)),
        |t AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(y AS HUGEINT)) AS s,
        |    sum(CAST(y AS HUGEINT) * y) AS q
        |  FROM b GROUP BY 1),
        |ss AS (
        |  SELECT r.g,
        |    sum((CAST(t.n AS HUGEINT) * pref
        |        - CAST(rnk AS HUGEINT) * t.s)
        |      * (CAST(t.n AS HUGEINT) * pref
        |        - CAST(rnk AS HUGEINT) * t.s)) AS ss2
        |  FROM r JOIN t ON r.g = t.g GROUP BY 1),
        |lg AS (
        |  SELECT a.g, l.l AS lag, CAST(count(*) AS BIGINT) AS nk,
        |    sum(CAST(a.y AS HUGEINT) * bb.y) AS p,
        |    sum(CAST(a.y AS HUGEINT)) AS h,
        |    sum(CAST(bb.y AS HUGEINT)) AS t2
        |  FROM r a, UNNEST(generate_series(1, 4)) AS l(l), r bb
        |  WHERE a.g = bb.g AND bb.rnk = a.rnk - l.l
        |  GROUP BY 1, 2),
        |ak AS (
        |  SELECT lg.g,
        |    sum((5 - lag) * (CAST(t.n AS HUGEINT) * t.n * p
        |      - CAST(t.n AS HUGEINT) * t.s * (h + t2)
        |      + CAST(nk AS HUGEINT) * t.s * t.s)) AS wsum
        |  FROM lg JOIN t ON lg.g = t.g GROUP BY 1),
        |f AS (
        |  SELECT t.g, t.n,
        |    5 * (CAST(t.n AS HUGEINT) * (t.n * t.q - t.s * t.s))
        |      + 2 * COALESCE(ak.wsum, 0) AS nwnum,
        |    ss.ss2
        |  FROM t LEFT JOIN ss ON t.g = ss.g
        |  LEFT JOIN ak ON t.g = ak.g)
        |SELECT g AS event_type, n,
        |  CASE WHEN n >= 2 AND CAST(nwnum AS DOUBLE) > 0
        |    THEN CAST(round(1e6 * (CAST(ss2 AS DOUBLE) * 5.0
        |      / (CAST(n AS DOUBLE) * CAST(nwnum AS DOUBLE))))
        |      AS BIGINT) END AS kpss_micro,
        |  CASE WHEN n >= 2 AND CAST(nwnum AS DOUBLE) > 0
        |    THEN CAST(round(1e6 * (CAST(ss2 AS DOUBLE) * 5.0
        |      / (CAST(n AS DOUBLE) * CAST(nwnum AS DOUBLE))))
        |      AS BIGINT) < 463000 END AS level_stationary_5pct
        |FROM f"""
        .stripMargin,

    "q417_cucconi" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v,
        |    event_id % 3 = 0 AS a
        |  FROM events WHERE value IS NOT NULL),
        |c AS (
        |  SELECT g, v,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM b GROUP BY 1, 2),
        |c2 AS (SELECT g, v, ca, cb, ca + cb AS c FROM c),
        |t AS (
        |  SELECT g, CAST(sum(ca) AS BIGINT) AS n_a,
        |    CAST(sum(cb) AS BIGINT) AS n_b
        |  FROM c2 GROUP BY 1),
        |r AS (
        |  SELECT g, v, ca, cb, c,
        |    sum(c) OVER (PARTITION BY g ORDER BY v) AS cum
        |  FROM c2),
        |u AS (
        |  SELECT r.g, t.n_a, t.n_b, t.n_a + t.n_b AS nt,
        |    2 * (cum - c) + c + 1 AS m2, cb
        |  FROM r JOIN t ON r.g = t.g),
        |agg AS (
        |  SELECT g, max(n_a) AS n_a, max(n_b) AS n_b,
        |    max(nt) AS nn,
        |    sum(CAST(cb AS HUGEINT) * m2 * m2) AS sq,
        |    sum(CAST(cb AS HUGEINT) * (2 * (nt + 1) - m2)
        |      * (2 * (nt + 1) - m2)) AS sqc
        |  FROM u GROUP BY 1),
        |f AS (
        |  SELECT g, n_a, n_b,
        |    (6.0 * CAST(sq AS DOUBLE) / 4.0
        |      - CAST(n_b AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)
        |        * (2.0 * CAST(nn AS DOUBLE) + 1.0))
        |      / sqrt(CAST(n_b AS DOUBLE) * CAST(n_a AS DOUBLE)
        |        * (CAST(nn AS DOUBLE) + 1.0)
        |        * (2.0 * CAST(nn AS DOUBLE) + 1.0)
        |        * (8.0 * CAST(nn AS DOUBLE) + 11.0) / 5.0) AS uu,
        |    (6.0 * CAST(sqc AS DOUBLE) / 4.0
        |      - CAST(n_b AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)
        |        * (2.0 * CAST(nn AS DOUBLE) + 1.0))
        |      / sqrt(CAST(n_b AS DOUBLE) * CAST(n_a AS DOUBLE)
        |        * (CAST(nn AS DOUBLE) + 1.0)
        |        * (2.0 * CAST(nn AS DOUBLE) + 1.0)
        |        * (8.0 * CAST(nn AS DOUBLE) + 11.0) / 5.0) AS vv,
        |    2.0 * (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) - 4.0)
        |      / ((2.0 * CAST(nn AS DOUBLE) + 1.0)
        |        * (8.0 * CAST(nn AS DOUBLE) + 11.0)) - 1.0 AS rho
        |  FROM agg)
        |SELECT g AS event_type, n_a, n_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND 1.0 - rho * rho > 0
        |    THEN CAST(round(1e6 * ((uu * uu + vv * vv
        |      - 2.0 * rho * uu * vv) / (2.0 * (1.0 - rho * rho))))
        |      AS BIGINT) END AS c_micro
        |FROM f"""
        .stripMargin,

    "q418_wat_extract" ->
      """WITH d AS (
        |  SELECT doc_id, source FROM documents WHERE doc_id % 5 = 1),
        |r0 AS (
        |  SELECT doc_id, source,
        |    '{"uri":"https://' || source || '.example.com/doc/' ||
        |    CAST(doc_id AS VARCHAR) || '","links":' ||
        |    CAST(doc_id % 7 AS VARCHAR) || ',"ttl":"Doc ' ||
        |    CAST(doc_id AS VARCHAR) || '"}' AS block
        |  FROM d),
        |recs AS (
        |  SELECT source, doc_id,
        |    e'WARC/1.0\r\nWARC-Type: metadata\r\n' ||
        |    'WARC-Target-URI: https://' || source ||
        |    '.example.com/doc/' || CAST(doc_id AS VARCHAR) ||
        |    e'\r\nContent-Length: ' ||
        |    CAST(length(block) AS VARCHAR) || e'\r\n\r\n' || block ||
        |    e'\r\n\r\n' AS rec
        |  FROM r0),
        |sh AS (
        |  SELECT source, string_agg(rec, '' ORDER BY doc_id) AS blob
        |  FROM recs GROUP BY 1),
        |p AS (
        |  SELECT source,
        |    string_split(replace(blob, e'\r\n\r\nWARC/1.0\r\n',
        |      chr(30) || e'WARC/1.0\r\n'), chr(30)) AS parts
        |  FROM sh),
        |rp AS (
        |  SELECT source, i - 1 AS rec_idx, parts[CAST(i AS INT)] AS part
        |  FROM p, UNNEST(generate_series(1, len(parts))) AS u(i)),
        |hx AS (
        |  SELECT source, rec_idx,
        |    split_part(part, e'\r\n\r\n', 1) AS hdr,
        |    substr(part,
        |      length(split_part(part, e'\r\n\r\n', 1)) + 5) AS rest
        |  FROM rp),
        |fx AS (
        |  SELECT source, rec_idx,
        |    regexp_extract(hdr, '(?im)^WARC-Type:[ \t]*(\S+)', 1)
        |      AS warc_type,
        |    substr(rest, 1, CAST(regexp_extract(hdr,
        |      '(?im)^Content-Length:[ \t]*([0-9]+)', 1) AS BIGINT))
        |      AS block
        |  FROM hx)
        |SELECT source, rec_idx,
        |  json_extract_string(block, '$.uri') AS uri,
        |  CAST(json_extract(block, '$.links') AS BIGINT) AS n_links,
        |  json_extract_string(block, '$.ttl') AS title
        |FROM fx WHERE warc_type = 'metadata'"""
        .stripMargin,

    "q419_hill_tail" ->
      """WITH b AS (
        |  SELECT event_type AS g, event_id AS id,
        |    CAST(value AS DOUBLE) AS x
        |  FROM events WHERE value IS NOT NULL),
        |cnt AS (
        |  SELECT g,
        |    CAST(sum(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pos,
        |    CAST(sum(CASE WHEN x > 0 THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_nonpos
        |  FROM b GROUP BY 1),
        |r AS (
        |  SELECT g, CAST(round(1e6 * ln(x)) AS BIGINT) AS mnat,
        |    row_number() OVER (PARTITION BY g ORDER BY x DESC, id)
        |      AS rnk
        |  FROM b WHERE x > 0),
        |agg AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(CASE WHEN rnk <= 50 THEN mnat ELSE 0 END)
        |      AS BIGINT) AS s,
        |    max(CASE WHEN rnk = 51 THEN mnat END) AS ref
        |  FROM r WHERE rnk <= 51 GROUP BY 1)
        |SELECT cnt.g AS event_type, n_pos, n_nonpos,
        |  CASE WHEN m = 51
        |    THEN CAST(round(CAST(s - 50 * ref AS DOUBLE) / 50.0)
        |      AS BIGINT) END AS hill_mnat_micro,
        |  CASE WHEN m = 51
        |      AND CAST(s - 50 * ref AS DOUBLE) / 50.0 > 0
        |    THEN CAST(round(1e12
        |      / (CAST(s - 50 * ref AS DOUBLE) / 50.0)) AS BIGINT)
        |    END AS alpha_micro
        |FROM cnt LEFT JOIN agg ON cnt.g = agg.g"""
        .stripMargin,

    "q420_gumbel_fit" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |s AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(y AS HUGEINT) * y) AS q
        |  FROM b GROUP BY 1)
        |SELECT g AS event_type, n,
        |  CASE WHEN n >= 2 AND (CAST(q AS DOUBLE) - CAST(sy AS DOUBLE)
        |      * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0) > 0
        |    THEN CAST(round(1e3 * (CAST(sy AS DOUBLE)
        |      / CAST(n AS DOUBLE)
        |      - 0.5772156649015329 * (sqrt((CAST(q AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
        |          / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
        |        * sqrt(6.0) / 3.141592653589793))) AS BIGINT)
        |    END AS mu_micro,
        |  CASE WHEN n >= 2 AND (CAST(q AS DOUBLE) - CAST(sy AS DOUBLE)
        |      * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0) > 0
        |    THEN CAST(round(1e3 * (sqrt((CAST(q AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
        |        / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
        |      * sqrt(6.0) / 3.141592653589793)) AS BIGINT)
        |    END AS beta_micro
        |FROM s"""
        .stripMargin,

    "q421_fellegi_sunter" ->
      """WITH ca AS (
        |  SELECT c_custkey AS k, c_nationkey AS na,
        |    c_mktsegment AS sa, c_acctbal > 0 AS ba,
        |    length(c_name) % 3 AS la
        |  FROM customer),
        |cb AS (
        |  SELECT c_custkey - 1 AS k, c_nationkey AS nb,
        |    c_mktsegment AS sb, c_acctbal > 0 AS bb,
        |    length(c_name) % 3 AS lb
        |  FROM customer),
        |pr AS (
        |  SELECT na = nb AS a0, sa = sb AS a1, ba = bb AS a2,
        |    la = lb AS a3
        |  FROM ca JOIN cb USING (k)),
        |cs AS (
        |  SELECT a0, a1, a2, a3, CAST(count(*) AS BIGINT) AS cnt
        |  FROM pr GROUP BY 1, 2, 3, 4),
        |g1 AS (
        |  SELECT cs.*,
        |    CAST(round(1e6 * CAST(CAST(500000 AS HUGEINT)
        |        * (CASE WHEN a0 THEN 900000 ELSE 100000 END)
        |        * (CASE WHEN a1 THEN 900000 ELSE 100000 END)
        |        * (CASE WHEN a2 THEN 900000 ELSE 100000 END)
        |        * (CASE WHEN a3 THEN 900000 ELSE 100000 END)
        |          AS DOUBLE)
        |      / (CAST(CAST(500000 AS HUGEINT)
        |        * (CASE WHEN a0 THEN 900000 ELSE 100000 END)
        |        * (CASE WHEN a1 THEN 900000 ELSE 100000 END)
        |        * (CASE WHEN a2 THEN 900000 ELSE 100000 END)
        |        * (CASE WHEN a3 THEN 900000 ELSE 100000 END)
        |          AS DOUBLE)
        |        + CAST(CAST(500000 AS HUGEINT)
        |        * (CASE WHEN a0 THEN 100000 ELSE 900000 END)
        |        * (CASE WHEN a1 THEN 100000 ELSE 900000 END)
        |        * (CASE WHEN a2 THEN 100000 ELSE 900000 END)
        |        * (CASE WHEN a3 THEN 100000 ELSE 900000 END)
        |          AS DOUBLE))) AS BIGINT) AS gam
        |  FROM cs),
        |m1 AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS np,
        |    sum(CAST(gam AS HUGEINT) * cnt) AS wm,
        |    sum(CAST(1000000 - gam AS HUGEINT) * cnt) AS wu,
        |    sum(CAST(cnt AS HUGEINT) * 1000000) AS tot,
        |    sum(CASE WHEN a0 THEN CAST(gam AS HUGEINT) * cnt
        |      ELSE 0 END) AS wma0,
        |    sum(CASE WHEN a1 THEN CAST(gam AS HUGEINT) * cnt
        |      ELSE 0 END) AS wma1,
        |    sum(CASE WHEN a2 THEN CAST(gam AS HUGEINT) * cnt
        |      ELSE 0 END) AS wma2,
        |    sum(CASE WHEN a3 THEN CAST(gam AS HUGEINT) * cnt
        |      ELSE 0 END) AS wma3,
        |    sum(CASE WHEN a0 THEN CAST(1000000 - gam AS HUGEINT)
        |      * cnt ELSE 0 END) AS wua0,
        |    sum(CASE WHEN a1 THEN CAST(1000000 - gam AS HUGEINT)
        |      * cnt ELSE 0 END) AS wua1,
        |    sum(CASE WHEN a2 THEN CAST(1000000 - gam AS HUGEINT)
        |      * cnt ELSE 0 END) AS wua2,
        |    sum(CASE WHEN a3 THEN CAST(1000000 - gam AS HUGEINT)
        |      * cnt ELSE 0 END) AS wua3
        |  FROM g1),
        |p1 AS (
        |  SELECT np,
        |    CAST(round(1e6 * CAST(wm AS DOUBLE) / CAST(tot AS DOUBLE))
        |      AS BIGINT) AS pp1,
        |    CASE WHEN wm > 0 THEN CAST(round(1e6
        |      * CAST(wma0 AS DOUBLE) / CAST(wm AS DOUBLE)) AS BIGINT)
        |      ELSE 500000 END AS m10,
        |    CASE WHEN wm > 0 THEN CAST(round(1e6
        |      * CAST(wma1 AS DOUBLE) / CAST(wm AS DOUBLE)) AS BIGINT)
        |      ELSE 500000 END AS m11,
        |    CASE WHEN wm > 0 THEN CAST(round(1e6
        |      * CAST(wma2 AS DOUBLE) / CAST(wm AS DOUBLE)) AS BIGINT)
        |      ELSE 500000 END AS m12,
        |    CASE WHEN wm > 0 THEN CAST(round(1e6
        |      * CAST(wma3 AS DOUBLE) / CAST(wm AS DOUBLE)) AS BIGINT)
        |      ELSE 500000 END AS m13,
        |    CASE WHEN wu > 0 THEN CAST(round(1e6
        |      * CAST(wua0 AS DOUBLE) / CAST(wu AS DOUBLE)) AS BIGINT)
        |      ELSE 500000 END AS u10,
        |    CASE WHEN wu > 0 THEN CAST(round(1e6
        |      * CAST(wua1 AS DOUBLE) / CAST(wu AS DOUBLE)) AS BIGINT)
        |      ELSE 500000 END AS u11,
        |    CASE WHEN wu > 0 THEN CAST(round(1e6
        |      * CAST(wua2 AS DOUBLE) / CAST(wu AS DOUBLE)) AS BIGINT)
        |      ELSE 500000 END AS u12,
        |    CASE WHEN wu > 0 THEN CAST(round(1e6
        |      * CAST(wua3 AS DOUBLE) / CAST(wu AS DOUBLE)) AS BIGINT)
        |      ELSE 500000 END AS u13
        |  FROM m1),
        |g2 AS (
        |  SELECT cs.*,
        |    CAST(round(1e6 * CAST(CAST(pp1 AS HUGEINT)
        |        * (CASE WHEN a0 THEN m10 ELSE 1000000 - m10 END)
        |        * (CASE WHEN a1 THEN m11 ELSE 1000000 - m11 END)
        |        * (CASE WHEN a2 THEN m12 ELSE 1000000 - m12 END)
        |        * (CASE WHEN a3 THEN m13 ELSE 1000000 - m13 END)
        |          AS DOUBLE)
        |      / (CAST(CAST(pp1 AS HUGEINT)
        |        * (CASE WHEN a0 THEN m10 ELSE 1000000 - m10 END)
        |        * (CASE WHEN a1 THEN m11 ELSE 1000000 - m11 END)
        |        * (CASE WHEN a2 THEN m12 ELSE 1000000 - m12 END)
        |        * (CASE WHEN a3 THEN m13 ELSE 1000000 - m13 END)
        |          AS DOUBLE)
        |        + CAST(CAST(1000000 - pp1 AS HUGEINT)
        |        * (CASE WHEN a0 THEN u10 ELSE 1000000 - u10 END)
        |        * (CASE WHEN a1 THEN u11 ELSE 1000000 - u11 END)
        |        * (CASE WHEN a2 THEN u12 ELSE 1000000 - u12 END)
        |        * (CASE WHEN a3 THEN u13 ELSE 1000000 - u13 END)
        |          AS DOUBLE))) AS BIGINT) AS gam
        |  FROM cs CROSS JOIN p1),
        |m2 AS (
        |  SELECT sum(CAST(gam AS HUGEINT) * cnt) AS wm,
        |    sum(CAST(1000000 - gam AS HUGEINT) * cnt) AS wu,
        |    sum(CAST(cnt AS HUGEINT) * 1000000) AS tot,
        |    sum(CASE WHEN a0 THEN CAST(gam AS HUGEINT) * cnt
        |      ELSE 0 END) AS wma0,
        |    sum(CASE WHEN a1 THEN CAST(gam AS HUGEINT) * cnt
        |      ELSE 0 END) AS wma1,
        |    sum(CASE WHEN a2 THEN CAST(gam AS HUGEINT) * cnt
        |      ELSE 0 END) AS wma2,
        |    sum(CASE WHEN a3 THEN CAST(gam AS HUGEINT) * cnt
        |      ELSE 0 END) AS wma3,
        |    sum(CASE WHEN a0 THEN CAST(1000000 - gam AS HUGEINT)
        |      * cnt ELSE 0 END) AS wua0,
        |    sum(CASE WHEN a1 THEN CAST(1000000 - gam AS HUGEINT)
        |      * cnt ELSE 0 END) AS wua1,
        |    sum(CASE WHEN a2 THEN CAST(1000000 - gam AS HUGEINT)
        |      * cnt ELSE 0 END) AS wua2,
        |    sum(CASE WHEN a3 THEN CAST(1000000 - gam AS HUGEINT)
        |      * cnt ELSE 0 END) AS wua3
        |  FROM g2),
        |p2 AS (
        |  SELECT
        |    CAST(round(1e6 * CAST(wm AS DOUBLE) / CAST(tot AS DOUBLE))
        |      AS BIGINT) AS pp2,
        |    CASE WHEN wm > 0 THEN CAST(round(1e6
        |      * CAST(wma0 AS DOUBLE) / CAST(wm AS DOUBLE)) AS BIGINT)
        |      ELSE 500000 END AS m20,
        |    CASE WHEN wm > 0 THEN CAST(round(1e6
        |      * CAST(wma1 AS DOUBLE) / CAST(wm AS DOUBLE)) AS BIGINT)
        |      ELSE 500000 END AS m21,
        |    CASE WHEN wm > 0 THEN CAST(round(1e6
        |      * CAST(wma2 AS DOUBLE) / CAST(wm AS DOUBLE)) AS BIGINT)
        |      ELSE 500000 END AS m22,
        |    CASE WHEN wm > 0 THEN CAST(round(1e6
        |      * CAST(wma3 AS DOUBLE) / CAST(wm AS DOUBLE)) AS BIGINT)
        |      ELSE 500000 END AS m23,
        |    CASE WHEN wu > 0 THEN CAST(round(1e6
        |      * CAST(wua0 AS DOUBLE) / CAST(wu AS DOUBLE)) AS BIGINT)
        |      ELSE 500000 END AS u20,
        |    CASE WHEN wu > 0 THEN CAST(round(1e6
        |      * CAST(wua1 AS DOUBLE) / CAST(wu AS DOUBLE)) AS BIGINT)
        |      ELSE 500000 END AS u21,
        |    CASE WHEN wu > 0 THEN CAST(round(1e6
        |      * CAST(wua2 AS DOUBLE) / CAST(wu AS DOUBLE)) AS BIGINT)
        |      ELSE 500000 END AS u22,
        |    CASE WHEN wu > 0 THEN CAST(round(1e6
        |      * CAST(wua3 AS DOUBLE) / CAST(wu AS DOUBLE)) AS BIGINT)
        |      ELSE 500000 END AS u23
        |  FROM m2)
        |SELECT 'all' AS g, f.field, p1.np AS n_pairs,
        |  p1.pp1 AS p1_micro, f.m1 AS m1_micro, f.u1 AS u1_micro,
        |  p2.pp2 AS p2_micro, f.m2 AS m2_micro, f.u2 AS u2_micro
        |FROM p1 CROSS JOIN p2 CROSS JOIN (
        |  SELECT 'nation_eq' AS field, m10 AS m1, u10 AS u1,
        |    m20 AS m2, u20 AS u2 FROM p1 CROSS JOIN p2
        |  UNION ALL
        |  SELECT 'seg_eq', m11, u11, m21, u21 FROM p1 CROSS JOIN p2
        |  UNION ALL
        |  SELECT 'bal_eq', m12, u12, m22, u22 FROM p1 CROSS JOIN p2
        |  UNION ALL
        |  SELECT 'name_eq', m13, u13, m23, u23
        |  FROM p1 CROSS JOIN p2) f"""
        .stripMargin,

    "q422_lepage" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v,
        |    user_id % 4 = 0 AS a
        |  FROM events WHERE value IS NOT NULL),
        |c AS (
        |  SELECT g, v,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM b GROUP BY 1, 2),
        |c2 AS (SELECT g, v, ca, cb, ca + cb AS c FROM c),
        |t AS (
        |  SELECT g, CAST(sum(ca) AS BIGINT) AS n_a,
        |    CAST(sum(cb) AS BIGINT) AS n_b
        |  FROM c2 GROUP BY 1),
        |r AS (
        |  SELECT g, v, ca, cb, c,
        |    sum(c) OVER (PARTITION BY g ORDER BY v) AS cum
        |  FROM c2),
        |u AS (
        |  SELECT r.g, ca, cb, c, t.n_a, t.n_b, t.n_a + t.n_b AS nt,
        |    2 * (cum - c) + c + 1 AS m2,
        |    least(2 * (cum - c) + c + 1,
        |      2 * (t.n_a + t.n_b + 1) - (2 * (cum - c) + c + 1))
        |      AS s2
        |  FROM r JOIN t ON r.g = t.g),
        |agg AS (
        |  SELECT g, max(n_a) AS n_a, max(n_b) AS n_b,
        |    max(nt) AS nn,
        |    sum(CAST(ca AS HUGEINT) * m2) AS r2a,
        |    sum(CAST(c AS HUGEINT) * c * c - c) AS ties,
        |    sum(CAST(ca AS HUGEINT) * s2) AS ab2,
        |    sum(CAST(c AS HUGEINT) * s2) AS ss,
        |    sum(CAST(c AS HUGEINT) * s2 * s2) AS ssq
        |  FROM u GROUP BY 1),
        |f AS (
        |  SELECT g, n_a, n_b,
        |    (CAST(r2a - n_a * (n_a + 1) AS DOUBLE)
        |      - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
        |      / (2.0 * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
        |        / 12.0 * (CAST(nn AS DOUBLE) + 1.0
        |          - CAST(ties AS DOUBLE) / (CAST(nn AS DOUBLE)
        |            * (CAST(nn AS DOUBLE) - 1.0))))) AS zw,
        |    CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
        |      * (CAST(nn AS DOUBLE) + 1.0 - CAST(ties AS DOUBLE)
        |        / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)))
        |      AS sigma2,
        |    (CAST(ab2 AS DOUBLE) - CAST(n_a AS DOUBLE)
        |      * CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))
        |      / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
        |        * (CAST(nn AS DOUBLE) * CAST(ssq AS DOUBLE)
        |          - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
        |        / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
        |          * (CAST(nn AS DOUBLE) - 1.0))) AS zab,
        |    CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
        |      * (CAST(nn AS DOUBLE) * CAST(ssq AS DOUBLE)
        |        - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
        |      / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
        |        * (CAST(nn AS DOUBLE) - 1.0)) AS var2
        |  FROM agg)
        |SELECT g AS event_type, n_a, n_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND sigma2 > 0 AND var2 > 0
        |    THEN CAST(round(1e6 * (zw * zw + zab * zab)) AS BIGINT)
        |    END AS l_micro,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND sigma2 > 0 AND var2 > 0
        |    THEN CAST(round(1e6 * (zw * zw + zab * zab)) AS BIGINT)
        |      > 5991465 END AS significant
        |FROM f"""
        .stripMargin,

    "q423_rmst" ->
      (s"""WITH km AS (
          |$kaplanMeierOracleSql
          |)
          |""".stripMargin +
        """, seg AS (
          |  SELECT cohort, t, log_surv_mnat,
          |    CAST(row_number() OVER (PARTITION BY cohort ORDER BY t)
          |      AS BIGINT) AS rnk,
          |    COALESCE(lead(t) OVER (PARTITION BY cohort ORDER BY t),
          |      20) AS tnext
          |  FROM km),
          |ar AS (
          |  SELECT cohort,
          |    CASE WHEN log_surv_mnat IS NULL THEN 0
          |      ELSE CAST(round(1e6
          |        * exp(CAST(log_surv_mnat AS DOUBLE) / 1e6)
          |        * CAST(greatest(0, least(tnext, 20)
          |          - least(t, 20)) AS DOUBLE)) AS BIGINT) END
          |    + CASE WHEN rnk = 1 THEN least(t, 20) * 1000000
          |      ELSE 0 END AS area
          |  FROM seg)
          |SELECT cohort, CAST(20 AS BIGINT) AS tau,
          |  CAST(sum(area) AS BIGINT) AS rmst_micro
          |FROM ar GROUP BY cohort""".stripMargin),

    "q424_hnsw_build" -> hnswBuildSql,
    "q425_hnsw_recall" -> hnswRecallSql,

    // Pettitt: midranks via rank()/count() windows, U_t = t(n+1) -
    // prefix(r2), argmax |U| earliest-t — all integers.
    "q426_pettitt" ->
      """WITH b AS (
        |  SELECT user_id AS k, epoch_ms(ts) AS ts_ms, event_id AS id,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |m AS (
        |  SELECT k,
        |    2 * (rank() OVER (PARTITION BY k ORDER BY v) - 1)
        |      + count(*) OVER (PARTITION BY k, v) + 1 AS r2,
        |    row_number() OVER (PARTITION BY k ORDER BY ts_ms, id) AS t,
        |    count(*) OVER (PARTITION BY k) AS n
        |  FROM b),
        |u AS (
        |  SELECT k, n, t,
        |    t * (n + 1) - sum(r2) OVER (PARTITION BY k ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS uv
        |  FROM m)
        |SELECT k AS user_id, CAST(n AS BIGINT) AS n,
        |  t AS t_star, CAST(uv AS BIGINT) AS u_at_t,
        |  CAST(abs(uv) AS BIGINT) AS k_stat
        |FROM u WHERE t < n
        |QUALIFY row_number() OVER (PARTITION BY k
        |  ORDER BY abs(uv) DESC, t) = 1""".stripMargin,

    // Turning point: triple self-join on row number, exact z via the
    // mirrored clamped isqrt.
    "q427_turning_point" ->
      ("""WITH b AS (
        |  SELECT user_id AS k, epoch_ms(ts) AS ts_ms, event_id AS id,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT k, v,
        |    row_number() OVER (PARTITION BY k ORDER BY ts_ms, id) AS t,
        |    count(*) OVER (PARTITION BY k) AS n
        |  FROM b),
        |tp AS (
        |  SELECT a.k, CAST(sum(CASE WHEN (p.v < a.v AND nx.v < a.v)
        |      OR (p.v > a.v AND nx.v > a.v) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_turning
        |  FROM r a JOIN r p ON p.k = a.k AND p.t = a.t - 1
        |    JOIN r nx ON nx.k = a.k AND nx.t = a.t + 1
        |  GROUP BY a.k),
        |j AS (
        |  SELECT g.k, g.n, COALESCE(tp.n_turning, 0) AS n_turning
        |  FROM (SELECT k, CAST(max(t) AS BIGINT) AS n FROM r GROUP BY k) g
        |  LEFT JOIN tp ON tp.k = g.k),
        |qq AS (
        |  SELECT k, n, n_turning,
        |    3 * n_turning - 2 * n + 4 < 0 AS neg,
        |    CASE WHEN n >= 3 THEN
        |      (CAST(40000000000000 AS HUGEINT)
        |        * (3 * n_turning - 2 * n + 4)
        |        * (3 * n_turning - 2 * n + 4)) // (16 * n - 29)
        |    END AS q4
        |  FROM j),
        |""".stripMargin +
        zFromQSql("qq", Seq("k", "n", "n_turning")) + """
        |SELECT k AS user_id, n, n_turning, z_micro FROM zfin"""
          .stripMargin),

    // Cox-Stuart: fold at (n+1)//2, sign census, exact binomial z.
    "q428_cox_stuart" ->
      ("""WITH b AS (
        |  SELECT user_id AS k, epoch_ms(ts) AS ts_ms, event_id AS id,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT k, v,
        |    row_number() OVER (PARTITION BY k ORDER BY ts_ms, id) AS t,
        |    count(*) OVER (PARTITION BY k) AS n
        |  FROM b),
        |f AS (
        |  SELECT a.k,
        |    CAST(sum(CASE WHEN s.v > a.v THEN 1 ELSE 0 END) AS BIGINT)
        |      AS s_plus,
        |    CAST(sum(CASE WHEN s.v <> a.v THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_eff
        |  FROM r a JOIN r s ON s.k = a.k AND s.t = a.t + (a.n + 1) // 2
        |  WHERE a.t <= a.n // 2
        |  GROUP BY a.k),
        |j AS (
        |  SELECT g.k, g.n, COALESCE(f.n_eff, 0) AS n_eff,
        |    COALESCE(f.s_plus, 0) AS s_plus
        |  FROM (SELECT k, CAST(max(t) AS BIGINT) AS n FROM r GROUP BY k) g
        |  LEFT JOIN f ON f.k = g.k),
        |qq AS (
        |  SELECT k, n, n_eff, s_plus,
        |    2 * s_plus - n_eff < 0 AS neg,
        |    CASE WHEN n_eff > 0 THEN
        |      (CAST(4000000000000 AS HUGEINT)
        |        * (2 * s_plus - n_eff) * (2 * s_plus - n_eff)) // n_eff
        |    END AS q4
        |  FROM j),
        |""".stripMargin +
        zFromQSql("qq", Seq("k", "n", "n_eff", "s_plus")) + """
        |SELECT k AS user_id, n, n_eff, s_plus, z_micro FROM zfin"""
          .stripMargin),

    // Bartels rank von Neumann: doubled midranks, consecutive
    // difference census, exact half-up micro via HUGEINT floor div.
    "q429_bartels_rank" ->
      """WITH b AS (
        |  SELECT user_id AS k, epoch_ms(ts) AS ts_ms, event_id AS id,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |m AS (
        |  SELECT k,
        |    2 * (rank() OVER (PARTITION BY k ORDER BY v) - 1)
        |      + count(*) OVER (PARTITION BY k, v) + 1 AS r2,
        |    row_number() OVER (PARTITION BY k ORDER BY ts_ms, id) AS t
        |  FROM b),
        |nm AS (
        |  SELECT a.k,
        |    sum(CAST(a.r2 - x.r2 AS HUGEINT) * (a.r2 - x.r2)) AS num
        |  FROM m a JOIN m x ON x.k = a.k AND x.t = a.t + 1
        |  GROUP BY a.k),
        |st AS (
        |  SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(r2 AS HUGEINT)) AS s1,
        |    sum(CAST(r2 AS HUGEINT) * r2) AS s2
        |  FROM m GROUP BY k)
        |SELECT st.k AS user_id, st.n,
        |  CASE WHEN st.n >= 2 AND st.n * s2 - s1 * s1 > 0
        |      AND nm.num IS NOT NULL
        |    THEN CAST((CAST(2000000 AS HUGEINT) * (st.n * nm.num)
        |        + (st.n * s2 - s1 * s1))
        |      // (2 * (st.n * s2 - s1 * s1)) AS BIGINT)
        |  END AS rvn_micro
        |FROM st LEFT JOIN nm ON nm.k = st.k""".stripMargin,

    // Goodman-Kruskal gamma: contingency-cell pair algebra, exact
    // half-up of |C-D|/(C+D) with the sign reapplied.
    "q430_gk_gamma" ->
      """WITH c AS (
        |  SELECT l_returnflag AS g,
        |    CAST(l_linenumber AS BIGINT) AS x,
        |    CAST(floor(CAST(l_quantity AS DOUBLE) / 10.0) AS BIGINT)
        |      AS y,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem
        |  WHERE l_linenumber IS NOT NULL AND l_quantity IS NOT NULL
        |  GROUP BY 1, 2, 3),
        |cd AS (
        |  SELECT a.g,
        |    sum(CASE WHEN b.y > a.y
        |      THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS conc,
        |    sum(CASE WHEN b.y < a.y
        |      THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS disc
        |  FROM c a JOIN c b ON b.g = a.g AND b.x > a.x
        |  GROUP BY a.g),
        |np AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY g)
        |SELECT np.g AS l_returnflag, np.n,
        |  CAST(COALESCE(cd.conc, 0) AS BIGINT) AS concordant,
        |  CAST(COALESCE(cd.disc, 0) AS BIGINT) AS discordant,
        |  CASE WHEN COALESCE(cd.conc, 0) + COALESCE(cd.disc, 0) > 0
        |    THEN CASE WHEN cd.conc < cd.disc THEN -1 ELSE 1 END
        |      * CAST((CAST(2000000 AS HUGEINT)
        |          * abs(cd.conc - cd.disc) + (cd.conc + cd.disc))
        |        // (2 * (cd.conc + cd.disc)) AS BIGINT)
        |  END AS gamma_micro
        |FROM np LEFT JOIN cd ON cd.g = np.g""".stripMargin,

    // Kendall's W: within-rater doubled midranks, item rank totals,
    // tie-corrected denominator, exact half-up micro.
    "q432_kendall_w" ->
      """WITH pre AS (
        |  SELECT event_type AS g, user_id % 5 AS r, event_id % 8 AS i,
        |    min(value) AS value
        |  FROM events GROUP BY 1, 2, 3),
        |b AS (
        |  SELECT g, r, i,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM pre WHERE value IS NOT NULL),
        |ni AS (SELECT g, CAST(count(DISTINCT i) AS BIGINT) AS n_items
        |  FROM b GROUP BY 1),
        |rc AS (
        |  SELECT b.g, b.r, CAST(count(*) AS BIGINT) AS cnt,
        |    ni.n_items
        |  FROM b JOIN ni ON ni.g = b.g GROUP BY b.g, b.r, ni.n_items),
        |drp AS (
        |  SELECT g, CAST(sum(CASE WHEN cnt <> n_items THEN 1 ELSE 0
        |    END) AS BIGINT) AS n_dropped_raters
        |  FROM rc GROUP BY 1),
        |rws AS (
        |  SELECT b.* FROM b JOIN rc ON rc.g = b.g AND rc.r = b.r
        |    AND rc.cnt = rc.n_items),
        |mr AS (
        |  SELECT a.g, a.r, a.i, a.v,
        |    2 * CAST(sum(CASE WHEN o.v < a.v THEN 1 ELSE 0 END)
        |      AS BIGINT)
        |      + CAST(sum(CASE WHEN o.v = a.v THEN 1 ELSE 0 END)
        |        AS BIGINT) + 1 AS r2,
        |    CAST(sum(CASE WHEN o.v = a.v THEN 1 ELSE 0 END)
        |      AS BIGINT) AS eq
        |  FROM rws a JOIN rws o ON o.g = a.g AND o.r = a.r
        |  GROUP BY a.g, a.r, a.i, a.v),
        |rt AS (SELECT g, i, CAST(sum(r2) AS HUGEINT) AS rr2
        |  FROM mr GROUP BY 1, 2),
        |tsum AS (
        |  SELECT g, sum(CAST(eq AS HUGEINT) * eq * eq - eq) AS tt
        |  FROM (SELECT DISTINCT g, r, v, eq FROM mr) GROUP BY 1),
        |mp AS (SELECT g, CAST(count(*) AS BIGINT) AS n_raters
        |  FROM rc WHERE cnt = n_items GROUP BY 1),
        |nm AS (
        |  SELECT rt.g,
        |    sum(CAST(3 AS HUGEINT)
        |      * (rt.rr2 - CAST(mp.n_raters AS HUGEINT)
        |        * (ni.n_items + 1))
        |      * (rt.rr2 - CAST(mp.n_raters AS HUGEINT)
        |        * (ni.n_items + 1))) AS num
        |  FROM rt JOIN mp USING (g) JOIN ni USING (g)
        |  GROUP BY rt.g),
        |dn AS (
        |  SELECT mp.g,
        |    CAST(mp.n_raters AS HUGEINT) * mp.n_raters
        |      * (CAST(ni.n_items AS HUGEINT) * ni.n_items * ni.n_items
        |        - ni.n_items)
        |      - CAST(mp.n_raters AS HUGEINT) * tsum.tt AS den
        |  FROM mp JOIN ni USING (g) JOIN tsum USING (g))
        |SELECT ni.g AS event_type, ni.n_items,
        |  CAST(COALESCE(mp.n_raters, 0) AS BIGINT) AS n_raters,
        |  drp.n_dropped_raters,
        |  CASE WHEN mp.n_raters >= 2 AND ni.n_items >= 2
        |      AND dn.den > 0 AND nm.num IS NOT NULL
        |    THEN CAST((CAST(2000000 AS HUGEINT) * nm.num + dn.den)
        |      // (2 * dn.den) AS BIGINT)
        |  END AS w_micro
        |FROM ni JOIN drp USING (g)
        |LEFT JOIN mp USING (g) LEFT JOIN tsum USING (g)
        |LEFT JOIN nm USING (g) LEFT JOIN dn USING (g)""".stripMargin,

    // Mood scale: doubled pooled midranks, exact T4 closed form,
    // two-step exact floor + clamped isqrt z.
    "q433_mood_scale" ->
      ("""WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v,
        |    user_id % 2 = 0 AS a
        |  FROM events WHERE value IS NOT NULL),
        |c AS (
        |  SELECT g, v,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM b GROUP BY 1, 2),
        |r AS (
        |  SELECT g, v, ca, cb, ca + cb AS c,
        |    sum(ca + cb) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM c),
        |st AS (
        |  SELECT g, CAST(sum(ca) AS BIGINT) AS n_a,
        |    CAST(sum(cb) AS BIGINT) AS n_b,
        |    sum(CAST(ca AS HUGEINT) * (2 * (cum - c) + c + 1)) AS sr,
        |    sum(CAST(ca AS HUGEINT) * (2 * (cum - c) + c + 1)
        |      * (2 * (cum - c) + c + 1)) AS sr2
        |  FROM r GROUP BY 1),
        |tt AS (
        |  SELECT g, n_a, n_b, n_a + n_b AS nn,
        |    sr2 - 2 * (CAST(n_a + n_b AS HUGEINT) + 1) * sr
        |      + CAST(n_a AS HUGEINT) * (n_a + n_b + 1)
        |        * (n_a + n_b + 1) AS t4
        |  FROM st),
        |dd AS (
        |  SELECT g, n_a, n_b, t4,
        |    3 * t4 - CAST(n_a AS HUGEINT)
        |      * (CAST(nn AS HUGEINT) * nn - 1) AS d,
        |    CAST(n_a AS HUGEINT) * n_b * (nn + 1)
        |      * (CAST(nn AS HUGEINT) * nn - 4) AS den
        |  FROM tt),
        |qq AS (
        |  SELECT g AS k, n_a, n_b, t4, d < 0 AS neg,
        |    CASE WHEN n_a > 0 AND n_b > 0 AND n_a + n_b >= 3 THEN
        |      CAST(5000000000000 AS HUGEINT) * ((d * d) // den)
        |        + (CAST(5000000000000 AS HUGEINT) * ((d * d) % den))
        |          // den
        |    END AS q4
        |  FROM dd),
        |""".stripMargin +
        zFromQSql("qq", Seq("k", "n_a", "n_b", "t4")) + """
        |SELECT k AS event_type, n_a, n_b, CAST(t4 AS BIGINT) AS t4,
        |  z_micro FROM zfin""".stripMargin),

    // Permutation entropy m=3: ordinal-pattern census, micro-nat
    // per-cell terms, exact sum, one final rounded divide.
    "q434_perm_entropy" ->
      """WITH b AS (
        |  SELECT user_id AS k, epoch_ms(ts) AS ts_ms, event_id AS id,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT k, v,
        |    row_number() OVER (PARTITION BY k ORDER BY ts_ms, id) AS t
        |  FROM b),
        |tr AS (
        |  SELECT c.k,
        |    3 * ((CASE WHEN p1.v < c.v THEN 1 ELSE 0 END)
        |       + (CASE WHEN p2.v < c.v THEN 1 ELSE 0 END))
        |    + (CASE WHEN c.v <= p1.v THEN 1 ELSE 0 END)
        |    + (CASE WHEN p2.v < p1.v THEN 1 ELSE 0 END) AS code
        |  FROM r c JOIN r p1 ON p1.k = c.k AND p1.t = c.t + 1
        |    JOIN r p2 ON p2.k = c.k AND p2.t = c.t + 2),
        |cen AS (SELECT k, code, CAST(count(*) AS BIGINT) AS c
        |  FROM tr GROUP BY 1, 2),
        |np AS (
        |  SELECT k, CAST(sum(c) AS BIGINT) AS n_triples,
        |    CAST(count(*) AS BIGINT) AS n_patterns
        |  FROM cen GROUP BY 1),
        |tm AS (
        |  SELECT cen.k,
        |    CAST(round(1e6 * CAST(cen.c AS DOUBLE)
        |      * ln(CAST(cen.c AS DOUBLE)
        |        / CAST(np.n_triples AS DOUBLE))) AS BIGINT) AS t
        |  FROM cen JOIN np USING (k)),
        |sm AS (SELECT k, CAST(sum(t) AS BIGINT) AS s FROM tm
        |  GROUP BY 1)
        |SELECT np.k AS user_id, np.n_triples, np.n_patterns,
        |  CAST(round(-CAST(sm.s AS DOUBLE)
        |    / CAST(np.n_triples AS DOUBLE)) AS BIGINT) AS h_mnat
        |FROM np JOIN sm USING (k)""".stripMargin,

    // Spectral entropy: composes the SHARED periodogram oracle, then
    // the permutation-entropy micro-nat discipline over bin powers.
    "q435_spectral_entropy" ->
      (s"""WITH pg AS (
        |$periodogramSql
        |),
        |p2 AS (SELECT user_id, n, power_micro FROM pg
        |  WHERE power_micro > 0),
        |tot AS (
        |  SELECT user_id, CAST(sum(power_micro) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n_bins,
        |    CAST(max(n) AS BIGINT) AS n
        |  FROM p2 GROUP BY 1),
        |tm AS (
        |  SELECT p2.user_id,
        |    CAST(round(1e6 * CAST(p2.power_micro AS DOUBLE)
        |      * ln(CAST(p2.power_micro AS DOUBLE)
        |        / CAST(tot.s AS DOUBLE))) AS BIGINT) AS t
        |  FROM p2 JOIN tot USING (user_id)),
        |sm AS (SELECT user_id, CAST(sum(t) AS BIGINT) AS s2 FROM tm
        |  GROUP BY 1)
        |SELECT tot.user_id, tot.n, tot.n_bins,
        |  CAST(round(-CAST(sm.s2 AS DOUBLE) / CAST(tot.s AS DOUBLE))
        |    AS BIGINT) AS h_mnat
        |FROM tot JOIN sm USING (user_id)""").stripMargin,

    // Dixon's Q: order statistics with duplicate-honoring second
    // extremes, exact half-up micro ratios.
    "q436_dixon_q" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |ext AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n, min(v) AS lo,
        |    max(v) AS hi
        |  FROM b GROUP BY 1),
        |st AS (
        |  SELECT b.g, max(ext.n) AS n, max(ext.lo) AS lo,
        |    max(ext.hi) AS hi,
        |    CAST(sum(CASE WHEN b.v = ext.lo THEN 1 ELSE 0 END)
        |      AS BIGINT) AS clo,
        |    CAST(sum(CASE WHEN b.v = ext.hi THEN 1 ELSE 0 END)
        |      AS BIGINT) AS chi,
        |    min(CASE WHEN b.v > ext.lo THEN b.v END) AS lo2,
        |    max(CASE WHEN b.v < ext.hi THEN b.v END) AS hi2
        |  FROM b JOIN ext ON ext.g = b.g GROUP BY b.g),
        |fin AS (
        |  SELECT g, n, hi - lo AS rng,
        |    (CASE WHEN clo > 1 THEN lo ELSE lo2 END) - lo AS gaplo,
        |    hi - (CASE WHEN chi > 1 THEN hi ELSE hi2 END) AS gaphi
        |  FROM st)
        |SELECT g AS event_type, n,
        |  CASE WHEN n >= 3 AND rng > 0
        |    THEN CAST((CAST(2000000 AS HUGEINT) * gaplo + rng)
        |      // (2 * CAST(rng AS HUGEINT)) AS BIGINT) END
        |    AS q_low_micro,
        |  CASE WHEN n >= 3 AND rng > 0
        |    THEN CAST((CAST(2000000 AS HUGEINT) * gaphi + rng)
        |      // (2 * CAST(rng AS HUGEINT)) AS BIGINT) END
        |    AS q_high_micro
        |FROM fin""".stripMargin,

    // Sample entropy: one template pair join serves both the B and
    // A counts; final ln of the exact integer ratio.
    "q437_sample_entropy" ->
      """WITH b AS (
        |  SELECT user_id AS k, epoch_ms(ts) AS ts_ms, event_id AS id,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT * FROM (
        |    SELECT k, v,
        |      row_number() OVER (PARTITION BY k ORDER BY ts_ms, id)
        |        AS t
        |    FROM b)
        |  WHERE t <= 256),
        |tpl AS (
        |  SELECT c.k, c.t, c.v AS v1, p1.v AS v2, p2.v AS v3
        |  FROM r c JOIN r p1 ON p1.k = c.k AND p1.t = c.t + 1
        |    JOIN r p2 ON p2.k = c.k AND p2.t = c.t + 2),
        |pr AS (
        |  SELECT a.k, CAST(count(*) AS BIGINT) AS b_pairs,
        |    CAST(sum(CASE WHEN abs(a.v3 - o.v3) <= 500 THEN 1 ELSE 0
        |      END) AS BIGINT) AS a_pairs
        |  FROM tpl a JOIN tpl o ON o.k = a.k AND a.t < o.t
        |    AND abs(a.v1 - o.v1) <= 500 AND abs(a.v2 - o.v2) <= 500
        |  GROUP BY a.k),
        |nu AS (SELECT k, CAST(max(t) AS BIGINT) AS n_used FROM r
        |  GROUP BY k)
        |SELECT nu.k AS user_id, nu.n_used,
        |  COALESCE(pr.b_pairs, 0) AS b_pairs,
        |  COALESCE(pr.a_pairs, 0) AS a_pairs,
        |  CASE WHEN pr.b_pairs > 0 AND pr.a_pairs > 0
        |    THEN CAST(round(1e6 * ln(CAST(pr.b_pairs AS DOUBLE)
        |      / CAST(pr.a_pairs AS DOUBLE))) AS BIGINT)
        |  END AS sampen_mnat
        |FROM nu LEFT JOIN pr ON pr.k = nu.k""".stripMargin,

    // Quade: doubled midranks for both rankings (within-block and
    // block-range weights), fully integer F, exact half-up micro.
    "q438_quade" ->
      """WITH pre AS (
        |  SELECT event_type AS g, user_id % 7 AS b, event_id % 3 AS t,
        |    min(value) AS value
        |  FROM events GROUP BY 1, 2, 3),
        |base AS (
        |  SELECT g, b, t,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM pre WHERE value IS NOT NULL),
        |kp AS (SELECT g, CAST(count(DISTINCT t) AS BIGINT) AS k
        |  FROM base GROUP BY 1),
        |blk AS (
        |  SELECT base.g, base.b, CAST(count(*) AS BIGINT) AS cnt,
        |    max(v) - min(v) AS rng, max(kp.k) AS k
        |  FROM base JOIN kp ON kp.g = base.g GROUP BY base.g, base.b),
        |drp AS (
        |  SELECT g, CAST(sum(CASE WHEN cnt <> k THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dropped_blocks
        |  FROM blk GROUP BY 1),
        |kept AS (SELECT g, b, rng FROM blk WHERE cnt = k),
        |qw AS (
        |  SELECT g, b,
        |    2 * (rank() OVER (PARTITION BY g ORDER BY rng) - 1)
        |      + count(*) OVER (PARTITION BY g, rng) + 1 AS q2
        |  FROM kept),
        |rws AS (
        |  SELECT base.* FROM base
        |  JOIN kept ON kept.g = base.g AND kept.b = base.b),
        |mr AS (
        |  SELECT a.g, a.b, a.t,
        |    2 * CAST(sum(CASE WHEN o.v < a.v THEN 1 ELSE 0 END)
        |      AS BIGINT)
        |      + CAST(sum(CASE WHEN o.v = a.v THEN 1 ELSE 0 END)
        |        AS BIGINT) + 1 AS r2
        |  FROM rws a JOIN rws o ON o.g = a.g AND o.b = a.b
        |  GROUP BY a.g, a.b, a.t, a.v),
        |tf AS (
        |  SELECT mr.g, mr.b, mr.t,
        |    CAST(qw.q2 AS HUGEINT) * (mr.r2 - kp.k - 1) AS t4
        |  FROM mr JOIN qw ON qw.g = mr.g AND qw.b = mr.b
        |    JOIN kp ON kp.g = mr.g),
        |aa AS (SELECT g, sum(t4 * t4) AS a16 FROM tf GROUP BY 1),
        |ss AS (SELECT g, t, sum(t4) AS s4 FROM tf GROUP BY 1, 2),
        |bb AS (SELECT g, sum(s4 * s4) AS sb FROM ss GROUP BY 1),
        |np AS (SELECT g, CAST(count(*) AS BIGINT) AS n_blocks
        |  FROM kept GROUP BY 1)
        |SELECT kp.g AS event_type, kp.k,
        |  CAST(COALESCE(np.n_blocks, 0) AS BIGINT) AS n_blocks,
        |  drp.n_dropped_blocks,
        |  CASE WHEN np.n_blocks >= 2 AND kp.k >= 2
        |      AND CAST(np.n_blocks AS HUGEINT) * aa.a16 - bb.sb > 0
        |    THEN CAST((CAST(2000000 AS HUGEINT)
        |        * ((np.n_blocks - 1) * bb.sb)
        |        + (CAST(np.n_blocks AS HUGEINT) * aa.a16 - bb.sb))
        |      // (2 * (CAST(np.n_blocks AS HUGEINT) * aa.a16 - bb.sb))
        |      AS BIGINT)
        |  END AS f_micro
        |FROM kp JOIN drp USING (g)
        |LEFT JOIN np USING (g) LEFT JOIN aa USING (g)
        |LEFT JOIN bb USING (g)""".stripMargin,

    // Grubbs: D = max|n*v - sum|, exact G via the clamped isqrt.
    "q431_grubbs" ->
      ("""WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |st AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(v AS HUGEINT)) AS s1,
        |    sum(CAST(v AS HUGEINT) * v) AS s2
        |  FROM b GROUP BY g),
        |md AS (
        |  SELECT b.g, max(abs(CAST(st.n AS HUGEINT) * b.v - st.s1))
        |    AS d
        |  FROM b JOIN st ON st.g = b.g GROUP BY b.g),
        |qq AS (
        |  SELECT st.g AS k, st.n, false AS neg,
        |    CASE WHEN st.n >= 3 AND st.n * s2 - s1 * s1 > 0 THEN
        |      (CAST(4000000000000 AS HUGEINT) * (md.d * md.d)
        |        * (st.n - 1)) // (st.n * (st.n * s2 - s1 * s1))
        |    END AS q4
        |  FROM st JOIN md ON md.g = st.g),
        |""".stripMargin +
        zFromQSql("qq", Seq("k", "n")) + """
        |SELECT k AS event_type, n, z_micro AS g_micro FROM zfin"""
          .stripMargin),

    "q390_partial_corr" ->
      """WITH b AS (
        |  SELECT l_returnflag AS g,
        |    CAST(round(CAST(l_quantity AS DOUBLE) * 1e3) AS BIGINT) AS x,
        |    CAST(round(CAST(l_extendedprice AS DOUBLE) * 1e3) AS BIGINT) AS y,
        |    CAST(round(CAST(l_discount AS DOUBLE) * 1e3) AS BIGINT) AS z
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL),
        |s AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(z AS HUGEINT)) AS sz,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy,
        |    sum(CAST(z AS HUGEINT) * z) AS szz,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * z) AS sxz,
        |    sum(CAST(y AS HUGEINT) * z) AS syz
        |  FROM b GROUP BY 1),
        |r AS (
        |  SELECT g, n, CAST(n AS DOUBLE) AS nd,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rxy,
        |    (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
        |      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS rxz,
        |    (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
        |      / sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
        |        * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS ryz,
        |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0.0
        |      AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0.0
        |      AND (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)) > 0.0
        |      AS var_ok
        |  FROM s)
        |SELECT g AS l_returnflag, n,
        |  CASE WHEN n >= 3 AND var_ok
        |    THEN CAST(round(1e6 * rxy) AS BIGINT) END AS rxy_micro,
        |  CASE WHEN n >= 3 AND var_ok
        |    THEN CAST(round(1e6 * rxz) AS BIGINT) END AS rxz_micro,
        |  CASE WHEN n >= 3 AND var_ok
        |    THEN CAST(round(1e6 * ryz) AS BIGINT) END AS ryz_micro,
        |  CASE WHEN n >= 3 AND var_ok
        |      AND sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)) > 0.0
        |    THEN CAST(round(1e6 * ((rxy - rxz * ryz)
        |      / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))))
        |      AS BIGINT) END AS partial_micro
        |FROM r""".stripMargin,

    "q391_cramers_v" ->
      """WITH base AS (
        |  SELECT CAST(source AS VARCHAR) AS a,
        |    CAST(lang AS VARCHAR) AS b
        |  FROM documents),
        |cells AS (
        |  SELECT a, b, CAST(count(*) AS BIGINT) AS o
        |  FROM base GROUP BY 1, 2),
        |ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS ma FROM cells GROUP BY 1),
        |cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS mb FROM cells GROUP BY 1),
        |tot AS (
        |  SELECT (SELECT CAST(sum(o) AS BIGINT) FROM cells) AS n,
        |    (SELECT CAST(count(*) AS BIGINT) FROM ra) AS r,
        |    (SELECT CAST(count(*) AS BIGINT) FROM cb) AS c),
        |grid AS (SELECT ra.a, cb.b, ra.ma, cb.mb FROM ra, cb),
        |terms AS (
        |  SELECT CAST(round(1e6 *
        |      (CAST(COALESCE(cells.o, 0) AS DOUBLE)
        |        - CAST(g.ma AS DOUBLE) * CAST(g.mb AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |      * (CAST(COALESCE(cells.o, 0) AS DOUBLE)
        |        - CAST(g.ma AS DOUBLE) * CAST(g.mb AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |      / (CAST(g.ma AS DOUBLE) * CAST(g.mb AS DOUBLE) / CAST(tot.n AS DOUBLE)))
        |    AS BIGINT) AS t
        |  FROM grid g
        |  LEFT JOIN cells ON cells.a IS NOT DISTINCT FROM g.a
        |    AND cells.b IS NOT DISTINCT FROM g.b, tot),
        |chi AS (SELECT CAST(sum(t) AS BIGINT) AS chi2_micro FROM terms)
        |SELECT tot.n, tot.r, tot.c, chi.chi2_micro,
        |  CASE WHEN least(tot.r, tot.c) >= 2 THEN
        |    CAST(round(1e6 * sqrt(CAST(chi.chi2_micro AS DOUBLE) / 1e6
        |      / (CAST(tot.n AS DOUBLE)
        |        * CAST(least(tot.r, tot.c) - 1 AS DOUBLE))))
        |      AS BIGINT) END AS v_micro
        |FROM tot, chi""".stripMargin,

    "q380_theil_sen" ->
      """WITH b AS (
        |  SELECT l_returnflag AS g,
        |    CAST(round(CAST(l_quantity AS DOUBLE) * 1e6) AS BIGINT)
        |      AS x,
        |    CAST(round(CAST(l_extendedprice AS DOUBLE) * 1e6)
        |      AS BIGINT) AS y,
        |    l_orderkey * 10 + l_linenumber AS rid
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL),
        |r AS (
        |  SELECT g, x, y,
        |    row_number() OVER (PARTITION BY g ORDER BY rid, x, y)
        |      AS rk
        |  FROM b
        |  QUALIFY rk <= 512),
        |sl AS (
        |  SELECT a.g,
        |    CAST(round(1e6 * CAST(t.y - a.y AS DOUBLE)
        |      / CAST(t.x - a.x AS DOUBLE)) AS BIGINT) AS s
        |  FROM r a JOIN r t
        |    ON a.g = t.g AND a.rk < t.rk AND a.x <> t.x),
        |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n_pairs FROM sl
        |  GROUP BY 1),
        |slope AS (
        |  SELECT p.g, p.s AS slope_micro FROM (
        |    SELECT g, s,
        |      row_number() OVER (PARTITION BY g ORDER BY s) AS rn
        |    FROM sl) p
        |  JOIN m ON p.g = m.g AND p.rn = (m.n_pairs + 1) // 2),
        |resid AS (
        |  SELECT r.g,
        |    y - CAST(round(CAST(slope_micro AS DOUBLE)
        |      * CAST(x AS DOUBLE) / 1e6) AS BIGINT) AS rr
        |  FROM r JOIN slope ON r.g = slope.g),
        |np AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM r
        |  GROUP BY 1),
        |icept AS (
        |  SELECT p.g, p.rr AS intercept_micro FROM (
        |    SELECT g, rr,
        |      row_number() OVER (PARTITION BY g ORDER BY rr) AS rn
        |    FROM resid) p
        |  JOIN np ON p.g = np.g AND p.rn = (np.n + 1) // 2)
        |SELECT np.g AS l_returnflag, n, n_pairs, slope_micro,
        |  intercept_micro
        |FROM np JOIN m ON np.g = m.g
        |JOIN slope ON np.g = slope.g JOIN icept ON np.g = icept.g"""
        .stripMargin,

    "q379_rater_reliability" ->
      s"""WITH $ratingsFixtureSql,
         |b AS (
         |  SELECT source AS g, item AS s, rater AS i,
         |    CASE WHEN label = 'pos' THEN 1000000 ELSE 0 END AS v
         |  FROM r),
         |kp AS (SELECT g, CAST(count(DISTINCT i) AS BIGINT) AS k
         |  FROM b GROUP BY 1),
         |ps AS (
         |  SELECT b.g, s, CAST(count(*) AS BIGINT) AS cnt,
         |    CAST(sum(v) AS BIGINT) AS st
         |  FROM b GROUP BY 1, 2),
         |cs AS (SELECT ps.g, s, st FROM ps JOIN kp ON ps.g = kp.g
         |  WHERE cnt = k),
         |dr AS (
         |  SELECT ps.g, CAST(sum(CASE WHEN cnt <> k THEN 1 ELSE 0
         |    END) AS BIGINT) AS n_dropped_subjects
         |  FROM ps JOIN kp ON ps.g = kp.g GROUP BY 1),
         |kept AS (SELECT b.* FROM b JOIN cs ON b.g = cs.g
         |  AND b.s = cs.s),
         |iv AS (
         |  SELECT g,
         |    sum(CAST(n AS HUGEINT) * qi
         |      - CAST(si AS HUGEINT) * si) AS visum,
         |    sum(qi) AS qx
         |  FROM (SELECT g, i, CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(v AS HUGEINT)) AS si,
         |    sum(CAST(v AS HUGEINT) * v) AS qi
         |    FROM kept GROUP BY 1, 2)
         |  GROUP BY 1),
         |sa AS (
         |  SELECT g, CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(st AS HUGEINT)) AS gt,
         |    sum(CAST(st AS HUGEINT) * st) AS qst
         |  FROM cs GROUP BY 1)
         |SELECT kp.g AS source, k, coalesce(n, 0) AS n_subjects,
         |  n_dropped_subjects,
         |  CASE WHEN k >= 2 AND n >= 2
         |    AND n * qst - gt * gt > 0 THEN
         |    CAST(round(1e6 * CAST(k AS DOUBLE)
         |      / CAST(k - 1 AS DOUBLE)
         |      * (1.0 - CAST(visum AS DOUBLE)
         |        / CAST(n * qst - gt * gt AS DOUBLE))) AS BIGINT)
         |  END AS alpha_micro,
         |  CASE WHEN k >= 2 AND n >= 2
         |    AND (CAST((n * k) * qst - k * (gt * gt) AS DOUBLE)
         |        / CAST((n * k) * (n - 1) AS DOUBLE)
         |      + CAST(k - 1 AS DOUBLE)
         |        * (CAST((n * k) * qx * k - (n * k) * qst AS DOUBLE)
         |          / CAST((n * k) * n * (k - 1) AS DOUBLE))) > 0.0
         |  THEN
         |    CAST(round(1e6
         |      * (CAST((n * k) * qst - k * (gt * gt) AS DOUBLE)
         |          / CAST((n * k) * (n - 1) AS DOUBLE)
         |        - CAST((n * k) * qx * k - (n * k) * qst AS DOUBLE)
         |          / CAST((n * k) * n * (k - 1) AS DOUBLE))
         |      / (CAST((n * k) * qst - k * (gt * gt) AS DOUBLE)
         |          / CAST((n * k) * (n - 1) AS DOUBLE)
         |        + CAST(k - 1 AS DOUBLE)
         |          * (CAST((n * k) * qx * k - (n * k) * qst
         |            AS DOUBLE)
         |            / CAST((n * k) * n * (k - 1) AS DOUBLE))))
         |      AS BIGINT)
         |  END AS icc_micro
         |FROM kp JOIN dr ON kp.g = dr.g
         |LEFT JOIN sa ON kp.g = sa.g
         |LEFT JOIN iv ON kp.g = iv.g""".stripMargin,

    "q378_yuen_test" ->
      """WITH b AS (
        |  SELECT source AS g, (lang = 'en') AS a,
        |    CAST(round(CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) AS v,
        |    doc_id AS tb
        |  FROM documents WHERE n_chars IS NOT NULL),
        |r AS (
        |  SELECT g, a, v,
        |    row_number() OVER (PARTITION BY g, a ORDER BY v, tb)
        |      AS rk
        |  FROM b),
        |np AS (
        |  SELECT g, a, CAST(count(*) AS BIGINT) AS n,
        |    CAST((count(*) * 200) // 1000 AS BIGINT) AS cut,
        |    CAST(count(*) - 2 * ((count(*) * 200) // 1000) AS BIGINT)
        |      AS h
        |  FROM r GROUP BY 1, 2),
        |bd AS (
        |  SELECT r.g, r.a,
        |    min(CASE WHEN rk = cut + 1 THEN v END) AS lo,
        |    min(CASE WHEN rk = n - cut THEN v END) AS hi
        |  FROM r JOIN np ON r.g = np.g AND r.a = np.a
        |  GROUP BY 1, 2),
        |arms AS (
        |  SELECT r.g, r.a, max(n) AS n, max(h) AS h,
        |    sum(CASE WHEN rk > cut AND rk <= n - cut
        |      THEN CAST(v AS HUGEINT) ELSE 0 END) AS ts,
        |    sum(CAST(greatest(lo, least(hi, v)) AS HUGEINT)) AS sw,
        |    sum(CAST(greatest(lo, least(hi, v)) AS HUGEINT)
        |      * greatest(lo, least(hi, v))) AS qw
        |  FROM r JOIN np ON r.g = np.g AND r.a = np.a
        |  JOIN bd ON r.g = bd.g AND r.a = bd.a
        |  GROUP BY 1, 2),
        |a2 AS (
        |  SELECT *,
        |    CASE WHEN h > 0 THEN CAST(round(CAST(ts AS DOUBLE)
        |      / CAST(h AS DOUBLE)) AS BIGINT) END AS tm,
        |    CASE WHEN h >= 2 THEN
        |      CAST(n * qw - sw * sw AS DOUBLE)
        |        / CAST(n * h * (h - 1) AS DOUBLE) END AS d
        |  FROM arms)
        |SELECT x.g AS source, x.n AS n_a, y.n AS n_b,
        |  x.h AS h_a, y.h AS h_b,
        |  x.tm AS tmean_a_micro, y.tm AS tmean_b_micro,
        |  CASE WHEN x.h >= 2 AND y.h >= 2 AND x.d + y.d > 0.0 THEN
        |    CAST(round(1e6 * CAST(x.tm - y.tm AS DOUBLE)
        |      / sqrt(x.d + y.d)) AS BIGINT) END AS t_micro,
        |  CASE WHEN x.h >= 2 AND y.h >= 2 AND x.d + y.d > 0.0 THEN
        |    CAST(round(1e6 * (x.d + y.d) * (x.d + y.d)
        |      / (x.d * x.d / CAST(x.h - 1 AS DOUBLE)
        |        + y.d * y.d / CAST(y.h - 1 AS DOUBLE))) AS BIGINT)
        |  END AS df_micro
        |FROM a2 x JOIN a2 y ON x.g = y.g AND x.a AND NOT y.a"""
        .stripMargin,

    "q377_cox_hazard" ->
      """WITH lv AS (
        |  SELECT CAST(user_id % 3 AS VARCHAR) AS g,
        |    CAST(datediff('day', min(CAST(ts AS DATE)),
        |      max(CAST(ts AS DATE))) AS BIGINT) AS t,
        |    max(CAST(ts AS DATE)) < DATE '2024-01-25' AS churned
        |  FROM events GROUP BY user_id
        |  HAVING CAST(user_id % 3 AS VARCHAR) IN ('0', '1')),
        |c AS (
        |  SELECT g, t,
        |    CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d,
        |    CAST(count(*) AS BIGINT) AS dc
        |  FROM lv GROUP BY 1, 2),
        |tots AS (SELECT g, CAST(sum(dc) AS BIGINT) AS N FROM c
        |  GROUP BY g),
        |grid AS (
        |  SELECT u.t, tots.g, tots.N,
        |    COALESCE(c.d, 0) AS d, COALESCE(c.dc, 0) AS dc
        |  FROM (SELECT DISTINCT t FROM c) u
        |  CROSS JOIN tots
        |  LEFT JOIN c ON c.g = tots.g AND c.t = u.t),
        |ar AS (
        |  SELECT t, g, d,
        |    N - (sum(dc) OVER (PARTITION BY g ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - dc)
        |      AS ar
        |  FROM grid),
        |tm AS (
        |  SELECT a.t, a.ar AS n1, b.ar AS n2, a.d AS d1, b.d AS d2,
        |    a.ar + b.ar AS n, a.d + b.d AS dt
        |  FROM ar a JOIN ar b ON b.t = a.t AND a.g = '0' AND b.g = '1'
        |  WHERE a.ar + b.ar > 0 AND a.d + b.d > 0),
        |q AS (
        |  SELECT d1,
        |    1000000 * d1 - CAST(round(1e6 * CAST(dt * n1 AS DOUBLE)
        |      / CAST(n AS DOUBLE)) AS BIGINT) AS u,
        |    CAST(round(1e6 * CAST(dt * n1 * n2 AS DOUBLE)
        |      / CAST(n * n AS DOUBLE)) AS BIGINT) AS i
        |  FROM tm),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_times,
        |    CAST(sum(d1) AS BIGINT) AS o1,
        |    CAST(sum(u) AS BIGINT) AS u_sum_micro,
        |    CAST(sum(i) AS BIGINT) AS i_sum_micro
        |  FROM q)
        |SELECT n_times, o1, u_sum_micro, i_sum_micro,
        |  CASE WHEN coalesce(i_sum_micro, 0) > 0 THEN
        |    CAST(round(1e6 * CAST(u_sum_micro AS DOUBLE)
        |      / CAST(i_sum_micro AS DOUBLE)) AS BIGINT) END
        |    AS beta_micro,
        |  CASE WHEN coalesce(i_sum_micro, 0) > 0 THEN
        |    CAST(round(1e6 * exp(CAST(CAST(round(1e6
        |      * CAST(u_sum_micro AS DOUBLE)
        |      / CAST(i_sum_micro AS DOUBLE)) AS BIGINT) AS DOUBLE)
        |      / 1e6)) AS BIGINT) END AS hr_micro,
        |  CASE WHEN coalesce(i_sum_micro, 0) > 0 THEN
        |    CAST(round(1e6 / sqrt(CAST(i_sum_micro AS DOUBLE)
        |      / 1e6)) AS BIGINT) END AS se_micro
        |FROM s""".stripMargin,

    "q376_item_knn_recs" ->
      """WITH ai AS (
        |  SELECT DISTINCT l_orderkey AS u, l_partkey AS it
        |  FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |ka AS (
        |  SELECT u FROM (SELECT u, count(*) AS c FROM ai GROUP BY 1)
        |  WHERE c <= 16),
        |kept AS (SELECT ai.* FROM ai JOIN ka USING (u)),
        |ic AS (SELECT it, CAST(count(*) AS BIGINT) AS n FROM kept
        |  GROUP BY 1),
        |pr AS (
        |  SELECT a.it AS ia, b.it AS ib,
        |    CAST(count(*) AS BIGINT) AS nab
        |  FROM kept a JOIN kept b ON a.u = b.u AND a.it < b.it
        |  GROUP BY 1, 2),
        |simt AS (
        |  SELECT ia, ib,
        |    CAST(round(1e6 * CAST(nab AS DOUBLE)
        |      / (sqrt(CAST(na.n AS DOUBLE))
        |        * sqrt(CAST(nb.n AS DOUBLE)))) AS BIGINT) AS sim
        |  FROM pr JOIN ic na ON pr.ia = na.it
        |  JOIN ic nb ON pr.ib = nb.it),
        |sym AS (
        |  SELECT ia AS it, ib AS nbr, sim FROM simt
        |  UNION ALL SELECT ib, ia, sim FROM simt),
        |nbrs AS (
        |  SELECT it, nbr, sim FROM (
        |    SELECT *, row_number() OVER (PARTITION BY it
        |      ORDER BY sim DESC, nbr) AS rn
        |    FROM sym)
        |  WHERE rn <= 10),
        |sc AS (
        |  SELECT kept.u, nbrs.nbr, CAST(sum(sim) AS BIGINT) AS score
        |  FROM kept JOIN nbrs ON kept.it = nbrs.it
        |  GROUP BY 1, 2),
        |fresh AS (
        |  SELECT sc.* FROM sc
        |  LEFT JOIN kept s2 ON s2.u = sc.u AND s2.it = sc.nbr
        |  WHERE s2.it IS NULL)
        |SELECT u AS l_orderkey, CAST(rn AS INTEGER) AS rank,
        |  nbr AS rec_item, score AS score_micro
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY u
        |    ORDER BY score DESC, nbr) AS rn
        |  FROM fresh)
        |WHERE rn <= 5""".stripMargin,

    "q364_quadkey" ->
      """WITH p AS (
        |  SELECT
        |    CAST(('0x' || substr(md5('x:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 1000000 AS x,
        |    CAST(('0x' || substr(md5('y:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 1000000 AS y
        |  FROM events),
        |c AS (
        |  SELECT least(15, (x * 16) // 1000000) AS cx,
        |         least(15, (y * 16) // 1000000) AS cy
        |  FROM p),
        |keys AS (
        |  SELECT concat(
        |    CAST(((cy >> 3) % 2) * 2 + (cx >> 3) % 2 AS VARCHAR),
        |    CAST(((cy >> 2) % 2) * 2 + (cx >> 2) % 2 AS VARCHAR),
        |    CAST(((cy >> 1) % 2) * 2 + (cx >> 1) % 2 AS VARCHAR),
        |    CAST((cy % 2) * 2 + cx % 2 AS VARCHAR)) AS quadkey
        |  FROM c),
        |leaf AS (
        |  SELECT quadkey, CAST(count(*) AS BIGINT) AS n_points
        |  FROM keys GROUP BY 1),
        |par AS (
        |  SELECT substr(quadkey, 1, 2) AS quadkey,
        |    CAST(sum(n_points) AS BIGINT) AS n_points
        |  FROM leaf GROUP BY 1)
        |SELECT 4 AS zoom, quadkey, n_points FROM leaf
        |UNION ALL
        |SELECT 2 AS zoom, quadkey, n_points FROM par""".stripMargin,

    "q365_morans_i" ->
      """WITH p AS (
        |  SELECT
        |    CAST(('0x' || substr(md5('x:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 1000000 AS x,
        |    CAST(('0x' || substr(md5('y:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 1000000 AS y
        |  FROM events),
        |cells AS (
        |  SELECT least(31, (x * 32) // 1000000) AS cx,
        |         least(31, (y * 32) // 1000000) AS cy,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM p GROUP BY 1, 2),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS g,
        |    CAST(sum(n) AS BIGINT) AS s,
        |    sum(CAST(n AS HUGEINT) * n) AS q
        |  FROM cells),
        |adj AS (
        |  SELECT CAST(count(*) AS BIGINT) AS np,
        |    sum(CAST(a.n AS HUGEINT) * b.n) AS pnn,
        |    sum(CAST(a.n + b.n AS HUGEINT)) AS pt
        |  FROM cells a JOIN cells b
        |    ON (a.cx = b.cx + 1 AND a.cy = b.cy)
        |    OR (a.cx = b.cx AND a.cy = b.cy + 1))
        |SELECT g AS n_cells, 2 * np AS sum_w,
        |  CASE WHEN np * (g * q - CAST(s AS HUGEINT) * s) > 0 THEN
        |    CAST(round(1e6
        |      * CAST(CAST(g AS HUGEINT) * g * pnn
        |        - CAST(g AS HUGEINT) * s * pt
        |        + CAST(np AS HUGEINT) * s * s AS DOUBLE)
        |      / CAST(np * (g * q - CAST(s AS HUGEINT) * s)
        |        AS DOUBLE)) AS BIGINT)
        |  END AS i_micro,
        |  CASE WHEN g > 1 THEN
        |    CAST(round(-1e6 / CAST(g - 1 AS DOUBLE)) AS BIGINT)
        |  END AS e_i_micro
        |FROM tot, adj""".stripMargin,

    "q368_gearys_c" ->
      """WITH p AS (
        |  SELECT
        |    CAST(('0x' || substr(md5('x:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 1000000 AS x,
        |    CAST(('0x' || substr(md5('y:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 1000000 AS y
        |  FROM events),
        |cells AS (
        |  SELECT least(31, (x * 32) // 1000000) AS cx,
        |         least(31, (y * 32) // 1000000) AS cy,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM p GROUP BY 1, 2),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS g,
        |    CAST(sum(n) AS BIGINT) AS s,
        |    sum(CAST(n AS HUGEINT) * n) AS q
        |  FROM cells),
        |adj AS (
        |  SELECT CAST(count(*) AS BIGINT) AS np,
        |    sum(CAST(a.n - b.n AS HUGEINT) * (a.n - b.n)) AS pd2
        |  FROM cells a JOIN cells b
        |    ON (a.cx = b.cx + 1 AND a.cy = b.cy)
        |    OR (a.cx = b.cx AND a.cy = b.cy + 1))
        |SELECT g AS n_cells, 2 * np AS sum_w,
        |  CASE WHEN 2 * CAST(np AS HUGEINT)
        |    * (g * q - CAST(s AS HUGEINT) * s) > 0 THEN
        |    CAST(round(1e6
        |      * CAST(CAST(g AS HUGEINT) * (g - 1) * pd2 AS DOUBLE)
        |      / CAST(2 * CAST(np AS HUGEINT)
        |        * (g * q - CAST(s AS HUGEINT) * s) AS DOUBLE))
        |      AS BIGINT)
        |  END AS c_micro
        |FROM tot, adj""".stripMargin,

    "q369_newey_west" ->
      """WITH b AS (
        |  SELECT event_type AS k, ts, event_id,
        |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT k,
        |    row_number() OVER (PARTITION BY k ORDER BY ts, event_id)
        |      AS rk,
        |    v
        |  FROM b),
        |tot AS (
        |  SELECT k, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(v AS HUGEINT)) AS s,
        |    sum(CAST(v AS HUGEINT) * v) AS q
        |  FROM r GROUP BY 1),
        |la AS (
        |  SELECT h.k, t.rk - h.rk AS lag,
        |    CAST(count(*) AS BIGINT) AS nk,
        |    sum(CAST(h.v AS HUGEINT) * t.v) AS pp,
        |    sum(CAST(h.v AS HUGEINT)) AS hh,
        |    sum(CAST(t.v AS HUGEINT)) AS tt
        |  FROM r h JOIN r t
        |    ON h.k = t.k AND t.rk - h.rk BETWEEN 1 AND 5
        |  GROUP BY 1, 2),
        |ak AS (
        |  SELECT la.k,
        |    sum((6 - lag) * (CAST(n AS HUGEINT) * n * pp
        |      - CAST(n AS HUGEINT) * s * (hh + tt)
        |      + CAST(nk AS HUGEINT) * s * s)) AS wsum
        |  FROM la JOIN tot ON la.k = tot.k
        |  GROUP BY 1)
        |SELECT tot.k AS event_type, n,
        |  CAST(round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |    AS BIGINT) AS mean_micro,
        |  CASE WHEN n >= 2 THEN
        |    CAST(round(sqrt(greatest(0.0,
        |      CAST(CAST(n AS HUGEINT) * (n * q - s * s) AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * n * n * n AS DOUBLE))))
        |      AS BIGINT) END AS se_iid_micro,
        |  CASE WHEN n >= 2 THEN
        |    CAST(round(sqrt(greatest(0.0,
        |      CAST(6 * (CAST(n AS HUGEINT) * (n * q - s * s))
        |        + 2 * coalesce(wsum, 0) AS DOUBLE)
        |      / (6.0 * CAST(CAST(n AS HUGEINT) * n * n * n
        |        AS DOUBLE))))) AS BIGINT) END AS se_nw_micro,
        |  CASE WHEN n >= 2 THEN
        |    CAST(round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
        |      - 1.959964 * sqrt(greatest(0.0,
        |        CAST(6 * (CAST(n AS HUGEINT) * (n * q - s * s))
        |          + 2 * coalesce(wsum, 0) AS DOUBLE)
        |        / (6.0 * CAST(CAST(n AS HUGEINT) * n * n * n
        |          AS DOUBLE))))) AS BIGINT) END AS ci_lo_micro,
        |  CASE WHEN n >= 2 THEN
        |    CAST(round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
        |      + 1.959964 * sqrt(greatest(0.0,
        |        CAST(6 * (CAST(n AS HUGEINT) * (n * q - s * s))
        |          + 2 * coalesce(wsum, 0) AS DOUBLE)
        |        / (6.0 * CAST(CAST(n AS HUGEINT) * n * n * n
        |          AS DOUBLE))))) AS BIGINT) END AS ci_hi_micro
        |FROM tot LEFT JOIN ak ON tot.k = ak.k""".stripMargin,

    "q366_kendall_tau" ->
      """WITH b AS (
        |  SELECT l_returnflag AS g,
        |    CAST(round(CAST(l_quantity AS DOUBLE) * 1e6) AS BIGINT)
        |      AS x,
        |    CAST(round(CAST(l_extendedprice AS DOUBLE) * 1e6)
        |      AS BIGINT) AS y,
        |    l_orderkey * 10 + l_linenumber AS rid
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL),
        |r AS (
        |  SELECT g, x, y,
        |    row_number() OVER (PARTITION BY g ORDER BY rid, x, y)
        |      AS rk
        |  FROM b
        |  QUALIFY rk <= 512),
        |cd AS (
        |  SELECT a.g,
        |    CAST(sum(CAST(sign(t.x - a.x) AS BIGINT)
        |      * CAST(sign(t.y - a.y) AS BIGINT)) AS BIGINT) AS cd
        |  FROM r a JOIN r t ON a.g = t.g AND a.rk < t.rk
        |  GROUP BY 1),
        |nn AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS n0
        |  FROM r GROUP BY 1),
        |t1 AS (
        |  SELECT g, CAST(sum(t * (t - 1) // 2) AS BIGINT) AS t1
        |  FROM (SELECT g, x, CAST(count(*) AS BIGINT) AS t FROM r
        |    GROUP BY 1, 2)
        |  GROUP BY 1),
        |t2 AS (
        |  SELECT g, CAST(sum(t * (t - 1) // 2) AS BIGINT) AS t2
        |  FROM (SELECT g, y, CAST(count(*) AS BIGINT) AS t FROM r
        |    GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT nn.g AS l_returnflag, n, cd,
        |  CASE WHEN n0 > t1 AND n0 > t2 THEN
        |    CAST(round(1e6 * CAST(cd AS DOUBLE)
        |      / (sqrt(CAST(n0 - t1 AS DOUBLE))
        |        * sqrt(CAST(n0 - t2 AS DOUBLE)))) AS BIGINT)
        |  END AS tau_micro
        |FROM nn JOIN cd ON nn.g = cd.g
        |JOIN t1 ON nn.g = t1.g JOIN t2 ON nn.g = t2.g""".stripMargin,

    "q367_partial_corr" ->
      """WITH b AS (
        |  SELECT l_returnflag AS g,
        |    CAST(round(CAST(l_quantity AS DOUBLE) * 1e6) AS BIGINT)
        |      AS x,
        |    CAST(round(CAST(l_extendedprice AS DOUBLE) * 1e6)
        |      AS BIGINT) AS y,
        |    CAST(round(CAST(l_discount AS DOUBLE) * 1e6) AS BIGINT)
        |      AS z
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL),
        |a AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx,
        |    sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(z AS HUGEINT)) AS sz,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy,
        |    sum(CAST(z AS HUGEINT) * z) AS szz,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * z) AS sxz,
        |    sum(CAST(y AS HUGEINT) * z) AS syz
        |  FROM b GROUP BY 1),
        |rr AS (
        |  SELECT g, n,
        |    CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |      THEN CAST(round(1e6 * CAST(n * sxy - sx * sy AS DOUBLE)
        |        / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))))
        |        AS BIGINT) END AS r_xy_micro,
        |    CASE WHEN n * sxx - sx * sx > 0 AND n * szz - sz * sz > 0
        |      THEN CAST(round(1e6 * CAST(n * sxz - sx * sz AS DOUBLE)
        |        / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |          * sqrt(CAST(n * szz - sz * sz AS DOUBLE))))
        |        AS BIGINT) END AS r_xz_micro,
        |    CASE WHEN n * syy - sy * sy > 0 AND n * szz - sz * sz > 0
        |      THEN CAST(round(1e6 * CAST(n * syz - sy * sz AS DOUBLE)
        |        / (sqrt(CAST(n * syy - sy * sy AS DOUBLE))
        |          * sqrt(CAST(n * szz - sz * sz AS DOUBLE))))
        |        AS BIGINT) END AS r_yz_micro
        |  FROM a)
        |SELECT g AS l_returnflag, n, r_xy_micro, r_xz_micro,
        |  r_yz_micro,
        |  CASE WHEN r_xy_micro IS NOT NULL AND r_xz_micro IS NOT NULL
        |    AND r_yz_micro IS NOT NULL
        |    AND 1.0 - CAST(r_xz_micro AS DOUBLE) / 1e6
        |      * (CAST(r_xz_micro AS DOUBLE) / 1e6) > 0.0
        |    AND 1.0 - CAST(r_yz_micro AS DOUBLE) / 1e6
        |      * (CAST(r_yz_micro AS DOUBLE) / 1e6) > 0.0 THEN
        |    CAST(round(1e6 * (CAST(r_xy_micro AS DOUBLE) / 1e6
        |      - CAST(r_xz_micro AS DOUBLE) / 1e6
        |        * (CAST(r_yz_micro AS DOUBLE) / 1e6))
        |      / (sqrt(1.0 - CAST(r_xz_micro AS DOUBLE) / 1e6
        |          * (CAST(r_xz_micro AS DOUBLE) / 1e6))
        |        * sqrt(1.0 - CAST(r_yz_micro AS DOUBLE) / 1e6
        |          * (CAST(r_yz_micro AS DOUBLE) / 1e6))))
        |      AS BIGINT)
        |  END AS partial_micro
        |FROM rr""".stripMargin)

  /** q346's oracle: the exact pair census unrolled per radius and the
    * HyperBall register propagation (the hllDistinctSql register
    * arithmetic routed across edges, per-node estimates unit-rounded
    * before the cross-node sum — mirroring Graph.hyperBall term for
    * term). */
  /** q375's oracle: the q22 brute-force candidates at k = 20, the
    * candidate-pair cosine census, then the 5 greedy MMR rounds
    * unrolled — winner by (score desc, id), (1−λ) folded from the
    * same 1.0 − 0.7 expression as the operator. */
  private lazy val mmrOracleSql: String = {
    val dot = "CAST(list_sum(list_transform(generate_series(1, " +
      "len(a.v)), i -> a.v[i]*b.v[i])) AS DOUBLE)"
    val rounds = (2 to 5).map { r =>
      s"""rem$r AS (
         |  SELECT cand.* FROM cand
         |  LEFT JOIN sel${r - 1} s ON cand.query_id = s.query_id
         |    AND cand.cand_id = s.cand_id
         |  WHERE s.cand_id IS NULL),
         |ms$r AS (
         |  SELECT rem$r.query_id, rem$r.cand_id,
         |    max(sp.sim) AS ms
         |  FROM rem$r JOIN sp ON sp.query_id = rem$r.query_id
         |    AND sp.a = rem$r.cand_id
         |  JOIN sel${r - 1} s2 ON s2.query_id = rem$r.query_id
         |    AND s2.cand_id = sp.b
         |  GROUP BY 1, 2),
         |sc$r AS (
         |  SELECT ms$r.query_id, ms$r.cand_id,
         |    CAST(round(CAST(700 * rel - 300 * ms AS DOUBLE)
         |      / 1000.0) AS BIGINT) AS score
         |  FROM ms$r JOIN cand ON cand.query_id = ms$r.query_id
         |    AND cand.cand_id = ms$r.cand_id),
         |w$r AS (
         |  SELECT query_id, cand_id, score FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, cand_id) AS rn FROM sc$r)
         |  WHERE rn = 1),
         |sel$r AS (SELECT * FROM sel${r - 1}
         |  UNION ALL SELECT query_id, cand_id FROM w$r)"""
        .stripMargin
    }.mkString(",\n")
    val outs = (1 to 5).map(r =>
      s"SELECT query_id, $r AS round, cand_id, score AS score_micro" +
        s" FROM w$r").mkString("\nUNION ALL\n")
    s"""WITH q AS (
       |  SELECT vec_id AS query_id,
       |    list_transform(embedding,
       |      e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT))
       |      AS qv
       |  FROM embeddings WHERE vec_id < 5),
       |c AS (
       |  SELECT vec_id AS cand_id,
       |    list_transform(embedding,
       |      e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT))
       |      AS cv
       |  FROM embeddings),
       |n1 AS (SELECT query_id, qv,
       |    CAST(list_sum(list_transform(generate_series(1, len(qv)),
       |      i -> qv[i]*qv[i])) AS BIGINT) AS qn
       |  FROM q),
       |n2 AS (SELECT cand_id, cv,
       |    CAST(list_sum(list_transform(generate_series(1, len(cv)),
       |      i -> cv[i]*cv[i])) AS BIGINT) AS cn
       |  FROM c),
       |sc0 AS (
       |  SELECT query_id, cand_id,
       |    CAST(list_sum(list_transform(generate_series(1, len(qv)),
       |      i -> qv[i]*cv[i])) AS BIGINT) AS dot, qn, cn
       |  FROM n1, n2 WHERE query_id <> cand_id),
       |r0 AS (
       |  SELECT query_id, cand_id,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE))
       |      * sqrt(CAST(cn AS DOUBLE))) AS sim
       |  FROM sc0),
       |cand AS (
       |  SELECT query_id, cand_id,
       |    CAST(round(sim * 1e6) AS BIGINT) AS rel
       |  FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim DESC, cand_id) AS rank
       |    FROM r0)
       |  WHERE rank <= 20),
       |cv2 AS (SELECT cand_id, cv AS v, cn FROM n2),
       |candv AS (
       |  SELECT cand.query_id, cand.cand_id, cv2.v, cv2.cn
       |  FROM cand JOIN cv2 USING (cand_id)),
       |sp AS (
       |  SELECT a.query_id, a.cand_id AS a, b.cand_id AS b,
       |    CAST(round(1e6 * $dot
       |      / (sqrt(CAST(a.cn AS DOUBLE))
       |        * sqrt(CAST(b.cn AS DOUBLE)))) AS BIGINT) AS sim
       |  FROM candv a JOIN candv b ON a.query_id = b.query_id
       |    AND a.cand_id <> b.cand_id),
       |w1 AS (
       |  SELECT query_id, cand_id, score FROM (
       |    SELECT query_id, cand_id,
       |      CAST(round(CAST(700 * rel AS DOUBLE) / 1000.0)
       |        AS BIGINT) AS score,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY CAST(round(CAST(700 * rel AS DOUBLE)
       |          / 1000.0) AS BIGINT) DESC, cand_id) AS rn
       |    FROM cand)
       |  WHERE rn = 1),
       |sel1 AS (SELECT query_id, cand_id FROM w1),
       |$rounds
       |$outs""".stripMargin
  }

  /** q363's oracle: margins, the bounded k-enumeration, and the same
    * Stirling ln-factorial chain as Profile.fisherExact — the lf()
    * snippet is generated so the nine call sites stay term-for-term
    * identical. */
  private lazy val fisherOracleSql: String = {
    def lf(x: String): String =
      s"(CASE WHEN ($x) <= 1 THEN 0.0 ELSE " +
        s"CAST($x AS DOUBLE) * ln(CAST($x AS DOUBLE)) " +
        s"- CAST($x AS DOUBLE) " +
        s"+ 0.5 * ln(6.283185307179586 * CAST($x AS DOUBLE)) " +
        s"+ 1.0 / (12.0 * CAST($x AS DOUBLE)) " +
        s"- 1.0 / (360.0 * CAST($x AS DOUBLE) * CAST($x AS DOUBLE) " +
        s"* CAST($x AS DOUBLE)) END)"
    def lnp(k: String): String =
      s"CAST(round(1e6 * (${lf("r1")} - ${lf(k)} - ${lf(s"r1 - ($k)")}" +
        s" + ${lf("r2")} - ${lf(s"c1 - ($k)")}" +
        s" - ${lf(s"r2 - c1 + ($k)")} - ${lf("n")} + ${lf("c1")}" +
        s" + ${lf("n - c1")})) AS BIGINT)"
    s"""WITH b AS (
       |  SELECT source AS g, (lang = 'en') AS r,
       |    (n_chars >= 400) AS c
       |  FROM documents WHERE lang IS NOT NULL
       |    AND n_chars IS NOT NULL),
       |cells AS (
       |  SELECT g,
       |    CAST(sum(CASE WHEN r AND c THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n11,
       |    CAST(sum(CASE WHEN r AND NOT c THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n12,
       |    CAST(sum(CASE WHEN NOT r AND c THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n21,
       |    CAST(sum(CASE WHEN NOT r AND NOT c THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n22
       |  FROM b GROUP BY 1),
       |m AS (
       |  SELECT *, n11 + n12 AS r1, n21 + n22 AS r2,
       |    n11 + n21 AS c1, n11 + n12 + n21 + n22 AS n,
       |    greatest(0, (n11 + n21) - (n21 + n22)) AS klo,
       |    least(n11 + n12, n11 + n21) AS khi
       |  FROM cells),
       |m2 AS (SELECT *, khi - klo >= 10000 AS too_large FROM m),
       |ks AS (
       |  SELECT g, n11, r1, r2, c1, n, u.k
       |  FROM m2, UNNEST(generate_series(klo, khi)) AS u(k)
       |  WHERE NOT too_large),
       |scored AS (
       |  SELECT g, ${lnp("k")} AS lnp, ${lnp("n11")} AS lnpobs
       |  FROM ks),
       |p AS (
       |  SELECT g, least(1000000, CAST(round(CAST(sum(
       |    CASE WHEN lnp <= lnpobs THEN CAST(round(1e9
       |      * exp(CAST(lnp AS DOUBLE) / 1e6)) AS BIGINT)
       |    ELSE 0 END) AS DOUBLE) / 1e3) AS BIGINT)) AS p_micro
       |  FROM scored GROUP BY 1)
       |SELECT m2.g AS source, n11, n12, n21, n22, p_micro,
       |  CASE WHEN n12 > 0 AND n21 > 0 THEN
       |    CAST(round(1e6 * (CAST(n11 AS DOUBLE)
       |      * CAST(n22 AS DOUBLE))
       |      / (CAST(n12 AS DOUBLE) * CAST(n21 AS DOUBLE)))
       |      AS BIGINT)
       |  END AS or_micro, too_large
       |FROM m2 LEFT JOIN p ON m2.g = p.g""".stripMargin
  }

  /** q359's oracle: the journey census, the per-variant redirected
    * chain, and the 8 value-iteration rounds unrolled — each round
    * the same exact micro×micro sums and one rounded divide as
    * Sessionize.markovAttribution, association for association. */
  private lazy val markovAttributionOracleSql: String = {
    val rounds = (1 to 8).map { k =>
      s"""r$k AS (
         |  SELECT st.v, st.s,
         |    CASE WHEN st.s = '(conv)' THEN 1000000
         |         WHEN st.s = '(null)' THEN 0
         |         ELSE coalesce(x.nr, 0) END AS r
         |  FROM st LEFT JOIN (
         |    SELECT vt.v, vt.f AS s,
         |      CAST(round(CAST(sum(vt.p * pr.r) AS DOUBLE) / 1e6)
         |        AS BIGINT) AS nr
         |    FROM vt JOIN r${k - 1} pr
         |      ON vt.v = pr.v AND vt.tt = pr.s
         |    GROUP BY 1, 2) x ON st.v = x.v AND st.s = x.s)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (
       |  SELECT user_id AS k, epoch_us(ts) AS us, event_id AS tb,
       |    event_type AS t
       |  FROM events),
       |cu AS (
       |  SELECT k, min(us) AS cu FROM ev WHERE t = 'purchase'
       |  GROUP BY 1),
       |tch AS (
       |  SELECT ev.k, ev.us, ev.tb, ev.t, cu.cu
       |  FROM ev LEFT JOIN cu ON ev.k = cu.k
       |  WHERE ev.t <> 'purchase'
       |    AND (cu.cu IS NULL OR ev.us <= cu.cu)),
       |seq AS (
       |  SELECT k, t, cu,
       |    row_number() OVER (PARTITION BY k ORDER BY us, tb) AS rn,
       |    lead(t) OVER (PARTITION BY k ORDER BY us, tb) AS nxt
       |  FROM tch),
       |tr AS (
       |  SELECT t AS f, nxt AS tt FROM seq WHERE nxt IS NOT NULL
       |  UNION ALL
       |  SELECT '(start)', t FROM seq WHERE rn = 1
       |  UNION ALL
       |  SELECT t, CASE WHEN cu IS NOT NULL THEN '(conv)'
       |    ELSE '(null)' END FROM seq WHERE nxt IS NULL
       |  UNION ALL
       |  SELECT '(start)', '(conv)' FROM cu
       |  WHERE k NOT IN (SELECT DISTINCT k FROM tch)),
       |cnt AS (SELECT f, tt, CAST(count(*) AS BIGINT) AS c
       |  FROM tr GROUP BY 1, 2),
       |tot AS (SELECT f, CAST(sum(c) AS BIGINT) AS ct
       |  FROM cnt GROUP BY 1),
       |t0 AS (
       |  SELECT f, tt, CAST(round(1e6 * CAST(c AS DOUBLE)
       |    / CAST(ct AS DOUBLE)) AS BIGINT) AS p
       |  FROM cnt JOIN tot USING (f)),
       |vars AS (
       |  SELECT DISTINCT f AS v FROM t0 WHERE f <> '(start)'
       |  UNION ALL SELECT '(full)'),
       |vt AS (
       |  SELECT v, f,
       |    CASE WHEN tt = v THEN '(null)' ELSE tt END AS tt,
       |    CAST(sum(p) AS BIGINT) AS p
       |  FROM t0 CROSS JOIN vars
       |  WHERE f <> v
       |  GROUP BY 1, 2, 3),
       |st AS (
       |  SELECT DISTINCT v, s FROM (
       |    SELECT v, f AS s FROM vt UNION ALL SELECT v, tt FROM vt)),
       |r0 AS (
       |  SELECT v, s,
       |    CASE WHEN s = '(conv)' THEN 1000000 ELSE 0 END AS r
       |  FROM st),
       |$rounds,
       |pc AS (SELECT v, r FROM r8 WHERE s = '(start)'),
       |pf AS (SELECT r AS pfv FROM pc WHERE v = '(full)'),
       |eff AS (
       |  SELECT v AS channel, pfv AS p_conv_micro,
       |    r AS p_removed_micro,
       |    CASE WHEN pfv > 0 THEN greatest(0,
       |      CAST(round(1e6 * CAST(pfv - r AS DOUBLE)
       |        / CAST(pfv AS DOUBLE)) AS BIGINT)) END AS removal_micro
       |  FROM pc, pf WHERE v <> '(full)'),
       |te AS (SELECT CAST(sum(removal_micro) AS BIGINT) AS tt
       |  FROM eff)
       |SELECT channel, p_conv_micro, p_removed_micro, removal_micro,
       |  CASE WHEN tt > 0 THEN CAST(round(1e6
       |    * CAST(removal_micro AS DOUBLE) / CAST(tt AS DOUBLE))
       |    AS BIGINT) END AS share_micro
       |FROM eff, te""".stripMargin
  }

  private lazy val neighborhoodOracleSql: String = {
    val m = graft.operators.Sketches.M
    val mr = graft.operators.Sketches.MaxRank
    val num = graft.operators.Sketches.EstimatorNumerator
    val rounds = (1 to 2).map { r =>
      s"""r$r AS (SELECT DISTINCT u, w FROM (
         |  SELECT u, w FROM r${r - 1}
         |  UNION ALL SELECT r${r - 1}.u, e.dst
         |  FROM r${r - 1} JOIN e ON e.src = r${r - 1}.w)),
         |g$r AS (SELECT node, j, max(mj) AS mj FROM (
         |  SELECT e.src AS node, g${r - 1}.j, g${r - 1}.mj
         |  FROM g${r - 1} JOIN e ON e.dst = g${r - 1}.node
         |  UNION ALL SELECT node, j, mj FROM g${r - 1})
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val lcTable = graft.operators.Sketches.hllLinearCountTable
      .mkString("[", ", ", "]")
    val rawEst = s"$num / CAST(hsum + ($m - nb) " +
      s"* (CAST(1 AS BIGINT) << $mr) AS DOUBLE)"
    val ests = (0 to 2).map { r =>
      s"""s$r AS (
         |  SELECT CAST(sum(CASE WHEN $m - nb > 0
         |      AND $rawEst < ${2.5 * m}
         |    THEN ($lcTable)[$m - nb]
         |    ELSE CAST(round($rawEst) AS BIGINT) END) AS BIGINT)
         |    AS est_sum
         |  FROM (SELECT node, count(*) AS nb,
         |    CAST(sum(CAST(1 AS BIGINT) << ($mr - mj)) AS BIGINT)
         |      AS hsum
         |  FROM g$r GROUP BY 1))""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (
       |  SELECT CAST(('0x' || substr(md5('nfs:'
       |      || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2000
       |      AS src,
       |    CAST(('0x' || substr(md5('nfd:'
       |      || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2000
       |      AS dst
       |  FROM events),
       |e AS (SELECT DISTINCT src, dst FROM ev),
       |nodes AS (SELECT DISTINCT node FROM (
       |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |r0 AS (SELECT node AS u, node AS w FROM nodes),
       |hb AS (
       |  SELECT node, h % $m AS j,
       |    CASE WHEN h // $m = 0 THEN $mr
       |      ELSE $mr - length(bin(h // $m)) END AS rk
       |  FROM (SELECT node, CAST(('0x' || substr(md5(
       |    CAST(node AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |    FROM nodes)),
       |g0 AS (SELECT node, j, max(rk) AS mj FROM hb GROUP BY 1, 2),
       |$rounds,
       |ex AS (
       |  SELECT 0 AS r, CAST(count(*) AS BIGINT) AS n_pairs FROM r0
       |  UNION ALL SELECT 1, CAST(count(*) AS BIGINT) FROM r1
       |  UNION ALL SELECT 2, CAST(count(*) AS BIGINT) FROM r2),
       |$ests,
       |eb AS (
       |  SELECT 0 AS r, est_sum FROM s0
       |  UNION ALL SELECT 1, est_sum FROM s1
       |  UNION ALL SELECT 2, est_sum FROM s2)
       |SELECT CAST(ex.r AS BIGINT) AS r, ex.n_pairs, eb.est_sum,
       |  CAST(round(1e6 * abs(CAST(eb.est_sum AS DOUBLE)
       |    - CAST(ex.n_pairs AS DOUBLE))
       |    / CAST(ex.n_pairs AS DOUBLE)) AS BIGINT) AS err_micro
       |FROM ex JOIN eb USING (r)""".stripMargin
  }

  /** q345's oracle: the truncated Holt-Winters kernel with the
    * IDENTICAL micro-int weight literals (holtWintersWeightsMicro),
    * full-window NULL rule mirrored via the tap presence count —
    * the holtOracleSql shape with a third (seasonal) kernel. */
  private lazy val holtWintersOracleSql: String = {
    val wq = graft.operators.TimeSeries
      .holtWintersWeightsMicro(0.5, 0.2, 0.6, 7, 35)
    def xm(m: Int) = if (m == 0) "x" else s"x$m"
    val lagCols = (1 until wq.size)
      .map(m => s"lag(x, $m) OVER win AS x$m").mkString(",\n         ")
    def kernel(pick: ((Long, Long, Long)) => Long) =
      wq.zipWithIndex.map { case (t3, m) =>
        s"COALESCE(CAST(round(${xm(m)} * ${pick(t3)}) AS BIGINT), 0)"
      }.mkString("\n           + ")
    val numL = kernel(_._1)
    val numB = kernel(_._2)
    val numS = kernel(_._3)
    val have = wq.indices.map(m =>
      s"CASE WHEN ${xm(m)} IS NOT NULL THEN 1 ELSE 0 END")
      .mkString("\n           + ")
    s"""WITH e AS (
       |  SELECT user_id, ts, event_id, value, CAST(value AS DOUBLE) AS x
       |  FROM events),
       |l AS (
       |  SELECT user_id, ts, event_id, value, x,
       |         $lagCols
       |  FROM e
       |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (
       |  SELECT user_id, ts, event_id, value,
       |         $numL AS num_l,
       |         $numB AS num_b,
       |         $numS AS num_s,
       |         $have AS have
       |  FROM l)
       |SELECT user_id, ts, event_id, value,
       |  CASE WHEN have = ${wq.size}
       |    THEN CAST(num_l AS DOUBLE) / 1e6 ELSE NULL END AS hw_level,
       |  CASE WHEN have = ${wq.size}
       |    THEN CAST(num_b AS DOUBLE) / 1e6 ELSE NULL END AS hw_trend,
       |  CASE WHEN have = ${wq.size}
       |    THEN CAST(num_s AS DOUBLE) / 1e6 ELSE NULL END AS hw_season,
       |  CASE WHEN have = ${wq.size}
       |    THEN CAST(num_l + num_b + num_s AS DOUBLE) / 1e6
       |    ELSE NULL END AS hw_forecast
       |FROM s""".stripMargin
  }

  /** q344's oracle: the 16 bit-sign AMS counters unrolled column by
    * column (one md5 per token, signs from successive bits — exactly
    * the Spark side's shiftright loop), bucket means unit-rounded,
    * low median via list_sort. */
  private def amsF2OracleSql: String = {
    val zDefs = (0 until 16).map(j =>
      s"sum((((h >> $j) & 1) * 2 - 1)) AS z$j").mkString(",\n    ")
    val z2sum = (0 until 16)
      .map(j => s"CAST(z$j AS HUGEINT) * z$j").mkString(" + ")
    val bmeans = (0 until 4).map { b =>
      val terms = (0 until 4)
        .map(i => s"CAST(z${4 * b + i} AS HUGEINT) * z${4 * b + i}")
        .mkString(" + ")
      s"CAST(round(CAST($terms AS DOUBLE) / 4.0) AS HUGEINT)"
    }
    s"""WITH tok AS (
       |  SELECT source AS g,
       |    unnest(list_filter(string_split_regex(lower(text), '\\s+'),
       |      t -> len(t) > 0)) AS k
       |  FROM documents),
       |base AS (
       |  SELECT g, k,
       |    CAST(('0x' || substr(md5('ams:' || k), 1, 15)) AS BIGINT)
       |      AS h
       |  FROM tok),
       |zs AS (
       |  SELECT g,
       |    $zDefs
       |  FROM base GROUP BY 1),
       |est AS (
       |  SELECT g,
       |    CAST(round(CAST($z2sum AS DOUBLE) / 16.0) AS HUGEINT)
       |      AS est_mean,
       |    list_sort([${bmeans.mkString(", ")}])[2] AS est_mom
       |  FROM zs),
       |exact AS (
       |  SELECT g, sum(CAST(c AS HUGEINT) * c) AS f2 FROM (
       |    SELECT g, k, CAST(count(*) AS BIGINT) AS c
       |    FROM base GROUP BY 1, 2)
       |  GROUP BY 1)
       |SELECT exact.g AS source, CAST(f2 AS VARCHAR) AS f2,
       |  CAST(est_mean AS VARCHAR) AS est_mean,
       |  CAST(est_mom AS VARCHAR) AS est_mom,
       |  CAST(round(1e6 * abs(CAST(est_mean AS DOUBLE)
       |    - CAST(f2 AS DOUBLE)) / CAST(f2 AS DOUBLE)) AS BIGINT)
       |    AS err_mean_micro,
       |  CAST(round(1e6 * abs(CAST(est_mom AS DOUBLE)
       |    - CAST(f2 AS DOUBLE)) / CAST(f2 AS DOUBLE)) AS BIGINT)
       |    AS err_mom_micro
       |FROM exact JOIN est USING (g)""".stripMargin
  }

  /** q329's oracle: the distributed-Newton Platt fit unrolled — each
    * round one data pass with the previous round's 1-row params,
    * exact HUGEINT gradient/Hessian sums over micro-rounded σ, the
    * scalar 2×2 solve mirrored association-for-association. */
  private def plattOracleSql(iters: Int): String = {
    val noise = "CAST(CAST(('0x' || substr(md5('pn:' || " +
      "CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 50 AS DOUBLE)"
    val head =
      s"""WITH base AS (
         |  SELECT CAST(round((value + $noise) / 100.0 * 1e6)
         |    AS BIGINT) AS s,
         |    CASE WHEN value >= 100.0 THEN 1 ELSE 0 END AS y
         |  FROM events WHERE value IS NOT NULL),
         |p0 AS (SELECT CAST(0 AS BIGINT) AS a, CAST(0 AS BIGINT)
         |  AS b)""".stripMargin
    def muExpr(p: String): String =
      s"CAST(round(1e6 / (1.0 + exp(-(CAST($p.a AS DOUBLE) / 1e6 " +
        s"* (CAST(base.s AS DOUBLE) / 1e6) " +
        s"+ CAST($p.b AS DOUBLE) / 1e6)))) AS BIGINT)"
    val rounds = (1 to iters).map { r =>
      s"""m$r AS (
         |  SELECT base.s, base.y, ${muExpr(s"p${r - 1}")} AS mu
         |  FROM base, p${r - 1}),
         |a$r AS (
         |  SELECT
         |    sum(CAST(y * 1000000 - mu AS HUGEINT) * s) AS g1,
         |    sum(CAST(y * 1000000 - mu AS HUGEINT)) AS g0,
         |    sum(CAST(mu * (1000000 - mu) AS HUGEINT) * s * s) AS h11,
         |    sum(CAST(mu * (1000000 - mu) AS HUGEINT) * s) AS h10,
         |    sum(CAST(mu * (1000000 - mu) AS HUGEINT)) AS h00
         |  FROM m$r),
         |d$r AS (
         |  SELECT CAST(g1 AS DOUBLE) / 1e12 AS g1r,
         |    CAST(g0 AS DOUBLE) / 1e6 AS g0r,
         |    CAST(h11 AS DOUBLE) / 1e24 AS h11r,
         |    CAST(h10 AS DOUBLE) / 1e18 AS h10r,
         |    CAST(h00 AS DOUBLE) / 1e12 AS h00r
         |  FROM a$r),
         |p$r AS (
         |  SELECT
         |    CASE WHEN h11r * h00r - h10r * h10r > 0.0 THEN
         |      CAST(round(CAST(p.a AS DOUBLE) + 1e6
         |        * ((h00r * g1r - h10r * g0r)
         |          / (h11r * h00r - h10r * h10r))) AS BIGINT)
         |      ELSE p.a END AS a,
         |    CASE WHEN h11r * h00r - h10r * h10r > 0.0 THEN
         |      CAST(round(CAST(p.b AS DOUBLE) + 1e6
         |        * ((h11r * g0r - h10r * g1r)
         |          / (h11r * h00r - h10r * h10r))) AS BIGINT)
         |      ELSE p.b END AS b
         |  FROM d$r, p${r - 1} p)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s""",
         |mf AS (
         |  SELECT base.s, base.y, ${muExpr(s"p$iters")} AS mu
         |  FROM base, p$iters),
         |fc AS (
         |  SELECT y, least(greatest(mu, 1), 999999) AS muc FROM mf)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  (SELECT a FROM p$iters) AS a_micro,
         |  (SELECT b FROM p$iters) AS b_micro,
         |  CAST(round(CAST(sum(CASE WHEN y = 1 THEN
         |      CAST(round(-1e6 * ln(CAST(muc AS DOUBLE) / 1e6))
         |        AS BIGINT)
         |    ELSE
         |      CAST(round(-1e6 * ln(1.0 - CAST(muc AS DOUBLE) / 1e6))
         |        AS BIGINT) END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE)) AS BIGINT)
         |    AS avg_logloss_micro
         |FROM fc""".stripMargin
  }

  /** q328's oracle: the mSPRT e-value chain mirrored association-
    * for-association; τ² interpolates as the Scala-computed double
    * so both engines square once, identically. */
  private def alwaysValidOracleSql(tau: Double): String = {
    val t2 = tau * tau
    s"""WITH b AS (
       |  SELECT event_type AS g, user_id % 2 = 0 AS a,
       |    value >= 100.0 AS y
       |  FROM events WHERE value IS NOT NULL),
       |st AS (
       |  SELECT g,
       |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN a AND y THEN 1 ELSE 0 END) AS BIGINT)
       |      AS k_a,
       |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_b,
       |    CAST(sum(CASE WHEN NOT a AND y THEN 1 ELSE 0 END)
       |      AS BIGINT) AS k_b
       |  FROM b GROUP BY 1),
       |f AS (
       |  SELECT g, n_a, k_a, n_b, k_b,
       |    CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE)
       |      - CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS d,
       |    (CAST(k_a + k_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
       |      * (1.0 - CAST(k_a + k_b AS DOUBLE)
       |        / CAST(n_a + n_b AS DOUBLE))
       |      * (1.0 / CAST(n_a AS DOUBLE)
       |        + 1.0 / CAST(n_b AS DOUBLE)) AS v,
       |    n_a > 0 AND n_b > 0 AND k_a + k_b > 0
       |      AND k_a + k_b < n_a + n_b AS live
       |  FROM st),
       |e AS (
       |  SELECT f.*,
       |    CAST(round(1e6 * (0.5 * ln(v / (v + $t2))
       |      + d * d * $t2 / (2.0 * v * (v + $t2)))) AS BIGINT)
       |      AS le
       |  FROM f)
       |SELECT g AS event_type, n_a, k_a, n_b, k_b,
       |  CASE WHEN live THEN CAST(round(1e6 * d) AS BIGINT)
       |    ELSE NULL END AS d_micro,
       |  CASE WHEN live THEN le ELSE NULL END AS log_e_micro,
       |  CASE WHEN live THEN CAST(round(1e6 * least(1.0,
       |    exp(-CAST(le AS DOUBLE) / 1e6))) AS BIGINT)
       |    ELSE NULL END AS p_always_micro,
       |  CASE WHEN live THEN le >= 2995732 ELSE false END
       |    AS significant
       |FROM e""".stripMargin
  }

  /** q323's oracle: the q271 ACF CTEs generalized to `maxLag`, then
    * the SAME quantized Durbin–Levinson the Spark side runs — each
    * level a pair of CTEs (the lag-k coefficient, then the updated
    * lower coefficients off the ROUNDED value), every float
    * expression mirrored association-for-association. */
  private def pacfOracleSql(maxLag: Int): String = {
    def d(c: String) = s"(CAST($c AS DOUBLE) / 1e6)"
    val head =
      s"""WITH b AS (
         |  SELECT event_type AS k, ts, event_id,
         |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v
         |  FROM events WHERE value IS NOT NULL),
         |r AS (
         |  SELECT k,
         |    row_number() OVER (PARTITION BY k ORDER BY ts, event_id)
         |      AS rk,
         |    v
         |  FROM b),
         |tot AS (
         |  SELECT k, CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(v AS HUGEINT)) AS s,
         |    sum(CAST(v AS HUGEINT) * v) AS q
         |  FROM r GROUP BY 1),
         |p AS (
         |  SELECT h.k, t.rk - h.rk AS lag,
         |    CAST(count(*) AS BIGINT) AS n_pairs,
         |    sum(CAST(h.v AS HUGEINT) * t.v) AS pp,
         |    sum(CAST(h.v AS HUGEINT)) AS hh,
         |    sum(CAST(t.v AS HUGEINT)) AS tt
         |  FROM r h JOIN r t
         |    ON h.k = t.k AND t.rk - h.rk BETWEEN 1 AND $maxLag
         |  GROUP BY 1, 2),
         |acf AS (
         |  SELECT p.k, p.lag,
         |    CASE WHEN (tot.q * tot.n - tot.s * tot.s) * tot.n > 0
         |      THEN CAST(round(1e6
         |        * CAST(p.pp * tot.n * tot.n
         |            - tot.s * (p.hh + p.tt) * tot.n
         |            + tot.s * tot.s * p.n_pairs AS DOUBLE)
         |        / CAST((tot.q * tot.n - tot.s * tot.s) * tot.n
         |            AS DOUBLE)) AS BIGINT)
         |      ELSE NULL END AS acf_micro
         |  FROM p JOIN tot USING (k)),
         |piv AS (
         |  SELECT k,
         |    ${(1 to maxLag).map(l =>
             s"max(CASE WHEN lag = $l THEN acf_micro END) AS __r$l")
             .mkString(",\n    ")}
         |  FROM acf GROUP BY 1),
         |l1 AS (SELECT *, __r1 AS __p1_1 FROM piv)""".stripMargin
    var prev = "l1"
    val levels = (2 to maxLag).map { k =>
      val numTerms = (1 until k).map(j =>
        s"${d(s"__p${k - 1}_$j")} * ${d(s"__r${k - j}")}")
        .mkString(" + ")
      val denTerms = (1 until k).map(j =>
        s"${d(s"__p${k - 1}_$j")} * ${d(s"__r$j")}")
        .mkString(" + ")
      val num = s"${d(s"__r$k")} - ($numTerms)"
      val den = s"1.0 - ($denTerms)"
      val pkk = s"CASE WHEN ($den) <> 0.0 THEN " +
        s"CAST(round(1e6 * ($num) / ($den)) AS BIGINT) " +
        "ELSE NULL END"
      val pkjs = (1 until k).map(j =>
        s"CAST(round(1e6 * (${d(s"__p${k - 1}_$j")} - " +
          s"${d(s"__p${k}_$k")} * ${d(s"__p${k - 1}_${k - j}")})) " +
          s"AS BIGINT) AS __p${k}_$j").mkString(",\n  ")
      val out =
        s"""la$k AS (SELECT *, $pkk AS __p${k}_$k FROM $prev),
           |lb$k AS (SELECT *,
           |  $pkjs
           |  FROM la$k)""".stripMargin
      prev = s"lb$k"
      out
    }
    val lagCase = (1 to maxLag).map(l =>
      s"WHEN $l THEN __p${l}_$l").mkString(" ")
    (head +: levels).mkString(",\n") +
      s"""
         |SELECT k AS event_type, CAST(u.l AS BIGINT) AS lag,
         |  CASE u.l $lagCase ELSE NULL END AS pacf_micro
         |FROM $prev,
         |  UNNEST([${(1 to maxLag).mkString(", ")}]) AS u(l)"""
        .stripMargin
  }

  /** (source, word) rows for the KMV oracles — the shared token
    * split, lower-cased like [[graft.functions.TextFunctions
    * .tokens]]. */
  private lazy val sourceWordsSql: String =
    "SELECT source AS g, u.t AS w FROM documents, " +
      "UNNEST(list_filter(string_split_regex(lower(text), '\\s+'), " +
      "t -> len(t) > 0)) AS u(t)"

  /** The [[graft.operators.Linkage.phoneticKey]] expression chain as
    * a CTE ladder over a `words(word, n_parts)` input — identical
    * translate table, collapse regexes, first-code suppression, and
    * pad. Shared by q318/q319. */
  private lazy val phoneticKeyCtes: String =
    """k1 AS (SELECT word, n_parts,
      |  regexp_replace(word, '[^a-z]', '', 'g') AS w FROM words),
      |k2 AS (SELECT *, translate(w, 'bfpvcgjkqsxzdtlmnr',
      |  '111122222222334556') AS m FROM k1),
      |k3 AS (SELECT *, regexp_replace(regexp_replace(regexp_replace(
      |  regexp_replace(regexp_replace(regexp_replace(m,
      |  '1{2,}', '1', 'g'), '2{2,}', '2', 'g'), '3{2,}', '3', 'g'),
      |  '4{2,}', '4', 'g'), '5{2,}', '5', 'g'), '6{2,}', '6', 'g')
      |  AS cm FROM k2),
      |k4 AS (SELECT *, regexp_replace(cm, '[a-z]', '', 'g') AS dg
      |  FROM k3),
      |k5 AS (SELECT *, CASE WHEN regexp_matches(substr(cm, 1, 1),
      |  '[1-6]') THEN substr(dg, 2) ELSE dg END AS tl FROM k4),
      |keys AS (SELECT word, n_parts,
      |  CASE WHEN len(w) > 0 THEN upper(substr(w, 1, 1)) ||
      |    rpad(substr(tl, 1, 3), 3, '0') ELSE NULL END AS code
      |  FROM k5)""".stripMargin

  /** q308/q309's match fixture in SQL — consecutive doc_ids compete
    * on n_chars, longer doc's source wins, ties/same-source drop
    * (the verbatim twin of [[matchesFixture]]). */
  private lazy val matchesSql: String =
    """SELECT CASE WHEN a.n_chars > b.n_chars THEN a.source
      |    ELSE b.source END AS w,
      |  CASE WHEN a.n_chars > b.n_chars THEN b.source
      |    ELSE a.source END AS l
      |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |WHERE a.n_chars <> b.n_chars AND a.source <> b.source"""
      .stripMargin

  /** q308's oracle: the Bradley–Terry MM fixpoint unrolled `iters`
    * rounds (the pageRankOracleSql pattern) — micro weights between
    * rounds, scalar IEEE divides micro-rounded, renormalized to
    * Σw = P each round, zero-win players pinned at 0. */
  private def btOracleSql(iters: Int): String = {
    val head =
      s"""WITH mt AS ($matchesSql),
         |pairs AS MATERIALIZED (
         |  SELECT least(w, l) AS a, greatest(w, l) AS b,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM mt GROUP BY 1, 2),
         |sym AS MATERIALIZED (
         |  SELECT a AS p, b AS q, n FROM pairs
         |  UNION ALL SELECT b, a, n FROM pairs),
         |wn AS (SELECT w AS p, CAST(count(*) AS BIGINT) AS wins
         |  FROM mt GROUP BY 1),
         |players AS MATERIALIZED (
         |  SELECT u.p, COALESCE(wn.wins, 0) AS wins
         |  FROM (SELECT w AS p FROM mt UNION SELECT l FROM mt) u
         |  LEFT JOIN wn ON wn.p = u.p),
         |np AS (SELECT CAST(count(*) AS BIGINT) AS np FROM players),
         |w0 AS MATERIALIZED (
         |  SELECT p, CAST(1000000 AS BIGINT) AS wm FROM players)"""
        .stripMargin
    val rounds = (1 to iters).map { k =>
      s"""d$k AS (
         |  SELECT s.p, CAST(sum(CAST(round(1e12 * CAST(s.n AS DOUBLE)
         |    / CAST(greatest(wi.wm + wj.wm, 1) AS DOUBLE)) AS BIGINT))
         |    AS BIGINT) AS d
         |  FROM sym s
         |  JOIN w${k - 1} wi ON wi.p = s.p
         |  JOIN w${k - 1} wj ON wj.p = s.q
         |  GROUP BY 1),
         |r$k AS MATERIALIZED (
         |  SELECT pl.p, CASE WHEN COALESCE(d.d, 0) > 0
         |    THEN CAST(round(1e12 * CAST(pl.wins AS DOUBLE)
         |      / CAST(d.d AS DOUBLE)) AS BIGINT)
         |    ELSE 0 END AS wr
         |  FROM players pl LEFT JOIN d$k d ON d.p = pl.p),
         |s$k AS (SELECT CAST(sum(wr) AS DOUBLE) AS s FROM r$k),
         |w$k AS MATERIALIZED (
         |  SELECT r.p, CASE WHEN s$k.s > 0
         |    THEN CAST(round(1e6 * CAST(np.np AS DOUBLE)
         |      * CAST(r.wr AS DOUBLE) / s$k.s) AS BIGINT)
         |    ELSE 0 END AS wm
         |  FROM r$k r, s$k, np)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"""
         |, games AS (
         |  SELECT p, CAST(sum(n) AS BIGINT) AS n_games
         |  FROM sym GROUP BY 1)
         |SELECT pl.p AS player, pl.wins AS n_wins, g.n_games,
         |  w$iters.wm AS bt_micro
         |FROM players pl
         |JOIN games g ON g.p = pl.p
         |JOIN w$iters ON w$iters.p = pl.p""".stripMargin
  }

  /** q287's oracle: the same Poisson-threshold inverse CDF
    * (Sampling.PoissonThresholds60 literals), replicate means and
    * ⌈q·B⌉ order-statistic endpoints mirrored. */
  private lazy val bootstrapOracleSql: String = {
    val ts = graft.operators.Sampling.PoissonThresholds60
    val wExpr = ts.map(t =>
      s"CASE WHEN h >= $t THEN 1 ELSE 0 END").mkString("\n      + ")
    s"""WITH b AS (
       |  SELECT event_type AS g, event_id AS id,
       |    CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v
       |  FROM events WHERE value IS NOT NULL),
       |pt AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n,
       |    CAST(round(CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE))
       |      AS BIGINT) AS mean_micro
       |  FROM b GROUP BY 1),
       |sub AS (
       |  SELECT g, v, r.rb,
       |    CAST(('0x' || substr(md5('boot:' || CAST(id AS VARCHAR)
       |      || ':' || CAST(r.rb AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |  FROM b, LATERAL (SELECT unnest(generate_series(0, 99)) AS rb) r),
       |wt AS (
       |  SELECT g, rb, v,
       |    $wExpr AS w
       |  FROM sub),
       |reps AS (
       |  SELECT g, rb, CAST(sum(w) AS BIGINT) AS sw,
       |    sum(CAST(w AS HUGEINT) * v) AS swx
       |  FROM wt GROUP BY 1, 2),
       |m AS (
       |  SELECT g, rb,
       |    CAST(round(CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE))
       |      AS BIGINT) AS mb
       |  FROM reps WHERE sw > 0),
       |rk AS (
       |  SELECT g, mb,
       |    row_number() OVER (PARTITION BY g ORDER BY mb, rb) AS rnk
       |  FROM m),
       |cnt AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_resamples,
       |    CAST(ceil(0.025 * count(*)) AS BIGINT) AS lo_rk,
       |    CAST(ceil(0.975 * count(*)) AS BIGINT) AS hi_rk
       |  FROM rk GROUP BY 1)
       |SELECT pt.g AS event_type, pt.n, pt.mean_micro,
       |  lo.mb AS lo_micro, hi.mb AS hi_micro,
       |  COALESCE(cnt.n_resamples, 0) AS n_resamples
       |FROM pt
       |LEFT JOIN cnt USING (g)
       |LEFT JOIN rk lo ON lo.g = pt.g AND lo.rnk = cnt.lo_rk
       |LEFT JOIN rk hi ON hi.g = pt.g AND hi.rnk = cnt.hi_rk"""
      .stripMargin
  }

  /** The q285/q286 ratings fixture as one SQL CTE named `r` —
    * interpolated into both oracles so Scala and SQL cannot drift.
    * NO line may start with `||`: this string is spliced into the
    * callers BEFORE their .stripMargin, which would eat one pipe and
    * turn string concat into bitwise-or. */
  private lazy val ratingsFixtureSql: String =
    """r AS (
      |  SELECT source, doc_id AS item, 'len500' AS rater,
      |    CASE WHEN n_chars >= 500 THEN 'pos' ELSE 'neg' END AS label
      |  FROM documents
      |  UNION ALL
      |  SELECT source, doc_id, 'len480',
      |    CASE WHEN n_chars >= 480 AND doc_id % 13 <> 0
      |      THEN 'pos' ELSE 'neg' END
      |  FROM documents
      |  UNION ALL
      |  SELECT source, doc_id, 'hash',
      |    CASE WHEN CAST(('0x' ||
      |        substr(md5('rate:' || CAST(doc_id AS VARCHAR)), 1, 15))
      |        AS BIGINT) % 100 < 55
      |      THEN 'pos' ELSE 'neg' END
      |  FROM documents WHERE doc_id % 3 = 0)""".stripMargin

  /** q234's oracle: NDCG@k with the SAME driver-computed literal
    * discount table as Ranking.rankEval (no runtime libm on either
    * engine), row_number ideal ordering matching groupTopK's
    * (−rel, item) tie-break. */
  private def rankEvalOracleSql(k: Int): String = {
    val disc = Ranking.dcgDiscountsMicro(k)
    def discCase(r: String) =
      s"CASE $r ${disc.zipWithIndex.map { case (d, i) =>
        s"WHEN ${i + 1} THEN $d" }.mkString(" ")} END"
    s"""WITH rr AS (
       |  SELECT source, doc_id,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY n_chars DESC, doc_id ASC) AS rnk
       |  FROM documents),
       |res AS (SELECT source, doc_id, rnk FROM rr WHERE rnk <= $k),
       |tr AS (
       |  SELECT source, doc_id,
       |    CASE WHEN lang = 'en' THEN 2 WHEN lang = 'de' THEN 1
       |         ELSE 0 END AS rel
       |  FROM documents),
       |sys AS (
       |  SELECT res.source, CAST(count(*) AS BIGINT) AS n_results,
       |    CAST(sum(COALESCE(tr.rel, 0) * ${discCase("res.rnk")})
       |      AS BIGINT) AS dcg_micro,
       |    min(CASE WHEN COALESCE(tr.rel, 0) > 0 THEN res.rnk END) AS fr,
       |    CAST(sum(CASE WHEN COALESCE(tr.rel, 0) > 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS hits
       |  FROM res LEFT JOIN tr
       |    ON tr.source = res.source AND tr.doc_id = res.doc_id
       |  GROUP BY res.source),
       |id0 AS (
       |  SELECT source, rel,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY rel DESC, doc_id ASC) AS irnk
       |  FROM tr WHERE rel > 0),
       |ideal AS (
       |  SELECT source,
       |    CAST(sum(rel * ${discCase("irnk")}) AS BIGINT) AS idcg_micro
       |  FROM id0 WHERE irnk <= $k GROUP BY source)
       |SELECT sys.source, sys.n_results, sys.dcg_micro,
       |  COALESCE(ideal.idcg_micro, 0) AS idcg_micro,
       |  CASE WHEN COALESCE(ideal.idcg_micro, 0) = 0 THEN NULL
       |       ELSE CAST(round(1e6 * CAST(sys.dcg_micro AS DOUBLE)
       |         / CAST(ideal.idcg_micro AS DOUBLE)) AS BIGINT)
       |  END AS ndcg_micro,
       |  CASE WHEN fr IS NULL THEN NULL
       |       ELSE CAST(round(1e6 / CAST(fr AS DOUBLE)) AS BIGINT)
       |  END AS rr_micro,
       |  CAST(round(1e6 * CAST(hits AS DOUBLE) / $k.0) AS BIGINT)
       |    AS precision_micro
       |FROM sys LEFT JOIN ideal ON ideal.source = sys.source""".stripMargin
  }

  /** q241's oracle: both rankings via row_number with groupTopK's
    * tie-breaks, one join, and the SAME driver-computed RBO
    * suffix-weight table as Ranking.rbo, looked up by
    * greatest(ra, rb). */
  private def rboOracleSql(k: Int, p: Double): String = {
    val table = Ranking.rboSuffixMicro(p, k)
    val caseSql = s"CASE greatest(ra.rnk, rb.rnk) ${table.zipWithIndex
      .map { case (v, i) => s"WHEN ${i + 1} THEN $v" }.mkString(" ")} END"
    s"""WITH la AS (
       |  SELECT source, doc_id,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY n_chars DESC, doc_id ASC) AS rnk
       |  FROM documents),
       |lb AS (
       |  SELECT source, doc_id,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY doc_id ASC, doc_id ASC) AS rnk
       |  FROM documents),
       |ra AS (SELECT * FROM la WHERE rnk <= $k),
       |rb AS (SELECT * FROM lb WHERE rnk <= $k),
       |qs AS (
       |  SELECT DISTINCT ra.source FROM ra
       |  JOIN (SELECT DISTINCT source FROM rb) x ON x.source = ra.source),
       |ov AS (
       |  SELECT ra.source, CAST(count(*) AS BIGINT) AS n_common,
       |    CAST(sum($caseSql) AS BIGINT) AS rbo_micro
       |  FROM ra JOIN rb
       |    ON rb.source = ra.source AND rb.doc_id = ra.doc_id
       |  GROUP BY ra.source)
       |SELECT qs.source, COALESCE(ov.n_common, 0) AS n_common,
       |  COALESCE(ov.rbo_micro, 0) AS rbo_micro
       |FROM qs LEFT JOIN ov ON ov.source = qs.source""".stripMargin
  }

  /** q244's oracle (shared with q246, which aggregates the same
    * curve): the Kaplan–Meier log-survival census over user-lifetime
    * cohorts. */
  private lazy val kaplanMeierOracleSql: String =
    """WITH lv AS (
      |  SELECT user_id % 3 AS cohort,
      |    datediff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE)))
      |      AS dur,
      |    max(CAST(ts AS DATE)) < DATE '2024-01-25' AS churned
      |  FROM events GROUP BY user_id),
      |c AS (
      |  SELECT cohort, CAST(dur AS BIGINT) AS t,
      |    CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_deaths,
      |    CAST(sum(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT)
      |      AS n_censored
      |  FROM lv GROUP BY 1, 2),
      |w AS (
      |  SELECT cohort, t, n_deaths, n_censored,
      |    CAST(sum(n_deaths + n_censored) OVER (PARTITION BY cohort)
      |      - (sum(n_deaths + n_censored) OVER (PARTITION BY cohort
      |           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
      |           CURRENT ROW)
      |         - (n_deaths + n_censored)) AS BIGINT) AS n_at_risk
      |  FROM c),
      |tm AS (
      |  SELECT cohort, t, n_at_risk, n_deaths, n_censored,
      |    CASE WHEN n_deaths = 0 THEN 0
      |         WHEN n_deaths < n_at_risk THEN
      |           CAST(round(1e6 * ln(CAST(n_at_risk - n_deaths
      |             AS DOUBLE))) AS BIGINT)
      |           - CAST(round(1e6 * ln(CAST(n_at_risk AS DOUBLE)))
      |             AS BIGINT)
      |         ELSE 0 END AS term,
      |    CASE WHEN n_deaths >= n_at_risk THEN 1 ELSE 0 END AS dead
      |  FROM w),
      |f AS (
      |  SELECT cohort, t, n_at_risk, n_deaths, n_censored,
      |    sum(term) OVER wo AS cumln, sum(dead) OVER wo AS cumdead
      |  FROM tm WINDOW wo AS (PARTITION BY cohort ORDER BY t
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT cohort, t, n_at_risk, n_deaths, n_censored,
      |  CASE WHEN cumdead > 0 THEN NULL
      |       ELSE CAST(cumln AS BIGINT) END AS log_surv_mnat
      |FROM f""".stripMargin

  /** q238/q239's shared oracle scaffolding: the exact Heaps census —
    * each type counted at its min doc, cumulative window in doc
    * order, MILLI-nat ln columns (the downstream OLS products must
    * fit int64). */
  private val vocabGrowthCtes: String =
    """tok AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |      t -> len(t) > 0)) AS tok
      |  FROM documents),
      |fst AS (SELECT tok, min(doc_id) AS doc_id FROM tok GROUP BY tok),
      |ntp AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS new_types
      |  FROM fst GROUP BY doc_id),
      |pd AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks
      |  FROM tok GROUP BY doc_id),
      |j AS (
      |  SELECT pd.doc_id, pd.n_toks,
      |    COALESCE(ntp.new_types, 0) AS new_types
      |  FROM pd LEFT JOIN ntp USING (doc_id)),
      |cg AS (
      |  SELECT doc_id, n_toks, new_types,
      |    CAST(sum(n_toks) OVER w AS BIGINT) AS cum_tokens,
      |    CAST(sum(new_types) OVER w AS BIGINT) AS cum_types
      |  FROM j WINDOW w AS (ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |census AS (
      |  SELECT doc_id, n_toks, new_types, cum_tokens, cum_types,
      |    CAST(round(1e3 * ln(CAST(cum_tokens AS DOUBLE))) AS BIGINT)
      |      AS ln_tokens_milli,
      |    CAST(round(1e3 * ln(CAST(cum_types AS DOUBLE))) AS BIGINT)
      |      AS ln_types_milli
      |  FROM cg)""".stripMargin

  /** The oracle half of [[lineFixture]] — identical literal-pattern
    * chain, newline via chr(10). */
  private val lineFixtureSql: String =
    """lf AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(regexp_replace(text,
      |      ' order ', '.' || chr(10), 'g'),
      |      ' data ', chr(10) || '- ', 'g'),
      |      ' value ', chr(10), 'g') AS text3
      |  FROM documents)""".stripMargin

  /** q222's oracle: the weighted-PageRank integer update — exact
    * floor(r·w/W) per edge as (r // W)·w + ((r % W)·w) // W, damping
    * in integer percent — over the corpus word-adjacency graph,
    * mirroring Corpus.textRank → Graph.pageRankWeighted literally.
    * Nonnegative ranks keep `//`/`%` identical to Spark's `div`. */
  private def textRankOracleSql(minCount: Int, iters: Int): String = {
    val head =
      s"""WITH tok AS (
         |  SELECT list_filter(string_split_regex(lower(text), '\\s+'),
         |    t -> len(t) > 0) AS ts
         |  FROM documents),
         |bg AS (
         |  SELECT ts[i] AS x, ts[i + 1] AS y
         |  FROM tok, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)),
         |pc AS (
         |  SELECT least(x, y) AS u, greatest(x, y) AS v,
         |    CAST(count(*) AS BIGINT) AS w
         |  FROM bg WHERE x <> y GROUP BY 1, 2
         |  HAVING count(*) >= $minCount),
         |edges AS MATERIALIZED (
         |  SELECT u AS src, v AS dst, w FROM pc
         |  UNION ALL SELECT v AS src, u AS dst, w FROM pc),
         |nodes AS MATERIALIZED (
         |  SELECT src AS node FROM edges
         |  UNION SELECT dst AS node FROM edges),
         |outw AS MATERIALIZED (
         |  SELECT src, CAST(sum(w) AS BIGINT) AS wsum
         |  FROM edges GROUP BY src),
         |r0 AS MATERIALIZED (
         |  SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes)"""
        .stripMargin
    val rounds = (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT n.node,
         |    CAST(150000 + (85 * coalesce(i.infl, 0)) // 100 AS BIGINT)
         |      AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node,
         |      CAST(sum((r.rank // o.wsum) * e.w
         |        + ((r.rank % o.wsum) * e.w) // o.wsum) AS BIGINT) AS infl
         |    FROM edges e
         |    JOIN r${k - 1} r ON r.node = e.src
         |    JOIN outw o ON o.src = e.src
         |    GROUP BY e.dst) i ON i.node = n.node)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"\nSELECT t.node AS term, t.rank AS rank FROM r$iters t"
  }

  /** q223/q224's shared oracle scaffolding: micro-quantize the
    * embeddings, center on the rounded micro mean, then `iters`
    * power-iteration rounds mirroring Similarity.topComponentVec —
    * the u downshift and v normalization round the SAME single IEEE
    * steps, and the norm squares in HUGEINT exactly as the Scala
    * side squares in BigInt. */
  private def topComponentCtes(iters: Int): String = {
    val head =
      """x AS (
        |  SELECT vec_id, u.j,
        |    CAST(round(CAST(embedding[u.j] AS DOUBLE) * 1e6) AS BIGINT) AS q
        |  FROM embeddings, UNNEST(generate_series(1, 64)) AS u(j)),
        |mud AS MATERIALIZED (
        |  SELECT j, CAST(round(CAST(sum(q) AS DOUBLE) / count(*)) AS BIGINT)
        |    AS m
        |  FROM x GROUP BY j),
        |cx AS MATERIALIZED (
        |  SELECT x.vec_id, x.j, x.q - mud.m AS c FROM x JOIN mud USING (j)),
        |v0 AS (
        |  SELECT u.j, CAST(1000000 AS BIGINT) AS v
        |  FROM UNNEST(generate_series(1, 64)) AS u(j))""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""u$k AS (
         |  SELECT cx.vec_id,
         |    CAST(round(CAST(sum(vv.v * cx.c) AS DOUBLE) / 1e6) AS BIGINT)
         |      AS u
         |  FROM cx JOIN v${k - 1} vv ON vv.j = cx.j GROUP BY cx.vec_id),
         |w$k AS MATERIALIZED (
         |  SELECT cx.j, CAST(sum(uu.u * cx.c) AS BIGINT) AS w
         |  FROM cx JOIN u$k uu ON uu.vec_id = cx.vec_id GROUP BY cx.j),
         |n$k AS (
         |  SELECT sqrt(CAST(sum(CAST(w AS HUGEINT) * CAST(w AS HUGEINT))
         |    AS DOUBLE)) AS s
         |  FROM w$k),
         |v$k AS MATERIALIZED (
         |  SELECT w$k.j,
         |    CASE WHEN n$k.s = 0 THEN CAST(0 AS BIGINT)
         |         ELSE CAST(round(1e6 * CAST(w AS DOUBLE) / s) AS BIGINT)
         |    END AS v
         |  FROM w$k, n$k)""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  /** q81/q200's shared rule-filter replay over source CTE/table
    * `src(doc_id, text, …)`: the six C4/Dolma quality signals, the
    * fixed-order violated-reasons string, and the keep flag — CTE
    * chain `b` → `q` → `rf(doc_id, n_tokens, reasons, keep)`, the
    * twin of `Training.ruleFilter`. */
  private def ruleFilterChainSql(src: String): String = {
    val stop = graft.functions.TextFunctions.langMarkers
      .flatMap(_._2).distinct.map(s => s"'$s'").mkString(", ")
    val reasons =
      """concat_ws(',',
        |    CASE WHEN n_tokens < 10 THEN 'too_short' END,
        |    CASE WHEN mean_token_len < 2.0 OR mean_token_len > 12.0
        |         THEN 'tok_len' END,
        |    CASE WHEN punct_ratio > 0.3 THEN 'punct_heavy' END,
        |    CASE WHEN stopword_ratio < 0.03 THEN 'low_stopword' END,
        |    CASE WHEN digit_ratio > 0.2 THEN 'digit_heavy' END,
        |    CASE WHEN distinct_ratio < 0.3 THEN 'repetitive' END)"""
        .stripMargin
    s"""b AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0) AS toks,
      |    len(text) AS n_chars,
      |    len(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g')) AS alnum,
      |    len(regexp_replace(text, '[0-9]', '', 'g')) AS nodigit
      |  FROM $src),
      |q AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS INTEGER) AS n_tokens,
      |    CASE WHEN len(toks) > 0 THEN
      |      CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE)
      |        / len(toks) ELSE 0.0 END AS mean_token_len,
      |    CASE WHEN n_chars > 0 THEN
      |      CAST(n_chars - alnum AS DOUBLE) / n_chars ELSE 0.0
      |      END AS punct_ratio,
      |    CASE WHEN len(toks) > 0 THEN
      |      CAST(len(list_filter(toks, t -> list_contains([$stop], t)))
      |           AS DOUBLE) / len(toks) ELSE 0.0 END AS stopword_ratio,
      |    CASE WHEN n_chars > 0 THEN
      |      CAST(n_chars - nodigit AS DOUBLE) / n_chars ELSE 0.0
      |      END AS digit_ratio,
      |    CASE WHEN len(toks) > 0 THEN
      |      CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
      |      ELSE 0.0 END AS distinct_ratio
      |  FROM b),
      |rf AS (
      |  SELECT doc_id, n_tokens, $reasons AS reasons,
      |    ($reasons = '') AS keep
      |  FROM q)""".stripMargin
  }

  /** q198: clamped label-spreading replay — the q182 hash-graph edges
    * symmetrized, a 30-seed (node % 3) label table, then `iters`
    * unrolled vote rounds: majority of LABELED neighbors, ties to the
    * smaller label, seeds clamped, unvoted nodes keep their previous
    * label. */
  private def labelSpreadOracleSql(iters: Int): String = {
    val head =
      """WITH e0 AS (
        |  SELECT
        |    CAST(('0x' || substr(md5('hs:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 2000 AS src,
        |    CAST(('0x' || substr(md5('hd:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 2000 AS dst
        |  FROM events),
        |und AS (SELECT DISTINCT least(src, dst) AS a,
        |          greatest(src, dst) AS b
        |        FROM e0 WHERE src <> dst),
        |ed AS MATERIALIZED (
        |  SELECT a AS x, b AS y FROM und
        |  UNION ALL SELECT b AS x, a AS y FROM und),
        |sd AS (SELECT DISTINCT src AS node,
        |         CAST(src % 3 AS INT) AS lbl
        |       FROM e0 WHERE src < 30),
        |n0 AS (SELECT DISTINCT x AS node FROM ed),
        |l0 AS MATERIALIZED (
        |  SELECT coalesce(n0.node, sd.node) AS node,
        |    sd.lbl IS NOT NULL AS is_seed, sd.lbl AS label
        |  FROM n0 FULL OUTER JOIN sd ON n0.node = sd.node)"""
        .stripMargin
    val rounds = (1 to iters).map { k =>
      s"""v$k AS (
         |  SELECT e.x, l.label, count(*) AS c
         |  FROM ed e JOIN l${k - 1} l ON l.node = e.y
         |  WHERE l.label IS NOT NULL GROUP BY e.x, l.label),
         |w$k AS (
         |  SELECT x AS node, label AS wl FROM (
         |    SELECT x, label, row_number() OVER (
         |      PARTITION BY x ORDER BY c DESC, label) AS rn
         |    FROM v$k) WHERE rn = 1),
         |l$k AS MATERIALIZED (
         |  SELECT n.node, n.is_seed,
         |    CASE WHEN n.is_seed THEN n.label
         |         ELSE coalesce(w.wl, n.label) END AS label
         |  FROM l${k - 1} n LEFT JOIN w$k w ON w.node = n.node)"""
        .stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"\nSELECT node, label, is_seed FROM l$iters"
  }

  /** q106/q194's shared BM25 replay: tokenize → corpus totals → tf/df
    * → micro-nat idf → per-(query, doc) score → window rank, ending
    * in CTE `bmr(query_id, doc_id, n_terms, score, rank)`. Queries =
    * first 4 tokens of every doc_id % 100 == 0 doc — the twin of the
    * Spark side's `Retrieval.bm25Scores` + `Ranking.groupTopK`. */
  private val bm25ChainSql: String =
    """w AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |         t -> len(t) > 0) AS toks
      |  FROM documents),
      |lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS len FROM w),
      |tot AS (SELECT count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS tot_len
      |        FROM lens),
      |tf AS (SELECT doc_id, tok AS term, count(*) AS tf
      |       FROM (SELECT doc_id, unnest(toks) AS tok FROM w) GROUP BY 1, 2),
      |dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |qt AS (SELECT DISTINCT doc_id AS query_id,
      |         unnest(list_slice(toks, 1, 4)) AS term
      |       FROM w WHERE doc_id % 100 = 0),
      |idf AS (
      |  SELECT qt.query_id, qt.term, tot.n_docs, tot.tot_len,
      |    CAST(round(1e6 * ln(1 + (CAST(tot.n_docs - dfs.df AS DOUBLE) + 0.5)
      |      / (CAST(dfs.df AS DOUBLE) + 0.5))) AS BIGINT) AS idf_micro
      |  FROM dfs JOIN qt USING (term), tot),
      |sc AS (
      |  SELECT idf.query_id, tf.doc_id,
      |    CAST(round(CAST(idf_micro AS DOUBLE) *
      |      (CAST(tf.tf AS DOUBLE) * (1.2 + 1)
      |       / (CAST(tf.tf AS DOUBLE) + 1.2 * ((1 - 0.75)
      |          + 0.75 * CAST(lens.len AS DOUBLE) * CAST(idf.n_docs AS DOUBLE)
      |            / CAST(idf.tot_len AS DOUBLE))))) AS BIGINT) AS s_micro
      |  FROM tf JOIN idf USING (term) JOIN lens ON tf.doc_id = lens.doc_id),
      |agg AS (
      |  SELECT query_id, doc_id, count(*) AS n_terms,
      |    round(CAST(sum(s_micro) AS DOUBLE) / 1e6, 6) AS score
      |  FROM sc GROUP BY 1, 2),
      |bmr AS (
      |  SELECT query_id, doc_id, n_terms, score,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY score DESC, doc_id) AS rank
      |  FROM agg)""".stripMargin

  /** q184: seeded-PageRank replay — q182's edge CTEs, a 20-node seed
    * flag on the node table, then `iters` unrolled rounds whose base
    * term is CASE-gated on the seed flag (the only difference from
    * [[pageRankOracleSql]]'s uniform base). */
  private def trustRankOracleSql(iters: Int): String = {
    val head =
      """WITH e0 AS (
        |  SELECT
        |    CAST(('0x' || substr(md5('hs:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 2000 AS src,
        |    CAST(('0x' || substr(md5('hd:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 2000 AS dst
        |  FROM events),
        |ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0),
        |nodes AS MATERIALIZED (
        |  SELECT node, max(CASE WHEN node < 20 AND isrc THEN 1 ELSE 0 END)
        |    = 1 AS seed
        |  FROM (SELECT src AS node, TRUE AS isrc FROM ed
        |        UNION ALL SELECT dst AS node, FALSE AS isrc FROM ed) t
        |  GROUP BY node),
        |outdeg AS MATERIALIZED (
        |  SELECT src, CAST(count(*) AS BIGINT) AS deg
        |  FROM ed GROUP BY src),
        |r0 AS MATERIALIZED (
        |  SELECT node, seed,
        |    CAST(CASE WHEN seed THEN 1000000 ELSE 0 END AS BIGINT) AS rank
        |  FROM nodes)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT n.node, n.seed,
         |    CAST(CASE WHEN n.seed THEN 150000 ELSE 0 END
         |      + (85 * coalesce(i.infl, 0)) // 100 AS BIGINT) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node,
         |      CAST(sum(r.rank // d.deg) AS BIGINT) AS infl
         |    FROM ed e
         |    JOIN r${k - 1} r ON r.node = e.src
         |    JOIN outdeg d ON d.src = e.src
         |    GROUP BY e.dst) i ON i.node = n.node)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"\nSELECT node, rank FROM r$iters"
  }

  /** q180/q181's shared snapshot-diff CTE chain (`u` → `os`/`ns` →
    * `sdiff`) — the SQL twin of [[snapshotFixture]] +
    * [[graft.operators.Web.snapshotDiff]]. */
  private val snapshotDiffSql: String =
    """u AS (
      |  SELECT doc_id, text, CASE CAST(doc_id % 4 AS INT)
      |      WHEN 0 THEN 'https://news.example.co.uk'
      |      WHEN 1 THEN 'https://blog.example.com'
      |      WHEN 2 THEN 'https://example.com'
      |      ELSE 'http://mirror.site.org' END
      |    || '/p/' || CAST(doc_id AS VARCHAR) AS url
      |  FROM documents),
      |os AS (SELECT url, md5(text) AS old_digest
      |       FROM u WHERE doc_id % 3 <> 0),
      |ns AS (SELECT url,
      |         md5(CASE WHEN doc_id % 5 = 2 THEN text || 'v2'
      |                  ELSE text END) AS new_digest
      |       FROM u WHERE doc_id % 3 <> 1),
      |sdiff AS (
      |  SELECT coalesce(os.url, ns.url) AS url,
      |    CASE WHEN os.url IS NULL THEN 'added'
      |         WHEN ns.url IS NULL THEN 'removed'
      |         WHEN old_digest IS NOT DISTINCT FROM new_digest
      |           THEN 'unchanged'
      |         ELSE 'changed' END AS status,
      |    old_digest, new_digest
      |  FROM os FULL OUTER JOIN ns ON os.url = ns.url)""".stripMargin

  /** q182: unnormalized integer HITS replay — the q182 edge CTEs,
    * then `iters` unrolled auth/hub round pairs, each LEFT-joined
    * from the node table so zero-score nodes persist. MATERIALIZED
    * for the same reason as the PageRank oracle: round k references
    * round k−1 twice. */
  private def hitsOracleSql(iters: Int): String = {
    val head =
      """WITH e0 AS (
        |  SELECT
        |    CAST(('0x' || substr(md5('hs:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 2000 AS src,
        |    CAST(('0x' || substr(md5('hd:' || CAST(event_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 2000 AS dst
        |  FROM events),
        |ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0),
        |nodes AS MATERIALIZED (
        |  SELECT src AS node FROM ed UNION SELECT dst AS node FROM ed),
        |h0 AS MATERIALIZED (
        |  SELECT node, CAST(1000000 AS BIGINT) AS hub FROM nodes)"""
        .stripMargin
    val rounds = (1 to iters).map { k =>
      s"""a$k AS MATERIALIZED (
         |  SELECT n.node, CAST(coalesce(s.v, 0) AS BIGINT) AS auth
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(h.hub) AS v
         |    FROM ed e JOIN h${k - 1} h ON h.node = e.src
         |    GROUP BY e.dst) s ON s.node = n.node),
         |h$k AS MATERIALIZED (
         |  SELECT n.node, CAST(coalesce(s.v, 0) AS BIGINT) AS hub
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.src AS node, sum(a.auth) AS v
         |    FROM ed e JOIN a$k a ON a.node = e.dst
         |    GROUP BY e.src) s ON s.node = n.node)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"\nSELECT h.node, h.hub, a.auth FROM h$iters h JOIN a$iters a" +
      " ON a.node = h.node"
  }

  /** Self-contained DuckDB twin of q110: retrains the same `nMerges`
    * BPE merges with unrolled SQL rounds, then re-encodes and counts
    * pieces. Mirrors [[graft.operators.Corpus.bpeTrain]] exactly: pair
    * counts are weighted by token frequency (counting over DISTINCT
    * tokens × weight ≡ counting over occurrences), candidates need
    * count ≥ 2, ties break (count desc, a asc, b asc).
    *
    * Encoding trick: each symbol is wrapped as `<sym>` (the corpus
    * alphabet is lowercase ASCII, so the delimiters can't collide), so
    * `replace('<a><b>' → '<ab>')` merges exactly at symbol boundaries
    * — a space-joined form would both match inside multi-char symbols
    * ("xa b" vs "a b") and phase-shift runs ("a a a a" merges as
    * [aa, a, aa] instead of [aa, aa] once the shared delimiter is
    * consumed). Sequential in-order replace ≡ the greedy
    * lowest-rank-first loop in BpeEncode as long as no later merge
    * re-creates an earlier merge's left/right symbol string — impossible
    * for rank-0 single chars and verified empirically at sf0.001 and
    * sf0.01 (identical merges and per-doc counts). CTEs are
    * MATERIALIZED: each round reads the previous twice, and inlining
    * would expand the chain 2^rounds times. */
  /** DuckDB twin of q119: the same minhash-candidate edge set, then
    * `iters` unrolled integer-PageRank rounds mirroring
    * [[graft.operators.Graph.pageRank]] (unit 1e6, damping 85%,
    * base 150000; `//` on non-negative BIGINTs ≡ Spark's `div`).
    * Rounds are MATERIALIZED — each is read by the next round's
    * join, and inlining would expand the chain per round. */
  /** q147: the q146-style extraction/resolution/eTLD+1 chain over the
    * 7-site page construction, collapsed to distinct non-self domain
    * edges, then `iters` unrolled integer-PageRank rounds (same
    * arithmetic as [[pageRankOracleSql]], VARCHAR nodes). */
  private def domainPageRankOracleSql(iters: Int): String = {
    val head =
      """WITH pm AS (
        |  SELECT doc_id,
        |    'https://www.site' || CAST(doc_id % 7 AS VARCHAR)
        |      || '.com/docs/d' || CAST(doc_id AS VARCHAR) || '.html' AS base,
        |    '<html><body><p>' || text || '</p>'
        |    || '<a href="https://partner' || CAST(doc_id % 5 AS VARCHAR)
        |      || '-press.org/ref?id=' || CAST(doc_id AS VARCHAR) || '">cite</a>'
        |    || '<a href="//cdn' || CAST(doc_id % 3 AS VARCHAR)
        |      || 'media.net/lib">cdn</a>'
        |    || '<a href="https://www.site' || CAST((doc_id + 1) % 7 AS VARCHAR)
        |      || '.com/docs/d' || CAST(doc_id + 1 AS VARCHAR) || '.html">next</a>'
        |    || '<a href="/about">about</a>'
        |    || '<a href="#top">top</a></body></html>' AS html
        |  FROM documents),
        |pl AS (
        |  SELECT doc_id, base,
        |    regexp_extract_all(html,
        |      '(?i)<a\b[^>]*?\shref\s*=\s*["'']([^"''#>]*)', 1) AS links
        |  FROM pm),
        |pe AS (
        |  SELECT doc_id, base, links[i] AS href
        |  FROM pl, UNNEST(generate_series(1, len(links))) AS u(i)),
        |pb AS (
        |  SELECT doc_id, base, href,
        |    regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) AS bscheme,
        |    regexp_extract(base,
        |      '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)', 1) AS borigin,
        |    regexp_replace(regexp_extract(base,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1),
        |      '[^/]*$', '') AS bdir
        |  FROM pe),
        |pres AS (
        |  SELECT base,
        |    CASE
        |      WHEN href = '' THEN NULL
        |      WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*://')
        |        THEN href
        |      -- scheme with no '//' (mailto:, javascript:): absolute
        |      -- but non-hierarchical — NULL quarantine, not relative.
        |      WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*:')
        |        THEN NULL
        |      WHEN starts_with(href, '//') THEN bscheme || ':' || href
        |      WHEN starts_with(href, '/') THEN borigin || href
        |      ELSE borigin
        |        || CASE WHEN bdir = '' THEN '/' ELSE bdir END || href
        |    END AS url
        |  FROM pb),
        |pdom AS (
        |  SELECT
        |    list_filter(string_split(lower(regexp_extract(base,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]+)', 1)),
        |      '.'), x -> len(x) > 0) AS bls,
        |    list_filter(string_split(lower(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]+)', 1)),
        |      '.'), x -> len(x) > 0) AS uls
        |  FROM pres WHERE url IS NOT NULL),
        |pedge AS (
        |  SELECT
        |    CASE WHEN len(bls) < 2 THEN NULL
        |         WHEN len(bls) >= 3 AND bls[len(bls)-1] IN
        |              ('co','com','net','org','ac','gov','edu')
        |              AND len(bls[len(bls)]) = 2
        |           THEN array_to_string(list_slice(bls, len(bls)-2, len(bls)), '.')
        |         ELSE array_to_string(list_slice(bls, len(bls)-1, len(bls)), '.')
        |    END AS src,
        |    CASE WHEN len(uls) < 2 THEN NULL
        |         WHEN len(uls) >= 3 AND uls[len(uls)-1] IN
        |              ('co','com','net','org','ac','gov','edu')
        |              AND len(uls[len(uls)]) = 2
        |           THEN array_to_string(list_slice(uls, len(uls)-2, len(uls)), '.')
        |         ELSE array_to_string(list_slice(uls, len(uls)-1, len(uls)), '.')
        |    END AS dst
        |  FROM pdom),
        |edges AS MATERIALIZED (
        |  SELECT DISTINCT src, dst FROM pedge
        |  WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
        |nodes AS MATERIALIZED (
        |  SELECT src AS node FROM edges
        |  UNION SELECT dst AS node FROM edges),
        |outdeg AS MATERIALIZED (
        |  SELECT src, CAST(count(*) AS BIGINT) AS deg
        |  FROM edges GROUP BY src),
        |r0 AS MATERIALIZED (
        |  SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes)"""
        .stripMargin
    (head +: prRoundsSql(iters)).mkString(",\n") +
      s"\nSELECT t.node AS domain, t.rank AS rank FROM r$iters t"
  }

  /** `iters` unrolled integer-PageRank rounds (unit 1e6, damping 85%,
    * base 150000 — [[graft.operators.Graph.pageRank]]'s arithmetic)
    * reading CTEs `edges(src, dst)` / `nodes(node)` /
    * `outdeg(src, deg)` / `r0(node, rank)`. Shared by the q147 and
    * q155 oracles; works for any node type. */
  /** The unrolled k-core peel rounds for the q167 oracle: per round a
    * degree census over the surviving undirected edges, the ≥ k keep
    * set, and the two-sided endpoint filter — the SQL twin of one
    * [[graft.operators.Graph.kCore]] round. */
  private def kCoreRoundsSql(iters: Int, k: Int): Seq[String] =
    (1 to iters).map { r =>
      s"""k$r AS (
         |  SELECT node FROM (
         |    SELECT node, count(*) AS deg FROM (
         |      SELECT a AS node FROM e${r - 1}
         |      UNION ALL SELECT b FROM e${r - 1})
         |    GROUP BY node)
         |  WHERE deg >= $k),
         |e$r AS MATERIALIZED (
         |  SELECT e.a, e.b FROM e${r - 1} e
         |  JOIN k$r x ON e.a = x.node
         |  JOIN k$r y ON e.b = y.node)""".stripMargin
    }

  private def prRoundsSql(iters: Int): Seq[String] =
    (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT n.node,
         |    CAST(150000 + (85 * coalesce(i.infl, 0)) // 100 AS BIGINT)
         |      AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node,
         |      CAST(sum(r.rank // d.deg) AS BIGINT) AS infl
         |    FROM edges e
         |    JOIN r${k - 1} r ON r.node = e.src
         |    JOIN outdeg d ON d.src = e.src
         |    GROUP BY e.dst) i ON i.node = n.node)""".stripMargin
    }

  private def pageRankOracleSql(iters: Int): String = {
    val head =
      s"""WITH bands AS ($minhashBandsSql),
         |cands AS (
         |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |  FROM bands l JOIN bands r
         |    ON l.band_id = r.band_id AND l.band_key = r.band_key
         |  WHERE l.doc_id < r.doc_id),
         |edges AS MATERIALIZED (
         |  SELECT a AS src, b AS dst FROM cands
         |  UNION ALL SELECT b AS src, a AS dst FROM cands),
         |nodes AS MATERIALIZED (
         |  SELECT src AS node FROM edges
         |  UNION SELECT dst AS node FROM edges),
         |outdeg AS MATERIALIZED (
         |  SELECT src, CAST(count(*) AS BIGINT) AS deg
         |  FROM edges GROUP BY src),
         |r0 AS MATERIALIZED (
         |  SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes)"""
        .stripMargin
    val rounds = (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT n.node,
         |    CAST(150000 + (85 * coalesce(i.infl, 0)) // 100 AS BIGINT)
         |      AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node,
         |      CAST(sum(r.rank // d.deg) AS BIGINT) AS infl
         |    FROM edges e
         |    JOIN r${k - 1} r ON r.node = e.src
         |    JOIN outdeg d ON d.src = e.src
         |    GROUP BY e.dst) i ON i.node = n.node)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"\nSELECT t.node AS doc_id, t.rank AS rank FROM r$iters t"
  }

  /** q132: synchronous LPA replay — the q128 candidate edge CTEs,
    * then `iters` unrolled vote rounds. Votes are neighbor labels
    * only; the winner is (count DESC, label ASC) via row_number
    * (DuckDB's min_by rejects struct ordering keys — the same
    * workaround as q69). Every node has a neighbor by construction,
    * so each round's winner table covers every node. MATERIALIZED:
    * round k references e and l(k−1), and inlining would re-expand
    * the band join 2^iters times. */
  private def labelPropagationOracleSql(iters: Int): String = {
    val head =
      s"""WITH bands AS ($minhashBandsSql),
         |cands AS (
         |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |  FROM bands l JOIN bands r
         |    ON l.band_id = r.band_id AND l.band_key = r.band_key
         |  WHERE l.doc_id < r.doc_id),
         |e AS MATERIALIZED (
         |  SELECT a AS x, b AS y FROM cands
         |  UNION ALL SELECT b, a FROM cands),
         |l0 AS MATERIALIZED (
         |  SELECT DISTINCT x AS node, x AS lbl FROM e)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""c$k AS MATERIALIZED (
         |  SELECT e.x AS node, l.lbl, count(*) AS c
         |  FROM e JOIN l${k - 1} l ON l.node = e.y
         |  GROUP BY 1, 2),
         |l$k AS MATERIALIZED (
         |  SELECT node, lbl FROM (
         |    SELECT node, lbl,
         |      row_number() OVER (PARTITION BY node
         |        ORDER BY c DESC, lbl ASC) AS rn
         |    FROM c$k) t WHERE rn = 1)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"\nSELECT node AS doc_id, lbl AS label FROM l$iters"
  }

  /** DuckDB twin of q129: the q36 verified-pair CTEs (bands →
    * candidates → exact-Jaccard ≥ 0.6), milli-Jaccard weights, then
    * `iters` unrolled WEIGHTED integer-PageRank rounds mirroring
    * [[graft.operators.Graph.pageRankWeighted]] — the same
    * overflow-safe (r//W)·w + ((r%W)·w)//W per-edge contribution. */
  private def weightedPageRankOracleSql(iters: Int): String = {
    val head =
      s"""WITH bands AS ($minhashBandsSql),
         |cands AS (
         |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |  FROM bands l JOIN bands r
         |    ON l.band_id = r.band_id AND l.band_key = r.band_key
         |  WHERE l.doc_id < r.doc_id),
         |sets AS (${shingleSetsSql("")}),
         |ver AS (
         |  SELECT c.a, c.b,
         |    CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
         |         THEN CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |              / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE)
         |         ELSE 0.0 END AS j
         |  FROM cands c
         |  JOIN sets sa ON sa.doc_id = c.a
         |  JOIN sets sb ON sb.doc_id = c.b),
         |p AS (SELECT a, b, CAST(round(j * 1000) AS BIGINT) AS w
         |      FROM ver WHERE j >= 0.6),
         |edges AS MATERIALIZED (
         |  SELECT a AS src, b AS dst, w FROM p
         |  UNION ALL SELECT b AS src, a AS dst, w FROM p),
         |nodes AS MATERIALIZED (
         |  SELECT src AS node FROM edges
         |  UNION SELECT dst AS node FROM edges),
         |outw AS MATERIALIZED (
         |  SELECT src, CAST(sum(w) AS BIGINT) AS wsum
         |  FROM edges GROUP BY src),
         |r0 AS MATERIALIZED (
         |  SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes)"""
        .stripMargin
    val rounds = (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT n.node,
         |    CAST(150000 + (85 * coalesce(i.infl, 0)) // 100 AS BIGINT)
         |      AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node,
         |      CAST(sum((r.rank // o.wsum) * e.w
         |        + ((r.rank % o.wsum) * e.w) // o.wsum) AS BIGINT) AS infl
         |    FROM edges e
         |    JOIN r${k - 1} r ON r.node = e.src
         |    JOIN outw o ON o.src = e.src
         |    GROUP BY e.dst) i ON i.node = n.node)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"\nSELECT t.node AS doc_id, t.rank AS rank FROM r$iters t"
  }

  /** The serial BPE-merge replay rounds (shared by the whitespace and
    * script-aware oracle builders — the merge rule itself cannot
    * drift between them). */
  private def bpeRoundsSql(nMerges: Int): String =
    (1 to nMerges).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT '<' || a || '><' || b || '>' AS pat,
         |         '<' || a || b || '>' AS rep
         |  FROM (
         |    SELECT syms[g] AS a, syms[g + 1] AS b,
         |           CAST(sum(w) AS BIGINT) AS c
         |    FROM (SELECT w, regexp_extract_all(s, '<([^>]*)>', 1) AS syms
         |          FROM enc${i - 1}) e,
         |      LATERAL (SELECT unnest(generate_series(1, len(e.syms) - 1))
         |               AS g) gs
         |    GROUP BY 1, 2 HAVING sum(w) >= 2
         |    ORDER BY c DESC, a ASC, b ASC LIMIT 1)),
         |enc$i AS MATERIALIZED (
         |  SELECT tok, w, replace(s, coalesce((SELECT pat FROM p$i), chr(1)),
         |    coalesce((SELECT rep FROM p$i), chr(1))) AS s
         |  FROM enc${i - 1})""".stripMargin
    }.mkString(",\n")

  private def bpeOracleSql(nMerges: Int): String = {
    val head =
      """WITH toks AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS w
        |  FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |        t -> len(t) > 0)) AS tok FROM documents)
        |  GROUP BY 1),
        |enc0 AS MATERIALIZED (
        |  SELECT tok, w, regexp_replace(tok, '(.)', '<\1>', 'g') AS s
        |  FROM toks)""".stripMargin
    val tail =
      s"""d AS (
         |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
         |    t -> len(t) > 0)) AS tok FROM documents)
         |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(len(e.s) - len(replace(e.s, '<', ''))) AS BIGINT)
         |    AS n_pieces,
         |  CAST(sum(len(d.tok)) AS BIGINT) AS n_chars
         |FROM d JOIN enc$nMerges e ON d.tok = e.tok
         |GROUP BY 1""".stripMargin
    s"$head,\n${bpeRoundsSql(nMerges)},\n$tail"
  }

  /** BPE per-doc piece counts over ANY corpus CTE chain ending in
    * `toks(doc_id, w)` with w a token LIST (e.g.
    * [[cjkCorpusToksSqlCtes]]'s script-aware route) — same replay
    * rounds, same self-delimiting symbol form, different tokenizer. */
  private def bpeOracleSqlOverCtes(
      nMerges: Int, corpusToksCtes: String): String = {
    val head =
      s"""WITH $corpusToksCtes,
         |tw AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS w
         |  FROM (SELECT unnest(w) AS tok FROM toks)
         |  GROUP BY 1),
         |enc0 AS MATERIALIZED (
         |  SELECT tok, w, regexp_replace(tok, '(.)', '<\\1>', 'g') AS s
         |  FROM tw)""".stripMargin
    val tail =
      s"""dd AS (SELECT doc_id, unnest(w) AS tok FROM toks)
         |SELECT dd.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(len(e.s) - len(replace(e.s, '<', ''))) AS BIGINT)
         |    AS n_pieces,
         |  CAST(sum(len(dd.tok)) AS BIGINT) AS n_chars
         |FROM dd JOIN enc$nMerges e ON dd.tok = e.tok
         |GROUP BY 1""".stripMargin
    s"$head,\n${bpeRoundsSql(nMerges)},\n$tail"
  }

  /** q252's oracle: the word-n-gram clipped-count census per order,
    * id-spined (gram-less rows contribute zeros, not absences), then
    * the BLEU formula with the SAME per-term micro-nat quantization
    * and expression shape as TextEval.bleu. */
  private lazy val bleuOracleSql: String = {
    val perN = (1 to 4).map { n =>
      s"""cg$n AS (
         |  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cc FROM (
         |    SELECT doc_id,
         |      array_to_string(list_slice(cw, i, i + ${n - 1}), ' ') AS g
         |    FROM tok, LATERAL (SELECT unnest(generate_series(1,
         |      greatest(len(cw) - ${n - 1}, 0))) AS i) u)
         |  GROUP BY 1, 2),
         |rg$n AS (
         |  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS rc FROM (
         |    SELECT doc_id,
         |      array_to_string(list_slice(rw, i, i + ${n - 1}), ' ') AS g
         |    FROM tok, LATERAL (SELECT unnest(generate_series(1,
         |      greatest(len(rw) - ${n - 1}, 0))) AS i) u)
         |  GROUP BY 1, 2),
         |x$n AS (
         |  SELECT c.doc_id,
         |    sum(least(c.cc, coalesce(r.rc, 0))) AS clip,
         |    sum(c.cc) AS ctot
         |  FROM cg$n c LEFT JOIN rg$n r USING (doc_id, g) GROUP BY 1),
         |s$n AS (
         |  SELECT tok.source,
         |    CAST(sum(coalesce(x.clip, 0)) AS BIGINT) AS clip,
         |    CAST(sum(coalesce(x.ctot, 0)) AS BIGINT) AS ctot
         |  FROM tok LEFT JOIN x$n x USING (doc_id) GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val pCols = (1 to 4).map { n =>
      s"""  CASE WHEN s$n.ctot > 0 THEN CAST(round(1e6
         |    * CAST(s$n.clip AS DOUBLE) / CAST(s$n.ctot AS DOUBLE))
         |    AS BIGINT) ELSE NULL END AS p${n}_micro""".stripMargin
    }.mkString(",\n")
    val lnSum = (1 to 4).map(n =>
      s"CAST(round(1e6 * ln(CAST(s$n.clip AS DOUBLE) / " +
        s"CAST(s$n.ctot AS DOUBLE))) AS BIGINT)").mkString("\n      + ")
    val allPos = (1 to 4).map(n =>
      s"s$n.clip > 0 AND s$n.ctot > 0").mkString(" AND ")
    s"""WITH $genEvalFixtureSql,
       |$perN,
       |lens AS (
       |  SELECT source, CAST(sum(len(cw)) AS BIGINT) AS cand_len,
       |    CAST(sum(len(rw)) AS BIGINT) AS ref_len
       |  FROM tok GROUP BY 1)
       |SELECT lens.source, lens.cand_len, lens.ref_len,
       |$pCols,
       |  CASE WHEN lens.cand_len > 0 AND $allPos
       |    THEN CAST(round(1e6 * exp((CAST((
       |      $lnSum
       |      ) AS DOUBLE) / 4.0 + CAST(least(0, CAST(round(1e6
       |        * (1.0 - CAST(lens.ref_len AS DOUBLE)
       |          / CAST(lens.cand_len AS DOUBLE))) AS BIGINT))
       |        AS DOUBLE)) / 1e6)) AS BIGINT)
       |    ELSE 0 END AS bleu_micro
       |FROM lens
       |JOIN s1 USING (source) JOIN s2 USING (source)
       |JOIN s3 USING (source) JOIN s4 USING (source)""".stripMargin
  }

  /** q274's oracle: ROUGE-1/2 over the q252 pairs — the same clipped
    * word-gram census as BLEU's plus the reference-total (recall)
    * side, one UNION ALL row per order. Ratio parentheses mirror the
    * Spark side exactly: p and r are each computed as ONE divide and
    * then multiplied (not re-associated), so the IEEE results match
    * bit-for-bit. */
  private lazy val rougeOracleSql: String = {
    val perN = (1 to 2).map { n =>
      s"""cg$n AS (
         |  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cc FROM (
         |    SELECT doc_id,
         |      array_to_string(list_slice(cw, i, i + ${n - 1}), ' ') AS g
         |    FROM tok, LATERAL (SELECT unnest(generate_series(1,
         |      greatest(len(cw) - ${n - 1}, 0))) AS i) u)
         |  GROUP BY 1, 2),
         |rg$n AS (
         |  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS rc FROM (
         |    SELECT doc_id,
         |      array_to_string(list_slice(rw, i, i + ${n - 1}), ' ') AS g
         |    FROM tok, LATERAL (SELECT unnest(generate_series(1,
         |      greatest(len(rw) - ${n - 1}, 0))) AS i) u)
         |  GROUP BY 1, 2),
         |x$n AS (
         |  SELECT c.doc_id,
         |    sum(least(c.cc, coalesce(r.rc, 0))) AS clip,
         |    sum(c.cc) AS ctot
         |  FROM cg$n c LEFT JOIN rg$n r USING (doc_id, g) GROUP BY 1),
         |y$n AS (
         |  SELECT doc_id, sum(rc) AS rtot FROM rg$n GROUP BY 1),
         |s$n AS (
         |  SELECT tok.source,
         |    CAST(sum(coalesce(x.clip, 0)) AS BIGINT) AS clip,
         |    CAST(sum(coalesce(x.ctot, 0)) AS BIGINT) AS ctot,
         |    CAST(sum(coalesce(y.rtot, 0)) AS BIGINT) AS rtot
         |  FROM tok LEFT JOIN x$n x USING (doc_id)
         |    LEFT JOIN y$n y USING (doc_id) GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    def row(n: Int): String = {
      val p = s"(CAST(clip AS DOUBLE) / CAST(ctot AS DOUBLE))"
      val r = s"(CAST(clip AS DOUBLE) / CAST(rtot AS DOUBLE))"
      s"""SELECT source, CAST($n AS BIGINT) AS n, clip, ctot, rtot,
         |  CASE WHEN ctot > 0 THEN CAST(round(1e6 * $p) AS BIGINT)
         |    ELSE NULL END AS p_micro,
         |  CASE WHEN rtot > 0 THEN CAST(round(1e6 * $r) AS BIGINT)
         |    ELSE NULL END AS r_micro,
         |  CASE WHEN ctot > 0 AND rtot > 0 THEN
         |    CASE WHEN clip > 0 THEN CAST(round(
         |      1e6 * 2.0 * $p * $r / ($p + $r)) AS BIGINT) ELSE 0 END
         |    ELSE NULL END AS f1_micro
         |FROM s$n""".stripMargin
    }
    s"""WITH $genEvalFixtureSql,
       |$perN
       |${row(1)}
       |UNION ALL
       |${row(2)}""".stripMargin
  }

  /** q253's oracle: the chrF census (char 1..6-grams over the
    * whitespace-condensed pair), micro-quantized per order then one
    * divide each — no libm, so parity is exact. */
  private lazy val chrfOracleSql: String = {
    val perN = (1 to 6).map { n =>
      s"""cg$n AS (
         |  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cc FROM (
         |    SELECT doc_id, substr(cd, i, $n) AS g
         |    FROM tok2, LATERAL (SELECT unnest(generate_series(1,
         |      greatest(length(cd) - ${n - 1}, 0))) AS i) u)
         |  GROUP BY 1, 2),
         |rg$n AS (
         |  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS rc FROM (
         |    SELECT doc_id, substr(rd, i, $n) AS g
         |    FROM tok2, LATERAL (SELECT unnest(generate_series(1,
         |      greatest(length(rd) - ${n - 1}, 0))) AS i) u)
         |  GROUP BY 1, 2),
         |x$n AS (
         |  SELECT c.doc_id,
         |    sum(least(c.cc, coalesce(r.rc, 0))) AS clip,
         |    sum(c.cc) AS ctot
         |  FROM cg$n c LEFT JOIN rg$n r USING (doc_id, g) GROUP BY 1),
         |rt$n AS (
         |  SELECT doc_id, sum(rc) AS rtot FROM rg$n GROUP BY 1),
         |s$n AS (
         |  SELECT tok2.source,
         |    CASE WHEN sum(coalesce(x.ctot, 0)) > 0
         |      THEN CAST(round(1e6 * CAST(sum(coalesce(x.clip, 0))
         |        AS DOUBLE) / CAST(sum(coalesce(x.ctot, 0)) AS DOUBLE))
         |        AS BIGINT) ELSE 0 END AS pq,
         |    CASE WHEN sum(coalesce(rt.rtot, 0)) > 0
         |      THEN CAST(round(1e6 * CAST(sum(coalesce(x.clip, 0))
         |        AS DOUBLE) / CAST(sum(coalesce(rt.rtot, 0)) AS DOUBLE))
         |        AS BIGINT) ELSE 0 END AS rq
         |  FROM tok2 LEFT JOIN x$n x USING (doc_id)
         |    LEFT JOIN rt$n rt USING (doc_id)
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val spSum = (1 to 6).map(n => s"s$n.pq").mkString(" + ")
    val srSum = (1 to 6).map(n => s"s$n.rq").mkString(" + ")
    s"""WITH $genEvalFixtureSql,
       |tok2 AS (
       |  SELECT doc_id, source,
       |    regexp_replace(cand, '\\s+', '', 'g') AS cd,
       |    regexp_replace(ref, '\\s+', '', 'g') AS rd
       |  FROM f),
       |$perN,
       |sums AS (
       |  SELECT s1.source,
       |    CAST($spSum AS BIGINT) AS sp, CAST($srSum AS BIGINT) AS sr
       |  FROM s1 JOIN s2 USING (source) JOIN s3 USING (source)
       |    JOIN s4 USING (source) JOIN s5 USING (source)
       |    JOIN s6 USING (source))
       |SELECT source,
       |  CAST(round(CAST(sp AS DOUBLE) / 6.0) AS BIGINT) AS chrp_micro,
       |  CAST(round(CAST(sr AS DOUBLE) / 6.0) AS BIGINT) AS chrr_micro,
       |  CASE WHEN sp + sr > 0
       |    THEN CAST(round((5.0 * (CAST(sp AS DOUBLE) / 6.0)
       |      * (CAST(sr AS DOUBLE) / 6.0))
       |      / (4.0 * (CAST(sp AS DOUBLE) / 6.0)
       |        + (CAST(sr AS DOUBLE) / 6.0))) AS BIGINT)
       |    ELSE 0 END AS chrf_micro
       |FROM sums""".stripMargin
  }

  /** Shared unigram-rarity CTE chain (mirrors [[Corpus.rarityScores]]
    * at dfThreshold 4): dt/dfs/rare ending with rare(doc_id,
    * n_tokens, n_rare, rare_frac). Used by the q92 oracle AND
    * [[ensembleMuSql]], so the df rule can never diverge between
    * them. */
  private lazy val rarityCtes: String =
    """dt AS (
      |  SELECT d.doc_id, u.tok, count(*) AS c
      |  FROM documents d,
      |    UNNEST(list_filter(string_split_regex(lower(d.text), '\s+'),
      |                       t -> len(t) > 0)) AS u(tok)
      |  GROUP BY 1, 2),
      |dfs AS (SELECT tok, count(*) AS df FROM dt GROUP BY 1),
      |rare AS (
      |  SELECT dt.doc_id,
      |    CAST(sum(dt.c) AS BIGINT) AS n_tokens,
      |    CAST(sum(CASE WHEN dfs.df < 4 THEN dt.c ELSE 0 END) AS BIGINT)
      |      AS n_rare,
      |    round(CAST(sum(CASE WHEN dfs.df < 4 THEN dt.c ELSE 0 END)
      |          AS DOUBLE) / sum(dt.c), 6) AS rare_frac
      |  FROM dt JOIN dfs USING (tok) GROUP BY 1)""".stripMargin

  /** Shared ensemble CTE chain (mirrors [[Training.qualityEnsemble]]):
    * the rarity (dt/dfs/rare), repetition (w0/g2../a3/rep), and
    * bigram-LM ([[lmNllCtes]]) families, ending with mu(doc_id,
    * rare_mu, top2_mu, dup3_mu, nll_mu) — q126 scores it, q127 gates
    * on the per-source percentile bar. */
  private lazy val ensembleMuSql: String =
    s"""$lmNllCtes,
       |$rarityCtes,
       |w0 AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
       |                                  t -> len(t) > 0) AS w
       |       FROM documents),
       |g2 AS (SELECT doc_id,
       |         unnest(CASE WHEN len(w) < 2 THEN CAST([] AS VARCHAR[])
       |           ELSE list_transform(generate_series(0, len(w)-2),
       |                  i -> array_to_string(list_slice(w, i+1, i+2), ' '))
       |           END) AS g
       |       FROM w0),
       |c2 AS (SELECT doc_id, count(*) AS c, count(*)*len(g) AS chars
       |       FROM g2 GROUP BY doc_id, g),
       |a2 AS (SELECT doc_id, CAST(max(chars) AS DOUBLE)/sum(chars) AS top2
       |       FROM c2 GROUP BY doc_id),
       |g3 AS (SELECT doc_id,
       |         unnest(CASE WHEN len(w) < 3 THEN CAST([] AS VARCHAR[])
       |           ELSE list_transform(generate_series(0, len(w)-3),
       |                  i -> array_to_string(list_slice(w, i+1, i+3), ' '))
       |           END) AS g
       |       FROM w0),
       |c3 AS (SELECT doc_id, count(*) AS c, count(*)*len(g) AS chars
       |       FROM g3 GROUP BY doc_id, g),
       |a3 AS (SELECT doc_id,
       |         CAST(sum(CASE WHEN c >= 2 THEN chars ELSE 0 END) AS DOUBLE)
       |           / sum(chars) AS dup3
       |       FROM c3 GROUP BY doc_id),
       |rep AS (
       |  SELECT d.doc_id,
       |    round(COALESCE(a2.top2, 0.0), 6) AS top2,
       |    round(COALESCE(a3.dup3, 0.0), 6) AS dup3
       |  FROM w0 d
       |  LEFT JOIN a2 ON d.doc_id = a2.doc_id
       |  LEFT JOIN a3 ON d.doc_id = a3.doc_id),
       |mu AS (
       |  SELECT rare.doc_id,
       |    CAST(round(rare.rare_frac * 1000000) AS BIGINT) AS rare_mu,
       |    CAST(round(rep.top2 * 1000000) AS BIGINT) AS top2_mu,
       |    CAST(round(rep.dup3 * 1000000) AS BIGINT) AS dup3_mu,
       |    CAST(round(n.nll * 1000000) AS BIGINT) AS nll_mu
       |  FROM rare JOIN rep USING (doc_id) JOIN nlltab n USING (doc_id))"""
      .stripMargin

  /** Shared bigram-LM CTE chain (mirrors [[Corpus.lmPerplexity]]):
    * documents → add-one-smoothed per-doc NLL in integer micro-nats.
    * Ends with nlltab(doc_id, n_bigrams, nll); parallel unnests zip
    * positionally in DuckDB, giving the bigram stream. */
  private lazy val lmNllCtes: String =
    """w AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |         t -> len(t) > 0) AS toks
      |  FROM documents),
      |occ AS (
      |  SELECT doc_id, toks[u.i] || ' ' || toks[u.i+1] AS bigram,
      |         toks[u.i] AS x
      |  FROM w, UNNEST(generate_series(1, len(toks)-1)) AS u(i)),
      |uni AS (
      |  SELECT tok, count(*) AS c_x
      |  FROM (SELECT unnest(toks) AS tok FROM w) GROUP BY 1),
      |vsz AS (SELECT count(*) AS v FROM uni),
      |big AS (SELECT bigram, count(*) AS c_xy FROM occ GROUP BY 1),
      |lp AS (
      |  SELECT occ.doc_id,
      |    CAST(round(1e6 * ln(CAST(big.c_xy + 1 AS DOUBLE)
      |      / CAST(uni.c_x + vsz.v AS DOUBLE))) AS BIGINT) AS lp
      |  FROM occ
      |  JOIN big USING (bigram)
      |  JOIN uni ON occ.x = uni.tok, vsz),
      |nlltab AS (
      |  SELECT doc_id, count(*) AS n_bigrams,
      |    round(CAST(-sum(lp) AS DOUBLE) / 1e6
      |      / CAST(count(*) AS DOUBLE), 6) AS nll
      |  FROM lp GROUP BY 1)""".stripMargin

  // --------------------------------------------------- generated oracle SQL

  /** Shared shingle-set CTE body: doc_id → sorted-distinct 3-word
    * shingle list (reused by the q20 brute-force and q36 pipeline
    * oracles so tokenization can never desynchronize between them). */
  private def shingleSetsSql(whereClause: String): String =
    s"""SELECT doc_id, list_distinct(
       |    CASE WHEN len(w) < 3 THEN CAST([] AS VARCHAR[])
       |         ELSE list_transform(generate_series(0, len(w)-3),
       |                i -> array_to_string(list_slice(w, i+1, i+3), ' ')) END) AS sh
       |  FROM (SELECT doc_id,
       |          list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0) AS w
       |        FROM documents $whereClause)""".stripMargin

  /** Shared CTE text: tokens → 3-shingles → one 48-bit md5 per shingle
    * → 16 affine minhash values → 4 bands of 4 (mirrors
    * Dedup.minhashSignatures/minhashBands, same (a,b,p) constants). */
  /** The 16 affine minhash aggregate exprs over a `hs` BIGINT list —
    * shared by [[minhashBandsSql]] and the script-aware q205 chain so
    * the (a,b,p) constants can never diverge between gates. */
  private lazy val minhashSigExprsSql: String = {
    val p = graft.operators.Dedup.MinhashP
    graft.operators.Dedup.minhashParams(16).map { case (a, b) =>
      s"list_min(list_transform(hs, h -> ($a * h + $b) % $p))"
    }.mkString(",\n      ")
  }

  /** Full LSH near-dup chain — 3-shingles over caller-supplied
    * `toks(doc_id, w)` → 16 affine minhashes → 4 bands of 4 →
    * in-bucket candidate pairs → exact shingle-set Jaccard ≥ 0.6 —
    * mirroring Dedup.minhashNearDups at its default (16, 4, 3, 0.6).
    * `withCtes` must define `toks` and owns no name in
    * {sh, hsh, sig, bands, cands}. */
  private def nearDupChainSqlOver(withCtes: String): String = {
    val p = graft.operators.Dedup.MinhashP
    s"""WITH $withCtes,
       |sh AS (
       |  SELECT doc_id, list_distinct(
       |    CASE WHEN len(w) < 3 THEN CAST([] AS VARCHAR[])
       |         ELSE list_transform(generate_series(0, len(w)-3),
       |                i -> array_to_string(list_slice(w, i+1, i+3), ' ')) END) AS s
       |  FROM toks),
       |hsh AS (
       |  SELECT doc_id, list_transform(s, x ->
       |    CAST(('0x' || substr(md5(x), 1, 12)) AS BIGINT) % $p) AS hs
       |  FROM sh WHERE len(s) > 0),
       |sig AS (
       |  SELECT doc_id, list_value(
       |      $minhashSigExprsSql) AS sig
       |  FROM hsh),
       |bands AS (
       |  SELECT doc_id, CAST(b AS INTEGER) AS band_id,
       |         md5(array_to_string(list_slice(sig, b*4+1, b*4+4), ',')) AS band_key
       |  FROM sig, UNNEST(generate_series(0, 3)) AS u(b)),
       |cands AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM bands l JOIN bands r
       |    ON l.band_id = r.band_id AND l.band_key = r.band_key
       |  WHERE l.doc_id < r.doc_id)
       |SELECT a, b, round(j, 6) AS jaccard FROM (
       |  SELECT c.a, c.b,
       |    CASE WHEN len(list_distinct(list_concat(sa.s, sb.s))) > 0
       |         THEN CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
       |              / CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE)
       |         ELSE 0.0 END AS j
       |  FROM cands c
       |  JOIN sh sa ON sa.doc_id = c.a
       |  JOIN sh sb ON sb.doc_id = c.b)
       |WHERE j >= 0.6""".stripMargin
  }

  private lazy val minhashBandsSql: String = {
    val p = graft.operators.Dedup.MinhashP
    val sigExprs = minhashSigExprsSql
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0) AS w
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, list_distinct(
       |    CASE WHEN len(w) < 3 THEN CAST([] AS VARCHAR[])
       |         ELSE list_transform(generate_series(0, len(w)-3),
       |                i -> array_to_string(list_slice(w, i+1, i+3), ' ')) END) AS s
       |  FROM toks),
       |hsh AS (
       |  SELECT doc_id, list_transform(s, x ->
       |    CAST(('0x' || substr(md5(x), 1, 12)) AS BIGINT) % $p) AS hs
       |  FROM sh WHERE len(s) > 0),
       |sig AS (
       |  SELECT doc_id, list_value(
       |      $sigExprs) AS sig
       |  FROM hsh)
       |SELECT doc_id, CAST(b AS INTEGER) AS band_id,
       |       md5(array_to_string(list_slice(sig, b*4+1, b*4+4), ',')) AS band_key
       |FROM sig, UNNEST(generate_series(0, 3)) AS u(b)""".stripMargin
  }

  /** 32-bit SimHash: generated bit-by-bit to mirror Dedup.simhash32. */
  private lazy val simhashSql: String = {
    val bitTerms = (0 until 32).map { b =>
      s"""(CASE WHEN coalesce(list_sum(list_transform(hs,
         |   x -> CASE WHEN (x >> $b) % 2 = 1 THEN 1 ELSE -1 END)), 0) >= 0
         | THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)""".stripMargin
    }.mkString(" + ")
    s"""SELECT doc_id, CAST($bitTerms AS BIGINT) AS simhash
       |FROM (
       |  SELECT doc_id, list_transform(
       |    list_distinct(list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0)),
       |    t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS hs
       |  FROM documents)""".stripMargin
  }

  /** Sessionizer oracle: keyed-state edge detection unrolled into
    * window functions. Session groups are delimited by end edges
    * (prev ∈ cleaning ∧ cur ∈ idle); the start of each group is its
    * first cleaning row (the reference captures start battery exactly
    * once per session, pipeline.py:144-147). Durations subtract
    * ms-truncated epochs, mirroring java.sql.Timestamp#getTime. */
  private lazy val sessionsBatchSql: String = {
    def inList(xs: Seq[String]) = xs.map(x => s"'$x'").mkString("(", ", ", ")")
    val clean = inList(graft.operators.Normalize.cleaningStates)
    val idle = inList(graft.operators.Normalize.idleStates)
    s"""WITH s AS (
       |  SELECT 'dev_' || CAST(user_id % 50 AS VARCHAR) AS dev, ts,
       |         COALESCE($stateCaseSql, 'unknown') AS state,
       |         CAST(floor(coalesce(value, 0.0)) AS INTEGER) AS battery
       |  FROM events),
       |o AS (
       |  SELECT *, lag(state) OVER (PARTITION BY dev ORDER BY ts, state, battery)
       |         AS prev_state
       |  FROM s),
       |e AS (
       |  SELECT *, CASE WHEN lower(prev_state) IN $clean
       |                  AND lower(state) IN $idle THEN 1 ELSE 0 END AS is_end
       |  FROM o),
       |g AS (
       |  SELECT *, COALESCE(SUM(is_end) OVER (PARTITION BY dev
       |              ORDER BY ts, state, battery
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS grp
       |  FROM e),
       |st AS (
       |  SELECT dev, grp, battery AS battery_start, ts AS start_ts FROM (
       |    SELECT dev, grp, ts, state, battery,
       |           row_number() OVER (PARTITION BY dev, grp
       |                              ORDER BY ts, state, battery) AS rn
       |    FROM g WHERE lower(state) IN $clean)
       |  WHERE rn = 1)
       |SELECT g.dev AS device, g.ts AS end_ts,
       |       round((epoch_ms(g.ts) - epoch_ms(st.start_ts)) / 1000.0 / 60.0 * 10)
       |         / 10.0 AS clean_min,
       |       st.battery_start AS battery_start, g.battery AS battery_end
       |FROM g JOIN st ON g.dev = st.dev AND g.grp = st.grp
       |WHERE g.is_end = 1""".stripMargin
  }

  /** ±1 SRP hyperplane bucket expression over a quantized list column
    * `qv` — identical constants to VectorFunctions.srpWeights. */
  private def srpBucketTermsSql: String = {
    val weights = VectorFunctions.srpWeights(6, 64, "graft-srp")
    weights.zipWithIndex.map { case (w, p) =>
      val wl = w.mkString("[", ", ", "]")
      s"""(CASE WHEN list_sum(list_transform(generate_series(1, 64),
         |   i -> qv[i] * ($wl)[i])) >= 0
         | THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)""".stripMargin
    }.mkString(" + ")
  }

  /** Shared SRP-LSH oracle CTEs (quantize → norms+bucket → in-bucket
    * scores): mirrors Similarity.lshTopK's candidate generation for
    * the 50-query set. Used by the q23 top-k oracle AND q130's LSH
    * side, so plane tuning can never desynchronize the recall
    * comparison from the index it measures. */
  private lazy val lshScoreCtes: String =
    s"""v AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS qv
       |  FROM embeddings),
       |b AS (
       |  SELECT vec_id, qv,
       |         CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i]*qv[i])) AS BIGINT) AS nsq,
       |         CAST($srpBucketTermsSql AS BIGINT) AS bucket
       |  FROM v),
       |sc AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         CAST(list_sum(list_transform(generate_series(1, len(q.qv)), i -> q.qv[i]*c.qv[i])) AS BIGINT) AS dot,
       |         q.nsq AS qn, c.nsq AS cn
       |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 50),
       |r AS (
       |  SELECT query_id, neighbor_id,
       |         CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS sim
       |  FROM sc)""".stripMargin

  /** SRP-LSH top-k oracle: bucket queries (vec_id < 50) and corpus with
    * the same hyperplanes, join within buckets, rank by (sim desc,
    * neighbor asc), keep 10 — mirrors Similarity.lshTopK. */
  private lazy val lshTopKSql: String =
    s"""WITH $lshScoreCtes,
       |k AS (
       |  SELECT query_id, neighbor_id, sim,
       |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM r)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim
       |FROM k WHERE rank <= 10""".stripMargin

  /** Per-query recall rollup shared by every ANN recall oracle: hits
    * of the approximate top-k (CTE named `apx`) inside the exact
    * top-k (CTE named `ex`), both (query_id, neighbor_id). */
  private lazy val recallRollupSql: String =
    """SELECT e.query_id,
      |  CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
      |  round(CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE), 6) AS recall
      |FROM ex e LEFT JOIN apx i
      |  ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
      |GROUP BY e.query_id""".stripMargin

  /** Shared product-quantization oracle CTEs (quantize → sub-vectors →
    * codebook → distances → encoding → query LUT → ADC sums),
    * mirroring Similarity.pqCodebook/pqEncode/pqTopK for the 5-query
    * set. Used by the q99 top-k oracle AND q131's PQ side. */
  private lazy val pqAdcCtes: String =
    """v AS (
      |  SELECT vec_id,
      |    list_transform(embedding, e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |subn AS (
      |  SELECT vec_id, m, list_slice(qv, m*16+1, m*16+16) AS sv,
      |    CAST(list_sum(list_transform(generate_series(1, 16),
      |      i -> qv[m*16+i]*qv[m*16+i])) AS BIGINT) AS nsq
      |  FROM v, UNNEST(generate_series(0, 3)) AS u(m)),
      |cb AS (
      |  SELECT m, CAST(row_number() OVER (PARTITION BY m ORDER BY vec_id) - 1
      |             AS BIGINT) AS code, sv AS cv, nsq AS cnsq
      |  FROM subn QUALIFY row_number() OVER (PARTITION BY m ORDER BY vec_id) <= 16),
      |dist AS (
      |  SELECT s.vec_id, s.m, cb.code,
      |    s.nsq + cb.cnsq - 2*CAST(list_sum(list_transform(
      |      generate_series(1, 16), i -> s.sv[i]*cb.cv[i])) AS BIGINT) AS d
      |  FROM subn s JOIN cb USING (m)),
      |enc AS (
      |  SELECT vec_id, m, code FROM (
      |    SELECT vec_id, m, code,
      |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d, code) AS rn
      |    FROM dist) WHERE rn = 1),
      |lut AS (
      |  SELECT vec_id AS query_id, m, code, d FROM dist WHERE vec_id < 5),
      |adc AS (
      |  SELECT l.query_id, e.vec_id AS neighbor_id,
      |    CAST(sum(l.d) AS BIGINT) AS adc_dist
      |  FROM enc e JOIN lut l ON e.m = l.m AND e.code = l.code
      |  WHERE l.query_id <> e.vec_id GROUP BY 1, 2)""".stripMargin

  /** q131: the q99 ADC CTEs verbatim as the approximate side, the
    * q22 brute-force math over the same quantized vectors as ground
    * truth — the gate that prices PQ's 64× compression in recall. */
  private lazy val pqRecallSql: String =
    s"""WITH $pqAdcCtes,
       |apx AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id
       |             ORDER BY adc_dist, neighbor_id) AS rank
       |    FROM adc)
       |  WHERE rank <= 10),
       |nn AS (
       |  SELECT vec_id, qv,
       |         CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i]*qv[i])) AS BIGINT) AS nsq
       |  FROM v),
       |sce AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         CAST(list_sum(list_transform(generate_series(1, len(q.qv)), i -> q.qv[i]*c.qv[i])) AS DOUBLE)
       |           / (sqrt(CAST(q.nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE))) AS sim
       |  FROM nn q, nn c WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
       |ex AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |    FROM sce)
       |  WHERE rank <= 10)
       |$recallRollupSql""".stripMargin

  /** q130: the q23 LSH CTEs verbatim as the approximate side, the
    * q22 brute-force math over the same `b` vectors as ground truth,
    * per-query hit count — the plane-count tuning gate. */
  private lazy val lshRecallSql: String =
    s"""WITH $lshScoreCtes,
       |apx AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |    FROM r)
       |  WHERE rank <= 10),
       |sce AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         CAST(list_sum(list_transform(generate_series(1, len(q.qv)), i -> q.qv[i]*c.qv[i])) AS DOUBLE)
       |           / (sqrt(CAST(q.nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE))) AS sim
       |  FROM b q, b c WHERE q.vec_id < 50 AND c.vec_id <> q.vec_id),
       |ex AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |    FROM sce)
       |  WHERE rank <= 10)
       |$recallRollupSql""".stripMargin

  /** Shared near-dup closure CTEs (bands → candidates → Jaccard-verified
    * pairs → symmetric edges → recursive reach → components). Used by
    * the q54 cluster census and the q62 corpus-dedup keep-list; must be
    * opened with `WITH RECURSIVE`. */
  private lazy val dedupClosureCtes: String =
    s"""bands AS ($minhashBandsSql),
       |cands AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM bands l JOIN bands r
       |    ON l.band_id = r.band_id AND l.band_key = r.band_key
       |  WHERE l.doc_id < r.doc_id),
       |sets AS (${shingleSetsSql("")}),
       |pairs AS (
       |  SELECT a, b FROM (
       |    SELECT c.a, c.b,
       |      CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
       |           THEN CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |                / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE)
       |           ELSE 0.0 END AS j
       |    FROM cands c
       |    JOIN sets sa ON sa.doc_id = c.a
       |    JOIN sets sb ON sb.doc_id = c.b)
       |  WHERE j >= 0.6),
       |e AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
       |reach AS (
       |  SELECT x, y FROM e
       |  UNION
       |  SELECT r.x, e2.y FROM reach r JOIN e e2 ON e2.x = r.y
       |),
       |comp AS (
       |  SELECT x AS id, least(x, min(y)) AS component
       |  FROM reach GROUP BY x)""".stripMargin

  /** Shared IVF oracle CTEs (quantize → norms → centroids → cell
    * assignment), mirroring Similarity.ivfCentroids/ivfIndex exactly:
    * centroids = 16 lowest-id vectors; every vector assigns to its
    * max-cosine centroid (tie → min cell). */
  private lazy val ivfAsgCtes: String =
    s"""v AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS qv
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, qv,
       |         CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i]*qv[i])) AS BIGINT) AS nsq
       |  FROM v),
       |cent AS (SELECT vec_id AS cell, qv AS cv, nsq AS cnsq FROM n WHERE vec_id < 16),
       |asg AS (
       |  SELECT vec_id, qv, nsq, cell FROM (
       |    SELECT n.vec_id, n.qv, n.nsq, cent.cell,
       |           row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |             CAST(list_sum(list_transform(generate_series(1, len(n.qv)), i -> n.qv[i]*cent.cv[i])) AS DOUBLE)
       |               / (sqrt(CAST(n.nsq AS DOUBLE)) * sqrt(CAST(cent.cnsq AS DOUBLE))) DESC,
       |             cent.cell) AS rn
       |    FROM n, cent)
       |  WHERE rn = 1)""".stripMargin

  /** IVF search oracle: queries (vec_id < 20) rank their 4 nearest
    * centroids, scan those inverted lists, keep top-10. */
  /** Shared IVF probe-routing + inverted-list-scan CTEs (probes →
    * sci): queries < 20 route to their top-4 cells, candidates score
    * by exact-integer cosine with self excluded. Used by the q31
    * oracle AND q124's IVF side, so probe tuning can never
    * desynchronize the recall comparison from the index it measures. */
  private lazy val ivfProbeScanCtes: String =
    """probes AS (
      |  SELECT query_id, q_qv, q_nsq, cell FROM (
      |    SELECT q.vec_id AS query_id, q.qv AS q_qv, q.nsq AS q_nsq, p.cell,
      |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |             CAST(list_sum(list_transform(generate_series(1, len(q.qv)), i -> q.qv[i]*p.cv[i])) AS DOUBLE)
      |               / (sqrt(CAST(q.nsq AS DOUBLE)) * sqrt(CAST(p.cnsq AS DOUBLE))) DESC,
      |             p.cell) AS rn
      |    FROM n q, cent p WHERE q.vec_id < 20)
      |  WHERE rn <= 4),
      |sci AS (
      |  SELECT pr.query_id, a.vec_id AS neighbor_id,
      |         CAST(list_sum(list_transform(generate_series(1, len(pr.q_qv)), i -> pr.q_qv[i]*a.qv[i])) AS DOUBLE)
      |           / (sqrt(CAST(pr.q_nsq AS DOUBLE)) * sqrt(CAST(a.nsq AS DOUBLE))) AS sim
      |  FROM probes pr JOIN asg a ON pr.cell = a.cell AND pr.query_id <> a.vec_id)"""
      .stripMargin

  private lazy val ivfTopKSql: String =
    s"""WITH $ivfAsgCtes,
       |$ivfProbeScanCtes
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim FROM (
       |  SELECT query_id, neighbor_id, sim,
       |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM sci)
       |WHERE rank <= 10""".stripMargin

  /** q124: the q31 IVF top-k CTEs verbatim, the q22 brute-force math
    * over the same `n` vectors as ground truth, and a per-query hit
    * count — both rankings carry the deterministic (sim desc,
    * neighbor_id) tie-break, so the intersection is well-defined. */
  /** q216's oracle: dense digit grid via CROSS JOIN generate_series,
    * the SAME Benford p_d IEEE literals as the Spark side
    * (Profile.benfordP), per-digit χ² terms micro-quantized before
    * the order-free integer sum. */
  private lazy val benfordOracleSql: String = {
    val pCase = (1 to 9)
      .map(d => s"WHEN $d THEN ${graft.operators.Profile.benfordP(d)}")
      .mkString(" ")
    s"""WITH pos AS (
       |  SELECT source,
       |         CAST(substr(CAST(n_chars AS VARCHAR), 1, 1) AS INT) AS digit
       |  FROM documents WHERE n_chars > 0),
       |c AS (
       |  SELECT source, digit, CAST(count(*) AS BIGINT) AS n_d
       |  FROM pos GROUP BY 1, 2),
       |tot AS (SELECT source, CAST(sum(n_d) AS BIGINT) AS n FROM c GROUP BY 1),
       |dense AS (
       |  SELECT t.source, t.n, d.digit, COALESCE(c.n_d, 0) AS n_d,
       |         CAST(t.n AS DOUBLE) * (CASE d.digit $pCase END) AS e
       |  FROM tot t
       |  CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS digit) d
       |  LEFT JOIN c ON c.source = t.source AND c.digit = d.digit),
       |terms AS (
       |  SELECT source, n,
       |         CAST(round(1e6 * ((CAST(n_d AS DOUBLE) - e) * (CAST(n_d AS DOUBLE) - e) / e)) AS BIGINT) AS term
       |  FROM dense)
       |SELECT source, n, CAST(sum(term) AS BIGINT) AS chi2_micro
       |FROM terms GROUP BY 1, 2""".stripMargin
  }

  /** q208's oracle: the SAME micro-int EWMA weights (interpolated
    * from TimeSeries.ewmaWeightsMicro, so the two sides cannot
    * drift), the same lag taps, integer num/den sums, one divide. */
  private lazy val ewmaOracleSql: String = {
    val wq = graft.operators.TimeSeries.ewmaWeightsMicro(0.25, 8)
    def xm(m: Int) = if (m == 0) "x" else s"x$m"
    val lagCols = (1 until wq.size)
      .map(m => s"lag(x, $m) OVER win AS x$m").mkString(",\n         ")
    val num = wq.zipWithIndex.map { case (w, m) =>
      s"COALESCE(CAST(round(${xm(m)} * $w) AS BIGINT), 0)"
    }.mkString("\n           + ")
    val den = wq.zipWithIndex.map { case (w, m) =>
      s"CASE WHEN ${xm(m)} IS NOT NULL THEN $w ELSE 0 END"
    }.mkString("\n           + ")
    s"""WITH e AS (
       |  SELECT user_id, ts, event_id, value, CAST(value AS DOUBLE) AS x
       |  FROM events),
       |l AS (
       |  SELECT user_id, ts, event_id, value, x,
       |         $lagCols
       |  FROM e
       |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (
       |  SELECT user_id, ts, event_id, value,
       |         $num AS num,
       |         $den AS den
       |  FROM l)
       |SELECT user_id, ts, event_id, value,
       |  CASE WHEN den > 0
       |    THEN CAST(round(1e6 * (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))) AS BIGINT) / 1e6
       |    ELSE NULL END AS ewma
       |FROM s""".stripMargin
  }

  /** q279's oracle: the truncated Holt kernel with the IDENTICAL
    * micro-int weight literals (holtWeightsMicro), full-window
    * NULL rule mirrored via the tap presence count. */
  private lazy val holtOracleSql: String = {
    val wq = graft.operators.TimeSeries.holtWeightsMicro(0.6, 0.3, 16)
    def xm(m: Int) = if (m == 0) "x" else s"x$m"
    val lagCols = (1 until wq.size)
      .map(m => s"lag(x, $m) OVER win AS x$m").mkString(",\n         ")
    val numL = wq.zipWithIndex.map { case ((wl, _), m) =>
      s"COALESCE(CAST(round(${xm(m)} * $wl) AS BIGINT), 0)"
    }.mkString("\n           + ")
    val numB = wq.zipWithIndex.map { case ((_, wb), m) =>
      s"COALESCE(CAST(round(${xm(m)} * $wb) AS BIGINT), 0)"
    }.mkString("\n           + ")
    val have = wq.indices.map(m =>
      s"CASE WHEN ${xm(m)} IS NOT NULL THEN 1 ELSE 0 END")
      .mkString("\n           + ")
    s"""WITH e AS (
       |  SELECT user_id, ts, event_id, value, CAST(value AS DOUBLE) AS x
       |  FROM events),
       |l AS (
       |  SELECT user_id, ts, event_id, value, x,
       |         $lagCols
       |  FROM e
       |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (
       |  SELECT user_id, ts, event_id, value,
       |         $numL AS num_l,
       |         $numB AS num_b,
       |         $have AS have
       |  FROM l)
       |SELECT user_id, ts, event_id, value,
       |  CASE WHEN have = ${wq.size}
       |    THEN CAST(num_l AS DOUBLE) / 1e6 ELSE NULL END AS holt_level,
       |  CASE WHEN have = ${wq.size}
       |    THEN CAST(num_b AS DOUBLE) / 1e6 ELSE NULL END AS holt_trend,
       |  CASE WHEN have = ${wq.size}
       |    THEN CAST(num_l + num_b AS DOUBLE) / 1e6 ELSE NULL END
       |    AS holt_forecast
       |FROM s""".stripMargin
  }

  /** q209's oracle: micro-int CUSUM via the cumsum − running-min
    * identity, per-key micro-mean center — all-integer after the one
    * rounded center divide, mirroring TimeSeries.cusum literally. */
  private lazy val cusumOracleSql: String = {
    val slack = 10000000L
    val threshold = 300000000L
    s"""WITH e AS (
       |  SELECT user_id, ts, event_id, value,
       |         CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS xq
       |  FROM events),
       |c AS (
       |  SELECT user_id, ts, event_id, value, xq,
       |         CAST(round(CAST(sum(xq) OVER wk AS DOUBLE)
       |           / CAST(count(*) OVER wk AS DOUBLE)) AS BIGINT) AS ctr
       |  FROM e
       |  WINDOW wk AS (PARTITION BY user_id)),
       |d AS (
       |  SELECT user_id, ts, event_id, value,
       |         xq - ctr - $slack AS d_hi,
       |         -(xq - ctr) - $slack AS d_lo
       |  FROM c),
       |m AS (
       |  SELECT user_id, ts, event_id, value,
       |         sum(d_hi) OVER wo AS cum_hi,
       |         sum(d_lo) OVER wo AS cum_lo
       |  FROM d
       |  WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |sv AS (
       |  SELECT user_id, ts, event_id, value,
       |         CAST(cum_hi - least(0, min(cum_hi) OVER wo) AS BIGINT) AS s_hi,
       |         CAST(cum_lo - least(0, min(cum_lo) OVER wo) AS BIGINT) AS s_lo
       |  FROM m
       |  WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT user_id, ts, event_id, value, s_hi, s_lo,
       |       s_hi > $threshold AS alarm_hi, s_lo > $threshold AS alarm_lo
       |FROM sv
       |WHERE s_hi > $threshold OR s_lo > $threshold""".stripMargin
  }

  /** q210's oracle: the seeded-Laplace release — md5(tag:key) →
    * u ∈ (0,1] → inverse CDF with the ln() step quantized to integer
    * micro-nats, mirroring Privacy.dpCounts step for step. */
  private lazy val dpCountsOracleSql: String = {
    val scale = 1e6 * 1.0 // 1e6 · ε
    val pole = 1.0 / 1152921504606846976.0 // 2^-60, the u = 1 clamp
    s"""WITH g AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1),
       |h AS (
       |  SELECT event_type, n,
       |         (CAST(('0x' || substr(md5('graft-dp-r12' || ':' ||
       |              COALESCE(CAST(event_type AS VARCHAR), ' ')), 1, 15)) AS BIGINT) + 1)
       |           / CAST(1152921504606846976 AS DOUBLE) AS u
       |  FROM g),
       |nz AS (
       |  SELECT event_type, n, u - 0.5 AS v,
       |         greatest(1.0 - 2.0 * abs(u - 0.5), $pole) AS a
       |  FROM h),
       |q AS (
       |  SELECT event_type, n,
       |         CASE WHEN v < 0 THEN -1 ELSE 1 END AS sgn,
       |         CAST(round(1e6 * ln(a)) AS BIGINT) AS lnq
       |  FROM nz)
       |SELECT event_type,
       |  greatest(0, n + CAST(round(-CAST(sgn AS DOUBLE) * CAST(lnq AS DOUBLE)
       |    / $scale) AS BIGINT)) AS dp_count
       |FROM q""".stripMargin
  }

  /** q211/q212's shared BQ chain: quantize → 64 sign bits summed
    * against the driver-interpolated bit-value list (bit 63 is
    * Long.MinValue — addition of distinct bit values IS the two's-
    * complement pattern) → Hamming xor/popcount shortlist →
    * exact-integer cosine rerank, CTEs `v → n → hm → sl → apx`. */
  private def bqCtes(queryPred: String, shortlist: Int): String = {
    val bits = (0 until 64).map(1L << _).mkString("[", ", ", "]")
    s"""v AS (
       |  SELECT vec_id,
       |         list_transform(embedding, e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS qv
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, qv,
       |         CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i]*qv[i])) AS BIGINT) AS nsq,
       |         CAST(list_sum(list_transform(generate_series(1, 64),
       |           i -> CASE WHEN qv[i] > 0 THEN ($bits)[i] ELSE 0 END)) AS BIGINT) AS sig
       |  FROM v),
       |hm AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         CAST(bit_count(xor(q.sig, c.sig)) AS BIGINT) AS hamming,
       |         q.qv AS qqv, c.qv AS cqv, q.nsq AS qn, c.nsq AS cn
       |  FROM n q, n c
       |  WHERE ($queryPred) AND c.vec_id <> q.vec_id),
       |sl AS (
       |  SELECT * FROM (
       |    SELECT query_id, neighbor_id, hamming, qqv, cqv, qn, cn,
       |           row_number() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS hrank
       |    FROM hm)
       |  WHERE hrank <= $shortlist),
       |sc AS (
       |  SELECT query_id, neighbor_id, hamming,
       |         CAST(list_sum(list_transform(generate_series(1, len(qqv)), i -> qqv[i]*cqv[i])) AS DOUBLE)
       |           / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS sim
       |  FROM sl),
       |apx AS (
       |  SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, hamming, sim FROM (
       |    SELECT query_id, neighbor_id, hamming, sim,
       |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |    FROM sc)
       |  WHERE rank <= 10)""".stripMargin
  }

  private lazy val annRecallSql: String =
    s"""WITH $ivfAsgCtes,
       |$ivfProbeScanCtes,
       |apx AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |    FROM sci)
       |  WHERE rank <= 10),
       |sce AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         CAST(list_sum(list_transform(generate_series(1, len(q.qv)), i -> q.qv[i]*c.qv[i])) AS DOUBLE)
       |           / (sqrt(CAST(q.nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE))) AS sim
       |  FROM n q, n c WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
       |ex AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |    FROM sce)
       |  WHERE rank <= 10)
       |$recallRollupSql""".stripMargin

  /** q388's oracle: Profile.esdOutliers unrolled round by round (the
    * plattOracleSql idiom) — per round, the exact-integer argmax
    * |v·n − Σv| (ties to the smaller id) leaves its group, G is the
    * mirrored studentized chain, and the next round's CTE is the
    * anti-joined remainder. */
  private def esdOracleSql(rounds: Int, gCut: Long): String = {
    val head =
      """WITH cur0 AS (
        |  SELECT event_type AS g, event_id AS id,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL)""".stripMargin
    val steps = (1 to rounds).map { t =>
      s"""st$t AS (
         |  SELECT g, CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(v AS HUGEINT)) AS s1,
         |    sum(CAST(v AS HUGEINT) * v) AS s2
         |  FROM cur${t - 1} GROUP BY 1
         |  HAVING count(*) >= 3 AND count(*) * sum(CAST(v AS HUGEINT) * v)
         |    - sum(CAST(v AS HUGEINT)) * sum(CAST(v AS HUGEINT)) > 0),
         |cand$t AS (
         |  SELECT g, id, n, s1, s2, ad FROM (
         |    SELECT c.g, c.id, st$t.n, st$t.s1, st$t.s2,
         |      abs(CAST(c.v AS HUGEINT) * st$t.n - st$t.s1) AS ad,
         |      row_number() OVER (PARTITION BY c.g
         |        ORDER BY abs(CAST(c.v AS HUGEINT) * st$t.n - st$t.s1)
         |          DESC, c.id ASC) AS rn
         |    FROM cur${t - 1} c JOIN st$t ON c.g = st$t.g)
         |  WHERE rn = 1),
         |out$t AS (
         |  SELECT g, $t AS round, id,
         |    CAST(round(1e6 * (CAST(ad AS DOUBLE)
         |      / (CAST(n AS DOUBLE) * sqrt((CAST(s2 AS DOUBLE)
         |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
         |          / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)))))
         |      AS BIGINT) AS g_micro
         |  FROM cand$t),
         |cur$t AS (
         |  SELECT c.* FROM cur${t - 1} c
         |  LEFT JOIN cand$t k ON c.g = k.g AND c.id = k.id
         |  WHERE k.id IS NULL)""".stripMargin
    }
    val unions = (1 to rounds)
      .map(t => s"SELECT * FROM out$t").mkString("\nUNION ALL\n")
    s"""$head,
       |${steps.mkString(",\n")},
       |allout AS (
       |$unions)
       |SELECT g AS event_type, CAST(round AS INTEGER) AS round,
       |  id AS event_id, g_micro, g_micro > $gCut AS flagged
       |FROM allout""".stripMargin
  }

  /** Exact-integer cosine as a DuckDB expression — the SQL twin of
    * VectorFunctions.cosineQ over two quantized list columns. */
  private def cosSql(aqv: String, bqv: String, ansq: String,
      bnsq: String): String =
    s"CAST(list_sum(list_transform(generate_series(1, len($aqv)), " +
      s"i -> $aqv[i]*$bqv[i])) AS DOUBLE) / (sqrt(CAST($ansq AS " +
      s"DOUBLE)) * sqrt(CAST($bnsq AS DOUBLE)))"

  /** Shared NSW build CTEs (g0 → g), mirroring Similarity.nswBuild
    * over the q382/q383 parameters (16-cell ivfAsgCtes index, degree
    * 6): per-cell kNN digraph ranked (sim desc, dst asc), then
    * symmetrized by a union with its reverse (max(sim) is a dedup —
    * cosine is symmetric). */
  private lazy val nswGraphCtes: String =
    s"""g0 AS (
       |  SELECT src, dst, sim FROM (
       |    SELECT src, dst, sim,
       |           row_number() OVER (PARTITION BY src ORDER BY sim DESC, dst) AS rk
       |    FROM (
       |      SELECT a.vec_id AS src, b.vec_id AS dst,
       |             ${cosSql("a.qv", "b.qv", "a.nsq", "b.nsq")} AS sim
       |      FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id <> b.vec_id))
       |  WHERE rk <= 6),
       |g AS (
       |  SELECT src, dst, max(sim) AS sim FROM (
       |    SELECT src, dst, sim FROM g0
       |    UNION ALL
       |    SELECT dst AS src, src AS dst, sim FROM g0)
       |  GROUP BY 1, 2)""".stripMargin

  /** NSW search CTEs mirroring Similarity.nswSearch (queries < 20,
    * 3 centroid seeds, beam 4, `rounds` UNROLLED expansion rounds —
    * the plattOracleSql unrolling idiom): seeds → vis0/fr0 →
    * per-round cand/fresh/sc/vis/fr → apx (top-10, self excluded). */
  private def nswSearchCtes(rounds: Int): String = {
    val head =
      s"""qs AS (SELECT vec_id AS query_id, qv AS q_qv, nsq AS q_nsq FROM n WHERE vec_id < 20),
         |seeds AS (
         |  SELECT query_id, node FROM (
         |    SELECT q.query_id, c.cell AS node,
         |           row_number() OVER (PARTITION BY q.query_id ORDER BY
         |             ${cosSql("q.q_qv", "c.cv", "q.q_nsq", "c.cnsq")} DESC, c.cell) AS rn
         |    FROM qs q, cent c)
         |  WHERE rn <= 3),
         |vis0 AS (
         |  SELECT s.query_id, s.node, ${cosSql("q.q_qv", "a.qv", "q.q_nsq", "a.nsq")} AS sim
         |  FROM seeds s JOIN asg a ON a.vec_id = s.node
         |    JOIN qs q ON q.query_id = s.query_id),
         |fr0 AS (SELECT query_id, node FROM vis0)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""cand$r AS (
         |  SELECT DISTINCT f.query_id, g.dst AS node
         |  FROM fr${r - 1} f JOIN g ON g.src = f.node),
         |fresh$r AS (
         |  SELECT c.query_id, c.node FROM cand$r c
         |  LEFT JOIN vis${r - 1} v ON v.query_id = c.query_id AND v.node = c.node
         |  WHERE v.node IS NULL),
         |sc$r AS (
         |  SELECT f.query_id, f.node, ${cosSql("q.q_qv", "a.qv", "q.q_nsq", "a.nsq")} AS sim
         |  FROM fresh$r f JOIN asg a ON a.vec_id = f.node
         |    JOIN qs q ON q.query_id = f.query_id),
         |vis$r AS (SELECT * FROM vis${r - 1} UNION ALL SELECT * FROM sc$r),
         |fr$r AS (
         |  SELECT query_id, node FROM (
         |    SELECT query_id, node,
         |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, node) AS rn
         |    FROM sc$r)
         |  WHERE rn <= 4)""".stripMargin
    }
    val apx =
      s"""apx AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, node AS neighbor_id,
         |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, node) AS rank
         |    FROM vis$rounds WHERE query_id <> node)
         |  WHERE rank <= 10)""".stripMargin
    (head +: steps :+ apx).mkString(",\n")
  }

  private lazy val nswBuildSql: String =
    s"""WITH $ivfAsgCtes,
       |$nswGraphCtes
       |SELECT src, dst, sim FROM g""".stripMargin

  private lazy val nswRecallSql: String =
    s"""WITH $ivfAsgCtes,
       |$nswGraphCtes,
       |${nswSearchCtes(2)},
       |sce AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         ${cosSql("q.qv", "c.qv", "q.nsq", "c.nsq")} AS sim
       |  FROM n q, n c WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
       |ex AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |    FROM sce)
       |  WHERE rank <= 10)
       |$recallRollupSql""".stripMargin

  /** The q389 DFT periodogram oracle, shared so the spectral-
    * entropy oracle composes over the identical spectrum. */
  private lazy val periodogramSql: String =
    """WITH b AS (
        |  SELECT user_id AS k, epoch_ms(ts) AS ts_ms, event_id AS id,
        |    CAST(round(CAST(value AS DOUBLE) * 1e3) AS BIGINT) AS v,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts), event_id) AS rn,
        |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
        |  FROM events WHERE value IS NOT NULL),
        |t AS (
        |  SELECT k, n, fk.kk AS fkk, (fk.kk * (rn - 1)) % n AS m, v
        |  FROM b, (SELECT unnest(generate_series(1, 6)) AS kk) fk
        |  WHERE n >= 2 AND fk.kk * 2 <= n),
        |terms AS (
        |  SELECT k, fkk, n,
        |    v * CAST(round(1e6 * cos(2.0 * pi()
        |      * CAST(m AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT)
        |      AS ct,
        |    v * CAST(round(1e6 * sin(2.0 * pi()
        |      * CAST(m AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT)
        |      AS st
        |  FROM t),
        |agg AS (
        |  SELECT k, fkk, n, sum(CAST(ct AS HUGEINT)) AS c,
        |    sum(CAST(st AS HUGEINT)) AS s
        |  FROM terms GROUP BY 1, 2, 3)
        |SELECT k AS user_id, CAST(fkk AS INTEGER) AS k, n,
        |  CAST(round(1e6 * (CAST(c AS DOUBLE) / 1e9
        |      * (CAST(c AS DOUBLE) / 1e9)
        |      + CAST(s AS DOUBLE) / 1e9 * (CAST(s AS DOUBLE) / 1e9))
        |    / CAST(n AS DOUBLE)) AS BIGINT) AS power_micro
        |FROM agg""".stripMargin

  /** DuckDB twin of TimeSeries.zMicroFromQ: the caller's `inCte`
    * carries `keep` columns plus q4 (HUGEINT, NULL = degenerate) and
    * neg (sign); appends the seed/clamp/half-away stages and ends
    * with CTE `zfin` carrying keep + z_micro. The same construction
    * as the q384 oracle — no libm result in the compared cell. */
  private def zFromQSql(inCte: String, keep: Seq[String]): String = {
    val ks = keep.mkString(", ")
    s"""zsq AS (
       |  SELECT $ks, neg, q4,
       |    CAST(floor(sqrt(CAST(q4 AS DOUBLE))) AS HUGEINT) AS u0
       |  FROM $inCte),
       |ziq AS (
       |  SELECT $ks, neg, q4,
       |    u0 + CASE WHEN (u0 + 2) * (u0 + 2) <= q4 THEN 2
       |      WHEN (u0 + 1) * (u0 + 1) <= q4 THEN 1
       |      WHEN u0 * u0 <= q4 THEN 0
       |      WHEN (u0 - 1) * (u0 - 1) <= q4 THEN -1 ELSE -2 END AS u
       |  FROM zsq),
       |zfin AS (
       |  SELECT $ks,
       |    CASE WHEN u IS NULL THEN NULL
       |      WHEN neg THEN -CAST((u + 1) // 2 AS BIGINT)
       |      ELSE CAST((u + 1) // 2 AS BIGINT) END AS z_micro
       |  FROM ziq)""".stripMargin
  }

  /** HNSW level CTE — the SQL twin of Similarity.hnswLevel (same
    * md5-prefix hash60 over "hnsw:" || id, largest ℓ with
    * h ≡ 0 mod layerDiv^ℓ). */
  private def hnswLevCte(layerDiv: Int, maxLayer: Int): String = {
    val cases = (maxLayer to 1 by -1).map { l =>
      val m = math.pow(layerDiv.toDouble, l.toDouble).toLong
      s"WHEN h % $m = 0 THEN $l"
    }.mkString(" ")
    s"""lev AS MATERIALIZED (
       |  SELECT vec_id, CASE $cases ELSE 0 END AS level FROM (
       |    SELECT vec_id,
       |           CAST(('0x' || substr(md5('hnsw:' || CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |    FROM embeddings))""".stripMargin
  }

  /** One HNSW layer's member/centroid/assignment/graph CTEs
    * (mem_l, centh_l, asg_l, gd_l, gh_l) — the per-layer twin of the
    * nswGraphCtes construction over layer-ℓ members with nc
    * centroids (ivfCentroids' lowest-id rule). */
  /** DuckDB inlines plain CTEs at every reference — the layered,
    * round-unrolled HNSW oracles would re-scan the embeddings
    * parquet dozens of times and exhaust the process's file-handle
    * budget — so the shared frames are MATERIALIZED. */
  private def hnswLayerCtes(l: Int, nc: Int, degree: Int): String =
    s"""mem$l AS MATERIALIZED (
       |  SELECT n.vec_id, n.qv, n.nsq FROM n JOIN lev USING (vec_id)
       |  WHERE lev.level >= $l),
       |centh$l AS MATERIALIZED (
       |  SELECT vec_id AS cell, qv AS cv, nsq AS cnsq FROM mem$l
       |  ORDER BY vec_id LIMIT $nc),
       |asgh$l AS MATERIALIZED (
       |  SELECT vec_id, qv, nsq, cell FROM (
       |    SELECT m.vec_id, m.qv, m.nsq, c.cell,
       |           row_number() OVER (PARTITION BY m.vec_id ORDER BY
       |             ${cosSql("m.qv", "c.cv", "m.nsq", "c.cnsq")} DESC, c.cell) AS rn
       |    FROM mem$l m, centh$l c)
       |  WHERE rn = 1),
       |gd$l AS MATERIALIZED (
       |  SELECT src, dst, sim FROM (
       |    SELECT src, dst, sim,
       |           row_number() OVER (PARTITION BY src ORDER BY sim DESC, dst) AS rk
       |    FROM (
       |      SELECT a.vec_id AS src, b.vec_id AS dst,
       |             ${cosSql("a.qv", "b.qv", "a.nsq", "b.nsq")} AS sim
       |      FROM asgh$l a JOIN asgh$l b ON a.cell = b.cell AND a.vec_id <> b.vec_id))
       |  WHERE rk <= $degree),
       |gh$l AS MATERIALIZED (
       |  SELECT src, dst, max(sim) AS sim FROM (
       |    SELECT src, dst, sim FROM gd$l
       |    UNION ALL
       |    SELECT dst AS src, src AS dst, sim FROM gd$l)
       |  GROUP BY 1, 2)""".stripMargin

  /** (layer, nCentroids) pairs for the q424/q425 parameters:
    * nCells 16, layerDiv 4, maxLayer 2. */
  private lazy val hnswLayers: Seq[(Int, Int)] = Seq((0, 16), (1, 4), (2, 1))

  /** Materialized v/n twins for the HNSW oracles (see
    * [[hnswLayerCtes]]'s file-handle note — these are referenced by
    * every layer, round, and the brute-force side). */
  private lazy val hnswBaseCtes: String =
    s"""v AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS qv
       |  FROM embeddings),
       |n AS MATERIALIZED (
       |  SELECT vec_id, qv,
       |         CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i]*qv[i])) AS BIGINT) AS nsq
       |  FROM v)""".stripMargin

  private lazy val hnswBuildSql: String = {
    val layerCtes = hnswLayers.map { case (l, nc) =>
      hnswLayerCtes(l, nc, degree = 6) }.mkString(",\n")
    val unions = hnswLayers.map { case (l, _) =>
      s"SELECT $l AS layer, src, dst, sim FROM gh$l" }
      .mkString("\nUNION ALL\n")
    s"""WITH $hnswBaseCtes,
       |${hnswLevCte(4, 2)},
       |$layerCtes
       |$unions""".stripMargin
  }

  /** HNSW greedy-descent search CTEs mirroring Similarity.hnswSearch
    * (queries < 20, descent 2 → 1 → 0; the q425 registration runs
    * hnswSearchCtes(beam = 8, rounds = 2) — keep this line in sync
    * with it before any parameter sweep):
    * entry = top layer's centroids ∪ the global lowest-id row; each
    * layer re-seeds its frontier from the best beam of everything
    * visited, then runs the nswSearchCtes expansion shape over that
    * layer's edges. */
  private def hnswSearchCtes(beam: Int, rounds: Int): String = {
    val top = hnswLayers.map(_._1).max
    // Fused ≤2-hop adjacency per layer — the SQL twin of the g² cut
    // in Similarity.hnswSearch (g ∪ g·g, deduped, sim dropped).
    val gh2 = hnswLayers.map { case (l, _) =>
      s"""gh2$l AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM gh$l
         |    UNION ALL
         |    SELECT a.src, b.dst FROM gh$l a JOIN gh$l b ON a.dst = b.src))""".stripMargin
    }.mkString(",\n")
    val head =
      s"""qs AS (SELECT vec_id AS query_id, qv AS q_qv, nsq AS q_nsq FROM n WHERE vec_id < 20),
         |$gh2,
         |ent AS (
         |  SELECT cell AS node FROM centh$top
         |  UNION
         |  SELECT vec_id AS node FROM (SELECT vec_id FROM n ORDER BY vec_id LIMIT 1)),
         |vis_s AS MATERIALIZED (
         |  SELECT q.query_id, e.node, ${cosSql("q.q_qv", "a.qv", "q.q_nsq", "a.nsq")} AS sim
         |  FROM qs q CROSS JOIN ent e JOIN n a ON a.vec_id = e.node)""".stripMargin
    var vis = "vis_s"
    val blocks = scala.collection.mutable.ArrayBuffer[String]()
    for (l <- top to 0 by -1) {
      blocks +=
        s"""fr_${l}_0 AS MATERIALIZED (
           |  SELECT query_id, node FROM (
           |    SELECT query_id, node,
           |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, node) AS rn
           |    FROM $vis)
           |  WHERE rn <= $beam)""".stripMargin
      // Fused round schedule: 2-hop expansions while ≥2 hops remain,
      // a trailing 1-hop for odd budgets — Similarity.hnswSearch's
      // `remaining` loop verbatim.
      val hopSeq = {
        val b = scala.collection.mutable.ArrayBuffer[Int]()
        var remaining = rounds
        while (remaining > 0) {
          val h = if (remaining >= 2) 2 else 1
          b += h; remaining -= h
        }
        b.toSeq
      }
      for ((hops, i) <- hopSeq.zipWithIndex) {
        val r = i + 1
        val gref = if (hops == 2) s"gh2$l" else s"gh$l"
        blocks +=
          s"""cand_${l}_$r AS MATERIALIZED (
             |  SELECT DISTINCT f.query_id, g.dst AS node
             |  FROM fr_${l}_${r - 1} f JOIN $gref g ON g.src = f.node),
             |fresh_${l}_$r AS (
             |  SELECT c.query_id, c.node FROM cand_${l}_$r c
             |  LEFT JOIN $vis v ON v.query_id = c.query_id AND v.node = c.node
             |  WHERE v.node IS NULL),
             |sc_${l}_$r AS MATERIALIZED (
             |  SELECT f.query_id, f.node, ${cosSql("q.q_qv", "a.qv", "q.q_nsq", "a.nsq")} AS sim
             |  FROM fresh_${l}_$r f JOIN n a ON a.vec_id = f.node
             |    JOIN qs q ON q.query_id = f.query_id),
             |vis_${l}_$r AS MATERIALIZED (SELECT * FROM $vis UNION ALL SELECT * FROM sc_${l}_$r),
             |fr_${l}_$r AS MATERIALIZED (
             |  SELECT query_id, node FROM (
             |    SELECT query_id, node,
             |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, node) AS rn
             |    FROM sc_${l}_$r)
             |  WHERE rn <= $beam)""".stripMargin
        vis = s"vis_${l}_$r"
      }
    }
    val apx =
      s"""apx AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, node AS neighbor_id,
         |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, node) AS rank
         |    FROM $vis WHERE query_id <> node)
         |  WHERE rank <= 10)""".stripMargin
    (head +: blocks.toSeq :+ apx).mkString(",\n")
  }

  private lazy val hnswRecallSql: String = {
    val layerCtes = hnswLayers.map { case (l, nc) =>
      hnswLayerCtes(l, nc, degree = 6) }.mkString(",\n")
    s"""WITH $hnswBaseCtes,
       |${hnswLevCte(4, 2)},
       |$layerCtes,
       |${hnswSearchCtes(beam = 8, rounds = 2)},
       |sce AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         ${cosSql("q.qv", "c.qv", "q.nsq", "c.nsq")} AS sim
       |  FROM n q, n c WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
       |ex AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |    FROM sce)
       |  WHERE rank <= 10)
       |$recallRollupSql""".stripMargin
  }

  /** Embedding near-dup oracle: the SAME ±1 SRP hyperplanes as
    * Dedup.embeddingNearDups (driver-generated, embedded as list
    * literals), bucket equi-join, exact-integer cosine ≥ 0.3. */
  private lazy val embeddingNearDupSql: String = {
    val bucketTerms = srpBucketTermsSql
    s"""WITH v AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           e -> CAST(round(CAST(e AS DOUBLE)*1000000) AS BIGINT)) AS qv
       |  FROM embeddings),
       |b AS (
       |  SELECT vec_id, qv,
       |         CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i]*qv[i])) AS BIGINT) AS nsq,
       |         CAST($bucketTerms AS BIGINT) AS bucket
       |  FROM v),
       |pairs AS (
       |  SELECT l.vec_id AS a, r.vec_id AS b,
       |         CAST(list_sum(list_transform(generate_series(1, len(l.qv)), i -> l.qv[i]*r.qv[i])) AS BIGINT) AS dot,
       |         l.nsq AS na, r.nsq AS nb
       |  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id)
       |SELECT DISTINCT a, b,
       |       CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS sim
       |FROM pairs
       |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) >= 0.3""".stripMargin
  }

  /** `['a', 'b', ...]` — DuckDB list literal (lambda bodies reject IN
    * lists, so membership goes through list_contains). */
  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'${w.replace("'", "''")}'").mkString("[", ", ", "]")

  private lazy val allStopwordsSqlList: String =
    TextFunctions.langMarkers.flatMap(_._2).distinct
      .map(w => s"'${w.replace("'", "''")}'").mkString(", ")

  /** Language-ID argmax with (hits desc, lang asc) tie-break, mirrored
    * as a CASE chain over languages in ascending code order. */
  private lazy val langIdSql: String = {
    val langs = TextFunctions.langMarkers.sortBy(_._1)
    val scoreCols = langs.map { case (lang, words) =>
      s"len(list_filter(w, t -> list_contains(${sqlList(words)}, t))) AS s_$lang"
    }.mkString(",\n         ")
    val maxExpr = langs.map(l => s"s_${l._1}").mkString("greatest(", ", ", ")")
    val caseChain = langs.map { case (lang, _) =>
      s"WHEN s_$lang = mx THEN '$lang'"
    }.mkString(" ")
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |         list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0) AS w
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, lang,
       |         $scoreCols
       |  FROM toks),
       |best AS (
       |  SELECT doc_id, lang, $maxExpr AS mx,
       |         s_de, s_en, s_es, s_fr, s_zh
       |  FROM scored)
       |SELECT lang, pred_lang, count(*) AS n FROM (
       |  SELECT lang,
       |         CASE WHEN mx = 0 THEN 'und' $caseChain ELSE 'und' END AS pred_lang
       |  FROM best)
       |GROUP BY 1, 2""".stripMargin
  }
}
