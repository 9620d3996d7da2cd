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
