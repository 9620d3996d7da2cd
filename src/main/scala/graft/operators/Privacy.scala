package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification-risk operators: k-anonymity equivalence-class
  * censuses and generalization-ladder costing. Complements the
  * row-content PII scrub (`Training.piiScrub`) with the STRUCTURAL
  * side of privacy: even with direct identifiers removed, a
  * quasi-identifier combination shared by fewer than k rows singles
  * people out (Sweeney 2002). The reference's published tables carry
  * exactly such combinations (device model + firmware + map name,
  * `SURVEY.md §1.4`), so a release gate over them is the natural
  * extension of its quality checks (`src/data_quality.py`).
  *
  * Scale: everything here is hash-aggregation on the quasi-identifier
  * key — map-side partials, one shuffle, no windows, no row explosion
  * beyond one struct per (row, ladder level).
  */
object Privacy {

  /** Per-equivalence-class census under the quasi-identifier columns
    * `quasi` (aliased Columns): class size and k-anonymity verdict.
    * One hash-agg; NULL quasi values form real classes (a NULL zip
    * code groups with other NULL zip codes — Spark and SQL GROUP BY
    * agree on that). */
  def kAnonymityClasses(
      df: DataFrame, quasi: Seq[Column], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("anonymous", col("class_size") >= k)
  }

  /** Generalization-ladder costing in ONE scan and ONE shuffle: each
    * ladder level maps the quasi-identifiers to a coarser form (drop a
    * column by generalizing it to a literal NULL); every row explodes
    * into one struct per level, and a single hash-agg over
    * (level, generalized key) yields per-level suppression cost — the
    * rows that would need suppression because their class is still
    * below k. Output, one row per level:
    *
    *   (level, n_rows, n_classes, n_sub_k_classes,
    *    n_suppressed_rows, suppression_frac [6 dp])
    *
    * The caller picks the cheapest level meeting its suppression
    * budget — a decision over L rows, not a second pass over data.
    * All levels MUST share the same struct field names/types (use
    * NULL literals of the right type for generalized-away fields). */
  def generalizationLadder(
      df: DataFrame, levels: Seq[(Int, Seq[Column])], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(levels.nonEmpty, "need at least one ladder level")
    val leveled = df.select(explode(array(levels.map { case (lvl, cols) =>
      struct((lit(lvl).as("level") +: cols): _*)
    }: _*)).as("g"))
    leveled
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("g.level").as("level"))
      .agg(
        sum(col("n")).cast("long").as("n_rows"),
        count(lit(1)).as("n_classes"),
        sum(when(col("n") < k, 1L).otherwise(0L)).cast("long")
          .as("n_sub_k_classes"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).cast("long")
          .as("n_suppressed_rows"))
      .withColumn("suppression_frac",
        round(col("n_suppressed_rows") / col("n_rows"), 6))
  }

  /** Luhn checksum validity of a digit string (ISO/IEC 7812 — the
    * mod-10 check every payment-card number passes): from the right,
    * double every second digit, subtract 9 when that exceeds 9, and
    * the total must divide by 10. Pure expression over higher-order
    * array functions — codegen-adjacent, no UDF. NULL/empty/non-digit
    * input → false. */
  def luhnValid(digits: Column): Column = {
    val ds = transform(split(reverse(digits), ""), c => c.cast("int"))
    val total = aggregate(
      zip_with(ds, sequence(lit(0), size(ds) - 1), (d, i) =>
        when(i % 2 === 1,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)),
      lit(0), (acc, x) => acc + x)
    digits.isNotNull && digits.rlike("^[0-9]+$") && total % 10 === 0
  }

  /** Payment-card (PAN) candidate census: every MAXIMAL digit run of
    * 13–19 chars in `textCol`, with its Luhn verdict — the
    * high-precision PII detector a pure regex scrub lacks (a 16-digit
    * order id fails the checksum; a real PAN cannot). Maximal runs,
    * then a length filter — not a `{13,19}` match, which would carve
    * candidates out of a longer run (a 20-digit tracking number must
    * yield NO candidate, not a truncated one) and would need
    * lookaround an RE2 oracle cannot replay. One row per
    * (row, candidate) via posexplode (`cand_idx` counts ALL runs, so
    * dropped over-long runs still advance it); map-only, no shuffle.
    * Output: input id column + (cand_idx, cand, luhn_ok). */
  def panCandidates(
      df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(regexp_extract_all(col(textCol), lit("[0-9]+"), lit(0)))
          .as(Seq("cand_idx", "cand")))
      .filter(length(col("cand")).between(13, 19))
      .withColumn("cand_idx", col("cand_idx").cast("int"))
      .withColumn("luhn_ok", luhnValid(col("cand")))

  /** Scrub Luhn-VALID 13–19 digit runs from `textCol`, replacing each
    * with `[PAN]` and leaving checksum-failing runs (order ids,
    * tracking numbers) untouched — regex finds the candidates,
    * arithmetic decides. Implemented as: split on candidate
    * boundaries is regex-hostile, so instead each valid candidate
    * becomes a replace pass over its exact digit run bounded by the
    * same non-digit guards. Map-only. */
  def scrubPans(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val valids = panCandidates(df, idCol, textCol)
      .filter(col("luhn_ok"))
      .groupBy(col(idCol))
      .agg(collect_set(col("cand")).as("__pans"))
    df.join(valids, Seq(idCol), "left")
      .withColumn("scrubbed",
        when(col("__pans").isNull, col(textCol)).otherwise(
          aggregate(col("__pans"), col(textCol), (acc, p) =>
            regexp_replace(acc,
              concat(lit("(^|[^0-9])"), p, lit("(?=[^0-9]|$)")),
              lit("$1[PAN]")))))
      .drop("__pans")
  }
}
