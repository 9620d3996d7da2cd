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
}
