package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling and constraint-validation operators — the
  * deequ/Great-Expectations surface a pipeline runs BEFORE training
  * on a new drop: per-column completeness/cardinality/range profile,
  * declarative row-level constraint census, and referential-integrity
  * checks. The reference's analogue is its per-row validation at the
  * ingest boundary (`src/roborock_collector.py:295-352` null-guarding
  * every field); at 100 TB validation must be a handful of scans, not
  * a row loop.
  */
object Profile {

  /** Per-column profile in ONE scan: row count, null count, exact
    * distinct count, and min/max (typed comparison, rendered as
    * strings so heterogeneous columns share one output schema).
    * The wide single-row aggregate pivots to one row per column
    * AFTER aggregation — so a 100-column profile is still one job.
    *
    * Exact distinct per column compiles to one Expand (×|cols| rows)
    * feeding a single aggregate — the standard multi-distinct plan;
    * at 100 TB swap in approx_count_distinct if ±2% is acceptable
    * (not done here: the correctness gate wants exact).
    *
    * Output: (column, n_rows, n_null, n_distinct, min_s, max_s). */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    // Working columns are keyed by column INDEX — col() would parse a
    // dotted source column name as struct access.
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(col(c)).as(s"__nn_$i"),
        countDistinct(col(c)).as(s"__nd_$i"),
        min(col(c)).cast("string").as(s"__mn_$i"),
        max(col(c)).cast("string").as(s"__mx_$i"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    wide.select(explode(array(cols.zipWithIndex.map { case (c, i) =>
        struct(lit(c).as("column"),
          col("__n").as("n_rows"),
          (col("__n") - col(s"__nn_$i")).as("n_null"),
          col(s"__nd_$i").as("n_distinct"),
          col(s"__mn_$i").as("min_s"),
          col(s"__mx_$i").as("max_s"))
      }: _*)).as("__p"))
      .select(col("__p.*"))
  }

  /** Row-level constraint census in ONE scan: each rule is a boolean
    * "row passes" predicate; a NULL verdict counts as a VIOLATION
    * (SQL three-valued logic would silently pass unknowns — a
    * validator must not). All rules evaluate in a single map pass +
    * one-row aggregate, pivoted to a row per rule.
    *
    * Output: (rule, n_rows, n_violations), rules in input order
    * preserved by name. */
  def checkConstraints(
      df: DataFrame,
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "rules must be non-empty")
    // Working columns are keyed by rule INDEX, not name — col() parses
    // dots in names as struct access, and rule names are free text.
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
        .as(s"__v_$i")
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    wide.select(explode(array(rules.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("rule"),
          col("__n").as("n_rows"),
          col(s"__v_$i").as("n_violations"))
      }: _*)).as("__r"))
      .select(col("__r.*"))
  }

  /** Distribution-drift census between two snapshots of the same
    * feature (data-drift monitoring, the integer-exact core of a PSI
    * check): per pre-bucketed value, counts and micro-proportions on
    * both sides plus their absolute delta. The PSI/KL log factor is
    * deliberately NOT taken (libm would cross the engine boundary) —
    * max/sum of `delta_micro` is the drift statistic, exactly the
    * L∞/L1 histogram distance alert thresholds are set on.
    *
    * Scale: two map-side-combinable bucket censuses + a full-outer
    * equi-join on the bucket (histogram-sized) + two 1-row broadcast
    * total attaches. Buckets absent on one side report 0 there.
    *
    * Output: (bucket, n_old, n_new, p_old_micro, p_new_micro,
    * delta_micro). An EMPTY side yields NULL proportions (integral
    * divide-by-zero quarantines rather than inventing 0%). */
  def histogramDrift(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      bucketCol: String): DataFrame = {
    val o = oldSnap.groupBy(col(bucketCol).as("bucket"))
      .agg(count(lit(1)).as("n_old"))
    val n = newSnap.groupBy(col(bucketCol).as("bucket"))
      .agg(count(lit(1)).as("n_new"))
    // Pinned: both the totals aggregate and the final projection read
    // the joined census — without this the two snapshot scans and the
    // full-outer join would run twice.
    val joined = Dedup.truncate(o.join(n, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new")))
    val totals = joined.agg(sum(col("n_old")).as("__to"),
      sum(col("n_new")).as("__tn"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_old"), col("n_new"),
        expr("(1000000L * n_old) div __to").as("p_old_micro"),
        expr("(1000000L * n_new) div __tn").as("p_new_micro"))
      .withColumn("delta_micro",
        abs(col("p_old_micro") - col("p_new_micro")))
  }

  /** Referential-integrity violations: fact rows whose `fkCol` value
    * has no match in `dim.pkCol` — a left-anti equi-join, the
    * scale-correct FK check (never fact×dim; AQE broadcasts small
    * dims). NULL foreign keys are NOT violations (SQL FK semantics:
    * a NULL reference is absent, not dangling) — filter upstream if
    * the column is also NOT NULL. Returns the violating fact rows
    * unchanged; callers census or quarantine them. */
  def fkViolations(
      fact: DataFrame,
      fkCol: String,
      dim: DataFrame,
      pkCol: String): DataFrame =
    fact.filter(col(fkCol).isNotNull)
      .join(dim.select(col(pkCol).as(fkCol)).distinct(),
        Seq(fkCol), "left_anti")
}
