package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling over irregular event streams: the
  * time-series shape the reference's poll-driven collector produces
  * naturally (a device reports when polled — `roborock_collector.py`
  * S1/S5 rows arrive at whatever cadence the poller manages) and every
  * downstream consumer wants on a fixed cadence. Gap-filling policy is
  * the standard pair: last-observation-carried-forward for state-like
  * signals, linear interpolation for continuous ones.
  *
  * Scale: the grid is generated per key from that key's own observed
  * span (`sequence` + explode — no driver-side calendar), the
  * fill windows partition by key, and a key's grid size is bounded by
  * span/step, not by event count — a firehose key costs the same grid
  * as a quiet one. The per-key window is a bounded group in the same
  * sense as the SCD2/funnel windows (PlanAudit windowNotes): grid
  * rows per key = time-span/step, fixed by the resample config.
  */
object TimeSeries {

  /** Resample `events` onto a fixed `stepSeconds` grid per `keyCol`,
    * from each key's first observed bucket to its last. Observations
    * landing in the same bucket average. Output per (key, bucket):
    *
    *   - `bucket_start` (timestamp), `observed` (any real row here?)
    *   - `value_obs`   — the bucket average, NULL on gap rows
    *   - `value_locf`  — last observation carried forward (never NULL:
    *                     the grid starts at an observed bucket)
    *   - `value_interp`— linear interpolation between the bracketing
    *                     observations; trailing gaps carry the last
    *                     value (no future point to interpolate toward)
    *
    * All values round to 6 dp for cross-engine bit-stability. */
  def resampleGapFill(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    val step = lit(stepSeconds)
    val obs = events
      .select(col(keyCol),
        (floor(unix_timestamp(col(tsCol)) / step) * step).as("bucket"),
        col(valueCol).as("v"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(avg(col("v")).as("value_obs"))
    val grid = obs
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col(keyCol),
        explode(sequence(col("lo"), col("hi"), step)).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsBucket = when(col("value_obs").isNotNull, col("bucket"))
    grid.join(obs, Seq(keyCol, "bucket"), "left")
      .withColumn("pv", last(col("value_obs"), ignoreNulls = true).over(back))
      .withColumn("pb", last(obsBucket, ignoreNulls = true).over(back))
      .withColumn("nv", first(col("value_obs"), ignoreNulls = true).over(fwd))
      .withColumn("nb", first(obsBucket, ignoreNulls = true).over(fwd))
      .select(col(keyCol),
        timestamp_seconds(col("bucket")).as("bucket_start"),
        col("value_obs").isNotNull.as("observed"),
        round(col("value_obs"), 6).as("value_obs"),
        round(col("pv"), 6).as("value_locf"),
        round(
          when(col("value_obs").isNotNull, col("value_obs"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") +
              (col("nv") - col("pv")) *
                ((col("bucket") - col("pb")) / (col("nb") - col("pb")))),
          6).as("value_interp"))
  }

  /** Per-key least-squares trend over integer (x, y) observations —
    * "is this user/domain/metric rising or falling, and how fast" as
    * ONE map-side-combinable aggregation pass. The OLS slope is
    * (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²); both sides stay EXACT Longs,
    * and the quotient is deliberately NOT taken — integer division
    * truncates toward zero in Spark but floors in DuckDB/Python for
    * negative numerators, and an IEEE divide would re-admit the
    * summation-order drift the integer design excludes. Callers rank
    * by the exact rational (num, den) or take the sign; `trend` is
    * that sign (+1 rising, −1 falling, 0 flat, NULL when den = 0 —
    * a single distinct x has no slope).
    *
    * Scale: one groupBy over five sums — partial aggregation does
    * all the work map-side; no window, no self-join, heaviest key
    * costs one struct of state. Overflow bound: |num| ≤ 2·n·|x|max·
    * |y|max·n — keep n·xmax and n·ymax under ~3·10⁹ (re-origin x to
    * days-since-window-start at 100 TB; epoch-days already fit). */
  def groupTrend(
      df: DataFrame,
      keyCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * y).as("__sxy"), sum(x * x).as("__sxx"))
      .select(col(keyCol), col("n"),
        (col("n") * col("__sxy") - col("__sx") * col("__sy"))
          .as("slope_num"),
        (col("n") * col("__sxx") - col("__sx") * col("__sx"))
          .as("slope_den"))
      .withColumn("trend",
        when(col("slope_den") === 0L, lit(null).cast("int"))
          .otherwise(signum(col("slope_num")).cast("int")))
  }

  /** Exponentially time-decayed counts with EXACT power-of-two decay:
    * each observation contributes `weight >> (age div halfLife)` —
    * halve per elapsed half-life, floored — so "recent activity
    * matters more" (trending items, hot domains, decaying reputation)
    * without a single float: `0.5^x` via arithmetic shift is
    * bit-identical in every engine and immune to summation order,
    * where IEEE `pow` would leak last-ulp diffs through the sum.
    * The floor means a unit weight vanishes entirely beyond
    * log₂(weight) half-lives — the natural retention horizon (weight
    * 1e6 ≈ 20 half-lives); shifts cap at 62 so huge ages stay
    * defined.
    *
    * `ageCol` = now − event time in the caller's unit (same unit as
    * `halfLife`); negative ages are clamped to 0 (future-dated rows
    * count full). Scale: one map pass + one map-side-combinable
    * hash-agg per key — nothing else.
    *
    * Output: (key, n_obs, decayed) — decayed in the weight's unit. */
  def decayedCounts(
      df: DataFrame,
      keyCol: String,
      ageCol: String,
      weight: Column,
      halfLife: Long): DataFrame = {
    require(halfLife > 0, "halfLife must be positive")
    // `div`, not `/` — Divide on Longs returns DOUBLE (the standing
    // integer-exactness rule). The caller's ageCol is resolved via
    // col() (names needing backticks work), then the div runs over
    // the aliased working column — never raw name interpolation.
    val shift = least(
      expr(s"__age div ${halfLife}L"), lit(62L)).cast("int")
    df.select(col(keyCol), weight.cast("long").as("__w"),
        greatest(col(ageCol).cast("long"), lit(0L)).as("__age"))
      .select(col(keyCol), col("__w"), shift.as("__k"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        sum(expr("shiftright(__w, __k)")).as("decayed"))
  }
}
