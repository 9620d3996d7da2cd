package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) joins that scale: point-in-interval matching
  * without a nested-loop cross product.
  *
  * Spark has no native band-join strategy, and a raw
  * `p.ts BETWEEN i.lo AND i.hi` predicate with no equi-key compiles to
  * BroadcastNestedLoopJoin — quadratic and broadcast-bound. The
  * standard scale pattern is BINNING: quantize the range dimension
  * into fixed-width bins, explode each interval into the bins it
  * overlaps, and equi-join on the bin id (+ any natural equi-keys).
  * The optimizer then runs a plain shuffled hash/sort-merge join;
  * per-bin work is bounded by bin occupancy, not corpus size.
  *
  * Bin width trades replication (intervals spanning many bins emit
  * many rows) against join selectivity — pick it near the median
  * interval length so most intervals land in 1–2 bins.
  */
object RangeJoin {

  /** Inner-join `points` to the `intervals` that contain them:
    * keeps rows where lo <= point <= hi (inclusive ends), matching on
    * `equiKeys` as well. `pointCol`/`loCol`/`hiCol` must be numeric
    * (epoch seconds for time intervals). Output = point columns +
    * interval columns (minus join duplicates).
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long,
      equiKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("_bin",
      expr(s"CAST($pointCol AS BIGINT) div $binWidth"))
    // One row per (interval, overlapped bin) — the replication step.
    val i = intervals.withColumn("_bin",
      explode(sequence(
        expr(s"CAST($loCol AS BIGINT) div $binWidth"),
        expr(s"CAST($hiCol AS BIGINT) div $binWidth"))))
    p.join(i, equiKeys :+ "_bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }

  /** Interval×interval OVERLAP self-join: all pairs of intervals (per
    * `keyCols`) that overlap in time — concurrent-session detection,
    * double-booking checks, availability conflicts. Overlap is the
    * half-open convention `sa < eb AND sb < ea` (touching endpoints do
    * NOT overlap); each pair emits EXACTLY once, as (a < b, with the
    * actual overlap length).
    *
    * Same binning discipline as [[pointInInterval]] — a raw
    * `sa < eb AND sb < ea` self-join has no equi-key and compiles to
    * a nested loop. Both sides explode into spanned bins and
    * equi-join on (keys, bin); the once-per-pair guarantee is the
    * standard first-overlapping-bin trick: a pair is kept only in the
    * bin containing max(sa, sb) — the overlap's own start — which
    * both sides necessarily span, so exactly one copy survives with
    * no distinct pass.
    *
    * Scale: replication = interval length / binWidth rows per
    * interval (pick binWidth near the median length); per-(key, bin)
    * work is quadratic in BIN occupancy, never corpus-wide.
    *
    * Output: keyCols + (a, b, overlap) — `overlap` =
    * min(ea, eb) − max(sa, sb) in the interval unit. */
  def intervalOverlapJoin(
      intervals: DataFrame,
      idCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long,
      keyCols: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val base = intervals.select(
      (keyCols.map(col) ++ Seq(col(idCol).as("__id"),
        col(startCol).cast("long").as("__s"),
        col(endCol).cast("long").as("__e"))): _*)
      .filter(col("__s") < col("__e")) // empty/inverted never overlap
    val binned = base.withColumn("_bin",
      explode(sequence(expr(s"__s div $binWidth"),
        expr(s"(__e - 1) div $binWidth"))))
    val l = binned.select(
      (keyCols.map(col) ++ Seq(col("_bin"), col("__id").as("a"),
        col("__s").as("__sa"), col("__e").as("__ea"))): _*)
    val r = binned.select(
      (keyCols.map(col) ++ Seq(col("_bin"), col("__id").as("b"),
        col("__s").as("__sb"), col("__e").as("__eb"))): _*)
    l.join(r, keyCols :+ "_bin")
      .filter(col("a") < col("b"))
      .filter(col("__sa") < col("__eb") && col("__sb") < col("__ea"))
      // First-overlapping-bin: keep the pair only where this bin holds
      // the overlap's start — exactly one bin qualifies.
      .filter(col("_bin") ===
        expr(s"greatest(__sa, __sb) div $binWidth"))
      .select((keyCols.map(col) ++ Seq(col("a"), col("b"),
        (least(col("__ea"), col("__eb")) -
          greatest(col("__sa"), col("__sb"))).as("overlap"))): _*)
  }
}
