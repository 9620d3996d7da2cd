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
}
