package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 1-D interval joins — the range-lookup primitives (IP→range,
  * value→band, timestamp→validity window, co-presence) that a naive
  * plan turns into a broadcast nested loop. Both operators ride the
  * proximityJoin banding idea in one dimension: intervals explode
  * into the fixed-width buckets they cover, the probe side equi-joins
  * on the bucket, and a final exact predicate verifies — candidates
  * are bucket-local, never side × side. The reference has no joins
  * at all (single-device rows, `src/roborock_collector.py`); these
  * exist for the 100 TB pipelines the engine targets. */
object Interval {

  /** Points-into-intervals range join: every (point, interval) pair
    * with lo ≤ v ≤ hi (CLOSED bounds — stated). The interval side
    * explodes into its covered buckets (⌈len/width⌉ + 1 rows — pick
    * `bucketWidth` near the typical interval length so the fan-out
    * is a small constant); a point lives in exactly ONE bucket, so
    * every qualifying pair surfaces exactly once — no dedup pass.
    * NULL/inverted intervals (hi < lo) and NULL points drop.
    * Bounds must be non-negative (floor-div bucketing — shift
    * negative axes up front, the [[Spatial.proximityJoin]] stance).
    *
    * Scale: candidates per point = intervals overlapping its bucket
    * — output-bound like every radius join; a pathological
    * everything-covers-everything band set is an input property the
    * caller sees in the explode factor, not a plan defect.
    * Output: (pIdCol, iIdCol, v, lo, hi). */
  def rangeJoin(
      points: DataFrame,
      pIdCol: String,
      vCol: String,
      intervals: DataFrame,
      iIdCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points
      .filter(col(vCol).isNotNull && col(vCol) >= 0L)
      .select(col(pIdCol).as("__pid"),
        col(vCol).cast("long").as("__v"))
      .withColumn("__b", expr(s"__v div ${bucketWidth}L"))
    val i = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(hiCol) >= col(loCol) && col(loCol) >= 0L)
      .select(col(iIdCol).as("__iid"),
        col(loCol).cast("long").as("__lo"),
        col(hiCol).cast("long").as("__hi"))
      .withColumn("__b", explode(sequence(
        expr(s"__lo div ${bucketWidth}L"),
        expr(s"__hi div ${bucketWidth}L"))))
    p.join(i, Seq("__b"))
      .filter(col("__v") >= col("__lo") && col("__v") <= col("__hi"))
      .select(col("__pid").as(pIdCol), col("__iid").as(iIdCol),
        col("__v").as(vCol), col("__lo").as(loCol),
        col("__hi").as(hiCol))
  }

  /** Interval OVERLAP join: every (a, b) pair with a.lo ≤ b.hi and
    * b.lo ≤ a.hi (closed intervals — touching endpoints count, with
    * overlap_len 0). Both sides explode into covered buckets; a
    * qualifying pair shares every bucket its overlap spans, so each
    * pair is emitted from exactly ONE canonical bucket — the bucket
    * holding the overlap's START, max(a.lo, b.lo) — and no dedup
    * pass exists anywhere. Self-joins (a = b table) emit both
    * orderings; filter `aId < bId` downstream for unordered pairs.
    * Same non-negative floor-div contract as [[rangeJoin]].
    *
    * Scale: fan-out ⌈len/width⌉ + 1 per interval, candidates bucket-
    * local, output-bound. Output: (aIdOut, bIdOut, overlap_len). */
  def overlapJoin(
      a: DataFrame, aIdCol: String, aLoCol: String, aHiCol: String,
      b: DataFrame, bIdCol: String, bLoCol: String, bHiCol: String,
      bucketWidth: Long,
      aIdOut: String = "a_id",
      bIdOut: String = "b_id"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def side(df: DataFrame, id: String, lo: String, hi: String,
        p: String) =
      df.filter(col(lo).isNotNull && col(hi).isNotNull &&
          col(hi) >= col(lo) && col(lo) >= 0L)
        .select(col(id).as(s"__${p}id"),
          col(lo).cast("long").as(s"__${p}lo"),
          col(hi).cast("long").as(s"__${p}hi"))
        .withColumn("__b", explode(sequence(
          expr(s"__${p}lo div ${bucketWidth}L"),
          expr(s"__${p}hi div ${bucketWidth}L"))))
    side(a, aIdCol, aLoCol, aHiCol, "a")
      .join(side(b, bIdCol, bLoCol, bHiCol, "b"), Seq("__b"))
      .filter(col("__alo") <= col("__bhi") &&
        col("__blo") <= col("__ahi") &&
        // canonical bucket: the one holding the overlap's start.
        col("__b") === expr(
          s"greatest(__alo, __blo) div ${bucketWidth}L"))
      .select(col("__aid").as(aIdOut), col("__bid").as(bIdOut),
        (least(col("__ahi"), col("__bhi")) -
          greatest(col("__alo"), col("__blo"))).as("overlap_len"))
  }
}
