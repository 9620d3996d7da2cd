package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalSpec extends SparkSpec {
  import spark.implicits._

  test("rangeJoin: closed bounds, multi-bucket intervals, once each") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 25L), (4L, 100L))
      .toDF("pid", "v")
    val ivals = Seq(
      // spans buckets 0..3 at width 8 — wide interval, still one
      // emission per matching point.
      (10L, 0L, 26L),
      // closed-bound edges: exactly [10, 10].
      (11L, 10L, 10L),
      // inverted -> dropped.
      (12L, 9L, 3L))
      .toDF("iid", "lo", "hi")
    val got = Interval.rangeJoin(points, "pid", "v", ivals, "iid",
        "lo", "hi", bucketWidth = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 10L), (2L, 11L)))
  }

  test("overlapJoin: touching counts as 0, canonical bucket dedups") {
    val a = Seq((1L, 0L, 10L), (2L, 50L, 99L)).toDF("id", "lo", "hi")
    val b = Seq(
      (7L, 10L, 20L),  // touches a1 at 10 -> overlap 0.
      (8L, 5L, 60L),   // overlaps a1 by 5 and a2 by 10.
      (9L, 200L, 300L) // disjoint.
      ).toDF("id", "lo", "hi")
    val got = Interval.overlapJoin(a, "id", "lo", "hi",
        b, "id", "lo", "hi", bucketWidth = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 7L) -> 0L, (1L, 8L) -> 5L, (2L, 8L) -> 10L))
    // count == map size proves the canonical-bucket emission never
    // duplicated a pair despite interval 8 spanning 4 buckets.
    assert(Interval.overlapJoin(a, "id", "lo", "hi",
      b, "id", "lo", "hi", bucketWidth = 16).count() == 3L)
  }
}
