package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    (1L, "u1", 100L),   // inside u1's [50, 150]
    (2L, "u1", 150L),   // inclusive upper bound
    (3L, "u1", 151L),   // just outside
    (4L, "u2", 100L),   // u2 has no interval covering 100
    (5L, "u1", 7000L))  // far bin, inside [6900, 7100]
    .toDF("pid", "user", "p")

  private val intervals = Seq(
    ("u1", 50L, 150L),
    ("u1", 6900L, 7100L),
    ("u2", 200L, 300L))
    .toDF("user", "lo", "hi")

  test("pointInInterval matches inclusive bounds per equi-key") {
    val out = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi",
      binWidth = 100, equiKeys = Seq("user"))
    assert(out.select("pid").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 5L))
  }

  test("intervals spanning many bins still match (replication correctness)") {
    val wide = Seq(("u1", 0L, 10000L)).toDF("user", "lo", "hi")
    val out = RangeJoin.pointInInterval(points.filter($"user" === "u1"), wide,
      "p", "lo", "hi", binWidth = 7, equiKeys = Seq("user"))
    // Every u1 point is inside the wide interval regardless of bin width.
    assert(out.count() == 4)
  }

  test("binned join equals naive cross-join range filter on random data") {
    val rnd = new scala.util.Random(42)
    val pts = (1 to 200).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      .toDF("pid", "p")
    val ivs = (1 to 40).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (i.toLong, lo, lo + rnd.nextInt(120))
    }.toDF("iid", "lo", "hi")
    for (width <- Seq(1L, 13L, 100L, 5000L)) {
      val binned = sortedRows(
        RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", width)
          .select($"pid", $"iid"))
      val naive = sortedRows(
        pts.crossJoin(ivs).filter($"p" >= $"lo" && $"p" <= $"hi")
          .select($"pid", $"iid"))
      assert(binned == naive, s"bin width $width diverged from naive join")
    }
  }

  test("no equi-key: pure range matching via bins") {
    val pts = Seq((1L, 5L), (2L, 42L)).toDF("pid", "p")
    val ivs = Seq((10L, 50L)).toDF("lo", "hi")
    val out = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", binWidth = 8)
    assert(out.select("pid").as[Long].collect().toSeq == Seq(2L))
  }

  test("intervalOverlapJoin: once per pair, half-open ends, keys separate") {
    val ivs = Seq(
      ("u", 1L, 0L, 100L),    // spans many bins with 2 below
      ("u", 2L, 50L, 250L),   // overlaps 1 (50) and 3 (none: touching)
      ("u", 3L, 250L, 300L),  // touches 2 at 250 -> NOT an overlap
      ("u", 4L, 260L, 280L),  // inside 3
      ("v", 5L, 0L, 300L),    // other key: never pairs with u's
      ("u", 6L, 400L, 400L))  // empty interval: dropped
      .toDF("k", "id", "s", "e")
    for (width <- Seq(7L, 64L, 1000L)) {
      val got = RangeJoin
        .intervalOverlapJoin(ivs, "id", "s", "e", width, Seq("k"))
        .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3))
        .toMap
      assert(got == Map((1L, 2L) -> 50L, (3L, 4L) -> 20L),
        s"bin width $width")
    }
  }
}
