package graft.operators

import graft.SparkSpec

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  test("proximityJoin: cross-cell pairs found, boundary exact, once each") {
    // radius 10. Points: (0,0) and (9,0) same-ish cells; (9,0)-(11,0)
    // straddle a cell boundary (cells 0 and 1) — the 3×3 probe must
    // find them; (0,0)-(10,0) is EXACTLY at distance² = r² (kept, ≤);
    // (0,0)-(11,0) is out (121 > 100).
    val pts = Seq((1L, 0L, 0L), (2L, 9L, 0L), (3L, 11L, 0L),
      (4L, 10L, 0L), (5L, 500L, 500L)).toDF("id", "x", "y")
    val got = Spatial.proximityJoin(pts, "id", "x", "y", radius = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      (1L, 2L) -> 81L,   // same region
      (2L, 3L) -> 4L,    // cross-cell
      (2L, 4L) -> 1L,
      (3L, 4L) -> 1L,
      (1L, 4L) -> 100L)) // exactly r²: inclusive
    // No duplicates is implied by the Map cardinality matching the
    // raw row count.
    assert(Spatial.proximityJoin(pts, "id", "x", "y", radius = 10)
      .count() == 5)
  }

  test("proximityJoin: diagonal neighbors and empty result") {
    val pts = Seq((1L, 99L, 99L), (2L, 101L, 101L)).toDF("id", "x", "y")
    // Diagonal cell neighbors at distance² = 8 ≤ 100.
    val got = Spatial.proximityJoin(pts, "id", "x", "y", radius = 10)
      .collect()
    assert(got.length == 1 && got(0).getLong(2) == 8L)
    // Far apart: nothing.
    val far = Seq((1L, 0L, 0L), (2L, 1000L, 1000L)).toDF("id", "x", "y")
    assert(Spatial.proximityJoin(far, "id", "x", "y", radius = 10)
      .count() == 0)
  }

  test("proximityJoin: non-numeric ids pair fine (no silent long cast)") {
    val pts = Seq(("page-a", 0L, 0L), ("page-b", 3L, 4L))
      .toDF("id", "x", "y")
    val got = Spatial.proximityJoin(pts, "id", "x", "y", radius = 10)
      .collect()
    assert(got.length == 1)
    assert((got(0).getString(0), got(0).getString(1), got(0).getLong(2)) ==
      (("page-a", "page-b", 25L)))
  }

  test("proximityJoin: maxPerCell density cap keeps lowest ids only") {
    // 5 co-located points in one cell: uncapped yields C(5,2) = 10
    // pairs; cap 2 keeps ids 1,2 → exactly 1 pair, deterministically.
    val pts = (1L to 5L).map(i => (i, 3L, 4L)).toDF("id", "x", "y")
    assert(Spatial.proximityJoin(pts, "id", "x", "y", 10).count() == 10)
    val capped = Spatial.proximityJoin(pts, "id", "x", "y", 10,
      maxPerCell = 2).collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L)))
    // the cap never drops pairs in sparse cells
    val sparse = Seq((1L, 0L, 0L), (2L, 9L, 0L)).toDF("id", "x", "y")
    assert(Spatial.proximityJoin(sparse, "id", "x", "y", 10,
      maxPerCell = 2).count() == 1)
  }

  test("nnWithinRadius: closest wins, id tie-break, isolated NULL") {
    val pts = Seq(
      ("A", 0L, 0L), ("B", 3L, 4L), ("C", 3L, 3L),
      ("D", 100L, 100L),                       // out of everyone's range
      ("E", 20L, 0L), ("F", 28L, 0L), ("G", 12L, 0L))
      .toDF("id", "x", "y")
    val got = Spatial.nnWithinRadius(pts, "id", "x", "y", radius = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.size == 7)
    // A: C at 18 beats B at 25.
    assert(got("A").getString(1) == "C" && got("A").getLong(2) == 18L)
    assert(got("B").getString(1) == "C" && got("B").getLong(2) == 1L)
    // E: F and G both at d2 64 -> smaller id wins.
    assert(got("E").getString(1) == "F" && got("E").getLong(2) == 64L)
    assert(got("D").isNullAt(1) && got("D").isNullAt(2))
  }

  test("dbscan: cores/min-id clusters, border attach, mutual non-core noise") {
    val pts = Seq(
      // Triangle cluster: all three core, component labeled "A".
      ("A", 0L, 0L), ("B", 3L, 4L), ("C", 3L, 3L),
      // H: only B in range -> border of cluster "A".
      ("H", 9L, 12L),
      // D: isolated noise.
      ("D", 100L, 100L),
      // E-F: mutual neighbors but neither core -> both noise.
      ("E", 40L, 0L), ("F", 46L, 0L),
      // X core via two borders that are NOT neighbors of each other:
      // a singleton-core cluster labeled "X".
      ("X", 300L, 300L), ("Y", 309L, 300L), ("Z", 300L, 309L))
      .toDF("id", "x", "y")
    val got = Spatial.dbscan(pts, "id", "x", "y", eps = 10, minPts = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    def role(k: String) = got(k).getAs[String]("role")
    def clust(k: String) = got(k).getAs[String]("cluster")
    assert(Seq("A", "B", "C").forall(role(_) == "core"))
    assert(Seq("A", "B", "C").forall(clust(_) == "A"))
    assert(role("H") == "border" && clust("H") == "A")
    assert(role("D") == "noise" &&
      got("D").isNullAt(got("D").fieldIndex("cluster")))
    assert(role("E") == "noise" && role("F") == "noise")
    assert(role("X") == "core" && clust("X") == "X")
    assert(role("Y") == "border" && clust("Y") == "X")
    assert(role("Z") == "border" && clust("Z") == "X")
    assert(got("B").getAs[Long]("n_nbrs") == 3L)
  }
}
