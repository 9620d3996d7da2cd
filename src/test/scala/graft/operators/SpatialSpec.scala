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

  test("quadkeyCensus: hand digit interleave and prefix rollup") {
    // extent 100, levels 3 (8x8 cells).
    val pts = Seq(
      (0L, 0L), (0L, 0L),      // cell (0,0) -> "000", twice
      (99L, 99L),              // cell (7,7) -> "333"
      (50L, 0L))               // cell (4,0) -> bits x=100 -> "100"
      .toDF("x", "y")
    val got = Spatial.quadkeyCensus(pts, "x", "y", extent = 100L,
        levels = 3)
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got((3, "000")) == 2L)
    assert(got((3, "333")) == 1L)
    assert(got((3, "100")) == 1L)
    // Parents at zoom 1 (one digit): "0"->2, "3"->1, "1"->1.
    assert(got((1, "0")) == 2L && got((1, "3")) == 1L &&
      got((1, "1")) == 1L)
    assert(got.size == 6)
  }

  test("moransI: clumped positive, checkerboard -1, exact hand sums") {
    def cellPts(cx: Long, cy: Long, n: Int) =
      Seq.fill(n)((cx, cy))
    // extent 4, levels 2: coordinates ARE cell indices.
    val clumped = (cellPts(0, 0, 4) ++ cellPts(1, 0, 4) ++
      cellPts(3, 3, 1)).toDF("x", "y")
    val c = Spatial.moransI(clumped, "x", "y", extent = 4L, levels = 2)
      .head()
    // G=3, S=9, q=33; one pair: num = 144-216+81 = 9, den = 18.
    assert(c.getAs[Long]("n_cells") == 3L && c.getAs[Long]("sum_w") == 2L)
    assert(c.getAs[Long]("i_micro") == 500000L)
    assert(c.getAs[Long]("e_i_micro") == -500000L)
    val board = (cellPts(0, 0, 5) ++ cellPts(1, 0, 1) ++
      cellPts(0, 1, 1) ++ cellPts(1, 1, 5)).toDF("x", "y")
    val b = Spatial.moransI(board, "x", "y", extent = 4L, levels = 2)
      .head()
    // Perfect dispersion on the 2x2 block: I = -1 exactly.
    assert(b.getAs[Long]("i_micro") == -1000000L)
    // A single occupied cell: no pairs, no variance -> NULL I.
    val lone = cellPts(2, 2, 7).toDF("x", "y")
    val l = Spatial.moransI(lone, "x", "y", extent = 4L, levels = 2)
      .head()
    assert(l.isNullAt(l.fieldIndex("i_micro")))
  }

  test("gearysC: checkerboard 1.5, flat-adjacent 0, lone-cell NULL") {
    def cellPts(cx: Long, cy: Long, n: Int) = Seq.fill(n)((cx, cy))
    val board = (cellPts(0, 0, 5) ++ cellPts(1, 0, 1) ++
      cellPts(0, 1, 1) ++ cellPts(1, 1, 5)).toDF("x", "y")
    val b = Spatial.gearysC(board, "x", "y", extent = 4L, levels = 2)
      .head()
    // Sum d2 = 64, G=4, Gq-S2 = 64, P=4: C = 12*64/(8*64) = 1.5.
    assert(b.getAs[Long]("c_micro") == 1500000L)
    val flat = (cellPts(0, 0, 4) ++ cellPts(1, 0, 4) ++
      cellPts(3, 3, 1)).toDF("x", "y")
    val f = Spatial.gearysC(flat, "x", "y", extent = 4L, levels = 2)
      .head()
    // The only edge joins two EQUAL cells: local roughness 0.
    assert(f.getAs[Long]("c_micro") == 0L)
    val lone = cellPts(2, 2, 7).toDF("x", "y")
    val l = Spatial.gearysC(lone, "x", "y", extent = 4L, levels = 2)
      .head()
    assert(l.isNullAt(l.fieldIndex("c_micro")))
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

  test("dbscan: one cluster spanning many grid cells keeps min-id label") {
    // A 40-point tight chain along x: spacing 5 < eps = 10 crosses
    // eight eps-cells, so the component is stitched PURELY from
    // cross-cell boundary edges plus per-cell local pieces — the
    // grid-partitioned path's merge seam. Every point sees ≥ 2
    // neighbors (+ itself ≥ minPts = 3) -> all core, one cluster
    // labeled by the minimum id (long ids 100..139 -> 100).
    val chain = (0 until 40).map(i => (100L + i, i * 5L, 0L))
    // Plus a second chain far away with smaller ids -> its own label.
    val other = (0 until 6).map(i => (i.toLong, i * 5L, 10000L))
    val got = Spatial.dbscan((chain ++ other).toDF("id", "x", "y"),
        "id", "x", "y", eps = 10, minPts = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 46)
    assert((0 until 40).forall(i =>
      got(100L + i).getAs[String]("role") == "core" &&
        got(100L + i).getAs[Long]("cluster") == 100L))
    assert((0 until 6).forall(i =>
      got(i.toLong).getAs[Long]("cluster") == 0L))
  }

  test("dbscan: maxPerCell guard bounds a hot cell, far structure intact") {
    // 50 points piled in ONE eps-cell (degenerate density) plus a
    // clean far triangle. With maxPerCell = 5 the hot cell pairs
    // only its 5 lowest ids — survivors stay core in one min-id
    // cluster, capped-out ids lose their edges (demote, the
    // DOCUMENTED approximation) — and the far cluster is untouched.
    val hot = (0 until 50).map(i => (i.toLong, 2L + (i % 3), 2L + (i / 3 % 3)))
    val far = Seq((900L, 5000L, 5000L), (901L, 5003L, 5004L),
      (902L, 5003L, 5003L))
    val got = Spatial.dbscan((hot ++ far).toDF("id", "x", "y"),
        "id", "x", "y", eps = 10, minPts = 3, maxPerCell = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 53)
    // The 5 survivors (lowest ids 0-4) all pair mutually: core, one
    // cluster labeled 0.
    assert((0L to 4L).forall(i =>
      got(i).getAs[String]("role") == "core" &&
        got(i).getAs[Long]("cluster") == 0L))
    // Capped-out points carry no edges at all -> noise.
    assert((5L until 50L).forall(i =>
      got(i).getAs[String]("role") == "noise"))
    assert(Seq(900L, 901L, 902L).forall(i =>
      got(i).getAs[String]("role") == "core" &&
        got(i).getAs[Long]("cluster") == 900L))
  }

  test("proximityJoin: NULL and duplicate ids never form cross-cell pairs") {
    // (null, 5, 5) sits one cell left of (7L, 12, 5): within radius 10
    // across cells — a NULL id must vanish (the a < b contract), not
    // become a (7, 7) self-pair via least/greatest. Two DISTINCT
    // points sharing id 9 in adjacent cells likewise drop.
    val pts = Seq(
      (Option.empty[Long], 5L, 5L), (Some(7L), 12L, 5L),
      (Some(9L), 25L, 5L), (Some(9L), 32L, 5L)).toDF("id", "x", "y")
    val got = Spatial.proximityJoin(pts, "id", "x", "y", radius = 10)
      .collect()
    assert(got.isEmpty)
  }
}
