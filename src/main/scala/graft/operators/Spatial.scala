package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial proximity over integer coordinates — the geo twin of the
  * LSH/band dedup pattern: derive an equi-joinable grid cell from
  * each point, generate candidates cell-locally, verify with exact
  * integer arithmetic. Coordinates are INTEGER micro-degrees (or any
  * fixed-point unit): squared Euclidean distance over Longs is
  * bit-identical in every engine, where a haversine of doubles leaks
  * last-ulp `sin`/`cos` differences across libm implementations.
  */
object Spatial {

  /** All point pairs within `radius` (flat-grid squared-distance
    * semantics): grid cells of side `radius`, each LEFT point probes
    * its 3×3 cell neighborhood, pairs verify `d² ≤ radius²`. Every
    * qualifying pair appears EXACTLY once (a < b, and the probe hits
    * the partner's unique home cell once) — never point×point: the
    * only join is an equi-join on the cell key, candidate count is
    * Σ per-cell |probe|·|build| over 9 neighbor cells.
    *
    * Scale: the cell key is derived map-side; a uniform corpus gives
    * O(density²·area) candidates independent of partitioning — the
    * cost is OUTPUT-bound, and BENCH_SCALE.json measures exactly that
    * (q174 at ×16 density on a fixed area: e ≈ 1.6, the pair count
    * itself growing ~256×). When density can grow unboundedly
    * (ingesting 16× more points over the same geography), set
    * `maxPerCell` > 0: each cell deterministically keeps its
    * `maxPerCell` lowest-id points before pairing, bounding
    * candidates at 9·maxPerCell²/cell at a DOCUMENTED recall cost —
    * the degenerate-density guard, off by default because exact
    * output is the operator's contract. A celebrity cell (everyone
    * at the same landmark) is otherwise an AQE skew-split case, same
    * as any hot join key. `radius` must be > 0; coordinates must be
    * non-negative (floor-div cell assignment — shift negative planes
    * up front).
    *
    * Output: (a, b, d2) with a < b, d2 = squared distance (long). */
  def proximityJoin(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      radius: Long,
      maxPerCell: Int = 0): DataFrame = {
    require(radius > 0, "radius must be positive")
    // `div`, not `/`: Divide on Longs returns DOUBLE (same reasoning
    // as Graph.pageRank's exact splits). The id is NOT cast — `a < b`
    // needs only an orderable type, and casting a string/UUID id to
    // long would NULL it and silently drop every pair.
    val uncapped = points.select(col(idCol).as("__id"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"),
      expr(s"${xCol} div ${radius}L").as("__cx"),
      expr(s"${yCol} div ${radius}L").as("__cy"))
    val base = if (maxPerCell <= 0) uncapped
      else Ranking.groupTopK(uncapped, Seq("__cx", "__cy"),
          Seq(col("__id").as("__id"), col("__x").as("__x"),
            col("__y").as("__y")), maxPerCell)
        .select(col("__id"), col("__x"), col("__y"),
          col("__cx"), col("__cy"))
    val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")))): _*)
    val probe = base
      .select(col("__id").as("a"), col("__x").as("ax"),
        col("__y").as("ay"), col("__cx"), col("__cy"),
        explode(offsets).as("__o"))
      .select(col("a"), col("ax"), col("ay"),
        (col("__cx") + col("__o.dx")).as("cx"),
        (col("__cy") + col("__o.dy")).as("cy"))
    val build = base.select(col("__id").as("b"), col("__x").as("bx"),
      col("__y").as("by"), col("__cx").as("cx"), col("__cy").as("cy"))
    probe.join(build, Seq("cx", "cy"))
      .filter(col("a") < col("b"))
      .withColumn("d2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .filter(col("d2") <= lit(radius * radius))
      .select(col("a"), col("b"), col("d2"))
  }

  /** Nearest neighbor WITHIN `radius` for EVERY point — the bounded-
    * output sibling of [[proximityJoin]] (one row per point, never
    * the full pair fan-out): candidates come from the same 3×3 grid
    * neighborhood, the winner is the (d², id)-lexicographic minimum
    * (integer-exact, deterministic under ties), and a point with no
    * neighbor in range keeps its row with NULL partner — isolation
    * is an answer, not an absence. The 3×3 probe at cell side =
    * radius provably covers every candidate at d ≤ radius, so this
    * is the EXACT 1-NN within the radius, not an approximation; a
    * point's true nearest neighbor beyond `radius` is out of
    * contract (widen the radius or escalate to a coarser grid).
    *
    * Scale: candidate count is the same cell-local product as
    * [[proximityJoin]], but the output is |points| rows and the
    * min-struct aggregate combines map-side — the reduce ships one
    * candidate per (point, partition), not the fan-out.
    * Output: (a, b, d2), b/d2 NULL when nothing is in range. */
  def nnWithinRadius(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      radius: Long): DataFrame = {
    require(radius > 0, "radius must be positive")
    val base = points.select(col(idCol).as("__id"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"),
      expr(s"${xCol} div ${radius}L").as("__cx"),
      expr(s"${yCol} div ${radius}L").as("__cy"))
    val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")))): _*)
    val probe = base
      .select(col("__id").as("a"), col("__x").as("ax"),
        col("__y").as("ay"), col("__cx"), col("__cy"),
        explode(offsets).as("__o"))
      .select(col("a"), col("ax"), col("ay"),
        (col("__cx") + col("__o.dx")).as("cx"),
        (col("__cy") + col("__o.dy")).as("cy"))
    val build = base.select(col("__id").as("b"), col("__x").as("bx"),
      col("__y").as("by"), col("__cx").as("cx"), col("__cy").as("cy"))
    val best = probe.join(build, Seq("cx", "cy"))
      .filter(col("a") =!= col("b"))
      .withColumn("d2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .filter(col("d2") <= lit(radius * radius))
      .groupBy(col("a"))
      .agg(min(struct(col("d2"), col("b"))).as("__w"))
    base.select(col("__id").as("a"))
      .join(best, Seq("a"), "left")
      .select(col("a"), col("__w.b").as("b"), col("__w.d2").as("d2"))
  }

  /** DBSCAN over the [[proximityJoin]] candidate graph — density
    * clustering with the classic sklearn contract: a point is CORE
    * when its eps-ball holds ≥ `minPts` points (ITSELF included —
    * stated, since conventions differ); clusters are the connected
    * components of the core–core eps-graph labeled by MINIMUM core
    * id (deterministic — no scan-order dependence, unlike textbook
    * DBSCAN where a border point joins whichever cluster reached it
    * first); a BORDER point (non-core within eps of ≥ 1 core) joins
    * its smallest core-neighbor's cluster; everything else is
    * NOISE with a NULL cluster. Every verdict is integer arithmetic
    * over the exact pair census — nothing to round anywhere.
    *
    * Scale: one proximityJoin (output-bound, see its scaladoc), a
    * degree census, and [[Dedup.connectedComponents]]'s pointer-
    * jumping min-label propagation over CORE edges only — the
    * eps-graph a dense corpus region induces is exactly the near-dup
    * blob shape that machinery was built for.
    * Output: (id, n_nbrs, role ∈ core|border|noise, cluster). */
  def dbscan(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      eps: Long,
      minPts: Int): DataFrame = {
    require(minPts >= 2, "minPts must be at least 2")
    val pairs = Dedup.truncate(
      proximityJoin(points, idCol, xCol, yCol, eps)
        .select(col("a"), col("b")))
    val deg = pairs.select(col("a").as("__id"))
      .union(pairs.select(col("b").as("__id")))
      .groupBy(col("__id")).agg(count(lit(1)).as("__d"))
    val ann = points.select(col(idCol).as("__id"))
      .join(deg, Seq("__id"), "left")
      .select(col("__id"), coalesce(col("__d"), lit(0L)).as("n_nbrs"))
      .withColumn("__core", col("n_nbrs") + 1L >= minPts.toLong)
    val coreIds = ann.filter(col("__core")).select(col("__id"))
    val coreEdges = pairs
      .join(coreIds.select(col("__id").as("a")), Seq("a"))
      .join(coreIds.select(col("__id").as("b")), Seq("b"))
    val comp = Dedup.connectedComponents(coreEdges, "a", "b")
    val coreLab = coreIds
      .join(comp.select(col("id").as("__id"), col("component")),
        Seq("__id"), "left")
      // A core with no CORE neighbor is its own 1-point cluster.
      .select(col("__id"), coalesce(col("component"), col("__id"))
        .as("__clust"))
    val sym = pairs.select(col("a").as("__nid"), col("b").as("__cid"))
      .union(pairs.select(col("b").as("__nid"), col("a").as("__cid")))
    val borderLab = sym
      .join(coreLab.select(col("__id").as("__cid"),
        col("__clust").as("__cc")), Seq("__cid"))
      .groupBy(col("__nid")).agg(min(col("__cc")).as("__bclust"))
    ann.join(coreLab, Seq("__id"), "left")
      .join(borderLab.select(col("__nid").as("__id"), col("__bclust")),
        Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_nbrs"),
        when(col("__core"), lit("core"))
          .when(col("__bclust").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        when(col("__core"), col("__clust"))
          .otherwise(col("__bclust")).as("cluster"))
  }
}
