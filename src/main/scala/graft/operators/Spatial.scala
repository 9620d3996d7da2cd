package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    // Each unordered cell pair is enumerated ONCE via the four
    // positive-direction offsets (plus (0,0) for in-cell pairs,
    // deduped by id order) — half the candidate volume of the naive
    // 9-offset probe, same output set (r18, guide §2.3: the a < b
    // filter after a 9-way explode threw away half the joined rows).
    val offsets = array(Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (1L, -1L)).map { case (dx, dy) =>
        struct(lit(dx).as("dx"), lit(dy).as("dy")) }: _*)
    val probe = base
      .select(col("__id").as("a"), col("__x").as("ax"),
        col("__y").as("ay"), col("__cx"), col("__cy"),
        explode(offsets).as("__o"))
      .select(col("a"), col("ax"), col("ay"),
        (col("__o.dx") =!= 0L || col("__o.dy") =!= 0L).as("__cross"),
        (col("__cx") + col("__o.dx")).as("cx"),
        (col("__cy") + col("__o.dy")).as("cy"))
    val build = base.select(col("__id").as("b"), col("__x").as("bx"),
      col("__y").as("by"), col("__cx").as("cx"), col("__cy").as("cy"))
    probe.join(build, Seq("cx", "cy"))
      // Cross-cell pairs must still exclude NULL and duplicate ids —
      // the old 9-offset form's `a < b` dropped both (NULL compares
      // to null; equal ids fail strict <), and least/greatest would
      // otherwise manufacture (b, b) self-pairs from them.
      .filter((col("__cross") && col("a") =!= col("b")) ||
        col("a") < col("b"))
      .withColumn("d2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .filter(col("d2") <= lit(radius * radius))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"), col("d2"))
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

  /** The quadkey COLUMN by input column NAME — the map-side key
    * [[quadkeyCensus]] censuses and a streaming heatmap sink keys
    * its rollup on (same base-4 digit construction; see
    * quadkeyCensus for semantics). Integer arithmetic only. */
  def quadkeyCol(
      xName: String, yName: String, extent: Long, levels: Int)
      : Column = {
    require(levels >= 1 && levels <= 16, "levels must be in [1, 16]")
    require(extent > 0, "extent must be positive")
    val side = 1L << levels
    val cx = expr(s"least(${side - 1}L, " +
      s"(CAST($xName AS BIGINT) * ${side}L) div ${extent}L)")
    val cy = expr(s"least(${side - 1}L, " +
      s"(CAST($yName AS BIGINT) * ${side}L) div ${extent}L)")
    val digits = (0 until levels).map { k =>
      val sh = levels - 1 - k
      ((shiftright(cy, sh) % 2L) * 2L + shiftright(cx, sh) % 2L)
        .cast("string")
    }
    concat(digits: _*)
  }

  /** Quadkey tile census with one prefix rollup — the Bing-maps
    * Z-order bucketing that turns "points near each other" into
    * "rows sharing a string prefix": coordinates in [0, extent)
    * quantize to a 2^levels grid, each cell keys by the base-4
    * digit string d_k = 2·bit_k(y) + bit_k(x) (most-significant
    * first — a tile's quadkey is its parent's quadkey plus one
    * digit, which is what makes prefix rollups work), and the
    * census emits every non-empty tile at `levels` PLUS its
    * `levels−2` parent (16× coarser) aggregated FROM THE CENSUS —
    * the rollup never rescans points, which is the whole scale
    * argument for hierarchical tiling. Pure integer bit arithmetic
    * map-side; two hash-aggs total.
    * Output: (zoom, quadkey, n_points), zoom ∈ {levels, levels−2}. */
  def quadkeyCensus(
      points: DataFrame,
      xCol: String,
      yCol: String,
      extent: Long,
      levels: Int): DataFrame = {
    require(levels >= 3 && levels <= 16, "levels must be in [3, 16]")
    require(extent > 0, "extent must be positive")
    val leaf = points
      .select(quadkeyCol(xCol, yCol, extent, levels).as("quadkey"))
      .groupBy(col("quadkey"))
      .agg(count(lit(1)).as("n_points"))
    val parent = leaf
      .groupBy(substring(col("quadkey"), 1, levels - 2).as("quadkey"))
      .agg(sum(col("n_points")).as("n_points"))
    leaf.select(lit(levels).as("zoom"), col("quadkey"),
        col("n_points"))
      .unionByName(parent.select(lit(levels - 2).as("zoom"),
        col("quadkey"), col("n_points")))
  }

  /** Moran's I spatial autocorrelation over the occupied tiles of a
    * 2^levels grid — "is my crawl/event density CLUMPED, dispersed,
    * or random across space", the one-number diagnostic read before
    * trusting any per-region statistic (clumping means region
    * samples are not independent). Rook adjacency (share an edge)
    * between NON-EMPTY tiles, binary weights; with G tiles, total
    * count S and the G-scaled deviation z'ᵢ = G·nᵢ − S, the G²
    * factors cancel and
    *
    *   I = G·Σ_adj z'ᵢz'ⱼ / (ΣW·Σz'ᵢ²)
    *
    * is EXACT integers into one micro-rounded divide — no mean, no
    * float deviations anywhere. E[I] = −1/(G−1) rides along (the
    * null is not zero at small G). Zero-variance (all tiles equal)
    * or ΣW = 0 (no adjacent occupied tiles) reports NULL. Empty
    * tiles are NOT zeros in this formulation — the lattice is the
    * OCCUPIED set (stated; include a spine upstream if the full
    * rectangle is the intended universe).
    *
    * Scale: one tile census, a 2-offset equi-join on cell keys
    * (census-sized), two scalar aggregates.
    * Output: one row (n_cells, sum_w, i_micro, e_i_micro). */
  def moransI(
      points: DataFrame,
      xCol: String,
      yCol: String,
      extent: Long,
      levels: Int): DataFrame = {
    require(levels >= 2 && levels <= 16, "levels must be in [2, 16]")
    require(extent > 0, "extent must be positive")
    val dec = "decimal(38,0)"
    val side = 1L << levels
    val cells = points
      .select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .select(
        expr(s"least(${side - 1}L, (__x * ${side}L) div ${extent}L)")
          .as("cx"),
        expr(s"least(${side - 1}L, (__y * ${side}L) div ${extent}L)")
          .as("cy"))
      .groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("n"))
    val tot = cells.agg(count(lit(1)).as("g"),
      sum(col("n")).as("s"),
      sum((col("n").cast(dec) * col("n")).cast(dec)).as("q"))
    // Ordered rook pairs via the two positive offsets, both
    // directions summed by doubling (w is symmetric).
    val right = cells.select((col("cx") + 1L).as("cx"), col("cy"),
      col("n").as("nb"))
    val down = cells.select(col("cx"), (col("cy") + 1L).as("cy"),
      col("n").as("nb"))
    val adj = cells.join(right.unionByName(down), Seq("cx", "cy"))
      .agg(count(lit(1)).as("__np"),
        sum((col("n").cast(dec) * col("nb")).cast(dec)).as("__pnn"),
        sum((col("n") + col("nb")).cast(dec)).as("__pt"))
    // Expanding z'ᵢ = G·nᵢ − S over the pair and variance sums:
    //   num = G²·Σnn − G·S·T + P·S²,  den = P·(G·q − S²)
    // (the ordered-pair doubling cancels top and bottom).
    val num = (col("g").cast(dec) * col("g") * col("__pnn") -
      col("g").cast(dec) * col("s") * col("__pt") +
      col("__np").cast(dec) * col("s") * col("s")).cast(dec)
    val den = (col("__np").cast(dec) *
      (col("g") * col("q") - col("s").cast(dec) * col("s"))).cast(dec)
    tot.crossJoin(adj)
      .select(col("g").as("n_cells"),
        (lit(2L) * col("__np")).as("sum_w"),
        when(den > 0,
          round(lit(1e6) * num.cast("double") / den.cast("double"))
            .cast("long"))
          .otherwise(lit(null).cast("long")).as("i_micro"),
        when(col("g") > 1L,
          round(lit(-1e6) / (col("g") - 1L).cast("double"))
            .cast("long")).otherwise(lit(null).cast("long"))
          .as("e_i_micro"))
  }

  /** Geary's C over the occupied tiles — [[moransI]]'s LOCAL
    * counterpart (Moran covaries against the global mean and sees
    * broad gradients; Geary squares the difference across each edge
    * and sees local roughness — reading both separates "smooth
    * regional trend" from "salt-and-pepper noise"). Rook adjacency,
    * binary weights; with Σd² the exact sum of (nᵢ−nⱼ)² over
    * unordered adjacent pairs,
    *
    *   C = G·(G−1)·Σd² / (2P·(G·q − S²)),
    *
    * exact integers into one micro-rounded divide (same
    * cancellation as Moran's — no mean, no float deviations).
    * E[C] = 1 under no autocorrelation; C < 1 = clustering, C > 1 =
    * dispersion. Same occupied-lattice contract and NULL guards as
    * [[moransI]]. Output: one row (n_cells, sum_w, c_micro). */
  def gearysC(
      points: DataFrame,
      xCol: String,
      yCol: String,
      extent: Long,
      levels: Int): DataFrame = {
    require(levels >= 2 && levels <= 16, "levels must be in [2, 16]")
    require(extent > 0, "extent must be positive")
    val dec = "decimal(38,0)"
    val side = 1L << levels
    val cells = points
      .select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .select(
        expr(s"least(${side - 1}L, (__x * ${side}L) div ${extent}L)")
          .as("cx"),
        expr(s"least(${side - 1}L, (__y * ${side}L) div ${extent}L)")
          .as("cy"))
      .groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("n"))
    val tot = cells.agg(count(lit(1)).as("g"),
      sum(col("n")).as("s"),
      sum((col("n").cast(dec) * col("n")).cast(dec)).as("q"))
    val right = cells.select((col("cx") + 1L).as("cx"), col("cy"),
      col("n").as("nb"))
    val down = cells.select(col("cx"), (col("cy") + 1L).as("cy"),
      col("n").as("nb"))
    val adj = cells.join(right.unionByName(down), Seq("cx", "cy"))
      .agg(count(lit(1)).as("__np"),
        sum(((col("n") - col("nb")).cast(dec) *
          (col("n") - col("nb"))).cast(dec)).as("__pd2"))
    val num = (col("g").cast(dec) * (col("g") - 1L) * col("__pd2"))
      .cast(dec)
    val den = (lit(2L) * col("__np").cast(dec) *
      (col("g") * col("q") - col("s").cast(dec) * col("s"))).cast(dec)
    tot.crossJoin(adj)
      .select(col("g").as("n_cells"),
        (lit(2L) * col("__np")).as("sum_w"),
        when(den > 0,
          round(lit(1e6) * num.cast("double") / den.cast("double"))
            .cast("long"))
          .otherwise(lit(null).cast("long")).as("c_micro"))
  }

  /** DBSCAN over the [[proximityJoin]] candidate graph — density
    * clustering with the classic sklearn contract: a point is CORE
    * when its eps-ball holds ≥ `minPts` points (ITSELF included —
    * stated, since conventions differ); clusters are the connected
    * components of the core–core eps-graph labeled by MINIMUM core
    * id (deterministic — no scan-order dependence, unlike textbook
    * DBSCAN where a border point joins whichever cluster reached it
    * first); a BORDER point (non-core within eps of ≥ 1 core) takes
    * the MINIMUM CLUSTER LABEL among its core neighbors (not the
    * smallest neighbor id — the two differ when the smallest-id core
    * neighbor sits in a higher-labeled cluster); everything else is
    * NOISE with a NULL cluster. Every verdict is integer arithmetic
    * over the exact pair census — nothing to round anywhere.
    *
    * Scale: one proximityJoin (output-bound, see its scaladoc), a
    * degree census, and GRID-PARTITIONED component labeling built
    * for the super-percolation regime (mean degree ≳ 4.5, where the
    * point cloud fuses ONE giant core component): core edges whose
    * endpoints share a COARSE grid cell (side gridFactor·eps — wide
    * enough that a cell holds real structure, not 2 points) are
    * clustered locally by a per-cell union-find (one mapPartitions
    * pass after a cell-keyed repartition — linear in the edge
    * census, zero rounds), and only the BOUNDARY graph — cross-cell
    * core edges rewritten onto their endpoints' local piece labels —
    * enters [[Dedup.connectedComponents]]'s pointer-jumping
    * min-label fixpoint. Above percolation each coarse cell fuses to
    * ~ONE local piece, so the fixpoint sees roughly the cell
    * ADJACENCY graph (vertices ~ cells, hop diameter ~ grid width /
    * gridFactor), independent of density — densifying a fixed
    * geography 16× grows only the linear local pass, not the round
    * count. Labels are identical to whole-graph min-id CC: each
    * local piece's label is its min core id, and the boundary
    * fixpoint takes the min over exactly the pieces a component
    * fuses. A hot cell (everyone at one landmark) concentrates its
    * union-find on one task — the same degeneracy proximityJoin's
    * `maxPerCell` guard already bounds upstream.
    * Output: (id, n_nbrs, role ∈ core|border|noise, cluster). */
  def dbscan(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      eps: Long,
      minPts: Int,
      maxIter: Int = 60,
      gridFactor: Int = 16,
      maxPerCell: Int = 0): DataFrame = {
    require(gridFactor >= 1, "gridFactor must be at least 1")
    require(minPts >= 2, "minPts must be at least 2")
    // `maxPerCell` > 0 passes [[proximityJoin]]'s degenerate-density
    // guard through: each eps-cell keeps its maxPerCell lowest-id
    // points before pairing, bounding the eps-graph census at
    // 9·maxPerCell²/cell when a fixed geography densifies without
    // bound. APPROXIMATE under the cap (degrees undercount, so core
    // verdicts can demote and clusters can split at capped cells) —
    // off by default because the exact eps-graph is the DBSCAN
    // contract; the exact census is output-bound by construction
    // (time tracks the pair count, BENCH_SCALE's declared census).
    val pairs = Dedup.truncate(
      proximityJoin(points, idCol, xCol, yCol, eps, maxPerCell)
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
    // Grid-partitioned labeling (see scaladoc): a percolating cloud
    // (mean degree past ~4.5) fuses ONE giant core component whose
    // whole-graph min-label fixpoint needs ≫20 rounds each touching
    // every edge (empirical: sf0.1's 100k points at mean degree ~8);
    // clustering each cell locally first leaves the fixpoint a
    // boundary graph whose size and hop diameter track the GRID, not
    // the density. The union-find grid is COARSER than the pairing
    // grid by `gridFactor` (side gridFactor·eps): at eps-sized cells
    // a sparse cloud holds ~2 points per cell, local pieces are
    // single edges, and the "boundary" graph IS the whole graph —
    // the decomposition only pays when a cell holds enough points
    // for its local structure to collapse (a percolating coarse cell
    // fuses to ~ONE piece, so the fixpoint sees ~one vertex per
    // cell). Labels are grid-invariant (min-id components), so the
    // factor is pure performance tuning.
    val side = eps * gridFactor.toLong
    val cells = points.select(col(idCol).as("__id"),
      expr(s"$xCol div ${side}L").as("__cx"),
      expr(s"$yCol div ${side}L").as("__cy"))
    val comp = gridMinLabelComponents(
      coreEdges, coreIds.join(cells, Seq("__id")), maxIter)
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

  /** Min-id connected components of the core–core eps-graph,
    * grid-partitioned ([[dbscan]]'s labeling engine — see its
    * scaladoc for the scale argument). Identical output contract to
    * [[Dedup.connectedComponents]] — (id, component), component =
    * MINIMUM id in the component under the id column's native
    * ordering — reached in three density-robust steps: (1) edges
    * whose endpoints share an eps-cell are union-found per cell in
    * one mapPartitions pass (roots kept minimal by always attaching
    * the larger root under the smaller — native ordering via the
    * boxed value's Comparable, which is exactly the column order for
    * long/int/string/timestamp ids), (2) cross-cell edges are
    * rewritten onto their endpoints' local piece labels (distinct
    * pieces have distinct min ids, so no self-loops survive), and
    * (3) only that boundary graph enters the pointer-jumping
    * fixpoint. Covers every id in `coreCells`; a core with no core
    * edge labels itself. */
  private def gridMinLabelComponents(
      coreEdges: DataFrame,
      coreCells: DataFrame,
      maxIter: Int): DataFrame = {
    val spark = coreEdges.sparkSession
    val idType = coreEdges.schema("a").dataType
    val tagged = coreEdges
      .join(coreCells.select(col("__id").as("a"),
        col("__cx").as("__acx"), col("__cy").as("__acy")), Seq("a"))
      .join(coreCells.select(col("__id").as("b"),
        col("__cx").as("__bcx"), col("__cy").as("__bcy")), Seq("b"))
    val sameCell = col("__acx") === col("__bcx") &&
      col("__acy") === col("__bcy")
    val intra = tagged.filter(sameCell)
      .repartition(col("__acx"), col("__acy"))
      .select(col("a"), col("b"))
    val localRdd = intra.rdd.mapPartitions { rows =>
      val parent = new java.util.HashMap[Any, Any]()
      def find(x: Any): Any = {
        if (!parent.containsKey(x)) { parent.put(x, x); x }
        else {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          var c = x
          while (parent.get(c) != r) {
            val n = parent.get(c); parent.put(c, r); c = n
          }
          r
        }
      }
      rows.foreach { row =>
        val ra = find(row.get(0))
        val rb = find(row.get(1))
        if (ra != rb) {
          if (ra.asInstanceOf[Comparable[Any]].compareTo(rb) <= 0)
            parent.put(rb, ra)
          else parent.put(ra, rb)
        }
      }
      val out = Vector.newBuilder[org.apache.spark.sql.Row]
      parent.keySet().toArray.foreach(k =>
        out += org.apache.spark.sql.Row(k, find(k)))
      out.result().iterator
    }
    val local = Dedup.truncate(spark.createDataFrame(localRdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__lid", idType),
        org.apache.spark.sql.types.StructField("__lab", idType)))))
    val bEdges = tagged.filter(!sameCell).select(col("a"), col("b"))
      .join(local.select(col("__lid").as("a"), col("__lab").as("__la")),
        Seq("a"), "left")
      .join(local.select(col("__lid").as("b"), col("__lab").as("__lb")),
        Seq("b"), "left")
      .select(coalesce(col("__la"), col("a")).as("la"),
        coalesce(col("__lb"), col("b")).as("lb"))
    // [[Dedup.connectedComponents]] dedups the boundary graph and —
    // since r18 — runs a size-guarded driver union-find when the
    // deduplicated graph is small (the measured q358 case: a few
    // thousand piece-label edges paying ~5 jobs per pointer-jump
    // round), falling back to the distributed fixpoint above the cap.
    val boundary = Dedup.connectedComponents(bEdges, "la", "lb", maxIter)
    coreCells.select(col("__id"))
      .join(local.select(col("__lid").as("__id"), col("__lab")),
        Seq("__id"), "left")
      .select(col("__id"),
        coalesce(col("__lab"), col("__id")).as("__loc"))
      .join(boundary.select(col("id").as("__loc"), col("component")),
        Seq("__loc"), "left")
      .select(col("__id").as("id"),
        coalesce(col("component"), col("__loc")).as("component"))
  }
}
