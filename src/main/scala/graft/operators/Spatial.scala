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
}
