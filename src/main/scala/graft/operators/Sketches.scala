package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable sketches for 100 TB-scale distinct counting and quantile
  * tracking.
  *
  * A HyperLogLog-shaped estimator decomposed into TWO ordinary hash
  * aggregations — (group, bucket) → max(rank), then group → harmonic
  * sum — so it needs no custom Aggregator, parallelizes exactly like
  * any groupBy (map-side partials on both levels), and its state is
  * `m` small integers per group regardless of input size.
  *
  * Unlike the built-in `approx_count_distinct` (whose HLL++ register
  * layout is engine-private), every step here is md5-derived and
  * engine-portable, so the DuckDB oracle reproduces the estimate
  * BIT-EXACTLY: the harmonic sum Σ 2^(-M_j) is carried as the exact
  * integer Σ 2^(MaxRank - M_j), and the only floating-point op is one
  * final divide of two exactly-representable values.
  */
object Sketches {

  /** Number of registers (2^6). Standard error ≈ 1.04/√m ≈ 13%. */
  val M = 64

  /** Ranks are capped by the 54 bits left after the bucket index is
    * taken from the 60-bit hash; rank ∈ [1, MaxRank]. */
  val MaxRank = 55

  /** α_m · m² · 2^MaxRank — the whole estimator numerator folded into
    * one double literal (computed once driver-side, embedded
    * identically in the oracle SQL). */
  val EstimatorNumerator: Double =
    0.7213 / (1.0 + 1.079 / M) * M * M * math.pow(2.0, MaxRank)

  /** Distinct-count estimate of `key` per `groupCols`: two shuffles,
    * both on small keys, constant state per group. Output columns:
    * groupCols*, `n_buckets`, `harmonic_q55` (exact integer
    * Σ 2^(MaxRank−M_j) including absent registers), `estimate`.
    *
    * All divisions on the 60-bit hash are INTEGER div — routing them
    * through `/` (double) would round above 2^53 and corrupt buckets.
    */
  def hllDistinct(df: DataFrame, key: Column, groupCols: Seq[String]): DataFrame =
    hllEstimate(hllRegisters(df, key, groupCols), groupCols)

  /** The sketch STATE: per (group, bucket j) the max rank M_j — `m`
    * small rows per group, mergeable by plain MAX. Registers built
    * from any split of the data and max-merged equal the registers of
    * one pass over the whole — the property that makes the sketch a
    * streaming/MV state ([[graft.streaming.Rollup.hllDistinctSink]])
    * and lets pre-aggregated register tables union across days,
    * sources, or clusters without touching raw data. */
  def hllRegisters(df: DataFrame, key: Column, groupCols: Seq[String])
      : DataFrame = {
    val h = graft.functions.TextFunctions.hash60(key)
    df.select(groupCols.map(col) :+ h.as("_h"): _*)
      .withColumn("j", pmod(col("_h"), lit(M.toLong)))
      .withColumn("_w", expr(s"_h div $M"))
      .withColumn("r", when(col("_w") === 0, lit(MaxRank))
        .otherwise(lit(MaxRank) - length(bin(col("_w")))))
      .groupBy(groupCols.map(col) :+ col("j"): _*)
      .agg(max(col("r")).as("mj"))
  }

  /** Fold a [[hllRegisters]] table into per-group estimates (exact
    * integer harmonic sum, one final divide). */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $MaxRank - mj)")).as("_hsum"))
      // Absent registers have M_j = 0 and contribute 2^MaxRank each.
      .withColumn("harmonic_q55",
        col("_hsum") + (lit(M.toLong) - col("n_buckets")) * lit(1L << MaxRank))
      .withColumn("estimate",
        lit(EstimatorNumerator) / col("harmonic_q55").cast("double"))
      .drop("_hsum")

  // ------------------------------------------------------------------
  // Log-linear histogram quantile sketch (HdrHistogram-shaped).
  //
  // The mergeable-quantile twin of the HLL pair above: the STATE is a
  // plain (group, bucket) → count table — mergeable by SUM, built by
  // one ordinary hash-agg — and the ESTIMATE is a fold over the
  // sketch-sized state. Buckets are integer-only (no ln, no floating
  // boundary), so state and estimates are bit-identical in any engine:
  // values in [0, 16) get exact buckets; values ≥ 16 split each binade
  // [2^e, 2^(e+1)) into 8 equal integer sub-buckets, so a quantile
  // estimate (the bucket's lower bound, always ≤ the true value) has
  // relative error ≤ 1/8. State is ≤ 16 + 8·59 ≈ 488 rows per group
  // REGARDLESS of input size — the property that makes it a streaming
  // MV state ([[graft.streaming.Rollup.quantileSink]]), where the
  // exact [[Ranking.groupQuantiles]] (a rank over all history) cannot
  // be incrementally maintained.
  // ------------------------------------------------------------------

  /** Bucket index (int ∈ [0, ~488)) of a non-negative long value.
    * Negative values raise — a silent clamp would corrupt the
    * distribution unnoticed. */
  def lhBucketIdx(v: Column): Column = {
    val e = (length(bin(v)) - 1).cast("int")
    val sub = (call_function("shiftright", v, e - lit(3)) - 8L).cast("int")
    when(v < 0L, raise_error(concat(
        lit("lhBuckets: negative value "), v.cast("string"))))
      .when(v < 16L, v.cast("int"))
      .otherwise(lit(16) + (e - lit(4)) * lit(8) + sub)
  }

  /** Lower bound of bucket `idx` — the deterministic representative a
    * quantile estimate returns (always ≤ the true quantile, within
    * 12.5% relative). */
  def lhBucketLo(idx: Column): Column = {
    val eMinus3 = ((idx - lit(16)) / lit(8)).cast("int") + lit(1)
    val sub = pmod(idx - lit(16), lit(8))
    when(idx < 16, idx.cast("long"))
      .otherwise(call_function("shiftleft", (lit(8) + sub).cast("long"),
        eMinus3))
  }

  /** Inclusive upper bound of bucket `idx` — the bar to use when
    * GATING on a sketch quantile: everything the sketch cannot
    * distinguish from the quantile value passes together (a
    * lower-bound bar would reject the very value that defined the
    * quantile). */
  def lhBucketHi(idx: Column): Column = lhBucketLo(idx + lit(1)) - lit(1L)

  /** The sketch STATE: per (group, bucket) the value count — one
    * map-side-combinable hash-agg, ≤ ~488 rows per group. States from
    * any split of the data sum-merge into the state of one pass over
    * the whole (spec-verified), so pre-bucketed tables union across
    * days/sources/batches without re-reading raw data. NULL values are
    * excluded (the SQL percentile stance, as [[Ranking
    * .groupQuantiles]]). */
  def lhBuckets(df: DataFrame, value: Column, groupCols: Seq[String])
      : DataFrame =
    df.filter(value.isNotNull)
      .select(groupCols.map(col) :+ lhBucketIdx(value).as("idx"): _*)
      .groupBy(groupCols.map(col) :+ col("idx"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Fold a [[lhBuckets]] state into per-group quantile estimates: for
    * each q, the lower bound of the first bucket whose cumulative
    * count reaches ⌈q·n⌉ — the sketch analogue of [[Ranking
    * .groupQuantiles]]' type-1 selection, integer-exact end to end.
    *
    * The window here runs over SKETCH rows (≤ ~488 per group), not
    * data rows — bounded state, same class as [[hllEstimate]]'s fold.
    * Output: (group*, q, n, value). */
  def lhQuantiles(state: DataFrame, groupCols: Seq[String], qs: Seq[Double])
      : DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "qs must be in (0, 1]")
    val gs = groupCols.map(col)
    val w = Window.partitionBy(gs: _*).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = state.withColumn("__cum", sum(col("cnt")).over(w))
    val targets = state.groupBy(gs: _*).agg(sum(col("cnt")).as("__n"))
      .select(groupCols.map(c => col(c).as(s"__t_$c")) :+
        explode(array(qs.map(lit): _*)).as("q") :+ col("__n"): _*)
      .withColumn("__target", ceil(col("q") * col("__n")).cast("long"))
    // Empty groupCols = one global sketch: the 1-row target table
    // attaches to every bucket row (both sides are sketch-sized).
    val cond = groupCols.map(c => col(c) <=> col(s"__t_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    cum.join(broadcast(targets), cond)
      .filter(col("__cum") >= col("__target"))
      .groupBy(gs :+ col("q"): _*)
      .agg(max(col("__n")).as("n"), min(lhBucketLo(col("idx"))).as("value"))
  }

  /** One-call quantile estimate: bucket then fold. */
  def lhQuantileEstimate(
      df: DataFrame,
      value: Column,
      groupCols: Seq[String],
      qs: Seq[Double]): DataFrame =
    lhQuantiles(lhBuckets(df, value, groupCols), groupCols, qs)

  /** The oracle twin of [[lhQuantileEstimate]], kept NEXT to the Spark
    * plan so the two can never drift. `valueSql` must be a BIGINT
    * expression; NULLs are excluded as on the Spark side. */
  def lhQuantilesSql(
      table: String,
      valueSql: String,
      groupCols: Seq[String],
      qs: Seq[Double]): String = {
    val g = groupCols.mkString(", ")
    val qList = qs.mkString(", ")
    s"""WITH vals AS (
       |  SELECT $g, $valueSql AS v FROM $table),
       |bk AS (
       |  SELECT $g,
       |    CASE WHEN v < 16 THEN CAST(v AS INT)
       |         ELSE CAST(16 + (length(bin(v)) - 5) * 8
       |              + ((v >> (length(bin(v)) - 4)) - 8) AS INT) END AS idx
       |  FROM vals WHERE v IS NOT NULL),
       |st AS (SELECT $g, idx, count(*) AS cnt FROM bk GROUP BY $g, idx),
       |cu AS (
       |  SELECT $g, idx, cnt,
       |    sum(cnt) OVER (PARTITION BY $g ORDER BY idx
       |      ROWS UNBOUNDED PRECEDING) AS cum,
       |    sum(cnt) OVER (PARTITION BY $g) AS n
       |  FROM st)
       |SELECT $g, q.q AS q, CAST(max(n) AS BIGINT) AS n,
       |  CAST(min(CASE WHEN idx < 16 THEN idx
       |    ELSE (8 + (idx - 16) % 8) << ((idx - 16) // 8 + 1) END)
       |    AS BIGINT) AS value
       |FROM cu, (SELECT CAST(unnest([$qList]) AS DOUBLE) AS q) q
       |WHERE cum >= CAST(ceil(q.q * n) AS BIGINT)
       |GROUP BY $g, q.q""".stripMargin
  }

  // ------------------------------------------------------------------
  // Count-min frequency sketch.
  //
  // Completes the mergeable-sketch family (HLL = how many distinct,
  // log-histogram = how distributed, count-min = how often): the state
  // is (group, row j, bucket) → count — `depth × width` small rows per
  // group regardless of key cardinality, built by one hash-agg,
  // mergeable by SUM — and a point estimate is min over the j rows of
  // the counters the key hashes into (Cormode & Muthukrishnan 2005).
  // Estimates only ever OVER-count (collisions add, never subtract),
  // by ≤ 2·n/width with probability 1 − 2^−depth. All hashing is
  // md5-derived, so state and estimates are bit-identical in DuckDB.
  // ------------------------------------------------------------------

  /** Counter rows per hash function. 2^−4 failure odds per estimate. */
  val CmDepth = 4

  /** Buckets per row: over-count ≤ 2·total/width w.h.p. */
  val CmWidth = 1024

  /** The sketch STATE: per (group, j, bucket) the number of key
    * OCCURRENCES hashing there — `CmDepth` rows per input row into a
    * map-side-combinable hash-agg on a (depth×width)-bounded key
    * domain. Sum-merge states across any split of the data (batches,
    * days, sources) and the merged state equals one pass over the
    * whole. */
  def cmRegisters(df: DataFrame, key: Column, groupCols: Seq[String])
      : DataFrame =
    df.select(groupCols.map(col) :+ key.as("__k"): _*)
      .select(groupCols.map(col) :+ col("__k") :+
        explode(array((0 until CmDepth).map(j => lit(j)): _*)).as("j"): _*)
      .withColumn("b", pmod(graft.functions.TextFunctions.hash60(
        concat_ws("", col("j"), col("__k"))), lit(CmWidth.toLong))
        .cast("int"))
      .groupBy(groupCols.map(col) ++ Seq(col("j"), col("b")): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate the occurrence count of every key in `keys`
    * (columns: groupCols ++ [keyCol]) from a [[cmRegisters]] state:
    * min over the `CmDepth` counters the key hashes into. A key the
    * state never saw estimates 0 (its buckets may be absent — LEFT
    * join, coalesce). Output: keys' columns + `cm_est` (long). */
  def cmEstimate(
      state: DataFrame,
      keys: DataFrame,
      keyCol: String,
      groupCols: Seq[String]): DataFrame = {
    val probes = keys
      .select(groupCols.map(col) :+ col(keyCol) :+
        explode(array((0 until CmDepth).map(j => lit(j)): _*)).as("j"): _*)
      .withColumn("b", pmod(graft.functions.TextFunctions.hash60(
        concat_ws("", col("j"), col(keyCol))), lit(CmWidth.toLong))
        .cast("int"))
    probes.join(state, groupCols ++ Seq("j", "b"), "left")
      .groupBy(groupCols.map(col) :+ col(keyCol): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }

  /** The oracle twin of [[cmRegisters]] → [[cmEstimate]] as one
    * query, parameterized on the rows' source (`fromSql` must yield
    * groupCols ++ [k VARCHAR] occurrence rows) and the probe keys
    * (`keysSql` must yield groupCols ++ [k VARCHAR]; it may reference
    * the `occ` CTE). Kept NEXT to the Spark plan so the hash layout
    * (`md5(j || k)`, 60-bit, mod width) can never drift. */
  def cmEstimateSql(
      fromSql: String,
      keysSql: String,
      groupCols: Seq[String]): String = {
    val gSelC = groupCols.map(c => s"o.$c, ").mkString
    val gColsC = groupCols.map(c => s"$c, ").mkString
    val prGC = groupCols.map(c => s"pr.$c, ").mkString
    val joinOn = (groupCols.map(c => s"st.$c = pr.$c") ++
      Seq("st.j = pr.j", "st.b = pr.b")).mkString(" AND ")
    val js = (0 until CmDepth).mkString(", ")
    s"""WITH occ AS ($fromSql),
       |reg AS (
       |  SELECT ${gSelC}j.j AS j,
       |    CAST(CAST(('0x' || substr(md5(j.j || o.k), 1, 15)) AS BIGINT)
       |      % $CmWidth AS INT) AS b
       |  FROM occ o, (SELECT CAST(unnest([$js]) AS VARCHAR) AS j) j),
       |st AS (
       |  SELECT ${gColsC}j, b, count(*) AS cnt
       |  FROM reg GROUP BY ${gColsC}j, b),
       |keys AS ($keysSql),
       |pr AS (
       |  SELECT ${gSelC}o.k AS k, j.j AS j,
       |    CAST(CAST(('0x' || substr(md5(j.j || o.k), 1, 15)) AS BIGINT)
       |      % $CmWidth AS INT) AS b
       |  FROM keys o, (SELECT CAST(unnest([$js]) AS VARCHAR) AS j) j)
       |SELECT ${prGC}pr.k,
       |  CAST(min(coalesce(st.cnt, 0)) AS BIGINT) AS cm_est
       |FROM pr LEFT JOIN st ON $joinOn
       |GROUP BY ${prGC}pr.k""".stripMargin
  }

  /** The oracle twin of [[hllDistinct]], parameterized on the source
    * table and key SQL — kept NEXT to the Spark plan so the two can
    * never drift silently. `keySql` must be a VARCHAR expression. */
  def hllDistinctSql(table: String, keySql: String, groupCols: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    s"""WITH hashed AS (
       |  SELECT $g,
       |         CAST(('0x' || substr(md5($keySql), 1, 15)) AS BIGINT) AS h
       |  FROM $table),
       |br AS (
       |  SELECT $g, h % $M AS j,
       |         CASE WHEN h // $M = 0 THEN $MaxRank
       |              ELSE $MaxRank - length(bin(h // $M)) END AS r
       |  FROM hashed),
       |regs AS (SELECT $g, j, max(r) AS mj FROM br GROUP BY $g, j),
       |agg AS (
       |  SELECT $g, count(*) AS n_buckets,
       |         CAST(sum(CAST(1 AS BIGINT) << ($MaxRank - mj)) AS BIGINT) AS hsum
       |  FROM regs GROUP BY $g)
       |SELECT $g, CAST(n_buckets AS BIGINT) AS n_buckets,
       |       CAST(hsum + ($M - n_buckets) * (CAST(1 AS BIGINT) << $MaxRank) AS BIGINT) AS harmonic_q55,
       |       $EstimatorNumerator / CAST(hsum + ($M - n_buckets) * (CAST(1 AS BIGINT) << $MaxRank) AS DOUBLE) AS estimate
       |FROM agg""".stripMargin
  }
}
