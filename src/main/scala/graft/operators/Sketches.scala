package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches for 100 TB-scale distinct counting.
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
