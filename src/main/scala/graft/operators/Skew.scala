package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB-scale keys (a handful of
  * devices/days/band-buckets holding a large fraction of rows).
  *
  * AQE's skew-join splitting handles sort-merge joins at runtime;
  * these helpers cover the two cases AQE does not: single hot keys in
  * hash aggregations, and broadcast-ineligible joins against a skewed
  * build side.
  */
object Skew {

  /** Two-stage salted aggregation for algebraic aggregates: partial
    * aggregate on (keys, salt) — spreading a hot key over `salts`
    * reducers — then final aggregate on the keys. The salt derives
    * from a hash of the whole row (no RNG: deterministic re-runs).
    *
    * `partials` map an input column to its salted partial aggregate;
    * `finals` fold the partials (sum of sums, sum of counts, …).
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      salts: Int,
      partials: Seq[(String, Column)],
      finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(df.columns.map(col).toSeq: _*), lit(salts)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  /** Salted count per key — the common hot-key case. */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int = 16): DataFrame =
    saltedAggregate(df, keys, salts,
      partials = Seq("n_part" -> count(lit(1))),
      finals = Seq(sum(col("n_part")).as("n")))

  /** Skewed equi-join: replicate the (small-ish but broadcast-
    * ineligible) right side `salts` times and salt the left side
    * deterministically, so one hot key spreads over `salts` tasks.
    * Semantics = inner equi-join on `key`. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(left.columns.map(col).toSeq: _*), lit(salts)))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** Pinned-width fan-out for an EXPENSIVE map stage over a narrow
    * input: shuffle the cheap side (the rows) so every core works the
    * dear side (tokenize / shingle / hash / decode per row). Two
    * traps this exists to dodge: (1) a small parquet file is ONE
    * input split (single row group), so without a shuffle the whole
    * map stage runs on one thread no matter the cluster; (2) a plain
    * `repartition(cols)` is re-coalesced by AQE right back to one
    * partition when the input bytes are small — the width must be
    * pinned explicitly (AQE honors a user-specified count). On a real
    * many-split table the extra exchange is a row-preserving hash
    * shuffle of the narrow projection — noise next to the map work it
    * parallelizes; callers apply it ONLY where the per-row work is
    * heavy. "Heavy" is MEASURED, not assumed: A/B at sf0.1 showed
    * winnowing's per-start window-min slices −45% and the bootstrap's
    * ×100 md5 explode −85%, while fanning the cheap native
    * whitespace-tokenize paths (BM25, LM counts, gram fractions) LOST
    * 5–60% — their cost lives in the post-shuffle aggregation, and
    * the extra exchange only adds latency. */
  def fanOut(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(
      df.sparkSession.sessionState.conf.numShufflePartitions, keys: _*)
}
