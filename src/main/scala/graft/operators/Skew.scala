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
}
