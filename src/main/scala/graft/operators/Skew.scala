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

  /** Key-skew diagnostic — the census to run BEFORE a join or
    * aggregation on `keyCol` to decide whether [[saltedAggregate]] /
    * [[saltedJoin]] are worth their salt: row and distinct-key
    * counts, the hottest key's count and share, and the salt factor
    * that hot key needs to spread evenly over `parts` reducers —
    * ⌈max_count·parts/n⌉, pure integer ceil (1 = no salting needed:
    * the hot key already fits one average reducer's share). The
    * hottest key reports deterministically (ties break to the
    * LARGEST key rendering via a max on (count, key) — total order,
    * engine-neutral). NULL keys are a skew class of their own and
    * are counted separately, not mixed into the hot-key race.
    * Output: one row — (n_rows, n_null_keys, n_keys, top_key,
    * top_count, top_share_micro, suggested_salts). */
  def keySkew(
      df: DataFrame,
      keyCol: String,
      parts: Int): DataFrame = {
    require(parts >= 1 && parts <= 100000, "parts must be in [1, 1e5]")
    val counts = df.groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("__c"))
    counts.agg(
        sum(col("__c")).as("n_rows"),
        sum(when(col("__k").isNull, col("__c")).otherwise(0L))
          .as("n_null_keys"),
        count(when(col("__k").isNotNull, lit(1))).as("n_keys"),
        max(when(col("__k").isNotNull,
          struct(col("__c").as("c"), col("__k").as("k")))).as("__top"))
      .select(col("n_rows"), col("n_null_keys"), col("n_keys"),
        col("__top.k").as("top_key"), col("__top.c").as("top_count"),
        when(col("n_rows") > 0L,
          round(lit(1e6) * col("__top.c").cast("double") /
            col("n_rows").cast("double")).cast("long"))
          .otherwise(lit(null).cast("long")).as("top_share_micro"),
        when(col("n_rows") > 0L,
          greatest(lit(1L),
            expr(s"(__top.c * ${parts}L + n_rows - 1) div n_rows")))
          .otherwise(lit(null).cast("long")).as("suggested_salts"))
  }
}
