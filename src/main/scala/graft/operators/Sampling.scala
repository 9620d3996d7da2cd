package graft.operators

import graft.functions.TextFunctions.hash60
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines.
  *
  * Everything keys off a content-stable md5 hash bucket, NOT an RNG:
  * `rand()`-based sampling changes membership on every retry, executor
  * failure, or engine change, which silently leaks val/test rows into
  * training reruns. Hash-bucket membership is a pure per-row map —
  * reproducible anywhere, joinable later ("which split was this doc
  * in?" is recomputable), and prunable at the scan when the bucket is
  * materialized as a partition column.
  */
object Sampling {

  /** Stable bucket in [0, nBuckets) from the row key. */
  def hashBucket(key: Column, nBuckets: Int): Column =
    pmod(hash60(key.cast("string")), lit(nBuckets.toLong))

  /** Keep ~`permille`/1000 of rows, deterministically by key. */
  def hashSample(df: DataFrame, key: Column, permille: Int): DataFrame =
    df.filter(hashBucket(key, 1000) < permille)

  /** Assign each row to train/val/test by hash bucket: bucket <
    * trainPct → train, < trainPct+valPct → val, else test. Percent
    * bounds are over 100 buckets. */
  def assignSplit(
      df: DataFrame,
      key: Column,
      trainPct: Int,
      valPct: Int,
      splitCol: String = "split"): DataFrame = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val b = hashBucket(key, 100)
    df.withColumn(splitCol,
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }
}
