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

  /** Exact k rows per key, deterministically — the reproducible twin
    * of per-key reservoir sampling: rank each key's rows by
    * (md5(key:id), id) and keep the first k. Hash order is
    * content-stable, so the "reservoir" is identical on every rerun,
    * engine, and partitioning (an actual reservoir sample depends on
    * arrival order — exactly what a distributed rerun cannot
    * promise), and approximately uniform over the key's rows (md5
    * avalanche). Distinct from [[hashSample]]: that keeps a FRACTION
    * per hash bucket; this keeps an exact COUNT per key — the "n
    * exemplar docs per source / per domain / per cluster" shape.
    *
    * Scale: [[Ranking.groupTopK]] underneath — agg state is k
    * structs per key however large the key's row count; no window,
    * no whole-key concentration. `idCol` must be per-key unique (it
    * is the tiebreaker). Output: (key, rank, h, id). */
  def uniformPerKey(
      df: DataFrame, keyCol: String, idCol: String, k: Int): DataFrame =
    Ranking.groupTopK(
      df.select(col(keyCol), col(idCol)).withColumn("__h",
        md5(concat_ws(":", col(keyCol), col(idCol)))),
      Seq(keyCol), Seq(col("__h").as("h"), col(idCol)), k)

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

  /** Deterministic weighted sampling without replacement, per group
    * (Efraimidis–Spirakis A-ES): each row draws the pseudo-uniform
    * u = (hash60(id)+1)/2^60 ∈ (0, 1] from its CONTENT (no RNG — same
    * reproducibility stance as everything above) and scores
    * key = ln(u)/w; the k LARGEST keys win, which samples without
    * replacement with probability proportional to weight.
    *
    * Cross-engine determinism with full resolution: only ln(u) — the
    * one libm-dependent step — is quantized, to integer micro-nats;
    * the sort key is then the EXACT IEEE quotient lnq/w (division is
    * correctly rounded, so it is bit-identical in any IEEE-754 engine
    * given identical lnq and w). Quantizing the quotient instead
    * (round(1e6·ln(u)/w)) would collapse every heavy-weight row onto
    * the same integer (often 0) once w ≳ 1e6·|ln u|, silently turning
    * weighted sampling into ascending-id selection. Keys are negated
    * and ranked ASCENDING through the scale-safe [[Ranking.groupRank]]
    * — a per-group top-k window would put all of one source on one
    * task. Rows with weight ≤ 0 are excluded by construction (they
    * cannot carry sampling mass).
    *
    * Output: (group, id, key double = lnq_micro/w, rank ≤ k). */
  def weightedSample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (hash60(col(idCol).cast("string")) + 1L).cast("double") /
      lit(1152921504606846976L).cast("double") // 2^60, exact in double
    val lnq = round(lit(1e6) * log(u)).cast("long")
    val key = lnq.cast("double") / col(weightCol).cast("double")
    val keyed = df.filter(col(weightCol) > 0)
      .select(col(groupCol), col(idCol), (-key).as("neg_key"))
    Ranking.groupRank(keyed, groupCol, Seq("neg_key", idCol))
      .filter(col("rank") <= k)
      .select(col(groupCol), col(idCol), (-col("neg_key")).as("key"),
        col("rank"))
  }

  /** Neyman-optimal stratified sample allocation: split `budget` draw
    * slots across strata ∝ N_h·S_h (stratum size × population std) —
    * the allocation minimizing the stratified-mean variance, the
    * principled answer to "how many docs per source/language should
    * the eval sample take". N_h·S_h reduces to √(n·Σx² − (Σx)²)
    * (exact integer under the root — one deterministic sqrt per
    * stratum, micro-quantized into an integer weight), and the
    * integer weights feed [[Ranking.apportionLargestRemainder]], so
    * Σ alloc = budget EXACTLY. Zero-variance strata get weight 0 and
    * alloc 0 (one repeated value needs no sample — the textbook
    * edge, kept VISIBLE in the output rather than dropped). Scale:
    * one five-sum hash-agg + the model-sized apportion. Output:
    * (stratumCol, n, weight, base, alloc). */
  def neymanAllocation(
      df: DataFrame,
      stratumCol: String,
      valueCol: String,
      budget: Long): DataFrame = {
    val x = col(valueCol).cast("long")
    val stats = Dedup.truncate(df.filter(col(valueCol).isNotNull)
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n"), sum(x).as("__sx"),
        sum(x * x).as("__sxx"))
      .select(col(stratumCol), col("n"),
        round(lit(1e3) * sqrt(
          (col("n") * col("__sxx") - col("__sx") * col("__sx"))
            .cast("double"))).cast("long").as("weight")))
    val app = Ranking.apportionLargestRemainder(stats,
      stratumCol, "weight", budget)
    stats.join(app.select(col(stratumCol), col("base"), col("alloc")),
        Seq(stratumCol), "left")
      .select(col(stratumCol), col("n"), col("weight"),
        coalesce(col("base"), lit(0L)).as("base"),
        coalesce(col("alloc"), lit(0L)).as("alloc"))
  }
}
