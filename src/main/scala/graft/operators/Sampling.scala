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

  /** Kish effective sample size of an importance-weighted set per
    * group — the health check to run on [[importanceResample]]/DSIR
    * weights BEFORE trusting any weighted estimate:
    * ESS = (Σw)²/Σw², and ESS/n near 0 means a handful of rows carry
    * the whole corpus (the weighted mean is an anecdote). Weights
    * micro-quantize once; both sums are exact DECIMAL(38,0); each
    * output is one micro-rounded divide. Non-positive and NULL
    * weights are EXCLUDED (stated — a zero weight contributes
    * nothing to either sum anyway, a negative one is an upstream
    * bug this census should not silently absorb); groups with no
    * positive weight report n = 0 and NULL ratios.
    * Output: (groupCol, n, ess_micro, ess_ratio_micro). */
  def effectiveSampleSize(
      df: DataFrame,
      groupCol: String,
      weightCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.select(col(groupCol).as("__g"),
        round(col(weightCol).cast("double") * lit(1e6)).cast("long")
          .as("__w"))
      .filter(col("__w").isNotNull && col("__w") > 0L)
    df.select(col(groupCol).as("__g")).distinct()
      .join(base.groupBy(col("__g"))
          .agg(count(lit(1)).as("n"),
            sum(col("__w").cast(dec)).as("__s"),
            sum(col("__w").cast(dec) * col("__w")).as("__q")),
        Seq("__g"), "left")
      .select(col("__g").as(groupCol),
        coalesce(col("n"), lit(0L)).as("n"),
        when(col("__q").isNotNull,
          round(lit(1e6) * (col("__s") * col("__s")).cast("double") /
            col("__q").cast("double")).cast("long"))
          .otherwise(lit(null).cast("long")).as("ess_micro"),
        when(col("__q").isNotNull,
          round(lit(1e6) * (col("__s") * col("__s")).cast("double") /
            (col("__q").cast("double") * col("n").cast("double")))
            .cast("long"))
          .otherwise(lit(null).cast("long")).as("ess_ratio_micro"))
  }

  /** Cumulative Poisson(1) thresholds scaled to the 60-bit hash
    * domain: T_k = round(2⁶⁰·P(X ≤ k)) for k = 0..6 (P(X > 6) <
    * 10⁻⁴ — the tail is capped, stated). A row's resample weight is
    * the count of thresholds its 60-bit hash clears — the integer
    * inverse-CDF, identical in any engine. Public so the oracle
    * embeds the same literals. */
  val PoissonThresholds60: Seq[Long] = {
    var term = math.exp(-1.0)
    var cum = term
    (0 to 6).map { k =>
      if (k > 0) { term = term / k; cum += term }
      math.round(cum * math.pow(2.0, 60.0))
    }
  }

  /** Deterministic Poisson-bootstrap confidence interval for the
    * per-group mean — the uncertainty bar a 100 TB census can
    * actually afford: instead of resampling rows (a shuffle per
    * replicate), every row gets `b` independent Poisson(1) weights
    * derived from a content hash ([[PoissonThresholds60]] inverse
    * CDF — no RNG, bit-reproducible, the q109/weightedSample
    * stance), so ALL replicates ride ONE explode + ONE aggregate.
    * Replicate means micro-round from exact integer (Σw, Σw·x)
    * sums; the CI endpoints are exact order statistics over the B
    * means (⌈q·B⌉ lower-quantile rule, [[Ranking.groupRank]] ties
    * broken by replicate id); empty replicates (every weight 0 —
    * only possible for tiny groups) are excluded from the order
    * statistics, reported via n_resamples. Output: (groupCol, n,
    * mean_micro, lo_micro, hi_micro, n_resamples). */
  def bootstrapMeanCI(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      valueCol: String,
      b: Int = 100,
      loQ: Double = 0.025,
      hiQ: Double = 0.975): DataFrame = {
    require(b >= 10 && b <= 1000, "b must be in [10, 1000]")
    require(loQ > 0 && loQ < hiQ && hiQ < 1, "need 0 < loQ < hiQ < 1")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(idCol).as("__id"),
        round(col(valueCol).cast("double") * lit(1e6)).cast("long")
          .as("__v"))
    val point = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("__v")).cast("double") /
          count(lit(1)).cast("double")).cast("long").as("mean_micro"))
    val u = graft.functions.TextFunctions.hash60(
      concat(lit("boot:"), col("__id").cast("string"), lit(":"),
        col("__b").cast("string")))
    val w = PoissonThresholds60.map(t => when(u >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    // Repartition BEFORE the ×b explode: the input often arrives in
    // one or two file partitions, and inflating 100× inside them
    // leaves every md5 on a single thread. Shuffling the small
    // pre-explode frame (n rows) buys full-width parallelism for the
    // b·n hash evaluations — the cheap side of the explode is the
    // side to move. The partition count is pinned EXPLICITLY: the
    // pre-explode frame is tiny, and AQE would coalesce a plain
    // repartition(cols) right back to one partition, re-serializing
    // the expensive side.
    val shuffleN = df.sparkSession.sessionState.conf.numShufflePartitions
    val reps = base
      .repartition(shuffleN, col("__g"), col("__id"))
      .withColumn("__b", explode(sequence(lit(0), lit(b - 1))))
      .select(col("__g"), col("__b"), w.as("__w"), col("__v"))
      .groupBy(col("__g"), col("__b"))
      .agg(sum(col("__w")).as("__sw"),
        sum(col("__w") * col("__v")).as("__swx"))
      .filter(col("__sw") > 0L)
      .select(col("__g"), col("__b"),
        round(col("__swx").cast("double") / col("__sw").cast("double"))
          .cast("long").as("__m"))
    val ranked = Dedup.truncate(
      Ranking.groupRank(reps, "__g", Seq("__m", "__b")))
    val counts = ranked.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_resamples"))
      .select(col("__g"), col("n_resamples"),
        ceil(lit(loQ) * col("n_resamples")).cast("long").as("__lo"),
        ceil(lit(hiQ) * col("n_resamples")).cast("long").as("__hi"))
    val lo = ranked.join(counts, Seq("__g"))
      .filter(col("rank") === col("__lo"))
      .select(col("__g"), col("__m").as("lo_micro"))
    val hi = ranked.join(counts, Seq("__g"))
      .filter(col("rank") === col("__hi"))
      .select(col("__g"), col("__m").as("hi_micro"))
    point
      .join(lo, Seq("__g"), "left")
      .join(hi, Seq("__g"), "left")
      .join(counts.select(col("__g"), col("n_resamples")),
        Seq("__g"), "left")
      .select(col("__g").as(groupCol), col("n"), col("mean_micro"),
        col("lo_micro"), col("hi_micro"),
        coalesce(col("n_resamples"), lit(0L)).as("n_resamples"))
  }
}
