package graft.operators

import graft.functions.{GraftExpressions, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data assembly operators — the last mile between a cleaned
  * corpus and a training run: packing documents into fixed token
  * budgets, benchmark-contamination checks, PII scrubbing, and
  * deterministic shard assignment.
  *
  * All four are deterministic (no RNG — hashes and document order
  * only) so re-runs and retried stages produce byte-identical
  * training data, and every one is expressed as declarative
  * DataFrame ops: Catalyst sees the whole plan, pushdown and AQE
  * apply as usual.
  */
object Training {

  /** Greedy contiguous sequence packing: documents ordered by id
    * within each `groupCol` stratum are packed into consecutive
    * `budgetTokens` bins by START offset (a document straddling a
    * boundary goes to the bin its first token falls in — packs can
    * overflow by at most one document, the standard streaming-pack
    * approximation).
    *
    * Scale: the prefix sum runs per group (source, shard, date …), so
    * parallelism = number of groups and no global single-partition
    * window exists. Packing a corpus with NO natural stratum should
    * first assign shards ([[shardAssign]]) and pack per shard. */
  def sequencePack(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      budgetTokens: Int): DataFrame =
    packByLength(
      docs.select(col(groupCol), col(idCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens")),
      idCol, "n_tokens", groupCol, budgetTokens)

  /** [[sequencePack]] on a CALLER-SUPPLIED length column — the
    * tokenizer-aware form: whitespace counts mis-size packs the
    * moment a real tokenizer is in play, so pack on the measured
    * piece count (e.g. [[graft.functions.GraftExpressions.bpeEncode]]
    * sizes) or any cost column (bytes, frames). Same greedy
    * start-offset binning and per-group prefix sum as
    * [[sequencePack]]; output keeps `lenCol`'s name. */
  def packByLength(
      docs: DataFrame,
      idCol: String,
      lenCol: String,
      groupCol: String,
      budgetTokens: Int): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    // Prefix sums via the range-partitioned [[Ranking.groupRunningSum]]
    // — a per-group window would put ALL of one source's docs on one
    // task, the hot-partition shape the Ranking module exists to avoid.
    Ranking.groupRunningSum(
        docs.select(col(groupCol), col(idCol),
          col(lenCol).cast("long").as(lenCol)),
        groupCol, Seq(idCol), lenCol)
      // Start offset of this doc = inclusive running sum minus itself.
      .withColumn("pack_id",
        ((col("running") - col(lenCol)) / budgetTokens).cast("long"))
      .drop("running")
  }

  /** Benchmark-contamination check: fraction of each training doc's
    * `shingleSize`-gram set that also occurs anywhere in the eval
    * corpus. Candidate generation is (explode → distinct → equi-join
    * on the shingle) — never corpus×corpus; at 100 TB the join key is
    * the shingle string and the eval side is the small one (benchmark
    * suites are MBs), so AQE turns it into a broadcast join.
    *
    * Output: (id, n_shingles, n_contaminated, containment ∈ [0,1]),
    * one row per train doc that shingles (short docs drop, as in the
    * dedup family). */
  def contamination(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3): DataFrame = {
    def shingleSets(df: DataFrame) = df.select(col(idCol),
      GraftExpressions.sortedShingleSet(
        TextFunctions.tokens(col(textCol)), shingleSize).as("sh"))
      .withColumn("n_shingles", size(col("sh")).cast("long"))
      .filter(col("n_shingles") > 0)
    // trainSets feeds both the candidate join and the final containment
    // join, and ReuseExchange cannot dedupe the two subtrees — but it
    // is MAP-ONLY, so the recompute is a second pipelined scan with no
    // extra shuffle. Checkpointing it would materialize per-doc shingle
    // arrays (larger than the corpus text) — the wrong trade at 100 TB;
    // contrast Corpus.rarityScores, whose shared subtree contains a
    // shuffle and therefore IS truncated.
    val trainSets = shingleSets(train)
    val evalShingles = shingleSets(eval)
      .select(explode(col("sh")).as("s")).distinct()
    val contaminated = trainSets
      .select(col(idCol), explode(col("sh")).as("s"))
      .join(evalShingles, Seq("s"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated"))
    trainSets.drop("sh")
      .join(contaminated, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        round(coalesce(col("n_contaminated"), lit(0L)) / col("n_shingles"), 6)
          .as("containment"))
  }

  /** PII patterns shared by the scrub and its oracle: ASCII-only, no
    * lookaround — valid in both Java regex and RE2-family engines. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}\\b"
  val LongDigitPattern = "\\b[0-9]{9,}\\b"

  /** PII scrub: replace e-mail addresses, phone-shaped numbers, and
    * long digit runs (account/SSN-ish ids) with typed placeholders.
    * Map-only and codegen'd (regexp_replace is a native expression);
    * `changed` flags rows for audit sampling without a second scan. */
  def piiScrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
          PhonePattern, "<PHONE>"),
        LongDigitPattern, "<ID>")
    docs.select(col(idCol), scrubbed.as("text_scrubbed"),
      (scrubbed =!= col(textCol)).as("changed"))
  }

  /** Rule names in emission order — the oracle and downstream audits
    * key on this exact order inside the `reasons` string. */
  val RuleNames: Seq[String] = Seq("too_short", "tok_len", "punct_heavy",
    "low_stopword", "digit_heavy", "repetitive")

  /** C4/Dolma-style document rule filter: each doc gets the list of
    * quality rules it violates (comma-joined in [[RuleNames] order) and
    * a keep flag. Pure map-only column expressions on top of
    * [[TextFunctions.qualitySignals]] — no UDFs, no shuffle; at 100 TB
    * this runs at scan speed and `keep` pushes into downstream filters.
    *
    * Thresholds are the classic heuristics: <10 tokens, mean token
    * length outside [2,12], >30% punctuation, <3% stopwords, >20%
    * digits, <30% distinct tokens (repetition proxy). */
  def ruleFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val nChars = length(col(textCol))
    val digitRatio = when(nChars > 0,
      (nChars - length(regexp_replace(col(textCol), "[0-9]", "")))
        .cast("double") / nChars.cast("double")).otherwise(0.0)
    val distinctRatio = when(size(toks) > 0,
      size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
      .otherwise(0.0)
    val reserved = Set(idCol, "q", "digit_ratio", "distinct_ratio",
      "n_tokens", "reasons", "keep")
    require(carry.distinct == carry && carry.forall(!reserved.contains(_)),
      s"carry columns must be unique and avoid ${reserved.mkString(", ")}")
    val carried = carry.map(col)
    docs
      .select(Seq(col(idCol), TextFunctions.qualitySignals(col(textCol)).as("q"),
        digitRatio.as("digit_ratio"), distinctRatio.as("distinct_ratio")) ++
        carried: _*)
      .select(Seq(col(idCol), col("q.n_tokens").as("n_tokens"),
        // concat_ws skips NULLs, so un-violated rules vanish.
        concat_ws(",",
          when(col("q.n_tokens") < 10, "too_short"),
          when(col("q.mean_token_len") < 2.0 || col("q.mean_token_len") > 12.0,
            "tok_len"),
          when(col("q.punct_ratio") > 0.3, "punct_heavy"),
          when(col("q.stopword_ratio") < 0.03, "low_stopword"),
          when(col("digit_ratio") > 0.2, "digit_heavy"),
          when(col("distinct_ratio") < 0.3, "repetitive")).as("reasons")) ++
        carried: _*)
      .withColumn("keep", col("reasons") === "")
  }

  /** Quality-weighted (importance) resampling: keep a row when its
    * stable hash bucket falls under a PER-ROW rate (percent), so
    * low-quality strata are thinned harder — deterministically, with
    * no RNG (re-runs keep the same docs; see [[Sampling]]). */
  def importanceResample(
      docs: DataFrame,
      idCol: String,
      ratePercent: org.apache.spark.sql.Column): DataFrame =
    docs.filter(Sampling.hashBucket(col(idCol), 100) < ratePercent)

  /** Gopher-style repetition signals over token n-grams (Rae et al.
    * 2021 §A1.1 family, deterministic variant):
    *
    *   - `top_2gram_frac`: max over distinct 2-grams of
    *     occurrences × chars(gram), as a fraction of total 2-gram
    *     occurrence chars — the "one phrase dominates" signal;
    *   - `dup_3gram_frac`: chars in 3-grams occurring ≥2×, over total
    *     3-gram occurrence chars — the "templated boilerplate" signal.
    *
    * Both are exact-integer ratios (one IEEE divide, mirrored in the
    * oracle); `flagged` applies the classic 0.20 / 0.18 thresholds.
    *
    * Scale: each signal is explode → (id, gram) hash-agg → (id)
    * hash-agg — the exact-dedup shuffle shape, map-side combinable,
    * never corpus×corpus. Docs too short to form a gram keep 0.0
    * (nothing repeats in them). */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    def gramFrac(n: Int, name: String, top: Boolean) =
      docs.select(col(idCol),
          // Native one-pass gram list (duplicates kept) — an HOF-built
          // array here would ride interpreted into the GenerateExec.
          explode(GraftExpressions.shingleList(
            TextFunctions.tokens(col(textCol)), n)).as("g"))
        .groupBy(col(idCol), col("g"))
        .agg(count(lit(1)).as("c"))
        .select(col(idCol), col("c"), (col("c") * length(col("g"))).as("chars"))
        .groupBy(col(idCol))
        .agg(((if (top) max(col("chars"))
               else sum(when(col("c") >= 2, col("chars")).otherwise(0L)))
          .cast("double") / sum(col("chars"))).as(name))
    docs.select(col(idCol))
      .join(gramFrac(2, "top2", top = true), Seq(idCol), "left")
      .join(gramFrac(3, "dup3", top = false), Seq(idCol), "left")
      .select(col(idCol),
        round(coalesce(col("top2"), lit(0.0)), 6).as("top_2gram_frac"),
        round(coalesce(col("dup3"), lit(0.0)), 6).as("dup_3gram_frac"),
        (round(coalesce(col("top2"), lit(0.0)), 6) > 0.20 ||
          round(coalesce(col("dup3"), lit(0.0)), 6) > 0.18).as("flagged"))
  }

  /** Source-mixture rebalancing: thin each source toward a target
    * mixture under a global token budget. `weights` is a small
    * (source, weight) table (integer weights, any scale — shares are
    * weight/Σweight); each source's keep-rate is
    *
    *   rate_s = ⌊min(100, weight_s × budgetTokens × 100 /
    *                      (Σweight × tokens_s))⌋  percent,
    *
    * computed in DOUBLE (the Long product weight×budget×100 wraps
    * silently for large weight scales × large budgets; the IEEE
    * product merely rounds, and the min-100 cap is applied BEFORE the
    * floor so saturation can never matter). Rows then keep
    * deterministically via the per-row hash-bucket filter
    * ([[importanceResample]]).
    *
    * Weights-table coverage is enforced loudly: a source present in
    * `docs` but absent from `weights`, one whose token sum is zero, a
    * negative weight, or an all-zero weights table (Σweight ≤ 0 makes
    * the rate 0/0 = NaN, which `least` would silently turn into 100%
    * keep) all fail the job with a named error instead of silently
    * corrupting the mixture (the inner-join / div-by-zero traps).
    *
    * Scale: one token-sum aggregate over the corpus, a broadcast of
    * the tiny per-source rate table back onto the scan, and the
    * map-only hash filter — no extra wide shuffle. Over-represented
    * sources thin hardest; sources under their target keep 100%. */
  /** Temperature-sampled mixture rates — the T5/PaLM α rule that
    * turns raw per-source sizes into sampling weights: rate_s ∝
    * n_s^α, α ∈ (0, 1] (α = 1 is proportional, α → 0 uniform; 0.3 is
    * the usual low-resource boost). n^α evaluates as exp(α·ln n)
    * with a micro-quantization BETWEEN the two libm steps — ln n
    * micro-rounds first (the lmPerplexity convention: one IEEE op
    * over an exact integer), then exp sees the same exact rational
    * on every engine, so the composed value cannot drift by
    * accumulated ulps. Shares are one divide over the exact integer
    * rate sum. Feed the output's shares into [[mixtureRebalance]] as
    * its weights table. NULL sources form their own row (they need a
    * decision, not an exclusion).
    * Output: (sourceCol, n_docs, rate_micro, share_micro). */
  def temperatureMixRates(
      docs: DataFrame,
      sourceCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val counts = docs.groupBy(col(sourceCol).as("__g"))
      .agg(count(lit(1)).as("n_docs"))
    val rates = counts.select(col("__g"), col("n_docs"),
        round(lit(1e6) * log(col("n_docs").cast("double"))).cast("long")
          .as("__lnm"))
      .select(col("__g"), col("n_docs"),
        round(lit(1e6) * exp(lit(alpha) *
          (col("__lnm").cast("double") / lit(1e6)))).cast("long")
          .as("rate_micro"))
    val tot = rates.agg(sum(col("rate_micro")).as("__tot"))
    rates.crossJoin(broadcast(tot))
      .select(col("__g").as(sourceCol), col("n_docs"), col("rate_micro"),
        round(lit(1e6) * col("rate_micro").cast("double") /
          col("__tot").cast("double")).cast("long").as("share_micro"))
  }

  /** Deterministic stride-scheduled interleave — MATERIALIZE the
    * training order a [[temperatureMixRates]] mixture implies,
    * without an RNG: each source emits its docs at virtual times
    * vt_i = (2i−1)/(2·rate) (the classic stride scheduler — doc i of
    * a rate-r source lands at the center of its i-th 1/r slot), and
    * the global order is the ascending vt sort. A source with twice
    * the rate appears twice as often, evenly spread — exactly what
    * epoch-level sampling converges to, but reproducible row-for-row
    * and resumable from any order_idx.
    *
    * Exactness: per-source ordinals come from [[Ranking.groupRank]]'s
    * range-partitioned prefix; vt micro-rounds ONE scalar IEEE
    * divide of exact integers (engine-identical); the global index
    * is a constant-group [[Ranking.groupRank]] over (vt, source, id)
    * — range-partitioned by the sort key itself, so no single
    * reducer sees the corpus. Sources absent from `rates` (or with
    * non-positive rate) drop — the schedule only emits what the
    * mixture weights (stated).
    * Output: (sourceCol, idCol, vt_micro, order_idx). */
  def strideInterleave(
      docs: DataFrame,
      sourceCol: String,
      idCol: String,
      rates: DataFrame,
      rateCol: String = "rate_micro"): DataFrame = {
    val r = rates.filter(col(rateCol) > 0L)
      .select(col(sourceCol).as("__rs"), col(rateCol).as("__rate"))
    val ranked = Ranking.groupRank(
      docs.select(col(sourceCol), col(idCol)), sourceCol, Seq(idCol))
    val vt = ranked.join(broadcast(r), col(sourceCol) === col("__rs"))
      .select(col(sourceCol), col(idCol),
        round(lit(1e12) * (lit(2L) * col("rank") - 1L).cast("double") /
          (lit(2.0) * col("__rate").cast("double"))).cast("long")
          .as("vt_micro"))
    Ranking.groupRank(vt.withColumn("__all", lit(0)),
        "__all", Seq("vt_micro", sourceCol, idCol))
      .select(col(sourceCol), col(idCol), col("vt_micro"),
        col("rank").as("order_idx"))
  }

  def mixtureRebalance(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      weights: DataFrame,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val tok = TextFunctions.tokenCount(col(textCol)).cast("long")
    // Join on a NULL-normalized key: a raw NULL source would otherwise
    // be pruned by the inner join's implied IsNotNull BEFORE the
    // fail-loud branches evaluate, silently dropping those rows. The
    // encoding is prefix-disjoint ("v:<value>" vs "null:") so a real
    // source literally named "<null>" can never collide with the NULL
    // sentinel and pool its accounting; error messages print the
    // display form. NULL keeps failing the coverage gate — it has no
    // weights row under any encoding.
    def srcKey(c: org.apache.spark.sql.Column) =
      when(c.isNull, lit("null:"))
        .otherwise(concat(lit("v:"), c.cast("string")))
    def srcName(k: org.apache.spark.sql.Column) =
      when(k === "null:", lit("<null>")).otherwise(substring(k, 3, 1 << 30))
    val perSource = docs
      .select(srcKey(col(sourceCol)).as("src_key"), tok.as("tok"))
      .groupBy(col("src_key")).agg(sum(col("tok")).as("src_tokens"))
    val wTotal = weights.agg(sum(col("weight").cast("long")).as("w_total"))
    val rates = perSource
      .join(weights.select(srcKey(col(sourceCol)).as("src_key"),
        col("weight")), Seq("src_key"), "left")
      .crossJoin(broadcast(wTotal))
      .select(col("src_key"),
        when(col("weight").isNull, raise_error(concat(
            lit("mixtureRebalance: source '"), srcName(col("src_key")),
            lit("' has no row in the weights table"))))
          .when(col("src_tokens") <= 0L, raise_error(concat(
            lit("mixtureRebalance: source '"), srcName(col("src_key")),
            lit("' has zero tokens — keep rate is undefined"))))
          .when(col("weight") < 0L, raise_error(concat(
            lit("mixtureRebalance: source '"), srcName(col("src_key")),
            lit("' has a negative weight"))))
          .when(col("w_total") <= 0L || col("w_total").isNull,
            raise_error(lit("mixtureRebalance: weights sum to <= 0 — " +
              "mixture shares are undefined")))
          .otherwise(floor(least(lit(100.0),
            col("weight").cast("double") * budgetTokens.toDouble * 100.0
              / (col("w_total").cast("double") * col("src_tokens").cast("double")))))
          .cast("int").as("rate_percent"))
    docs.select(col(idCol), col(sourceCol), srcKey(col(sourceCol)).as("src_key"))
      .join(broadcast(rates), Seq("src_key"))
      .filter(Sampling.hashBucket(col(idCol), 100) < col("rate_percent"))
      .select(col(idCol), col(sourceCol), col("rate_percent"))
  }

  /** CCNet-style perplexity curriculum (Wenzek et al. 2020): rank each
    * source's documents by the corpus-trained bigram-LM NLL
    * ([[Corpus.lmPerplexity]]) and cut into `nBuckets` equal-frequency
    * bands — bucket 0 is the most fluent "head", the last the noisy
    * "tail" a pipeline samples differently or drops outright.
    *
    * The per-source ranking goes through the scale-safe
    * [[Ranking.groupBuckets]]: a plain `row_number() OVER (PARTITION
    * BY source …)` would land all of one crawl source in a single
    * task, which at 100 TB is the job. Docs with no bigrams (fewer
    * than two tokens) carry no NLL and drop, as in the scorer.
    *
    * Output: (id, source, nll, rank within source, bucket). */
  def perplexityCurriculum(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      nBuckets: Int = 3): DataFrame = {
    val scored = Corpus.lmPerplexity(docs, idCol, textCol)
      .join(docs.select(col(idCol), col(sourceCol)), Seq(idCol))
      .select(col(idCol), col(sourceCol), col("nll"))
    Ranking.groupBuckets(scored, sourceCol, Seq("nll", idCol), nBuckets)
  }

  /** One-call benchmark decontamination: drop training docs whose
    * `shingleSize`-gram containment in the eval corpus exceeds
    * `maxContainment`; everything else survives — including docs too
    * short to shingle (nothing in them can match an eval n-gram).
    * Anti-join on the small flagged-id set, so the corpus passes
    * through untouched except for the dropped rows. */
  def decontaminate(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      maxContainment: Double = 0.3): DataFrame = {
    val bad = contamination(train, eval, idCol, textCol, shingleSize)
      .filter(col("containment") > maxContainment)
      .select(col(idCol))
    train.join(bad, Seq(idCol), "left_anti")
  }

  /** Deterministic epoch shuffle: each doc gets a shard (md5 mod
    * `nShards`) and a position within its shard, ordered by an
    * epoch-salted content hash — a different, reproducible permutation
    * per epoch with no RNG. This is how a 100 TB corpus is "shuffled":
    * each shard permutes independently (bounded window partitions, no
    * global sort), and readers stream shards in position order.
    * Output: (id, shard, pos 1-based). */
  def epochShuffle(
      docs: DataFrame,
      idCol: String,
      nShards: Int,
      epoch: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val key = TextFunctions.hash60(
      concat(lit(s"e$epoch:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(key, col(idCol))
    shardAssign(docs, idCol, nShards)
      .select(col(idCol), col("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Deterministic shard assignment: shard = md5(id) mod n — stable
    * across runs, engines, and cluster sizes (unlike hash-partition
    * ids, which depend on Spark's internal hash and partition count).
    * The 60-bit digest prefix stays in integer math throughout
    * (double division would round above 2^53). */
  def shardAssign(
      docs: DataFrame,
      idCol: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    docs.withColumn("shard",
      expr(s"conv(substring(md5(cast($idCol AS STRING)), 1, 15), 16, 10)")
        .cast("long") % nShards)
  }

  /** Sliding-window chunking for context-length preparation: each
    * document's token stream is cut into windows of `maxLen` tokens
    * starting every `stride` tokens (stride < maxLen ⇒ consecutive
    * chunks overlap by maxLen−stride tokens — the standard long-doc
    * treatment so no training example loses the context spanning a cut).
    * Chunk starts are 0, stride, 2·stride, …; the last start is the
    * smallest multiple of stride from which the window reaches the end
    * of the doc, so every token lands in ≥1 chunk and no fully-empty
    * window is emitted. Docs that tokenize to nothing drop.
    *
    * Scale: map-only — one native `sequence` + `posexplode` per doc,
    * no shuffle, no join; fan-out per row is n/stride chunks. The
    * chunk text is hashed (md5) rather than carried, so the exploded
    * stream stays narrow until a downstream consumer re-slices the
    * tokens it actually trains on.
    *
    * Output: (id, chunk_idx 0-based, start_tok 1-based, n_tokens, chunk_hash). */
  def chunkWithOverlap(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxLen: Int,
      stride: Int): DataFrame = {
    require(maxLen > 0 && stride > 0 && stride <= maxLen,
      "need 0 < stride <= maxLen")
    val toks = TextFunctions.tokens(col(textCol))
    docs
      .select(col(idCol), toks.as("toks"), size(toks).as("n"))
      .filter(col("n") > 0)
      // Integer ceil((n-maxLen)+ / stride) + 1 chunk starts. Column./
      // is DOUBLE division; floor restores the integer ceil-div (exact
      // below 2^53 — doc token counts are nowhere near).
      .withColumn("n_chunks",
        (floor((greatest(col("n") - maxLen, lit(0)) + (stride - 1))
          / lit(stride)) + 1).cast("int"))
      .select(col(idCol), col("toks"),
        posexplode(transform(sequence(lit(0), col("n_chunks") - 1),
          i => i * stride)).as(Seq("chunk_idx", "start0")))
      .select(col(idCol), col("chunk_idx"),
        (col("start0") + 1).as("start_tok"),
        slice(col("toks"), col("start0") + 1, lit(maxLen)).as("chunk"))
      .select(col(idCol), col("chunk_idx"), col("start_tok"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(array_join(col("chunk"), " ")).as("chunk_hash"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each raw
    * document by the hashed-unigram log-likelihood ratio between a
    * TARGET distribution (the domain you want more of) and the RAW
    * distribution, with add-1 smoothing over `nBuckets` hash buckets:
    *
    *   score(d) = Σ_tok  w[bucket(tok)],
    *   w[b] = round(1e6 · ln( ((c_target[b]+1)/(N_target+B)) /
    *                          ((c_raw[b]+1)/(N_raw+B)) ))
    *
    * The per-bucket weight is QUANTIZED to an integer (micro-nats) the
    * moment it leaves the log, so each document's score is an exact
    * integer sum — order-independent under any partitioning, and
    * bit-identical in any engine whose `ln` agrees to ~1e-7 relative
    * (a weight only changes if 1e6·ln(r) sits within one ulp of x.5 —
    * with B buckets the chance any bucket does is ~B·1e-10).
    *
    * Scale: one token explode feeding two bucket hash-aggs (bucket
    * domain = `nBuckets`, tiny), the weight table broadcasts back onto
    * a second map-only explode, and one per-doc hash-agg — the
    * exact-dedup shuffle shape. The target side is typically a small
    * seed corpus; here it is any boolean column predicate.
    *
    * Output: (id, n_tokens, score_micro Σ integer micro-nats,
    * per_token = round(score_micro/1e6/n_tokens, 6)). */
  def dsirWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: org.apache.spark.sql.Column,
      nBuckets: Int = 256): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val occ = docs
      .select(col(idCol), isTarget.as("is_t"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("b", TextFunctions.hash60(col("tok")) % nBuckets)
    val counts = occ.groupBy(col("b")).agg(
      count(lit(1)).as("c_raw"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"))
    val totals = counts.agg(
      sum(col("c_raw")).as("n_raw"), sum(col("c_t")).as("n_t"))
    val weights = counts.crossJoin(broadcast(totals))
      .select(col("b"),
        round(lit(1e6) * log(
          ((col("c_t") + 1).cast("double") / (col("n_t") + nBuckets).cast("double")) /
          ((col("c_raw") + 1).cast("double") / (col("n_raw") + nBuckets).cast("double"))))
          .cast("long").as("w"))
    occ
      .join(broadcast(weights), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("score_micro"))
      .select(col(idCol), col("n_tokens"), col("score_micro"),
        round(col("score_micro").cast("double") / 1e6
          / col("n_tokens").cast("double"), 6).as("per_token"))
  }

  /** Quality-signal ensemble — the tagger mix every filtering
    * pipeline ends with (Dolma/RefinedWeb ship exactly this shape:
    * several independent per-doc signals, one combined score):
    * unigram rarity ([[graft.operators.Corpus.rarityScores]]),
    * within-doc repetition ([[repetitionSignals]]), and bigram-LM
    * perplexity ([[graft.operators.Corpus.lmPerplexity]]), each
    * re-quantized to integer MICRO-units from its 6-dp value and
    * summed into one deterministic score (the nll term scaled div 10
    * so its ~nat magnitude sits in the same band as the fraction
    * signals). The mix weights are fixed and illustrative — a real
    * deployment tunes them against labels; what matters here is the
    * shape: signals compute independently (three scans that could
    * come from three different jobs), join on the id, and the score
    * is exact integer arithmetic, so the keep set is bit-stable
    * across engines. Docs too short to carry a bigram drop with the
    * LM join, as across the dedup family.
    *
    * Scale: each signal is its own bounded hash-agg pipeline (see the
    * component docs); the ensemble adds two id-keyed equi-joins of
    * doc-count-sized tables. Never corpus×corpus. Filter/rank on
    * `score_mu` downstream ([[graft.operators.Ranking]] for
    * percentile bars). */
  def qualityEnsemble(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dfThreshold: Long): DataFrame = {
    def mu(c: org.apache.spark.sql.Column) =
      round(c * 1e6).cast("long")
    val rare = Corpus.rarityScores(docs, idCol, textCol, dfThreshold)
      .select(col(idCol), mu(col("rare_frac")).as("rare_mu"))
    val rep = repetitionSignals(docs, idCol, textCol)
      .select(col(idCol),
        mu(col("top_2gram_frac")).as("top2_mu"),
        mu(col("dup_3gram_frac")).as("dup3_mu"))
    val nll = Corpus.lmPerplexity(docs, idCol, textCol)
      .select(col(idCol), mu(col("nll")).as("nll_mu"))
    rare.join(rep, Seq(idCol)).join(nll, Seq(idCol))
      .select(col(idCol), col("rare_mu"), col("top2_mu"), col("dup3_mu"),
        col("nll_mu"),
        (col("rare_mu") + col("top2_mu") + col("dup3_mu")
          + expr("nll_mu div 10")).as("score_mu"))
  }

  /** Feature-hashed TF-IDF document vectors (Weinberger et al.'s
    * hashing trick) — a deterministic, model-free text→vector bridge
    * into the similarity family: each token hashes to one of `dims`
    * buckets with a ±1 sign bit, contributing sign · tf · idf, where
    * idf is the exact-integer bit-length form of q66
    * (`length(bin(n_docs div df))` — both engines drop leading
    * zeros). Everything is integer arithmetic end to end, so vectors
    * are bit-identical across engines and partitionings; the signed
    * hashing makes collisions cancel in expectation instead of
    * inflating a bucket.
    *
    * Emitted LONG-FORM — (id, dim, v), zero dims absent — the honest
    * distributed vector layout (a 10⁹-doc corpus never materializes a
    * dims-wide dense row per doc just to stream it back apart);
    * pivot at the consumer if a dense array is really wanted.
    *
    * Scale: a (doc, token) tf hash-agg, a (token) df hash-agg, one
    * equi-join on the token (the df side is vocabulary-sized — AQE
    * broadcasts it small, skew-splits stopwords large), a 1-row
    * corpus-size attach, and the final (doc, dim) hash-agg. Never
    * corpus×corpus. */
  def hashedTfidfVectors(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dims: Int): DataFrame = {
    require(dims > 0, "dims must be positive")
    val tf = docs
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    tf.join(dfreq, Seq("tok"))
      .crossJoin(broadcast(nDocs))
      .withColumn("h", TextFunctions.hash60(col("tok")))
      .select(col(idCol),
        (col("h") % dims).cast("int").as("dim"),
        (when(expr(s"h div $dims") % 2 === 0, lit(1L)).otherwise(lit(-1L))
          * col("tf") * length(bin(expr("n_docs div df"))).cast("long"))
          .as("contrib"))
      .groupBy(col(idCol), col("dim"))
      .agg(sum(col("contrib")).as("v"))
  }
}
