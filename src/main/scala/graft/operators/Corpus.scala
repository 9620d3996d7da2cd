package graft.operators

import graft.functions.{GraftExpressions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level statistics — signals computed over the whole document
  * set rather than per document. */
object Corpus {

  /** The PMI-ratio score c_xy·n / (c_x·c_y), 6-dp rounded. Every count
    * is cast to double BEFORE multiplying: Long products wrap silently
    * at corpus scale (c_xy=5e8 × n=1e11 > 2^63), while the double
    * product only rounds — rank order and the displayed rounding are
    * unaffected, and the score stays positive and finite for positive
    * counts of any magnitude. */
  def pmiRatio(cXy: Column, n: Column, cX: Column, cY: Column): Column =
    round((cXy.cast("double") * n.cast("double"))
      / (cX.cast("double") * cY.cast("double")), 6)

  /** Collocation mining: bigrams occurring ≥ `minCount` times, scored
    * by the PMI *ratio* p(x,y)/(p(x)p(y)) = c_xy·N / (c_x·c_y) — the
    * exponent-free form of pointwise mutual information. Each count is
    * cast to double BEFORE the multiply: the products are then IEEE
    * operations that cannot wrap (a Long product c_xy·N overflows
    * silently at corpus scale — n≈1e11 occurrences × a 5e8-count
    * bigram exceeds 2^63 — while the double product merely rounds,
    * preserving rank order and the 6-dp display rounding). The score
    * stays a deterministic multiply-divide, bit-stable across engines
    * and partitionings.
    *
    * Scale: one unigram hash-agg, one bigram hash-agg (both map-side
    * combinable; the gram explode is the native [[GraftExpressions
    * .ShingleList]]), two equi-joins keyed on the token (the count
    * tables are tiny next to the corpus — AQE broadcasts them), and a
    * 1-row total attach. Never corpus×corpus.
    *
    * Output: (bigram, c_xy, c_x, c_y, pmi_ratio). */
  def collocations(
      docs: DataFrame,
      textCol: String,
      minCount: Long): DataFrame = {
    require(minCount > 0, "minCount must be positive")
    val toks = TextFunctions.tokens(col(textCol))
    val uni = docs.select(explode(toks).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).as("n"))
    val big = docs
      .select(explode(GraftExpressions.shingleList(toks, 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
      .withColumn("x", split(col("bigram"), " ").getItem(0))
      .withColumn("y", split(col("bigram"), " ").getItem(1))
    big
      .join(uni.select(col("tok").as("x"), col("c").as("c_x")), Seq("x"))
      .join(uni.select(col("tok").as("y"), col("c").as("c_y")), Seq("y"))
      .crossJoin(broadcast(total))
      .select(col("bigram"), col("c_xy"), col("c_x"), col("c_y"),
        pmiRatio(col("c_xy"), col("n"), col("c_x"), col("c_y"))
          .as("pmi_ratio"))
  }

  /** Corpus-level TextRank keyword scores (Mihalcea & Tarau 2004):
    * PageRank over the word co-occurrence graph, so a term is central
    * when it keeps company with other central terms — the
    * graph-native complement to tf-idf (q66's frequency contrast):
    * tf-idf rewards rarity, TextRank rewards connectivity, and terms
    * high on BOTH are the keyphrase candidates.
    *
    * Graph: adjacent-token pairs (the standard window-2 form),
    * undirected — co-counts are summed per unordered pair and each
    * pair emits both directions with that weight into
    * [[Graph.pageRankWeighted]], whose exact integer mass splits make
    * the ranking bit-stable. `minCount` prunes hapax adjacencies
    * (noise edges, and the oracle-side cost cap).
    *
    * Scale: one explode + hash-agg for pair counts (map-side
    * combinable; key domain = observed bigrams), then PageRank's
    * per-round node-keyed equi-joins. Never vocab×vocab — only
    * OBSERVED adjacencies become edges. Output: (term, rank), rank in
    * micro units. */
  def textRank(
      docs: DataFrame,
      textCol: String,
      minCount: Long,
      iters: Int = 5,
      dampingPct: Int = 85): DataFrame = {
    require(minCount > 0, "minCount must be positive")
    val toks = TextFunctions.tokens(col(textCol))
    val pairs = docs
      .select(explode(GraftExpressions.shingleList(toks, 2)).as("bigram"))
      .select(split(col("bigram"), " ").getItem(0).as("x"),
        split(col("bigram"), " ").getItem(1).as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("u"),
        greatest(col("x"), col("y")).as("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
      .filter(col("w") >= minCount)
    val edges = pairs.select(col("u").as("src"), col("v").as("dst"),
        col("w"))
      .union(pairs.select(col("v").as("src"), col("u").as("dst"),
        col("w")))
    Graph.pageRankWeighted(edges, "src", "dst", "w", iters, dampingPct)
      .select(col("node").as("term"), col("rank"))
  }

  /** The first step of BPE tokenizer training: corpus-wide counts of
    * adjacent character pairs WITHIN tokens (pair occurrences weighted
    * by token frequency — exactly what the first merge rule ranks on),
    * top-K by (count desc, pair asc) so the cut is total-ordered and
    * deterministic.
    *
    * Scale: two Generates (token explode, in-token position explode —
    * both native, no interpreted lambdas in the hot path), one
    * map-side-combinable hash-agg on a tiny key domain (pairs of
    * characters), and a TakeOrderedAndProject — no full sort, no join,
    * one shuffle of pre-aggregated pair counts. Tokens shorter than 2
    * chars form no pair and are filtered BEFORE the position explode
    * (Spark's `sequence(1, 0)` counts DOWN rather than yielding empty).
    *
    * Output: (pair, cnt), `topK` rows. */
  def bpePairCounts(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) >= 2)
      .select(col("tok"),
        explode(sequence(lit(1), length(col("tok")) - 1)).as("i"))
      .select(col("tok").substr(col("i"), lit(2)).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(topK)
  }

  /** Full BPE tokenizer training (Sennrich et al. 2016): `nMerges`
    * rounds of "re-encode the corpus with the merges so far, count
    * adjacent piece pairs within tokens, adopt the most frequent pair"
    * — [[bpePairCounts]] is round one of exactly this. Ties break
    * (count desc, pair asc), so the learned list is deterministic.
    *
    * Scale: the corpus is exploded and tokenized ONCE, then collapsed
    * to the DISTINCT-token frequency table — pair counts per round are
    * the pair occurrences within each distinct token × that token's
    * corpus frequency, which is EXACTLY the per-occurrence count
    * (tokens are re-encoded identically wherever they occur, so every
    * occurrence of "lower" contributes the same pairs). Each round is
    * then one re-encode + hash-agg over VOCABULARY-sized rows — at a
    * 100 TB corpus that is millions of distinct tokens instead of
    * trillions of occurrences, the difference between a training loop
    * that runs and one that re-scans the corpus per merge. The driver
    * holds only the merge list itself (the MODEL), and each round
    * adopts up to `batchMerges` token-disjoint merges from one census
    * (provably equal to the serial greedy list — see the selection
    * rule below), cutting driver round-trips ~batchMerges× at real
    * vocab sizes. Stops early when no pair repeats. Apply the result
    * at scan speed with
    * [[graft.functions.GraftExpressions.bpeEncode]]. */
  def bpeTrain(
      docs: DataFrame,
      textCol: String,
      nMerges: Int,
      batchMerges: Int = 16,
      tokenizer: Column => Column = TextFunctions.tokens): Seq[(String, String)] = {
    require(nMerges > 0, "nMerges must be positive")
    require(batchMerges > 0, "batchMerges must be positive")
    val toks = Dedup.truncate(
      docs.select(explode(tokenizer(col(textCol))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("w")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < nMerges && !exhausted) {
      // One pair census per ROUND, adopting up to `batchMerges` merges
      // from it — the standard batched-BPE trick, with a selection rule
      // tight enough that the result is PROVABLY the serial greedy
      // list. Walk the (count desc, a, b)-sorted pairs keeping only
      // pairs whose tokens are disjoint from every earlier keep, and
      // CUT at the first conflict; then keep only the prefix whose
      // counts are STRICTLY above the cut count (`stop`). Sequential
      // replay of the kept prefix then picks exactly these pairs in
      // exactly this order: applying one kept merge leaves the other
      // kept pairs' counts untouched (disjoint tokens), only ever
      // lowers conflicting pairs, and any NEWLY CREATED pair (x, ab)
      // is bounded by the pre-merge count of (x, a) — a token-sharing
      // pair, hence ≤ stop < every kept count, so it can never win a
      // round (and strictness keeps tie-breaks out of reach). Ties at
      // the boundary simply wait for the next census.
      val want = nMerges - merges.size
      val top = toks
        .select(col("w"),
          GraftExpressions.bpeEncode(col("tok"), merges.toSeq).as("ps"))
        .filter(size(col("ps")) >= 2)
        .select(col("w"), col("ps"),
          explode(sequence(lit(1), size(col("ps")) - 1)).as("i"))
        .select(col("w"), element_at(col("ps"), col("i")).as("a"),
          element_at(col("ps"), col("i") + 1).as("b"))
        .groupBy(col("a"), col("b")).agg(sum(col("w")).as("c"))
        .filter(col("c") >= 2L)
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(batchMerges + 1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val cand = top.take(batchMerges)
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        // Everything below the fetched window: the (M+1)th count, or —
        // when the census fit entirely in the window — 1, i.e. below
        // the c ≥ 2 floor, so the whole batch qualifies.
        val boundary =
          if (top.length > batchMerges) top(batchMerges).getLong(2) else 1L
        val used = scala.collection.mutable.Set.empty[String]
        val picked =
          scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var stop = boundary
        var halted = false
        for ((a, b, c) <- cand if !halted) {
          if (used(a) || used(b)) { stop = c; halted = true }
          else { picked += ((a, b, c)); used += a; used += b }
        }
        val safe = picked.takeWhile(_._3 > stop).take(want)
        // A boundary tie can empty the safe prefix; the top-1 pair IS
        // the serial choice regardless, so progress is always made.
        if (safe.isEmpty) merges += ((cand.head._1, cand.head._2))
        else merges ++= safe.map(t => (t._1, t._2))
      }
    }
    merges.toSeq
  }

  /** Unigram-rarity quality signal: the fraction of a document's token
    * OCCURRENCES whose corpus document-frequency is below
    * `dfThreshold` — a log-free stand-in for unigram-LM perplexity
    * (rare-vocabulary-heavy docs score high; boilerplate scores ~0)
    * that stays exact-integer until one final IEEE divide, so the
    * DuckDB oracle matches bit-for-bit.
    *
    * Scale: the (doc, token) profile is one explode + hash-agg (the
    * exact-dedup shuffle shape), CHECKPOINTED because both the df
    * aggregate and the join-back consume it — the expression-id split
    * between the two subtrees defeats ReuseExchange, and recomputing
    * the corpus explode doubles the heaviest stage at 100 TB.
    * Document frequency is a hash-agg over the profile; the join back
    * is keyed on the token, and the df table is vocabulary-sized —
    * tiny next to the corpus, so AQE broadcasts it. (A window over
    * `tok` would save the join but puts every occurrence of a
    * stopword-grade token in ONE partition — the skew this shape
    * exists to avoid.) Never corpus×corpus. Docs that tokenize to
    * nothing drop, as across the dedup family.
    *
    * Output: (id, n_tokens, n_rare, rare_frac ∈ [0,1]). */
  def rarityScores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dfThreshold: Long): DataFrame = {
    require(dfThreshold > 0, "dfThreshold must be positive")
    val perDocTok = Dedup.truncate(docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c")))
    val dfs = perDocTok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    perDocTok.join(dfs, Seq("tok"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"),
        sum(when(col("df") < dfThreshold, col("c")).otherwise(0L)).as("n_rare"))
      .select(col(idCol), col("n_tokens"), col("n_rare"),
        round(col("n_rare").cast("double") / col("n_tokens").cast("double"), 6)
          .as("rare_frac"))
  }

  /** Bigram-LM document scoring (the CCNet/KenLM-style perplexity
    * quality signal): train an add-one-smoothed bigram model on the
    * corpus itself, then score every document by the mean negative
    * log-probability of its adjacent-token pairs,
    *
    *   P(y|x) = (c_xy + 1) / (c_x + V)      (V = vocabulary size)
    *   nll    = −(1/m) Σ ln P(y_i|x_i)      over the doc's m bigrams
    *
    * Boilerplate scores low (its bigrams are corpus-frequent);
    * gibberish and OCR noise score high. Cross-engine determinism
    * follows the [[Training.dsirWeights]] micro-nat idiom: each
    * bigram's log-probability is quantized ONCE to an integer
    * round(1e6·ln P) — the ln of a double built from exact integer
    * counts — and everything downstream is exact Long sums plus one
    * final IEEE divide, so the result is independent of partitioning
    * and summation order.
    *
    * Scale: one unigram and one bigram hash-agg (map-side combinable;
    * the gram explode is the native [[GraftExpressions.ShingleList]]),
    * one equi-join of the doc's bigram occurrences against the bigram
    * count table keyed on the gram (AQE broadcasts the count side when
    * it is small and skew-splits the stopword-grade hot grams when it
    * is not), a 1-row vocabulary-size attach, and a per-doc hash-agg
    * of exact Longs. Never corpus×corpus. Docs with fewer than two
    * tokens have no bigrams and drop, as across the dedup family.
    *
    * Output: (id, n_bigrams, nll in nats ≥ 0, 6-dp). */
  def lmPerplexity(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    lmScore(docs, lmModel(docs, textCol), idCol, textCol)

  /** A frozen bigram LM: unigram counts, bigram counts, and the 1-row
    * vocabulary size — the three tables [[lmScore]] joins against.
    * Train it once on a TRUSTED corpus and score anything (including
    * a stream, micro-batch by micro-batch) against it; persist the
    * three frames to reuse across jobs. */
  final case class LmModel(uni: DataFrame, bigrams: DataFrame,
    vocab: DataFrame)

  /** Train the add-one-smoothed bigram model of [[lmPerplexity]] on
    * `docs` — two hash-aggs and a 1-row count, nothing else. */
  def lmModel(docs: DataFrame, textCol: String): LmModel = {
    val toks = TextFunctions.tokens(col(textCol))
    val uni = docs.select(explode(toks).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c_x"))
    val big = docs
      .select(explode(GraftExpressions.shingleList(toks, 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c_xy"))
    LmModel(uni, big, uni.agg(count(lit(1)).as("v")))
  }

  /** Score `docs` against a (possibly frozen, separately trained)
    * [[LmModel]]. Bigrams and first tokens absent from the model
    * smooth through the same add-one formula with a count of 0 —
    * LEFT joins, so out-of-vocabulary text scores HIGH (maximally
    * surprising) instead of silently dropping. Self-scoring
    * (`lmScore(d, lmModel(d, …), …)`) reduces to the inner-join
    * semantics because every gram is then present. Works unchanged on
    * a micro-batch inside foreachBatch — the model side is static. */
  def lmScore(docs: DataFrame, model: LmModel, idCol: String,
      textCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val occ = docs.select(col(idCol),
      explode(GraftExpressions.shingleList(toks, 2)).as("bigram"))
      .withColumn("x", split(col("bigram"), " ").getItem(0))
    occ
      .join(model.bigrams, Seq("bigram"), "left")
      .join(model.uni.select(col("tok").as("x"), col("c_x")), Seq("x"),
        "left")
      .crossJoin(broadcast(model.vocab))
      .select(col(idCol),
        round(lit(1e6) * log(
          (coalesce(col("c_xy"), lit(0L)) + 1L).cast("double")
            / (coalesce(col("c_x"), lit(0L)) + col("v")).cast("double")))
          .cast("long").as("lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("lp_sum"))
      .select(col(idCol), col("n_bigrams"),
        round((-col("lp_sum")).cast("double") / 1e6
          / col("n_bigrams").cast("double"), 6).as("nll"))
  }

  /** Interpolated Kneser–Ney bigram model (fixed discount d = 0.75):
    * the count tables behind
    *
    *   P(y|x) = max(c(x,y) − d, 0)/ctx(x)
    *            + d·N1+(x,·)/ctx(x) · Pcont(y)
    *
    * where ctx(x) = Σ_y c(x,y), N1+(x,·) = distinct right-neighbors
    * of x, and the continuation probability is add-one smoothed so
    * the model is TOTAL over unseen events:
    * Pcont(y) = (N1+(·,y) + 1)/(N1+(·,·) + |Y|). An unseen context x
    * backs off to Pcont(y) alone. KN is the smoothing that actually
    * ships in KenLM-style corpus filters — it discounts raw bigram
    * mass toward how PROMISCUOUS a continuation is, so "francisco"
    * (frequent but only ever after "san") stops looking probable in
    * novel contexts, which add-one ([[lmModel]]) gets exactly wrong. */
  final case class KnModel(bigrams: DataFrame, ctx: DataFrame,
    cont: DataFrame, totals: DataFrame)

  /** Train [[KnModel]] on `docs`: one bigram census, two hash-aggs
    * over it (left/right marginals), one 1-row totals agg. */
  def knModel(docs: DataFrame, textCol: String): KnModel = {
    val toks = TextFunctions.tokens(col(textCol))
    val big = docs
      .select(explode(GraftExpressions.shingleList(toks, 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c_xy"))
    val sp = big.select(col("bigram"), col("c_xy"),
      split(col("bigram"), " ").getItem(0).as("x"),
      split(col("bigram"), " ").getItem(1).as("y"))
    KnModel(
      bigrams = big,
      ctx = sp.groupBy(col("x")).agg(sum(col("c_xy")).as("ctx"),
        count(lit(1)).as("n1p_l")),
      cont = sp.groupBy(col("y")).agg(count(lit(1)).as("n1p_r")),
      totals = sp.agg(count(lit(1)).as("n1pp"),
        countDistinct(col("y")).as("cv")))
  }

  /** KN-smoothed per-document NLL against a (possibly frozen)
    * [[KnModel]] — [[lmScore]]'s shape with the KN probability.
    * Cross-engine determinism by the standard idiom: per-occurrence
    * log-prob quantized to integer micro-nats from a fixed IEEE
    * chain over exact counts, exact integer sum per doc, one final
    * divide. Model tables join on bigram/x/y keys; totals broadcast.
    * Output: (id, n_bigrams, nll [6 dp]). */
  def knScore(docs: DataFrame, model: KnModel, idCol: String,
      textCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val occ = docs.select(col(idCol),
      explode(GraftExpressions.shingleList(toks, 2)).as("bigram"))
      .select(col(idCol), col("bigram"),
        split(col("bigram"), " ").getItem(0).as("x"),
        split(col("bigram"), " ").getItem(1).as("y"))
    val pcont = (coalesce(col("n1p_r"), lit(0L)) + lit(1L)).cast("double") /
      (col("n1pp") + col("cv")).cast("double")
    val pSeen =
      greatest(coalesce(col("c_xy"), lit(0L)).cast("double") - lit(0.75),
        lit(0.0)) / col("ctx").cast("double") +
        (lit(0.75) * col("n1p_l").cast("double") / col("ctx").cast("double")) *
          pcont
    occ
      .join(model.bigrams, Seq("bigram"), "left")
      .join(model.ctx, Seq("x"), "left")
      .join(model.cont, Seq("y"), "left")
      .crossJoin(broadcast(model.totals))
      .select(col(idCol),
        round(lit(1e6) *
          log(when(col("ctx").isNotNull, pSeen).otherwise(pcont)))
          .cast("long").as("lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("lp_sum"))
      .select(col(idCol), col("n_bigrams"),
        round((-col("lp_sum")).cast("double") / 1e6
          / col("n_bigrams").cast("double"), 6).as("nll"))
  }

  /** Windowed skip-gram co-occurrence census — the GloVe/word2vec
    * preprocessing table: for every unordered token pair within
    * `window` positions of each other (in the same document), the
    * raw co-occurrence count and the distance-weighted count
    * Σ 1/offset in exact integer MICRO-units (1e6 div offset — the
    * standard harmonic down-weighting without a float in sight, so
    * counts are bit-stable across engines and partitionings). Pairs
    * are canonicalized (a ≤ b) so "x near y" and "y near x"
    * accumulate together; a token co-occurring with itself counts
    * like any pair.
    *
    * Scale: offsets explode the token stream `window`-fold and
    * everything is map-only until ONE (a, b) hash-agg — the heavy
    * keys are stopword pairs and they map-side combine; `minCount`
    * cuts the long tail before it ships. Never corpus×corpus.
    *
    * Output: (a, b, c, w_micro), c ≥ minCount. */
  def skipgramCounts(
      docs: DataFrame,
      textCol: String,
      window: Int,
      minCount: Long): DataFrame = {
    require(window >= 1, "window must be at least 1")
    val t = TextFunctions.tokens(col(textCol))
    docs
      .select(t.as("t"),
        explode(sequence(lit(1), lit(window))).as("off"))
      .filter(size(col("t")) > col("off"))
      .select(col("off"), explode(expr(
        "zip_with(slice(t, 1, size(t) - off), " +
          "slice(t, off + 1, size(t) - off), " +
          "(x, y) -> struct(x, y))")).as("p"))
      .select(least(col("p.x"), col("p.y")).as("a"),
        greatest(col("p.x"), col("p.y")).as("b"),
        expr("CAST(1000000 DIV off AS BIGINT)").as("w"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c"), sum(col("w")).as("w_micro"))
      .filter(col("c") >= minCount)
  }

  /** A frozen multinomial Naive-Bayes text classifier — the
    * fasttext-shaped quality/domain classifier of the DCLM /
    * FineWeb-Edu filtering recipes, trained in ONE pass: `priors` is
    * per-class micro-nat log prior (C rows), `weights` the DENSE
    * (token × class) micro-nat log likelihoods (V·C rows — model-
    * sized, never corpus-sized). Train on a labeled seed set with
    * [[nbModel]], persist the two frames, and score any corpus (or
    * stream micro-batch — both sides of the scoring join are static)
    * with [[nbClassify]]. */
  final case class NbModel(priors: DataFrame, weights: DataFrame)

  /** Train the add-one-smoothed multinomial NB model on `docs` labeled
    * by `classCol`:
    *
    *   w(t,c)   = ln((c_tc + 1) / (n_c + V))   (token likelihood)
    *   prior(c) = ln(d_c / d)                  (document prior)
    *
    * with c_tc = occurrences of token t in class c, n_c = total token
    * occurrences in c, V = training vocabulary size, d_c/d = document
    * counts. Each ln is quantized ONCE to integer micro-nats
    * (round(1e6·ln), the [[lmScore]] idiom) so scoring downstream is
    * exact Long sums — bit-stable across engines and partitionings.
    *
    * The weights table is DENSE over (training vocabulary × classes):
    * a token seen in SOME class still votes in every other via the
    * smoothed zero-count weight — that asymmetry (n_c differs) is
    * real evidence, and density keeps scoring a single equi-join.
    *
    * Scale: one (class, token) hash-agg (map-side combinable — the
    * heavy keys are stopword-grade tokens), a vocabulary×classes
    * left join to densify (both sides model-sized), and two tiny
    * document-count aggs. Never corpus×corpus. */
  def nbModel(docs: DataFrame, textCol: String, classCol: String)
      : NbModel = {
    val occ = docs.select(col(classCol).as("cls"),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val ctc = occ.groupBy(col("cls"), col("tok"))
      .agg(count(lit(1)).as("c_tc"))
    val nc = ctc.groupBy(col("cls")).agg(sum(col("c_tc")).as("n_c"))
    val vocabN = ctc.select(col("tok")).distinct()
      .agg(count(lit(1)).as("v"))
    val weights = ctc.select(col("tok")).distinct()
      .crossJoin(broadcast(nc))
      .join(ctc, Seq("tok", "cls"), "left")
      .crossJoin(broadcast(vocabN))
      .select(col("tok"), col("cls"),
        round(lit(1e6) * log(
          (coalesce(col("c_tc"), lit(0L)) + 1L).cast("double")
            / (col("n_c") + col("v")).cast("double")))
          .cast("long").as("w_mnat"))
    val dc = docs.groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("d_c"))
    val priors = dc.crossJoin(broadcast(docs.agg(count(lit(1)).as("d"))))
      .select(col("cls"),
        round(lit(1e6) * log(
          col("d_c").cast("double") / col("d").cast("double")))
          .cast("long").as("prior_mnat"))
    NbModel(priors, weights)
  }

  /** Score `docs` against a (separately trained, possibly frozen)
    * [[NbModel]] and pick each document's argmax class. Tokens outside
    * the training vocabulary carry no class evidence and are ignored
    * (the sklearn MultinomialNB stance — only the model's features
    * vote); documents with NO in-vocabulary token drop, as across the
    * dedup family. Ties break to the lexicographically smallest class
    * by negating the integer SCORE, never the class ([[Similarity
    * .knnClassify]]'s rule), so labels of any orderable type work.
    *
    * Scale: one token explode, one equi-join on the token against the
    * V·C-row weights table (AQE broadcasts it when small and
    * skew-splits stopword-grade hot tokens when not), a per-(doc,
    * class) hash-agg of exact Longs — C rows per doc — then a per-doc
    * argmax hash-agg and a C-row broadcast prior attach. Never
    * corpus×corpus.
    *
    * Output: (id, pred, score_mnat, n_vocab_toks) — score in integer
    * micro-nats of the winning class's log posterior (up to the shared
    * evidence constant), n_vocab_toks the in-vocabulary occurrence
    * count the verdict rests on. */
  def nbClassify(docs: DataFrame, model: NbModel, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .join(model.weights, Seq("tok"))
      .groupBy(col(idCol), col("cls"))
      .agg(sum(col("w_mnat")).as("ev"), count(lit(1)).as("n"))
      .join(broadcast(model.priors), Seq("cls"))
      .select(col(idCol), col("cls"),
        (col("ev") + col("prior_mnat")).as("score"), col("n"))
      .groupBy(col(idCol))
      .agg(
        min_by(col("cls"), struct((-col("score")).as("s"), col("cls")))
          .as("pred"),
        max(col("score")).as("score_mnat"),
        max(col("n")).as("n_vocab_toks"))

  /** Vocabulary census per group (the Heaps'-law dashboard): total
    * token count, distinct-type count, type/token ratio, and the hapax
    * fraction — the share of types seen exactly once, i.e. the growth
    * frontier of the vocabulary. A corpus whose hapax fraction stays
    * high as it grows keeps yielding new vocabulary; one whose TTR
    * collapses is re-crawling itself (a dedup smell at the corpus
    * level, complementary to the per-document signals).
    *
    * Scale: one token explode into a (group, token) hash-agg — the
    * heavy keys are the frequent tokens and they map-side combine —
    * then a per-group rollup over the vocabulary (bounded by type
    * count, not token count). Never holds a vocabulary in one task's
    * memory as a collection. Output: (group, n_tokens, n_types,
    * n_hapax, type_token_ratio, hapax_frac). */
  def vocabStats(docs: DataFrame, textCol: String, groupCol: String)
      : DataFrame =
    docs
      .select(col(groupCol), explode(TextFunctions.tokens(col(textCol)))
        .as("tok"))
      .groupBy(col(groupCol), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(groupCol))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col(groupCol), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types").cast("double")
          / col("n_tokens").cast("double"), 6).as("type_token_ratio"),
        round(col("n_hapax").cast("double")
          / col("n_types").cast("double"), 6).as("hapax_frac"))

  /** Mixed-script (confusable) token census per group — the homoglyph
    * spoof smell: a token mixing Cyrillic/Greek letters INTO a Latin
    * word ("pаypal" with U+0430) is how phishing URLs, poisoned
    * anchors and adversarial near-dup evasions read; legitimate text
    * switches script BETWEEN tokens, not inside them. Flags a token
    * when it contains both a Latin letter and a Cyrillic/Greek one
    * (the confusable pairs that matter — CJK-Latin mixing is normal).
    *
    * Scale: map-only per doc (token filter, two regex probes per
    * token), then one hash-agg. Output: (group, n_docs,
    * n_docs_mixed, n_mixed_tokens). */
  def spoofCensus(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String): DataFrame = {
    val mixed = filter(TextFunctions.tokens(col(textCol)),
      t => t.rlike("[\\p{IsCyrillic}\\p{IsGreek}]") && t.rlike("[a-z]"))
    docs
      .select(col(groupCol), size(mixed).as("__nm"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__nm") > 0, 1L).otherwise(0L)).as("n_docs_mixed"),
        sum(col("__nm")).as("n_mixed_tokens"))
  }

  /** Per-doc LINE census — the axis C4/RefinedWeb actually clean on
    * (line-level rules catch navigation, bullets, and chrome that
    * sentence- and token-level signals smear away): total lines,
    * blank lines, and over the non-blank lines the bullet fraction
    * (starts with -, *, or •), the short fraction (trimmed length
    * < `shortChars`), and the terminal-punctuation fraction (rtrim
    * ends in . ! ? or "). Fractions are micro-exact with non-blank
    * denominators, NULL when every line is blank.
    *
    * Scale: map-only — one newline split + array folds per row.
    * Output: (idCol, n_lines, n_blank, bullet_frac_micro,
    * short_frac_micro, terminal_frac_micro). */
  def lineCensus(
      docs: DataFrame, idCol: String, textCol: String,
      shortChars: Int = 10): DataFrame = {
    val lines = split(col(textCol), "\n")
    val nb = filter(lines, l => length(trim(l)) > 0)
    val frac = (p: Column => Column) =>
      when(size(col("__nb")) === 0, lit(null).cast("long"))
        .otherwise(round(lit(1e6) *
          size(filter(col("__nb"), p)).cast("double") /
          size(col("__nb")).cast("double")).cast("long"))
    docs.select(col(idCol), lines.as("__all"), nb.as("__nb"))
      .select(col(idCol),
        size(col("__all")).cast("long").as("n_lines"),
        (size(col("__all")) - size(col("__nb"))).cast("long")
          .as("n_blank"),
        frac(l => trim(l).rlike("^[-*•]")).as("bullet_frac_micro"),
        frac(l => length(trim(l)) < shortChars).as("short_frac_micro"),
        frac(l => rtrim(l).rlike("[.!?\"]$")).as("terminal_frac_micro"))
  }

  /** C4's line-level scrub (Raffel et al. 2020 §2.2): keep only
    * lines that end in terminal punctuation AND carry at least
    * `minWords` whitespace words, rebuild the document from the
    * survivors — the single most effective web-text cleanup rule
    * (navigation, bullets, cookie banners and footers all die here).
    * Kept lines rejoin with the original newline; a doc with no
    * surviving line keeps an EMPTY string (drop it with the
    * n_kept = 0 census, a modeling choice this operator won't make
    * for you).
    *
    * Scale: map-only split + filter + rejoin per row. Output:
    * (idCol, text_clean, n_kept, n_dropped). */
  def scrubLines(
      docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 3): DataFrame = {
    require(minWords >= 1, "minWords must be at least 1")
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l =>
      rtrim(l).rlike("[.!?\"]$") &&
        size(split(trim(l), "\\s+")) >= minWords)
    docs.select(col(idCol), lines.as("__all"), kept.as("__k"))
      .select(col(idCol),
        array_join(col("__k"), "\n").as("text_clean"),
        size(col("__k")).cast("long").as("n_kept"),
        (size(col("__all")) - size(col("__k"))).cast("long")
          .as("n_dropped"))
  }

  /** Corpus-frequent line census — the cross-doc half of line-level
    * cleaning ([[scrubLines]] judges a line alone; this one asks the
    * CORPUS): a trimmed non-blank line appearing in ≥ `minDf`
    * distinct documents is boilerplate by definition — navigation,
    * footers, cookie banners repeat verbatim across a site while
    * content does not (the CCNet/RefinedWeb frequent-line rule).
    *
    * Scale: one explode + one (line)-keyed hash-agg with a distinct
    * doc count — map-side combinable, never doc×doc. Output:
    * (line, df), trimmed lines, df ≥ minDf. */
  def frequentLines(
      docs: DataFrame, idCol: String, textCol: String,
      minDf: Long): DataFrame = {
    require(minDf >= 2, "minDf below 2 would flag every line")
    docs.select(col(idCol).as("__id"),
        explode(split(col(textCol), "\n")).as("__line"))
      .select(col("__id"), trim(col("__line")).as("line"))
      .filter(length(col("line")) > 0)
      .groupBy(col("line"))
      .agg(countDistinct(col("__id")).as("df"))
      .filter(col("df") >= minDf)
  }

  /** Remove corpus-frequent lines ([[frequentLines]] with
    * `maxDf`) from every document and rebuild it in original line
    * order. Blank lines are structure, not boilerplate — kept. A doc
    * whose every line is boilerplate keeps an EMPTY string and a
    * zero count (drop on the census downstream).
    *
    * Scale: the frequent set comes from one corpus line census; the
    * removal is a line-keyed anti-join (equi on the trimmed line);
    * reassembly sorts each doc's surviving (pos, line) pairs inside
    * a per-doc aggregate — state bounded by the doc's own line
    * count, order deterministic under any partitioning. Output:
    * (idCol, text_clean, n_kept, n_dropped). */
  def scrubFrequentLines(
      docs: DataFrame, idCol: String, textCol: String,
      maxDf: Long): DataFrame = {
    val freq = frequentLines(docs, idCol, textCol, maxDf)
      .select(col("line").as("__fk"))
    val e = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("__i", "__line")))
    val re = e.join(freq, trim(col("__line")) === col("__fk"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("__i"), col("__line")))),
          s => s.getField("__line")), "\n").as("text_clean"))
    docs.select(col(idCol),
        size(split(col(textCol), "\n")).cast("long").as("__n"))
      .join(re, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** Heaps'-law vocabulary-growth census: cumulative token count vs
    * cumulative distinct-type count in document order — the
    * "how fast does my vocabulary grow" curve a tokenizer owner
    * reads before sizing a vocab (Heaps: V ≈ K·nᵝ, β from the
    * log-log slope; see [[graft.operators.TimeSeries.groupOls]] on
    * this output for the fit). Each type is counted at its FIRST
    * document (min doc id), so the census is exact, not sampled.
    *
    * The ln columns are MILLI-nat quantized (not the usual micro) —
    * deliberately: the downstream OLS fit multiplies n·Σxy, and
    * milli-nats keep that product inside int64 at any corpus size
    * that fits the census itself.
    *
    * Scale: one explode + two hash-aggs (per-token first doc,
    * per-doc counts), then two range-partitioned prefix sums
    * ([[Ranking.groupRunningSum]] — no single-partition window).
    * Output: (idCol, n_toks, new_types, cum_tokens, cum_types,
    * ln_tokens_milli, ln_types_milli), one row per doc WITH tokens. */
  def vocabGrowth(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = Dedup.truncate(docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("__tok")))
    val firsts = tok.groupBy(col("__tok"))
      .agg(min(col(idCol)).as(idCol))
      .groupBy(col(idCol)).agg(count(lit(1)).as("new_types"))
    val perDoc = tok.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"))
      .join(firsts, Seq(idCol), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
      .withColumn("__g", lit(1))
    val cumTok = Ranking.groupRunningSum(perDoc, "__g", Seq(idCol),
      "n_toks").withColumnRenamed("running", "cum_tokens")
    val lnq3 = (c: Column) =>
      round(lit(1e3) * log(c.cast("double"))).cast("long")
    Ranking.groupRunningSum(cumTok, "__g", Seq(idCol), "new_types")
      .withColumnRenamed("running", "cum_types")
      .select(col(idCol), col("n_toks"), col("new_types"),
        col("cum_tokens"), col("cum_types"),
        lnq3(col("cum_tokens")).as("ln_tokens_milli"),
        lnq3(col("cum_types")).as("ln_types_milli"))
  }

  /** Collapse CONSECUTIVE duplicate lines within each document —
    * the scraped-page stutter (repeated nav rows, pagination echoes,
    * terminal-log spam) that survives [[scrubFrequentLines]] because
    * the repeats live inside ONE doc. A line survives when it
    * differs from its immediate predecessor (trimmed comparison, so
    * indentation echoes collapse too); first line always survives.
    *
    * Scale: map-only — one split + one indexed array filter per row,
    * no explode, no shuffle. Output: (idCol, text_clean, n_kept,
    * n_dropped). */
  def collapseRepeatedLines(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    // filter's (element, index) form: index is 0-based, element_at is
    // 1-based, so element_at(__all, i) IS the predecessor of element i.
    docs.select(col(idCol), lines.as("__all"))
      .select(col(idCol), col("__all"),
        filter(col("__all"), (l, i) =>
          i === 0 || trim(l) =!= trim(element_at(col("__all"), i)))
          .as("__k"))
      .select(col(idCol),
        array_join(col("__k"), "\n").as("text_clean"),
        size(col("__k")).cast("long").as("n_kept"),
        (size(col("__all")) - size(col("__k"))).cast("long")
          .as("n_dropped"))
  }

  /** Per-doc sentence census over [[TextFunctions.sentenceSplit]]'s
    * heuristic segments — the unit Gopher-style quality rules count
    * in ("≥ 3 sentences", "ends in terminal punctuation", "mean
    * sentence length sane"): n_sentences, micro-mean and max trimmed
    * sentence length, and the ends-punct verdict (ASCII or fullwidth
    * terminator — CJK documents segment on 。！？ and count real
    * sentences here, not a fake 1-sentence doc). Sentence-less text
    * (empty, or whitespace-terminated punctuation runs) reports 0
    * with NULL lengths.
    *
    * Scale: map-only — one split + two array folds per row, no
    * explode, no shuffle. Output: (idCol, n_sentences,
    * mean_len_micro, max_len, ends_punct). */
  def sentenceStats(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lens = transform(TextFunctions.sentenceSplit(col(textCol)),
      s => length(trim(s)).cast("long"))
    docs.select(col(idCol), lens.as("__l"),
        rtrim(col(textCol)).rlike("[.!?。！？]$").as("ends_punct"))
      .select(col(idCol),
        size(col("__l")).cast("long").as("n_sentences"),
        when(size(col("__l")) === 0, lit(null).cast("long"))
          .otherwise(round(lit(1e6) *
            aggregate(col("__l"), lit(0L), (acc, x) => acc + x)
              .cast("double") / size(col("__l")).cast("double"))
            .cast("long")).as("mean_len_micro"),
        when(size(col("__l")) === 0, lit(null).cast("long"))
          .otherwise(array_max(col("__l"))).as("max_len"),
        col("ends_punct"))
  }

  def charEntropy(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val txt = lower(col(textCol))
    // One-pass native census (GraftExpressions.CharNgramStats): the
    // explode + (doc, gram)-keyed shuffle this replaces was the
    // bench's single most expensive query — same quantization, zero
    // shuffles. The length guard keeps short docs absent, matching
    // the "no distribution" contract (and the former sequence(1, k)
    // descending-range trap).
    docs.filter(length(txt) >= n)
      .select(col(idCol),
        GraftExpressions.charNgramStats(txt, n).as("__st"))
      .select(col(idCol), col("__st.n_grams").as("n_grams"),
        col("__st.distinct_grams").as("distinct_grams"),
        col("__st.entropy_mnat").as("entropy_mnat"))
  }

  /** RAKE keyword census (Rose et al. 2010) over the corpus:
    * candidate phrases are the maximal token runs BETWEEN stopwords,
    * each word scores degree/frequency (degree = Σ length of every
    * phrase occurrence containing it — co-occurrence including
    * self), and a phrase scores the sum of its words' scores. The
    * classic single-document extractor, run corpus-wide so the
    * scores see global co-occurrence (the per-doc form is this with
    * one doc).
    *
    * Mechanics: stopwords mark as a TAB sentinel inside the token
    * array (tokens can never contain whitespace), one regex split
    * recovers the runs — no per-token shuffle, phrases are born
    * map-side. Phrases longer than `maxPhraseWords` drop (the RAKE
    * convention; unbounded runs on stopword-free text are not
    * keywords). Word scores are ONE micro-divide of exact counts;
    * phrase scores are exact Long sums of those micros, computed
    * once per DISTINCT phrase (vocabulary-space join, never
    * occurrence×vocabulary).
    * Output: (phrase, n_words, n_occ, n_docs, score_micro). */
  def rakeKeywords(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String],
      maxPhraseWords: Int = 8): DataFrame = {
    require(stopwords.nonEmpty, "stopwords must be non-empty")
    require(maxPhraseWords >= 1, "maxPhraseWords must be positive")
    val toks = TextFunctions.tokens(col(textCol))
    val marked = transform(toks, t =>
      when(t.isin(stopwords: _*), lit("\t")).otherwise(t))
    val runs = filter(
      split(array_join(marked, " "), "( ?\\t ?)+"),
      p => length(p) > 0)
    val occ = Dedup.truncate(docs
      .select(col(idCol).as("__id"),
        posexplode(runs).as(Seq("__pidx", "phrase")))
      .withColumn("n_words",
        size(split(col("phrase"), " ")).cast("long"))
      .filter(col("n_words") <= maxPhraseWords))
    val scores = occ
      .select(explode(split(col("phrase"), " ")).as("__w"),
        col("n_words"))
      .groupBy(col("__w"))
      .agg(count(lit(1)).as("__freq"), sum(col("n_words")).as("__deg"))
      .select(col("__w"),
        round(lit(1e6) * col("__deg").cast("double") /
          col("__freq").cast("double")).cast("long").as("__s"))
    val census = occ.groupBy(col("phrase"), col("n_words"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("__id")).as("n_docs"))
    val phraseScore = census.select(col("phrase")).distinct()
      .select(col("phrase"),
        explode(split(col("phrase"), " ")).as("__w"))
      .join(scores, Seq("__w"))
      .groupBy(col("phrase"))
      .agg(sum(col("__s")).as("score_micro"))
    census.join(phraseScore, Seq("phrase"))
      .select(col("phrase"), col("n_words"), col("n_occ"),
        col("n_docs"), col("score_micro"))
  }

  /** Flesch reading-ease + Flesch–Kincaid grade per document — the
    * classic readability pair a curriculum/quality pipeline bins on.
    * Words are whitespace tokens, sentences the shared
    * [[TextFunctions.sentenceSplit]] segmenter, and syllables the
    * standard VOWEL-GROUP proxy (runs of `[aeiouy]+` in the
    * lower-cased text — a dictionary-free approximation, stated: a
    * vowelless token contributes 0, which slightly inflates ease on
    * symbol-heavy text; both engines apply the identical proxy).
    * FRE = 206.835 − 1.015·W/S − 84.6·Y/W and
    * FK = 0.39·W/S + 11.8·Y/W − 15.59 are scalar IEEE off exact
    * integer counts, micro-rounded once. Zero words or zero
    * sentences → NULL scores (the formulas are undefined).
    * Scale: three per-row counters, no shuffle at all.
    * Output: (idCol, n_words, n_sentences, n_syllables, fre_micro,
    * fk_grade_micro). */
  def readabilityCensus(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val w = TextFunctions.tokenCount(col(textCol)).cast("long")
    val s = size(TextFunctions.sentenceSplit(col(textCol))).cast("long")
    val y = size(regexp_extract_all(lower(col(textCol)),
      lit("[aeiouy]+"), lit(0))).cast("long")
    val base = docs.select(col(idCol), w.as("n_words"),
      s.as("n_sentences"), y.as("n_syllables"))
    val ws = col("n_words").cast("double") /
      col("n_sentences").cast("double")
    val yw = col("n_syllables").cast("double") /
      col("n_words").cast("double")
    val ok = col("n_words") > 0L && col("n_sentences") > 0L
    base.select(col(idCol), col("n_words"), col("n_sentences"),
      col("n_syllables"),
      when(ok, round(lit(1e6) *
          (lit(206.835) - lit(1.015) * ws - lit(84.6) * yw))
          .cast("long"))
        .otherwise(lit(null).cast("long")).as("fre_micro"),
      when(ok, round(lit(1e6) *
          (lit(0.39) * ws + lit(11.8) * yw - lit(15.59)))
          .cast("long"))
        .otherwise(lit(null).cast("long")).as("fk_grade_micro"))
  }

  /** Good–Turing adjusted counts per group — the frequency-of-
    * frequencies census behind every smoothed language model (and the
    * "how much unseen mass is left" question a corpus curator asks
    * before deciding whether more crawling pays): for each observed
    * count r, N_r = how many distinct tokens occur exactly r times,
    * the adjusted count r* = (r+1)·N_{r+1}/N_r, and the group-level
    * unseen-mass estimate P0 = N_1/T (T = total token instances,
    * Good 1953). Two stacked exact censuses (token counts →
    * count-of-counts) + a self-join on r+1, group-local and
    * shuffle-minimal; the r-star and P0 divides are the only floats,
    * micro-rounded from exact integers. Rows are emitted for
    * r ≤ maxR; a missing N_{r+1} (gap in the spectrum) reports NULL
    * r* — the caller's smoothing has to bridge the gap, not us.
    * Output: (groupCol, r, n_r, r_star_micro, p0_micro — the group
    * constant repeated per row, oracle-shape flat). */
  def goodTuring(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      maxR: Int): DataFrame = {
    require(maxR >= 1, "maxR must be at least 1")
    val tok = df.select(col(groupCol).as("__g"),
        explode(TextFunctions.tokens(col(textCol))).as("__w"))
      .groupBy(col("__g"), col("__w"))
      .agg(count(lit(1)).as("__r"))
    val spectrum = tok.groupBy(col("__g"), col("__r"))
      .agg(count(lit(1)).as("n_r"))
    val tot = spectrum.groupBy(col("__g"))
      .agg(sum(col("__r") * col("n_r")).as("__t"),
        sum(when(col("__r") === 1L, col("n_r"))).as("__n1"))
    val nxt = spectrum.select(col("__g"),
      (col("__r") - 1L).as("__r"), col("n_r").as("__nrNext"))
    spectrum.filter(col("__r") <= maxR.toLong)
      .join(nxt, Seq("__g", "__r"), "left")
      .join(broadcast(tot), Seq("__g"))
      .select(col("__g").as(groupCol), col("__r").as("r"),
        col("n_r"),
        round(lit(1e6) * (col("__r") + 1L).cast("double") *
          col("__nrNext").cast("double") / col("n_r").cast("double"))
          .cast("long").as("r_star_micro"),
        round(lit(1e6) * coalesce(col("__n1"), lit(0L)).cast("double") /
          col("__t").cast("double")).cast("long").as("p0_micro"))
  }

  /** Lexical-richness census per group — the vocabulary-health
    * numbers a corpus curator reads next to [[goodTuring]]'s
    * spectrum: type-token ratio V/T, Yule's K = 10⁴·(Σr²N_r − T)/T²
    * (repeat-rate, length-robust where TTR is not), and Simpson's
    * D = Σr(r−1)N_r / (T(T−1)) (the probability two random tokens
    * are the same type — boilerplate and template spam push it up).
    * One token census + one spectrum fold, every sum exact
    * DECIMAL(38,0), one micro-rounded divide per statistic.
    * Output: (groupCol, n_tokens, n_types, ttr_micro, yule_k_micro,
    * simpson_micro). */
  def lexicalRichness(
      df: DataFrame,
      groupCol: String,
      textCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val counts = df.select(col(groupCol).as("__g"),
        explode(TextFunctions.tokens(col(textCol))).as("__w"))
      .groupBy(col("__g"), col("__w"))
      .agg(count(lit(1)).as("__r"))
    val t = col("n_tokens").cast("double")
    counts.groupBy(col("__g"))
      .agg(sum(col("__r")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum((col("__r").cast(dec) * col("__r")).cast(dec)).as("__s2"),
        sum((col("__r").cast(dec) * (col("__r") - 1L)).cast(dec))
          .as("__s11"))
      .select(col("__g").as(groupCol), col("n_tokens"), col("n_types"),
        round(lit(1e6) * col("n_types").cast("double") / t)
          .cast("long").as("ttr_micro"),
        round(lit(1e10) *
          (col("__s2") - col("n_tokens").cast(dec)).cast("double") /
          (t * t)).cast("long").as("yule_k_micro"),
        when(col("n_tokens") > 1L,
          round(lit(1e6) * col("__s11").cast("double") /
            (t * (t - 1.0))).cast("long"))
          .otherwise(lit(null).cast("long")).as("simpson_micro"))
  }

  /** Dunning log-likelihood keyness (Dunning 1993's G² — the corpus-
    * linguistics "what words characterize THIS slice" ranking, and
    * the significance-aware cousin of a plain frequency-ratio):
    * split the corpus by the boolean `focusCol`, census each token's
    * occurrences a (focus) / b (reference) against the subcorpus
    * totals A / B, and score
    *
    *   G² = 2·( a·ln(a/E₁) + b·ln(b/E₂) ),  Eᵢ = (a+b)·{A,B}/(A+B)
    *
    * with zero-count terms dropping out exactly (x·ln x → 0). The
    * two ln ratios are single IEEE chains over exact integer counts
    * (the totals ride one broadcast row), and ONE micro-rounding at
    * the end; `direction` is the sign of the EXACT integer cross
    * product a·B − b·A (+1 = over-represented in focus), so the
    * verdict never hangs on a float. Tokens below `minTotal`
    * combined occurrences are dropped — the bounded-output guard
    * that keeps the result model-sized, censused per call by the
    * caller's spectrum if needed.
    *
    * Scale: one (token, focus) hash-agg (map-side combinable), the
    * 1-row totals broadcast, then a scalar map. No windows, no
    * joins wider than the token census.
    * Output: (token, c_focus, c_ref, g2_micro, direction). */
  def keyness(
      df: DataFrame,
      textCol: String,
      focusCol: String,
      minTotal: Long = 20L): DataFrame = {
    val dec = "decimal(38,0)"
    val cens = df.select(col(focusCol).cast("boolean").as("__f"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(sum(when(col("__f"), 1L).otherwise(0L)).as("c_focus"),
        sum(when(col("__f"), 0L).otherwise(1L)).as("c_ref"))
    // A/B are the FULL subcorpus token totals — the minTotal cut
    // bounds the OUTPUT, it must not bias the expected frequencies.
    val tot = cens.agg(sum(col("c_focus").cast(dec)).as("__ca"),
      sum(col("c_ref").cast(dec)).as("__cb"))
    val tok = cens.filter(col("c_focus") + col("c_ref") >= minTotal)
    val a = col("c_focus").cast("double")
    val b = col("c_ref").cast("double")
    val ta = col("__ca").cast("double")
    val tb = col("__cb").cast("double")
    val term1 = when(col("c_focus") > 0L,
      a * log(a * (ta + tb) / ((a + b) * ta))).otherwise(lit(0.0))
    val term2 = when(col("c_ref") > 0L,
      b * log(b * (ta + tb) / ((a + b) * tb))).otherwise(lit(0.0))
    tok.crossJoin(broadcast(tot))
      .select(col("token"), col("c_focus"), col("c_ref"),
        round(lit(2e6) * (term1 + term2)).cast("long").as("g2_micro"),
        signum((col("c_focus").cast(dec) * col("__cb") -
          col("c_ref").cast(dec) * col("__ca")).cast("double"))
          .cast("int").as("direction"))
  }

  /** Burrows' Delta stylometric distance between authors (Burrows
    * 2002 — the attribution workhorse: who wrote this, do these two
    * sources share a template/boilerplate generator): take the
    * corpus-wide `topK` most-frequent tokens (function words
    * dominate, which is the point — style lives in "the/of/and"
    * rates, not topic words), z-score each author's RELATIVE
    * frequency of each marker token across authors, and
    *
    *   Δ(a,b) = (1/K)·Σ_t | z_a(t) − z_b(t) |.
    *
    * Relative frequencies micro-round BEFORE the cross-author
    * moments, so mean/σ run on exact integers and each z is ONE
    * sqrt + divide of exact polynomials: z = (f·n_A − Σf) /
    * √(n_A·Σf² − (Σf)²), micro-rounded — engine-exact. Marker
    * tokens that every author uses at the SAME rounded rate (zero
    * variance) carry no signal and drop; k_used reports the
    * surviving marker count. The author grid is DENSE (an author
    * missing a marker scores f = 0 — that absence IS style).
    *
    * Scale: token census → global top-K via TakeOrdered (no full
    * sort); the grid and everything after is (authors × topK) —
    * model-sized. The author×author join is quadratic in AUTHORS
    * (sources, not documents) — the intended regime; block first if
    * you have millions of authors. Output: (author_a, author_b,
    * k_used, delta_micro), pairs a < b. */
  def burrowsDelta(
      df: DataFrame,
      authorCol: String,
      textCol: String,
      topK: Int = 50): DataFrame = {
    require(topK >= 2, "topK must be at least 2")
    val dec = "decimal(38,0)"
    val counts = df.select(col(authorCol).as("__a"),
        explode(TextFunctions.tokens(col(textCol))).as("__w"))
      .groupBy(col("__a"), col("__w"))
      .agg(count(lit(1)).as("__c"))
    val totals = counts.groupBy(col("__a")).agg(sum(col("__c")).as("__t"))
    val top = counts.groupBy(col("__w")).agg(sum(col("__c")).as("__tot"))
      .orderBy(col("__tot").desc, col("__w").asc)
      .limit(topK).select(col("__w"))
    val grid = totals.crossJoin(broadcast(top))
      .join(counts, Seq("__a", "__w"), "left")
      .select(col("__a"), col("__w"),
        round(lit(1e6) * coalesce(col("__c"), lit(0L)).cast("double") /
          col("__t").cast("double")).cast("long").as("__f"))
    val stats = grid.groupBy(col("__w"))
      .agg(count(lit(1)).as("__na"), sum(col("__f")).as("__s"),
        sum((col("__f").cast(dec) * col("__f")).cast(dec)).as("__q"))
    val varNum = (col("__na") * col("__q") - col("__s").cast(dec) *
      col("__s")).cast(dec)
    val z = grid.join(broadcast(stats), Seq("__w"))
      .filter(varNum > 0)
      .select(col("__a"), col("__w"),
        round(lit(1e6) *
          (col("__f") * col("__na") - col("__s")).cast("double") /
          sqrt(varNum.cast("double"))).cast("long").as("__z"))
    val lhs = z.select(col("__a").as("author_a"), col("__w"),
      col("__z").as("__za"))
    val rhs = z.select(col("__a").as("author_b"), col("__w"),
      col("__z").as("__zb"))
    lhs.join(rhs, Seq("__w"))
      .filter(col("author_a") < col("author_b"))
      .groupBy(col("author_a"), col("author_b"))
      .agg(count(lit(1)).as("k_used"),
        sum(abs(col("__za") - col("__zb"))).as("__sd"))
      .select(col("author_a"), col("author_b"), col("k_used"),
        round(col("__sd").cast("double") / col("k_used").cast("double"))
          .cast("long").as("delta_micro"))
  }

  /** Chao1 + ACE species-richness estimators per group — "how many
    * token types does this source REALLY have, counting the ones we
    * haven't crawled yet": the unseen-vocabulary companions to
    * [[goodTuring]]'s adjusted counts, both driven entirely by the
    * frequency-of-frequencies spectrum. Bias-corrected Chao1 =
    * S_obs + f₁(f₁−1)/(2(f₂+1)) (exact integers into one rounded
    * divide — defined even at f₂ = 0). ACE splits the spectrum at
    * r ≤ 10 (rare) vs r > 10 (abundant): coverage Ĉ = 1 − f₁/N_rare,
    * γ̂² = max(S_rare·Σr(r−1)N_r / (Ĉ·N_rare·(N_rare−1)) − 1, 0),
    * ACE = S_abund + S_rare/Ĉ + f₁·γ̂²/Ĉ — each factor a single
    * IEEE step over exact spectrum sums, micro-rounded once; groups
    * with no coverage signal (N_rare ≤ 1 or Ĉ ≤ 0, e.g. every rare
    * type a singleton) report NULL ace_micro rather than a division
    * blow-up (stated).
    *
    * Scale: token census → spectrum census (both map-side
    * combinable hash-aggs), then per-group scalar algebra on ≤ a
    * handful of exact sums. Output: (groupCol, s_obs, n_tokens, f1,
    * f2, chao1_micro, ace_micro). */
  def chao1Ace(
      df: DataFrame,
      groupCol: String,
      textCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val counts = df.select(col(groupCol).as("__g"),
        explode(TextFunctions.tokens(col(textCol))).as("__w"))
      .groupBy(col("__g"), col("__w"))
      .agg(count(lit(1)).as("__r"))
    val agg = counts.groupBy(col("__g")).agg(
      count(lit(1)).as("s_obs"),
      sum(col("__r")).as("n_tokens"),
      sum(when(col("__r") === 1L, 1L).otherwise(0L)).as("f1"),
      sum(when(col("__r") === 2L, 1L).otherwise(0L)).as("f2"),
      sum(when(col("__r") <= 10L, 1L).otherwise(0L)).as("__sRare"),
      sum(when(col("__r") <= 10L, col("__r")).otherwise(0L))
        .as("__nRare"),
      sum(when(col("__r") <= 10L,
        (col("__r").cast(dec) * (col("__r") - 1L)).cast(dec))
        .otherwise(lit(0L).cast(dec))).as("__sumRr1"))
    val cHat = lit(1.0) - col("f1").cast("double") /
      col("__nRare").cast("double")
    val gamma2 = greatest(lit(0.0),
      col("__sRare").cast("double") * col("__sumRr1").cast("double") /
        (cHat * col("__nRare").cast("double") *
          (col("__nRare").cast("double") - 1.0)) - 1.0)
    agg.select(col("__g").as(groupCol), col("s_obs"), col("n_tokens"),
      col("f1"), col("f2"),
      (lit(1000000L) * col("s_obs") +
        round(lit(1e6) * (col("f1") * (col("f1") - 1L)).cast("double") /
          (lit(2L) * (col("f2") + 1L)).cast("double")).cast("long"))
        .as("chao1_micro"),
      when(col("__nRare") > 1L && col("f1") < col("__nRare"),
        lit(1000000L) * (col("s_obs") - col("__sRare")) +
          round(lit(1e6) * (col("__sRare").cast("double") / cHat +
            col("f1").cast("double") * gamma2 / cHat)).cast("long"))
        .otherwise(lit(null).cast("long")).as("ace_micro"))
  }

  /** Distinct-n diversity census per group — the self-repetition
    * signal (Li et al. 2016's distinct-n, the generation-quality
    * number) read over a corpus slice: total word n-grams, distinct
    * n-grams, and their micro ratio. Grams come from the shared
    * whitespace tokenizer via an in-array slide (one SQL transform —
    * no joins, no positional self-join); docs shorter than n
    * contribute nothing and are counted in n_short. Two hash-aggs.
    * Output: (groupCol, n_docs, n_short, n_grams, n_distinct,
    * distinct_ratio_micro). */
  def distinctNgrams(
      docs: DataFrame, groupCol: String, textCol: String, n: Int)
      : DataFrame = {
    require(n >= 1 && n <= 8, "n must be in [1, 8]")
    val toks = TextFunctions.tokens(col(textCol))
    val base = docs.select(col(groupCol).as("__g"), toks.as("__t"))
    val spine = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(size(col("__t")) < n, 1L).otherwise(0L)).as("n_short"))
    val grams = base.filter(size(col("__t")) >= n)
      .select(col("__g"), explode(expr(
        s"transform(sequence(1, size(__t) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(__t, i, $n)))")).as("__ng"))
    val stats = grams.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_grams"),
        countDistinct(col("__ng")).as("n_distinct"))
    spine.join(stats, Seq("__g"), "left")
      .select(col("__g").as(groupCol), col("n_docs"), col("n_short"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        when(col("n_grams").isNotNull,
          round(lit(1e6) * col("n_distinct").cast("double") /
            col("n_grams").cast("double")).cast("long"))
          .as("distinct_ratio_micro"))
  }
}
