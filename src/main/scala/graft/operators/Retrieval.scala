package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text relevance scoring — the retrieval side of a training-data
  * pipeline (mining in-domain documents for a target task, building
  * eval pools, source triage by query).
  */
object Retrieval {

  /** BM25 scores (Robertson/Spärck Jones; the Lucene `+1` idf variant,
    * which is non-negative) of every document against every query it
    * shares a term with:
    *
    *   idf(t)     = ln(1 + (N − df + 0.5)/(df + 0.5))
    *   score(d,q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len/avg))
    *
    * Cross-engine determinism: idf is quantized ONCE per term to
    * integer micro-nats (the [[Training.dsirWeights]] idiom), the
    * length norm is a fixed chain of IEEE ops over exact integers
    * (len·N_docs/totLen — never a pre-divided average), each (doc,
    * term) contribution is quantized to a Long, and the per-(query,
    * doc) total is an exact integer sum — independent of partitioning
    * and summation order, one final divide for display.
    *
    * Scale: tf and df are the exact-dedup hash-agg shapes; the query
    * term table is tiny (queries × terms) and broadcasts onto the
    * posting join, so the corpus only shuffles on the term key once.
    * The output is the scored JOIN (one row per query × matching doc)
    * — a stopword-heavy query matches everything, so production
    * callers cap with a top-k (see the gate query) or pre-drop
    * low-idf terms; this operator does not silently do either.
    *
    * Output: (query_id, id, n_terms matched, score ≥ 0, 6-dp). */
  def bm25Scores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k1 > 0 && b >= 0 && b <= 1, "k1 > 0, b in [0,1]")
    val toks = TextFunctions.tokens(col(textCol))
    val perDoc = docs.select(col(idCol), explode(toks).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val lens = docs.select(col(idCol),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("len"))
    val totals = lens.agg(count(lit(1)).as("n_docs"),
      sum(col("len")).as("tot_len"))
    val dfs = perDoc.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qTerms = queries.select(col(queryIdCol).as("query_id"),
        explode(TextFunctions.tokens(col(queryTextCol))).as("term"))
      .distinct()
    val idf = dfs.join(broadcast(qTerms), Seq("term"))
      .crossJoin(broadcast(totals))
      .select(col("term"), col("query_id"), col("n_docs"), col("tot_len"),
        round(lit(1e6) * log(lit(1.0) +
          ((col("n_docs") - col("df")).cast("double") + 0.5)
            / (col("df").cast("double") + 0.5)))
          .cast("long").as("idf_micro"))
    // Constants enter as the SAME IEEE ops the SQL oracle runs
    // ((k1 + 1), (1 − b) as runtime double adds, not Scala-folded
    // literals) so both engines produce bit-identical intermediates.
    perDoc
      .join(idf, Seq("term"))
      .join(lens, Seq(idCol))
      .select(col("query_id"), col(idCol),
        round(col("idf_micro").cast("double") *
          (col("tf").cast("double") * (lit(k1) + lit(1.0))
            / (col("tf").cast("double") + lit(k1) *
              ((lit(1.0) - lit(b)) + lit(b) * col("len").cast("double")
                * col("n_docs").cast("double")
                / col("tot_len").cast("double")))))
          .cast("long").as("s_micro"))
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum(col("s_micro")).as("s_sum"))
      .select(col("query_id"), col(idCol), col("n_terms"),
        round(col("s_sum").cast("double") / 1e6, 6).as("score"))
  }

  /** Positional phrase search: documents containing each query phrase
    * as CONSECUTIVE whitespace tokens, via the positional-postings
    * offset trick — a phrase of terms t_0…t_{m−1} occurs at position
    * s iff for every offset j the posting (t_j, s+j) exists, so each
    * posting that matches some phrase term votes for the candidate
    * start (pos − j), and a start with all m DISTINCT offsets present
    * is an occurrence (the DISTINCT matters when a phrase repeats a
    * term: both js vote for the same start from different postings).
    *
    * Scale: the phrase-term table is (phrases × terms) — broadcast;
    * the corpus shuffles once on (phrase, doc, start) for the vote
    * count. A stopword phrase matches many postings, but the fan-out
    * is |phrase| per matched posting, bounded like the shingle
    * explodes. No substring LIKE scan (which can't tokenize), no
    * per-doc regex (which can't count occurrences at scale).
    *
    * Output: (phrase_id, id, n_hits, first_pos [0-based]) — one row
    * per (phrase, doc) WITH at least one occurrence. */
  def phraseSearch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phrases: DataFrame,
      phraseIdCol: String,
      phraseTextCol: String): DataFrame = {
    val postings = docs.select(col(idCol),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "term")))
    val pterms = phrases.select(col(phraseIdCol).as("phrase_id"),
        posexplode(TextFunctions.tokens(col(phraseTextCol)))
          .as(Seq("j", "term")))
      .join(phrases.select(col(phraseIdCol).as("phrase_id"),
        TextFunctions.tokenCount(col(phraseTextCol)).as("m")), Seq("phrase_id"))
    postings.join(broadcast(pterms), Seq("term"))
      .select(col("phrase_id"), col(idCol),
        (col("pos") - col("j")).as("start"), col("j"), col("m"))
      .filter(col("start") >= 0)
      .groupBy(col("phrase_id"), col(idCol), col("start"), col("m"))
      .agg(countDistinct(col("j")).as("n_j"))
      .filter(col("n_j") === col("m"))
      .groupBy(col("phrase_id"), col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        min(col("start")).cast("long").as("first_pos"))
  }

  /** Reciprocal Rank Fusion (Cormack/Clarke/Büttcher 2009) — the
    * standard hybrid-retrieval merge: given per-query ranked lists
    * from heterogeneous retrievers (BM25, dense ANN, …), fuse by
    * Σ 1/(k + rank) per (query, doc). Scores from different systems
    * never compare directly (BM25 floats vs cosine) — only RANKS do,
    * which is the whole point of RRF. Computed in micro-units via
    * integer division (`unit div (k + rank)`) so the fused score is
    * an exact Long — engine-identical, no IEEE summation drift; with
    * unit = 10⁶ and k = 60 the quotients first collide where
    * n(n+1) > 10⁶, i.e. around rank 940 — far beyond any top-k list
    * worth fusing.
    *
    * Scale: one unionByName (no shuffle) + one map-side-combinable
    * (query, doc) hash-agg + the k-bounded top-k aggregate — input
    * lists are already top-k-bounded per query, so the whole fuse is
    * proportional to Σ list sizes, never corpus-sized.
    *
    * Output: (qCol, rank, dCol, rrf_micro, n_lists) — n_lists = how
    * many input rankings surfaced the doc (the agreement signal). */
  def rrfFuse(
      rankings: Seq[DataFrame],
      qCol: String,
      dCol: String,
      rankCol: String,
      kConst: Int,
      topK: Int,
      unit: Long = 1000000L): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kConst >= 0, "kConst must be non-negative")
    require(unit > 0, "unit must be positive")
    val tagged = rankings
      .map(_.select(col(qCol), col(dCol), col(rankCol).cast("long").as("__r")))
      .reduce(_ unionByName _)
    val scored = tagged
      .groupBy(col(qCol), col(dCol))
      .agg(sum(expr(s"${unit}L div (${kConst}L + __r)")).as("rrf_micro"),
        count(lit(1)).as("n_lists"))
    Ranking.groupTopK(scored, Seq(qCol),
        Seq((-col("rrf_micro")).as("__neg"), col(dCol).as(dCol),
          col("n_lists").as("n_lists")), topK)
      .select(col(qCol), col("rank"), col(dCol),
        (-col("__neg")).as("rrf_micro"), col("n_lists"))
  }
}
