package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution by blocked best-match record linkage — the
  * pipeline shape every large-scale catalog/CRM/provenance merge
  * uses: generate candidate pairs ONLY within shared blocking keys
  * (never corpus × corpus), score each candidate with an exact
  * string distance, and keep the best k matches per left record
  * through a bounded aggregate.
  *
  * Reference analogue: the per-device keyed state lookup
  * (`src/state_manager.py:41-43` reconciles records by exact
  * device name); generalized here to fuzzy text identity at corpus
  * scale, where exact keys don't exist and blocking + scored
  * matching stand in for them.
  */
object Linkage {

  /** Best `k` fuzzy matches in `right` for every record of `left`,
    * blocked and scored:
    *
    *  - candidates: equi-join on `blockCols` (same names both sides)
    *    — the classic blocking step; pair count is Σ over blocks of
    *    |L_b|·|R_b|, never |L|·|R|. Pick keys accordingly (a
    *    language + source + length-bucket compound beats any single
    *    coarse key).
    *  - score: exact Levenshtein distance over `leftText`/`rightText`
    *    (codegen'd builtin, classic DP — engine-portable), computed
    *    with the threshold variant: the banded DP is O(|a|·maxDist)
    *    per pair and bails out early on hopeless pairs — at blocking
    *    scale most candidates ARE hopeless, which makes the bail-out
    *    the common path. Cap the compared prefix upstream
    *    (`substring`) when fields are very long anyway.
    *  - keep: `dist <= maxDist`, then the k best per left record by
    *    (dist ASC, right id ASC — the deterministic tie-break)
    *    through [[Ranking.groupTopK]], whose aggregation state is
    *    bounded by k however hot a block gets: no per-left-record
    *    window partition anywhere.
    *
    * Output: (left_id, rank, dist, right_id) — rank 1-based within
    * the left record's matches; left records with no candidate within
    * `maxDist` are absent (anti-join the output against `left` for
    * the no-match census). Ids are renamed to left_id/right_id so
    * self-linkage (left and right cut from the same table) needs no
    * upstream aliasing. */
  def bestMatches(
      left: DataFrame,
      right: DataFrame,
      leftId: String,
      rightId: String,
      blockCols: Seq[String],
      leftText: String,
      rightText: String,
      maxDist: Int,
      k: Int = 1): DataFrame = {
    require(blockCols.nonEmpty,
      "blockCols must be non-empty — unblocked linkage is corpus×corpus")
    require(maxDist >= 0, "maxDist must be non-negative")
    require(k >= 1, "k must be at least 1")
    val l = left.select(
      blockCols.map(col) :+ col(leftId).as("left_id") :+
        col(leftText).as("__lt"): _*)
    val r = right.select(
      blockCols.map(col) :+ col(rightId).as("right_id") :+
        col(rightText).as("__rt"): _*)
    // The threshold form returns -1 for over-threshold pairs — the
    // filter keeps [0, maxDist] either way.
    val cand = l.join(r, blockCols)
      .withColumn("dist", levenshtein(col("__lt"), col("__rt"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
    Ranking.groupTopK(cand, Seq("left_id"),
      Seq(col("dist"), col("right_id")), k)
  }

  /** Reciprocal best match over a scored UNORDERED pair list — keep
    * (a, b) only when b is a's highest-scoring partner AND a is b's:
    * the mutual-argmax filter that turns a candidate list
    * ([[bestMatches]], [[Graph.adamicAdar]], cosine top-k) into
    * high-precision links (the bitext-mining / record-merge
    * convention — one-sided best matches are where the false merges
    * live). Scores must be integer (the micro-unit convention);
    * ties break to the smaller partner id on BOTH sides, so the
    * result is deterministic and a tie can still be mutual.
    *
    * Scale: the pair list symmetrizes (2 rows/pair), per-node best
    * goes through [[Ranking.groupTopK]]'s bounded-heap aggregate
    * (O(1) state per node however many candidates), and mutuality is
    * one equi-join of the node-sized best table against itself —
    * never pairs×pairs. Output: (aCol, bCol, scoreCol), a < b, each
    * node in at most one row. */
  def reciprocalBest(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      scoreCol: String): DataFrame = {
    // Pin the caller's pair pipeline ONCE: the symmetrize union reads
    // it twice (and it can be as expensive as a full affinity census).
    val p = Dedup.truncate(pairs.select(col(aCol).as("__a"),
      col(bCol).as("__b"), col(scoreCol).cast("long").as("__s")))
    val d = p.select(col("__a").as("__x"), col("__b").as("__y"),
        col("__s"))
      .union(p.select(col("__b").as("__x"), col("__a").as("__y"),
        col("__s")))
    // Referenced twice below (both sides of the mutuality join) —
    // pin so the upstream pair pipeline runs once.
    val best = Dedup.truncate(
      Ranking.groupTopK(d, Seq("__x"),
          Seq((-col("__s")).as("__ns"), col("__y").as("__y")), 1)
        .select(col("__x"), col("__y"), (-col("__ns")).as("__s")))
    best.as("p").join(best.as("q"),
        col("p.__x") === col("q.__y") && col("p.__y") === col("q.__x") &&
          col("p.__x") < col("p.__y"))
      .select(col("p.__x").as(aCol), col("p.__y").as(bCol),
        col("p.__s").as(scoreCol))
  }

  /** Blocked Jaro-Winkler best matches — [[bestMatches]]'s fuzzy-name
    * counterpart for the cases edit distance mis-ranks (prefix-heavy
    * person/org names, transposed characters): candidates pair only
    * inside their block, score with the codegen'd
    * [[graft.functions.GraftExpressions.JaroWinkler]] expression
    * (DuckDB-parity-verified), keep sim ≥ `minSimMicro`, and take the
    * per-left top-`k` by (sim desc, right_id) through
    * [[Ranking.groupTopK]]'s bounded heap. Similarities are
    * micro-quantized once (round(1e6·jw)) so ranks and the gate hash
    * are integer-exact. Output: (left_id, rank, sim_micro,
    * right_id). */
  def jwMatches(
      left: DataFrame,
      right: DataFrame,
      leftId: String,
      rightId: String,
      blockCols: Seq[String],
      leftText: String,
      rightText: String,
      minSimMicro: Long,
      k: Int): DataFrame = {
    require(blockCols.nonEmpty, "blocking columns required")
    require(k >= 1, "k must be at least 1")
    require(minSimMicro >= 0 && minSimMicro <= 1000000L,
      "minSimMicro must be in [0, 1e6]")
    val l = left.select(
      blockCols.map(col) :+ col(leftId).as("left_id") :+
        col(leftText).as("__lt"): _*)
    val r = right.select(
      blockCols.map(col) :+ col(rightId).as("right_id") :+
        col(rightText).as("__rt"): _*)
    val cand = l.join(r, blockCols)
      .withColumn("sim_micro",
        round(graft.functions.GraftExpressions
          .jaroWinkler(col("__lt"), col("__rt")) * lit(1e6)).cast("long"))
      .filter(col("sim_micro") >= minSimMicro)
    Ranking.groupTopK(cand, Seq("left_id"),
        Seq((-col("sim_micro")).as("__ns"),
          col("right_id").as("right_id"),
          col("sim_micro").as("sim_micro")), k)
      .select(col("left_id"), col("rank"), col("sim_micro"),
        col("right_id"))
  }

  /** Simplified-Soundex phonetic key — the classic blocking function
    * for name matching, as a pure codegen'd expression chain
    * (translate + RE2-safe regexp, no backreferences, so the DuckDB
    * oracle embeds the identical chain). DOCUMENTED VARIANT: the
    * standard letter→digit table (b f p v→1, c g j k q s x z→2,
    * d t→3, l→4, m n→5, r→6), vowels and h/w/y separate coded runs
    * but are never coded, adjacent same-digit runs collapse, the
    * first letter keeps its face and suppresses its own leading
    * code, pad/truncate to LETTER+3 digits. The American-Soundex
    * H/W *bridging* rule (same-code letters separated by h/w code
    * once) is intentionally omitted — it needs lookahead regexes RE2
    * cannot express; "ashcraft" keys A226 here vs A261 classically.
    * Non-letters strip first; an all-non-letter input keys NULL. */
  def phoneticKey(c: Column): Column = {
    val w = regexp_replace(lower(c), "[^a-z]", "")
    val m = translate(w, "bfpvcgjkqsxzdtlmnr", "111122222222334556")
    val collapsed = "123456".foldLeft(m) { (acc, d) =>
      regexp_replace(acc, s"$d{2,}", d.toString)
    }
    val digits = regexp_replace(collapsed, "[a-z]", "")
    val tail = when(substring(collapsed, 1, 1).rlike("[1-6]"),
      substring(digits, 2, 512)).otherwise(digits)
    when(length(w) > 0,
      concat(upper(substring(w, 1, 1)),
        rpad(substring(tail, 1, 3), 3, "0")))
      .otherwise(lit(null).cast("string"))
  }

  /** Sound-alike pairs by phonetic blocking: DISTINCT strings census
    * first (pairing happens in vocabulary space, never row space),
    * block on [[phoneticKey]], join distinct strings sharing a key.
    * Keys whose vocabulary exceeds `maxDf` drop entirely (stated) —
    * the df cap that bounds the quadratic term, the
    * [[Dedup]]-family convention. Output: (code, word_a, word_b,
    * n_a, n_b), word_a < word_b, with each word's row count. */
  def phoneticBlockedPairs(
      df: DataFrame,
      strCol: String,
      maxDf: Int = 50): DataFrame = {
    require(maxDf >= 2, "maxDf must be at least 2")
    val words = Dedup.truncate(df.filter(col(strCol).isNotNull)
      .groupBy(col(strCol).as("__w"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("code", phoneticKey(col("__w")))
      .filter(col("code").isNotNull))
    val keyDf = words.groupBy(col("code"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select(col("code"))
    val blocked = words.join(broadcast(keyDf), Seq("code"))
    blocked.select(col("code"), col("__w").as("word_a"),
        col("__n").as("n_a"))
      .join(blocked.select(col("code"), col("__w").as("word_b"),
        col("__n").as("n_b")), Seq("code"))
      .filter(col("word_a") < col("word_b"))
      .select(col("code"), col("word_a"), col("word_b"),
        col("n_a"), col("n_b"))
  }

  /** EXACT edit-distance-≤-1 similarity self-join by deletion
    * neighborhoods — the scalable form of "find every pair one typo
    * apart": each string s generates {s} ∪ {s minus one char}, and
    * two strings are within Levenshtein 1 **iff** their neighborhoods
    * intersect (delete-one covers deletion and insertion directly;
    * a substitution at position i gives both strings the same
    * delete-at-i variant) — so candidates come from ONE equi-join on
    * the variant, each verified by the codegen'd `levenshtein`
    * (which also collapses the false-positive where two DIFFERENT
    * deletions of distance-2 strings collide). Cost: (L+1) variant
    * rows per string through a hash join — never the string×string
    * product a naive fuzzy join does; an oracle CAN afford the
    * quadratic form at gate scale, which is exactly what makes this
    * checkable. Strings longer than `maxLen` are dropped (stated):
    * neighborhood blocking is a short-key technique — block on a
    * prefix/fingerprint first for long strings. NULL/empty strings
    * are dropped (an empty string is within distance 1 of every
    * 1-char string; if that matters, model it upstream).
    *
    * `transpositions = true` upgrades the metric to OSA/Damerau ≤ 1
    * (adjacent swaps also count as one edit — the dominant real typo
    * class). The SAME candidate join suffices: a swap at position i
    * gives both strings the identical delete-at-i / delete-at-(i+1)
    * variant (s = p·ab·q, t = p·ba·q ⇒ both yield p·b·q), so only
    * verification changes — a pair at Levenshtein 2 is kept iff it
    * is EXACTLY one adjacent transposition (same length, exactly two
    * adjacent diff positions, crossed characters), checked in pure
    * codegen'd string/array functions. At threshold 1, OSA and full
    * Damerau coincide (no edits can land between the swapped pair).
    *
    * Output: (left_id, right_id, left_s, right_s, dist),
    * left_id < right_id, dist ∈ {0, 1}. */
  def editNeighborJoin(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxLen: Int = 24,
      transpositions: Boolean = false): DataFrame = {
    require(maxLen >= 1 && maxLen <= 64, "maxLen must be in [1, 64]")
    val base = Dedup.truncate(df
      .select(col(idCol).as("__id"), col(strCol).as("__s"))
      .filter(col("__s").isNotNull && length(col("__s")) > 0 &&
        length(col("__s")) <= maxLen))
    val variants = base.select(col("__id"), col("__s"),
      explode(expr(
        """transform(sequence(0, length(__s)), i ->
          |  CASE WHEN i = 0 THEN __s
          |       ELSE concat(substring(__s, 1, i - 1),
          |                   substring(__s, i + 1)) END)"""
          .stripMargin)).as("__v"))
      .distinct()
    val l = variants.select(col("__v"), col("__id").as("left_id"),
      col("__s").as("left_s"))
    val r = variants.select(col("__v"), col("__id").as("right_id"),
      col("__s").as("right_s"))
    val pairs = l.join(r, Seq("__v"))
      .filter(col("left_id") < col("right_id"))
      .select(col("left_id"), col("right_id"), col("left_s"),
        col("right_s"))
      .distinct()
      .withColumn("__lev",
        levenshtein(col("left_s"), col("right_s")).cast("long"))
    if (!transpositions)
      pairs.withColumn("dist", col("__lev")).filter(col("dist") <= 1L)
        .drop("__lev")
    else {
      // Exactly one adjacent swap: equal length, diff positions are
      // two adjacent indices with crossed characters. The diff-index
      // array materializes once per pair; only __lev = 2 pairs (the
      // candidate set is already tiny) evaluate it.
      val isSwap =
        expr("""size(__diffs) = 2
              AND element_at(__diffs, 2) = element_at(__diffs, 1) + 1
              AND substring(left_s, element_at(__diffs, 1), 1)
                  = substring(right_s, element_at(__diffs, 2), 1)
              AND substring(left_s, element_at(__diffs, 2), 1)
                  = substring(right_s, element_at(__diffs, 1), 1)""")
      pairs.withColumn("__diffs",
          when(length(col("left_s")) === length(col("right_s")) &&
              col("__lev") === 2L,
            expr("""filter(sequence(1, length(left_s)), i ->
                    substring(left_s, i, 1) != substring(right_s, i, 1))"""))
            .otherwise(lit(null)))
        .withColumn("dist",
          when(col("__lev") <= 1L, col("__lev"))
            .when(col("__diffs").isNotNull && isSwap, lit(1L))
            .otherwise(lit(2L)))
        .filter(col("dist") <= 1L)
        .drop("__lev", "__diffs")
    }
  }
}
