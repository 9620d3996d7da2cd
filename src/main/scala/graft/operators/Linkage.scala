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

  /** Two Fellegi–Sunter EM iterations for binary comparison vectors
    * per group — the canonical probabilistic record-linkage model
    * over blocked candidate pairs ([[jwMatches]] / [[phoneticBlockedPairs]]
    * produce the pairs; this fits WHICH field agreements actually
    * signal a match): per-field match/unmatch rates m_k, u_k and the
    * match prior p, fit by EM over the 2^K agreement-pattern census.
    * Each pattern's match responsibility γ = p·Πθ_m /
    * (p·Πθ_m + (1−p)·Πθ_u) re-weights the M-step tallies; the
    * [[graft.operators.Profile.dawidSkeneBinary]] exactness idiom
    * applies verbatim — every parameter is MICRO-ROUNDED between
    * stages, so likelihood products are exact integer products in
    * DECIMAL(38,0) (sound to K ≤ 5 fields; enforced) and M-step
    * tallies are exact γ·count sums. Both EM rounds are emitted so
    * a reviewer sees where the rates moved.
    *
    * Scale: ONE hash-agg collapses any number of pairs to ≤ 2^K
    * pattern rows (metadata); the EM arithmetic never touches the
    * pairs again. Init is the classic (m, u, p) = (0.9, 0.1, 0.5).
    * A degenerate census (all patterns identical) yields NULL-free
    * but uninformative rates — the caller reads n_pairs.
    * Output: one row per field — (groupCol, field, n_pairs,
    * p1_micro, m1_micro, u1_micro, p2_micro, m2_micro, u2_micro). */
  def fellegiSunterEm(
      pairs: DataFrame,
      groupCol: String,
      fieldCols: Seq[String]): DataFrame = {
    require(fieldCols.nonEmpty && fieldCols.size <= 5,
      "fellegiSunterEm needs 1..5 comparison fields")
    val dec = "decimal(38,0)"
    val k = fieldCols.size
    val agree = fieldCols.map(f => col(f).cast("boolean"))
    val census = pairs
      .filter(agree.map(_.isNotNull).reduce(_ && _))
      .groupBy(col(groupCol).as("__g") +: fieldCols.zipWithIndex
        .map { case (f, i) => col(f).cast("boolean").as(s"__a$i") }: _*)
      .agg(count(lit(1)).as("__cnt"))
    // E-step: γ from CURRENT micro params (columns or literals) —
    // exact integer likelihood products in decimal, one mirrored
    // divide, micro-rounded.
    def gamma(p: Column, ms: Seq[Column], us: Seq[Column]): Column = {
      val num = (0 until k).foldLeft(p.cast(dec)) { (acc, i) =>
        (acc * when(col(s"__a$i"), ms(i))
          .otherwise(lit(1000000L) - ms(i))).cast(dec)
      }
      val den = (0 until k).foldLeft((lit(1000000L) - p).cast(dec)) {
        (acc, i) =>
          (acc * when(col(s"__a$i"), us(i))
            .otherwise(lit(1000000L) - us(i))).cast(dec)
      }
      round(lit(1e6) * num.cast("double") /
        (num.cast("double") + den.cast("double"))).cast("long")
    }
    // M-step: per-field rates + prior off exact γ·count tallies.
    def mStep(g: DataFrame, tag: String): DataFrame = {
      val w = col("__gamma").cast(dec) * col("__cnt")
      val wn = (lit(1000000L) - col("__gamma")).cast(dec) * col("__cnt")
      val aggs =
        Seq(sum(w.cast(dec)).as("__wm"), sum(wn.cast(dec)).as("__wu"),
          sum((col("__cnt").cast(dec) * lit(1000000L)).cast(dec))
            .as("__tot"), sum(col("__cnt")).as("__np")) ++
        (0 until k).flatMap { i => Seq(
          sum(when(col(s"__a$i"), w).otherwise(lit(0L).cast(dec))
            .cast(dec)).as(s"__wma$i"),
          sum(when(col(s"__a$i"), wn).otherwise(lit(0L).cast(dec))
            .cast(dec)).as(s"__wua$i"))
        }
      // A side with zero responsibility mass (every pattern fully
      // resolved the other way) has no rate to estimate: fall back
      // to the uninformative 500000 rather than divide by zero —
      // the dawidSkeneBinary convention.
      g.groupBy(col("__g")).agg(aggs.head, aggs.tail: _*)
        .select(col("__g") +: col("__np").as(s"__np$tag") +:
          (round(lit(1e6) * col("__wm").cast("double") /
            col("__tot").cast("double")).cast("long")
            .as(s"__p$tag") +:
          (0 until k).flatMap { i => Seq(
            when(col("__wm") > 0,
              round(lit(1e6) * col(s"__wma$i").cast("double") /
                col("__wm").cast("double")).cast("long"))
              .otherwise(lit(500000L)).as(s"__m$tag$i"),
            when(col("__wu") > 0,
              round(lit(1e6) * col(s"__wua$i").cast("double") /
                col("__wu").cast("double")).cast("long"))
              .otherwise(lit(500000L)).as(s"__u$tag$i"))
          }): _*)
    }
    val e1 = census.withColumn("__gamma",
      gamma(lit(500000L), Seq.fill(k)(lit(900000L)),
        Seq.fill(k)(lit(100000L))))
    val m1 = mStep(e1, "1")
    val e2 = census.join(broadcast(m1), Seq("__g"))
      .withColumn("__gamma",
        gamma(col("__p1"), (0 until k).map(i => col(s"__m1$i")),
          (0 until k).map(i => col(s"__u1$i"))))
    val m2 = mStep(e2, "2")
    val joined = m1.join(m2, Seq("__g"))
    val rows = (0 until k).map { i =>
      struct(lit(fieldCols(i)).as("field"),
        col(s"__m1$i").as("m1_micro"), col(s"__u1$i").as("u1_micro"),
        col(s"__m2$i").as("m2_micro"), col(s"__u2$i").as("u2_micro"))
    }
    joined.select(col("__g"), col("__np1").as("n_pairs"),
        col("__p1").as("p1_micro"), col("__p2").as("p2_micro"),
        explode(array(rows: _*)).as("__f"))
      .select(col("__g").as(groupCol), col("__f.field"),
        col("n_pairs"), col("p1_micro"), col("__f.m1_micro"),
        col("__f.u1_micro"), col("p2_micro"), col("__f.m2_micro"),
        col("__f.u2_micro"))
  }
}
