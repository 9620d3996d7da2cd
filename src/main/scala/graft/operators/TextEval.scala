package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generation-evaluation metrics over (candidate, reference) text
  * pairs — the scorecard an LLM data/eval pipeline runs after
  * distillation, translation or summarization passes: corpus-level
  * BLEU (Papineni et al. 2002) and chrF (Popović 2015). Both are
  * computed as distributed n-gram censuses — explode → (row, gram)
  * hash-agg → per-row clip → per-group rollup — never a per-row UDF
  * loop, and both follow the repo's exactness discipline: every
  * count is an exact integer, each derived ratio is one IEEE divide,
  * BLEU's single log/exp step is per-term micro-nat-quantized (the
  * lm-gate convention) so both engines exponentiate bit-identical
  * arguments, and chrF is pure rational arithmetic (no libm at all).
  */
object TextEval {

  /** Word n-gram list (1-based slice, space-joined) — empty when the
    * row has fewer than `n` tokens. The start sequence runs to
    * size(w) and short tail slices are filtered by EXACT length:
    * Spark's `sequence(1, 0)` steps DOWNWARD to [1, 0], so a
    * "size − n + 1" upper bound would feed slice() an invalid 0
    * start on short rows instead of yielding the empty list. */
  private def wordGrams(wCol: String, n: Int): Column = expr(
    s"transform(filter(transform(sequence(1, greatest(size($wCol), 1)), " +
      s"i -> slice($wCol, i, $n)), a -> size(a) = $n), " +
      "a -> array_join(a, ' '))")

  /** Character n-gram list over the whitespace-condensed text (the
    * standard chrF preprocessing) — same exact-length filter (a
    * descending sequence would otherwise mint phantom short grams on
    * rows shorter than `n`, double-counting low orders). */
  private def charGrams(cdCol: String, n: Int): Column = expr(
    s"filter(transform(sequence(1, greatest(length($cdCol), 1)), " +
      s"i -> substring($cdCol, i, $n)), g -> length(g) = $n)")

  /** Per-(group, n) corpus totals: clipped matches (Σ_rows Σ_grams
    * min(candCount, refCount) — clipping is PER ROW, the BLEU rule
    * that stops "the the the" from scoring) and candidate/reference
    * gram totals. `gramsOf` maps (columnName, n) to the gram list. */
  private def gramTotals(
      base: DataFrame, maxN: Int,
      gramsOf: (String, Int) => Column): DataFrame = {
    // ALL orders ride one explode + one (id, n, gram) census per side
    // — a per-order pipeline would cost maxN× the shuffles for the
    // same answer (it did: 36 exchanges on the first chrF plan).
    def census(side: String) = base.select(col("__id"),
        explode(flatten(array((1 to maxN).map(n =>
          transform(gramsOf(side, n),
            g => struct(lit(n).as("n"), g.as("g")))): _*))).as("e"))
      .select(col("__id"), col("e.n").as("__n"), col("e.g").as("__gram"))
      .groupBy(col("__id"), col("__n"), col("__gram"))
      .agg(count(lit(1)).as("__cnt"))
    val c = census("__c").withColumnRenamed("__cnt", "__cc")
    val r = census("__r").withColumnRenamed("__cnt", "__rc")
    val cAgg = c.join(r, Seq("__id", "__n", "__gram"), "left")
      .groupBy(col("__id"), col("__n"))
      .agg(sum(least(col("__cc"), coalesce(col("__rc"), lit(0L))))
          .as("__clip"),
        sum(col("__cc")).as("__ctot"))
    val rAgg = r.groupBy(col("__id"), col("__n"))
      .agg(sum(col("__rc")).as("__rtot"))
    // The (id, group) × order spine keeps rows whose candidate OR
    // reference has no grams of some order — their counts must
    // contribute 0, not vanish from the other side's denominator.
    val ids = base.select(col("__id"), col("__g"))
      .withColumn("__n", explode(array((1 to maxN).map(lit): _*)))
    ids.join(cAgg, Seq("__id", "__n"), "left")
      .join(rAgg, Seq("__id", "__n"), "left")
      .groupBy(col("__g"), col("__n"))
      .agg(sum(coalesce(col("__clip"), lit(0L))).as("clip"),
        sum(coalesce(col("__ctot"), lit(0L))).as("ctot"),
        sum(coalesce(col("__rtot"), lit(0L))).as("rtot"))
      .select(col("__g"), col("__n").as("n"), col("clip"), col("ctot"),
        col("rtot"))
  }

  /** Corpus-level BLEU-`maxN` per group. Smoothing: none (the
    * canonical definition) — a group with ANY zero p_n scores 0, and
    * a group with no candidate tokens scores 0. Brevity penalty
    * exponent and each ln p_n are quantized to integer micro-nats
    * BEFORE the one final exp, so both engines exponentiate the same
    * exact rational. Output: (groupCol, cand_len, ref_len,
    * p1_micro..pN_micro, bleu_micro). */
  def bleu(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      candCol: String,
      refCol: String,
      maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 9, "maxN must be in [1, 9]")
    val base = Dedup.truncate(df.select(col(idCol).as("__id"),
      col(groupCol).as("__g"),
      TextFunctions.tokens(col(candCol)).as("__c"),
      TextFunctions.tokens(col(refCol)).as("__r")))
    val totals = gramTotals(base, maxN, wordGrams)
    val lens = base.groupBy(col("__g"))
      .agg(sum(size(col("__c")).cast("long")).as("cand_len"),
        sum(size(col("__r")).cast("long")).as("ref_len"))
    val pivoted = totals.groupBy(col("__g")).agg(
      sum(when(col("n") === 1, col("clip"))).as("__clip1"),
      (2 to maxN).flatMap(n => Seq(
        sum(when(col("n") === n, col("clip"))).as(s"__clip$n"))) ++
        (1 to maxN).map(n =>
          sum(when(col("n") === n, col("ctot"))).as(s"__tot$n")): _*)
    val joined = pivoted.join(lens, Seq("__g"))
    val pMicros = (1 to maxN).map(n =>
      when(col(s"__tot$n") > 0,
        round(lit(1e6) * col(s"__clip$n").cast("double") /
          col(s"__tot$n").cast("double")).cast("long"))
        .otherwise(lit(null).cast("long")).as(s"p${n}_micro"))
    // micro-nat ln terms; the sum is integer, /N is one IEEE divide
    val lnTerms = (1 to maxN).map(n =>
      round(lit(1e6) * log(col(s"__clip$n").cast("double") /
        col(s"__tot$n").cast("double"))).cast("long"))
    val allPos = (1 to maxN).map(n =>
      col(s"__clip$n") > 0 && col(s"__tot$n") > 0).reduce(_ && _)
    val bpq = least(lit(0L), round(lit(1e6) *
      (lit(1.0) - col("ref_len").cast("double") /
        col("cand_len").cast("double"))).cast("long"))
    val arg = lnTerms.reduce(_ + _).cast("double") / lit(maxN.toDouble) +
      bpq.cast("double")
    val bleuMicro = when(col("cand_len") > 0 && allPos,
      round(lit(1e6) * exp(arg / lit(1e6))).cast("long"))
      .otherwise(lit(0L))
    joined.select(col("__g").as(groupCol) +: col("cand_len") +:
      col("ref_len") +: pMicros :+ bleuMicro.as("bleu_micro"): _*)
  }

  /** Corpus-level chrF per group (character n-grams 1..`maxN` over
    * whitespace-condensed text, β-weighted F): chrP/chrR are the
    * macro-averages over n of the per-order precision/recall (orders
    * with an empty denominator contribute 0 — the "count as zero"
    * convention, stated rather than silent), and the final score is
    * pure rational arithmetic — no libm anywhere, so cross-engine
    * parity is exact. Output: (groupCol, chrp_micro, chrr_micro,
    * chrf_micro). */
  def chrF(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      candCol: String,
      refCol: String,
      maxN: Int = 6,
      beta: Double = 2.0): DataFrame = {
    require(maxN >= 1 && maxN <= 9, "maxN must be in [1, 9]")
    require(beta > 0, "beta must be positive")
    val condense = (c: Column) => regexp_replace(c, "\\s+", "")
    val base = Dedup.truncate(df.select(col(idCol).as("__id"),
      col(groupCol).as("__g"),
      condense(col(candCol)).as("__c"), condense(col(refCol)).as("__r")))
    val totals = gramTotals(base, maxN, charGrams)
    val perOrder = totals.select(col("__g"),
      when(col("ctot") > 0,
        col("clip").cast("double") / col("ctot").cast("double"))
        .otherwise(lit(0.0)).as("__p"),
      when(col("rtot") > 0,
        col("clip").cast("double") / col("rtot").cast("double"))
        .otherwise(lit(0.0)).as("__r"))
    // order-stable mean: sum of at most maxN doubles in n order would
    // need a sort — instead sum the MICRO-quantized per-order values
    // (integers commute), then divide once.
    val q = perOrder.select(col("__g"),
      round(lit(1e6) * col("__p")).cast("long").as("__pq"),
      round(lit(1e6) * col("__r")).cast("long").as("__rq"))
    val agg = q.groupBy(col("__g"))
      .agg(sum(col("__pq")).as("__sp"), sum(col("__rq")).as("__sr"))
    val p = col("__sp").cast("double") / lit(maxN.toDouble)
    val r = col("__sr").cast("double") / lit(maxN.toDouble)
    val b2 = beta * beta
    val f = when(col("__sp") + col("__sr") > 0,
      round((lit(1.0 + b2) * p * r) / (lit(b2) * p + r)).cast("long"))
      .otherwise(lit(0L))
    agg.select(col("__g").as(groupCol),
      round(p).cast("long").as("chrp_micro"),
      round(r).cast("long").as("chrr_micro"),
      f.as("chrf_micro"))
  }

  /** Corpus-level ROUGE-N per group, one row per order 1..maxN — the
    * RECALL-oriented summary/generation scorecard ([[bleu]] is the
    * precision side; together they bracket over- and
    * under-generation). Same distributed gram census as BLEU
    * ([[gramTotals]]: explode → hash-agg → per-row clip → group
    * rollup, clipping per row so repeated grams cannot inflate
    * either side): precision = clip/ctot, recall = clip/rtot,
    * F1 = 2PR/(P+R). Pure rational arithmetic — each ratio is one
    * IEEE divide micro-rounded from exact integers, the divides
    * live INSIDE their zero-denominator when() guards (ANSI-safe
    * under subexpression hoisting). An order with an empty
    * candidate (resp. reference) side reports NULL precision (resp.
    * recall); F1 is 0 when both sides have grams but nothing
    * matched, NULL when either side has none.
    * Output: (groupCol, n, clip, ctot, rtot, p_micro, r_micro,
    * f1_micro). */
  def rougeN(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      candCol: String,
      refCol: String,
      maxN: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 9, "maxN must be in [1, 9]")
    val base = Dedup.truncate(df.select(col(idCol).as("__id"),
      col(groupCol).as("__g"),
      TextFunctions.tokens(col(candCol)).as("__c"),
      TextFunctions.tokens(col(refCol)).as("__r")))
    val totals = gramTotals(base, maxN, wordGrams)
    val pD = when(col("ctot") > 0,
      col("clip").cast("double") / col("ctot").cast("double"))
    val rD = when(col("rtot") > 0,
      col("clip").cast("double") / col("rtot").cast("double"))
    totals.select(col("__g").as(groupCol),
      col("n").cast("long").as("n"),
      col("clip"), col("ctot"), col("rtot"),
      round(lit(1e6) * pD).cast("long").as("p_micro"),
      round(lit(1e6) * rD).cast("long").as("r_micro"),
      when(col("ctot") > 0 && col("rtot") > 0,
        when(col("clip") > 0,
          round(lit(1e6) * lit(2.0) * pD * rD / (pD + rD)).cast("long"))
          .otherwise(lit(0L)))
        .otherwise(lit(null).cast("long")).as("f1_micro"))
  }
}
