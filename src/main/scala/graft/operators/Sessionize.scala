package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the reference's keyed edge-detection loop
  * (`pipeline.py:132-163`: remember previous status per device, emit a
  * session on the cleaning→idle transition) re-expressed declaratively
  * with window functions, so Spark shuffles once on the key and the
  * whole pass stays in whole-stage codegen.
  *
  * Scale: one shuffle on (keyCol); window sort is per-key and spills;
  * no driver-side state. The streaming twin lives in
  * [[graft.streaming.Sessionizer]].
  */
object Sessionize {

  /** F3 — completion-edge detection: rows where the previous
    * observation (per key, in time order) satisfied `wasActive` and the
    * current row satisfies `isDone`. `tieBreak` makes the order total
    * when timestamps collide. Adds `prev_<stateCol>`.
    */
  def edges(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieBreak: String,
      stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    df.withColumn(s"prev_$stateCol", lag(col(stateCol), 1).over(w))
  }

  /** Gap-based session ids: a new session starts when the gap to the
    * previous row (per key) exceeds `maxGapSeconds`, or at the first
    * row. Adds `session_id` (0-based per key). Epoch seconds are
    * floored on both sides of the comparison, matching the oracle's
    * `date_part('epoch', ts)`.
    */
  def gapSessions(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieBreak: String,
      maxGapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    val epoch = unix_timestamp(col(tsCol))
    val prevEpoch = lag(epoch, 1).over(w)
    val isStart = when(prevEpoch.isNull || epoch - prevEpoch > maxGapSeconds, 1L)
      .otherwise(0L)
    df.withColumn("session_id",
      sum(isStart).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
  }

  /** First-order Markov transition census: count (state → next state)
    * pairs per key's time-ordered stream, aggregated corpus-wide —
    * the behavioral fingerprint behind funnel drop-off analysis and
    * bot/UI-loop detection (a user whose click→click self-loop
    * dominates is a scraper; a purchase→error spike is an outage).
    * The last event of each key has no successor and emits nothing.
    *
    * Scale: one shuffle on the key + per-key window for `lead` (the
    * group is one user/device's events — bounded; same justification
    * as the funnel/SCD2 windows), then a map-side-combinable census
    * on (from, to) — never event×event.
    *
    * Output: (from_state, to_state, n_transitions, n_keys). */
  def transitionCounts(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieBreak: String,
      stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    df.select(col(keyCol), col(stateCol).as("from_state"),
        lead(col(stateCol), 1).over(w).as("to_state"))
      .filter(col("to_state").isNotNull)
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col(keyCol)).as("n_keys"))
  }

  /** Sequence-anomaly scoring by first-order Markov NLL: train the
    * corpus transition model (add-one smoothed over the state
    * vocabulary), then score each key's stream by the summed negative
    * log-likelihood of its own transitions — a key whose behavior the
    * corpus model finds improbable (backwards funnels, error loops,
    * scripted paths) floats to the top. The behavioral sibling of the
    * bigram-LM text perplexity gate, same micro-nat convention:
    * per-transition score = round(1e6·ln((c(f,t)+1)/(c(f)+V))) — an
    * IEEE ln of an exact rational, rounded to 1e-6, which both
    * engines compute bit-identically (the lmPerplexity precedent).
    *
    * Scale: one per-key window for `lead` (bounded group), two
    * map-side-combinable censuses for the model (states² rows — a
    * broadcast by construction), one broadcast model join back onto
    * the transitions, one final hash-agg per key. The transition
    * stream is pinned once — model and scoring both read it.
    *
    * Output: (key, n_trans, nll_micro) — higher nll_micro = more
    * anomalous; keys with < 2 events have no transitions and are
    * absent. */
  def markovNll(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieBreak: String,
      stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    val tr = Dedup.truncate(
      df.select(col(keyCol), col(stateCol).as("from_state"),
          lead(col(stateCol), 1).over(w).as("to_state"))
        .filter(col("to_state").isNotNull))
    val cft = tr.groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("__cft"))
    // From-state totals fold out of the states²-row census — a second
    // full-transition aggregation would rescan tr for the same values.
    val cf = cft.groupBy(col("from_state")).agg(sum(col("__cft")).as("__cf"))
    val v = df.agg(countDistinct(col(stateCol)).as("__nv"))
    val model = cft.join(cf, Seq("from_state"))
      .crossJoin(broadcast(v))
      .select(col("from_state"), col("to_state"),
        round(lit(1000000.0) *
            log((col("__cft") + lit(1.0)) / (col("__cf") + col("__nv"))))
          .cast("long").as("__s"))
    tr.join(broadcast(model), Seq("from_state", "to_state"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_trans"),
        (-sum(col("__s"))).as("nll_micro"))
  }

  /** Metronome detection: per-key inter-event-gap statistics in EXACT
    * integer arithmetic — bots fetch on a timer, humans don't, so a
    * key whose gap variance is (near-)zero over many events is
    * automation. Gaps are FLOORED epoch-second deltas (microsecond
    * deltas overflow: a week-long gap squared already exceeds 2⁶³;
    * seconds keep n·Σd² exact for a year-scale span × 10⁵ events per
    * key, and a timer bot is second-regular anyway). The variance
    * numerator n·Σd² − (Σd)² is an exact Long (zero iff all gaps
    * equal), no IEEE division anywhere — the same rational-not-float
    * contract as [[TimeSeries.groupTrend]]. Keys with < `minEvents`
    * events are absent (two gaps minimum for regularity to mean
    * anything).
    *
    * Scale: per-key window for `lag` (bounded group), then one
    * five-sum hash-agg — map-side combinable, one struct of state per
    * key. Overflow bound: n·(key's time span in seconds)² < 2⁶³.
    *
    * Output: (key, n_gaps, gap_min_s, gap_max_s, var_num, var_den,
    * metronome) — metronome = var_num == 0, i.e. ALL gaps identical. */
  def gapRegularity(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieBreak: String,
      minEvents: Int): DataFrame = {
    require(minEvents >= 3, "minEvents must be at least 3 (two gaps)")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    val sec = unix_timestamp(col(tsCol))
    df.select(col(keyCol), (sec - lag(sec, 1).over(w)).as("__d"))
      .filter(col("__d").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("__d")).as("gap_min_s"),
        max(col("__d")).as("gap_max_s"),
        sum(col("__d")).as("__sd"),
        sum(col("__d") * col("__d")).as("__sdd"))
      .filter(col("n_gaps") >= minEvents - 1)
      .select(col(keyCol), col("n_gaps"),
        col("gap_min_s"), col("gap_max_s"),
        (col("n_gaps") * col("__sdd") - col("__sd") * col("__sd"))
          .as("var_num"),
        (col("n_gaps") * col("n_gaps")).as("var_den"))
      .withColumn("metronome", col("var_num") === 0L)
  }
}
