package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with bounded state — the attribution shape
  * (click joined to the impression it followed, dedup-ingest joined
  * to its provenance record) done the Structured Streaming way:
  * both sides watermarked and the join range-bounded in EVENT TIME,
  * so Spark can prove when a buffered row can never match again and
  * evict it. An unbounded stream-stream join is a memory leak by
  * construction; the time bound is what makes the state O(rate ×
  * horizon) instead of O(stream).
  */
object StreamJoin {

  /** Inner equi-join of two streams where the right event lands
    * within `(leftTs, leftTs + maxDelay]` of its left partner — e.g.
    * clicks (right) attributed to the impression (left) they
    * followed. Both sides get `lateness` watermarks; the interval
    * condition plus the watermarks bound BOTH buffers: a left row is
    * held for `maxDelay + lateness` of event time, a right row for
    * `lateness`, then evicted for good. Works identically on batch
    * frames (the join condition is plain SQL), which is how the spec
    * proves stream ≡ batch.
    *
    * Column names: every non-join column of both sides survives;
    * prefix-disambiguate upstream if they collide. The joined frame
    * keeps both timestamps — downstream windows can aggregate on
    * either side's clock.
    *
    * Scale: the join state is keyed by `keyCol` and sharded by the
    * shuffle like any keyed stream op; skewed keys (a bot clicking
    * one ad) shard with AQE disabled in streaming, so cap per-key
    * rate upstream if a single key can exceed one task's state. */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      maxDelay: String,
      lateness: String = "10 minutes"): DataFrame =
    joined(left, right, keyCol, leftTs, rightTs, maxDelay, lateness,
      "inner")

  /** [[intervalJoin]] with LEFT OUTER semantics: a left row whose
    * match window `(leftTs, leftTs + maxDelay]` closes under the
    * watermark with no right partner is emitted ONCE with the right
    * side all-NULL — the "impression that never converted" row an
    * attribution pipeline needs as a first-class outcome, not an
    * absence. State stays bounded exactly as in the inner form (the
    * time bound is what lets Spark prove a buffered left row is
    * done); the only behavioral difference is the expiry emission,
    * which necessarily waits on the watermark — an unmatched row is
    * only *provably* unmatched `maxDelay + lateness` of event time
    * after its timestamp. Batch runs emit unmatched rows immediately
    * (there is no "not yet" in batch), which is how the spec proves
    * stream ≡ batch on the final result. */
  def intervalJoinLeftOuter(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      maxDelay: String,
      lateness: String = "10 minutes"): DataFrame =
    joined(left, right, keyCol, leftTs, rightTs, maxDelay, lateness,
      "leftOuter")

  private def joined(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      maxDelay: String,
      lateness: String,
      joinType: String): DataFrame = {
    require(left.columns.contains(keyCol) && right.columns.contains(keyCol),
      s"both sides need the join key '$keyCol'")
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    // Side-qualified references (never bare col): timestamps may share
    // a name across sides without ambiguity. The OUTPUT then carries
    // both same-named columns — select through l(...)/r(...) or
    // rename upstream before aggregating downstream.
    l.join(r,
      l(keyCol) === r(keyCol) &&
        r(rightTs) > l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $maxDelay"),
      joinType)
      .drop(r(keyCol))
  }
}
