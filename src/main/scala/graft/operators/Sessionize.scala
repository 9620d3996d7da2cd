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
}
