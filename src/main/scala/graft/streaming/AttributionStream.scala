package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `graft.operators.Sessionize.attribution`: the
  * live last-touch attributor. Batch attribution answers "which
  * channel drove this quarter's conversions" after the fact; a
  * marketing monitor wants each conversion attributed the micro-batch
  * it lands. The state is the MINIMAL thing a key's future needs —
  * one (µs, channel) pair, the last touch seen — overwritten on every
  * touch, read on every conversion, never growing with history
  * (contrast a buffered-events design, which is unbounded under a
  * touch flood).
  *
  * Parity with the batch operator is exact: the per-key in-batch fold
  * order (us, kind touch-before-conversion, tie) reproduces the batch
  * side's max_by-tie touch dedup + running last-non-null over
  * (us, kind) — AttributionStreamSpec pins stream ≡ batch on the
  * driver fixture, restart seam included. Values micro-quantize with
  * the SAME HALF_UP rule as Spark's `round`. Cross-batch order is the
  * ingest contract (same stance as Sessionizer/CusumStream); a touch
  * arriving in a LATER batch than a conversion it should have claimed
  * is late data, and the batch operator re-run over the landed corpus
  * is the reconciliation path.
  *
  * Scale: shuffle on the key only; state is one struct per key.
  */
object AttributionStream {

  /** One input event. `conv` marks the conversion type; touches carry
    * their channel in `ch`. */
  case class Ev(
      k: Long, us: Long, tie: Long, conv: Boolean, ch: String,
      v: Option[Double])

  /** The whole per-key state: the last touch seen. */
  case class Touch(us: Long, ch: String)

  /** One attributed conversion. `channel` is "(none)" when the last
    * touch is absent or staler than the lookback; `lagUs` only
    * reports for real attributions (the batch census convention). */
  case class Attributed(
      k: Long, us: Long, tie: Long, channel: String,
      vq: Option[Long], lagUs: Option[Long])

  /** Spark `round(x)` on doubles is BigDecimal HALF_UP — mirrored
    * here so stream and batch quantize bit-identically (math.round
    * would differ on negative halves). */
  def quantize(v: Double): Long =
    java.math.BigDecimal.valueOf(v * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue

  /** Pure per-key fold — exercised directly by the spec and by the
    * streaming wrapper. Returns (attributed conversions, new state). */
  def step(
      state: Option[Touch],
      events: Seq[Ev],
      lookbackUs: Long): (Seq[Attributed], Option[Touch]) = {
    var st = state
    val out = Seq.newBuilder[Attributed]
    // Touches sort before conversions at the same µs (inclusive as-of
    // bound); ascending tie leaves the max-tie touch in state — the
    // batch side's max_by dedup.
    events.sortBy(e => (e.us, if (e.conv) 1 else 0, e.tie)).foreach { e =>
      if (!e.conv) st = Some(Touch(e.us, e.ch))
      else {
        val hit = st.filter(t => e.us - t.us <= lookbackUs)
        out += Attributed(e.k, e.us, e.tie,
          hit.map(_.ch).getOrElse("(none)"),
          e.v.map(quantize),
          hit.map(t => e.us - t.us))
      }
    }
    (out.result(), st)
  }

  /** Wire a streaming frame (keyCol long, tsCol timestamp, tieCol
    * long, typeCol string, valueCol numeric): every `conversionType`
    * row is attributed against the key's running last touch. Returns
    * the per-conversion stream (append mode downstream); the channel
    * census is one batch aggregate over the sink. */
  def attributed(
      input: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      valueCol: String,
      conversionType: String,
      lookbackSec: Long): Dataset[Attributed] = {
    require(lookbackSec > 0, "lookbackSec must be positive")
    val spark = input.sparkSession
    import spark.implicits._
    val evs = input.select(col(keyCol).cast("long").as("k"),
        unix_micros(col(tsCol)).as("us"),
        col(tieCol).cast("long").as("tie"),
        (col(typeCol) === conversionType).as("conv"),
        col(typeCol).as("ch"),
        col(valueCol).cast("double").as("v"))
      .as[Ev]
    evs.groupByKey(_.k)
      .flatMapGroupsWithState[Touch, Attributed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Ev], gs: GroupState[Touch]) =>
          val (out, st) = step(gs.getOption, it.toSeq,
            lookbackSec * 1000000L)
          st.foreach(gs.update)
          out.iterator
      }
  }
}
