package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `graft.operators.TimeSeries.cusumWithCenters`:
  * the live drift pager. Batch CUSUM answers "where did this series
  * drift?" after the fact; a monitor wants the alarm the micro-batch
  * it happens. Centers are FROZEN calibration input (a static table
  * from `TimeSeries.cusumCenters` over a known-good period) — a
  * streaming operator cannot see a final mean, and self-recalibrating
  * CUSUM reads a fully drifted series as healthy anyway.
  *
  * The state fold is the recurrence itself, s = max(0, s + d) — ONE
  * pair of longs per key, the minimal state there is — which the
  * batch side's cumsum − running-min identity reproduces exactly
  * (TimeSeriesSpec pins fold ≡ identity; CusumStreamSpec pins
  * stream ≡ batch on the same fixture, restart included). All
  * arithmetic is integer micro, so parity is bit-exact, not
  * approximate.
  *
  * Scale: the shuffle is on the key only; the stream-static center
  * join broadcasts when centers are small and hash-joins otherwise;
  * state never grows with history. Samples inside a micro-batch are
  * folded in event-time order per key; cross-batch order is the
  * ingest contract (same stance as Sessionizer).
  */
object CusumStream {

  /** One input sample after the center attach (micro domain). */
  case class Sample(k: Long, tsMs: Long, id: Long, xq: Long, ctr: Long)

  /** Emitted verdict per sample. */
  case class Point(
      k: Long, tsMs: Long, id: Long,
      s_hi: Long, s_lo: Long, alarm_hi: Boolean, alarm_lo: Boolean)

  /** The two accumulators — everything a key's future needs. */
  case class St(sHi: Long, sLo: Long)

  /** Pure per-key fold — exercised directly by the spec and by the
    * streaming wrapper. Returns (points, new state). */
  def step(
      state: St,
      samples: Seq[Sample],
      slackMicro: Long,
      thresholdMicro: Long): (Seq[Point], St) = {
    var sHi = state.sHi
    var sLo = state.sLo
    val out = samples.sortBy(s => (s.tsMs, s.id)).map { s =>
      sHi = math.max(0L, sHi + (s.xq - s.ctr - slackMicro))
      sLo = math.max(0L, sLo + (-(s.xq - s.ctr) - slackMicro))
      Point(s.k, s.tsMs, s.id, sHi, sLo,
        sHi > thresholdMicro, sLo > thresholdMicro)
    }
    (out, St(sHi, sLo))
  }

  /** Wire a streaming frame (keyCol long, tsCol timestamp, idCol
    * long, valueCol numeric) against static `centers` (keyCol, ctr).
    * Keys without a center drop — no center, no verdict. Returns the
    * per-sample verdict stream (append mode downstream). */
  def points(
      input: DataFrame,
      centers: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String,
      slackMicro: Long,
      thresholdMicro: Long): Dataset[Point] = {
    require(slackMicro >= 0, "slackMicro must be non-negative")
    require(thresholdMicro > 0, "thresholdMicro must be positive")
    val spark = input.sparkSession
    import spark.implicits._
    val samples = input.join(centers, Seq(keyCol))
      .select(col(keyCol).cast("long").as("k"),
        // Millisecond event time is the fold's order key; the fixture
        // cadence is ≥ 1 s so ms never collides where ns wouldn't.
        (unix_millis(col(tsCol))).as("tsMs"),
        col(idCol).cast("long").as("id"),
        round(col(valueCol).cast("double") * lit(1e6)).cast("long")
          .as("xq"),
        col("ctr").cast("long").as("ctr"))
      .as[Sample]
    samples.groupByKey(_.k)
      .flatMapGroupsWithState[St, Point](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Sample], gs: GroupState[St]) =>
          val (out, st) = step(gs.getOption.getOrElse(St(0L, 0L)),
            it.toSeq, slackMicro, thresholdMicro)
          gs.update(st)
          out.iterator
      }
  }
}
