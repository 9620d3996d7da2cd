package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `graft.operators.TimeSeries.rollingMannKendall`:
  * the live ROBUST-trend pager next to [[CusumStream]]'s mean-shift
  * pager. CUSUM pages on a level shift against frozen centers;
  * Mann–Kendall pages on a monotone trend with NO calibration input
  * at all — the statistic is rank-based, so a slow ramp that never
  * crosses a CUSUM threshold still alarms here, and gain changes
  * (×2 the metric) do not move it.
  *
  * State per key is the trailing `window` micro-quantized values
  * (bounded by construction — the fold evicts as it appends) plus
  * the running pair-sign sum S maintained INCREMENTALLY: evicting e
  * subtracts Σ sign(x − e) over the survivors, appending v adds
  * Σ sign(v − x) — O(window) per sample, and bit-identical to the
  * batch side's delta-prefix construction (every pair enters at its
  * right end and leaves W past its left end on both sides; the
  * parity spec pins stream ≡ batch across a restart seam).
  *
  * Scale: shuffle on the key only; state = window longs per key;
  * samples fold in (event-time ms, id) order within a micro-batch,
  * cross-batch order is the ingest contract (the [[CusumStream]] /
  * Sessionizer stance). ALL arithmetic is exact integer — z_micro
  * comes from the same integer-sqrt construction as the batch side
  * (no libm result reaches an emitted cell on either side). */
object TrendStream {

  /** One input sample (micro domain). */
  case class Sample(k: Long, tsMs: Long, id: Long, xq: Long)

  /** Emitted verdict per sample — the batch row, live. */
  case class Point(
      k: Long, tsMs: Long, id: Long,
      n_win: Int, s: Long, z_micro: Option[Long], alarm: Boolean)

  /** Trailing window (oldest first) + its running MK S. */
  case class St(win: Seq[Long], s: Long)

  private def sign(d: Long): Long = if (d > 0) 1L else if (d < 0) -1L else 0L

  /** Exact z_micro twin of the batch cell (TimeSeries
    * .rollingMannKendall): with B = n(n−1)(2n+5),
    * |z| = 1e6·|s|/sqrt(B/18), so (2|z|)² = 72e12·s²/B and
    * round-half-away(|z|) = (isqrt(72e12·s² div B) + 1) div 2 —
    * pure integer, bit-identical to the batch/oracle construction
    * (a float round here is toward-+inf on negative halves in Scala
    * vs away-from-zero in SQL, besides the libm fragility). */
  def zMicroExact(s: Long, n: Long): Long = {
    val b = BigInt(n) * (n - 1) * (2 * n + 5)
    val q = BigInt(72000000000000L) * s * s / b
    val u = BigInt(q.bigInteger.sqrt())
    val k = ((u + 1) >> 1).toLong
    if (s < 0) -k else k
  }

  /** Pure per-key fold — exercised directly by the spec and by the
    * streaming wrapper. Returns (points, new state). */
  def step(
      state: St,
      samples: Seq[Sample],
      window: Int,
      thresholdMicro: Long): (Seq[Point], St) = {
    var win = state.win
    var s = state.s
    val out = samples.sortBy(x => (x.tsMs, x.id)).map { smp =>
      if (win.size == window) {
        val e = win.head
        win = win.tail
        s -= win.map(x => sign(x - e)).sum
      }
      s += win.map(x => sign(smp.xq - x)).sum
      win = win :+ smp.xq
      val n = win.size
      val z = if (n >= 2) Some(zMicroExact(s, n)) else None
      Point(smp.k, smp.tsMs, smp.id, n, s, z,
        z.exists(v => math.abs(v) > thresholdMicro))
    }
    (out, St(win, s))
  }

  /** Wire a streaming frame (keyCol long, tsCol timestamp, idCol
    * long, valueCol numeric) into the keyed fold. Returns the
    * per-sample verdict stream (append mode downstream). */
  def points(
      input: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String,
      window: Int,
      thresholdMicro: Long): Dataset[Point] = {
    require(window >= 2 && window <= 256,
      "window must be in [2, 256] — it IS the per-key state size")
    require(thresholdMicro > 0, "thresholdMicro must be positive")
    val spark = input.sparkSession
    import spark.implicits._
    val samples = input.filter(col(valueCol).isNotNull)
      .select(col(keyCol).cast("long").as("k"),
        unix_millis(col(tsCol)).as("tsMs"),
        col(idCol).cast("long").as("id"),
        round(col(valueCol).cast("double") * lit(1e6)).cast("long")
          .as("xq"))
      .as[Sample]
    samples.groupByKey(_.k)
      .flatMapGroupsWithState[St, Point](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Sample], gs: GroupState[St]) =>
          val (out, st) = step(gs.getOption.getOrElse(St(Nil, 0L)),
            it.toSeq, window, thresholdMicro)
          gs.update(st)
          out.iterator
      }
  }
}
