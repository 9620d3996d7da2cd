package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `graft.operators.Sessionize.funnel`: the live
  * funnel tracker. Batch funnel reads the whole corpus to find each
  * key's per-step first-qualifying times; the stream advances a
  * per-key step counter as events arrive and emits one Advance row
  * the moment a key reaches a step — the dashboard updates per
  * micro-batch, and the census over the sink equals the batch
  * operator's per-step table exactly (FunnelStreamSpec pins it,
  * restart included).
  *
  * The greedy time-ordered advance IS the batch semantics: step 1's
  * first event is its min-time; the first step-k event STRICTLY after
  * t_{k-1} is the min over qualifying events. Same-µs collisions need
  * no tie policy — a step-k event at exactly t_{k-1} fails the strict
  * bound no matter the processing order (the spec's step test pins
  * this). State is two numbers per key (steps completed, time of the
  * last advance) — never a buffer.
  *
  * Cross-batch order is the ingest contract (the Sessionizer /
  * CusumStream / AttributionStream stance).
  */
object FunnelStream {

  /** One input event; `ch` is matched against the step list. */
  case class Ev(k: Long, us: Long, tie: Long, ch: String)

  /** The whole per-key state: steps completed + when the last one
    * landed (µs). */
  case class Prog(step: Int, tUs: Long)

  /** One step advance. `prevUs` is None for step 1 (no previous
    * step — the batch census's NULL avg column). */
  case class Advance(
      k: Long, step: Int, us: Long, prevUs: Option[Long])

  /** Pure per-key fold — exercised directly by the spec and by the
    * streaming wrapper. Returns (advances, new state). */
  def step(
      state: Option[Prog],
      events: Seq[Ev],
      steps: Seq[String]): (Seq[Advance], Option[Prog]) = {
    var st = state.getOrElse(Prog(0, Long.MinValue))
    val out = Seq.newBuilder[Advance]
    events.sortBy(e => (e.us, e.tie)).foreach { e =>
      if (st.step < steps.length && e.ch == steps(st.step) &&
          (st.step == 0 || e.us > st.tUs)) {
        out += Advance(e.k, st.step + 1, e.us,
          if (st.step == 0) None else Some(st.tUs))
        st = Prog(st.step + 1, e.us)
      }
    }
    (out.result(), if (st.step == 0) None else Some(st))
  }

  /** Wire a streaming frame (keyCol long, tsCol timestamp, tieCol
    * long, typeCol string). Returns the per-advance stream (append
    * mode downstream); the per-step census is one batch aggregate
    * over the sink. */
  def advances(
      input: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      steps: Seq[String]): Dataset[Advance] = {
    require(steps.length >= 2 && steps.length <= 8,
      "steps must list 2..8 stage names")
    require(steps.distinct.length == steps.length,
      "steps must be distinct")
    val spark = input.sparkSession
    import spark.implicits._
    val evs = input.select(col(keyCol).cast("long").as("k"),
        unix_micros(col(tsCol)).as("us"),
        col(tieCol).cast("long").as("tie"),
        col(typeCol).as("ch"))
      .as[Ev]
    evs.groupByKey(_.k)
      .flatMapGroupsWithState[Prog, Advance](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Ev], gs: GroupState[Prog]) =>
          val (out, st) = step(gs.getOption, it.toSeq, steps)
          st.foreach(gs.update)
          out.iterator
      }
  }
}
