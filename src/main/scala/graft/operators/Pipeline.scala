package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's batch entry points as composable, set-oriented
  * transforms (SURVEY.md §3): smart-sync (pipeline.py:472-572) and the
  * Daily_Summary aggregate the reference declares but never computes
  * (pipeline.py:307, README.md:250-257).
  *
  * Scale: smart-sync joins a per-device snapshot (one row per device)
  * against a state table of the same shape — the state side is always
  * broadcast; appends are idempotent via left-anti dedup, replacing
  * the reference's advance-state-even-on-sink-failure bug
  * (pipeline.py:562-568) with atomic batch semantics.
  */
object Pipeline {

  /** A1 — Daily_Summary over Cleaning_Records-shaped data:
    * per-day cleanings/area/time totals + averages
    * (canonical pipeline.py:307 column order). */
  def dailySummary(
      records: DataFrame,
      startTimeCol: String = "startTime",
      areaCol: String = "areaM2",
      durationCol: String = "durationMin"): DataFrame =
    records
      .groupBy(to_date(col(startTimeCol)).as("date"))
      .agg(
        count(lit(1)).as("totalCleanings"),
        sum(coalesce(col(areaCol), lit(0.0))).as("totalAreaM2"),
        sum(coalesce(col(durationCol), lit(0.0))).as("totalTimeMin"),
        avg(coalesce(col(areaCol), lit(0.0))).as("avgAreaM2"),
        avg(coalesce(col(durationCol), lit(0.0))).as("avgTimeMin"))

  /** Day→week→month rollup (README.md:254's manual-chart idea as a
    * single pass). */
  def periodRollup(
      records: DataFrame,
      startTimeCol: String = "startTime",
      areaCol: String = "areaM2"): DataFrame =
    records
      .rollup(
        year(col(startTimeCol)).as("y"),
        month(col(startTimeCol)).as("m"),
        dayofmonth(col(startTimeCol)).as("d"))
      .agg(count(lit(1)).as("cleanings"),
        sum(coalesce(col(areaCol), lit(0.0))).as("areaM2"))

  /** T4 smart-sync core — which devices have new work?
    * current: one row per device with `totalCleanCount`; state: last
    * synced count per device. Returns devices to sync with their
    * clamped delta (state_manager.py:66-74 + pipeline.py:505-513).
    */
  def devicesWithNewWork(
      current: DataFrame,
      state: DataFrame,
      keyCol: String = "deviceName",
      countCol: String = "totalCleanCount",
      lastCountCol: String = "lastCleanCount"): DataFrame =
    Incremental.stateDelta(current, state, keyCol, countCol, lastCountCol)
      .filter(col("new_n") > 0)

  /** T4 post-sync state snapshot: the new per-device watermark table
    * (overwrite semantics — one row per device). */
  def nextState(
      current: DataFrame,
      keyCol: String = "deviceName",
      countCol: String = "totalCleanCount"): DataFrame =
    current.select(col(keyCol), col(countCol).as("lastCleanCount"))

  /** A2 — recompute lifetime totals from the record log and compare
    * with the device-reported snapshot: the consistency check the
    * reference cannot do (SURVEY.md §2.4). Returns rows where they
    * disagree. */
  def summaryConsistency(
      records: DataFrame,
      summary: DataFrame,
      keyCol: String = "deviceName"): DataFrame = {
    val recomputed = records.groupBy(col(keyCol)).agg(
      count(lit(1)).as("recount"))
    summary.join(recomputed, Seq(keyCol), "left")
      .filter(coalesce(col("recount"), lit(0L)) =!= coalesce(col("totalCleanCount"), lit(0L)))
  }

  /** Latest consumables state as-of each cleaning (J2's as-of join
    * over the shared device key, SURVEY.md §2.6). */
  def consumablesAsOfCleaning(
      cleanings: DataFrame,
      consumables: DataFrame,
      keyCol: String = "deviceName",
      tsCol: String = "timestamp",
      tieBreak: String = "timestamp"): DataFrame =
    Incremental.asOfJoin(cleanings, consumables, keyCol, tsCol, tieBreak,
      "lastConsumablesTs")
}
