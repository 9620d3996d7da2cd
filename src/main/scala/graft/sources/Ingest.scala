package graft.sources

import graft.operators.Normalize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S1–S5 — raw-telemetry normalization (SURVEY.md §2.1), as pure
  * `DataFrame => DataFrame` projections that Catalyst folds into the
  * scan: enum→string mapping, null defaulting, unit conversions,
  * casts. The reference does this row-at-a-time per network fetch
  * (roborock_collector.py:295-525); here it is one codegen'd
  * projection over a landing-zone table of any size.
  */
object Ingest {

  /** S1 — device-status normalization (roborock_collector.py:295-352):
    * null-safe enum strings, battery/clean_time default 0, cm²→m²
    * with 2 dp HALF_UP, explicit string casts. */
  def normalizeStatus(raw: DataFrame): DataFrame =
    raw.select(
      coalesce(col("timestamp"), current_timestamp()).as("timestamp"),
      col("device_name").cast("string").as("deviceName"),
      lower(coalesce(col("state"), lit("unknown"))).as("state"),
      coalesce(col("battery"), lit(0)).cast("int").as("battery"),
      col("fan_power").cast("string").as("fanPower"),
      col("water_box_status").cast("string").as("waterBoxStatus"),
      col("water_box_mode").cast("string").as("waterBoxMode"),
      col("mop_mode").cast("string").as("mopMode"),
      col("error_code").cast("int").as("errorCode"),
      coalesce(col("clean_time"), lit(0L)).cast("long").as("cleanTimeSec"),
      Normalize.cm2ToM2(coalesce(col("clean_area"), lit(0.0))).as("cleanAreaM2"))

  /** S3 — lifetime clean summary (roborock_collector.py:365-396):
    * totals with null-default 0, area cm²→m². */
  def normalizeSummary(raw: DataFrame): DataFrame =
    raw.select(
      coalesce(col("timestamp"), current_timestamp()).as("timestamp"),
      col("device_name").cast("string").as("deviceName"),
      Normalize.secToMin(coalesce(col("clean_time"), lit(0.0))).as("totalCleanTimeMin"),
      Normalize.cm2ToM2(coalesce(col("clean_area"), lit(0.0))).as("totalCleanAreaM2"),
      coalesce(col("clean_count"), lit(0L)).cast("long").as("totalCleanCount"))

  /** S4 — consumables with the attribute-name fallback
    * (roborock_collector.py:417-420): mop pad = cleaning_brush_work_time
    * falling back to mop_work_time. Values pass through raw, as in the
    * reference. */
  def normalizeConsumables(raw: DataFrame): DataFrame =
    raw.select(
      coalesce(col("timestamp"), current_timestamp()).as("timestamp"),
      col("device_name").cast("string").as("deviceName"),
      col("main_brush_work_time").cast("long").as("mainBrush"),
      col("side_brush_work_time").cast("long").as("sideBrush"),
      col("filter_work_time").cast("long").as("filter"),
      col("sensor_dirty_time").cast("long").as("sensorDirty"),
      coalesce(col("cleaning_brush_work_time"), col("mop_work_time"))
        .cast("long").as("mopPad"))

  /** S5 — detailed cleaning records (roborock_collector.py:436-525):
    * duration sec→min (1 dp), area cm²→m² (2 dp), enum strings, int
    * casts with null-through. */
  def normalizeRecords(raw: DataFrame): DataFrame =
    raw.select(
      coalesce(col("timestamp"), current_timestamp()).as("timestamp"),
      col("device_name").cast("string").as("deviceName"),
      col("start_time").cast("timestamp").as("startTime"),
      Normalize.secToMin(coalesce(col("duration"), lit(0.0))).as("durationMin"),
      Normalize.cm2ToM2(coalesce(col("area"), lit(0.0))).as("areaM2"),
      lower(col("clean_mode")).cast("string").as("cleanMode"),
      lower(col("clean_way")).cast("string").as("cleanWay"),
      col("error_code").cast("int").as("errorCode"),
      lower(col("task_status")).cast("string").as("taskStatus"))
}
