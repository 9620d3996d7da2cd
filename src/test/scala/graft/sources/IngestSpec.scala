package graft.sources

import graft.SparkSpec
import java.sql.Timestamp

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("normalizeStatus: null defaults, cm2→m2, lower-cased state (S1)") {
    val raw = Seq(
      (Some(ts("2024-01-01 10:00:00")), "Robo", Some("CLEANING"), None: Option[Int],
        Some("Balanced"), None: Option[String], None: Option[String],
        Some("Standard"), None: Option[Int], None: Option[Long], Some(123456.0)))
      .toDF("timestamp", "device_name", "state", "battery", "fan_power",
        "water_box_status", "water_box_mode", "mop_mode", "error_code",
        "clean_time", "clean_area")
    val r = rows(Ingest.normalizeStatus(raw)).head
    assert(r.getAs[String]("state") == "cleaning")
    assert(r.getAs[Int]("battery") == 0)
    assert(r.getAs[Double]("cleanAreaM2") == 12.35)
  }

  test("normalizeConsumables: cleaning_brush falls back to mop_work_time (S4)") {
    val raw = Seq(
      (Some(ts("2024-01-01 10:00:00")), "Robo", Some(10L), Some(20L), Some(30L),
        Some(40L), None: Option[Long], Some(99L)),
      (Some(ts("2024-01-01 10:00:00")), "Robo2", Some(10L), Some(20L), Some(30L),
        Some(40L), Some(55L), Some(99L)))
      .toDF("timestamp", "device_name", "main_brush_work_time",
        "side_brush_work_time", "filter_work_time", "sensor_dirty_time",
        "cleaning_brush_work_time", "mop_work_time")
    val got = rows(Ingest.normalizeConsumables(raw))
      .map(r => r.getAs[String]("deviceName") -> r.getAs[Long]("mopPad")).toMap
    assert(got == Map("Robo" -> 99L, "Robo2" -> 55L))
  }

  test("normalizeRecords: sec→min 1dp, cm2→m2 2dp, lower-cased enums (S5)") {
    val raw = Seq(
      (Some(ts("2024-01-01 10:05:00")), "Robo", Some(ts("2024-01-01 10:00:00")),
        Some(1234.0), Some(251234.0), Some("VACUUM_AND_MOP"), Some("App"),
        None: Option[Int], Some("Finished")))
      .toDF("timestamp", "device_name", "start_time", "duration", "area",
        "clean_mode", "clean_way", "error_code", "task_status")
    val r = rows(Ingest.normalizeRecords(raw)).head
    assert(r.getAs[Double]("durationMin") == 20.6)
    assert(r.getAs[Double]("areaM2") == 25.12)
    assert(r.getAs[String]("cleanMode") == "vacuum_and_mop")
    assert(r.getAs[String]("taskStatus") == "finished")
  }
}
