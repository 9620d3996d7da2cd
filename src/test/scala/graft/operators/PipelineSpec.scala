package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val records = Seq(
    (ts("2024-01-01 10:00:00"), "d1", Some(20.0), Some(25.5)),
    (ts("2024-01-01 15:00:00"), "d1", Some(30.0), Some(30.5)),
    (ts("2024-01-02 10:00:00"), "d2", Some(10.0), None))
    .toDF("startTime", "deviceName", "durationMin", "areaM2")

  test("dailySummary computes the declared-but-never-filled table (pipeline.py:307)") {
    val out = Pipeline.dailySummary(records)
      .orderBy("date")
    val got = rows(out).map(r => (r.getDate(0).toString, r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got == Seq(
      ("2024-01-01", 2L, 56.0, 50.0, 28.0),
      ("2024-01-02", 1L, 0.0, 10.0, 0.0)))
  }

  test("devicesWithNewWork filters to devices whose counter advanced (pipeline.py:505-513)") {
    val cur = Seq(("d1", 12L), ("d2", 5L)).toDF("deviceName", "totalCleanCount")
    val st = Seq(("d1", 10L), ("d2", 5L)).toDF("deviceName", "lastCleanCount")
    val out = Pipeline.devicesWithNewWork(cur, st)
    assert(rows(out).map(_.getString(0)) == Seq("d1"))
    assert(rows(out).map(_.getAs[Long]("new_n")) == Seq(2L))
  }

  test("nextState snapshots current counters as the new watermark") {
    val cur = Seq(("d1", 12L)).toDF("deviceName", "totalCleanCount")
    val out = Pipeline.nextState(cur)
    assert(out.columns.toSeq == Seq("deviceName", "lastCleanCount"))
    assert(rows(out).head.getLong(1) == 12L)
  }

  test("summaryConsistency flags devices whose snapshot disagrees with the log") {
    val summary = Seq(("d1", 2L), ("d2", 99L)).toDF("deviceName", "totalCleanCount")
    val out = Pipeline.summaryConsistency(records, summary)
    assert(rows(out).map(_.getString(0)) == Seq("d2"))
  }

  test("consumablesAsOfCleaning works with tieBreak == tsCol (regression: duplicate column)") {
    val cleanings = Seq((ts("2024-01-02 10:00:00"), "d1"))
      .toDF("timestamp", "deviceName")
    val consumables = Seq(
      (ts("2024-01-01 09:00:00"), "d1"),
      (ts("2024-01-03 09:00:00"), "d1"))
      .toDF("timestamp", "deviceName")
    val out = Pipeline.consumablesAsOfCleaning(cleanings, consumables)
    val r = rows(out).head
    assert(r.getAs[Timestamp]("lastConsumablesTs") == ts("2024-01-01 09:00:00"))
  }

  test("periodRollup produces day/month/year subtotal levels") {
    val out = Pipeline.periodRollup(records)
    // rollup(y,m,d): 3 day rows? (two days for Jan) + month + year + grand total
    val grand = out.filter(col("y").isNull && col("m").isNull && col("d").isNull)
    assert(rows(grand).head.getAs[Long]("cleanings") == 3L)
  }
}
