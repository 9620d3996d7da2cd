package graft.streaming

import graft.SparkSpec
import graft.sources.Schemas.CleaningRecord
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class RecordSyncSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)
  private def rec(dev: String, start: String, area: Double) =
    CleaningRecord(ts(start), dev, ts(start), Some(30.0), Some(area),
      Some("vacuum"), Some("auto"), None, Some("completed"))

  test("dedupedStream drops duplicate (device, startTime) across batches") {
    import spark.implicits._
    val input = MemoryStream[CleaningRecord](spark)
    val q = RecordSync.dedupedStream(input.toDS()).writeStream
      .format("memory").queryName("recsync")
      .outputMode("append").start()
    try {
      input.addData(
        rec("d1", "2024-01-01 10:00:00", 25.0),
        rec("d1", "2024-01-01 10:00:00", 25.0),   // in-batch dup
        rec("d2", "2024-01-01 11:00:00", 10.0))
      q.processAllAvailable()
      input.addData(
        rec("d1", "2024-01-01 10:00:00", 25.0),   // cross-batch dup
        rec("d1", "2024-01-01 12:00:00", 30.0))   // genuinely new
      q.processAllAvailable()
      val got = spark.table("recsync")
        .select("deviceName", "startTime").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString)).sorted.toSeq
      assert(got == Seq(
        ("d1", "2024-01-01 10:00:00.0"),
        ("d1", "2024-01-01 12:00:00.0"),
        ("d2", "2024-01-01 11:00:00.0")))
    } finally q.stop()
  }

  test("coldStart keeps only the newest record per device (pipeline.py:721-723)") {
    import spark.implicits._
    val df = Seq(
      rec("d1", "2024-01-01 10:00:00", 25.0),
      rec("d1", "2024-01-02 10:00:00", 30.0),
      rec("d2", "2024-01-01 09:00:00", 10.0)).toDF()
    val out = RecordSync.coldStart(df, spark)
    val got = out.select("deviceName", "startTime").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString)).sorted.toSeq
    assert(got == Seq(("d1", "2024-01-02 10:00:00.0"), ("d2", "2024-01-01 09:00:00.0")))
  }
}
