package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming windowed aggregation with watermarking — the per-period
  * summary (Daily_Summary at stream time) over event-time tumbling
  * windows. Covers the watermark-closes-window semantics the batch
  * dailySummary cannot express. */
class WindowedAggSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling-window counts finalize when the watermark passes") {
    import spark.implicits._
    val input = MemoryStream[(String, Timestamp, Double)](spark)
    val agg = input.toDS().toDF("dev", "ts", "area")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("dev"))
      .agg(count(lit(1)).as("n"), sum(col("area")).as("area"))
      .select(col("window.start").as("wstart"), col("dev"), col("n"), col("area"))
    val q = agg.writeStream
      .format("memory").queryName("winagg")
      .outputMode("append")   // append mode only emits CLOSED windows
      .start()
    try {
      input.addData(
        ("d1", ts("2024-01-01 10:05:00"), 10.0),
        ("d1", ts("2024-01-01 10:45:00"), 20.0))
      q.processAllAvailable()
      // Window [10:00, 11:00) still open — nothing emitted in append mode.
      assert(spark.table("winagg").count() == 0)

      // An event far past the window + watermark closes it.
      input.addData(("d1", ts("2024-01-01 12:30:00"), 5.0))
      q.processAllAvailable()
      val got = spark.table("winagg").collect()
      assert(got.length == 1)
      val r = got.head
      assert(r.getAs[Timestamp]("wstart") == ts("2024-01-01 10:00:00"))
      assert(r.getAs[Long]("n") == 2 && r.getAs[Double]("area") == 30.0)

      // A late event behind the watermark for the closed window is dropped.
      input.addData(("d1", ts("2024-01-01 10:50:00"), 99.0))
      q.processAllAvailable()
      assert(spark.table("winagg").count() == 1)
    } finally q.stop()
  }
}
