package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream join + watermarked dedup — the streaming twins of the
  * batch J2 correlation and T4/T5 dedup semantics: status events
  * enriched with the cleaning session they belong to, and replayed
  * input collapsing to one row inside the watermark. */
class StreamJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("interval stream-stream join enriches status with its session") {
    import spark.implicits._
    val status = MemoryStream[(String, Timestamp, Int)](spark)
    val session = MemoryStream[(String, Timestamp, Double)](spark)

    val s = status.toDS().toDF("dev", "sts", "battery")
      .withWatermark("sts", "10 minutes")
    val c = session.toDS().toDF("dev2", "cts", "area")
      .withWatermark("cts", "10 minutes")

    // Event-time range condition bounds the state either side retains —
    // an unbounded stream-stream join would buffer forever.
    val joined = s.join(c,
      expr("""dev = dev2 AND sts BETWEEN cts - INTERVAL 5 MINUTES
             |                       AND cts + INTERVAL 5 MINUTES""".stripMargin))
      .select(col("dev"), col("sts"), col("battery"), col("area"))

    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      status.addData(("d1", ts("2024-01-01 10:00:00"), 80),
        ("d1", ts("2024-01-01 10:20:00"), 60))
      session.addData(("d1", ts("2024-01-01 10:02:00"), 12.5))
      q.processAllAvailable()
      val got = spark.table("ssj").collect()
      // Only the 10:00 status falls in [09:57, 10:07]; 10:20 does not.
      assert(got.length == 1)
      assert(got.head.getAs[Int]("battery") == 80
        && got.head.getAs[Double]("area") == 12.5)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark collapses replayed rows") {
    import spark.implicits._
    val input = MemoryStream[(String, Timestamp)](spark)
    val dedup = input.toDS().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = dedup.writeStream.format("memory").queryName("ddwm")
      .outputMode("append").start()
    try {
      input.addData(("a", ts("2024-01-01 10:00:00")),
        ("a", ts("2024-01-01 10:01:00")),   // replay inside the watermark
        ("b", ts("2024-01-01 10:00:30")))
      q.processAllAvailable()
      input.addData(("a", ts("2024-01-01 10:02:00")))  // replay, next batch
      q.processAllAvailable()
      assert(spark.table("ddwm").select("id").as[String].collect().sorted
        .toSeq == Seq("a", "b"))
    } finally q.stop()
  }
}
