package graft.streaming

import graft.SparkSpec
import graft.operators.TimeSeries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ≡ batch parity for the CUSUM drift pager: batch q209 is
  * hash-gated against DuckDB via the cumsum − running-min identity;
  * this suite replays the SAME sf0.001 events through the stateful
  * fold (flatMapGroupsWithState, s = max(0, s + d), two longs of
  * state per key) against frozen `cusumCenters`, parquet sink +
  * checkpoint, with a restart seam after the first chunk. Integer
  * micro arithmetic on both sides ⇒ the comparison is exact set
  * equality, not a tolerance. */
class CusumStreamSpec extends SparkSpec {

  private val Slack = 10000000L
  private val Threshold = 100000000L

  test("cusumWithCenters over own centers == self-centered cusum") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Graft.table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val self = TimeSeries.cusum(ev, "user_id", "ts", "event_id",
      "value", Slack, Threshold)
    val frozen = TimeSeries.cusumWithCenters(ev,
      TimeSeries.cusumCenters(ev, "user_id", "value"),
      "user_id", "ts", "event_id", "value", Slack, Threshold)
    assert(sortedRows(self) == sortedRows(frozen),
      "the frozen-center path must be bit-identical when centers are " +
        "the series' own means")
  }

  test("streaming fold over micro-batches == batch cusum, across restart") {
    implicit val s = spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Graft.table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val centers = TimeSeries.cusumCenters(ev, "user_id", "value")

    val batchOut = TimeSeries.cusum(ev, "user_id", "ts", "event_id",
        "value", Slack, Threshold)
      .select(col("user_id"), unix_millis(col("ts")).as("tsMs"),
        col("event_id"), col("s_hi"), col("s_lo"),
        col("alarm_hi"), col("alarm_lo"))
      .collect().map(_.toSeq).toSet
    assert(batchOut.exists(_(5) == true) || batchOut.exists(_(6) == true),
      "fixture never alarms at this threshold — parity would be weak")

    val all = ev
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .collect().sortBy(r => (r._2.getTime, r._3))
    // Cuts BETWEEN distinct timestamps: same-instant samples stay in
    // one micro-batch, so the per-key in-batch sort defines their
    // order on both sides.
    val cuts = Seq(1, 2).map(i => all(all.length * i / 3)._2.getTime)
    val chunks = Seq(
      all.filter(_._2.getTime < cuts(0)),
      all.filter(r => r._2.getTime >= cuts(0) && r._2.getTime < cuts(1)),
      all.filter(_._2.getTime >= cuts(1)))
    assert(chunks.forall(_.nonEmpty), "need three real micro-batches")

    val base = java.nio.file.Files.createTempDirectory("cusum-parity")
    val ckpt = base.resolve("ckpt").toString
    val outDir = base.resolve("out").toString
    def startQuery(
        input: MemoryStream[(Long, java.sql.Timestamp, Long, Double)]) =
      CusumStream.points(
          input.toDF().toDF("user_id", "ts", "event_id", "value"),
          centers, "user_id", "ts", "event_id", "value",
          Slack, Threshold)
        .writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()

    // Chunk 1, then STOP — the restart seam: the keyed fold state
    // (two longs per key) must survive via the state store.
    val input1 = MemoryStream[(Long, java.sql.Timestamp, Long, Double)](spark)
    val q1 = startQuery(input1)
    try {
      input1.addData(chunks(0).toIndexedSeq)
      q1.processAllAvailable()
    } finally q1.stop()

    val input2 = MemoryStream[(Long, java.sql.Timestamp, Long, Double)](spark)
    input2.addData(chunks(0).toIndexedSeq) // re-offered, must not replay
    val q2 = startQuery(input2)
    try {
      input2.addData(chunks(1).toIndexedSeq)
      q2.processAllAvailable()
      input2.addData(chunks(2).toIndexedSeq)
      q2.processAllAvailable()
    } finally q2.stop()

    val streamOut = spark.read.parquet(outDir)
      .select(col("k"), col("tsMs"), col("id"), col("s_hi"), col("s_lo"),
        col("alarm_hi"), col("alarm_lo"))
      .collect().map(_.toSeq).toSet
    assert(streamOut == batchOut,
      s"cusum stream/batch divergence: stream-only=" +
        s"${(streamOut -- batchOut).take(3)} " +
        s"batch-only=${(batchOut -- streamOut).take(3)}")
    // Exactly-once: count equality too (event_ids are unique, so set
    // equality cannot hide a replayed chunk behind duplicates).
    assert(spark.read.parquet(outDir).count() == batchOut.size.toLong)
  }
}
