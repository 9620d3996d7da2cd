package graft.streaming

import graft.SparkSpec
import graft.operators.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ≡ batch parity for last-touch attribution: batch q291 is
  * hash-gated against DuckDB's ASOF join; this suite replays the SAME
  * sf0.001 events through the stateful fold (one (µs, channel) struct
  * per key), parquet sink + checkpoint, restart seam after the first
  * chunk, then aggregates the sink into the channel census and
  * demands exact set equality with `Sessionize.attribution`. */
class AttributionStreamSpec extends SparkSpec {

  private val Lookback = 86400L

  test("step: same-µs inclusive, max-tie touch, lookback expiry, state handoff") {
    import AttributionStream._
    // Batch 1: two touches at the same µs (tie 11 wins), conversion
    // at the same µs attributes with lag 0.
    val (out1, st1) = step(None, Seq(
      Ev(1L, 1000L, 10L, conv = false, "click", None),
      Ev(1L, 1000L, 11L, conv = false, "view", None),
      Ev(1L, 1000L, 12L, conv = true, "purchase", Some(2.5))),
      Lookback * 1000000L)
    assert(out1 == Seq(
      Attributed(1L, 1000L, 12L, "view", Some(2500000L), Some(0L))))
    assert(st1.contains(Touch(1000L, "view")))
    // Batch 2 (state carried): an in-window conversion, then one a
    // full lookback past the touch — "(none)", no lag.
    val (out2, st2) = step(st1, Seq(
      Ev(1L, 2000L, 13L, conv = true, "purchase", Some(1.0)),
      Ev(1L, 1000L + Lookback * 1000000L + 1L, 14L, conv = true,
        "purchase", None)),
      Lookback * 1000000L)
    assert(out2.head ==
      Attributed(1L, 2000L, 13L, "view", Some(1000000L), Some(1000L)))
    assert(out2(1).channel == "(none)")
    assert(out2(1).lagUs.isEmpty)
    assert(st2 == st1) // conversions never touch the state
  }

  test("streaming fold over micro-batches == batch attribution, across restart") {
    implicit val s = spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Graft.table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))

    val batchOut = Sessionize.attribution(ev, "user_id", "ts",
        "event_type", "value", "event_id",
        conversionType = "purchase", lookbackSec = Lookback)
      .collect().map(_.toSeq).toSet
    assert(batchOut.exists(_.head == "(none)") && batchOut.size > 1,
      "fixture must exercise both attributed and (none) buckets")

    val all = ev
      .as[(Long, java.sql.Timestamp, Long, String, Double)]
      .collect().sortBy(r => (r._2.getTime, r._3))
    // Cuts BETWEEN distinct timestamps: same-instant events stay in
    // one micro-batch, so the per-key in-batch sort defines their
    // order on both sides.
    val cuts = Seq(1, 2).map(i => all(all.length * i / 3)._2.getTime)
    val chunks = Seq(
      all.filter(_._2.getTime < cuts(0)),
      all.filter(r => r._2.getTime >= cuts(0) && r._2.getTime < cuts(1)),
      all.filter(_._2.getTime >= cuts(1)))
    assert(chunks.forall(_.nonEmpty), "need three real micro-batches")

    val base = java.nio.file.Files.createTempDirectory("attr-parity")
    val ckpt = base.resolve("ckpt").toString
    val outDir = base.resolve("out").toString
    def startQuery(
        input: MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]) =
      AttributionStream.attributed(
          input.toDF().toDF("user_id", "ts", "event_id", "event_type",
            "value"),
          "user_id", "ts", "event_id", "event_type", "value",
          conversionType = "purchase", lookbackSec = Lookback)
        .writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()

    // Chunk 1, then STOP — the restart seam: the last-touch state
    // must survive via the state store.
    val input1 =
      MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)](spark)
    val q1 = startQuery(input1)
    try {
      input1.addData(chunks(0).toIndexedSeq)
      q1.processAllAvailable()
    } finally q1.stop()

    val input2 =
      MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)](spark)
    input2.addData(chunks(0).toIndexedSeq) // re-offered, must not replay
    val q2 = startQuery(input2)
    try {
      input2.addData(chunks(1).toIndexedSeq)
      q2.processAllAvailable()
      input2.addData(chunks(2).toIndexedSeq)
      q2.processAllAvailable()
    } finally q2.stop()

    // The channel census over the sink must equal the batch operator
    // exactly (same aggregate shape, integer micro arithmetic).
    val streamCensus = spark.read.parquet(outDir)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conv"),
        sum(col("vq").cast("decimal(38,0)")).cast("long")
          .as("sum_value_micro"),
        when(col("channel") === "(none)", lit(null).cast("long"))
          .otherwise(round(
            sum(when(col("channel") =!= "(none)", col("lagUs"))
              .cast("decimal(38,0)")).cast("double") /
            count(lit(1)).cast("double")).cast("long"))
          .as("avg_lag_sec_micro"))
      .collect().map(_.toSeq).toSet
    assert(streamCensus == batchOut,
      s"attribution stream/batch divergence: stream-only=" +
        s"${(streamCensus -- batchOut).take(3)} " +
        s"batch-only=${(batchOut -- streamCensus).take(3)}")
    // Exactly-once: each conversion lands once ((k, us, tie) unique).
    val sunk = spark.read.parquet(outDir)
    assert(sunk.count() ==
      sunk.select(col("k"), col("us"), col("tie")).distinct().count())
  }
}
