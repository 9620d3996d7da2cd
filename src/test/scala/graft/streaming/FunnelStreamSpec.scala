package graft.streaming

import graft.SparkSpec
import graft.operators.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ≡ batch parity for the ordered funnel: batch q289 is
  * hash-gated against DuckDB; this suite replays the SAME sf0.001
  * events through the stateful advance fold (two numbers of state per
  * key), parquet sink + checkpoint, restart seam after the first
  * chunk, then aggregates the sink into the per-step census and
  * demands exact equality with `Sessionize.funnel`. */
class FunnelStreamSpec extends SparkSpec {

  private val Steps = Seq("view", "click", "purchase")

  test("step: greedy advance is the min-time chain, strict bound, no tie policy needed") {
    import FunnelStream._
    // Same-µs step-2 event fails the strict bound in EITHER order.
    val (out1, st1) = step(None, Seq(
      Ev(1L, 1000L, 2L, "click"), // before any view: ignored
      Ev(1L, 1000L, 1L, "view"),
      Ev(1L, 2000L, 3L, "click"),
      Ev(1L, 2000L, 4L, "purchase")), // same µs as the click: out
      Steps)
    assert(out1 == Seq(
      Advance(1L, 1, 1000L, None),
      Advance(1L, 2, 2000L, Some(1000L))))
    assert(st1.contains(Prog(2, 2000L)))
    // State survives: the purchase completes in the next batch.
    val (out2, st2) = step(st1, Seq(Ev(1L, 3000L, 5L, "purchase")), Steps)
    assert(out2 == Seq(Advance(1L, 3, 3000L, Some(2000L))))
    assert(st2.contains(Prog(3, 3000L)))
    // A completed key ignores everything after.
    val (out3, _) = step(st2, Seq(Ev(1L, 4000L, 6L, "view")), Steps)
    assert(out3.isEmpty)
  }

  test("streaming advances over micro-batches == batch funnel, across restart") {
    implicit val s = spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Graft.table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))

    val batchOut = Sessionize.funnel(ev, "user_id", "ts",
        "event_type", Steps)
      .collect().map(_.toSeq).toSet
    assert(batchOut.size == Steps.length)

    val all = ev
      .as[(Long, java.sql.Timestamp, Long, String)]
      .collect().sortBy(r => (r._2.getTime, r._3))
    val cuts = Seq(1, 2).map(i => all(all.length * i / 3)._2.getTime)
    val chunks = Seq(
      all.filter(_._2.getTime < cuts(0)),
      all.filter(r => r._2.getTime >= cuts(0) && r._2.getTime < cuts(1)),
      all.filter(_._2.getTime >= cuts(1)))
    assert(chunks.forall(_.nonEmpty), "need three real micro-batches")

    val base = java.nio.file.Files.createTempDirectory("funnel-parity")
    val ckpt = base.resolve("ckpt").toString
    val outDir = base.resolve("out").toString
    def startQuery(
        input: MemoryStream[(Long, java.sql.Timestamp, Long, String)]) =
      FunnelStream.advances(
          input.toDF().toDF("user_id", "ts", "event_id", "event_type"),
          "user_id", "ts", "event_id", "event_type", Steps)
        .writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()

    val input1 =
      MemoryStream[(Long, java.sql.Timestamp, Long, String)](spark)
    val q1 = startQuery(input1)
    try {
      input1.addData(chunks(0).toIndexedSeq)
      q1.processAllAvailable()
    } finally q1.stop()

    val input2 =
      MemoryStream[(Long, java.sql.Timestamp, Long, String)](spark)
    input2.addData(chunks(0).toIndexedSeq) // re-offered, must not replay
    val q2 = startQuery(input2)
    try {
      input2.addData(chunks(1).toIndexedSeq)
      q2.processAllAvailable()
      input2.addData(chunks(2).toIndexedSeq)
      q2.processAllAvailable()
    } finally q2.stop()

    // Per-step census over the sink, in the batch operator's shape:
    // counts, share of step 1, avg seconds from the previous step.
    val sunk = spark.read.parquet(outDir)
    val perStep = sunk.groupBy(col("step").cast("long").as("step"))
      .agg(count(lit(1)).as("n_users"),
        sum((col("us") - col("prevUs")).cast("decimal(38,0)"))
          .as("__sumd"))
    val n1 = perStep.filter(col("step") === 1L)
      .select(col("n_users").as("__n1"))
    val streamCensus = perStep.crossJoin(broadcast(n1))
      .select(col("step"),
        element_at(
          array(Steps.map(lit): _*), col("step").cast("int"))
          .as("step_name"),
        col("n_users"),
        round(lit(1e6) * col("n_users").cast("double") /
          col("__n1").cast("double")).cast("long").as("conv_micro"),
        when(col("__sumd").isNotNull,
          round(col("__sumd").cast("double") /
            col("n_users").cast("double")).cast("long"))
          .otherwise(lit(null).cast("long"))
          .as("avg_sec_from_prev_micro"))
      .collect().map(_.toSeq).toSet
    assert(streamCensus == batchOut,
      s"funnel stream/batch divergence: stream-only=" +
        s"${(streamCensus -- batchOut).take(3)} " +
        s"batch-only=${(batchOut -- streamCensus).take(3)}")
    // Exactly-once: one advance per (key, step).
    assert(sunk.count() ==
      sunk.select(col("k"), col("step")).distinct().count())
  }
}
