package graft.streaming

import graft.SparkSpec
import graft.sources.ManifestTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ≡ batch parity for the NATIVE as-of join (VERDICT r11
  * #8): batch q187 is hash-gated against DuckDB's own ASOF JOIN; this
  * suite replays the SAME sf0.001 purchases through foreachBatch
  * micro-batches, each as-of joined against a GROWING ManifestTable
  * state (click chunks committed ahead of the batch's time range —
  * the nightly state-table cadence), parquet sink + checkpoint. The
  * union of micro-batch outputs must equal the batch join exactly:
  * as-of looks only BACKWARD in time, so a state table that is
  * current through a batch's max left-time yields the same matches
  * the all-at-once join computes. Restart case: the query stops after
  * the first chunk and a NEW query resumes from the checkpoint —
  * exactly-once rows in the sink, no replays, no gaps. */
class AsOfStreamParitySpec extends SparkSpec {

  test("foreachBatch as-of vs growing state table == batch q187, across restart") {
    implicit val s = spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"

    val batchOut = graft.SparkEntry.queries("q187_asof_native")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(batchOut.nonEmpty, "fixture produced no as-of rows — vacuous")

    val ev = graft.Graft.table(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("click_us"),
        col("event_id"))
      .groupBy(col("user_id"), col("click_us"))
      .agg(max(col("event_id")).as("click_id"))
      .withColumn("click_at", col("click_us"))

    // Three time-cut chunks of purchases; before a chunk streams, the
    // state table has been advanced to hold every click at or before
    // that chunk's max time (plus everything earlier).
    val cuts = Seq(1, 2).map(i => purchases(purchases.length * i / 3)._3)
    val chunks = Seq(
      purchases.filter(_._3 < cuts(0)),
      purchases.filter(p => p._3 >= cuts(0) && p._3 < cuts(1)),
      purchases.filter(_._3 >= cuts(1)))
    assert(chunks.forall(_.nonEmpty), "need three real micro-batches")

    val base = java.nio.file.Files.createTempDirectory("asof-parity")
    val stateDir = base.resolve("state").toString
    val ckpt = base.resolve("ckpt").toString
    val outDir = base.resolve("out").toString
    def advanceState(uptoExclusive: Option[Long], txn: String): Unit =
      ManifestTable.commitMulti(spark, stateDir, txn, snapshots = Map(
        "clicks" -> uptoExclusive.map(c =>
          clicks.filter(col("click_us") < c)).getOrElse(clicks)))

    def startQuery(input: MemoryStream[(Long, Long, Long)]) =
      input.toDF().toDF("user_id", "event_id", "us").writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           batchId: Long) =>
            val state = ManifestTable.read(spark, stateDir, "clicks")
            graft.plans.AsOfJoinPlan
              .join(batch, state, Seq("user_id"), "us", "click_us")
              .write.mode("append").parquet(outDir)
        }
        .start()

    // Chunk 1, then STOP — the restart seam.
    advanceState(Some(cuts(0)), "state-0")
    val input1 = MemoryStream[(Long, Long, Long)](spark)
    val q1 = startQuery(input1)
    try {
      input1.addData(chunks(0).toIndexedSeq)
      q1.processAllAvailable()
    } finally q1.stop()

    // New query, same checkpoint: already-processed chunk 1 data is
    // re-offered by the fresh MemoryStream but must NOT replay into
    // the sink (committed offsets), and chunks 2–3 flow on.
    val input2 = MemoryStream[(Long, Long, Long)](spark)
    input2.addData(chunks(0).toIndexedSeq)
    val q2 = startQuery(input2)
    try {
      advanceState(Some(cuts(1)), "state-1")
      input2.addData(chunks(1).toIndexedSeq)
      q2.processAllAvailable()
      advanceState(None, "state-2")
      input2.addData(chunks(2).toIndexedSeq)
      q2.processAllAvailable()
    } finally q2.stop()

    val streamOut = spark.read.parquet(outDir)
      .collect().map(_.toSeq).toSet
    assert(streamOut == batchOut,
      s"as-of stream/batch divergence: stream-only=" +
        s"${(streamOut -- batchOut).take(3)} " +
        s"batch-only=${(batchOut -- streamOut).take(3)}")
    // Exactly-once: row COUNT matches too — set equality alone would
    // mask a replayed chunk (purchase event_ids are unique, so the
    // batch result has no duplicate rows for count to hide behind).
    assert(spark.read.parquet(outDir).count() == batchOut.size.toLong)
  }
}
