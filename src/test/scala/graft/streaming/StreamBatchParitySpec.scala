package graft.streaming

import graft.{SparkEntry, SparkSpec}
import graft.sources.Schemas.CleaningHistory
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming ≡ batch parity gate for the sessionizer (VERDICT r2 #6):
  * the q28 CORRECTNESS row gates the batch twin of T2; this spec runs
  * the SAME fixture (sf0.001 events via the same extraction the gate
  * query uses) through the real streaming path — MemoryStream split
  * into multiple micro-batches, parquet sink, checkpointed — and
  * asserts the emitted sessions are identical. With q28 hash-matched
  * against the DuckDB oracle, this transitively pins the streaming
  * path to the oracle too. */
class StreamBatchParitySpec extends SparkSpec {

  test("streaming sessions over micro-batches == batch q28 sessions on sf0.001") {
    implicit val s = spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val samples = SparkEntry.statusSamplesFromEvents(spark, dir)

    val batchOut = Sessionizer.sessions(samples).collect().toSet
    assert(batchOut.nonEmpty, "fixture produced no sessions — gate is vacuous")

    // Split into 4 micro-batches on event-time cut points. Cuts are
    // BETWEEN distinct timestamps so same-instant samples never land in
    // different micro-batches (their relative order is defined by the
    // step function's in-batch sort, which a split would bypass).
    val all = samples.collect().sortBy(_.ts.getTime)
    val cuts = Seq(1, 2, 3).map(i => all(all.length * i / 4).ts.getTime)
    val chunks = Seq(
      all.filter(_.ts.getTime < cuts(0)),
      all.filter(x => x.ts.getTime >= cuts(0) && x.ts.getTime < cuts(1)),
      all.filter(x => x.ts.getTime >= cuts(1) && x.ts.getTime < cuts(2)),
      all.filter(_.ts.getTime >= cuts(2)))
    assert(chunks.count(_.nonEmpty) >= 2, "need real multi-batch coverage")

    val outDir = java.nio.file.Files.createTempDirectory("parity-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("parity-ckpt").toString
    val input = MemoryStream[graft.sources.Schemas.StatusSample](spark)
    val q = Sessionizer.sessions(input.toDS()).writeStream
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      chunks.filter(_.nonEmpty).foreach { c =>
        input.addData(c.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamOut = spark.read.parquet(outDir).as[CleaningHistory].collect().toSet
    assert(streamOut == batchOut,
      s"streaming/batch divergence: stream-only=${(streamOut -- batchOut).take(3)} " +
        s"batch-only=${(batchOut -- streamOut).take(3)}")
  }
}
