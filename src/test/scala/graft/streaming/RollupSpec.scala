package graft.streaming

import graft.SparkSpec
import graft.sources.ManifestTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Incrementally-maintained rollups: merge per micro-batch, atomic
  * snapshot per merge, sealed txns so replays can't double-count. */
class RollupSpec extends SparkSpec {

  test("sumCountSink merges batches into a keyed snapshot, exactly once") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("rollup").toString
    val ckpt = java.nio.file.Files.createTempDirectory("rollup-ck").toString
    val input = MemoryStream[(String, Long)](spark)
    def start() = Rollup.sumCountSink(
      input.toDF().toDF("day", "v"),
      keyCols = Seq("day"), sumCols = Seq("v"),
      base, "daily", streamId = "r1", checkpointDir = ckpt).start()

    def snapshot(): Map[String, (Long, Long)] =
      ManifestTable.read(spark, base, "daily")
        .as[(String, Long, Long)].collect()
        .map { case (d, n, s) => d -> (n, s) }.toMap

    val q1 = start()
    try {
      input.addData(("mon", 10L), ("mon", 5L), ("tue", 7L))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(snapshot() == Map("mon" -> ((2L, 15L)), "tue" -> ((1L, 7L))))

    // Restart from the checkpoint; the next batch MERGES (mon grows,
    // wed appears, tue untouched).
    val q2 = start()
    try {
      input.addData(("mon", 1L), ("wed", 100L))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(snapshot() == Map(
      "mon" -> ((3L, 16L)), "tue" -> ((1L, 7L)), "wed" -> ((1L, 100L))))

    // A crash-replay of batch 0's txn is sealed — counters cannot
    // double-merge.
    val replay = Seq(("mon", 99L, 999L)).toDF("day", "n_rows", "sum_v")
    assert(ManifestTable.commitMulti(spark, base, "r1-0",
      snapshots = Map("daily" -> replay)).isEmpty)
    assert(snapshot() == Map(
      "mon" -> ((3L, 16L)), "tue" -> ((1L, 7L)), "wed" -> ((1L, 100L))))

    // Time travel replays the rollup's evolution: version 1 = batch 0.
    val v1 = ManifestTable.read(spark, base, "daily", asOfVersion = Some(1L))
      .as[(String, Long, Long)].collect()
      .map { case (d, n, s) => d -> (n, s) }.toMap
    assert(v1 == Map("mon" -> ((2L, 15L)), "tue" -> ((1L, 7L))))
  }
}
