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

  test("quantileSink: streamed bucket merge == batch sketch, bit-exact") {
    import graft.operators.Sketches
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("qmv").toString
    val ckpt = java.nio.file.Files.createTempDirectory("qmv-ck").toString
    val input = MemoryStream[(String, Long)](spark)
    val q = Rollup.quantileSink(
      input.toDF().toDF("source", "n_tokens"),
      keyCols = Seq("source"), valueCol = "n_tokens",
      base, "lens", streamId = "q1", checkpointDir = ckpt).start()
    val b1 = (1L to 500L).map(v => ("web", v)) ++
      (1L to 80L).map(v => ("books", v * 100L))
    val b2 = (400L to 900L).map(v => ("web", v))
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val snapshot = ManifestTable.read(spark, base, "lens")
    val streamedState = snapshot.as[(String, Int, Long)].collect().sorted.toSeq
    val batchState = Sketches.lhBuckets(
        (b1 ++ b2).toDF("source", "n_tokens"), col("n_tokens"), Seq("source"))
      .as[(String, Int, Long)].collect().sorted.toSeq
    assert(streamedState == batchState) // bucket sum-merge ≡ one-pass state
    // Estimates off the maintained state are sane: web true p50 over
    // 1..500 ∪ 400..900 (1001 values) is ~450; sketch is ≤12.5% under.
    val est = Sketches.lhQuantiles(snapshot, Seq("source"), Seq(0.5))
      .as[(String, Double, Long, Long)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(est("web")._1 == 1001L)
    assert(est("web")._2 > 350L && est("web")._2 <= 450L)
    assert(est("books")._1 == 80L)
  }

  test("hllDistinctSink: streamed register merge == batch sketch, bit-exact") {
    import graft.operators.Sketches
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("hllmv").toString
    val ckpt = java.nio.file.Files.createTempDirectory("hllmv-ck").toString
    val input = MemoryStream[(String, Long)](spark)
    val q = Rollup.hllDistinctSink(
      input.toDF().toDF("day", "user_id"),
      keyCols = Seq("day"), distinctCol = "user_id",
      base, "users", streamId = "h1", checkpointDir = ckpt).start()
    val b1 = (1L to 400L).map(u => ("mon", u)) ++ (1L to 50L).map(u => ("tue", u))
    val b2 = (200L to 600L).map(u => ("mon", u)) // overlaps 200-400
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = Sketches.hllEstimate(
        ManifestTable.read(spark, base, "users"), Seq("day"))
      .select(col("day"), col("estimate"))
      .as[(String, Double)].collect().toMap
    val batch = Sketches.hllDistinct(
        (b1 ++ b2).toDF("day", "user_id"), col("user_id").cast("string"),
        Seq("day"))
      .select(col("day"), col("estimate"))
      .as[(String, Double)].collect().toMap
    assert(streamed == batch) // register max-merge ≡ one-pass sketch
    // And the estimates are in a sane band around the true 600 / 50.
    assert(streamed("mon") > 350 && streamed("mon") < 900)
    assert(streamed("tue") > 25 && streamed("tue") < 90)
  }
}
