package graft.streaming

import graft.SparkSpec
import graft.operators.Profile
import graft.sources.ManifestTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming TV/BC/Hellinger pager must agree with the batch
  * operator on every micro-batch (shared histDistancesFromCells —
  * verified numerically), land verdicts exactly once across
  * restart/replay, and alarm only on drifted mixes. */
class HistDriftStreamSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch verdicts == batch trio, exactly-once across restart") {
    val base = java.nio.file.Files.createTempDirectory("hds").toString
    val ckpt = java.nio.file.Files.createTempDirectory("hdsck").toString
    val baselineRows = Seq(("g", 1L), ("g", 1L), ("g", 2L), ("g", 2L))
    val baseline = baselineRows.toDF("grp", "bin")
      .groupBy("grp", "bin").count().withColumnRenamed("count", "n")
    val input = MemoryStream[(String, Long)](spark)
    def start() = HistDriftStream.histSink(
      input.toDF().toDF("grp", "bin"), baseline, "grp", "bin",
      alarmHellingerMicro = 500000L, baseDir = base, table = "drift",
      streamId = "hd", checkpointDir = ckpt).start()
    // batch 0: same mix as baseline — distances 0, no alarm
    val q1 = start()
    try {
      input.addData(("g", 1L), ("g", 2L))
      q1.processAllAvailable()
    } finally q1.stop()
    // crash-replay of batch 0's txn id: sealed no-op
    assert(ManifestTable.commit(
      Seq(("g", 0L, 9L, 9L, 9L, 9L, true)).toDF("grp", "batch_id",
        "n_rows", "tv_micro", "bc_micro", "hellinger_micro", "alarm"),
      base, "drift", "hd-0") == 0L)
    // restart; batch 1: all mass in a NEW bin — disjoint, alarm
    val q2 = start()
    try {
      input.addData(("g", 9L), ("g", 9L), ("g", 9L))
      q2.processAllAvailable()
    } finally q2.stop()
    val got = ManifestTable.read(spark, base, "drift")
      .collect().map(r => r.getAs[Long]("batch_id") -> r).toMap
    assert(got.size == 2)
    assert(!got(0L).getAs[Boolean]("alarm"))
    assert(got(1L).getAs[Boolean]("alarm"))
    // fully disjoint mixes: TV = 1, BC = 0, Hellinger = 1
    assert(got(1L).getAs[Long]("tv_micro") == 1000000L)
    assert(got(1L).getAs[Long]("hellinger_micro") == 1000000L)
    // numeric parity with the BATCH operator on each micro-batch
    // (bin-identity width: value = bin, binWidthMilli = 1000)
    def batchTrio(rows: Seq[(String, Long)]): (Long, Long, Long) = {
      val df = (baselineRows.map { case (g, b) => (g, b.toDouble, true) }
        ++ rows.map { case (g, b) => (g, b.toDouble, false) })
        .toDF("grp", "v", "s")
      val r = Profile.histDistances(df, "grp", "v", "s", 1000L)
        .collect().head
      (r.getAs[Long]("tv_micro"), r.getAs[Long]("bc_micro"),
        r.getAs[Long]("hellinger_micro"))
    }
    def streamed(b: Long): (Long, Long, Long) =
      (got(b).getAs[Long]("tv_micro"), got(b).getAs[Long]("bc_micro"),
        got(b).getAs[Long]("hellinger_micro"))
    assert(streamed(0L) == batchTrio(Seq(("g", 1L), ("g", 2L))))
    assert(streamed(1L) ==
      batchTrio(Seq(("g", 9L), ("g", 9L), ("g", 9L))))
  }

  test("baseline-only group emits NULL distances, no alarm") {
    val base = java.nio.file.Files.createTempDirectory("hds2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("hds2ck").toString
    val baseline = Seq(("g", 1L, 2L), ("quiet", 1L, 2L))
      .toDF("grp", "bin", "n")
    val input = MemoryStream[(String, Long)](spark)
    val q = HistDriftStream.histSink(input.toDF().toDF("grp", "bin"),
      baseline, "grp", "bin", 500000L, base, "drift", "hd2", ckpt)
      .start()
    try {
      input.addData(("g", 1L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = ManifestTable.read(spark, base, "drift")
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(rows("quiet")
      .isNullAt(rows("quiet").fieldIndex("hellinger_micro")))
    assert(!rows("quiet").getAs[Boolean]("alarm"))
    assert(rows("g").getAs[Long]("n_rows") == 1L)
  }
}
