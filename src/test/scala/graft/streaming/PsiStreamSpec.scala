package graft.streaming

import graft.SparkSpec
import graft.operators.Profile
import graft.sources.ManifestTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** The streaming PSI pager must agree with the batch operator on
  * every micro-batch (shared psiFromCells — verified numerically, not
  * assumed), land verdicts exactly once across restart/replay, and
  * alarm only on drifted mixes. */
class PsiStreamSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch verdicts == batch psi, exactly-once across restart") {
    val base = java.nio.file.Files.createTempDirectory("psis").toString
    val ckpt = java.nio.file.Files.createTempDirectory("psisck").toString
    // Known-good baseline: group g, bins 1/2 balanced.
    val baselineRows = Seq(("g", 1L), ("g", 1L), ("g", 2L), ("g", 2L))
    val baseline = baselineRows.toDF("grp", "bin")
      .groupBy("grp", "bin").count().withColumnRenamed("count", "n")
    val input = MemoryStream[(String, Long)](spark)
    def start() = PsiStream.psiSink(
      input.toDF().toDF("grp", "bin"), baseline, "grp", "bin",
      alarmMicro = 400000L, baseDir = base, table = "drift",
      streamId = "psi", checkpointDir = ckpt).start()
    // batch 0: same mix as baseline — no alarm
    val q1 = start()
    try {
      input.addData(("g", 1L), ("g", 2L))
      q1.processAllAvailable()
    } finally q1.stop()
    // crash-replay of batch 0's txn id: sealed no-op
    assert(ManifestTable.commit(
      Seq(("g", 0L, 9L, 9L, true)).toDF("grp", "batch_id", "n_rows",
        "psi_micro", "alarm"), base, "drift", "psi-0") == 0L)
    // restart; batch 1: all mass in a NEW bin — alarm
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
    // numeric parity with the BATCH operator on each micro-batch
    def batchPsi(rows: Seq[(String, Long)]): Long = {
      val df = (baselineRows.map { case (g, b) => (g, b, true) } ++
        rows.map { case (g, b) => (g, b, false) }).toDF("grp", "bin", "s")
      Profile.psi(df, "grp", "bin", "s").collect().head
        .getAs[Long]("psi_micro")
    }
    assert(got(0L).getAs[Long]("psi_micro") ==
      batchPsi(Seq(("g", 1L), ("g", 2L))))
    assert(got(1L).getAs[Long]("psi_micro") ==
      batchPsi(Seq(("g", 9L), ("g", 9L), ("g", 9L))))
  }

  test("baseline-only group emits NULL psi (no data, not no drift)") {
    val base = java.nio.file.Files.createTempDirectory("psis2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("psis2ck").toString
    val baseline = Seq(("g", 1L, 2L), ("quiet", 1L, 2L))
      .toDF("grp", "bin", "n")
    val input = MemoryStream[(String, Long)](spark)
    val q = PsiStream.psiSink(input.toDF().toDF("grp", "bin"), baseline,
      "grp", "bin", 400000L, base, "drift", "psi2", ckpt).start()
    try {
      input.addData(("g", 1L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = ManifestTable.read(spark, base, "drift")
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(rows("quiet").isNullAt(rows("quiet").fieldIndex("psi_micro")))
    assert(!rows("quiet").getAs[Boolean]("alarm"))
    assert(rows("g").getAs[Long]("n_rows") == 1L)
  }
}
