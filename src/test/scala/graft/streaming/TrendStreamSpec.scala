package graft.streaming

import graft.SparkSpec
import graft.operators.TimeSeries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ≡ batch parity for the rolling Mann–Kendall trend
  * pager: batch q384 is hash-gated against DuckDB via the pair
  * delta-prefix construction; this suite replays the SAME sf0.001
  * events through the stateful fold (flatMapGroupsWithState, window
  * ring + incrementally maintained S per key), parquet sink +
  * checkpoint, with a restart seam after the first chunk. Integer S
  * plus ONE mirrored z divide ⇒ exact set equality. */
class TrendStreamSpec extends SparkSpec {

  private val W = 8
  private val Threshold = 1959964L

  test("fold: incremental S equals the pair-definition recompute") {
    // Deterministic ramp+noise series: hash-mixed so windows hold
    // real up/down/tie mixtures.
    val xs = (0 until 40).map(i =>
      (i * 37 + (i * i * 13) % 29 - (if (i % 3 == 0) i * 40 else 0)).toLong)
    val samples = xs.zipWithIndex.map { case (v, i) =>
      TrendStream.Sample(1L, 1000L + i, i.toLong, v)
    }
    val (pts, _) = TrendStream.step(
      TrendStream.St(Nil, 0L), samples, W, Threshold)
    pts.zipWithIndex.foreach { case (p, j) =>
      val win = xs.slice(math.max(0, j - W + 1), j + 1)
      val sDef = (for {
        a <- win.indices; b <- a + 1 until win.size
      } yield java.lang.Long.signum(win(b) - win(a)).toLong).sum
      assert(p.s == sDef, s"sample $j: fold S ${p.s} != definition $sDef")
      assert(p.n_win == win.size)
    }
  }

  test("streaming fold over micro-batches == batch rolling MK, across restart") {
    implicit val s = spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Graft.table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))

    val batchOut = TimeSeries.rollingMannKendall(ev, "user_id", "ts",
        "event_id", "value", W, Threshold)
      .select(col("user_id"), col("ts_ms"), col("event_id"),
        col("n_win"), col("s"), col("z_micro"), col("alarm"))
      .collect().map(_.toSeq).toSet
    assert(batchOut.exists(_(6) == true),
      "fixture never alarms at this threshold — parity would be weak")

    val all = ev
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .collect().sortBy(r => (r._2.getTime, r._3))
    val cuts = Seq(1, 2).map(i => all(all.length * i / 3)._2.getTime)
    val chunks = Seq(
      all.filter(_._2.getTime < cuts(0)),
      all.filter(r => r._2.getTime >= cuts(0) && r._2.getTime < cuts(1)),
      all.filter(_._2.getTime >= cuts(1)))
    assert(chunks.forall(_.nonEmpty), "need three real micro-batches")

    val base = java.nio.file.Files.createTempDirectory("trend-parity")
    val ckpt = base.resolve("ckpt").toString
    val outDir = base.resolve("out").toString
    def startQuery(
        input: MemoryStream[(Long, java.sql.Timestamp, Long, Double)]) =
      TrendStream.points(
          input.toDF().toDF("user_id", "ts", "event_id", "value"),
          "user_id", "ts", "event_id", "value", W, Threshold)
        .writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()

    // Chunk 1, then STOP — the restart seam: the window ring + S
    // must survive via the state store.
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
      .select(col("k"), col("tsMs"), col("id"),
        col("n_win"), col("s"), col("z_micro"), col("alarm"))
      .collect().map(_.toSeq).toSet
    assert(streamOut == batchOut,
      s"trend stream/batch divergence: stream-only=" +
        s"${(streamOut -- batchOut).take(3)} " +
        s"batch-only=${(batchOut -- streamOut).take(3)}")
    assert(spark.read.parquet(outDir).count() == batchOut.size.toLong)
  }
}
