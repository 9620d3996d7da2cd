package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(col0: String) =
    to_timestamp(col(col0).cast("double"))

  test("intervalJoin: stream output equals the batch join, delay bound enforced") {
    val imps = Seq(("ad1", 100L), ("ad2", 200L), ("ad3", 300L))
    val clicks = Seq(
      ("ad1", 150L),  // within (100, 200] of ad1's impression: match
      ("ad1", 100L),  // NOT after the impression (strict >): no match
      ("ad2", 350L),  // 150s after ad2's impression, > 100s: no match
      ("ad9", 120L))  // unknown key: no match
    val batch = StreamJoin.intervalJoin(
      imps.toDF("ad", "i").select(col("ad"), ts("i").as("its")),
      clicks.toDF("ad", "c").select(col("ad"), ts("c").as("cts")),
      "ad", "its", "cts", maxDelay = "100 seconds")
      .select(col("ad"), col("its").cast("long"), col("cts").cast("long"))
      .as[(String, Long, Long)].collect().toSet
    assert(batch == Set(("ad1", 100L, 150L)))

    val li = MemoryStream[(String, Long)](spark)
    val rc = MemoryStream[(String, Long)](spark)
    val joined = StreamJoin.intervalJoin(
      li.toDF().toDF("ad", "i").select(col("ad"), ts("i").as("its")),
      rc.toDF().toDF("ad", "c").select(col("ad"), ts("c").as("cts")),
      "ad", "its", "cts", maxDelay = "100 seconds")
    val q = joined.writeStream.format("memory")
      .queryName("sj_out").outputMode("append").start()
    try {
      li.addData(imps: _*)
      rc.addData(clicks: _*)
      q.processAllAvailable()
      // Advance both watermarks far past every buffered row so the
      // inner join emits everything it ever will.
      li.addData(("adx", 10000L))
      rc.addData(("adx", 10000L))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sj_out")
      .select(col("ad"), col("its").cast("long"), col("cts").cast("long"))
      .as[(String, Long, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("intervalJoin: same-named timestamp columns stay side-qualified") {
    val out = StreamJoin.intervalJoin(
      Seq(("a", 100L)).toDF("k", "t0").select(col("k"), ts("t0").as("ts")),
      Seq(("a", 150L)).toDF("k", "t0").select(col("k"), ts("t0").as("ts")),
      "k", "ts", "ts", maxDelay = "100 seconds")
    assert(out.count() == 1L)
  }

  test("intervalJoin: a click can attribute to several impressions of its key") {
    val out = StreamJoin.intervalJoin(
      Seq(("a", 100L), ("a", 140L)).toDF("k", "i")
        .select(col("k"), ts("i").as("its")),
      Seq(("a", 150L)).toDF("k", "c")
        .select(col("k"), ts("c").as("cts")),
      "k", "its", "cts", maxDelay = "100 seconds")
      .select(col("its").cast("long"), col("cts").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(out == Set((100L, 150L), (140L, 150L)))
  }

  test("intervalJoinLeftOuter: unmatched impressions emit once, all-NULL right, stream == batch") {
    val imps = Seq(("ad1", 100L), ("ad2", 200L), ("ad3", 300L))
    val clicks = Seq(
      ("ad1", 150L),  // matches ad1's window (100, 200]
      ("ad2", 350L))  // 150s late for ad2's 100s window: no match
    def run(l: org.apache.spark.sql.DataFrame,
        r: org.apache.spark.sql.DataFrame) =
      StreamJoin.intervalJoinLeftOuter(l, r, "ad", "its", "cts",
        maxDelay = "100 seconds")
    val mk = (s: Seq[(String, Long)], c: String, a: String) =>
      s.toDF("ad", "t").select(col("ad"), ts("t").as(a))
    val batch = run(mk(imps, "i", "its"), mk(clicks, "c", "cts"))
      .select(col("ad"), col("its").cast("long"), col("cts").cast("long"))
      .as[(String, Long, Option[Long])].collect().toSet
    // Every impression survives; only ad1 carries a click.
    assert(batch == Set(("ad1", 100L, Some(150L)),
      ("ad2", 200L, None), ("ad3", 300L, None)))

    val li = MemoryStream[(String, Long)](spark)
    val rc = MemoryStream[(String, Long)](spark)
    val joined = run(
      li.toDF().toDF("ad", "i").select(col("ad"), ts("i").as("its")),
      rc.toDF().toDF("ad", "c").select(col("ad"), ts("c").as("cts")))
    val q = joined.writeStream.format("memory")
      .queryName("sjo_out").outputMode("append").start()
    try {
      li.addData(imps: _*)
      rc.addData(clicks: _*)
      q.processAllAvailable()
      // Unmatched lefts emit only once the watermark PROVES no right
      // can still arrive — push both watermarks far past every window.
      li.addData(("adx", 10000L))
      rc.addData(("adx", 10000L))
      q.processAllAvailable()
      rc.addData(("ady", 20000L))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sjo_out")
      .filter(col("ad") =!= "adx")
      .select(col("ad"), col("its").cast("long"), col("cts").cast("long"))
      .as[(String, Long, Option[Long])].collect().toSet
    assert(streamed == batch)
  }

  test("dropDuplicatesWithinWatermark collapses replayed rows across batches") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[(String, Timestamp)](spark)
    val dedup = input.toDS().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = dedup.writeStream.format("memory").queryName("ddwm")
      .outputMode("append").start()
    try {
      input.addData(("a", t("2024-01-01 10:00:00")),
        ("a", t("2024-01-01 10:01:00")),   // replay inside the watermark
        ("b", t("2024-01-01 10:00:30")))
      q.processAllAvailable()
      input.addData(("a", t("2024-01-01 10:02:00")))  // replay, next batch
      q.processAllAvailable()
      assert(spark.table("ddwm").select("id").as[String].collect().sorted
        .toSeq == Seq("a", "b"))
    } finally q.stop()
  }
}
