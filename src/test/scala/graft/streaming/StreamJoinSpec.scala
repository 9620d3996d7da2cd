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
}
