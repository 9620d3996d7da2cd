package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static join — live telemetry enriched against a static
  * dimension table (device registry). The static side re-resolves per
  * micro-batch and needs no watermark; Spark broadcasts it when small
  * — the streaming twin of J1's broadcast state lookup. */
class StreamStaticJoinSpec extends SparkSpec {

  test("streaming events enrich against a static dimension, inner semantics") {
    import spark.implicits._
    val registry = Seq(("d1", "kitchen"), ("d2", "hall"))
      .toDF("dev", "room")
    val input = MemoryStream[(String, Int)](spark)
    val joined = input.toDS().toDF("dev", "battery")
      .join(registry, Seq("dev"))
      .select(col("dev"), col("room"), col("battery"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      input.addData(("d1", 80), ("d3", 55)) // d3 not in the registry
      q.processAllAvailable()
      val got = spark.table("ssjoin").as[(String, String, Int)]
        .collect().sorted.toSeq
      assert(got == Seq(("d1", "kitchen", 80)))

      input.addData(("d2", 41))
      q.processAllAvailable()
      assert(spark.table("ssjoin").count() == 2)
    } finally q.stop()
  }
}
