package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    (1L, "image", "fake-png-bytes-aaaa".getBytes("UTF-8"), 4000L),
    (2L, "image", "fake-png-bytes-bbbb".getBytes("UTF-8"), 4000L),
    (3L, "video", "fake-mp4-bytes".getBytes("UTF-8"), 2500L))
    .toDF("media_id", "kind", "content", "durationMs")

  test("extractFeatures: dim-length deterministic vectors in [0,1), content dropped") {
    val out = Multimodal.extractFeatures(media, "media_id", "content", 8)
    assert(out.columns.toSeq == Seq("media_id", "features"))
    val got = rows(out).map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got.values.forall(f => f.length == 8 && f.forall(v => v >= 0.0 && v < 1.0)))
    // deterministic: same bytes ⇒ same features; different bytes ⇒ different
    val again = Multimodal.extractFeatures(media, "media_id", "content", 8)
    assert(rows(again).map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap == got)
    assert(got(1L) != got(2L))
  }

  test("extractFeatures respects small batch sizes (batched codec shape)") {
    val out = Multimodal.extractFeatures(media, "media_id", "content", 2, batchSize = 1)
    assert(out.count() == 3)
  }

  test("sampleFrames explodes one row per interval over the duration") {
    val out = Multimodal.sampleFrames(media, "media_id", "durationMs", 1000L)
    val byId = rows(out).groupBy(_.getLong(0))
    // 4000 ms at 1000 ms ⇒ frames 0..3; 2500 ms ⇒ frames 0..2
    assert(byId(1L).map(_.getAs[Long]("frame_ts_ms")).sorted == Seq(0L, 1000L, 2000L, 3000L))
    assert(byId(3L).map(_.getAs[Long]("frame_ts_ms")).sorted == Seq(0L, 1000L, 2000L))
  }

  test("sampleFrames emits no rows for zero or null duration (regression: spurious frame 0)") {
    val edgeDur = Seq(
      (9L, "video", "x".getBytes("UTF-8"), Some(0L)),
      (10L, "video", "y".getBytes("UTF-8"), Option.empty[Long]))
      .toDF("media_id", "kind", "content", "durationMs")
    assert(Multimodal.sampleFrames(edgeDur, "media_id", "durationMs", 1000L).count() == 0)
  }

  test("resize produces (w*h)-sized stub content with updated metadata") {
    val out = Multimodal.resize(media, 64, 64)
    val r = rows(out.filter(col("media_id") === 1L)).head
    assert(r.getAs[Array[Byte]]("content") != null)
    assert(r.getAs[Long]("sizeBytes") == (64 * 64) / 64)
    assert(r.getAs[Int]("width") == 64 && r.getAs[Int]("height") == 64)
  }

  test("repartitionForMedia sizes partitions by bytes") {
    val out = Multimodal.repartitionForMedia(media, targetBytesPerPartition = 20L)
    assert(out.rdd.getNumPartitions >= 2)
    assert(out.count() == 3)
  }
}
