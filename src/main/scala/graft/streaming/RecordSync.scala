package graft.streaming

import graft.sources.Schemas.CleaningRecord
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** T5 — incremental record ingest (pipeline.py:673-752): fetch recent
  * records, keep those newer than the per-device watermark, append
  * oldest-first, advance the watermark.
  *
  * In Spark the watermark + dedup + exactly-once bookkeeping collapse
  * into `withWatermark` + `dropDuplicatesWithinWatermark` + the
  * checkpoint — the reference's state file (state_manager.py:76-87)
  * and its advance-on-failure data-loss bug disappear.
  */
object RecordSync {

  /** Streaming dedup: one row per (device, startTime) within the
    * watermark horizon; late duplicates beyond `lateness` are dropped
    * by the watermark itself. */
  def dedupedStream(
      records: Dataset[CleaningRecord],
      lateness: String = "1 hour"): Dataset[CleaningRecord] =
    records
      .withWatermark("startTime", lateness)
      .dropDuplicatesWithinWatermark("deviceName", "startTime")

  /** Wire the deduped stream to an append parquet sink with a
    * checkpoint — the K1/K2 sink of SURVEY.md §2.1. */
  def appendSink(
      deduped: Dataset[CleaningRecord],
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[CleaningRecord] =
    deduped.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)

  /** T5 cold-start rule (pipeline.py:721-723): with no watermark yet,
    * ingest only the newest record per device. Batch-mode helper for
    * the first sync. */
  def coldStart(records: DataFrame, spark: SparkSession): DataFrame =
    graft.operators.Incremental.newestPerKey(records, "deviceName", "startTime",
      "startTime")
}
