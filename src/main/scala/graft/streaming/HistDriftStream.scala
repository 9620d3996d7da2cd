package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming histogram-distance drift pager — [[PsiStream]]'s shape
  * with the TV / Bhattacharyya / Hellinger trio instead of PSI:
  * each micro-batch's bin mix is scored against a FROZEN baseline
  * histogram with exactly the batch operator's math — literally the
  * same code, [[graft.operators.Profile.histDistancesFromCells]],
  * so stream and batch verdicts cannot diverge — and one verdict
  * row per (group, batch) lands in a
  * [[graft.sources.ManifestTable]] under `<streamId>-<batchId>`
  * txns (crash replays are sealed no-ops). PSI explodes on bins one
  * side has never seen (hence its smoothing); Hellinger and TV are
  * BOUNDED metrics — a brand-new bin contributes calmly — which is
  * why a page on Hellinger is the robust default for long-tailed
  * drift.
  *
  * The baseline is pre-binned COUNTS (group, bin, n) from a
  * known-good period — the only scalable form: the stream never
  * rescans baseline rows; per batch it is one hash-agg plus a
  * bin-domain-sized full-outer join. Groups with baseline but no
  * batch rows emit NULL distances ("no data" ≠ "no drift"). */
object HistDriftStream {

  def histSink(
      input: DataFrame,
      baseline: DataFrame,
      groupCol: String,
      binCol: String,
      alarmHellingerMicro: Long,
      baseDir: String,
      table: String,
      streamId: String,
      checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] = {
    require(alarmHellingerMicro > 0, "alarmHellingerMicro must be positive")
    require(streamId.nonEmpty && !streamId.contains("\n"),
      s"bad streamId: $streamId")
    val base = graft.operators.Dedup.truncate(
      baseline.select(col(groupCol).as("__g"), col(binCol).as("__b"),
        col("n").cast("long").as("__ca")))
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          if (!batch.isEmpty) {
            val cur = batch.toDF()
              .filter(col(binCol).isNotNull)
              .select(col(groupCol).as("__g"), col(binCol).as("__b"))
              .groupBy(col("__g"), col("__b"))
              .agg(count(lit(1)).as("__cb"))
            val cells = base.join(cur, Seq("__g", "__b"), "full_outer")
              .select(col("__g"),
                coalesce(col("__ca"), lit(0L)).as("__ca"),
                coalesce(col("__cb"), lit(0L)).as("__cb"))
            val verdicts = graft.operators.Profile
              .histDistancesFromCells(cells)
              .select(col("__g").as(groupCol),
                lit(batchId).as("batch_id"),
                col("n_b").as("n_rows"), col("tv_micro"),
                col("bc_micro"), col("hellinger_micro"),
                (col("hellinger_micro").isNotNull &&
                  col("hellinger_micro") >= alarmHellingerMicro)
                  .as("alarm"))
            graft.sources.ManifestTable.commit(
              verdicts, baseDir, table, txnId = s"$streamId-$batchId")
          }
          ()
      }
  }
}
