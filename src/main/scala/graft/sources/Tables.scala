package graft.sources

import graft.operators.Incremental
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** K1–K3 — parquet table sinks replacing the reference's Google-Sheets
  * tabs (sheets_client.py:54-169): idempotent creation, idempotent
  * keyed append, partitioned layout.
  *
  * Scale: tables partition by ingest date (and optionally device), so
  * time-bounded reads prune partitions; the idempotent append
  * anti-joins only on the key columns of the EXISTING sink projection
  * (column-pruned scan), not full rows.
  */
object Tables {

  def path(baseDir: String, table: String): String = s"$baseDir/$table"

  def exists(spark: SparkSession, baseDir: String, table: String): Boolean =
    new java.io.File(path(baseDir, table)).exists()

  /** K3 — idempotent table creation with an explicit schema (the
    * reference swallows "already exists", sheets_client.py:103-107). */
  def create(
      spark: SparkSession,
      baseDir: String,
      table: String,
      schema: StructType,
      partitionCols: Seq[String] = Nil): Unit = {
    if (!exists(spark, baseDir, table)) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      val w = empty.write.mode(SaveMode.Overwrite)
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(path(baseDir, table))
    }
  }

  def read(spark: SparkSession, baseDir: String, table: String): DataFrame =
    spark.read.parquet(path(baseDir, table))

  /** K1/K2 — idempotent append: drop batch rows whose key already
    * exists in the sink, then append. Makes every sync re-runnable —
    * the set-oriented fix for the reference's advance-state-even-on-
    * failure data loss (pipeline.py:562-568). */
  def appendDedup(
      batch: DataFrame,
      baseDir: String,
      table: String,
      keys: Seq[String],
      partitionCols: Seq[String] = Nil): Long = {
    val spark = batch.sparkSession
    val fresh =
      if (exists(spark, baseDir, table)) {
        val existing = read(spark, baseDir, table)
        if (existing.isEmpty) batch
        else Incremental.dedupAppend(batch, existing, keys)
      } else batch
    // persist ⇒ the anti-join runs once, shared by the count and the
    // write (otherwise the sink is scanned and joined twice per sync).
    // Only when WE built the plan — unpersisting a `fresh` that aliases
    // the caller's `batch` would silently evict their cache.
    val ownPlan = fresh ne batch
    if (ownPlan) fresh.persist()
    try {
      val n = fresh.count()
      if (n > 0) {
        val w = fresh.write.mode(SaveMode.Append)
        (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
          .parquet(path(baseDir, table))
      }
      n
    } finally if (ownPlan) fresh.unpersist()
  }

  /** Bucketed catalog table: pre-shuffles data into `nBuckets` by
    * `bucketCols` at write time so repeated joins/aggregations on that
    * key run WITHOUT an exchange (co-located). At 100 TB this is the
    * difference between shuffling the fact table per query and
    * shuffling it once at ingest. Requires a catalog table
    * (`saveAsTable`) — plain parquet paths don't retain bucket specs. */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCols: Seq[String],
      nBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)

  /** State-snapshot overwrite (one row per device) — K5. Written to a
    * temp location then swapped, so a failed write can't corrupt the
    * previous state. */
  def overwriteState(state: DataFrame, baseDir: String, table: String): Unit = {
    val target = new java.io.File(path(baseDir, table))
    val tmp = new java.io.File(path(baseDir, s"_tmp_$table"))
    if (tmp.exists()) delete(tmp)
    state.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.getPath)
    if (target.exists()) delete(target)
    if (!tmp.renameTo(target)) {
      throw new java.io.IOException(s"state swap failed for $table")
    }
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    f.delete()
  }
}
