package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Landing-zone readers (S1/S5/F6): the reference fetches one record
  * per network call and silently skips failures
  * (roborock_collector.py:464-467,516-518); the Spark equivalent is a
  * schema-enforced permissive read over the raw JSON drop zone where
  * malformed records are dropped (DROPMALFORMED) or quarantined to a
  * corrupt-record column for audit (PERMISSIVE).
  */
object Raw {

  /** Raw status-sample landing schema (pre-normalization). */
  val statusLandingSchema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("device_name", StringType),
    StructField("state", StringType),
    StructField("battery", IntegerType),
    StructField("fan_power", StringType),
    StructField("water_box_status", StringType),
    StructField("water_box_mode", StringType),
    StructField("mop_mode", StringType),
    StructField("error_code", IntegerType),
    StructField("clean_time", LongType),
    StructField("clean_area", DoubleType)))

  /** F6 — drop malformed lines (the reference's per-record try/skip). */
  def readStatusDropMalformed(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(statusLandingSchema)
      .option("mode", "DROPMALFORMED")
      .json(path)

  /** F6 variant — keep malformed lines in `_corrupt_record` so bad
    * telemetry is quarantined instead of silently lost (an audit
    * ability the reference lacks). */
  def readStatusQuarantine(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(statusLandingSchema.add(StructField("_corrupt_record", StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
}
