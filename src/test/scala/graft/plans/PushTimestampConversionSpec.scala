package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PushTimestampConversionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("watermark filter on converted ts pushes to the parquet scan") {
    val df = graft.Graft.table(spark, dir, "events")
      .filter(col("ts") > to_timestamp(lit("2024-01-15 00:00:00")))
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,"),
      s"filter not pushed:\n$p")
  }

  test("rewritten filter returns exactly the same rows as the unrewritten one") {
    // Pin the read confs Graft.table would set, so the raw read below
    // is deterministic regardless of suite ordering.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val base = spark.read.parquet(s"$dir/events.parquet")
    // Unconverted comparison path, in the fixture's NATIVE ts
    // representation: raw long nanos for legacy TIMESTAMP(NANOS)
    // fixtures (where the rule rewrites the converted filter back to
    // longs), plain timestamp[us] for regenerated ones (rule no-ops).
    val wmUs = java.sql.Timestamp.valueOf("2024-01-15 00:00:00").getTime * 1000
    val expected = base.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // > wm in micros ≡ > wm+999 in nanos (sub-micro tail excluded)
        base.filter(col("ts") > lit(wmUs * 1000 + 999)).count()
      case _ =>
        base.filter(col("ts") > to_timestamp(lit("2024-01-15 00:00:00"))).count()
    }
    val got = graft.Graft.table(spark, dir, "events")
      .filter(col("ts") > to_timestamp(lit("2024-01-15 00:00:00"))).count()
    assert(got == expected && got > 0)
  }

  test("boundary: rows exactly at the watermark are excluded by >") {
    import spark.implicits._
    val t = graft.Graft.table(spark, dir, "events")
    val wm = rows(t.select(min(col("ts")))).head.getTimestamp(0)
    val strictly = t.filter(col("ts") > lit(wm)).count()
    val inclusive = t.filter(col("ts") >= lit(wm)).count()
    assert(inclusive == strictly + 1)
  }
}
