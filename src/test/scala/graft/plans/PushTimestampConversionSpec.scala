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
    val base = spark.read.parquet(s"$dir/events.parquet")
    // unconverted comparison path (no rule applies): filter on raw longs
    val wmUs = java.sql.Timestamp.valueOf("2024-01-15 00:00:00").getTime * 1000
    val expected = base.filter(col("ts") > lit(wmUs * 1000 + 999)).count()
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
