package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("joining two tables bucketed on the join key needs no shuffle exchange") {
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    Tables.writeBucketed(left, "bkt_left", Seq("k"), 4)
    Tables.writeBucketed(right, "bkt_right", Seq("k"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("bucketed aggregation on the bucket key avoids the exchange too") {
    val df = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    Tables.writeBucketed(df, "bkt_agg", Seq("k"), 4)
    try {
      val agg = spark.table("bkt_agg").groupBy("k").agg(sum("v"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed agg still shuffles:\n$plan")
      assert(agg.count() == 50)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_agg")
  }
}
