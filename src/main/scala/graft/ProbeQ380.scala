package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q380 at amplified scale: which stage of the
  * kernelized theilSen grows superlinearly. */
object ProbeQ380 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val li0 = Graft.table(spark, sfDir, "lineitem")
    li0.count()
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[probe] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    for (f <- Seq(1, 4)) {
      val li = (1 to f).map(i =>
        li0.select((col("l_orderkey") * f + i).as("l_orderkey"),
          col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"), col("l_extendedprice")))
        .reduce(_ unionByName _)
      val src = li.select(col("l_returnflag"),
        col("l_quantity"), col("l_extendedprice"),
        (col("l_orderkey") * lit(10L) + col("l_linenumber")).as("rid"))
      val filtered = src
        .filter(col("l_quantity").isNotNull &&
          col("l_extendedprice").isNotNull)
        .select(col("l_returnflag").as("__g"), col("rid").as("__id"),
          round(col("l_quantity").cast("double") * lit(1e6)).cast("long")
            .as("__x"),
          round(col("l_extendedprice").cast("double") * lit(1e6))
            .cast("long").as("__y"))
        .filter(col("__id").isNotNull)
      time(s"f$f agg_only") {
        filtered.groupBy(col("__g"))
          .agg(graft.functions.TopKAggregate.topKStructs(
            Seq(col("__id"), col("__x"), col("__y")), 512).as("__s"))
          .select(col("__g"), size(col("__s")).as("n")).count()
      }
      time(s"f$f agg_plus_kernel") {
        graft.operators.TimeSeries.theilSen(src, "l_returnflag",
          "l_quantity", "l_extendedprice", "rid", maxN = 512).count()
      }
    }
    spark.stop()
  }
}
