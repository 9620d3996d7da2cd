package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Spatial}

/** Scratch profiler for q358 (DBSCAN): per-stage wall clock. */
object ProbeQ358 {
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
    Graft.table(spark, sfDir, "lineitem").count()
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[probe] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    for (rep <- 1 to 3) {
      def coord(axis: String) = SparkEntry.hashMod(axis, col("event_id"), 1000000L)
      val pts = Graft.table(spark, sfDir, "events")
        .select(col("event_id").as("id"),
          coord("x").as("x"), coord("y").as("y"))
      time(s"rep$rep proximity_join") {
        Spatial.proximityJoin(pts, "id", "x", "y", 2500L, 0).count()
      }
      val pairs = Dedup.truncate(
        Spatial.proximityJoin(pts, "id", "x", "y", 2500L, 0)
          .select(col("a"), col("b")))
      time(s"rep$rep deg_census") {
        pairs.select(col("a").as("__id"))
          .union(pairs.select(col("b").as("__id")))
          .groupBy(col("__id")).agg(count(lit(1))).count()
      }
      time(s"rep$rep full_dbscan") {
        Spatial.dbscan(pts, "id", "x", "y", eps = 2500, minPts = 3).count()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
