package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph, Linkage}

/** Scratch profiler for the adamicAdar wedge-census family (q221 /
  * q227 / q275): per-stage wall clock. Not a gate. */
object ProbeQ221 {
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
      val li = Graft.table(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      time(s"rep$rep e_distinct") {
        li.select(col("l_orderkey").as("__s"), col("l_partkey").as("__z"))
          .distinct().count()
      }
      val e = Dedup.truncate(
        li.select(col("l_orderkey").as("__s"), col("l_partkey").as("__z"))
          .distinct())
      time(s"rep$rep zterm") {
        e.groupBy(col("__z")).agg(count(lit(1)).as("__d"))
          .filter(col("__d") >= 2L && col("__d") <= 40L).count()
      }
      val zterm = e.groupBy(col("__z")).agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= 2L && col("__d") <= 40L)
        .select(col("__z"), round(lit(1e12) /
          round(lit(1e6) * log(col("__d").cast("double"))))
          .cast("long").as("__aa"))
      val l = e.join(zterm, Seq("__z"))
      time(s"rep$rep wedge_join_raw") {
        l.as("wa").join(l.as("wb"),
          col("wa.__z") === col("wb.__z") && col("wa.__s") < col("wb.__s"))
          .count()
      }
      time(s"rep$rep wedge_plus_agg") {
        l.as("wa").join(l.as("wb"),
          col("wa.__z") === col("wb.__z") && col("wa.__s") < col("wb.__s"))
          .select(col("wa.__s").as("a"), col("wb.__s").as("b"),
            col("wa.__aa").as("__aa"))
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("common_neighbors"),
            sum(col("__aa")).as("aa_micro"))
          .filter(col("common_neighbors") >= 2L)
          .count()
      }
      time(s"rep$rep full_adamic") {
        Graph.adamicAdar(li, "l_orderkey", "l_partkey",
          maxDegree = 40, minCommon = 2).count()
      }
      time(s"rep$rep full_reciprocal") {
        Linkage.reciprocalBest(
          Graph.adamicAdar(li, "l_orderkey", "l_partkey",
            maxDegree = 40, minCommon = 2), "a", "b", "aa_micro").count()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
