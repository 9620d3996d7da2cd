package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Scratch profiler: times q346's two halves (exact neighborhood
  * census vs HyperBall) separately so optimization targets the real
  * cost. Not a gate; not registered in SparkEntry. */
object ProbeQ346 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-job wall-clock attribution (UI is disabled in the bench).
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts =
          scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts(js.jobId) = (System.nanoTime(),
            Option(js.properties.getProperty("spark.job.description"))
              .getOrElse(""))
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          starts.remove(je.jobId).foreach { case (t0, d) =>
            println(f"[job] id=${je.jobId}%-4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $d")
          }
      })
    spark.range(1000000).selectExpr("sum(id)").collect()
    Graft.table(spark, sfDir, "lineitem").count()
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    def hashMod(tag: String, c: org.apache.spark.sql.Column, m: Long) =
      SparkEntry.hashMod(tag, c, m)
    for (rep <- 1 to 3) {
      val e = Graft.table(spark, sfDir, "events")
        .select(hashMod("nfs", col("event_id"), 2000L).as("src"),
          hashMod("nfd", col("event_id"), 2000L).as("dst"))
      time(s"rep$rep exact_census") {
        Graph.neighborhoodFunction(e, "src", "dst", maxR = 2).count()
      }
      time(s"rep$rep hyperball") {
        Graph.hyperBall(e, "src", "dst", maxR = 2).count()
      }
      time(s"rep$rep hyperball_aggonly") {
        Graph.hyperBall(e, "src", "dst", maxR = 2)
          .groupBy(col("r")).agg(sum(col("reach_est"))).count()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
