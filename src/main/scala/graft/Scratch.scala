package graft

import org.apache.spark.sql.functions._

/** Throwaway perf-investigation main (not part of the surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session("scratch")
    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"TIME $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    time("q15") { SparkEntry.queries("q15_region_revenue")(spark, dir).count() }
    time("q05") { SparkEntry.queries("q05_edge_detect")(spark, dir).count() }
    time("q06") { SparkEntry.queries("q06_sessionize")(spark, dir).count() }
    time("q28") { SparkEntry.queries("q28_sessions_batch")(spark, dir).count() }
    SparkEntry.queries("q15_region_revenue")(spark, dir).explain("formatted")
    spark.stop()
  }
}
