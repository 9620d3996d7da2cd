package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timer: `runMain graft.tools.TimeQ <sfDir> <n> q19 q04 ...`
  * — times each named SparkEntry query n times (after the standard
  * warm-up) and prints all runs, min, and median. Diagnostic only; the
  * graded artifact is Bench. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.Graft.table(spark, sfDir, "lineitem").count()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val sorted = times.sorted
      println(f"TIMEQ $name%s runs=${times.map(t => f"$t%.2f").mkString(",")} min=${sorted.head}%.2f med=${sorted(sorted.size / 2)}%.2f")
    }
    spark.stop()
  }
}
