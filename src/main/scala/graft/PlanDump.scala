package graft

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for named gate queries to files —
  * the plan evidence for optimization rounds (plans/rNN/<q>_before.txt
  * / _after.txt). Usage:
  * `runMain graft.PlanDump <outDir> <suffix> qNNN [qNNN...]`
  * writes `<outDir>/<query>_<suffix>.txt` for every gate whose name
  * starts with one of the given prefixes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDump <outDir> <suffix> qPrefix [qPrefix...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val prefixes = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(outDir)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
    require(names.nonEmpty, s"no queries match ${prefixes.mkString(",")}")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote ${outDir.resolve(s"${name}_$suffix.txt")}")
      SparkEntry.reapScratch()
    }
    spark.stop()
  }
}
