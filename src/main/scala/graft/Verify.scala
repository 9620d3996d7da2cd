package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Gate-output type lint: the driver's hasher is only known-stable
    * on long/int/double/float/string/binary/boolean/date/timestamp
    * (the envelope the 378 green r14 gates define). DECIMAL is the
    * proven splitter (pyarrow hands back decimal.Decimal, DuckDB an
    * int — q301/q344/q351, r14); intervals/structs/maps are untested
    * and banned pre-emptively. Returns the offending column paths,
    * empty = clean. Arrays are traversed (element type must be safe). */
  def outputTypeLint(schema: StructType): Seq[String] = {
    def bad(path: String, dt: DataType): Seq[String] = dt match {
      case _: DecimalType => Seq(s"$path: ${dt.simpleString}")
      case _: CalendarIntervalType => Seq(s"$path: ${dt.simpleString}")
      case _: YearMonthIntervalType | _: DayTimeIntervalType =>
        Seq(s"$path: ${dt.simpleString}")
      case s: StructType =>
        s"$path: struct" +: s.fields.toSeq.flatMap(f =>
          bad(s"$path.${f.name}", f.dataType))
      case m: MapType => Seq(s"$path: ${m.simpleString}")
      case a: ArrayType => bad(s"$path[]", a.elementType)
      case _ => Nil
    }
    schema.fields.toSeq.flatMap(f => bad(f.name, f.dataType))
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.Verify <sfDir> <outDir> [onlyPrefix...]")
      sys.exit(2)
    }
    val Array(sfDir, outDir) = args.take(2)
    // Builder-side iteration aid: extra args restrict the run to
    // queries whose name starts with any prefix. The driver always
    // passes exactly two args — full run, unchanged behavior.
    val only = args.drop(2)
    def selected(name: String): Boolean =
      only.isEmpty || only.exists(name.startsWith)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name)) {
        try {
          val df = fn(spark, sfDir)
          // Refuse to dump a gate whose output type would split the
          // driver's hasher — a loud red beats a silent hash miss.
          val hits = outputTypeLint(df.schema)
          if (hits.nonEmpty) throw new IllegalStateException(
            s"LINT unsafe gate output type(s): ${hits.mkString("; ")}")
          df.coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
