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

  /** Rounding-boundary lint (the r15 q402 lesson, plan side; the
    * oracle-side twin lives in scripts/check.py): a
    * min/max(struct(...)) whose FIRST field — the argmin ordering
    * key — rounds a MULTI-OP float chain elects a different row on a
    * 1-ulp FMA/libm difference between engines whenever candidates
    * sit on the .5 boundary (real label censuses DO land there:
    * q402's sf0.01 candidates had two cells exactly at x.5). A
    * SINGLE float op under round() is exempt — one IEEE-754
    * divide/multiply is correctly rounded on any compliant engine
    * (mmrRerank's round(long/1000.0) idiom); only compositions leave
    * room for contraction/reassociation drift. Keys are traced
    * through Aliases (bounded depth) so a round() computed in a
    * prior select is still seen. Returns human-readable hits,
    * empty = clean. */
  def fragileArgminLint(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, Min}
    val plan = df.queryExecution.analyzed
    val defs: Map[Long, Expression] = plan.collect { case node =>
      node.expressions.flatMap(_.collect {
        case a: Alias => a.exprId.id -> a.child })
    }.flatten.toMap
    def expand(e: Expression, depth: Int): Expression =
      if (depth <= 0) e
      else e.transformUp {
        case ar: AttributeReference if defs.contains(ar.exprId.id) =>
          expand(defs(ar.exprId.id), depth - 1)
      }
    def isFloat(dt: DataType): Boolean =
      dt == DoubleType || dt == FloatType
    def floatOps(e: Expression): Int = {
      var n = 0
      e.foreach {
        case b: BinaryArithmetic if isFloat(b.dataType) => n += 1
        case _: Sqrt | _: Pow | _: Exp | _: Log | _: Log10 |
            _: Log2 | _: Logarithm => n += 1
        case _ => ()
      }
      n
    }
    val hits = scala.collection.mutable.ArrayBuffer[String]()
    def check(which: String, child: Expression): Unit =
      expand(child, 4) match {
        case cns: CreateNamedStruct if cns.valExprs.nonEmpty =>
          expand(cns.valExprs.head, 4).foreach {
            case r: RoundBase
                if isFloat(r.children.head.dataType) &&
                  floatOps(r.children.head) >= 2 =>
              hits += s"$which(struct(...)) argmin key rounds a " +
                "multi-op float chain — a 1-ulp engine difference " +
                "elects a different row (r15 q402); compare exactly " +
                "in integers and derive the reported rounding from " +
                "the elected winner"
            case _ => ()
          }
        case _ => ()
      }
    plan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case m: Min if m.child.dataType.isInstanceOf[StructType] =>
          check("min", m.child)
        case m: Max if m.child.dataType.isInstanceOf[StructType] =>
          check("max", m.child)
        case _ => ()
      })
    }
    hits.toSeq.distinct
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
          val fragile = fragileArgminLint(df)
          if (fragile.nonEmpty) throw new IllegalStateException(
            s"LINT ${fragile.mkString("; ")}")
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
