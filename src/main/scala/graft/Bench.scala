package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Absorb one-time session costs (executor init, codegen infra,
    // parquet reader init) so per-query timings measure the queries.
    spark.range(1000000).selectExpr("sum(id)").collect()
    Graft.table(spark, sfDir, "lineitem").count()
    // Five timed runs per query, report the MEDIAN with the MIN as a
    // first-class sibling: r4→r5 moved per-query timings up to 6× on
    // identical code — single-run and min-of-2 numbers are host noise,
    // not signal — and r9→r10 showed a uniform ~1.26× median drift
    // across UNTOUCHED queries (a noise window spanning the whole
    // run), so cross-round comparisons should anchor on total_min,
    // which a slow window cannot inflate. The repetitions are
    // INTERLEAVED round-robin (suite pass 1, then pass 2, …) rather
    // than run back-to-back per query: this VM sees multi-second
    // host-steal bursts, and consecutive runs put all samples of one
    // unlucky query inside the same burst (observed: a different query
    // 10-30× slow each bench invocation, unreproducible alone). Spread
    // out, a burst costs several queries one sample each — which the
    // median then discards.
    val reps = 5
    val names = SparkEntry.queries.keys.toSeq.sorted
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to reps; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      val t = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      samples(name) = t :: samples.getOrElse(name, Nil)
      // The dedup-family queries localCheckpoint their reused stages;
      // those storage blocks outlive the query, and across ~300
      // executions in one 8 GB JVM they pile into old-gen. Freeing
      // them after each query keeps the heap flat; the result is
      // already counted, so nothing downstream reads the blocks.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      // The ACID gates (q139/q140) mint scratch table dirs per builder
      // invocation; the count above fully consumed them, so reclaim
      // the space now instead of piling 6+ table copies into /tmp for
      // the JVM lifetime.
      SparkEntry.reapScratch()
    }
    val results = samples.map { case (name, times) =>
      val stat = if (times.contains(-1.0)) (-1.0, -1.0)
        else (times.sorted.apply(times.size / 2), times.min)
      name -> stat
    }.toMap

    // ── Skew scenario: do the skew tools pay for themselves? ──
    // The q141/q52 shapes run both PLAIN and SALTED on a hot-key
    // table (one key owns 90% of the rows), timed identically
    // (3 reps, median). The JOIN pair uses a generated 10M-row input
    // (codegen'd range, no scan: a parquet/checkpoint read equal in
    // both arms would mask the hot task — the measurement must be
    // join-dominated) with the broadcast fallback and AQE's own skew
    // splitter disabled, isolating OUR mitigation: the broadcast-
    // ineligible-dimension case salting exists for. The AGG pair runs
    // the q52 count/sum shape on the skewed lineitem under default
    // confs — map-side partial aggregation is the built-in mitigation
    // there, and the numbers should SHOW it (an honest wash).
    import org.apache.spark.sql.functions._
    val hot = spark.range(10000000L).select(
      when(col("id") % 10 < 9, lit(1L))
        .otherwise(pmod(col("id"), lit(1000L)) + lit(2L)).as("k"),
      col("id").as("v"))
    val dim = spark.range(1002)
      .select(col("id").as("k"), (col("id") % 25).as("g"))
      .localCheckpoint(true)
    val hotLi = Graft.table(spark, sfDir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_quantity"))
      .withColumn("l_suppkey",
        when(col("l_orderkey") % 2 === 0, lit(1L)).otherwise(col("l_suppkey")))
      .localCheckpoint(true)
    def noBroadcast[T](body: => T): T = {
      val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
      val sj = spark.conf.get("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      try body finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", sj)
      }
    }
    val skewScenarios: Seq[(String, () => Long)] = Seq(
      "skew_join_plain" -> (() => noBroadcast {
        hot.join(dim, Seq("k"))
          .groupBy(col("g")).agg(sum(col("v"))).count()
      }),
      "skew_join_salted" -> (() => noBroadcast {
        graft.operators.Skew.saltedJoin(hot, dim, "k", salts = 8)
          .groupBy(col("g")).agg(sum(col("v"))).count()
      }),
      "skew_agg_plain" -> (() =>
        hotLi.groupBy(col("l_suppkey"))
          .agg(count(lit(1)), sum(col("l_quantity").cast("long"))).count()),
      "skew_agg_salted" -> (() =>
        graft.operators.Skew.saltedAggregate(hotLi, Seq("l_suppkey"),
          salts = 32,
          partials = Seq("n_part" -> count(lit(1)),
            "q_part" -> sum(col("l_quantity").cast("long"))),
          finals = Seq(sum(col("n_part")).as("n"),
            sum(col("q_part")).as("q"))).count()))
    val skewSamples = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to 3; (name, run) <- skewScenarios) {
      val t0 = System.nanoTime()
      val ok = try { run(); true } catch { case _: Throwable => false }
      val t = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      skewSamples(name) = t :: skewSamples.getOrElse(name, Nil)
    }
    val skewJson = skewSamples.toSeq.sortBy(_._1).map { case (k, ts) =>
      val med = if (ts.contains(-1.0)) -1.0 else ts.sorted.apply(ts.size / 2)
      s"\"" + k + "\":" + med
    }.mkString("{", ",", "}")
    val qs = results.map { case (k, (med, _)) => s"\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val qsMin = results.map { case (k, (_, mn)) => s"\"" + k + "\":" + mn }
      .mkString("{", ",", "}")
    // A crashed query reports -1.0 per-query; it must NOT shrink the
    // total (a broken query reading as a speedup). Total sums successes
    // only and failures are listed explicitly.
    val failed = results.collect { case (k, (v, _)) if v == -1.0 => k }.toSeq.sorted
    val ok = results.values.map(_._1).filter(_ >= 0.0)
    val total = ok.sum
    val totalMin = results.values.map(_._2).filter(_ >= 0.0).sum
    // mean/query lets totals compare fairly across rounds whose query
    // counts differ (the suite nearly doubled during round 2).
    val mean = if (ok.nonEmpty) total / ok.size else 0.0
    val failJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Session-noise triage (r15→r16): whole-suite per-query numbers
    // confound the query with 400+ prior queries' session state —
    // r15's top "regressions" (q380 4.3→10.3 s etc.) reproduced at
    // ~r14 levels in fresh sessions (graft.BenchIsolated). Embed the
    // latest isolated numbers so BENCH_FULL readers see both views;
    // regenerate with `runMain graft.BenchIsolated` after any drift.
    // Embed only if the payload is one well-formed JSON object — a
    // truncated or non-JSON BENCH_ISOLATED.json spliced verbatim
    // would make the whole BENCH_FULL line unparseable downstream.
    def oneJsonObject(s: String): Boolean = {
      if (!s.startsWith("{") || !s.endsWith("}")) return false
      var depth = 0; var inStr = false; var esc = false; var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (inStr) {
          if (esc) esc = false
          else if (c == '\\') esc = true
          else if (c == '"') inStr = false
        } else c match {
          case '"' => inStr = true
          case '{' => depth += 1
          case '}' =>
            depth -= 1
            if (depth == 0 && i != s.length - 1) return false
            if (depth < 0) return false
          case _ => ()
        }
        i += 1
      }
      depth == 0 && !inStr
    }
    val isolated = {
      val raw =
        try new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get("BENCH_ISOLATED.json")),
          java.nio.charset.StandardCharsets.UTF_8).trim
        catch { case _: Throwable => "null" }
      if (raw == "null" || oneJsonObject(raw)) raw else "null"
    }
    val full = s"""{"metric":"total","value":$total,"unit":"sec","stat":"median_of_$reps","total_min":$totalMin,"queries":$qs,"queries_min":$qsMin,"n_queries":${ok.size},"mean_sec_per_query":$mean,"n_failed":${failed.size},"failed":$failJson,"skew":$skewJson,"isolated":$isolated,"sf":"$sfDir"}"""
    // The full per-query JSON (75 queries) outgrows the driver's stdout
    // tail capture, which truncates long lines mid-way (r1 and r2 both
    // landed parsed:null). So: full detail goes to a FILE, stdout gets
    // the full line first (best-effort) and a short, tail-survivable
    // summary line LAST. Timings stay recoverable from BENCH_FULL.json.
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_FULL.json"),
      full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(full)
    println(s"""{"metric":"total","value":$total,"unit":"sec","stat":"median_of_$reps","total_min":$totalMin,"n_queries":${ok.size},"mean_sec_per_query":$mean,"n_failed":${failed.size},"sf":"$sfDir","full_json_file":"BENCH_FULL.json"}""")
    spark.stop()
  }
}
