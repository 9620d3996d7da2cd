package graft

import org.apache.spark.sql.SparkSession

/** Isolated re-run bench — the regression-triage tool BENCH_FULL
  * lacks (VERDICT r15 #4): per-query numbers from the full 423-query
  * session confound the query with SESSION effects (old-gen pressure,
  * code-cache churn, accumulated broadcast/codegen state from 400+
  * prior queries). r14→r15 the common-set total drifted +15% with the
  * top movers' implementations untouched — indistinguishable, inside
  * one session, from a real plan regression.
  *
  * Method: each named query runs in its OWN fresh SparkSession
  * (stop → rebuild → re-warm with Bench's exact warmup so fixed costs
  * match), `reps` times, interleaved per rep like Bench (the
  * host-steal lesson); report min and median per query. JVM-level
  * state (heap shape, JIT) still persists across sessions — full
  * process isolation would need one sbt fork per query — but the
  * dominant suspected confounder (session-accumulated GC pressure) is
  * removed, which is the signal needed to call drift noise vs
  * regression: isolated ≈ r14 number → session noise; isolated ≈ r15
  * number → real and reproducible.
  *
  * Usage: `runMain graft.BenchIsolated [qPrefix...]` (defaults to the
  * r15 mover list). Writes BENCH_ISOLATED.json, prints one JSON line.
  */
object BenchIsolated {

  /** The 11 r14→r15 common-set movers (>1.5× and >0.3 s slower with
    * untouched implementations — VERDICT r15 Performance section). */
  val DefaultMovers: Seq[String] = Seq(
    "q380_theil_sen", "q378_yuen_test", "q377_cox_hazard",
    "q379_rater_reliability", "q125_bpe_pack", "q321_kmv_intersect",
    "q122_skipgram_counts", "q123_hashed_vectors",
    "q305_rater_accuracy", "q31_knn_ivf", "q319_phonetic_pairs",
    // r17 additions: the slowest gate (search-loop shape changed
    // this round), its build half, and the guard-engaged spatial
    // join — keep their isolated baselines fresh.
    "q425_hnsw_recall", "q424_hnsw_build", "q174_proximity_join",
    // r18 additions (VERDICT r17 #1): the two largest in-suite
    // regressions of r17, unadjudicated until isolated.
    "q383_nsw_recall", "q384_rolling_mk",
    // r18 optimization-round movers: keep isolated baselines fresh
    // for the kernel/bitset/driver-UF rewrites.
    "q346_neighborhood", "q350_mann_kendall", "q358_dbscan",
    "q361_hodges_lehmann", "q366_kendall_tau", "q376_item_knn_recs",
    // r19 optimization-round movers: driver folds (markov, iterative
    // graph family), groupLag/scaffold fusions, wedge lazy pins.
    "q359_markov_attribution", "q426_pettitt", "q435_spectral_entropy",
    "q354_runs_test", "q429_bartels_rank", "q412_dickey_fuller",
    "q177_hop_distance", "q182_hits", "q184_trustrank",
    "q198_label_spread", "q119_pagerank", "q147_domain_pagerank",
    "q167_kcore", "q221_adamic_adar", "q227_reciprocal_best",
    "q275_link_jaccard", "q446_corpus_refresh")

  private def freshSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_ISO_REPS", "3").toInt
    val prefixes = if (args.nonEmpty) args.toSeq else DefaultMovers
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
    require(names.nonEmpty, s"no queries match ${prefixes.mkString(",")}")
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to reps; name <- names) {
      SparkSession.getActiveSession.foreach(_.stop())
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val spark = freshSession(cpus)
      // Bench's exact warmup, so fixed costs match its numbers.
      spark.range(1000000).selectExpr("sum(id)").collect()
      Graft.table(spark, sfDir, "lineitem").count()
      val t0 = System.nanoTime()
      val ok = try {
        SparkEntry.queries(name)(spark, sfDir).count(); true
      } catch { case e: Throwable =>
        System.err.println(s"[iso] $name failed: ${e.getMessage}"); false
      }
      val t = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      samples(name) = t :: samples.getOrElse(name, Nil)
      SparkEntry.reapScratch()
      spark.stop()
    }
    def fmt(name: String): (String, String) = {
      val ts = samples(name)
      if (ts.contains(-1.0)) ("-1.0", "-1.0")
      else (f"${ts.min}%.4f", f"${ts.sorted.apply(ts.size / 2)}%.4f")
    }
    val qsMin = names.map(n => s""""$n":${fmt(n)._1}""").mkString("{", ",", "}")
    val qsMed = names.map(n => s""""$n":${fmt(n)._2}""").mkString("{", ",", "}")
    val json = s"""{"metric":"isolated","reps":$reps,"stat":"fresh_session_per_rep","queries_min":$qsMin,"queries_median":$qsMed,"sf":"$sfDir"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_ISOLATED.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
  }
}
