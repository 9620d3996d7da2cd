package graft

/** Generates SCALE.md: per-gate-query physical-plan census — shuffle
  * exchanges, join strategies, whole-stage-codegen spans — from the
  * ACTUAL executed plans, so the scale story stays tied to what Spark
  * really runs rather than to prose. Run after adding operators:
  * `sbt "runMain graft.PlanAudit"`.
  */
object PlanAudit {

  /** Queries whose nested-loop/cartesian joins are intentional, with
    * the reason — anything else showing NLJ gets flagged for review. */
  val intendedNlj: Map[String, String] = Map(
    "q444_quadratic_kappa" ->
      "k x k category-marginal cross (k <= 5) + 1-row scalar attach",
    "q20_jaccard_pairs" -> "bounded brute-force baseline (doc_id < 300)",
    "q22_knn_bruteforce" -> "brute-force ANN baseline (5 broadcast queries)",
    "q31_knn_ivf" -> "16-row broadcast centroid attach (bounded)",
    "q53_ivf_lloyd" -> "16-row broadcast centroid attach (bounded)",
    "q66_tfidf_rank" -> "1-row broadcast scalar attach (corpus size)",
    "q84_mixture" -> "1-row broadcast scalar attach (total weight)",
    "q85_diversity_cap" -> "16-row broadcast centroid attach (bounded)",
    "q90_collocations" -> "1-row broadcast scalar attach (corpus size)",
    "q97_dsir_weights" -> "1-row broadcast scalar attach (corpus totals)",
    "q101_kmeans_stats" -> "16-row broadcast centroid attach (bounded)",
    "q102_semdedup" -> "16-row broadcast centroid attach (bounded)",
    "q103_lm_perplexity" -> "1-row broadcast scalar attach (vocab size)",
    "q104_curriculum" -> "1-row broadcast scalar attach (vocab size)",
    "q105_hard_negatives" -> "banded brute-force baseline (10 broadcast queries)",
    "q106_bm25" -> "1-row broadcast scalar attach (corpus totals)",
    "q111_knn_confusion" -> "brute-force kNN baseline (100 broadcast queries)",
    "q117_hll_overlap" -> "group-list pair enumeration (G×G over group NAMES, sketch-sized; registers attach by equi-join)",
    "q118_nb_classify" -> "C-row class-total / 1-row vocab-size broadcast attaches (model-sized)",
    "q123_hashed_vectors" -> "1-row broadcast scalar attach (corpus size)",
    "q124_ann_recall" -> "16-row broadcast centroid attach + brute-force ground truth (20 broadcast queries)",
    "q126_quality_ensemble" -> "1-row broadcast scalar attach (vocab size, via lmPerplexity)",
    "q127_percentile_filter" -> "1-row broadcast scalar attach (vocab size, via lmPerplexity)",
    "q130_lsh_recall" -> "brute-force ground truth (50 broadcast queries)",
    "q131_pq_recall" -> "brute-force ground truth (5 broadcast queries)",
    "q156_mg_heavy_hitters" -> "1-row broadcast scalar attach (stream total n)",
    "q226_mutual_info" -> "1-row broadcast scalar attaches (cell total + the three entropy sums)",
    "q242_chi2_independence" -> "margin cross (levels x levels, cell-metadata sized) + 1-row scalar attaches",
    "q162_kn_perplexity" -> "1-row broadcast scalar attach (model totals)",
    "q163_pit_enrich" -> "1-row broadcast scalar attach (corpus max ts caps the open SCD2 version)",
    "q164_sq_knn" -> "1-row broadcast SQ-bounds attach + 5 broadcast queries (ADC scoring)",
    "q170_matryoshka_recall" -> "brute-force ground truth (5 broadcast queries, prefix + full dims)",
    "q175_budget_apportion" -> "1-row broadcast scalar attaches (total weight, leftover R)",
    "q181_recrawl_priority" -> "1-row broadcast scalar attaches (total weight, leftover R — via apportionLargestRemainder)",
    "q186_constraints" -> "1-row broadcast scalar attach (fact row count onto the FK-violation census)",
    "q191_cluster_labels" -> "16-row broadcast centroid attach (bounded, via ivfIndex)",
    "q194_rrf_fusion" -> "1-row broadcast corpus-totals attach (BM25) + brute-force dense side (5 broadcast queries)",
    "q195_knn_mislabels" -> "16-row broadcast centroid attach (bounded, via ivfIndex)",
    "q197_drift_census" -> "1-row broadcast scalar attach (snapshot totals)",
    "q201_covisitation" -> "1-row broadcast scalar attach (kept-actor count for lift)",
    "q202_markov_anomaly" -> "1-row broadcast vocab-size attach + states²-row broadcast model join",
    "q203_decayed_counts" -> "1-row broadcast scalar attach (corpus max date)",
    "q211_bq_knn" -> "Hamming-shortlist scan (5 broadcast queries; 1 XOR/popcount per pair)",
    "q212_bq_recall" -> "Hamming-shortlist scan + brute-force ground truth (20 broadcast queries)",
    "q261_t_closeness" -> "1-row broadcast scalar attach (global sensitive-value total)",
    "q254_modularity" -> "1-row × 1-row scalar cross (edge totals × degree-square sum)",
    "q280_community_quality" -> "1-row broadcast scalar attach (total volume 2m onto the per-community census)",
    "q281_merge_gain" -> "1-row broadcast scalar attach (edge count m onto the inter-community candidate census)",
    "q282_assortativity" -> "1-row × 1-row scalar cross (orientation moments × node count)",
    "q289_funnel" -> "1-row broadcast scalar attach (step-1 cohort size onto the per-step rows)",
    "q301_join_cardinality" -> "1-row × 1-row scalar crosses (side totals onto the census row)",
    "q304_temperature_mix" -> "1-row broadcast scalar attach (rate total onto the source rows)",
    "q263_neyman_alloc" -> "1-row broadcast scalar attaches (total weight, leftover R — via apportionLargestRemainder)",
    "q312_silhouette" -> "16-row broadcast centroid attach (bounded)",
    "q327_off_policy" -> "1-row broadcast scalar attach (action-rate total)",
    "q329_platt_fit" -> "1-row broadcast parameter attach per Newton round (bounded: iters+1 passes)",
    "q335_friedman" -> "constant-group gate: the group-keyed census joins (k, n_blocks, moments) fold to 1-row broadcast attaches; with real group keys they plan as hash joins",
    "q321_kmv_intersect" -> "group² pair census (bounded by intent — sources/shards; the q117 precedent) + sketch-sized merges",
    "q325_eb_shrinkage" -> "1-row broadcast moment attach (G, Σr, Σr²)",
    "q352_keyness" -> "1-row broadcast scalar attach (subcorpus totals A/B)",
    "q356_burrows_delta" -> "top-K marker broadcast attach + author-grid cross (model-sized: authors × 50)",
    "q359_markov_attribution" -> "chain-variant cross + 1-row scalar attaches (model-sized: states² × channels)",
    "q365_morans_i" -> "1-row × 1-row scalar cross (tile totals × adjacency sums)",
    "q368_gearys_c" -> "1-row × 1-row scalar cross (tile totals × adjacency sums)",
    "q382_nsw_build" -> "16-row broadcast centroid attach (bounded, via ivfIndex)",
    "q383_nsw_recall" -> "16-row broadcast centroid attach + 20-query broadcast seed/score attaches (bounded; the ANN-recall gate shape)",
    "q424_hnsw_build" -> "per-layer ivfCentroids broadcast attaches (<= 16 rows each; the q382 NSW-build shape, once per HNSW layer)",
    "q425_hnsw_recall" -> "top-layer entry cross (<= 2 nodes) + 20-query broadcast score attaches per layer round (bounded; the q383 ANN-recall shape over 3 layers)",
    "q386_moods_median" -> "1-row × 1-row scalar crosses (margin totals onto the χ² row)",
    "q391_cramers_v" -> "margin × margin contingency GRID cross (model-sized: r × c categories) + 1-row total attaches",
    "q392_jonckheere" -> "k-level (≤ 32) broadcast dose-pair fan-out + 1-row size-census attach",
    "q397_ipw_ate" -> "1-row × 1-row scalar cross (dropped-count attach onto the estimate row)",
    "q373_entropy_rate" -> "1-row scalar crosses (transition total × the two entropy sums — the q226 shape)",
    "q401_assoc_rules" -> "1-row broadcast scalar attach (kept-basket count N onto each rule)",
    "q409_page_trend" -> "constant-group gate folds the __g equi-key: the k/dropped/n_blocks/L2 attaches become 1-row-per-group scalar crosses (real multi-group inputs keep hash equi-joins)",
    "q421_fellegi_sunter" -> "constant-group gate folds the __g equi-key: the 1-row-per-group M-step parameter attaches (census×m1, m1×m2) become scalar crosses — census is ≤ 2^K rows by construction")

  /** Queries that keep a NATIVE per-key window, with the reason the
    * partition is bounded (per-user event counts in the fixtures are
    * capped; a bot/celebrity key at 100 TB takes the Ranking twins —
    * groupRunningSum / groupTopK / groupRank — which q145 proves
    * hash-identical to these windows). Emitted into the notes column
    * so every remaining window partition carries its justification. */
  val windowNotes: Map[String, String] = Map(
    "q07_delta_clamp" -> "per-user window (bounded group; scale twin: groupRunningSum, q145 parity)",
    "q33_running_total" -> "per-user window (bounded group; scale twin: groupRunningSum, q145 parity)",
    "q45_window_nav" -> "per-user window (bounded group; lag/lead need order only, no scale twin needed)",
    "q60_trailing_window" -> "per-user window (bounded group; trailing frame, scale twin: range-bin join)",
    "q71_scd2" -> "per-user window (bounded group; SCD2 interval build)",
    "q74_funnel" -> "per-user window (bounded group; funnel step ordering)",
    "q75_cohort_retention" -> "per-user window (bounded group; cohort min-day)",
    "q145_window_parity" -> "DELIBERATE window vs Ranking-twin parity gate (both plans, hash-equal)",
    "q188_transitions" -> "per-user window (bounded group; lead needs order only)",
    "q190_bot_regularity" -> "per-user window (bounded group; fixture ordinal + lag gap deltas)",
    "q202_markov_anomaly" -> "per-user window (bounded group; lead needs order only)",
    "q208_ewma" -> "per-user window (bounded group; W fixed lag taps need order only)",
    "q209_cusum" -> "per-user window (bounded group; cumsum + running-min, scale twin: groupRunningSum)",
    "q291_attribution" -> "per-user window (bounded group; running last-non-null touch, the asOfJoin shape)",
    "q311_interleave_order" -> "global-rank offsets window over the (partition × 1 group) census — 32 metadata rows, not data (the groupRank machinery with a constant group)",
    "q350_mann_kendall" -> "maxN-bounded pair census as ONE in-task kernel over the heap-collected series (r18; no pair rows, no window)",
    "q354_runs_test" -> "per-key kept-row re-rank via groupRank twins; remaining windows ride the range-partitioned prefix",
    "q359_markov_attribution" -> "per-user window (bounded group; journey lead needs order only)",
    "q361_hodges_lehmann" -> "two-arm maxN-bounded pair census as ONE in-task kernel (r18; both arm heaps ride one aggregation)",
    "q366_kendall_tau" -> "maxN-bounded pair census as ONE in-task kernel over the heap-collected series (r18)",
    "q380_theil_sen" -> "maxN-bounded slope census + both medians as ONE in-task kernel (r18; no pair rows, no windows)",
    "q370_bh_fdr" -> "suffix-min window over the TEST census (m rows/group — metadata, not data)",
    "q373_entropy_rate" -> "per-user window (bounded group; journey lead needs order only)")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "SCALE.md"
    val spark = Graft.session("graft-plan-audit")
    // AQE wraps plans in AdaptiveSparkPlan whose printed tree hides
    // the codegen span markers; the audit reads the static plan (the
    // shuffle/join census is identical — AQE can only merge further).
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    def count(p: String, token: String): Int =
      p.sliding(token.length).count(_ == token)

    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        val shuffles = count(p, "Exchange hashpartitioning") +
          count(p, "Exchange rangepartitioning") +
          count(p, "Exchange SinglePartition")
        val bhj = count(p, "BroadcastHashJoin")
        val smj = count(p, "SortMergeJoin")
        val shj = count(p, "ShuffledHashJoin")
        val bnl = count(p, "BroadcastNestedLoopJoin") + count(p, "CartesianProduct")
        // Non-AQE plans mark codegen spans "*(n)"; AQE final plans
        // print "WholeStageCodegen (n)" node labels instead.
        val codegen = math.max(
          "\\*\\(\\d+\\)".r.findAllIn(p).toSeq.distinct.size,
          "WholeStageCodegen \\(\\d+\\)".r.findAllIn(p).toSeq.distinct.size)
        val nljNote =
          if (bnl == 0) None
          else Some(intendedNlj.getOrElse(name, "REVIEW: unexpected nested loop"))
        val notes = (nljNote.toSeq ++ windowNotes.get(name)).mkString("; ")
        f"| $name | $shuffles | $bhj/$smj/$shj/$bnl | $codegen | $notes |"
      } catch {
        case e: Throwable => s"| $name | — | — | — | ERROR ${e.getClass.getSimpleName} |"
      }
    }

    val header =
      s"""# SCALE — physical-plan census of every gate query
         |
         |Generated by `graft.PlanAudit` from the executed plans at
         |`$dir` (final AQE plans may merge further at runtime; this is
         |the static lower bound). Columns:
         |
         |- **shuffles** — hash/range/single-partition exchanges (each is
         |  a full data movement; the number to keep minimal at 100 TB).
         |  Broadcast exchanges are NOT counted — they ship only the
         |  small side.
         |- **joins** — BroadcastHash / SortMerge / ShuffledHash /
         |  NestedLoop-or-Cartesian. Every nested-loop occurrence is
         |  annotated: either a deliberately bounded brute-force
         |  baseline or a tiny-literal broadcast attach (1-16 rows);
         |  every scale-path operator joins on a derived equi-key
         |  (LSH band, SRP bucket, IVF cell, range bin, prefix token).
         |- **codegen** — distinct whole-stage-codegen spans (wider is
         |  better; interpreted gaps are where per-row overhead hides).
         |
         || query | shuffles | joins BHJ/SMJ/SHJ/NLJ | codegen spans | notes |
         ||---|---|---|---|---|""".stripMargin

    val body = (header +: rows).mkString("\n") + "\n" + scaleSection()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), body)
    println(s"wrote $out (${rows.size} queries)")
    spark.stop()
  }

  /** Fold BENCH_SCALE.json (graft.ScaleBench) into the census, so the
    * static plan audit and the MEASURED scaling exponents live in one
    * document. Absent file ⇒ empty section (the audit still runs). */
  private def scaleSection(): String = {
    val f = java.nio.file.Paths.get("BENCH_SCALE.json")
    if (!java.nio.file.Files.exists(f)) return ""
    val js = java.nio.file.Files.readString(f)
    // The optional rows_kind field (r18, ScaleBench.CensusRows) sits
    // between rowexp and skipped16 — the regex must tolerate it or
    // the whole measured section silently vanishes (which is exactly
    // what happened to the r18-morning regen).
    val entry = ("\"(q[0-9]+[a-z0-9_]*)\":\\{\"t1\":([0-9.]+|null)," +
      "\"t4\":([0-9.]+|null),\"t16\":([0-9.]+|null)," +
      "\"exp4\":(-?[0-9.]+|null),\"exp16\":(-?[0-9.]+|null)," +
      "(?:\"rows1\":([0-9]+|null),\"rows4\":([0-9]+|null)," +
      "\"rows16\":([0-9]+|null),\"rowexp\":(-?[0-9.]+|null),)?" +
      "(?:\"rows_kind\":\"([a-z_]+)\",)?" +
      "\"skipped16\":(true|false),\"verdict\":\"([a-z+\\-]+)\"").r
    val rows = entry.findAllMatchIn(js).map { m =>
      val rowexp = Option(m.group(10)).getOrElse("—")
      val rowCell =
        if (Option(m.group(11)).contains("declared_census"))
          s"$rowexp (census)"
        else rowexp
      s"| ${m.group(1)} | ${m.group(2)} | ${m.group(3)} | ${m.group(4)} " +
        s"| ${m.group(5)} | ${m.group(6)} | $rowCell | ${m.group(13)} |"
    }.toSeq
    if (rows.isEmpty) return ""
    s"""
       |## Measured scaling exponents (graft.ScaleBench)
       |
       |The static census above says what the plans ARE; this section
       |says how they MEASURED. `ScaleBench` union-replicates the
       |driver tables into a scratch dir at ×4/×16 with re-keyed ids
       |(disjoint replica universes — uniform corpus growth, not
       |longer per-key histories) and a per-replica substitution
       |alphabet on document text (per-replica statistics identical to
       |the base corpus, no manufactured cross-replica near-dup
       |cliques), then times the audited heavy gates unmodified.
       |exp_f = ln(t_f/t_1)/ln f on min-over-reps; fixed per-query
       |overhead (~0.1–0.3 s) deflates exponents, so a measured e > 1
       |UNDERSTATES nothing. Full numbers: BENCH_SCALE.json.
       |
       |`rowexp` is the OUTPUT-growth exponent at the same tier: a
       |row is only called "superlinear" when time outruns the true
       |result set; time ≤ output growth is verdict "output-bound" —
       |linear per result. That is q174's shape: replicating points
       |×16 over a FIXED coordinate area grows the true result set
       |~×256 (pairs ∝ N²·r²/A), and the grid join's cost tracks its
       |output, which is the correct cost for an exact operator. The
       |100 TB guard for genuinely unbounded density is
       |`Spatial.proximityJoin(maxPerCell = …)` (deterministic
       |per-cell cap, spec-gated); growing corpora whose geography
       |grows with them (the realistic shape) stay linear.
       |
       |Some gates' OUTPUT row count understates the result set the
       |operator is CONTRACTED to compute — q358_dbscan emits one
       |row per point (rowexp exactly 1.0 by construction) while
       |exact DBSCAN must materialize the full eps-graph, which
       |densifies ~f² under fixed-geography replication.
       |`ScaleBench.CensusRows` lets such a gate declare the census
       |its rowexp prices instead (`rows_kind: "declared_census"`,
       |computed untimed per tier); with it q358's time exponent
       |(~1.1–1.2) sits far BELOW its census growth (~2.0) — the
       |operator is sublinear per-edge, verdict output-bound. The
       |guard for unbounded density is `Spatial.dbscan(maxPerCell)`
       |(the proximityJoin cap passed through; spec-gated — capped
       |cells demote deterministically, far structure intact).
       |
       |Standing adjudications (r18, VERDICT r17 #4; full-run
       |exponents carry co-tenant session noise that the targeted
       |`SPARK_GRAFT_SCALE_ONLY` re-measure in BENCH_SCALE_ONLY.json
       |removes):
       |
       |- **q221_adamic_adar** — full-run exp16 reads 1.0–1.15
       |  across rounds; the targeted re-measure reads **1.004**.
       |  The hub cap IS engaged in the gate (`maxDegree = 40`,
       |  bounding per-part fan-out at 40² pairs), replica universes
       |  are disjoint (re-keyed ids), and the pair census grows
       |  exactly ×f (rows16/rows1 = 16.0 in BENCH_SCALE.json) — the
       |  true result set is provably linear and no quadratic
       |  mechanism exists; the full-run excess is t1-deflation from
       |  fixed planning overhead plus session co-tenancy.
       |- **q346_hyperball** — the ScaleBench override maps events
       |  onto a FIXED 2000-node universe, so ×16 grows edges 16×
       |  over the same vertices and every ball densifies. Per-round
       |  cost = edges × live-registers-per-node, and register fill
       |  SATURATES at the HLL cap M — cost ≤ edges × M,
       |  structurally linear in edges. Readings above 1.0 (1.11 at
       |  r17) are the fill-up transient between tiers; the targeted
       |  re-measure reads **0.957** and the r18 full run 0.93.
       |
       |r18 OPTIMIZATION-round re-measures (BENCH_SCALE_ONLY.json —
       |the six heavy gates whose implementations changed in the
       |r18 optimization pass; the full census table below predates
       |those changes for these six):
       |
       |- q174_proximity_join exp16 **0.48** (positive-offset probe;
       |  was 0.69), q350_mann_kendall exp16 **0.38** (pair-census
       |  kernel; was 0.61), q346_hyperball exp16 **0.63** with t16
       |  **10.5 s** (packed 64-byte registers; the row form below
       |  measured 61.1 s at ×16 — the packed state cut the ×16
       |  tier ~6×), q358_dbscan exp16 **1.098**, t16 140.3 s
       |  (guarded driver union-find for the boundary graph; was
       |  1.176 / 187.2 s — verdict stays output-bound: rowexp 1.99
       |  census ≫ time exponent).
       |- q376_item_knn_recs and q380_theil_sen first read exp4
       |  1.58 / 2.68 in the six-gate targeted batch — co-tenant
       |  session noise per this section's own discipline (q380's
       |  t4 read 31.1 s in-batch vs **2.34 s** alone); measured
       |  alone they are exp16 **0.63** and **0.70**,
       |  linear-or-better. Both raw runs are unioned in
       |  BENCH_SCALE_ONLY.json with a provenance note.
       |
       || query | t1 (s) | t4 (s) | t16 (s) | exp4 | exp16 | rowexp | verdict |
       ||---|---|---|---|---|---|---|---|
       |""".stripMargin + rows.mkString("\n") + "\n"
  }
}
