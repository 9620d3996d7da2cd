package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise-preference analytics — the aggregation layer an RLHF /
  * model-eval pipeline runs over human (or judge-model) comparisons:
  * Bradley–Terry strength fitting, per-matchup win rates with
  * uncertainty, and the pass@k estimator over repeated sampled
  * attempts. The reference pipeline has no preference data at all
  * (it ships telemetry rows — pipeline.py:296); this family exists
  * for the north-star training-data workload, where "which model /
  * which prompt variant wins" is a first-class census.
  *
  * Everything follows the repo's exactness discipline: counts are
  * exact integer aggregates, iterative state is micro-quantized
  * Longs between steps (the PageRank convention), and the only
  * float steps are per-row scalar IEEE ops both engines evaluate
  * identically.
  */
object Preference {

  /** Bradley–Terry strengths from pairwise outcomes via `iters`
    * synchronous minorize–maximize rounds — the batch-parallel
    * estimator (per-round hash-aggs + a pair equi-join, like
    * [[Graph.pageRank]]'s unrolled fixpoint; sequential ELO is the
    * wrong shape for a cluster and converges to BT anyway).
    *
    * Model: P(i beats j) = w_i/(w_i+w_j). MM update
    * w_i ← W_i / Σ_j n_ij/(w_i+w_j), renormalized each round so
    * Σ w = P (scale is unidentified in BT; pinning the mean at 1
    * keeps micro weights in range). Strengths live as MICRO Longs
    * between rounds; the per-pair term and the two divides are
    * scalar double ops micro-rounded back — deterministic in any
    * IEEE engine (the q119 discipline, floats instead of floor-div
    * because the MM term needs sub-integer precision).
    *
    * Conventions: ties/self-matches are dropped upstream (the
    * match extractor decides); a player with ZERO wins pins to
    * weight 0 after round 1 (its MLE is 0 — it lost every game) and
    * the denominator clamps at 1 micro so shared-pair partners never
    * divide by zero. Winner-vs-loser input means every match names
    * exactly two distinct players.
    *
    * Scale: P players, E distinct pairs. Each round is one E-sized
    * equi-join against the P-sized weight table + one hash-agg —
    * weights broadcast when P is small (the usual case: players are
    * models/sources, not documents). Never pairs×pairs.
    * Output: (player, n_wins, n_games, bt_micro). */
  def bradleyTerry(
      matches: DataFrame,
      winnerCol: String,
      loserCol: String,
      iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 20, "iters must be in [1, 20]")
    val m = matches.filter(col(winnerCol).isNotNull &&
        col(loserCol).isNotNull && col(winnerCol) =!= col(loserCol))
      .select(col(winnerCol).cast("string").as("__w"),
        col(loserCol).cast("string").as("__l"))
    // Unordered-pair game census (a < b lexically) + per-player wins.
    val pairs = Dedup.truncate(m
      .select(least(col("__w"), col("__l")).as("__a"),
        greatest(col("__w"), col("__l")).as("__b"))
      .groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("__n")))
    val wins = m.groupBy(col("__w").as("__p"))
      .agg(count(lit(1)).as("__wins"))
    val players = Dedup.truncate(
      m.select(col("__w").as("__p")).union(m.select(col("__l")))
        .distinct()
        .join(wins, Seq("__p"), "left")
        .select(col("__p"), coalesce(col("__wins"), lit(0L)).as("__wins")))
    val nPlayers = players.agg(count(lit(1)).as("__np"))

    var w = players.select(col("__p"), lit(1000000L).as("__wm"))
    (1 to iters).foreach { _ =>
      val wp = broadcast(w)
      // Both directions of each pair contribute n_ij/(w_i+w_j) to i.
      val sym = pairs.select(col("__a").as("__p"), col("__b").as("__q"),
          col("__n"))
        .union(pairs.select(col("__b"), col("__a"), col("__n")))
      val denom = sym
        .join(wp, Seq("__p"))
        .join(wp.select(col("__p").as("__q"), col("__wm").as("__wq")),
          Seq("__q"))
        .select(col("__p"),
          // T = 1e6·n/(w_i+w_j) in micro: scalar IEEE divide of exact
          // ints, micro-rounded — identical in any engine.
          round(lit(1e12) * col("__n").cast("double") /
            greatest(col("__wm") + col("__wq"), lit(1L)).cast("double"))
            .cast("long").as("__t"))
        .groupBy(col("__p")).agg(sum(col("__t")).as("__d"))
      val raw = players.join(denom, Seq("__p"), "left")
        .select(col("__p"), col("__wins"),
          when(coalesce(col("__d"), lit(0L)) > 0L,
            round(lit(1e12) * col("__wins").cast("double") /
              col("__d").cast("double")).cast("long"))
            .otherwise(lit(0L)).as("__wr"))
      val tot = raw.agg(sum(col("__wr")).cast("double").as("__s"))
      w = Dedup.truncate(raw.crossJoin(broadcast(tot))
        .crossJoin(broadcast(nPlayers))
        .select(col("__p"),
          when(col("__s") > 0.0,
            round(lit(1e6) * col("__np").cast("double") *
              col("__wr").cast("double") / col("__s")).cast("long"))
            .otherwise(lit(0L)).as("__wm")))
    }
    val games = pairs.select(col("__a").as("__p"), col("__n"))
      .union(pairs.select(col("__b"), col("__n")))
      .groupBy(col("__p")).agg(sum(col("__n")).as("n_games"))
    players.join(games, Seq("__p"))
      .join(w, Seq("__p"))
      .select(col("__p").as("player"), col("__wins").as("n_wins"),
        col("n_games"), col("__wm").as("bt_micro"))
  }

  /** Pairwise win-rate matrix with Wilson 95% bounds — the honest
    * "A beats B how often, and how sure are we" readout that a
    * [[bradleyTerry]] fit summarizes away. One row per unordered
    * matchup (a < b lexically): games, wins for the lexically
    * smaller player, its rate, and the Wilson score interval
    * ([[Profile.wilsonInterval]]'s formula inlined on the same
    * z = 1.959964 literal — one IEEE sqrt, micro-rounded bounds).
    * Self-matches and NULLs drop (stated).
    * Scale: one hash-agg over matches — matchup-count-sized output.
    * Output: (player_a, player_b, n_games, n_wins_a, p_micro,
    * lo_micro, hi_micro). */
  def winRateMatrix(
      matches: DataFrame,
      winnerCol: String,
      loserCol: String,
      z: Double = 1.959964): DataFrame = {
    require(z > 0, "z must be positive")
    val m = matches.filter(col(winnerCol).isNotNull &&
        col(loserCol).isNotNull && col(winnerCol) =!= col(loserCol))
      .select(col(winnerCol).cast("string").as("__w"),
        col(loserCol).cast("string").as("__l"))
    val stats = m
      .select(least(col("__w"), col("__l")).as("player_a"),
        greatest(col("__w"), col("__l")).as("player_b"),
        when(col("__w") <= col("__l"), 1L).otherwise(0L).as("__aw"))
      .groupBy(col("player_a"), col("player_b"))
      .agg(count(lit(1)).as("n_games"), sum(col("__aw")).as("n_wins_a"))
    val nD = col("n_games").cast("double")
    val p = col("n_wins_a").cast("double") / nD
    val z2 = lit(z) * lit(z)
    val den = lit(1.0) + z2 / nD
    val center = (p + z2 / (lit(2.0) * nD)) / den
    val half = lit(z) *
      sqrt((p * (lit(1.0) - p) + z2 / (lit(4.0) * nD)) / nD) / den
    stats.select(col("player_a"), col("player_b"), col("n_games"),
      col("n_wins_a"),
      round(lit(1e6) * p).cast("long").as("p_micro"),
      round(lit(1e6) * (center - half)).cast("long").as("lo_micro"),
      round(lit(1e6) * (center + half)).cast("long").as("hi_micro"))
  }

  /** Unbiased pass@k over repeated attempts per task — THE sampled-
    * eval metric for code/math corpora: with n attempts of which c
    * passed, pass@k = 1 − C(n−c, k)/C(n, k) (the probability a
    * random size-k subset contains a pass). The product form
    * Π_{i<k} (n−c−i)/(n−i) evaluates in MICRO-NAT integer space:
    * each factor's ln micro-rounds to a Long, the sum is exact, ONE
    * exp at the end — engine-identical (the q304 convention; a raw
    * float product's association order would not be).
    *
    * Edges: k > n rows are absent (the estimator is undefined);
    * c = 0 → 0; n − c < k → exactly 1e6 (some pass always drawn).
    * NULL outcomes drop (stated). Scale: one per-task hash-agg +
    * a ×k literal-sequence explode of the TASK table (never the
    * attempts). Output: (taskCol, k, n, c, pass_micro). */
  def passAtK(
      attempts: DataFrame,
      taskCol: String,
      passCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "ks must be >= 1")
    require(ks.distinct.size == ks.size, "ks must be distinct")
    val stats = attempts.filter(col(passCol).isNotNull)
      .groupBy(col(taskCol).as("__g"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(passCol).cast("boolean"), 1L).otherwise(0L))
          .as("c"))
    val withK = stats
      .select(col("__g"), col("n"), col("c"),
        explode(array(ks.map(k => lit(k.toLong)): _*)).as("k"))
      .filter(col("k") <= col("n"))
    // Micro-nat sum of ln((n-c-i)/(n-i)) for i = 0..k-1 — only
    // needed on the non-degenerate branch (0 < n-c, k <= n-c).
    val mid = withK.filter(col("c") > 0L && col("n") - col("c") >= col("k"))
      .select(col("__g"), col("n"), col("c"), col("k"),
        explode(sequence(lit(0L), col("k") - 1L)).as("__i"))
      .select(col("__g"), col("k"),
        round(lit(1e6) * log(
          (col("n") - col("c") - col("__i")).cast("double") /
            (col("n") - col("__i")).cast("double"))).cast("long")
          .as("__lnm"))
      .groupBy(col("__g"), col("k"))
      .agg(sum(col("__lnm")).as("__s"))
    withK.join(mid, Seq("__g", "k"), "left")
      .select(col("__g").as(taskCol), col("k"), col("n"), col("c"),
        when(col("c") === 0L, lit(0L))
          .when(col("n") - col("c") < col("k"), lit(1000000L))
          .otherwise(round(lit(1e6) *
            (lit(1.0) - exp(col("__s").cast("double") / lit(1e6))))
            .cast("long"))
          .as("pass_micro"))
  }
}
