package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-occurrence mining over (actor, item) interactions — the
  * "users who touched X also touched Y" primitive behind
  * related-items, query suggestion, and citation-coupling analyses.
  * On a crawl corpus the same shape mines domain co-citation (pages
  * linking both A and B) and term co-click signals.
  */
object Recsys {

  /** Item co-visitation with exact integer lift: unordered item pairs
    * sharing ≥ `minShared` distinct actors, scored by
    * lift = P(a,b) / (P(a)·P(b)) in micro-units —
    * `(1e6 · n_ab · n_actors) div (n_a · n_b)`, all exact Longs
    * (> 1e6 means the pair co-occurs MORE than independence
    * predicts). Interactions dedupe to distinct (actor, item) first
    * (revisits are not signal here).
    *
    * Scale: the pair explode is per-ACTOR (the bounded group — an
    * actor with `maxItemsPerActor` items caps at its C(n,2); heavier
    * actors are dropped entirely, the standard bot/power-user cut
    * that also bounds the quadratic term), then one map-side-
    * combinable census per unordered pair and two item-count joins.
    * Never item×item over the catalog, never corpus-wide windows.
    * Overflow: the 1e6·n_ab·n_actors product runs in decimal(38,0)
    * (HUGEINT in the oracle twin) — Long arithmetic would silently
    * wrap once n_ab·n_actors passes ~9.2e12, which a web-scale
    * interaction log reaches; the quotient itself is a bounded
    * micro-lift and lands back in a long.
    *
    * Output: (item_a, item_b, n_ab, n_a, n_b, lift_micro) with
    * item_a < item_b. */
  def covisitation(
      interactions: DataFrame,
      actorCol: String,
      itemCol: String,
      minShared: Int,
      maxItemsPerActor: Int): DataFrame = {
    require(minShared >= 1, "minShared must be at least 1")
    require(maxItemsPerActor >= 2, "maxItemsPerActor must be at least 2")
    val ai = Dedup.truncate(
      interactions.select(col(actorCol).as("__actor"),
          col(itemCol).as("__item"))
        .filter(col("__actor").isNotNull && col("__item").isNotNull)
        .distinct())
    val keptActors = ai.groupBy(col("__actor"))
      .agg(count(lit(1)).as("__ni"))
      .filter(col("__ni") <= maxItemsPerActor)
      .select(col("__actor"))
    val kept = ai.join(keptActors, Seq("__actor"), "left_semi")
    // 1-row broadcast scalar attach (the q84/q106 convention) — no
    // driver action; counted from the one-row-per-actor census, not a
    // distinct re-scan of the interaction table (every kept actor has
    // ≥ 1 item by construction).
    val tot = keptActors.agg(count(lit(1)).as("__nu"))
    val itemCounts = kept.groupBy(col("__item"))
      .agg(count(lit(1)).as("__n"))
    val pairs = kept.select(col("__actor"), col("__item").as("item_a"))
      .join(kept.select(col("__actor"), col("__item").as("item_b")),
        Seq("__actor"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minShared)
    pairs
      .join(itemCounts.select(col("__item").as("item_a"),
        col("__n").as("n_a")), Seq("item_a"))
      .join(itemCounts.select(col("__item").as("item_b"),
        col("__n").as("n_b")), Seq("item_b"))
      .crossJoin(broadcast(tot))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        col("n_a"), col("n_b"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * n_ab * __nu) div " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b)")
          .as("lift_micro"))
  }

  /** Item-based collaborative filtering (Sarwar et al. 2001) — the
    * neighborhood complement to [[als]]'s latent factors, and the
    * recommender that needs NO training loop: item↔item cosine over
    * the binary interaction matrix (c_ij/√(c_i·c_j) from exact
    * co-occurrence counts, micro-rounded once), each item keeps its
    * `kNbrs` most similar neighbors (bounded heap, ties to the
    * smaller id), and a user's recommendations are the unseen items
    * ranked by the SUM of similarities to their history (exact Long
    * sums of the pinned micros — order-free). Hyper-actors above
    * `maxItemsPerActor` items drop entirely ([[covisitation]]'s
    * rule: a crawl-everything actor co-occurs everything with
    * everything and only manufactures pair mass).
    *
    * Scale: pair census bounded by maxItemsPerActor² per actor;
    * neighbor lists are (items × kNbrs); the recommend join is
    * history × kNbrs per user — model-sized throughout, never
    * users × items. Output: (actorCol, rank, rec_item,
    * score_micro). */
  def itemKnnRecommend(
      interactions: DataFrame,
      actorCol: String,
      itemCol: String,
      kNbrs: Int,
      topN: Int,
      maxItemsPerActor: Int): DataFrame = {
    require(kNbrs >= 1 && topN >= 1, "kNbrs/topN must be positive")
    require(maxItemsPerActor >= 2, "maxItemsPerActor must be at least 2")
    // r19 adjudication (VERDICT r18 #1): the r18 one-aggregation
    // rework (count + bounded TopK item heap per actor, wedge pairs
    // generated in-task) measured FASTER isolated (9.18 → 5.67 s) but
    // the driver's full-suite runs put it at 20.1 s @local[32] /
    // 13.3 s @local[8] vs 6.26 s for this count+semi-join shape at
    // r17-end — the TopK ObjectHashAggregate's per-row copies and
    // serialized heap buffers are contention/GC-bound under suite
    // heap pressure (the same mechanism that made the reverted
    // q221/q227/q275 rework slower). Reverted to the r17 shape;
    // adjudicate any future change here with in-suite runs, not
    // isolated ones.
    val ai = Dedup.truncate(
      interactions.select(col(actorCol).as("__u"),
          col(itemCol).as("__it"))
        .filter(col("__u").isNotNull && col("__it").isNotNull)
        .distinct())
    val keptActors = ai.groupBy(col("__u"))
      .agg(count(lit(1)).as("__ni"))
      .filter(col("__ni") <= maxItemsPerActor)
      .select(col("__u"))
    val kept = Dedup.truncate(ai.join(keptActors, Seq("__u"),
      "left_semi"))
    val ic = kept.groupBy(col("__it")).agg(count(lit(1)).as("__n"))
    val pairs = kept.select(col("__u"), col("__it").as("__ia"))
      .join(kept.select(col("__u"), col("__it").as("__ib")),
        Seq("__u"))
      .filter(col("__ia") < col("__ib"))
      .groupBy(col("__ia"), col("__ib"))
      .agg(count(lit(1)).as("__nab"))
    val sims = pairs
      .join(ic.select(col("__it").as("__ia"), col("__n").as("__na")),
        Seq("__ia"))
      .join(ic.select(col("__it").as("__ib"), col("__n").as("__nb")),
        Seq("__ib"))
      .select(col("__ia"), col("__ib"),
        round(lit(1e6) * col("__nab").cast("double") /
          (sqrt(col("__na").cast("double")) *
            sqrt(col("__nb").cast("double")))).cast("long")
          .as("__sim"))
    val sym = sims.select(col("__ia").as("__it"),
        col("__ib").as("__nbr"), col("__sim"))
      .unionByName(sims.select(col("__ib").as("__it"),
        col("__ia").as("__nbr"), col("__sim")))
    val nbrs = Ranking.groupTopK(sym, Seq("__it"),
        Seq((-col("__sim")).as("__negsim"), col("__nbr").as("__nbr"),
          col("__sim").as("__sim")), kNbrs)
      .select(col("__it"), col("__nbr"), col("__sim"))
    val scored = kept.join(nbrs, Seq("__it"))
      .groupBy(col("__u"), col("__nbr"))
      .agg(sum(col("__sim")).as("__score"))
    val fresh = scored.join(
      kept.select(col("__u"), col("__it").as("__nbr")),
      Seq("__u", "__nbr"), "left_anti")
    Ranking.groupTopK(fresh, Seq("__u"),
        Seq((-col("__score")).as("__negscore"),
          col("__nbr").as("rec_item"),
          col("__score").as("score_micro")), topN)
      .select(col("__u").as(actorCol), col("rank"), col("rec_item"),
        col("score_micro"))
  }

  /** Rank-1 ALS matrix factorization over (user, item, rating) — the
    * collaborative-filtering baseline that factors the interaction
    * matrix into one latent scalar per user and per item (item
    * "quality" × user "intensity" — the bias-only model every rank-k
    * recommender is benchmarked against). Rank 1 makes each ALS
    * half-step a CLOSED FORM the whole engine parity story can hold:
    * u = Σ r·v / (λ + Σ v²) is two exact DECIMAL(38,0) sums per key
    * and ONE micro-rounded divide — so the alternation is a chain of
    * hash-aggregates and equi-joins, engine-exact at every round
    * (the quantized-recursion idiom: factors are micro-rounded
    * integers BETWEEN steps). λ rides in 1e-12 units so the
    * denominator stays integer. Item factors init at 1.0; `iters`
    * full alternations (users then items); per-item fit is the exact
    * micro RMSE of û·v̂ (sqrt is IEEE-exact in any engine).
    *
    * Scale: each half-step shuffles by one key — broadcast the
    * item-factor side (items ≪ users in every recsys corpus); the
    * user side is a plain shuffle join that AQE handles.
    * Output: (itemCol, n_ratings, v_micro, rmse_micro). */
  def alsRank1(
      df: DataFrame,
      userCol: String,
      itemCol: String,
      ratingMilliCol: String,
      iters: Int,
      lambdaReg: Double): DataFrame = {
    require(iters >= 1, "iters must be at least 1")
    require(lambdaReg >= 0, "lambdaReg must be non-negative")
    val dec = "decimal(38,0)"
    val lam12 = math.round(lambdaReg * 1e12)
    val base = df.select(col(userCol).as("__u"), col(itemCol).as("__i"),
      col(ratingMilliCol).cast("long").as("__r"))
    def solve(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column) =
      round(lit(1e9) * num.cast("double") /
        (den + lit(lam12)).cast("double")).cast("long")
    var items = base.select(col("__i")).distinct()
      .withColumn("__v", lit(1000000L))
      .withColumn("n_ratings", lit(0L))
    var users: DataFrame = base.select(col("__u")).distinct()
      .withColumn("__f", lit(1000000L))
    for (_ <- 1 to iters) {
      users = base
        .join(broadcast(items.select(col("__i"), col("__v"))),
          Seq("__i"))
        .groupBy(col("__u"))
        .agg(sum((col("__r").cast(dec) * col("__v")).cast(dec))
          .as("__num"),
          sum((col("__v").cast(dec) * col("__v")).cast(dec))
            .as("__den"))
        .select(col("__u"), solve(col("__num"), col("__den")).as("__f"))
      items = base.join(users, Seq("__u"))
        .groupBy(col("__i"))
        .agg(count(lit(1)).as("n_ratings"),
          sum((col("__r").cast(dec) * col("__f")).cast(dec))
            .as("__num"),
          sum((col("__f").cast(dec) * col("__f")).cast(dec))
            .as("__den"))
        .select(col("__i"), col("n_ratings"),
          solve(col("__num"), col("__den")).as("__v"))
    }
    val errs = base.join(users, Seq("__u"))
      .join(broadcast(items.select(col("__i"), col("__v"))), Seq("__i"))
      .select(col("__i"),
        (col("__r") * lit(1000L) -
          round((col("__f").cast(dec) * col("__v")).cast("double") /
            lit(1e6)).cast("long")).as("__e"))
    val fit = errs.groupBy(col("__i"))
      .agg(sum((col("__e").cast(dec) * col("__e")).cast(dec))
        .as("__sse"), count(lit(1)).as("__n"))
      .select(col("__i"),
        round(sqrt(col("__sse").cast("double") /
          col("__n").cast("double"))).cast("long").as("rmse_micro"))
    items.join(fit, Seq("__i"))
      .select(col("__i").as(itemCol), col("n_ratings"), col("__v")
        .as("v_micro"), col("rmse_micro"))
  }

  /** General rank-k ALS — each half-step solves the per-key ridge
    * normal equations (A + λI)x = b with A = Σ v·vᵀ, b = Σ r·v
    * accumulated over the key's ratings and a k×k Gaussian
    * elimination on the k²-bounded state (groupByKey + mapGroups —
    * the per-key state is k² doubles, never the ratings themselves).
    * Item factors init deterministically from the item id (no RNG);
    * the float accumulation order still follows row order, so this
    * is honest model fitting, not a census — the correctness story
    * is the spec's reconstruction-error bound, not an oracle hash
    * (use [[alsRank1]] where engine parity must hold).
    * Returns (userFactors, itemFactors) as (id, Array[Double]). */
  def als(
      ratings: org.apache.spark.sql.Dataset[(Long, Long, Double)],
      k: Int,
      iters: Int,
      lambdaReg: Double): (org.apache.spark.sql.Dataset[(Long, Array[Double])],
      org.apache.spark.sql.Dataset[(Long, Array[Double])]) = {
    require(k >= 1 && k <= 64, "k must be in [1, 64]")
    val spark = ratings.sparkSession
    import spark.implicits._

    def solveKxK(a: Array[Double], b: Array[Double]): Array[Double] = {
      // In-place Gaussian elimination with partial pivoting on the
      // k×k system; a is row-major and already has λ on the diagonal.
      val n = b.length
      val x = b.clone()
      val m = a.clone()
      var col0 = 0
      while (col0 < n) {
        var piv = col0
        var r = col0 + 1
        while (r < n) {
          if (math.abs(m(r * n + col0)) > math.abs(m(piv * n + col0)))
            piv = r
          r += 1
        }
        if (piv != col0) {
          var c = 0
          while (c < n) {
            val tmp = m(col0 * n + c)
            m(col0 * n + c) = m(piv * n + c); m(piv * n + c) = tmp
            c += 1
          }
          val tb = x(col0); x(col0) = x(piv); x(piv) = tb
        }
        val d = m(col0 * n + col0)
        r = col0 + 1
        while (r < n) {
          val factor = if (d == 0.0) 0.0 else m(r * n + col0) / d
          var c = col0
          while (c < n) {
            m(r * n + c) -= factor * m(col0 * n + c); c += 1
          }
          x(r) -= factor * x(col0)
          r += 1
        }
        col0 += 1
      }
      var r2 = n - 1
      while (r2 >= 0) {
        var s = x(r2)
        var c = r2 + 1
        while (c < n) { s -= m(r2 * n + c) * x(c); c += 1 }
        val d = m(r2 * n + r2)
        x(r2) = if (d == 0.0) 0.0 else s / d
        r2 -= 1
      }
      x
    }

    def halfStep(
        triples: org.apache.spark.sql.Dataset[(Long, Long, Double)],
        factors: org.apache.spark.sql.Dataset[(Long, Array[Double])])
        : org.apache.spark.sql.Dataset[(Long, Array[Double])] =
      triples.toDF("key", "other", "r")
        .join(factors.toDF("other", "f"), Seq("other"))
        .select(col("key"), col("r"), col("f"))
        .as[(Long, Double, Array[Double])]
        .groupByKey(_._1)
        .mapGroups { (key, rows) =>
          val a = Array.ofDim[Double](k * k)
          val b = Array.ofDim[Double](k)
          var d = 0
          while (d < k) { a(d * k + d) = lambdaReg; d += 1 }
          rows.foreach { case (_, r, f) =>
            var i = 0
            while (i < k) {
              b(i) += r * f(i)
              var j = 0
              while (j < k) { a(i * k + j) += f(i) * f(j); j += 1 }
              i += 1
            }
          }
          (key, solveKxK(a, b))
        }

    val byUser = ratings.map { case (u, i, r) => (u, i, r) }
    val byItem = ratings.map { case (u, i, r) => (i, u, r) }
    var itemF = ratings.map(_._2).distinct()
      .map(i => (i, Array.tabulate(k)(d =>
        0.1 + 0.01 * (((i * 31 + d) % 7 + 7) % 7))))
    var userF: org.apache.spark.sql.Dataset[(Long, Array[Double])] =
      null
    for (_ <- 1 to iters) {
      userF = halfStep(byUser, itemF)
      itemF = halfStep(byItem, userF)
    }
    (userF, itemF)
  }

  /** Weighted Slope One (Lemire & Maclachlan 2005) — the rating
    * predictor that beats its simplicity: for every co-rated item
    * pair, the average rating deviation dev(i,j) = Σ(r_ui − r_uj) /
    * c_ij; a user's prediction for unseen item i is the c-weighted
    * blend Σ_j (dev(i,j) + r_uj)·c_ij / Σ_j c_ij over their rated
    * items j. The whole computation stays EXACT integer micro until
    * the single final divide: (dev + r_uj)·c_ij = sumdev_ij +
    * c_ij·r_uj — so the numerator is a Long sum of exact terms,
    * never a rounded-average-of-averages. Duplicate (actor, item)
    * ratings collapse to their micro mean first (one rounded divide,
    * stated). Hyper-actors above `maxItemsPerActor` drop entirely
    * ([[covisitation]]'s rule — they dominate every pair census).
    *
    * Scale: the deviation census is per-actor pair explode (≤
    * maxItemsPerActor² each), predictions are history × item-pair
    * rows — model-sized, never users × catalog. Output:
    * (actorCol, item, pred_micro, n_pairs) for (actor, item) pairs
    * the actor has NOT rated and ≥ 1 co-rated bridge exists;
    * ties in nothing — fully deterministic. */
  def slopeOne(
      ratings: DataFrame,
      actorCol: String,
      itemCol: String,
      ratingCol: String,
      maxItemsPerActor: Int): DataFrame = {
    require(maxItemsPerActor >= 2, "maxItemsPerActor must be at least 2")
    val raw = ratings
      .filter(col(actorCol).isNotNull && col(itemCol).isNotNull &&
        col(ratingCol).isNotNull)
      .select(col(actorCol).as("__actor"), col(itemCol).as("__item"),
        round(col(ratingCol).cast("double") * lit(1e6)).cast("long")
          .as("__r"))
    // One rating per (actor, item): exact mean, single rounded divide.
    val ai = Dedup.truncate(raw.groupBy(col("__actor"), col("__item"))
      .agg(round(sum(col("__r")).cast("double") /
        count(lit(1)).cast("double")).cast("long").as("__r")))
    val keptActors = ai.groupBy(col("__actor"))
      .agg(count(lit(1)).as("__ni"))
      .filter(col("__ni") <= maxItemsPerActor)
      .select(col("__actor"))
    val kept = Dedup.truncate(
      ai.join(keptActors, Seq("__actor"), "left_semi"))
    // Directed deviation census: dev(i, j) kept as the exact rational
    // (sumdev, c) — both directions materialize (sumdev negates), so
    // the predict join is a plain equi-join on j.
    val devs = kept.select(col("__actor"), col("__item").as("__i"),
        col("__r").as("__ri"))
      .join(kept.select(col("__actor"), col("__item").as("__j"),
        col("__r").as("__rj")), Seq("__actor"))
      .filter(col("__i") =!= col("__j"))
      .groupBy(col("__i"), col("__j"))
      .agg(sum(col("__ri") - col("__rj")).as("__sumdev"),
        count(lit(1)).as("__c"))
    // Predict: user's history (j, r_uj) bridges to every co-rated i.
    val contrib = kept.select(col("__actor"), col("__item").as("__j"),
        col("__r").as("__rj"))
      .join(devs, Seq("__j"))
      .select(col("__actor"), col("__i"),
        (col("__sumdev") + col("__c") * col("__rj")).as("__num"),
        col("__c"))
    val rated = kept.select(col("__actor"), col("__item").as("__i"))
    contrib.join(rated, Seq("__actor", "__i"), "left_anti")
      .groupBy(col("__actor"), col("__i"))
      .agg(sum(col("__num")).as("__n"), sum(col("__c")).as("__d"),
        count(lit(1)).as("n_pairs"))
      .select(col("__actor").as(actorCol), col("__i").as(itemCol),
        round(col("__n").cast("double") / col("__d").cast("double"))
          .cast("long").as("pred_micro"),
        col("n_pairs"))
  }

  /** Pair-antecedent association rules (Agrawal–Srikant Apriori,
    * depth 3) — the market-basket step past [[covisitation]]'s pairs:
    * mine frequent UNORDERED triples {a,b,c} and emit every
    * {x,y} → z rule with its support, confidence n_xyz/n_xy and lift
    * n_xyz·N/(n_xy·n_z). A curation pipeline reads these off token
    * or tag baskets ("docs tagged {code, math} are also tagged
    * {physics} 4× base rate") the same way a store reads carts.
    *
    * Scale design: baskets dedup then size-filter to
    * [3, maxItemsPerBasket] BEFORE any pairing ([[covisitation]]'s
    * hyper-actor rule — an unbounded basket is pair-census death);
    * pairs and triples are then equi-joins on the basket key with
    * per-basket fan-out ≤ C(cap,3), every census a hash-agg, and the
    * three rules per triple come from ONE `explode` of a 3-element
    * literal array (no re-join per direction). Support base N is the
    * KEPT basket count, attached as a 1-row broadcast scalar.
    *
    * Output: (ant_a, ant_b, cons, n_abc, n_ant, n_cons, n_baskets,
    * conf_micro, lift_micro) for triples with n_abc ≥ minSup; the
    * antecedent pair is always emitted (smaller, larger). */
  def assocRules(
      baskets: DataFrame,
      basketCol: String,
      itemCol: String,
      minSup: Long = 2L,
      maxItemsPerBasket: Int = 32): DataFrame = {
    require(minSup >= 1L, "minSup must be at least 1")
    require(maxItemsPerBasket >= 3,
      "maxItemsPerBasket must be at least 3")
    val bi = Dedup.truncate(
      baskets.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
        .filter(col("__b").isNotNull && col("__i").isNotNull)
        .distinct())
    val keptBaskets = bi.groupBy(col("__b"))
      .agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") >= 3 && col("__sz") <= maxItemsPerBasket)
      .select(col("__b"))
    val kept = bi.join(keptBaskets, Seq("__b"), "left_semi")
    val tot = keptBaskets.agg(count(lit(1)).as("__nb"))
    val itemCounts = kept.groupBy(col("__i"))
      .agg(count(lit(1)).as("__nc"))
    val pairs = kept.select(col("__b"), col("__i").as("__ia"))
      .join(kept.select(col("__b"), col("__i").as("__ib")),
        Seq("__b"))
      .filter(col("__ia") < col("__ib"))
    val pairCounts = pairs.groupBy(col("__ia"), col("__ib"))
      .agg(count(lit(1)).as("__nab"))
    val triples = pairs
      .join(kept.select(col("__b"), col("__i").as("__ic")),
        Seq("__b"))
      .filter(col("__ic") > col("__ib"))
      .groupBy(col("__ia"), col("__ib"), col("__ic"))
      .agg(count(lit(1)).as("n_abc"))
      .filter(col("n_abc") >= minSup)
    val rules = triples.select(col("n_abc"),
        explode(array(
          struct(col("__ia").as("ant_a"), col("__ib").as("ant_b"),
            col("__ic").as("cons")),
          struct(col("__ia").as("ant_a"), col("__ic").as("ant_b"),
            col("__ib").as("cons")),
          struct(col("__ib").as("ant_a"), col("__ic").as("ant_b"),
            col("__ia").as("cons")))).as("__r"))
      .select(col("__r.ant_a"), col("__r.ant_b"), col("__r.cons"),
        col("n_abc"))
    rules
      .join(pairCounts.select(col("__ia").as("ant_a"),
        col("__ib").as("ant_b"), col("__nab").as("n_ant")),
        Seq("ant_a", "ant_b"))
      .join(itemCounts.select(col("__i").as("cons"),
        col("__nc").as("n_cons")), Seq("cons"))
      .crossJoin(broadcast(tot))
      .select(col("ant_a"), col("ant_b"), col("cons"), col("n_abc"),
        col("n_ant"), col("n_cons"), col("__nb").as("n_baskets"),
        // Mirrored integer micro ratios — covisitation's idiom. The
        // lift product 1e6·n_abc·n_baskets outgrows a Long at
        // web-basket scale (~9.2e12 on the product), so it runs in
        // decimal(38,0) (HUGEINT in the oracle twin); the quotient is
        // a bounded micro-lift and lands back in a long.
        expr("(1000000L * n_abc) div n_ant").as("conf_micro"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * n_abc * n_baskets) " +
          "div (CAST(n_ant AS DECIMAL(38,0)) * n_cons)")
          .as("lift_micro"))
  }
}
