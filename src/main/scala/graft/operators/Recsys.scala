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
    * Overflow: 1e6·n_ab·n_actors must stay < 2⁶³, so keep kept
    * actors below ~3·10⁶ (= √(2⁶³/1e6)) — beyond that, drop the 1e6
    * scale or pre-divide n_ab·n_actors.
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
        expr("(1000000L * n_ab * __nu) div (n_a * n_b)")
          .as("lift_micro"))
  }
}
