package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("groupRank matches window row_number exactly when groups span partitions") {
    // 7 groups × ~71 rows over 13 range partitions — every group
    // crosses several partition boundaries.
    val df = (1L to 500L).map(i => (s"src${i % 7}", i * 37 % 101, i))
      .toDF("source", "score", "id")
    val got = Ranking.groupRank(df, "source", Seq("score", "id"),
        numPartitions = 13)
      .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getLong(3))
      .toMap
    val w = Window.partitionBy(col("source")).orderBy(col("score"), col("id"))
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(got == want)
  }

  test("groupLag matches window lag exactly when groups span partitions") {
    // 7 groups × ~71 rows over 13 range partitions — every group
    // crosses several boundaries, so the head/tail repair join does
    // real work for both lag depths; NULL payloads mixed in to pin
    // the NULL-predecessor vs NULL-valued-predecessor distinction.
    val df = (1L to 500L).map(i => (s"src${i % 7}", i * 37 % 101, i,
        if (i % 11 == 0) null else java.lang.Long.valueOf(i * 3)))
      .toDF("source", "score", "id", "v")
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(2))
    def payload(r: org.apache.spark.sql.Row, i: Int) =
      if (r.isNullAt(i)) null else r.getLong(i)
    val got = Ranking.groupLag(df, "source", Seq("score", "id"),
        Seq("v"), lags = 2, numPartitions = 13)
      .collect().map(r => key(r) -> (payload(r, 4), payload(r, 5)))
      .toMap
    val w = Window.partitionBy(col("source")).orderBy(col("score"), col("id"))
    val want = df
      .withColumn("v_lag1", lag(col("v"), 1).over(w))
      .withColumn("v_lag2", lag(col("v"), 2).over(w))
      .collect().map(r => key(r) -> (payload(r, 4), payload(r, 5)))
      .toMap
    assert(got == want)
  }

  test("groupLag repairs boundaries when every partition holds one row") {
    // numPartitions far above the row count: (pid, group) blocks are
    // single rows, so EVERY lag crosses a boundary — the repair path
    // carries the whole answer.
    val df = (1L to 40L).map(i => (s"g${i % 2}", i, i * 7))
      .toDF("g", "id", "v")
    val got = Ranking.groupLag(df, "g", Seq("id"), Seq("v"), 2,
        numPartitions = 64)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))
      .toMap
    (1L to 40L).foreach { i =>
      val g = s"g${i % 2}"
      val want1 = if (i > 2) (i - 2) * 7 else -1L
      val want2 = if (i > 4) (i - 4) * 7 else -1L
      assert(got((g, i)) == ((want1, want2)),
        s"row $g/$i expected ($want1, $want2) got ${got((g, i))}")
    }
  }

  test("groupRank survives a downstream coalesce(1) — pid is data, not task id") {
    // Verify's sink coalesces every result to one task; a rank built
    // on TaskContext partition ids collapses to pid 0 there and
    // either crashes or mis-ranks. The pid column is frozen at
    // checkpoint time, so stage fusion downstream must not matter.
    val df = (1L to 200L).map(i => (s"g${i % 3}", i * 13 % 47, i))
      .toDF("source", "score", "id")
    val got = Ranking.groupRank(df, "source", Seq("score", "id"),
        numPartitions = 7)
      .coalesce(1)
      .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getLong(3))
      .toMap
    val w = Window.partitionBy(col("source")).orderBy(col("score"), col("id"))
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(got == want)
  }

  test("groupQuantiles picks the exact ⌈q·n⌉-th value per group") {
    // Group a: values 1..100 → p50=50, p90=90, p99=99 (ceil semantics).
    // Group b: values 10,20,30 → p50=ceil(1.5)=2nd=20, p90=ceil(2.7)=3rd=30,
    // p99=ceil(2.97)=3rd=30.
    val df = ((1L to 100L).map(i => ("a", i, i)) ++
      Seq(("b", 10L, 201L), ("b", 20L, 202L), ("b", 30L, 203L)))
      .toDF("source", "v", "id")
    val out = Ranking.groupQuantiles(df, "source", "v", "id",
        Seq(0.5, 0.9, 0.99))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      ("a", 0.5) -> 50L, ("a", 0.9) -> 90L, ("a", 0.99) -> 99L,
      ("b", 0.5) -> 20L, ("b", 0.9) -> 30L, ("b", 0.99) -> 30L))
  }

  test("a NULL group is ranked like any other group, never dropped") {
    val df = Seq((Some("a"), 1L, 1L), (Some("a"), 2L, 2L),
      (None, 5L, 3L), (None, 3L, 4L), (None, 4L, 5L))
      .toDF("source", "score", "id")
    val ranked = Ranking.groupRank(df, "source", Seq("score", "id"),
      numPartitions = 3)
    assert(ranked.count() == 5L)
    val nulls = ranked.filter(col("source").isNull)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(nulls == Map(3L -> 1L, 4L -> 2L, 5L -> 3L))
    val q = Ranking.groupQuantiles(df, "source", "score", "id", Seq(1.0))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(2)).toMap
    assert(q == Map(Some("a") -> 2L, None -> 5L))
  }

  test("NULL values are excluded from quantiles; winsorize keeps them NULL") {
    // Under Spark's NULLS FIRST ordering an unfiltered rank would make
    // p50 of group a a NULL (and DuckDB's NULLS LAST would disagree);
    // quantiles must come from the 3 non-null values only.
    val df = Seq(("a", Some(10L), 1L), ("a", None, 2L), ("a", Some(20L), 3L),
      ("a", Some(30L), 4L), ("a", None, 5L), ("b", None, 6L))
      .toDF("source", "v", "id")
    val q = Ranking.groupQuantiles(df, "source", "v", "id", Seq(0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2))
      .toMap
    // n = 3 non-null: p50 = 2nd = 20, p100 = 30. All-NULL group b vanishes.
    assert(q == Map(("a", 0.5) -> 20L, ("a", 1.0) -> 30L))
    val w = Ranking.winsorize(df, "source", "v", "id",
        loQ = 0.5, hiQ = 1.0)
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    // least/greatest skip NULL operands — a NULL value must stay NULL,
    // not clip to a bound — and the ALL-NULL group b keeps its row
    // (left-joined bounds), it does not silently vanish.
    assert(w == Map(1L -> Some(20L), 2L -> None, 3L -> Some(20L),
      4L -> Some(30L), 5L -> None, 6L -> None))
    val z = Ranking.robustZScores(df, "source", "v", "id")
    assert(z.count() == 6L, "all-NULL group rows must survive robust-z too")
  }

  test("robustZScores: exact median/MAD, outlier-proof, zero-MAD yields null") {
    // Group a: values 1..5 plus outlier 1000 → med = value at ⌈3⌉rd = 3,
    // devs {2,1,0,1,2,997} → mad = ⌈3⌉rd of sorted devs {0,1,1,2,2,997} = 1.
    // Group b: all equal → mad 0 → z null.
    val df = (Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 5L),
      ("a", 1000L)) ++ Seq(("b", 7L), ("b", 7L), ("b", 7L)))
      .zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
      .toDF("source", "v", "id")
    val out = Ranking.robustZScores(df, "source", "v", "id")
      .collect().map(r => (r.getString(0), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    assert(out(("a", 3L)) == ((3L, 1L, Some(0.0))))
    assert(out(("a", 1000L)) == ((3L, 1L, Some(997.0))))
    assert(out(("a", 1L)) == ((3L, 1L, Some(-2.0))))
    assert(out(("b", 7L)) == ((7L, 0L, None)))
  }

  test("robustZScores: window-selected MAD == brute-force k-th smallest deviation") {
    // Shapes that stress the contiguous-window identity: duplicates
    // straddling the median, even sizes, a singleton, and a group
    // whose k smallest deviations are NOT unique as a rank set.
    val data = Seq(
      "e" -> Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0),  // even n, mad 1
      "t" -> Seq(1.0, 3.0, 3.0, 8.0, 9.0),        // dup at median, mad 2
      "d" -> Seq(2.0, 4.0, 4.0, 4.0, 7.0),        // mad 0 via dups
      "s" -> Seq(5.0))                            // singleton, mad 0
    val df = data.flatMap { case (g, vs) => vs.map(g -> _) }
      .zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
      .toDF("g", "v", "id")
    val out = Ranking.robustZScores(df, "g", "v", "id")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    for ((g, vs0) <- data) {
      val vs = vs0.sorted
      val k = math.ceil(vs.length / 2.0).toInt
      val med = vs(k - 1)
      val mad = vs.map(v => math.abs(v - med)).sorted.apply(k - 1)
      assert(out(g) == ((med, mad)), s"group $g")
    }
  }

  test("groupRunningSum: exact inclusive prefix sums across partition boundaries") {
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("a", 4L, 40L), ("b", 1L, 5L), ("b", 2L, 7L))
      .toDF("g", "id", "v")
    // numPartitions = 3 forces group a to SPAN range partitions, so
    // the offset census actually carries subtotals across them.
    val out = Ranking.groupRunningSum(df, "g", Seq("id"), "v",
        numPartitions = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
      .toMap
    assert(out == Map(("a", 1L) -> 10L, ("a", 2L) -> 30L,
      ("a", 3L) -> 60L, ("a", 4L) -> 100L,
      ("b", 1L) -> 5L, ("b", 2L) -> 12L))
  }

  test("winsorize clips into the exact per-group [p05, p95] band") {
    val df = (1L to 100L).map(i => ("a", i, i)).toDF("source", "v", "id")
    val out = Ranking.winsorize(df, "source", "v", "id")
      .collect()
      .map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // lo = ⌈0.05·100⌉ = 5th value = 5; hi = ⌈0.95·100⌉ = 95th = 95.
    assert(out(1L) == ((5L, 95L, 5L)))
    assert(out(100L) == ((5L, 95L, 95L)))
    assert(out(50L) == ((5L, 95L, 50L)))
    assert(out(5L) == ((5L, 95L, 5L)) && out(95L) == ((5L, 95L, 95L)))
  }

  test("groupTopK matches window row_number top-k across partition layouts") {
    // 7 groups × ~140 rows, scores collide heavily (mod 23) so the
    // tiebreaker field does real work; repartition(5) forces partial
    // buffers on several mappers per group before the merge.
    val df = (1L to 1000L).map(i => (s"src${i % 7}", i * 37 % 23, i))
      .toDF("source", "score", "id").repartition(5)
    val got = Ranking.groupTopK(df, Seq("source"),
        Seq((-col("score")).as("__neg"), col("id"), col("score")), k = 4)
      .select(col("source"), col("rank"), col("id"), col("score"))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 4)
      .collect().map(r => (r.getString(0), r.getInt(3)) ->
        (r.getLong(2), r.getLong(1))).toMap
    assert(got == want)
  }

  test("groupTopK: k larger than the group returns the whole group sorted") {
    val df = Seq(("a", 3L, 1L), ("a", 1L, 2L), ("b", 5L, 3L))
      .toDF("g", "v", "id")
    val got = Ranking.groupTopK(df, Seq("g"), Seq(col("v"), col("id")), k = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(got.sorted.toSeq ==
      Seq(("a", 1, 1L), ("a", 2, 3L), ("b", 1, 5L)))
  }

  test("groupTopK: string sort fields order binary, NULL keys excluded") {
    // String keys compare binary (Spark ORDER BY semantics). A NULL
    // primary sort key is EXCLUDED before the aggregate: struct
    // comparison is NULLS FIRST, so under the negate-for-descending
    // idiom an un-scored row would otherwise silently rank ahead of
    // every scored one — the inverse of the orderBy(desc) windows
    // groupTopK replaces.
    val df = Seq(("a", "zebra", 1L), ("a", "apple", 2L), ("a", null, 3L))
      .toDF("g", "w", "id")
    val got = Ranking.groupTopK(df, Seq("g"), Seq(col("w"), col("id")), k = 2)
      .collect().map(r => (r.getInt(1), Option(r.getString(2)), r.getLong(3)))
    assert(got.sortBy(_._1).toSeq ==
      Seq((1, Some("apple"), 2L), (2, Some("zebra"), 1L)))
  }

  test("groupBuckets: integer-exact equal-frequency bands, uneven groups") {
    val df = ((1L to 4L).map(i => ("a", i, i)) ++
      (1L to 90L).map(i => ("b", i, 100L + i))).toDF("source", "score", "id")
    val out = Ranking.groupBuckets(df, "source", Seq("score", "id"), 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(3), r.getInt(4)))
    // size-4 group: (rank-1)*3 div 4 → 0,0,1,2.
    assert(out.filter(_._1 == "a").sortBy(_._2).map(_._3).toSeq ==
      Seq(0, 0, 1, 2))
    // size-90 group: exact thirds.
    val b = out.filter(_._1 == "b")
    assert(b.groupBy(_._3).view.mapValues(_.length).toMap ==
      Map(0 -> 30, 1 -> 30, 2 -> 30))
    assert(b.filter(_._3 == 0).map(_._2).max == 30L)
  }

  test("apportionLargestRemainder: exact total, remainder order, ties") {
    // budget 10 over weights 1/1/1 → base 3 each, leftover 1 goes to
    // the smallest key (all remainders tie at 1/3).
    val eq = Ranking.apportionLargestRemainder(
      Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("k", "w"), "k", "w", 10L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(eq == Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
    // budget 100 over 2/3/5 divides exactly: no remainder units.
    val ex = Ranking.apportionLargestRemainder(
      Seq(("x", 2L), ("y", 3L), ("z", 5L)).toDF("k", "w"), "k", "w", 100L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ex == Map("x" -> 20L, "y" -> 30L, "z" -> 50L))
    // Skewed: 7/2/1 over 10 → quotas 7.0/2.0/1.0 exact again; make it
    // inexact with budget 11 → quotas 7.7/2.2/1.1, bases 7/2/1,
    // leftover 1 → largest remainder .7 wins.
    val sk = Ranking.apportionLargestRemainder(
      Seq(("p", 7L), ("q", 2L), ("r", 1L)).toDF("k", "w"), "k", "w", 11L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(sk == Map("p" -> 8L, "q" -> 2L, "r" -> 1L))
    assert(sk.values.sum == 11L)
    // Zero-weight keys are excluded, never allocated.
    val z = Ranking.apportionLargestRemainder(
      Seq(("a", 5L), ("dead", 0L)).toDF("k", "w"), "k", "w", 7L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(z == Map("a" -> 7L))
  }

  test("groupAuc: perfect/inverted/tied separation, single-class NULL") {
    import spark.implicits._
    val df = Seq(
      // A: score orders the classes perfectly → AUC 1.
      ("A", 1L, 0), ("A", 2L, 0), ("A", 3L, 1), ("A", 4L, 1),
      // B: inverted → 0.
      ("B", 1L, 1), ("B", 2L, 1), ("B", 3L, 0), ("B", 4L, 0),
      // C: one tie block holding both classes → exactly 0.5.
      ("C", 5L, 1), ("C", 5L, 0),
      // D: single-class → NULL.
      ("D", 1L, 1), ("D", 2L, 1))
      .toDF("g", "score", "y")
    val got = Ranking.groupAuc(df, "g", "score", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getLong(3)))).toMap
    assert(got("A") == ((2L, 2L, 1000000L)))
    assert(got("B") == ((2L, 2L, 0L)))
    assert(got("C") == ((1L, 1L, 500000L)))
    assert(got("D") == ((2L, 0L, null)))
  }

  test("spearman: monotone ±1 through ties, classic 0.5 permutation, " +
      "constant side NULL") {
    import spark.implicits._
    val df = Seq(
      ("A", 1L, 10L), ("A", 2L, 20L), ("A", 3L, 30L),   // +1
      ("B", 1L, 30L), ("B", 2L, 20L), ("B", 3L, 10L),   // −1
      ("P", 1L, 2L), ("P", 2L, 1L), ("P", 3L, 3L),      // ρ of (2,1,3)
      ("T", 1L, 1L), ("T", 2L, 3L), ("T", 2L, 3L), ("T", 3L, 5L), // ties
      ("C", 1L, 5L), ("C", 1L, 7L))                     // constant x
      .toDF("g", "x", "y")
    val got = Ranking.spearman(df, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2)))).toMap
    assert(got("A") == ((3L, 1000000L)))
    assert(got("B") == ((3L, -1000000L)))
    assert(got("P") == ((3L, 500000L)))
    assert(got("T") == ((4L, 1000000L)))  // tie blocks align exactly
    assert(got("C") == ((2L, null)))
  }

  test("rbo: identical lists score the full table, disjoint 0, " +
      "hand-computed partial overlap") {
    import spark.implicits._
    // (p=0.9, k=3): S = [172000, 72000, 27000]; identical ⇒ Σ = 271000.
    assert(Ranking.rboSuffixMicro(0.9, 3) == Seq(172000L, 72000L, 27000L))
    val a = Seq(("q", "x", 1), ("q", "y", 2), ("q", "z", 3),
      ("d", "a", 1), ("only_a", "a", 1)).toDF("query", "item", "rank")
    val b = Seq(("q", "y", 1), ("q", "x", 2), ("q", "w", 3),
      ("d", "b", 1)).toDF("query", "item", "rank")
    val same = Ranking.rbo(a, a, "query", "item", "rank", 3, 0.9)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(same("q") == 271000L && same("d") == 172000L)
    val got = Ranking.rbo(a, b, "query", "item", "rank", 3, 0.9)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // x and y both enter the intersection at depth 2 ⇒ 2·S(2).
    assert(got("q") == ((2L, 144000L)))
    assert(got("d") == ((0L, 0L)))          // disjoint, still reported
    assert(!got.contains("only_a"))          // one-sided query absent
  }

  test("rankEval: hand-computed NDCG@3, unreturned relevance costs " +
      "through IDCG, no-relevant query is NULL-honest") {
    import spark.implicits._
    // Discounts at k=3: 1e6, 630930, 500000.
    assert(Ranking.dcgDiscountsMicro(3) == Seq(1000000L, 630930L, 500000L))
    val results = Seq(
      ("q", "a", 1), ("q", "c", 2), ("q", "b", 3),
      ("z", "x", 1)).toDF("query", "item", "rank")
    val truth = Seq(
      ("q", "a", 2L), ("q", "b", 1L), ("q", "c", 0L), ("q", "d", 3L),
      ("z", "x", 0L)).toDF("query", "item", "rel")
    val got = Ranking.rankEval(results, truth, "query", "item", "rank",
        "rel", k = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) null else r.getLong(4),
          if (r.isNullAt(5)) null else r.getLong(5),
          r.getLong(6)))).toMap
    // dcg = 2·1e6 + 0 + 1·500000; idcg over (d:3, a:2, b:1) =
    // 3e6 + 2·630930 + 500000 = 4761860; ndcg = round(525004.5…) —
    // the half rounds UP.
    assert(got("q") == ((2500000L, 4761860L, 525005L, 1000000L, 666667L)))
    assert(got("z") == ((0L, 0L, null, null, 0L)))
  }

  test("reliabilityBins + calibrationError: exact bin math, top edge " +
      "clamps, n-weighted ECE") {
    import spark.implicits._
    val df = Seq(
      (0L, 1), (199999L, 0),    // bin 0: mean 100000, rate 500000
      (600000L, 0),             // bin 3: mean 600000, rate 0
      (1000000L, 1))            // score 1.0 clamps into bin 4
      .toDF("score_micro", "y")
    val bins = graft.operators.Profile.reliabilityBins(
      df, "score_micro", "y", bins = 5)
    val got = bins.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0L) == ((2L, 100000L, 500000L, 400000L)))
    assert(got(3L) == ((1L, 600000L, 0L, 600000L)))
    assert(got(4L) == ((1L, 1000000L, 1000000L, 0L)))
    val ece = graft.operators.Profile.calibrationError(bins).head()
    assert(ece.getLong(0) == 4L && ece.getLong(1) == 350000L)
  }

  test("kendallTau: perfect orders, ties corrected, all-tied NULL") {
    val df = Seq(
      // G: perfectly concordant -> tau 1.
      ("G", 1.0, 1.0, 1L), ("G", 2.0, 2.0, 2L), ("G", 3.0, 3.0, 3L),
      // R: perfectly discordant -> tau -1.
      ("R", 1.0, 3.0, 1L), ("R", 2.0, 2.0, 2L), ("R", 3.0, 1.0, 3L),
      // T: one x-tie -> cd 2, tau = 2/sqrt(2*3).
      ("T", 1.0, 1.0, 1L), ("T", 1.0, 2.0, 2L), ("T", 2.0, 3.0, 3L),
      // X: x fully tied -> NULL.
      ("X", 5.0, 1.0, 1L), ("X", 5.0, 2.0, 2L))
      .toDF("g", "x", "y", "id")
    val got = Ranking.kendallTau(df, "g", "x", "y", "id")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("G").getAs[Long]("cd") == 3L &&
      got("G").getAs[Long]("tau_micro") == 1000000L)
    assert(got("R").getAs[Long]("tau_micro") == -1000000L)
    val t = got("T")
    assert(t.getAs[Long]("cd") == 2L)
    assert(t.getAs[Long]("tau_micro") ==
      math.round(1e6 * 2.0 / (math.sqrt(2.0) * math.sqrt(3.0))))
    val x = got("X")
    assert(x.isNullAt(x.fieldIndex("tau_micro")))
  }

  test("kendallTau: maxN truncates in id order") {
    // First 3 rows concordant; the tail would flip the sign.
    val df = Seq(
      ("K", 1.0, 1.0, 1L), ("K", 2.0, 2.0, 2L), ("K", 3.0, 3.0, 3L),
      ("K", 4.0, -10.0, 4L), ("K", 5.0, -20.0, 5L))
      .toDF("g", "x", "y", "id")
    val r = Ranking.kendallTau(df, "g", "x", "y", "id", maxN = 3).head()
    assert(r.getAs[Long]("n") == 3L &&
      r.getAs[Long]("tau_micro") == 1000000L)
  }

  test("averagePrecision: prefix purity, deterministic tie order, single-class NULL") {
    import spark.implicits._
    val df = Seq(
      // g: positives land at ranks 1 and 3 ->
      // AP = (1e6 + (2e6 div 3)) / 2 = 833333
      ("g", 1L, 4.0, true), ("g", 2L, 3.0, false),
      ("g", 3L, 2.0, true), ("g", 4L, 1.0, false),
      // t: tied scores break by id asc: positive id 6 ranks SECOND
      // -> AP = (1e6 div 2) = 500000
      ("t", 5L, 9.0, false), ("t", 6L, 9.0, true),
      ("t", 7L, 1.0, false),
      // z: single-class -> NULL
      ("z", 8L, 1.0, true), ("z", 9L, 2.0, true))
      .toDF("g", "id", "score", "y")
    val got = Ranking.averagePrecision(df, "g", "id", "score", "y")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3)))).toMap
    assert(got("g") == ((4L, 2L, 833333L)))
    assert(got("t") == ((3L, 1L, 500000L)))
    assert(got("z") == ((2L, 2L, null)))
  }
}
