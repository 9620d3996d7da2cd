package graft.operators

import graft.SparkSpec

/** Hand-sized fixtures for the preference family: a 2-player BT
  * match where the MLE is exact (p = 3/4 ⇒ weights 1.5 / 0.5), the
  * win-rate Wilson readout, and pass@k against the closed-form
  * C(n−c,k)/C(n,k) numbers. */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("bradleyTerry: two-player exact MLE, zero-win pin, games census") {
    // A beats B 3x, B beats A 1x, C loses to A twice: W_A=5, W_B=1.
    val m = Seq(
      ("A", "B"), ("A", "B"), ("A", "B"), ("B", "A"),
      ("A", "C"), ("A", "C"))
      .toDF("winner", "loser")
    val got = Preference.bradleyTerry(m, "winner", "loser", iters = 5)
      .collect().map(r => r.getAs[String]("player") -> r).toMap
    assert(got("A").getAs[Long]("n_wins") == 5L)
    assert(got("A").getAs[Long]("n_games") == 6L)
    assert(got("B").getAs[Long]("n_games") == 4L)
    assert(got("C").getAs[Long]("n_games") == 2L)
    // C lost everything: MLE weight is 0, exactly.
    assert(got("C").getAs[Long]("bt_micro") == 0L)
    // With C pinned at 0, A-vs-B converges to the 2-player MLE where
    // w_A/(w_A+w_B) = 3/4 — i.e. w_A = 3·w_B (within micro rounding
    // of the normalized scale).
    val wa = got("A").getAs[Long]("bt_micro").toDouble
    val wb = got("B").getAs[Long]("bt_micro").toDouble
    assert(wb > 0 && math.abs(wa / wb - 3.0) < 0.01, s"wa=$wa wb=$wb")
    // Normalization: Σw = 3 players × 1e6 micro.
    assert(math.abs(wa + wb + 0.0 - 3e6) < 5.0)
  }

  test("bradleyTerry: ties and self-matches dropped, null-safe") {
    val m = Seq(
      (Some("A"), Some("B")), (Some("A"), Some("A")),
      (None, Some("B")), (Some("B"), None))
      .toDF("winner", "loser")
    val got = Preference.bradleyTerry(m, "winner", "loser", iters = 2)
      .collect()
    assert(got.map(_.getAs[String]("player")).sorted.toSeq ==
      Seq("A", "B"))
    assert(got.forall(_.getAs[Long]("n_games") == 1L))
  }

  test("winRateMatrix: canonical pair, exact rate, Wilson bounds bracket") {
    val m = Seq(("A", "B"), ("A", "B"), ("A", "B"), ("B", "A"))
      .toDF("winner", "loser")
    val r = Preference.winRateMatrix(m, "winner", "loser")
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("player_a") == "A")
    assert(row.getAs[String]("player_b") == "B")
    assert(row.getAs[Long]("n_games") == 4L)
    assert(row.getAs[Long]("n_wins_a") == 3L)
    assert(row.getAs[Long]("p_micro") == 750000L)
    val lo = row.getAs[Long]("lo_micro")
    val hi = row.getAs[Long]("hi_micro")
    assert(lo > 0L && lo < 750000L && hi > 750000L && hi < 1000000L)
  }

  test("passAtK: closed-form values, degenerate edges, k > n absent") {
    // task t1: n=4, c=2 → pass@1 = 1/2, pass@2 = 1 − C(2,2)/C(4,2)
    // = 5/6; pass@3 and pass@4 saturate at 1 (n−c=2 < k).
    // task t0: n=3, c=0 → always 0. k=5 > n: absent for both.
    val df = Seq(
      ("t1", true), ("t1", true), ("t1", false), ("t1", false),
      ("t0", false), ("t0", false), ("t0", false))
      .toDF("task", "ok")
    val got = Preference.passAtK(df, "task", "ok", Seq(1, 2, 3, 4, 5))
      .collect()
      .map(r => (r.getAs[String]("task"), r.getAs[Long]("k")) ->
        r.getAs[Long]("pass_micro")).toMap
    assert(got(("t1", 1L)) == 500000L)
    assert(got(("t1", 2L)) == 833333L)
    assert(got(("t1", 3L)) == 1000000L)
    assert(got(("t1", 4L)) == 1000000L)
    assert(!got.contains(("t1", 5L)))
    assert(got(("t0", 1L)) == 0L && got(("t0", 3L)) == 0L)
    assert(!got.contains(("t0", 4L)))
  }
}
