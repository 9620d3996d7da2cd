package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("bestMatches: blocked, scored, ranked with deterministic ties") {
    val left = Seq((1L, "b1", "kitten"), (2L, "b1", "saturday"),
      (3L, "b2", "kitten")).toDF("id", "blk", "txt")
    val right = Seq(
      (10L, "b1", "kitten"),   // dist 0 to left 1
      (11L, "b1", "mitten"),   // dist 1
      (12L, "b1", "sitting"),  // dist 3 — over maxDist 2
      (13L, "b1", "bitten"),   // dist 1 — ties 11, higher id loses
      (20L, "b2", "sunday"))   // blocked away from left 1/2
      .toDF("id", "blk", "txt")
    val out = Linkage.bestMatches(left, right, "id", "id", Seq("blk"),
      "txt", "txt", maxDist = 2, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      (1L, 1, 0, 10L),   // exact match first
      (1L, 2, 1, 11L),   // dist-1 tie: lower right id ranks 2
      (1L, 3, 1, 13L)))
    // left 2: nothing within 2 of "saturday" in b1 ("sunday" is b2);
    // left 3: b2 holds only "sunday", dist 5 from "kitten" — absent.
  }

  test("bestMatches: self-linkage needs no upstream aliasing") {
    val docs = Seq((0L, "x", "alpha beta"), (1L, "x", "alpha betz"),
      (2L, "x", "zzzzzzzzzz")).toDF("doc_id", "src", "text")
    val out = Linkage.bestMatches(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "doc_id", Seq("src"), "text", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 1L)))
  }

  test("reciprocalBest: keeps only mutual argmax pairs") {
    import spark.implicits._
    // a↔b mutual best (10); c's best is b, but b's best is a; d's
    // best is c, but c's best is b — one-sided bests all drop.
    val pairs = Seq(
      ("a", "b", 10L), ("a", "c", 8L), ("b", "c", 9L), ("c", "d", 7L))
      .toDF("l", "r", "s")
    val got = Linkage.reciprocalBest(pairs, "l", "r", "s").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    assert(got == Seq(("a", "b", 10L)))
  }

  test("reciprocalBest: score ties break to the smaller partner, " +
      "and a tie can still be mutual") {
    import spark.implicits._
    val pairs = Seq(("a", "b", 5L), ("a", "c", 5L)).toDF("l", "r", "s")
    val got = Linkage.reciprocalBest(pairs, "l", "r", "s").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    assert(got == Seq(("a", "b", 5L)))
  }

  test("jaroWinkler expression: DuckDB-pinned reference values") {
    import graft.functions.GraftExpressions
    // Values read off the oracle engine during the differential pin;
    // a formula drift (t/2.0 vs floor, boost below 0.7, prefix cap)
    // breaks one of these.
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),      // boost, prefix 3
      ("dixon", "dicksonx", 0.8133333333333332),
      ("crate", "trace", 0.7333333333333334),        // j > 0.7, prefix 0
      ("aaaaaab", "aaaaaac", 0.9428571428571428),    // prefix capped at 4
      ("ab", "abcdefghijklmnop", 0.7666666666666667), // boost just above 0.7
      ("abcd", "abxxxxxxxxxx", 0.5555555555555555),  // NO boost at j <= 0.7
      ("ab", "ba", 0.0),                              // window excludes all
      ("abc", "xyz", 0.0),
      ("same", "same", 1.0),
      ("", "a", 0.0), ("a", "", 0.0), ("", "", 0.0))
    cases.foreach { case (a, b, want) =>
      val got = GraftExpressions.JaroWinkler.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(got == want, s"jw($a, $b): got $got want $want")
    }
    // the codegen'd column path agrees with the static compute
    val df = cases.toDF("a", "b", "want")
    val rows = df.select(GraftExpressions.jaroWinkler(col("a"), col("b"))
      .as("got"), col("want")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("jwMatches: typo'd twin wins within its block, bar filters noise") {
    val left = Seq((1L, "b1", "jonathan smith"), (2L, "b1", "mary jones"),
      (3L, "b2", "acme corporation")).toDF("id", "blk", "name")
    val right = Seq(
      (10L, "b1", "jonathon smith"),   // near-twin of 1
      (11L, "b1", "completely other"), // below the bar for everyone
      (12L, "b2", "acme corp")         // prefix-heavy twin of 3
    ).toDF("id", "blk", "name")
    val got = Linkage.jwMatches(left, right, "id", "id", Seq("blk"),
        "name", "name", minSimMicro = 850000L, k = 1)
      .collect().map(r => r.getAs[Long]("left_id") ->
        r.getAs[Long]("right_id")).toMap
    assert(got == Map(1L -> 10L, 3L -> 12L))
  }

  test("editNeighborJoin: sub/ins/dup found, transposition rejected, cap drops") {
    val df = Seq(
      (1L, "abc"),   // vs 2: substitution, vs 3: insertion, vs 4: dup
      (2L, "abd"),
      (3L, "abcd"),
      (4L, "abc"),
      (5L, "ab"),    // vs 6 "ba": variants collide but Levenshtein 2
      (6L, "ba"),
      (7L, "a-string-way-over-the-eight-char-cap"))
      .toDF("id", "s")
    val got = Linkage.editNeighborJoin(df, "id", "s", maxLen = 8)
      .collect()
      .map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("right_id")) ->
        r.getAs[Long]("dist")).toMap
    assert(got((1L, 2L)) == 1L)
    assert(got((1L, 3L)) == 1L)
    assert(got((1L, 4L)) == 0L)
    assert(!got.contains((5L, 6L))) // shared variants, but distance 2
    assert(!got.keys.exists(k => k._1 == 7L || k._2 == 7L))
    // 2 vs 3 ("abd"/"abcd") is also distance 1 (insert c)
    assert(got((2L, 3L)) == 1L)
  }

  test("editNeighborJoin transpositions: adjacent swap is 1, others stay out") {
    val df = Seq(
      (1L, "abcd"),
      (2L, "bacd"),  // adjacent swap at 1-2: OSA 1
      (3L, "abdc"),  // adjacent swap at 3-4: OSA 1
      (4L, "acbd"),  // adjacent swap at 2-3: OSA 1
      (5L, "adcb"),  // vs 1: two swaps (OSA 2) — must stay out
      (6L, "cbad"),  // vs 1: NON-adjacent swap of 1↔3 (OSA 2)
      (7L, "abxd"))  // plain substitution still distance 1
      .toDF("id", "s")
    val got = Linkage.editNeighborJoin(df, "id", "s",
        transpositions = true)
      .collect()
      .map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("right_id")) ->
        r.getAs[Long]("dist")).toMap
    assert(got((1L, 2L)) == 1L)
    assert(got((1L, 3L)) == 1L)
    assert(got((1L, 4L)) == 1L)
    assert(got((1L, 7L)) == 1L)
    assert(!got.contains((1L, 5L)))
    assert(!got.contains((1L, 6L)))
    // Without the flag the swaps disappear, substitution stays.
    val plain = Linkage.editNeighborJoin(df, "id", "s")
      .collect()
      .map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("right_id")))
      .toSet
    assert(!plain.contains((1L, 2L)))
    assert(plain.contains((1L, 7L)))
  }

  test("phoneticKey: classic codes, collapse, first-code suppression") {
    val got = Seq("robert", "jackson", "tymczak", "pfister", "smith",
      "smyth", "o'brien", "ashcraft", "new", "123", "")
      .toDF("w")
      .select(col("w"), Linkage.phoneticKey(col("w")).as("code"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1)))
      .toMap
    assert(got("robert").contains("R163"))
    assert(got("jackson").contains("J250"))   // ckso collapse
    assert(got("tymczak").contains("T522"))
    assert(got("pfister").contains("P236"))   // leading pf collapse
    assert(got("smith").contains("S530"))
    assert(got("smyth").contains("S530"))     // the sound-alike pair
    assert(got("o'brien").contains("O165"))   // non-letter strip
    // Documented variant: no H/W bridge (classic would be A261).
    assert(got("ashcraft").contains("A226"))
    assert(got("new").contains("N000"))       // pad
    assert(got("123").isEmpty && got("").isEmpty)
  }

  test("phoneticBlockedPairs: sound-alikes pair, df cap drops hot keys") {
    val rows = (Seq.fill(3)("smith") ++ Seq("smyth") ++
      // three distinct words all keying B400 to trip maxDf = 2
      Seq("blue", "blah", "bell")).toDF("w")
    val got = Linkage.phoneticBlockedPairs(rows, "w", maxDf = 2)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("code") == "S530")
    assert(r.getAs[String]("word_a") == "smith")
    assert(r.getAs[String]("word_b") == "smyth")
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 1L)
  }

  test("fellegiSunterEm: two micro-rounded EM rounds match the replica") {
    import spark.implicits._
    // census: (T,T) x3, (F,F) x2, (T,F) x1 — replicated step by
    // step with exact integer likelihoods and micro rounding.
    val pairs = (Seq.fill(3)((true, true)) ++
      Seq.fill(2)((false, false)) ++ Seq((true, false)))
      .map { case (x, y) => ("all", x, y) }
      .toDF("g", "f0", "f1")
    val got = Linkage.fellegiSunterEm(pairs, "g", Seq("f0", "f1"))
      .collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))).toMap
    assert(got("f0") ==
      ((6L, 581301L, 993007L, 213592L, 581997L, 998923L, 204056L)))
    assert(got("f1") ==
      ((6L, 581301L, 849650L, 14563L, 581997L, 856836L, 3167L)))
  }
}
