package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // (zip, age, diagnosis) — the textbook quasi-identifier shape.
  private def people = Seq(
    ("02138", 29, "a"), ("02138", 29, "b"), ("02138", 29, "c"),
    ("02139", 31, "a"), ("02139", 32, "b"),
    ("94305", 45, "c")).toDF("zip", "age", "dx")

  test("kAnonymityClasses: class sizes and verdicts") {
    val out = Privacy.kAnonymityClasses(
        people, Seq(col("zip"), col("age")), k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1),
        r.getLong(2), r.getBoolean(3))).toSet
    assert(out == Set(
      ("02138", 29, 3L, true),
      ("02139", 31, 1L, false),
      ("02139", 32, 1L, false),
      ("94305", 45, 1L, false)))
  }

  test("kAnonymityClasses: NULL quasi values form a real class") {
    val df = Seq((Some("a"), 1), (None, 1), (None, 1)).toDF("zip", "age")
    val out = Privacy.kAnonymityClasses(df, Seq(col("zip"), col("age")), 2)
      .collect().map(r => (Option(r.getString(0)), r.getLong(2))).toSet
    assert(out == Set((Some("a"), 1L), (None, 2L)))
  }

  test("generalizationLadder: coarser levels cost less suppression") {
    val ladder = Privacy.generalizationLadder(people, Seq(
      0 -> Seq(col("zip").as("z"), col("age").as("a")),
      1 -> Seq(col("zip").as("z"), lit(null).cast("int").as("a")),
      2 -> Seq(lit(null).cast("string").as("z"),
        lit(null).cast("int").as("a"))), k = 3)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // L0: classes {3,1,1,1} → 3 sub-k classes, 3 rows suppressed.
    assert(ladder(0) == (6L, 4L, 3L, 3L))
    // L1: zip-only classes {3,2,1} → two sub-k classes, 3 rows.
    assert(ladder(1) == (6L, 3L, 2L, 3L))
    // L2: everything in one class of 6 → nothing suppressed.
    assert(ladder(2) == (6L, 1L, 0L, 0L))
  }

  test("generalizationLadder is one scan: a single gather shuffle pair") {
    val plan = Privacy.generalizationLadder(people, Seq(
      0 -> Seq(col("zip").as("z")),
      1 -> Seq(lit(null).cast("string").as("z"))), k = 2)
      .queryExecution.executedPlan.toString
    // One explode (Generate), no join, no union of per-level scans.
    assert(!plan.contains("Union"), s"ladder re-scanned per level:\n$plan")
    assert(plan.contains("Generate"), s"expected one explode:\n$plan")
  }

  test("luhnValid: known PANs pass, off-by-one fails, junk is false") {
    val cases = Seq(
      ("4111111111111111", true), ("4012888888881881", true),
      ("79927398713", true),            // the canonical Luhn example
      ("4111111111111112", false), ("79927398710", false),
      ("", false), ("41x1", false))
    val got = cases.toDF("d", "expect")
      .select(Privacy.luhnValid(col("d")).as("ok"), col("expect"))
      .collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), r))
    // NULL input → false, not NULL.
    val n = Seq(Tuple1(null: String)).toDF("d")
      .select(Privacy.luhnValid(col("d")).as("ok")).collect()(0)
    assert(!n.isNullAt(0) && !n.getBoolean(0))
  }

  test("panCandidates: maximal runs only; over/under-length excluded") {
    val df = Seq(
      (1L, "a 4111111111111111 b 123 c 12345678901234567890 d"),
      (2L, "4012888888881881")).toDF("id", "t")
    val got = Privacy.panCandidates(df, "id", "t")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getBoolean(3))).toSet
    // Row 1: three runs; only the 16-digit one is a candidate, at
    // run index 0. Row 2: bare PAN with no separators.
    assert(got == Set((1L, 0, "4111111111111111", true),
      (2L, 0, "4012888888881881", true)))
  }

  test("scrubPans: valid PANs replaced even adjacent; invalid survive") {
    val df = Seq(
      (1L, "x 4111111111111111 4111111111111111 y"), // one-space adjacency
      (2L, "keep 4111111111111112 and 12345678901234567890"),
      (3L, "edge 4012888888881881")).toDF("id", "t")
    val got = Privacy.scrubPans(df, "id", "t")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("scrubbed")).toMap
    assert(got(1L) == "x [PAN] [PAN] y")
    assert(got(2L) == "keep 4111111111111112 and 12345678901234567890")
    assert(got(3L) == "edge [PAN]")
  }

  test("dpCounts: seeded noise is reproducible, tag-sensitive, clamped") {
    import spark.implicits._
    val df = (Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq("c"))
      .toDF("g")
    def release(tag: String) =
      Privacy.dpCounts(df, Seq("g"), epsilon = 1.0, tag = tag)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val r1 = release("epoch-1")
    // Same tag → the identical published table (no RNG anywhere).
    assert(release("epoch-1") == r1)
    // A release epoch rotates the noise: some cell must move.
    assert(release("epoch-2") != r1)
    // Laplace(1) noise stays sane and counts never go negative.
    assert(r1.values.forall(_ >= 0L))
    assert(math.abs(r1("a") - 40L) < 30L && math.abs(r1("b") - 25L) < 30L)
  }

  test("dpCounts: a NULL group is a real (coalesced) cell") {
    import spark.implicits._
    val df = Seq(Some("x"), None, None).toDF("g")
    val got = Privacy.dpCounts(df, Seq("g"), 1.0, "t")
    assert(got.count() == 2L)
  }

  test("lDiversity: uniform class hits ln(n); single-value class is 0") {
    // class A: 4 rows over 2 values evenly -> H = ln 2 = 0.693147
    // class B: 3 rows all one value -> l = 1, H = 0
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "y"), ("A", "y"),
      ("B", "x"), ("B", "x"), ("B", "x")).toDF("q", "s")
    val got = Privacy.lDiversity(df, Seq("q"), "s").collect()
      .map(r => r.getAs[String]("q") -> r).toMap
    assert(got("A").getAs[Long]("l_distinct") == 2L)
    assert(got("A").getAs[Long]("entropy_mnat") == 693147L)
    assert(got("B").getAs[Long]("l_distinct") == 1L)
    assert(got("B").getAs[Long]("entropy_mnat") == 0L)
  }

  test("tCloseness: population-mix class scores 0, skewed class > 0") {
    // global: x:4, y:4 over N=8. class M mirrors the mix (t = 0);
    // class S is all-x: t = (|2*8-4*2| + 2*(8-4)) / (2*2*8) = 1/2
    val df = Seq(
      ("M", "x"), ("M", "x"), ("M", "y"), ("M", "y"),
      ("S", "x"), ("S", "x"),
      ("O", "y"), ("O", "y")).toDF("q", "s")
    val got = Privacy.tCloseness(df, Seq("q"), "s").collect()
      .map(r => r.getAs[String]("q") -> r.getAs[Long]("t_micro")).toMap
    assert(got("M") == 0L)
    assert(got("S") == 500000L)
    assert(got("O") == 500000L)
  }

  test("ibanCandidates: mod-97 verdicts, shape filter, index advance") {
    val df = Seq(
      // canonical valid + one-digit-off invalid in one row: two runs
      (1L, "pay GB82WEST12345698765432 or GB82WEST12345698765433 x"),
      // German canonical (digits only after the check) — valid
      (2L, "ref DE89370400440532013000 done"),
      // shape-fail (digit-led), then a valid run: idx must be 1
      (3L, "a 1234567890ABCDE then GB82WEST12345698765432 b"),
      (4L, "no candidates at all"))
      .toDF("doc_id", "raw")
    val got = Privacy.ibanCandidates(df, "doc_id", "raw").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("cand_idx")) ->
        (r.getAs[String]("cand"), r.getAs[Boolean]("iban_ok"))).toMap
    assert(got((1L, 0)) == ("GB82WEST12345698765432", true))
    assert(got((1L, 1)) == ("GB82WEST12345698765433", false))
    assert(got((2L, 0)) == ("DE89370400440532013000", true))
    // run 0 is the shape-fail (absent); the valid run keeps idx 1
    assert(got((3L, 1)) == ("GB82WEST12345698765432", true))
    assert(!got.keys.exists(_._1 == 4L))
    assert(got.size == 4)
  }

  test("randomizedResponse: Warner debias and widened CI") {
    import org.apache.spark.sql.functions.lit
    // 40/100 observed positives under p = .25: pi = (.4-.25)/.5 = .3,
    // se = sqrt(.4*.6/100)/.5.
    val df = (1 to 100).map(i => ("g", i <= 40)).toDF("g", "obs")
    val r = Privacy.randomizedResponse(df, "g", "obs", 0.25)
      .collect().head
    assert(r.getAs[Long]("n") == 100L && r.getAs[Long]("n_pos") == 40L)
    assert(r.getAs[Long]("pi_micro") == 300000L)
    val se = math.sqrt(0.4 * 0.6 / 100.0) / 0.5
    assert(r.getAs[Long]("ci_lo_micro") ==
      math.round(1e6 * (0.3 - 1.96 * se)))
    assert(r.getAs[Long]("ci_hi_micro") ==
      math.round(1e6 * (0.3 + 1.96 * se)))
    // All-positive observations push pi past 1 — reported raw.
    val hot = Seq(("h", true), ("h", true)).toDF("g", "obs")
    val h = Privacy.randomizedResponse(hot, "g", "obs", 0.25)
      .collect().head
    assert(h.getAs[Long]("pi_micro") == 1500000L)
  }
}
