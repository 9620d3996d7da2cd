package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hllDistinct estimates within design error and is insensitive to duplication") {
    val base = (1 to 400).map(i => ("g", s"key_$i"))
    // Heavy duplication: every key appears 5×; distinct count unchanged.
    val dup = Seq.fill(5)(base).flatten
    val df = dup.toDF("grp", "k")
    val out = rows(Sketches.hllDistinct(df, col("k"), Seq("grp")))
    assert(out.size == 1)
    val est = out.head.getAs[Double]("estimate")
    // m=64 ⇒ σ ≈ 13%; 3σ bound keeps the test deterministic-safe
    // (the sketch itself is fully deterministic given the key set).
    assert(math.abs(est - 400.0) / 400.0 < 0.4, s"estimate $est too far from 400")

    val once = rows(Sketches.hllDistinct(base.toDF("grp", "k"), col("k"), Seq("grp")))
    assert(once.head.getAs[Double]("estimate") == est,
      "estimate must depend only on the distinct key set")
  }

  test("hllDistinct registers merge across partitionings (repartition-invariant)") {
    val df = (1 to 300).map(i => (s"g${i % 3}", s"k$i")).toDF("grp", "k")
    val a = sortedRows(Sketches.hllDistinct(df, col("k"), Seq("grp")))
    val b = sortedRows(Sketches.hllDistinct(df.repartition(17), col("k"), Seq("grp")))
    assert(a == b, "two-level aggregation must be partition-order invariant")
  }

  test("small exact cardinalities produce distinct register states") {
    val df = Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("grp", "k")
    val out = rows(Sketches.hllDistinct(df, col("k"), Seq("grp")))
      .map(r => r.getAs[String]("grp") -> r.getAs[Long]("harmonic_q55")).toMap
    // Group a saw {x, y}, group b saw {x}: harmonic sums must differ.
    assert(out("a") != out("b"))
  }

  test("lh bucket encode/decode: exact below 16, ≤12.5% relative above") {
    val vals = (Seq(0L, 1L, 15L, 16L, 17L, 31L, 32L, 100L, 1000L) ++
      Seq(123456789L, Long.MaxValue / 2)).toDF("v")
    val out = vals.select(col("v"), Sketches.lhBucketIdx(col("v")).as("idx"))
      .select(col("v"), col("idx"), Sketches.lhBucketLo(col("idx")).as("lo"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    for ((v, _, lo) <- out) {
      assert(lo <= v, s"lower bound $lo must not exceed $v")
      if (v < 16) assert(lo == v, s"small values are exact, got $lo for $v")
      else assert((v - lo).toDouble / lo <= 0.125 + 1e-12,
        s"relative error too high: v=$v lo=$lo")
    }
    // Bucket boundaries land exactly where the encoding says.
    val m = out.map(t => t._1 -> t._2).toMap
    assert(m(15L) == 15 && m(16L) == 16 && m(31L) == 23 && m(32L) == 24)
  }

  test("lhBuckets sum-merge across splits == one pass; negative raises") {
    val all = (1L to 500L).map(v => ("g", v * v % 997)).toDF("grp", "v")
    val onePass = sortedRows(Sketches.lhBuckets(all, col("v"), Seq("grp")))
    val merged = sortedRows(
      Sketches.lhBuckets(all.filter(col("v") < 300), col("v"), Seq("grp"))
        .unionByName(
          Sketches.lhBuckets(all.filter(col("v") >= 300), col("v"), Seq("grp")))
        .groupBy(col("grp"), col("idx")).agg(sum(col("cnt")).as("cnt")))
    assert(onePass == merged, "bucket counts must sum-merge exactly")
    val neg = intercept[Exception] {
      Sketches.lhBuckets(Seq(("g", -1L)).toDF("grp", "v"), col("v"),
        Seq("grp")).collect()
    }
    assert(neg.getMessage != null)
  }

  test("count-min: sum-merge == one pass; estimates only over-count") {
    // Exact count of token t_i is i % 7 + 1; ~800 occurrences total.
    val occ = (1 to 200).flatMap(i => Seq.fill(i % 7 + 1)(("g", s"t$i")))
      .toDF("grp", "k")
    val onePass = sortedRows(Sketches.cmRegisters(occ, col("k"), Seq("grp")))
    val merged = sortedRows(
      Sketches.cmRegisters(occ.limit(300), col("k"), Seq("grp"))
        .unionByName(Sketches.cmRegisters(
          occ.exceptAll(occ.limit(300)), col("k"), Seq("grp")))
        .groupBy(col("grp"), col("j"), col("b"))
        .agg(sum(col("cnt")).as("cnt")))
    assert(onePass == merged, "counter sum-merge must equal one pass")

    val state = Sketches.cmRegisters(occ, col("k"), Seq("grp"))
    val keys = occ.distinct()
    val est = Sketches.cmEstimate(state, keys, "k", Seq("grp"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    for (i <- 1 to 200) {
      val exact = i % 7 + 1L
      val e = est(s"t$i")
      assert(e >= exact, s"CM must never under-count: t$i $e < $exact")
      assert(e <= exact + 24, s"over-count implausibly high for t$i: $e")
    }
    // A key the state never saw estimates ~0 (over-count only).
    val unseen = Sketches.cmEstimate(state,
      Seq(("g", "never_seen_zzz")).toDF("grp", "k"), "k", Seq("grp"))
      .collect().head.getLong(2)
    assert(unseen >= 0L && unseen <= 24L)
  }

  test("hllOverlapEstimate: union via max-merge, intersection by I-E") {
    // a = 1..400, b = 201..600 → true |a|=|b|=400, |a∪b|=600, |a∩b|=200.
    val df = ((1 to 400).map(i => ("a", s"k$i")) ++
      (201 to 600).map(i => ("b", s"k$i"))).toDF("grp", "k")
    val regs = Sketches.hllRegisters(df, col("k"), Seq("grp"))
    val out = rows(Sketches.hllOverlapEstimate(regs, "grp"))
    assert(out.size == 1)
    val r = out.head
    assert(r.getAs[String]("a") == "a" && r.getAs[String]("b") == "b")
    val (ea, eb, eu, ei) = (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
      r.getAs[Double]("est_union"), r.getAs[Double]("est_intersection"))
    // m=64 ⇒ σ≈13%; generous 3σ-ish bands keep this deterministic-safe.
    assert(math.abs(ea - 400) / 400.0 < 0.4, s"est_a $ea")
    assert(math.abs(eb - 400) / 400.0 < 0.4, s"est_b $eb")
    assert(math.abs(eu - 600) / 600.0 < 0.4, s"est_union $eu")
    assert(ei == ea + eb - eu)
    assert(ei > 0 && ei < 450, s"est_intersection $ei far from 200")
    // A bucket seen by only ONE group must carry its rank into the
    // union: the union estimate can never exceed est_a + est_b, and
    // with disjoint sets intersection ≈ 0, union ≈ sum.
    val disjoint = ((1 to 300).map(i => ("a", s"x$i")) ++
      (1 to 300).map(i => ("b", s"y$i"))).toDF("grp", "k")
    val d = rows(Sketches.hllOverlapEstimate(
      Sketches.hllRegisters(disjoint, col("k"), Seq("grp")), "grp")).head
    val frac = d.getAs[Double]("est_intersection") /
      d.getAs[Double]("est_union")
    assert(math.abs(frac) < 0.25, s"disjoint sets estimated $frac overlap")
  }

  test("bloom: OR-merge == one pass; absent keys are exact, members always hit") {
    val members = (1 to 2000).map(i => ("g", s"k$i")).toDF("grp", "k")
    val onePass = sortedRows(Sketches.bloomBits(members, col("k"), Seq("grp")))
    val merged = sortedRows(
      Sketches.bloomBits(members.filter(col("k") < "k5"), col("k"), Seq("grp"))
        .unionByName(Sketches.bloomBits(
          members.filter(col("k") >= "k5"), col("k"), Seq("grp")))
        .groupBy(col("grp"), col("w"))
        .agg(expr("bit_or(bits)").as("bits")))
    assert(onePass == merged, "word OR-merge must equal one pass")

    val state = Sketches.bloomBits(members, col("k"), Seq("grp"))
    // Every member must report might = true (no false negatives, ever).
    val hits = Sketches.bloomMightContain(state, members.distinct(), "k",
        Seq("grp"))
      .collect()
    assert(hits.length == 2000 && hits.forall(_.getBoolean(2)))
    // 2000 keys in 2^20 bits, 3 probes: false-positive odds per probe
    // set ~2e-7 — 2000 non-members must all report false.
    val absent = (1 to 2000).map(i => ("g", s"absent$i")).toDF("grp", "k")
    val miss = Sketches.bloomMightContain(state, absent, "k", Seq("grp"))
      .collect()
    assert(miss.count(_.getBoolean(2)) == 0, "expected zero false positives")
    // bloomPrefilter keeps exactly the members of a mixed frame.
    val mixed = members.unionByName(absent)
    val kept = Sketches.bloomPrefilter(mixed, state, "k", Seq("grp"))
    assert(kept.count() == 2000L)
  }

  test("probe multiplicity survives cmEstimate and bloomMightContain") {
    // A weighted probe frame (the same key several times) must come
    // back with one VERDICT PER ROW, not one per distinct key — the
    // sketch math runs per distinct key and joins back.
    val occ = Seq.fill(5)(("g", "hot")).toDF("grp", "k")
    val cmState = Sketches.cmRegisters(occ, col("k"), Seq("grp"))
    val probes = (Seq.fill(3)(("g", "hot")) :+ ("g", "cold"))
      .toDF("grp", "k")
    val est = Sketches.cmEstimate(cmState, probes, "k", Seq("grp"))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(est.length == 4, s"4 probe rows in, 4 rows out: got ${est.length}")
    assert(est.count(_._1 == "hot") == 3)
    assert(est.filter(_._1 == "hot").forall(_._2 >= 5L))

    val blState = Sketches.bloomBits(occ, col("k"), Seq("grp"))
    val might = Sketches.bloomMightContain(blState, probes, "k", Seq("grp"))
      .collect().map(r => (r.getString(1), r.getBoolean(2)))
    assert(might.length == 4)
    assert(might.count(p => p._1 == "hot" && p._2) == 3)
  }

  test("NULL-group probes survive and hit the NULL-group state") {
    // A NULL group is a real group: its registers exist in the state,
    // and a probe with a NULL group must match them (null-safe joins)
    // — neither vanish from the output nor estimate "never seen".
    val occ = (Seq.fill(4)((Option.empty[String], "t")) :+
      ((Some("g"), "t"))).toDF("grp", "k")
    val cmState = Sketches.cmRegisters(occ, col("k"), Seq("grp"))
    val probes = Seq((Option.empty[String], "t"), (Some("g"), "t"))
      .toDF("grp", "k")
    val est = Sketches.cmEstimate(cmState, probes, "k", Seq("grp"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(2))).toMap
    assert(est.size == 2, "both probe rows must survive")
    assert(est(None) >= 4L, "NULL-group probe must hit its registers")
    assert(est(Some("g")) >= 1L)

    val blState = Sketches.bloomBits(occ, col("k"), Seq("grp"))
    val might = Sketches.bloomMightContain(blState,
        Seq((Option.empty[String], "t"), (Option.empty[String], "zz"))
          .toDF("grp", "k"), "k", Seq("grp"))
      .collect().map(r => r.getString(1) -> r.getBoolean(2)).toMap
    assert(might == Map("t" -> true, "zz" -> false))
  }

  test("lhQuantiles tracks exact quantiles within the bucket width") {
    // 1..1000 uniform: true p50=500, p90=900, p99=990.
    val df = (1L to 1000L).map(v => ("g", v)).toDF("grp", "v")
    val out = rows(Sketches.lhQuantileEstimate(df, col("v"), Seq("grp"),
        Seq(0.5, 0.9, 0.99)))
      .map(r => r.getAs[Double]("q") ->
        (r.getAs[Long]("n"), r.getAs[Long]("value"))).toMap
    for ((q, (n, est)) <- out) {
      val truth = math.ceil(q * 1000).toLong
      assert(n == 1000L)
      assert(est <= truth && (truth - est).toDouble / est <= 0.125 + 1e-12,
        s"q=$q est=$est truth=$truth")
    }
  }

  test("mgMergeSummaries: sums, subtracts the (k+1)-th weight, keeps " +
      "k positives; no-op under k entries") {
    import spark.implicits._
    // Union of two k=2 summaries: x 5+2=7, y 3, z 4 → 3rd largest is
    // 3 → x→4, z→1 survive, y→0 drops.
    val u = Seq(("g", "x", 5L), ("g", "y", 3L), ("g", "x", 2L),
      ("g", "z", 4L)).toDF("k", "item", "wt")
    val got = Sketches.mgMergeSummaries(u, Seq("k"), 2)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(got == Map("x" -> 4L, "z" -> 1L))
    // Already within k: identity.
    val small = Seq(("g", "x", 5L), ("g", "y", 3L)).toDF("k", "item", "wt")
    val id = Sketches.mgMergeSummaries(small, Seq("k"), 2)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(id == Map("x" -> 5L, "y" -> 3L))
  }

  test("kmv: exact when unfilled, intersection scaling, filled accuracy") {
    // Unfilled sketches are exact: |A| = 3, |B| = 3, A∩B = {b, c}.
    val df = Seq(("A", "a"), ("A", "b"), ("A", "c"),
      ("B", "b"), ("B", "c"), ("B", "d")).toDF("g", "w")
    val est = Sketches.kmvEstimate(
      Sketches.kmvSketch(df, col("w"), Seq("g"), 8), Seq("g"), 8)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(est("A").getAs[Long]("n_kept") == 3L)
    assert(est("A").getAs[Double]("estimate") == 3.0)
    assert(est("B").getAs[Double]("estimate") == 3.0)
    val p = Sketches.kmvIntersectPairs(df, col("w"), "g", 8)
      .collect().head
    assert(p.getAs[String]("group_a") == "A")
    assert(p.getAs[Long]("n_kept") == 4L)
    assert(p.getAs[Long]("n_both") == 2L)
    assert(p.getAs[Double]("est_union") == 4.0)
    assert(p.getAs[Double]("est_intersect") == 2.0)
    // Filled sketches estimate within KMV error bars (~1/√(k−1)):
    // |C| = |D| = 300, |C∩D| = 150, k = 32.
    val big = ((1 to 300).map(i => ("C", s"x$i")) ++
      (151 to 450).map(i => ("D", s"x$i"))).toDF("g", "w")
    val bp = Sketches.kmvIntersectPairs(big, col("w"), "g", 32)
      .collect().head
    val u = bp.getAs[Double]("est_union")
    val i = bp.getAs[Double]("est_intersect")
    assert(u > 250 && u < 750, s"union est $u for true 450")
    assert(i > 40 && i < 400, s"intersect est $i for true 150")
  }

  test("amsF2: exact twin, single-key exactness, err wiring") {
    // "solo" has one distinct key repeated n=4 times: every sketch
    // is Z = ±4, so Z² = 16 = F2 exactly — estimates and errors pin.
    val rows = Seq.fill(4)(("solo", "x")) ++
      Seq.fill(3)(("mix", "a")) ++ Seq.fill(2)(("mix", "b")) ++
      Seq(("mix", "c"))
    val got = Sketches.amsF2(rows.toDF("g", "k"), "g", "k")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val solo = got("solo")
    // f2/est_mean/est_mom accumulate DECIMAL(38,0) and report as
    // canonical decimal strings (hash-stable gate output type).
    assert(solo.getAs[String]("f2") == "16")
    assert(solo.getAs[String]("est_mean") == "16")
    assert(solo.getAs[String]("est_mom") == "16")
    assert(solo.getAs[Long]("err_mean_micro") == 0L)
    assert(solo.getAs[Long]("err_mom_micro") == 0L)
    // mix: F2 = 9 + 4 + 1 = 14; Z = ±3±2±1 so Z² <= 36 and the
    // estimates stay inside the algebraic envelope.
    val mix = got("mix")
    assert(mix.getAs[String]("f2") == "14")
    val em = mix.getAs[String]("est_mean").toLong
    assert(em >= 0L && em <= 36L, s"est_mean $em")
    assert(mix.getAs[Long]("err_mean_micro") ==
      math.round(1e6 * math.abs(em - 14.0) / 14.0))
  }
}
