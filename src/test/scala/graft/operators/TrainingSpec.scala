package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrainingSpec extends SparkSpec {
  import spark.implicits._

  test("sequencePack: contiguous start-offset packing per group") {
    // 4 docs of 3 tokens each, budget 5: start offsets 0,3,6,9 →
    // packs 0,0,1,1. Group g2 packs independently from offset 0.
    val docs = Seq(
      (1L, "a b c", "g1"), (2L, "d e f", "g1"),
      (3L, "g h i", "g1"), (4L, "j k l", "g1"),
      (5L, "m n o", "g2"))
      .toDF("doc_id", "text", "source")
    val out = Training.sequencePack(docs, "doc_id", "text", "source", 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(out == Set(
      ("g1", 1L, 0L), ("g1", 2L, 0L), ("g1", 3L, 1L), ("g1", 4L, 1L),
      ("g2", 5L, 0L)))
  }

  test("contamination: containment of train 3-grams in the eval corpus") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),   // shares 'the quick brown'+'quick brown fox' with eval
      (2L, "совершенно unrelated text here now"),
      (3L, "hi"))                          // too short to shingle → dropped
      .toDF("doc_id", "text")
    val eval = Seq((100L, "the quick brown fox")).toDF("doc_id", "text")
    val out = Training.contamination(train, eval, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc1: shingles {the quick brown, quick brown fox, brown fox jumps}
    // — 2 of 3 contaminated.
    assert(out(1L) == ((3L, 2L, 0.666667)))
    assert(out(2L)._2 == 0L && out(2L)._3 == 0.0)
    assert(!out.contains(3L))
  }

  test("piiScrub replaces emails, phones, and long digit runs") {
    val docs = Seq(
      (1L, "mail me at jane.doe+x@corp.example.org today"),
      (2L, "call 555-123-4567 or 555-12-34 acct 123456789"),
      (3L, "clean text with short 123 numbers"))
      .toDF("doc_id", "text")
    val out = Training.piiScrub(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(out(1L) == (("mail me at <EMAIL> today", true)))
    // 555-12-34 is not phone-shaped; 123456789 is a 9-digit run.
    assert(out(2L) == (("call <PHONE> or 555-12-34 acct <ID>", true)))
    assert(out(3L) == (("clean text with short 123 numbers", false)))
  }

  test("ruleFilter: reasons in RuleNames order, keep iff no rule fires") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away home"),
      (2L, "tiny"),                       // <10 tokens AND no stopwords
      (3L, "the " * 20),                  // repetitive (1 distinct / 20)
      (4L, "the num 123456 4512 9 88 77 66 55 44 digits everywhere 1 2 3"))
      .toDF("doc_id", "text")
    val out = Training.ruleFilter(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getBoolean(3))).toMap
    assert(out(1L) == (("", true)))
    // Violated rules join comma-separated in fixed RuleNames order.
    assert(out(2L) == (("too_short,low_stopword", false)))
    assert(out(3L)._1.contains("repetitive") && !out(3L)._2)
    assert(out(4L)._1 == "digit_heavy" && !out(4L)._2)
  }

  test("importanceResample: per-row rate, deterministic, monotone in rate") {
    val docs = (1L to 1000L).map(i => (i, if (i % 2 == 0) 80 else 10))
      .toDF("doc_id", "rate_percent")
    val kept = Training.importanceResample(docs, "doc_id", col("rate_percent"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val (hi, lo) = kept.partition(_._2 == 80)
    // ~80% of evens, ~10% of odds survive; exact counts are stable.
    assert(hi.length > 300 && lo.length < 120 && kept.nonEmpty)
    // Re-run keeps the identical membership (no RNG anywhere).
    val again = Training.importanceResample(docs, "doc_id", col("rate_percent"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(kept.sorted.sameElements(again.sorted))
    // A row kept at rate r is kept at any higher rate (bucket < rate).
    val bumped = Training.importanceResample(
      docs.withColumn("rate_percent", col("rate_percent") + 15),
      "doc_id", col("rate_percent"))
      .collect().map(_.getLong(0)).toSet
    assert(kept.map(_._1).toSet.subsetOf(bumped))
  }

  test("repetitionSignals: repeated phrase dominates; clean text stays low; short docs 0.0") {
    val docs = Seq(
      (1L, "buy now " * 10),               // one bigram everywhere
      (2L, "the quick brown fox jumps over a lazy dog near the river bank"),
      (3L, "solo"))                        // no 2-grams at all
      .toDF("doc_id", "text")
    val out = Training.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(out(1L)._1 > 0.4 && out(1L)._2 > 0.8 && out(1L)._3)
    assert(out(2L)._1 < 0.2 && !out(2L)._3)
    assert(out(3L) == ((0.0, 0.0, false)))
  }

  test("mixtureRebalance: over-represented sources thin, under-target keep 100%") {
    // big: 100 docs x 10 tokens = 1000 tokens; small: 5 docs = 50.
    val docs = ((1L to 100L).map(i => (i, "t " * 10, "big")) ++
      (101L to 105L).map(i => (i, "t " * 10, "small")))
      .toDF("doc_id", "text", "source")
    val weights = Seq(("big", 1), ("small", 1)).toDF("source", "weight")
    // Budget 400: big's target = 200 of its 1000 tokens → 20%; small's
    // 200 target exceeds its 50 available → capped at 100%.
    val out = Training.mixtureRebalance(docs, "doc_id", "text", "source",
      weights, budgetTokens = 400L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val bySrc = out.groupBy(_._2)
    assert(bySrc("small").length == 5)            // all kept, rate 100
    assert(bySrc("small").forall(_._3 == 100))
    assert(bySrc("big").forall(_._3 == 20))
    val n = bySrc("big").length                   // ~20 of 100, hash-exact
    assert(n > 5 && n < 40)
    // Deterministic: identical membership on re-run.
    val again = Training.mixtureRebalance(docs, "doc_id", "text", "source",
      weights, budgetTokens = 400L).collect().map(_.getLong(0)).toSet
    assert(again == out.map(_._1).toSet)
  }

  test("mixtureRebalance: huge weight × huge budget does not overflow to a negative rate") {
    // weight 2e9 × budget 1e11 × 100 = 2e22 ≫ Long.MaxValue — the
    // pre-fix BIGINT product wrapped negative and silently dropped the
    // whole source. In double math the rate caps cleanly at 100.
    val docs = (1L to 10L).map(i => (i, "t " * 10, "big"))
      .toDF("doc_id", "text", "source")
    val weights = Seq(("big", 2000000000)).toDF("source", "weight")
    val out = Training.mixtureRebalance(docs, "doc_id", "text", "source",
      weights, budgetTokens = 100000000000L)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(out.length == 10)                  // nothing dropped
    assert(out.forall(_._2 == 100))           // capped, not negative
  }

  test("mixtureRebalance fails loudly on weights-table gaps and zero-token sources") {
    // Spark wraps the executor-side raise_error; search the cause chain.
    def fullMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val docs = Seq((1L, "some text here", "covered"),
      (2L, "more text", "uncovered")).toDF("doc_id", "text", "source")
    val onlyOne = Seq(("covered", 1)).toDF("source", "weight")
    val e1 = intercept[Exception] {
      Training.mixtureRebalance(docs, "doc_id", "text", "source",
        onlyOne, budgetTokens = 100L).collect()
    }
    assert(fullMsg(e1).contains("no row in the weights table"))
    // A source whose docs tokenize to nothing has no defined rate.
    val empties = Seq((1L, "words", "ok"), (2L, "", "void"))
      .toDF("doc_id", "text", "source")
    val both = Seq(("ok", 1), ("void", 1)).toDF("source", "weight")
    val e2 = intercept[Exception] {
      Training.mixtureRebalance(empties, "doc_id", "text", "source",
        both, budgetTokens = 100L).collect()
    }
    assert(fullMsg(e2).contains("zero tokens"))
    // All-zero weights: rate would be 0/0 = NaN, and least(100, NaN)
    // returns 100 — keeping everything silently. Must fail instead.
    val zeros = Seq(("covered", 0)).toDF("source", "weight")
    val e3 = intercept[Exception] {
      Training.mixtureRebalance(docs.filter(col("source") === "covered"),
        "doc_id", "text", "source", zeros, budgetTokens = 100L).collect()
    }
    assert(fullMsg(e3).contains("weights sum to <= 0"))
    // A negative weight yields a negative rate that silently drops the
    // source via the bucket filter. Must fail instead.
    val neg = Seq(("covered", -1), ("uncovered", 3)).toDF("source", "weight")
    val e4 = intercept[Exception] {
      Training.mixtureRebalance(docs, "doc_id", "text", "source",
        neg, budgetTokens = 100L).collect()
    }
    assert(fullMsg(e4).contains("negative weight"))
    // A NULL source never matches the weights join; the error message
    // must still name it rather than degrade to raise_error(NULL).
    val nullSrc = Seq((1L, "text here", Option("covered")),
      (2L, "more text", Option.empty[String])).toDF("doc_id", "text", "source")
    val e5 = intercept[Exception] {
      Training.mixtureRebalance(nullSrc, "doc_id", "text", "source",
        onlyOne, budgetTokens = 100L).collect()
    }
    assert(fullMsg(e5).contains("'<null>' has no row"))
    // A REAL source literally named "<null>" must not pool with NULL
    // rows (prefix-disjoint key encoding): covered "<null>" keeps its
    // own rate while the genuine NULL still fails the coverage gate.
    val weird = Seq((1L, "text here now", "<null>"),
      (2L, "more text", Option.empty[String].orNull))
      .toDF("doc_id", "text", "source")
    val covered = Seq(("<null>", 1)).toDF("source", "weight")
    val e6 = intercept[Exception] {
      Training.mixtureRebalance(weird, "doc_id", "text", "source",
        covered, budgetTokens = 100L).collect()
    }
    assert(fullMsg(e6).contains("has no row"))
    val onlyWeird = Training.mixtureRebalance(
      weird.filter(col("source").isNotNull), "doc_id", "text", "source",
      covered, budgetTokens = 100L).collect()
    assert(onlyWeird.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("ruleFilter carry columns pass through; reserved names refuse") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog today",
      "web")).toDF("doc_id", "text", "source")
    val out = Training.ruleFilter(docs, "doc_id", "text",
      carry = Seq("source"))
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_tokens", "reasons", "source", "keep"))
    assert(out.collect().head.getAs[String]("source") == "web")
    intercept[IllegalArgumentException] {
      Training.ruleFilter(docs, "doc_id", "text", carry = Seq("keep"))
    }
    intercept[IllegalArgumentException] {
      Training.ruleFilter(docs, "doc_id", "text",
        carry = Seq("source", "source"))
    }
  }

  test("perplexityCurriculum buckets follow NLL order within each source") {
    val docs = Seq(
      (1L, "a b a b a b", "s1"), (2L, "a b x q", "s1"), (3L, "z z z", "s1"),
      (4L, "a b", "s2"), (5L, "w w", "s2"), (6L, "solo", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Training.perplexityCurriculum(docs, "doc_id", "text", "source")
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getDouble(2),
        r.getLong(3), r.getInt(4)))
    // Doc 6 has no bigram → no row; everything else ranked.
    assert(out.map(_._2).toSet == Set(1L, 2L, 3L, 4L, 5L))
    // Within a source, bucket is non-decreasing in rank and rank
    // follows ascending nll.
    for ((_, grp) <- out.groupBy(_._1)) {
      val byRank = grp.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1L to grp.length).toSeq)
      assert(byRank.map(_._3).toSeq == byRank.map(_._3).sortBy(identity).toSeq)
      assert(byRank.map(_._5).toSeq == byRank.map(_._5).sorted.toSeq)
    }
    // size-3 source cuts into exact tertiles; size-2 into 0,1.
    assert(out.filter(_._1 == "s1").map(_._5).sorted.toSeq == Seq(0, 1, 2))
    assert(out.filter(_._1 == "s2").map(_._5).sorted.toSeq == Seq(0, 1))
  }

  test("decontaminate drops only over-threshold docs; short docs survive") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),   // 2/3 shingles contaminated
      (2L, "totally unrelated words in here"),
      (3L, "hi"))                          // can't shingle → must survive
      .toDF("doc_id", "text")
    val eval = Seq((100L, "the quick brown fox")).toDF("doc_id", "text")
    val kept = Training.decontaminate(train, eval, "doc_id", "text",
      shingleSize = 3, maxContainment = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
    // Threshold at 0.7 lets doc 1 (containment 0.667) back through.
    val lax = Training.decontaminate(train, eval, "doc_id", "text",
      shingleSize = 3, maxContainment = 0.7)
      .collect().map(_.getLong(0)).toSet
    assert(lax == Set(1L, 2L, 3L))
  }

  test("epochShuffle: complete per-shard permutations that differ across epochs") {
    val docs = (1L to 200L).map(i => (i, "x")).toDF("doc_id", "text")
    def run(epoch: Int) = Training.epochShuffle(docs, "doc_id", 4, epoch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val e1 = run(1); val e2 = run(2)
    // Same shard membership (shard is epoch-independent)…
    assert(e1.map(t => t._1 -> t._2).toMap == e2.map(t => t._1 -> t._2).toMap)
    // …each shard's positions are exactly 1..n…
    for (g <- e1.groupBy(_._2).values)
      assert(g.map(_._3).sorted.sameElements(1L to g.length))
    // …and the epoch salt actually permutes differently.
    assert(e1.map(t => t._1 -> t._3).toMap != e2.map(t => t._1 -> t._3).toMap)
    // Re-running an epoch reproduces it exactly.
    assert(run(2).sortBy(_._1).sameElements(e2.sortBy(_._1)))
  }

  test("shardAssign is deterministic, in-range, and spreads docs") {
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val shards = Training.shardAssign(docs, "doc_id", 8)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(shards.values.forall(s => s >= 0 && s < 8))
    // Deterministic across invocations.
    val again = Training.shardAssign(docs, "doc_id", 8)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(shards == again)
    // md5 spreads: every shard is hit at 200 docs / 8 shards.
    assert(shards.values.toSet.size == 8)
  }

  test("packByLength bins by caller-supplied cost; sequencePack is its token form") {
    import org.apache.spark.sql.functions.col
    val sized = Seq(
      ("s", 1L, 100L), ("s", 2L, 100L), ("s", 3L, 100L), ("s", 4L, 50L))
      .toDF("grp", "id", "cost")
    // Budget 250: starts at 0,100,200,300 → packs 0,0,0,1.
    val out = Training.packByLength(sized, "id", "cost", "grp", 250)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
    // The length column keeps its caller-facing name.
    assert(Training.packByLength(sized, "id", "cost", "grp", 250)
      .columns.toSeq == Seq("grp", "id", "cost", "pack_id"))
    // sequencePack == packByLength on whitespace token counts.
    val docs = Seq(("s", 1L, "a b c"), ("s", 2L, "d e")).toDF(
      "grp", "id", "text")
    val viaText = Training.sequencePack(docs, "id", "text", "grp", 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaText == Set((1L, 3L, 0L), (2L, 2L, 0L)))
  }

  test("qualityEnsemble: repeated junk outscores clean text; integer mix is stable") {
    val clean = "the quick brown fox jumps over the lazy dog " * 3
    val spam = "click here buy now " * 8
    val docs = (1L to 4L).map(i => (i, clean)) :+ ((9L, spam))
    val out = Training.qualityEnsemble(
        docs.toDF("doc_id", "text"), "doc_id", "text", dfThreshold = 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(5)).toMap
    // The spam doc's repetition terms dominate every clean doc's score.
    assert((1L to 4L).forall(i => out(9L) > out(i)))
    // Deterministic integer mix: re-run is bit-identical.
    val again = Training.qualityEnsemble(
        docs.toDF("doc_id", "text"), "doc_id", "text", dfThreshold = 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(again == out)
  }

  test("hashedTfidfVectors: integer long-form vectors, deterministic, idf-scaled") {
    val docs = Seq(
      (1L, "x x x"),          // tf=3 of a df=1 token
      (2L, "y"),              // unrelated
      (3L, "x y"))            // shares both
      .toDF("doc_id", "text")
    val out = Training.hashedTfidfVectors(docs, "doc_id", "text", dims = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // n_docs=3. x: df=2 → idf=len(bin(1))=1; y: df=2 → idf=1.
    // Doc 1: one dim, |v| = 3·1.
    val d1 = out.filter(_._1._1 == 1L)
    assert(d1.size == 1 && math.abs(d1.head._2) == 3L)
    // Doc 2: one dim, |v| = 1.
    val d2 = out.filter(_._1._1 == 2L)
    assert(d2.size == 1 && math.abs(d2.head._2) == 1L)
    // Doc 3 carries both tokens; hash60(x) ≠ hash60(y) mod 64 here
    // or they share a dim — either way total mass is conserved per
    // token: the multiset of |v| sums to 2 across its rows iff no
    // cancellation, and determinism holds regardless.
    val again = Training
      .hashedTfidfVectors(docs, "doc_id", "text", dims = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(again == out)
    // Zero rows never appear for docs with no tokens.
    val empty = Training.hashedTfidfVectors(
      Seq((9L, "")).toDF("doc_id", "text"), "doc_id", "text", 64)
    assert(empty.count() == 0L)
  }

  test("temperatureMixRates: 16:1 at alpha 0.5 gives the exact 4:1 split") {
    // n^0.5: 16 -> 4 (4000001 micro: ln quantizes to 2772589, and
    // exp(1.3862945) = 4.0000006 — the BETWEEN-steps quantization is
    // the contract, not algebra on the unquantized reals); 1 -> 1.
    // Shares still land on clean 4/5, 1/5 micros.
    val df = ((1 to 16).map(i => (s"d$i", "big")) ++
      Seq(("x", "small"))).toDF("doc_id", "source")
    val got = Training.temperatureMixRates(df, "source", alpha = 0.5)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(got("big").getAs[Long]("n_docs") == 16L)
    assert(got("big").getAs[Long]("rate_micro") == 4000001L)
    assert(got("small").getAs[Long]("rate_micro") == 1000000L)
    assert(got("big").getAs[Long]("share_micro") == 800000L)
    assert(got("small").getAs[Long]("share_micro") == 200000L)
    // alpha = 1 reproduces raw proportions exactly.
    val prop = Training.temperatureMixRates(df, "source", alpha = 1.0)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("share_micro")).toMap
    assert(prop("big") == 941176L && prop("small") == 58824L)
  }

  test("strideInterleave: 2:1 rates give the evenly-spread A B A A B A order") {
    val docs = Seq(
      ("A", 1L), ("A", 2L), ("A", 3L), ("A", 4L),
      ("B", 1L), ("B", 2L),
      ("C", 9L)) // no rate row -> absent from the schedule
      .toDF("source", "doc_id")
    val rates = Seq(("A", 2000000L), ("B", 1000000L))
      .toDF("source", "rate_micro")
    val got = Training.strideInterleave(docs, "source", "doc_id", rates)
      .orderBy("order_idx").collect()
    // vt: A at (2i-1)*250000, B at (2i-1)*500000.
    assert(got.map(r => (r.getAs[String]("source"),
      r.getAs[Long]("doc_id"))).toSeq ==
      Seq(("A", 1L), ("B", 1L), ("A", 2L), ("A", 3L), ("B", 2L),
        ("A", 4L)))
    assert(got.map(_.getAs[Long]("order_idx")).toSeq ==
      (1L to 6L).toSeq)
    assert(got.head.getAs[Long]("vt_micro") == 250000L)
    assert(got(1).getAs[Long]("vt_micro") == 500000L)
  }
}
