package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),     // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),     // near dup of 1
    (4L, "completely different text about spark engines here"),
    (5L, "ab"))                                              // too short to shingle
    .toDF("doc_id", "text")

  test("exact dedup keeps min id as survivor and counts copies") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .filter(col("n_copies") > 1)
    val r = rows(out)
    assert(r.size == 1 && r.head.getAs[Long]("doc_id") == 1L
      && r.head.getAs[Long]("n_copies") == 2L)
  }

  test("minhash signatures are equal for identical docs, length K, short docs dropped") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 16, 3)
    val m = rows(sigs).map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(!m.contains(5L))
    assert(m(1L).length == 16)
    assert(m(1L) == m(2L))
    assert(m(1L) != m(4L))
  }

  test("minhash candidates find the exact and near dup, not the unrelated doc") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 16, 3)
    val cands = Dedup.minhashCandidates(
      Dedup.minhashBands(sigs, "doc_id", 16, 4), "doc_id")
    val pairs = rows(cands).map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhashNearDups verifies candidates with exact jaccard") {
    val out = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.99)
    val pairs = rows(out).map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("dedupIncrement: new docs drop against the corpus and earlier batch docs") {
    val text = "the quick brown fox jumps over the lazy dog"
    val corpus = Seq((100L, text)).toDF("doc_id", "text")
    val batch = Seq(
      (1L, text),                                              // dups corpus 100
      (2L, "entirely novel content about spark physical plans"),
      (3L, "entirely novel content about spark physical plans"), // dups batch 2
      (4L, "hi"))                                              // too short — keeps
      .toDF("doc_id", "text")
    val out = Dedup.dedupIncrement(batch, corpus, "doc_id", "text",
      threshold = 0.99)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out(1L) == ((false, Some(100L))))
    assert(out(2L) == ((true, None)))
    assert(out(3L) == ((false, Some(2L))))
    assert(out(4L) == ((true, None)))
  }

  test("sourceOverlap counts verified near-dup pairs per unordered source pair") {
    val srcDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "crawl_a"),
      (2L, "the quick brown fox jumps over the lazy dog", "crawl_b"), // a↔b mirror
      (3L, "the quick brown fox jumps over the lazy dog", "crawl_b"), // b-internal dup of 2
      (4L, "completely different text about spark engines here", "crawl_a"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlap(srcDocs, "doc_id", "text", "source",
      threshold = 0.99)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // Pairs: (1,2) a↔b, (1,3) a↔b, (2,3) b↔b — order-normalized.
    assert(out == Map(
      ("crawl_a", "crawl_b") -> 2L,
      ("crawl_b", "crawl_b") -> 1L))
  }

  test("simhash: identical docs equal; near dups within small hamming distance") {
    val out = Dedup.simhash32(docs, "doc_id", "text")
    val m = rows(out).map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    val ham = java.lang.Long.bitCount(m(1L) ^ m(3L))
    assert(ham <= 8, s"hamming($ham) unexpectedly large for near-dups")
    assert(m(1L) >= 0 && m(1L) <= 0xffffffffL)
  }

  test("jaccardPairs computes exact shingle-set jaccard with threshold") {
    val out = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
    val got = rows(out).map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // 1↔2 identical; 1↔3 and 2↔3 share 6 of 8 distinct shingles (0.75).
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got((1L, 2L)) == 1.0)
    assert(got((1L, 3L)) == 0.75)
    // 0.5 threshold correctly excludes the unrelated doc 4.
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("repeatedSpans merges overlapping repeated windows into maximal spans") {
    val common = "one two three four five"       // 5 shared tokens
    val d = Seq(
      (1L, s"$common alpha beta gamma"),         // span: tokens 1-5
      (2L, s"prefix words here $common tail"),   // span: tokens 4-8
      (3L, "totally unrelated text right here")) // no repeats
      .toDF("doc_id", "text")
    val out = Dedup.repeatedSpans(d, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(1L) == ((8L, 1L, 5L, 0.625)))
    assert(out(2L) == ((9L, 1L, 5L, 0.555556)))
    assert(out(3L) == ((5L, 0L, 0L, 0.0)))
    // A doc repeating ITS OWN span twice merges/counts correctly:
    // "x1..x5 x1..x5" has every 5-gram of the 10-token text repeated
    // against doc 5's copy → one maximal span covering all 10 tokens.
    val selfRep = Seq(
      (4L, "p q r s t p q r s t"),
      (5L, "p q r s t p q r s t other words"))
      .toDF("doc_id", "text")
    val out2 = Dedup.repeatedSpans(selfRep, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out2(4L) == ((1L, 10L)))
  }

  test("crossDocSpans: within-doc repetition scores zero; shared spans count") {
    val d = Seq(
      (1L, "p q r s t p q r s t"),              // pure SELF-repeat
      (2L, "one two three four five alpha"),    // shares 1-5 with doc 3
      (3L, "one two three four five beta"),
      (4L, "nothing shared over here at all"))
      .toDF("doc_id", "text")
    val cross = Dedup.crossDocSpans(d, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // Doc 1's self-repeat is invisible to the cross-doc census...
    assert(cross(1L) == ((10L, 0L, 0L, 0.0)))
    // ...but repeatedSpans (any-repeat) sees it.
    val any = Dedup.repeatedSpans(d, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(any(1L) == 10L)
    // The genuinely shared 5-token span counts in both sharers.
    assert(cross(2L) == ((6L, 1L, 5L, 0.833333)))
    assert(cross(3L) == ((6L, 1L, 5L, 0.833333)))
    assert(cross(4L) == ((6L, 0L, 0L, 0.0)))
  }

  test("sentenceDedup: first (doc,pos) occurrence wins, '. ' re-join, full dups vanish") {
    val d = Seq(
      (1L, "alpha beta. gamma delta. alpha beta"), // trailing repeat of own pos 1
      (2L, "gamma delta. epsilon zeta"),           // pos 1 seen in doc 1
      (3L, "alpha beta. gamma delta"),             // every sentence seen → vanishes
      (4L, ""))                                    // empty split artifact only
      .toDF("doc_id", "text")
    val out = Dedup.sentenceDedup(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // doc 1 keeps pos 1+2 but not its own later duplicate at pos 3.
    assert(out(1L) == ((2L, "alpha beta. gamma delta")))
    // doc 2's 'gamma delta' lost to doc 1 (earlier in global order).
    assert(out(2L) == ((1L, "epsilon zeta")))
    assert(!out.contains(3L) && !out.contains(4L))
  }

  test("canonicalSurvivors: quality beats id; singletons are their own cluster") {
    // Docs 1/2/3 form one near-dup cluster; give doc 3 the top score
    // so quality overrides dedupCorpus's min-id pick. Docs 4 and 5
    // have no near-dups (5 can't even shingle): singleton clusters.
    val scored = docs.withColumn("score",
      when(col("doc_id") === 3L, 100L).otherwise(col("doc_id") * 10L))
    val out = Dedup.canonicalSurvivors(scored, "doc_id", "text", "score")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out == Map(
      1L -> ((3L, 3L)),   // cluster {1,2,3}: doc 3's score 100 wins
      4L -> ((4L, 1L)),
      5L -> ((5L, 1L))))
  }

  test("canonicalSurvivors: NULL scores lose; all-NULL clusters fall back to min id") {
    // Doc 1 has no score — it must NOT win its cluster (Spark's
    // ascending struct order would otherwise sort NULL -score first);
    // docs 4/5 are unscored singletons and elect themselves.
    val scored = docs.withColumn("score",
      when(col("doc_id") === 1L, lit(null).cast("long"))
        .when(col("doc_id") === 2L, 50L)
        .when(col("doc_id") === 3L, 100L))
    val out = Dedup.canonicalSurvivors(scored, "doc_id", "text", "score")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out == Map(
      1L -> ((3L, 3L)),   // scored member beats the NULL-scored one
      4L -> ((4L, 1L)),
      5L -> ((5L, 1L))))
  }

  test("boilerplateStrip: per-group census, order kept, all-boiler doc survives") {
    import org.apache.spark.sql.functions.col
    // Group A: "nav bar" in 2 of 3 docs -> boilerplate at minDocs=2.
    // "rare line" appears once in A and once in B — 1 doc per GROUP,
    // so a per-group census keeps it (a global one would strip it).
    // Doc 4 is pure boilerplate: survives with n_kept = 0, empty text.
    val docs = Seq(
      (1L, "A", "nav bar. alpha body. rare line"),
      (2L, "A", "beta body. nav bar"),
      (3L, "A", "gamma only"),
      (4L, "A", "nav bar"),
      (5L, "B", "nav bar. rare line"))
      .toDF("id", "grp", "text")
    val out = Dedup.boilerplateStrip(docs, "id", "grp", "text", minDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(out == Map(
      1L -> ((2L, 1L, "alpha body. rare line")),
      2L -> ((1L, 1L, "beta body")),
      3L -> ((1L, 0L, "gamma only")),
      4L -> ((0L, 1L, "")),
      // B has one "nav bar" doc — below minDocs IN ITS GROUP, kept.
      5L -> ((2L, 0L, "nav bar. rare line"))))
    // A doc repeating a sentence internally counts as ONE doc in the
    // census (repetition is Gopher's signal, not boilerplate).
    val rep = Seq((1L, "A", "echo line. echo line"), (2L, "A", "solo body"))
      .toDF("id", "grp", "text")
    val kept = Dedup.boilerplateStrip(rep, "id", "grp", "text", minDocs = 2)
      .filter(col("id") === 1L).head()
    assert(kept.getLong(1) == 2L && kept.getString(3) == "echo line. echo line")
  }

  test("winnowing: a shared k+w-1-token run GUARANTEES a shared fingerprint") {
    // k=3, w=4: any shared verbatim run of >= 6 tokens must collide.
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two $shared three four five six seven"),
      (2L, s"nine ten eleven twelve $shared thirteen"),
      (3L, "completely different words with no overlap at all here"))
      .toDF("id", "text")
    val fp = Dedup.winnowFingerprints(docs, "id", "text", k = 3, w = 4)
    val byDoc = fp.collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    assert((byDoc(1L) & byDoc(2L)).nonEmpty) // certain, not probabilistic
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
    // Short docs: < k tokens emit nothing; < w grams emit one min.
    val short = Seq((1L, "a b"), (2L, "a b c d")).toDF("id", "text")
    val sf = Dedup.winnowFingerprints(short, "id", "text", k = 3, w = 4)
      .collect().map(r => r.getLong(0))
    assert(sf.toSeq == Seq(2L)) // doc 1 has no 3-gram; doc 2 has 2 grams -> 1 fp
    // Pair census: docs 1/2 share >= minShared rare fingerprints.
    val pairs = Dedup.winnowNearDups(docs, "id", "text", k = 3, w = 4,
        minShared = 1, maxDf = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("containmentPairs: subset scores exactly 1.0 on its own side") {
    val core = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu" // 12 tokens -> 10 shingles, all inside doc 2
    val docs = Seq(
      (1L, core),
      (2L, core + " nu xi")) // 14 tokens -> 12 shingles
      .toDF("id", "text")
    val got = Dedup.containmentPairs(docs, "id", "text",
        minContainMicro = 900000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    // The asymmetry is the point: A is FULLY inside B (exactly 1.0,
    // floor-exact micro) while the reverse direction is only 10/12.
    assert(got == Map((1L, 2L) -> ((10L, 12L, 10L, 1000000L, 833333L))))
  }
}
