package graft.operators

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25Scores: hand-checked idf/tf/length-norm, micro-nat exact") {
    // N=3, tot_len=7. df: cat=2, sat=1, ran=2, dog=1, fast=1.
    // Query "cat fast": idf_micro(cat)=round(1e6·ln 1.6)=470004,
    // idf_micro(fast)=round(1e6·ln 8/3)=980829. Docs 1,2 match 'cat'
    // (tf=1, len=2), doc 3 matches 'fast' (tf=1, len=3) — the longer
    // doc still wins on the rarer term.
    val docs = Seq((1L, "cat sat"), (2L, "cat ran"), (3L, "dog ran fast"))
      .toDF("doc_id", "text")
    val qs = Seq((0L, "cat fast")).toDF("qid", "qtext")
    val out = Retrieval.bm25Scores(docs, "doc_id", "text", qs, "qid", "qtext")
      .collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(
      1L -> ((1L, 0.499177)), 2L -> ((1L, 0.499177)),
      3L -> ((1L, 0.878184))))
  }

  test("bm25Scores: repeated query terms count once; no-overlap docs absent") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val qs = Seq((0L, "alpha alpha alpha")).toDF("qid", "qtext")
    val out = Retrieval.bm25Scores(docs, "doc_id", "text", qs, "qid", "qtext")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // Only doc 1 matches, with n_terms 1 despite the tripled query term.
    assert(out.toSeq == Seq((1L, 1L)))
  }

  test("phraseSearch: consecutive-token matches, overlaps, repeated terms") {
    val docs = Seq(
      (1L, "a b a b a"),     // "a b a" at 0 and 2 (overlapping)
      (2L, "a a a"),         // "a a" at 0 and 1; repeated-term phrase
      (3L, "b a x a b"),     // contains the terms but never "a b a"
      (4L, "x y z")).toDF("doc_id", "text")
    val phrases = Seq((10, "a b a"), (20, "a a"), (30, "missing phrase"))
      .toDF("pid", "ptext")
    val out = Retrieval.phraseSearch(docs, "doc_id", "text",
        phrases, "pid", "ptext")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // Doc 1: "a b a" at starts 0 and 2 — overlapping hits both count;
    // its a's are never adjacent, so no "a a". Doc 2: "a a" at 0 and
    // 1 (the repeated-term distinct-j case). Doc 3 has all of
    // phrase 10's terms but never consecutively. Unmatched phrases
    // and docs are absent, not zero rows.
    assert(out == Map(
      (10, 1L) -> ((2L, 0L)),
      (20, 2L) -> ((2L, 0L))))
  }

  test("rrfFuse: agreement outranks a single #1; integer micro-scores") {
    import spark.implicits._
    // System A ranks d1 #1, d3 #2; system B ranks d2 #1, d3 #2.
    // d3 appears in BOTH (two 1/62 terms) and must beat either solo #1.
    val a = Seq((1L, "d1", 1), (1L, "d3", 2)).toDF("q", "d", "r")
    val b = Seq((1L, "d2", 1), (1L, "d3", 2)).toDF("q", "d", "r")
    val got = Retrieval.rrfFuse(Seq(a, b), "q", "d", "r",
        kConst = 60, topK = 10)
      .collect()
      .map(x => x.getString(2) -> ((x.getInt(1), x.getLong(3),
        x.getLong(4)))).toMap
    val s61 = 1000000L / 61
    val s62 = 1000000L / 62
    assert(got("d3") == ((1, s62 + s62, 2L)))
    // d1 and d2 tie at 1/(60+1): smaller doc id ranks first.
    assert(got("d1") == ((2, s61, 1L)))
    assert(got("d2") == ((3, s61, 1L)))
  }
}
