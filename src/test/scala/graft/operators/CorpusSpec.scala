package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("collocations: frequent pair scores high, loner pairs filtered by minCount") {
    // 'new york' always co-occurs; 'the' pairs with everything.
    val docs = ((1L to 10L).map(i => (i, "new york is the city")) ++
      Seq((11L, "the cat sat"), (12L, "the dog ran")))
      .toDF("doc_id", "text")
    val out = Corpus.collocations(docs, "text", minCount = 10L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // Corpus: 10×5 + 2×3 = 56 token occurrences.
    // 'new york': c_xy=10, c_x=10, c_y=10 → 10·56/100 = 5.6.
    assert(out("new york") == ((10L, 10L, 10L, 5.6)))
    // Only ≥10-count bigrams survive; each doc has 4, all at count 10
    // except the tail docs' — so exactly the 4 shared bigrams remain.
    assert(out.keySet ==
      Set("new york", "york is", "is the", "the city"))
    // 'is the' is diluted by the extra 'the' occurrences:
    // 10·56/(10·12) < 10·56/(10·10).
    assert(out("is the")._4 < out("new york")._4)
  }

  test("pmiRatio survives counts whose Long product would wrap (c_xy=5e8, n=1e11)") {
    val cXy = 500000000L          // 5e8 — a frequent bigram at corpus scale
    val n = 100000000000L         // 1e11 token occurrences (~100 TB of text)
    val cX = 2000000000L
    val cY = 3000000000L
    // The pre-fix Long product wraps negative — the bug this guards.
    assert(cXy * n < 0L)
    val got = Seq((cXy, n, cX, cY)).toDF("c_xy", "n", "c_x", "c_y")
      .select(Corpus.pmiRatio(col("c_xy"), col("n"), col("c_x"), col("c_y"))
        .as("pmi_ratio"))
      .collect().head.getDouble(0)
    // 5e8·1e11 / (2e9·3e9) = 5e19/6e18 = 8.333333…
    assert(got > 0.0 && !got.isInfinite && !got.isNaN)
    assert(got == 8.333333)
  }

  test("vocabStats: token/type/hapax counts and ratios per group") {
    val docs = Seq(
      (1L, "a", "a b b c"),     // src a: 4 tokens, 3 types, hapax {a, c}
      (2L, "a", "c d"),         // c now ×2 → hapax {a, d}; 6 tok, 4 types
      (3L, "b", "x x x"))       // src b: 3 tokens, 1 type, 0 hapax
      .toDF("doc_id", "source", "text")
    val out = Corpus.vocabStats(docs, "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(out("a") == ((6L, 4L, 2L, 0.666667, 0.5)))
    assert(out("b") == ((3L, 1L, 0L, 0.333333, 0.0)))
  }

  test("lmPerplexity: add-one bigram NLL in exact micro-nats; short docs drop") {
    // Unigrams a=3 b=2 c=1 solo=1 → V=4. Bigrams 'a b'×2, 'a c'×1.
    // P(b|a) = (2+1)/(3+4) = 3/7;  P(c|a) = (1+1)/(3+4) = 2/7.
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = Corpus.lmPerplexity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out(1L) == ((1L, 0.847298)))   // -round(1e6·ln 3/7)/1e6
    assert(out(2L) == ((1L, 0.847298)))
    assert(out(3L) == ((1L, 1.252763)))   // -round(1e6·ln 2/7)/1e6
    assert(!out.contains(4L))             // no bigrams → no row
    // Fluent (corpus-frequent) bigrams score strictly lower than the
    // rare ones — the filtering direction the signal exists for.
    assert(out(1L)._2 < out(3L)._2)
  }

  test("lmScore against a frozen model: OOV smooths to maximally surprising") {
    // Model corpus: unigrams a=3 b=2 c=1 → V=3; bigrams 'a b'×2, 'a c'×1.
    val model = Corpus.lmModel(
      Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text"),
      "text")
    val out = Corpus.lmScore(
        Seq((10L, "a b"), (11L, "z q"), (12L, "a z"))
          .toDF("doc_id", "text"),
        model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(10L) == 0.693147)  // in-model: (2+1)/(3+3)
    assert(out(11L) == 1.098612)  // both sides OOV: (0+1)/(0+3)
    assert(out(12L) == 1.791759)  // seen x, unseen bigram: (0+1)/(3+3)
    // The OOV docs score strictly worse than the fluent one.
    assert(out(11L) > out(10L) && out(12L) > out(11L))
  }

  test("bpePairCounts: frequency-weighted in-token pairs, deterministic top-K cut") {
    // 'aba' twice → pairs ab,ba ×2; 'ab' once → ab; 'x' forms no pair.
    val docs = Seq((1L, "aba ab x"), (2L, "aba")).toDF("doc_id", "text")
    val out = Corpus.bpePairCounts(docs, "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSet == Set(("ab", 3L), ("ba", 2L)))
    // Ranking: count desc, then pair asc on ties.
    val tied = Seq((1L, "ab cd ab cd")).toDF("doc_id", "text")
    val cut = Corpus.bpePairCounts(tied, "text", topK = 1).collect()
    assert(cut.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("ab", 2L)))
    // Single-char-token-only corpus: no pairs, empty result (the
    // sequence(1, 0) guard — Spark would otherwise count DOWN).
    assert(Corpus.bpePairCounts(
      Seq((1L, "a b c")).toDF("doc_id", "text"), "text", 5).count() == 0L)
  }

  test("rarityScores: rare-df occurrences over total, exact division") {
    // 'common' appears in all 3 docs (df=3); the others are df=1.
    val docs = Seq(
      (1L, "common rare1 rare1 rare2"),  // 3 of 4 occurrences rare
      (2L, "common common"),             // 0 of 2
      (3L, "common rare3"))              // 1 of 2
      .toDF("doc_id", "text")
    val out = Corpus.rarityScores(docs, "doc_id", "text", dfThreshold = 2L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((4L, 3L, 0.75)))
    assert(out(2L) == ((2L, 0L, 0.0)))
    assert(out(3L) == ((2L, 1L, 0.5)))
    // Raising the threshold past every df marks everything rare.
    val all = Corpus.rarityScores(docs, "doc_id", "text", dfThreshold = 10L)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(all == Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0))
  }

  test("nbClassify: separable classes recover, OOV ignored, ties break to smaller class") {
    val train = Seq(
      (1L, "spam buy pills now", "spam"),
      (2L, "spam cheap pills", "spam"),
      (3L, "ham meeting notes agenda", "ham"),
      (4L, "ham agenda minutes", "ham"))
      .toDF("doc_id", "text", "label")
    val model = Corpus.nbModel(train, "text", "label")
    // Priors: 2/4 each → round(1e6·ln(0.5)) for both classes.
    val priors = model.priors.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(priors.keySet == Set("spam", "ham"))
    assert(priors("spam") == priors("ham"))
    assert(priors("spam") == math.round(1e6 * math.log(0.5)))
    // Weights are DENSE: every (train-vocab token × class) pair.
    val v = model.weights.select("tok").distinct().count()
    assert(model.weights.count() == v * 2)

    val test = Seq(
      (10L, "cheap pills zzz-oov"),   // spam evidence + ignored OOV
      (11L, "meeting agenda"),        // ham evidence
      (12L, "zzz-oov only-oov"))      // nothing in vocab → drops
      .toDF("doc_id", "text")
    val out = Corpus.nbClassify(test, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set(10L, 11L))
    assert(out(10L)._1 == "spam")
    assert(out(11L)._1 == "ham")
    // OOV token carried no evidence: only 2 in-vocab occurrences.
    assert(out(10L)._3 == 2L)

    // A doc whose evidence is symmetric across classes ties on the
    // integer score and must break to the smaller class name. "spam"
    // appears twice in spam-train, "ham" twice in ham-train; equal
    // class token totals (7 each) make the weights mirror exactly.
    val sym = Seq((20L, "spam ham")).toDF("doc_id", "text")
    val tied = Corpus.nbClassify(sym, model, "doc_id", "text").collect()
    assert(tied.head.getString(1) == "ham")
  }

  test("skipgramCounts: canonical pairs, harmonic micro-weights, window bound") {
    // "a b c a": window 2 pairs by offset —
    //   off 1: (a,b) (b,c) (a,c)   weight 1e6 each
    //   off 2: (a,c) (a,b)         weight 5e5 each
    val d = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val out = Corpus.skipgramCounts(d, "text", window = 2, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      ("a", "b") -> ((2L, 1500000L)),
      ("b", "c") -> ((1L, 1000000L)),
      ("a", "c") -> ((2L, 1500000L))))
    // window 3 additionally pairs the two 'a's: a self-pair (a,a).
    val w3 = Corpus.skipgramCounts(d, "text", window = 3, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(w3(("a", "a")) == ((1L, 333333L)))
    // minCount prunes the tail.
    assert(Corpus.skipgramCounts(d, "text", 2, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "b"), ("a", "c")))
    // A 1-token doc yields nothing (offset exceeds every position).
    assert(Corpus.skipgramCounts(
      Seq((1L, "solo")).toDF("doc_id", "text"), "text", 3, 1L)
      .count() == 0L)
  }

  test("knScore: continuation probability penalizes context-bound tokens") {
    // 'f' and 'd' have EQUAL unigram frequency (3 each), but 'f'
    // only ever follows 's' (one continuation context) while 'd'
    // follows three different tokens. KN must make the UNSEEN bigram
    // "x f" less probable than "x d"; add-one smoothing (lmScore)
    // can't tell them apart.
    val train = Seq(
      (1L, "s f s f s f"),
      (2L, "a d b d c d x q")).toDF("doc_id", "text")
    val model = Corpus.knModel(train, "text")
    val probe = Seq((10L, "x f"), (20L, "x d")).toDF("doc_id", "text")
    val nll = Corpus.knScore(probe, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nll(10L) > nll(20L),
      s"context-bound 'f' should surprise more: ${nll(10L)} vs ${nll(20L)}")
  }

  test("knScore is total: unseen context and unseen token stay finite") {
    val model = Corpus.knModel(
      Seq((1L, "a b a b")).toDF("doc_id", "text"), "text")
    val out = Corpus.knScore(
        Seq((9L, "zz qq zz")).toDF("doc_id", "text"),
        model, "doc_id", "text")
      .collect()
    assert(out.length == 1)
    val nll = out.head.getDouble(2)
    assert(!nll.isNaN && !nll.isInfinite && nll > 0, s"nll=$nll")
  }

  test("knScore self-scoring: seen bigrams beat the backoff floor") {
    val docs = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val self = Corpus.knScore(docs, Corpus.knModel(docs, "text"),
      "doc_id", "text").collect().head
    val alien = Corpus.knScore(
      Seq((2L, "p q r p q")).toDF("doc_id", "text"),
      Corpus.knModel(docs, "text"), "doc_id", "text").collect().head
    assert(self.getLong(1) == 4L)
    assert(self.getDouble(2) < alien.getDouble(2),
      "in-model text must score lower NLL than alien text")
  }

  test("charEntropy: repeated gram floors at 0; uniform grams hit ln K") {
    val docs = Seq(
      (1L, "aaaa"),      // 2 trigrams, both "aaa": H = 0
      (2L, "abcdef"),    // 4 distinct trigrams: H = ln 4
      (3L, "ab"))        // shorter than n: absent
      .toDF("doc_id", "text")
    val got = Corpus.charEntropy(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == Set(1L, 2L))
    // doc 1: n=2, one gram with c=2 -> lnq(2) - round(2*lnq(2)/2) = 0.
    assert(got(1L) == ((2L, 1L, 0L)))
    // doc 2: n=4 distinct -> lnq(4) - 0 = round(1e6*ln 4).
    assert(got(2L) == ((4L, 4L, math.round(1e6 * math.log(4.0)))))
  }

  test("charEntropy: case folds before gramming") {
    val docs = Seq((1L, "ABAB"), (2L, "abab")).toDF("doc_id", "text")
    val es = Corpus.charEntropy(docs, "doc_id", "text", 3)
      .collect().map(_.getLong(3)).toSet
    assert(es.size == 1, "upper and lower case must gram identically")
  }

  test("spoofCensus: flags Latin-Cyrillic/Greek mixing inside a token " +
      "but not pure-script or CJK-Latin tokens") {
    // "pаypal" has Cyrillic а (U+0430); "αlpha" has Greek α (U+03B1);
    // "крем" and "αβγ" are pure-script; "日本語test" is CJK-Latin,
    // deliberately NOT a confusable pair.
    val docs = Seq(
      (1L, "hello pаypal world", "g1"),
      (2L, "all clean latin", "g1"),
      (3L, "αβγ alone", "g1"),
      (4L, "крем pаypal αlpha", "g2"),
      (5L, "日本語test", "g2"))
      .toDF("doc_id", "text", "src")
    val got = Corpus.spoofCensus(docs, "doc_id", "text", "src")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("g1") == ((3L, 1L, 1L)))
    assert(got("g2") == ((2L, 1L, 2L)))
  }

  test("charEntropy: native one-pass census ≡ the explode+shuffle formula " +
      "on hostile unicode") {
    // Multibyte (CJK), supplementary (emoji, one code POINT per
    // position), tabs/newlines, repeats, and an exactly-n-length doc.
    val docs = Seq(
      (1L, "aaaaaaa"), (2L, "abcabcabc"), (3L, "日本語日本語テスト"),
      (4L, "a\tb\nc a\tb"), (5L, "xy😀zz😀xy😀"), (6L, "abc"),
      (7L, "MiXeD CaSe MiXeD"))
      .toDF("doc_id", "text")
    val got = Corpus.charEntropy(docs, "doc_id", "text", 3)
    // The formula the native expression replaced, inlined verbatim.
    val txt = lower($"text")
    val grams = transform(sequence(lit(1), length(txt) - lit(2)),
      i => txt.substr(i, lit(3)))
    val lnq = (c: org.apache.spark.sql.Column) =>
      round(lit(1e6) * log(c.cast("double"))).cast("long")
    val want = docs.filter(length(txt) >= 3)
      .select($"doc_id", explode(grams).as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_grams"), count(lit(1)).as("distinct_grams"),
        sum($"c" * lnq($"c")).as("__s"))
      .select($"doc_id", $"n_grams", $"distinct_grams",
        (lnq($"n_grams") - round($"__s".cast("double") /
          $"n_grams".cast("double")).cast("long")).as("entropy_mnat"))
    val g = got.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val w = want.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(g == w)
    assert(g(5L)._1 == 7L, "emoji must count as ONE code point")
  }

  test("lineCensus: bullets, shorts, terminal punct over non-blank lines") {
    val docs = Seq(
      (1L, "Line one.\n\n- bullet\nhi\nLong line here?"),
      (2L, "\n \n"))  // all blank → NULL fractions
      .toDF("doc_id", "text")
    val got = Corpus.lineCensus(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getLong(3),
          if (r.isNullAt(4)) null else r.getLong(4),
          if (r.isNullAt(5)) null else r.getLong(5)))).toMap
    // 5 lines, 1 blank; of the 4 non-blank: 1 bullet, 3 short (<10
    // trimmed chars), 2 terminal.
    assert(got(1L) == ((5L, 1L, 250000L, 750000L, 500000L)))
    assert(got(2L) == ((3L, 3L, null, null, null)))
  }

  test("scrubLines: C4 keeps terminal-punctuated >=3-word lines only") {
    val docs = Seq((1L,
      "Good line here.\nshort.\nno punct line\n- bullet item.\n" +
        "Another good line!")).toDF("doc_id", "text")
    val r = Corpus.scrubLines(docs, "doc_id", "text").head()
    assert(r.getString(1) ==
      "Good line here.\n- bullet item.\nAnother good line!")
    assert(r.getLong(2) == 3L && r.getLong(3) == 2L)
  }

  test("frequentLines + scrubFrequentLines: cross-doc boilerplate drops, " +
      "content and blanks survive in order") {
    // "(c) footer" appears (trimmed) in all three docs; real content
    // lines are unique. Doc 3 is ALL boilerplate → empty rebuild.
    val docs = Seq(
      (1L, "Unique content one.\n(c) footer\n\nmore text"),
      (2L, "Other content.\n  (c) footer  "),
      (3L, "(c) footer"))
      .toDF("doc_id", "text")
    val census = Corpus.frequentLines(docs, "doc_id", "text", minDf = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(census == Map("(c) footer" -> 3L))
    val got = Corpus.scrubFrequentLines(docs, "doc_id", "text", maxDf = 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("Unique content one.\n\nmore text", 3L, 1L)))
    assert(got(2L) == (("Other content.", 1L, 1L)))
    assert(got(3L) == (("", 0L, 1L)))
  }

  test("vocabGrowth: exact first-occurrence census, cumulative in doc " +
      "order, milli-nat lns") {
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "c"))
      .toDF("doc_id", "text")
    val got = Corpus.vocabGrowth(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(got(1L) == ((3L, 2L, 3L, 2L, 1099L, 693L)))
    assert(got(2L) == ((2L, 1L, 5L, 3L, 1609L, 1099L)))
    assert(got(3L) == ((1L, 0L, 6L, 3L, 1792L, 1099L)))
  }

  test("collapseRepeatedLines: adjacent echoes die (trimmed compare), " +
      "non-adjacent repeats survive") {
    val docs = Seq(
      (1L, "a\na\na\nb\n b \nb\nc"),  // runs of a and b collapse
      (2L, "x\ny\nx"))                 // non-adjacent repeat kept
      .toDF("doc_id", "text")
    val got = Corpus.collapseRepeatedLines(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("a\nb\nc", 3L, 4L)))
    assert(got(2L) == (("x\ny\nx", 3L, 0L)))
  }

  test("sentenceStats: segments, exact micro mean, NULL-honest empties") {
    val docs = Seq(
      // Segments "One"(3), "Two sentences"(13), "Three?"(6) — the
      // last terminator stays attached; mean = 22/3 micro-exact.
      (1L, "One. Two sentences! Three?"),
      (2L, ""),                      // no sentences at all
      (3L, "!!! "),                  // punct run + whitespace → none,
                                     //   but the raw text DOES end-punct
      (4L, "no terminator here"))    // one segment, doesn't end-punct
      .toDF("doc_id", "text")
    val got = Corpus.sentenceStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1),
          if (r.isNullAt(2)) null else r.getLong(2),
          if (r.isNullAt(3)) null else r.getLong(3),
          r.getBoolean(4)))).toMap
    assert(got(1L) == ((3L, 7333333L, 13L, true)))
    assert(got(2L) == ((0L, null, null, false)))
    assert(got(3L) == ((0L, null, null, true)))
    assert(got(4L) == ((1L, 18000000L, 18L, false)))
  }

  test("textRank: path graph ranks the bridge word highest, exact micro") {
    // "u v w" → undirected path u–v–w. Hand-run 2 integer rounds:
    // r1(u)=575000, r1(v)=1850000; r2(u)=w2=936250,
    // r2(v)=150000+85·(2·575000) div 100 = 1127500.
    val docs = Seq("u v w").toDF("text")
    val got = Corpus.textRank(docs, "text", minCount = 1, iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("u" -> 936250L, "v" -> 1127500L, "w" -> 936250L))
  }

  test("textRank: self-pairs drop, symmetric co-counts merge") {
    // "a a b" + "b a" → bigrams (a,a) dropped; (a,b) and (b,a) merge
    // to one undirected edge of weight 2 — a regular 2-node graph is
    // the exact 1e6 fixpoint whatever the weight.
    val docs = Seq("a a b", "b a").toDF("text")
    val got = Corpus.textRank(docs, "text", minCount = 1, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1000000L, "b" -> 1000000L))
  }

  test("rakeKeywords: classic degree/frequency scores on a hand fixture") {
    // "deep learning of the deep learning model" with stop {of, the}:
    // phrases "deep learning" (len 2) and "deep learning model" (3).
    // deep: freq 2, deg 2+3=5 -> 2.5; learning: 2.5; model: 3/1 = 3.
    // Phrase scores: 5.0 and 8.0.
    val docs = Seq(
      (1L, "deep learning of the deep learning model"),
      (2L, "the of the")) // all stopwords: contributes nothing
      .toDF("doc_id", "text")
    val got = Corpus.rakeKeywords(docs, "doc_id", "text",
      stopwords = Seq("of", "the"), maxPhraseWords = 8)
      .collect().map(r => r.getAs[String]("phrase") -> r).toMap
    assert(got.keySet == Set("deep learning", "deep learning model"))
    assert(got("deep learning").getAs[Long]("score_micro") == 5000000L)
    assert(got("deep learning model")
      .getAs[Long]("score_micro") == 8000000L)
    assert(got("deep learning").getAs[Long]("n_occ") == 1L)
    assert(got("deep learning model").getAs[Long]("n_words") == 3L)
    assert(got("deep learning").getAs[Long]("n_docs") == 1L)
  }

  test("readabilityCensus: hand-counted FRE/FK, unpunctuated one-sentence, empty NULL") {
    val docs = Seq(
      (1L, "the cat sat. the dog ran fast."),
      (2L, "no punctuation here"),
      (3L, ""))
      .toDF("doc_id", "text")
    val got = Corpus.readabilityCensus(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // W=7 S=2 Y=7: FRE = 206.835 − 1.015·3.5 − 84.6 = 118.6825;
    // FK = 0.39·3.5 + 11.8 − 15.59 = −2.425.
    assert(got(1L).getAs[Long]("n_words") == 7L)
    assert(got(1L).getAs[Long]("n_sentences") == 2L)
    assert(got(1L).getAs[Long]("n_syllables") == 7L)
    assert(got(1L).getAs[Long]("fre_micro") == 118682500L)
    assert(got(1L).getAs[Long]("fk_grade_micro") == -2425000L)
    // No terminators: the whole text is ONE sentence, scores defined.
    assert(got(2L).getAs[Long]("n_sentences") == 1L)
    assert(got(2L).getAs[Long]("n_words") == 3L)
    // Empty: zero words/sentences -> NULL scores.
    assert(got(3L).isNullAt(got(3L).fieldIndex("fre_micro")))
    assert(got(3L).isNullAt(got(3L).fieldIndex("fk_grade_micro")))
  }

  test("goodTuring: textbook spectrum, gap NULL, unseen mass") {
    // Corpus "a a a b b c d e": N1=3 N2=1 N3=1, T=8.
    // r=1: r* = 2*N2/N1 = 2/3; r=2: r* = 3*N3/N2 = 3;
    // r=3: N4 absent -> NULL; P0 = N1/T = 3/8.
    val docs = Seq(("g", "a a b"), ("g", "A B c d e"))
      .toDF("src", "text") // tokens() lower-cases: A==a, B==b
    val got = Corpus.goodTuring(docs, "src", "text", maxR = 5)
      .collect().map(r => r.getAs[Long]("r") -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L).getAs[Long]("n_r") == 3L)
    assert(got(1L).getAs[Long]("r_star_micro") ==
      math.round(1e6 * 2.0 / 3.0))
    assert(got(2L).getAs[Long]("r_star_micro") == 3000000L)
    assert(got(3L).isNullAt(got(3L).fieldIndex("r_star_micro")))
    assert(got(1L).getAs[Long]("p0_micro") == 375000L)
  }

  test("lexicalRichness: textbook TTR, Yule's K, Simpson's D") {
    // Tokens a:3 b:1 c:1 -> T=5 V=3, TTR .6,
    // K = 1e4*(11-5)/25 = 2400, D = 6/20 = .3.
    val docs = Seq(("g", "a a b"), ("g", "a c")).toDF("src", "text")
    val r = Corpus.lexicalRichness(docs, "src", "text")
      .collect().head
    assert(r.getAs[Long]("n_tokens") == 5L)
    assert(r.getAs[Long]("n_types") == 3L)
    assert(r.getAs[Long]("ttr_micro") == 600000L)
    assert(r.getAs[Long]("yule_k_micro") == 2400000000L)
    assert(r.getAs[Long]("simpson_micro") == 300000L)
  }

  test("keyness: balanced fixture - hand G2, zero-key token, signs") {
    val df = Seq(
      ("aa aa aa bb dd dd", true),
      ("bb bb bb aa dd dd", false)).toDF("text", "f")
    val got = Corpus.keyness(df, "text", "f", minTotal = 2L)
      .collect().map(r => r.getString(0) -> r).toMap
    // aa: a=3 b=1, A=B=6 -> G2 = 2(3 ln 1.5 + ln 0.5), over-focus.
    val g2aa = math.round(
      2e6 * (3.0 * math.log(1.5) + math.log(0.5)))
    assert(got("aa").getAs[Long]("g2_micro") == g2aa)
    assert(got("aa").getAs[Int]("direction") == 1)
    // bb mirrors aa with the opposite sign.
    assert(got("bb").getAs[Long]("g2_micro") == g2aa)
    assert(got("bb").getAs[Int]("direction") == -1)
    // dd: evenly split -> expected = observed, G2 exactly 0, sign 0.
    assert(got("dd").getAs[Long]("g2_micro") == 0L)
    assert(got("dd").getAs[Int]("direction") == 0)
  }

  test("keyness: minTotal bounds output but not the totals") {
    val df = Seq(
      ("aa aa aa bb cc cc", true),
      ("bb bb bb aa", false)).toDF("text", "f")
    val got = Corpus.keyness(df, "text", "f", minTotal = 3L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!got.contains("cc")) // 2 < minTotal, dropped from OUTPUT
    // ...but cc's mass still counts in A: A=6, B=4, N=10.
    val a = 3.0; val b = 1.0; val bigA = 6.0; val bigB = 4.0
    val n = bigA + bigB
    val g2 = math.round(2e6 *
      (a * math.log(a * n / ((a + b) * bigA)) +
        b * math.log(b * n / ((a + b) * bigB))))
    assert(got("aa").getAs[Long]("g2_micro") == g2)
  }

  test("burrowsDelta: hand z grid and pair distances") {
    val df = Seq(
      ("A", "x x x y"), ("B", "x y y y"), ("C", "x x y y"))
      .toDF("a", "text")
    val got = Corpus.burrowsDelta(df, "a", "text", topK = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // f(x) = (750000, 250000, 500000): var-num = 3.75e11,
    // z = +-1224745 / 0; y mirrors. Delta(A,B) doubles Delta(A,C).
    val zx = math.round(1e6 * 750000.0 / math.sqrt(3.75e11))
    val ab = got(("A", "B"))
    assert(ab.getAs[Long]("k_used") == 2L)
    assert(ab.getAs[Long]("delta_micro") == 2L * zx)
    assert(got(("A", "C")).getAs[Long]("delta_micro") == zx)
    assert(got(("B", "C")).getAs[Long]("delta_micro") == zx)
  }

  test("burrowsDelta: zero-variance markers carry no signal") {
    // 'w' has the same rate for both authors -> dropped; the two
    // discriminating singles survive with unit z's.
    val df = Seq(("P", "w a"), ("Q", "w b")).toDF("a", "text")
    val r = Corpus.burrowsDelta(df, "a", "text", topK = 3).head()
    assert(r.getString(0) == "P" && r.getString(1) == "Q")
    assert(r.getAs[Long]("k_used") == 2L)
    assert(r.getAs[Long]("delta_micro") == 2000000L)
  }

  test("chao1Ace: hand spectrum, singleton-only ACE NULL") {
    // G: counts 1,1,2,3,12 -> f1=2 f2=1, rare(<=10) = 4 types/7 toks.
    val gText = (Seq.fill(1)("t1") ++ Seq.fill(1)("t2") ++
      Seq.fill(2)("t3") ++ Seq.fill(3)("t4") ++ Seq.fill(12)("t5"))
      .mkString(" ")
    val df = Seq(("G", gText), ("S", "a b c")).toDF("g", "text")
    val got = Corpus.chao1Ace(df, "g", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    val g = got("G")
    assert(g.getAs[Long]("s_obs") == 5L &&
      g.getAs[Long]("n_tokens") == 19L)
    assert(g.getAs[Long]("f1") == 2L && g.getAs[Long]("f2") == 1L)
    assert(g.getAs[Long]("chao1_micro") ==
      5000000L + math.round(1e6 * 2.0 * 1.0 / 4.0))
    val chat = 1.0 - 2.0 / 7.0
    val gamma2 = math.max(0.0,
      4.0 * 8.0 / (chat * 7.0 * 6.0) - 1.0)
    assert(g.getAs[Long]("ace_micro") ==
      1000000L + math.round(1e6 * (4.0 / chat + 2.0 * gamma2 / chat)))
    val s = got("S")
    // All singletons: coverage 0 -> ACE undefined, Chao1 still fires.
    assert(s.getAs[Long]("chao1_micro") == 6000000L)
    assert(s.isNullAt(s.fieldIndex("ace_micro")))
  }

  test("distinctNgrams: hand bigram census, short docs quarantined") {
    val docs = Seq(
      // "a b a b" -> bigrams (a b), (b a), (a b): 3 total, 2 distinct.
      ("G", "a b a b"),
      // "a b" -> 1 bigram (a b), already seen at the GROUP level.
      ("G", "a b"),
      // one-token doc: too short for n=2.
      ("G", "solo"),
      // H: fully repetitive.
      ("H", "x x x x")).toDF("g", "text")
    val got = Corpus.distinctNgrams(docs, "g", "text", n = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val gRow = got("G")
    assert(gRow.getAs[Long]("n_docs") == 3L)
    assert(gRow.getAs[Long]("n_short") == 1L)
    assert(gRow.getAs[Long]("n_grams") == 4L)
    assert(gRow.getAs[Long]("n_distinct") == 2L)
    assert(gRow.getAs[Long]("distinct_ratio_micro") == 500000L)
    val h = got("H")
    assert(h.getAs[Long]("n_grams") == 3L &&
      h.getAs[Long]("n_distinct") == 1L)
    assert(h.getAs[Long]("distinct_ratio_micro") == 333333L)
  }
}
