package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens lower-cases and drops empties from repeated spaces") {
    val df = Seq("The  Quick  fox", "", "   ").toDF("t")
      .select(TextFunctions.tokens(col("t")).as("w"))
    assert(rows(df).map(_.getSeq[String](0)) ==
      Seq(Seq("the", "quick", "fox"), Seq(), Seq()))
  }

  test("tokens splits on ANY whitespace run — \\n/\\t/CR, not just space") {
    val df = Seq("foo\nbar\tbaz", "a \t\n b", "x\r\ny").toDF("t")
      .select(TextFunctions.tokens(col("t")).as("w"))
    assert(rows(df).map(_.getSeq[String](0)) ==
      Seq(Seq("foo", "bar", "baz"), Seq("a", "b"), Seq("x", "y")))
  }

  test("wordPieceCount counts alphanumeric runs") {
    val df = Seq("don't stop-me now42").toDF("t")
      .select(TextFunctions.wordPieceCount(col("t")).as("n"))
    // don, t, stop, me, now42
    assert(rows(df).head.getInt(0) == 5)
  }

  test("wordPieceCount scores non-Latin letter/digit runs, not just ASCII") {
    val df = Seq("привет мир42", "你好,世界", "γειά- σου", "!!!").toDF("t")
      .select(TextFunctions.wordPieceCount(col("t")).as("n"))
    // привет|мир42 = 2; 你好|世界 = 2; γειά|σου = 2; punctuation = 0.
    assert(rows(df).map(_.getInt(0)) == Seq(2, 2, 2, 0))
  }

  test("charBigrams condenses whitespace then emits exact-length-2 grams") {
    val df = Seq("ab cd", "你 好 世", "x", "", " \t").toDF("t")
      .select(TextFunctions.charBigrams(col("t")).as("bg"))
    assert(rows(df).map(_.getSeq[String](0)) == Seq(
      Seq("ab", "bc", "cd"), Seq("你好", "好世"), Seq(), Seq(), Seq()))
  }

  test("tokensScriptAware routes cjk-dominant text to char bigrams") {
    val df = Seq("你好世界", "the quick fox", "").toDF("t")
      .select(TextFunctions.tokensScriptAware(col("t")).as("w"))
    assert(rows(df).map(_.getSeq[String](0)) == Seq(
      Seq("你好", "好世", "世界"), Seq("the", "quick", "fox"), Seq()))
  }

  test("shingles of size n, space-joined; short text yields empty") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(TextFunctions.shingles(col("t"), 3).as("sh"))
    assert(rows(df).map(_.getSeq[String](0)) ==
      Seq(Seq("a b c", "b c d"), Seq()))
  }

  test("langId picks the marker-heavy language; empty/no-hit text is 'und'") {
    val df = Seq(
      "the cat is on the mat and the dog",
      "der hund ist nicht da und das ist gut",
      "el gato es de la casa y los perros",
      "xyzzy qwerty").toDF("t")
      .select(TextFunctions.langId(col("t")).as("lang"))
    assert(rows(df).map(_.getString(0)) == Seq("en", "de", "es", "und"))
  }

  test("langId tie-break is ascending language code") {
    // "la" marks both es and fr; single-token text ties 1-1 ⇒ es wins.
    val df = Seq("la").toDF("t").select(TextFunctions.langId(col("t")).as("lang"))
    assert(rows(df).head.getString(0) == "es")
  }

  test("qualitySignals ratios on a known string") {
    val df = Seq("the cat!").toDF("t")
      .select(TextFunctions.qualitySignals(col("t")).as("q"))
      .select(col("q.n_chars"), col("q.n_tokens"), col("q.punct_ratio"),
        col("q.stopword_ratio"))
    val r = rows(df).head
    assert(r.getInt(0) == 8)
    assert(r.getInt(1) == 2)
    assert(math.abs(r.getDouble(2) - 1.0 / 8) < 1e-12)
    assert(r.getDouble(3) == 0.5)
  }

  test("sortedTokenFingerprint is order- and duplication-invariant") {
    val df = Seq("b a a c", "c b a", "a b d").toDF("t")
      .select(TextFunctions.sortedTokenFingerprint(col("t")).as("fp"))
    val fps = rows(df).map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("fixEncoding repairs cp1252 mojibake, leaves clean text alone") {
    def fix(s: String): String =
      Seq(Tuple1(s)).toDF("t")
        .select(TextFunctions.fixEncoding(col("t")).as("f"))
        .collect().head.getString(0)
    // Latin-1-range double encoding: Ã© = C3 A9 = é.
    assert(fix("cafÃ© au lait") == "café au lait")
    assert(fix("naÃ¯ve rÃ©sumÃ©") == "naïve résumé")
    // cp1252-range double encoding: curly quotes and apostrophes ride
    // on 0x80–0x9F display chars (â€™ = E2 80 99 = ’), including
    // the UNDEFINED cp1252 byte 0x9D that latin1-fallback decoders
    // leave as a C1 control (â€\u009D = E2 80 9D = ”).
    assert(fix("itâ€™s â€œquotedâ€\u009D here") ==
      "it’s “quoted” here")
    // CJK mojibake: å¤§ = E5 A4 A7 = 大; ä¸\u0080 = E4 B8 80 = 一.
    assert(fix("å¤§ä¸\u0080") == "大一")
    // Clean ASCII: untouched.
    assert(fix("plain ascii stays") == "plain ascii stays")
    // GENUINE UTF-8 text must never be "repaired": a real é sits in a
    // continuation position with no lead byte, real CJK is > U+00FF —
    // both fail the UTF-8-bytes validity regex.
    assert(fix("déjà vu 中文") == "déjà vu 中文")
    assert(fix("café") == "café")
    // Unpaired surrogates never reach the expression: Tungsten's
    // UTF8String conversion already sanitizes them to '?' (pinned
    // here so an engine change would surface); paired surrogates are
    // real supplementary chars and pass through.
    assert(fix("a\ud800b") == "a?b")
    assert(fix("emoji 😀 ok") == "emoji 😀 ok")
  }

  test("isMojibake is the census predicate: true iff repair would act") {
    val out = Seq(
      ("cafÃ©", true), ("â€œxâ€\u009D", true), ("å¤§", true),
      ("plain", false), ("café", false), ("中文", false), ("", false))
      .toDF("t", "expect")
      .select(TextFunctions.isMojibake(col("t")).as("got"), col("expect"))
      .collect()
    out.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), r))
  }

  test("scriptProfile counts per class; dominant is leftmost max") {
    val rows = Seq(
      ("abc привет", ("cyrillic", 3L, 6L, 0L)), // cyrillic outnumbers
      ("ab cd", ("latin", 4L, 0L, 0L)),
      ("你好 123 4", ("digit", 0L, 0L, 4L)),    // digits 4 > cjk 2
      ("你好世界", ("cjk", 0L, 0L, 0L)),
      ("", ("und", 0L, 0L, 0L)),
      ("¡!?", ("und", 0L, 0L, 0L)),            // punctuation only
      ("état café", ("latin", 8L, 0L, 0L)))    // accents are latin
    val got = rows.map(_._1).toDF("t")
      .select(col("t"), TextFunctions.scriptProfile(col("t")).as("p"))
      .collect()
      .map(r => r.getString(0) -> r.getStruct(1)).toMap
    rows.foreach { case (t, (dom, nl, nc, nd)) =>
      val p = got(t)
      assert(p.getAs[String]("dominant") == dom, s"'$t' dominant")
      assert(p.getAs[Long]("n_latin") == nl, s"'$t' latin")
      assert(p.getAs[Long]("n_cyrillic") == nc, s"'$t' cyrillic")
      assert(p.getAs[Long]("n_digit") == nd, s"'$t' digit")
    }
    // Tie: 2 latin vs 2 cyrillic — latin is earlier in priority.
    val tie = Seq("ab яш").toDF("t")
      .select(TextFunctions.scriptProfile(col("t")).as("p"))
      .collect()(0).getStruct(0)
    assert(tie.getAs[String]("dominant") == "latin")
  }

  test("tokens: native byte scan == regex split+filter on hostile input") {
    // The native WhitespaceTokens must be indistinguishable from the
    // declarative form it replaced — including Unicode content, every
    // ASCII \s class member, and NBSP (U+00A0), which Java \s does
    // NOT match and therefore must stay inside a token.
    val fixtures = Seq(
      "",
      "   ",
      "plain words here",
      "  leading and trailing  ",
      "tabs\tand\nnewlines\r\nandvtff",
      "UPPER Case MiXeD",
      "Σίσυφος ΣΊΣΥΦΟΣ", // Greek final-sigma lowering
      "nbsp stays together",
      "汉字 без spaces 123",
      "a",
      "\n\n\nx\n\n")
    val df = fixtures.toDF("t")
    val native = df.select(TextFunctions.tokens(col("t"))).collect()
      .map(_.getSeq[String](0))
    val regex = df.select(
        filter(split(lower(col("t")), "\\s+"), x => length(x) > 0))
      .collect().map(_.getSeq[String](0))
    fixtures.indices.foreach { i =>
      assert(native(i) == regex(i),
        s"mismatch on ${fixtures(i).replace("\n", "\\n")}: " +
          s"native=${native(i)} regex=${regex(i)}")
    }
  }

  test("sStem: Harman's three rules and their guard suffixes") {
    val cases = Seq(
      "cities" -> "city", "stories" -> "story", // ies -> y
      "movies" -> "movy", // the documented ies quirk, rules are rules
      "boxes" -> "boxe", "classes" -> "classe", // es -> drop s
      "trees" -> "trees", "goes" -> "goes", // ees/oes guards
      "dogs" -> "dog", "cats" -> "cat", // s -> drop
      "pass" -> "pass", "bus" -> "bus", // ss/us guards
      "as" -> "as", "its" -> "its", // < 4 chars pass through
      "data" -> "data") // no suffix
    val got = cases.map(_._1).toDF("w")
      .select(col("w"), TextFunctions.sStem(col("w")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (w, want) =>
      assert(got(w) == want, s"$w -> ${got(w)}, want $want")
    }
  }
}
