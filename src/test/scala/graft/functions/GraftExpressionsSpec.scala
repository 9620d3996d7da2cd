package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The custom expressions must agree with their pure-built-in
  * formulations (the DuckDB oracle locks the same math end-to-end;
  * this pins it at unit level, including the codegen path exercised
  * by the DataFrame evaluation). */
class GraftExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    (1L, "one two three four five six"),
    (2L, "alpha beta gamma alpha beta gamma alpha"),
    (3L, "x y"))
    .toDF("doc_id", "text")

  test("minhashFromTokens == HOF formulation (hash48 % p, affine mins)") {
    val p = Dedup.MinhashP
    val params = Dedup.minhashParams(16)
    val hofSig = texts.select(col("doc_id"),
      transform(array_distinct(TextFunctions.shingles(col("text"), 3)),
        s => TextFunctions.hash48(s) % p).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), array(params.map { case (a, b) =>
        array_min(transform(col("hs"), h => (lit(a) * h + lit(b)) % p))
      }: _*).as("sig"))
    val fast = Dedup.minhashSignatures(texts, "doc_id", "text", 16, 3)
    val hofM = rows(hofSig).map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val fastM = rows(fast).map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fastM == hofM)
  }

  test("shingleList == HOF shingles (order + multiplicity), short docs empty") {
    val hof = texts.select(col("doc_id"),
      TextFunctions.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val fast = texts.select(col("doc_id"),
      GraftExpressions.shingleList(TextFunctions.tokens(col("text")), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(fast == hof)
    assert(fast(2L).count(_ == "alpha beta gamma") == 2) // duplicates kept
    assert(fast(3L).isEmpty)                             // < n tokens
  }

  test("nfcNormalize composes decomposed accents; NFC input passes through") {
    val decomposed = "cafe\u0301 nai\u0308ve" // base char + combining mark
    val composed = "caf\u00e9 na\u00efve"
    val d = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"))
      .toDF("id", "s")
    val out = d.select(col("id"),
      GraftExpressions.nfcNormalize(col("s")).as("n"),
      length(col("s")).as("lr"),
      length(GraftExpressions.nfcNormalize(col("s"))).as("ln"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(out(1L) == ((composed, 12, 10)))
    assert(out(2L) == ((composed, 10, 10)))
    assert(out(3L)._1 == "plain ascii")
  }

  test("simhashFromTokens == HOF bit-vote formulation") {
    val hof = texts.select(col("doc_id"), {
      val hashes = transform(array_distinct(TextFunctions.tokens(col("text"))),
        t => TextFunctions.hash60(t))
      (0 until 32).map { b =>
        val vote = aggregate(hashes, lit(0L),
          (acc, h) => acc + when(shiftright(h, b) % 2 === 1, 1L).otherwise(-1L))
        when(vote >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _).as("simhash")
    })
    val fast = Dedup.simhash32(texts, "doc_id", "text")
    assert(rows(fast).map(r => (r.getLong(0), r.getLong(1))).toSet ==
      rows(hof).map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("selfPairs emits ordered combinations") {
    val df = Seq(Seq(3L, 1L, 2L)).toDF("ids")
      .select(explode(GraftExpressions.selfPairs(sort_array(col("ids")))).as("p"))
      .select(col("p.a"), col("p.b"))
    assert(sortedRows(df) == Seq(Seq(1L, 2L), Seq(1L, 3L), Seq(2L, 3L)))
  }

  test("langIdFast handles null input and empty arrays") {
    val df = Seq(Some("the is of"), Some(""), None).toDF("t")
      .select(TextFunctions.langId(col("t")).as("lang"))
    assert(rows(df).map(r => Option(r.getString(0))) ==
      Seq(Some("en"), Some("und"), None))
  }
}
