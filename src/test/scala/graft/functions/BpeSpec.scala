package graft.functions

import graft.SparkSpec
import graft.operators.Corpus
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def encode(tok: String, merges: Seq[(String, String)]): Seq[String] =
    Seq(Tuple1(tok)).toDF("t")
      .select(GraftExpressions.bpeEncode(col("t"), merges).as("p"))
      .collect().head.getSeq[String](0)

  test("bpeEncode applies merges by rank, all occurrences left-to-right") {
    assert(encode("abab", Seq(("a", "b"))) == Seq("ab", "ab"))
    // Rank order: ("a","b") fires before ("ab","c") can exist.
    assert(encode("abc", Seq(("a", "b"), ("ab", "c"))) == Seq("abc"))
    // Lower rank wins even when listed later in the word:
    // "cab" → rank0 (a,b) first → c, ab → rank1 (c,ab) → cab.
    assert(encode("cab", Seq(("a", "b"), ("c", "ab"))) == Seq("cab"))
    // Overlapping occurrences merge left-to-right: "aaa" + (a,a) → aa, a.
    assert(encode("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
    // No applicable merge: stays code points.
    assert(encode("xyz", Seq(("a", "b"))) == Seq("x", "y", "z"))
    // Empty merge list = pure code-point split (surrogate-safe).
    assert(encode("a😀b", Nil) == Seq("a", "😀", "b"))
    assert(encode("a", Seq(("a", "b"))) == Seq("a"))
  }

  test("bpeTrain learns (count desc, pair asc) merges and stops when dry") {
    // Tokens: "aa"×2, "ab"×1 → round 1 adopts (a,a) [count 2].
    // Round 2: "aa"→[aa] has no pair; "ab" pairs (a,b) count 1 < 2 → dry.
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    assert(Corpus.bpeTrain(docs, "text", nMerges = 5) == Seq(("a", "a")))
    // Frequent bigram chain: "abab"×3 → (a,b), then (ab,ab).
    val docs2 = Seq((1L, "abab abab abab")).toDF("doc_id", "text")
    assert(Corpus.bpeTrain(docs2, "text", nMerges = 5) ==
      Seq(("a", "b"), ("ab", "ab")))
    // The trained merges round-trip through the encoder.
    assert(encode("abab", Corpus.bpeTrain(docs2, "text", 5)) == Seq("abab"))
  }

  test("batched bpeTrain == serial bpeTrain (conflicts, ties, chains)") {
    // A corpus engineered to exercise the batch cut rules: the top
    // pairs share tokens ((l,o) vs (o,w): conflict cut), counts tie at
    // the boundary, and merges chain ((l,o) then (lo,w)) so later
    // rounds depend on earlier adoptions.
    val docs = Seq(
      (1L, "low low low low lower lower lowest"),
      (2L, "new newer newest new new newer"),
      (3L, "wide wider widest wide wide"),
      (4L, "slow slower slowest slow slow low new wide")
    ).toDF("doc_id", "text")
    val serial = Corpus.bpeTrain(docs, "text", nMerges = 24, batchMerges = 1)
    val batched = Corpus.bpeTrain(docs, "text", nMerges = 24)
    assert(batched == serial)
    // And with an awkward batch width that forces mid-batch boundaries.
    assert(Corpus.bpeTrain(docs, "text", nMerges = 24, batchMerges = 3)
      == serial)
  }

  test("batched bpeTrain matches serial on the sf0.001 documents fixture") {
    val docs = graft.Graft.table(spark, "/root/testdata/sf0.001", "documents")
    val serial = Corpus.bpeTrain(docs, "text", nMerges = 12, batchMerges = 1)
    val batched = Corpus.bpeTrain(docs, "text", nMerges = 12)
    assert(batched == serial)
  }
}
