package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunkWithOverlap: starts every stride, last window reaches the end") {
    // 10 tokens, maxLen=4, stride=3 → starts 0,3,6 cover 0..9
    // (ceil((10-4)/3)=2 extra starts), windows of 4,4,4 tokens… the
    // last start 6 gives tokens 7..10.
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val out = Training.chunkWithOverlap(
      Seq((7L, text)).toDF("id", "text"), "id", "text", maxLen = 4, stride = 3)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.toSeq.sorted == Seq((0, 1, 4L), (1, 4, 4L), (2, 7, 4L)))
  }

  test("chunkWithOverlap: short doc is one full chunk; empty doc drops") {
    val out = Training.chunkWithOverlap(
      Seq((1L, "a b"), (2L, "   ")).toDF("id", "text"),
      "id", "text", maxLen = 16, stride = 12)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 0, 2L)))
  }

  test("chunkWithOverlap: overlap tokens appear in both neighbors") {
    val text = (1 to 6).map(i => s"w$i").mkString(" ")
    val chunks = Training.chunkWithOverlap(
      Seq((1L, text)).toDF("id", "text"), "id", "text", maxLen = 4, stride = 2)
      .collect()
    // starts 0, 2: chunks w1..w4 and w3..w6 — hash equality of the
    // overlap region is implied by the token slice arithmetic; check
    // boundaries via start_tok + n_tokens.
    val spans = chunks.map(r => (r.getInt(2), r.getInt(2) + r.getLong(3) - 1))
    assert(spans.toSeq.sorted == Seq((1L, 4L), (3L, 6L)))
  }

  test("cdcChunks: identical docs are 100% duplicated, unique doc 0%") {
    val dup = "alpha beta gamma delta epsilon zeta eta theta " * 3
    val docs = Seq((1L, dup), (2L, dup), (3L, "one two three four five"))
      .toDF("id", "text")
    val out = Dedup.cdcChunks(docs, "id", "text", boundaryMod = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(out(1L) == 1.0 && out(2L) == 1.0)
    assert(out(3L) == 0.0)
  }

  test("cdcChunks: a prefix insertion does not break tail chunk alignment") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val shifted = "inserted " + base
    val out = Dedup.cdcChunks(
      Seq((1L, base), (2L, shifted)).toDF("id", "text"),
      "id", "text", boundaryMod = 4)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toMap
    // Content-defined cuts realign after the first boundary past the
    // insertion: both docs must share most duplicated tokens.
    assert(out(1L) >= 30L && out(2L) >= 30L)
  }

  test("cdcChunks token accounting is exact") {
    val docs = Seq((1L, "a b c d e f g h i j")).toDF("id", "text")
    val r = Dedup.cdcChunks(docs, "id", "text", boundaryMod = 8).collect().head
    assert(r.getLong(1) == 10L)                 // n_tokens
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L) // no dups alone
  }

  test("cdc boundary rate is plausible (hash60 mod spreads)") {
    // Sanity on the boundary predicate itself: over 1000 distinct
    // tokens, roughly 1/8 should cut (binomial bounds, wide margin).
    val n = Seq.tabulate(1000)(i => Tuple1(s"token$i")).toDF("t")
      .select(when(TextFunctions.hash60(col("t")) % 8 === 0, 1L)
        .otherwise(0L).as("cut"))
      .agg(sum("cut")).collect().head.getLong(0)
    assert(n > 60L && n < 200L, s"boundary count $n outside [60,200]")
  }
}
