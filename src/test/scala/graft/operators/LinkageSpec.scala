package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("bestMatches: blocked, scored, ranked with deterministic ties") {
    val left = Seq((1L, "b1", "kitten"), (2L, "b1", "saturday"),
      (3L, "b2", "kitten")).toDF("id", "blk", "txt")
    val right = Seq(
      (10L, "b1", "kitten"),   // dist 0 to left 1
      (11L, "b1", "mitten"),   // dist 1
      (12L, "b1", "sitting"),  // dist 3 — over maxDist 2
      (13L, "b1", "bitten"),   // dist 1 — ties 11, higher id loses
      (20L, "b2", "sunday"))   // blocked away from left 1/2
      .toDF("id", "blk", "txt")
    val out = Linkage.bestMatches(left, right, "id", "id", Seq("blk"),
      "txt", "txt", maxDist = 2, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      (1L, 1, 0, 10L),   // exact match first
      (1L, 2, 1, 11L),   // dist-1 tie: lower right id ranks 2
      (1L, 3, 1, 13L)))
    // left 2: nothing within 2 of "saturday" in b1 ("sunday" is b2);
    // left 3: b2 holds only "sunday", dist 5 from "kitten" — absent.
  }

  test("bestMatches: self-linkage needs no upstream aliasing") {
    val docs = Seq((0L, "x", "alpha beta"), (1L, "x", "alpha betz"),
      (2L, "x", "zzzzzzzzzz")).toDF("doc_id", "src", "text")
    val out = Linkage.bestMatches(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "doc_id", Seq("src"), "text", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 1L)))
  }

  test("reciprocalBest: keeps only mutual argmax pairs") {
    import spark.implicits._
    // a↔b mutual best (10); c's best is b, but b's best is a; d's
    // best is c, but c's best is b — one-sided bests all drop.
    val pairs = Seq(
      ("a", "b", 10L), ("a", "c", 8L), ("b", "c", 9L), ("c", "d", 7L))
      .toDF("l", "r", "s")
    val got = Linkage.reciprocalBest(pairs, "l", "r", "s").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    assert(got == Seq(("a", "b", 10L)))
  }

  test("reciprocalBest: score ties break to the smaller partner, " +
      "and a tie can still be mutual") {
    import spark.implicits._
    val pairs = Seq(("a", "b", 5L), ("a", "c", 5L)).toDF("l", "r", "s")
    val got = Linkage.reciprocalBest(pairs, "l", "r", "s").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    assert(got == Seq(("a", "b", 5L)))
  }
}
