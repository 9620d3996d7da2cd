package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("dsirWeights scores target-like docs above off-target docs") {
    // Target docs speak 'physics'; raw background speaks 'sports'.
    val docs = (
      (1L to 20L).map(i => (i, "quark lepton boson gauge field", "sci")) ++
      (21L to 40L).map(i => (i, "goal match team score league", "web")) ++
      Seq((41L, "quark boson field theory", "web"),      // sci-like in web
          (42L, "match score league cup", "web")))       // web-like
      .toDF("doc_id", "text", "src")
    val out = Training.dsirWeights(docs, "doc_id", "text",
      isTarget = col("src") === "sci", nBuckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // The sci-like outsider must outrank the web-like one.
    assert(out(41L) > out(42L))
    // And target members themselves score positive per-token.
    assert(out(1L) > 0.0)
  }

  test("dsirWeights: integer micro-nat scores are partition-order stable") {
    val docs = (1L to 200L)
      .map(i => (i, s"w${i % 7} w${i % 11} w${i % 13}", i % 3 == 0L))
      .toDF("doc_id", "text", "is_t")
    val a = Training.dsirWeights(docs.repartition(1), "doc_id", "text",
      col("is_t"), 32).orderBy("doc_id").collect().toSeq
    val b = Training.dsirWeights(docs.repartition(13), "doc_id", "text",
      col("is_t"), 32).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("dsirWeights: n_tokens counts occurrences, score is their bucket sum") {
    val docs = Seq((1L, "x x y", true), (2L, "y", false)).toDF("id", "text", "t")
    val out = Training.dsirWeights(docs, "id", "text", col("t"), 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._1 == 3L && out(2L)._1 == 1L)
    // Shared vocabulary, add-1 smoothing: doc 1 (all target tokens)
    // must score strictly above doc 2 on the same 'y' bucket scale.
    assert(out(1L)._2 > out(2L)._2)
  }
}
