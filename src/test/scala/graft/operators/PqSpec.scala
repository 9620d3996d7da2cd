package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 8-dim toy space, 2 subspaces of 4 dims, 4 codes: four well-
  // separated base patterns (ids 0-3 = the codebook seeds), exact
  // copies at ids 10-13, and a query (id 20) copying pattern 2.
  private val base = Seq(
    Seq(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f),
    Seq(0f, 1f, 0f, 0f, 0f, 1f, 0f, 0f),
    Seq(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f),
    Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, 1f))
  private lazy val vecs = (
    base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
    base.zipWithIndex.map { case (v, i) => (i + 10L, v) } ++
    Seq((20L, base(2)))).toDF("vec_id", "embedding")

  private lazy val cb =
    Similarity.pqCodebook(vecs, "vec_id", "embedding", m = 2, subDim = 4, nCodes = 4)

  test("pqCodebook: one entry per (subspace, code), codes are seed ranks") {
    val rows = cb.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(rows == (for (m <- 0 to 1; c <- 0L to 3L) yield (m, c)).toSet)
  }

  test("pqEncode: seed copies get their seed's code in every subspace") {
    val codes = Similarity.pqEncode(vecs, "vec_id", "embedding", cb, 2, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (i <- 0 to 3; m <- 0 to 1) {
      assert(codes((i.toLong, m)) == i.toLong)      // seeds self-encode
      assert(codes((i + 10L, m)) == i.toLong)       // copies follow
    }
  }

  test("pqTopK: ADC distance 0 to exact copies, they rank first") {
    val codes = Similarity.pqEncode(vecs, "vec_id", "embedding", cb, 2, 4)
    val out = Similarity.pqTopK(codes, cb,
      vecs.filter(col("vec_id") === 20L), "vec_id", "embedding",
      k = 3, m = 2, subDim = 4)
      .orderBy("rank")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    // Pattern-2 carriers (ids 2, 12) have ADC 0 and come first, id asc.
    assert(out.take(2).toSeq == Seq((1, 2L, 0L), (2, 12L, 0L)))
    // The rank-3 neighbor is some other pattern at a strictly
    // positive integer distance.
    assert(out(2)._3 > 0L)
  }

  test("pqTopK is deterministic across partitionings") {
    val a = {
      val codes = Similarity.pqEncode(vecs.repartition(1), "vec_id", "embedding", cb, 2, 4)
      Similarity.pqTopK(codes, cb, vecs.filter(col("vec_id") < 2),
        "vec_id", "embedding", 5, 2, 4).orderBy("query_id", "rank").collect().toSeq
    }
    val b = {
      val codes = Similarity.pqEncode(vecs.repartition(7), "vec_id", "embedding", cb, 2, 4)
      Similarity.pqTopK(codes, cb, vecs.filter(col("vec_id") < 2),
        "vec_id", "embedding", 5, 2, 4).orderBy("query_id", "rank").collect().toSeq
    }
    assert(a == b)
  }
}
