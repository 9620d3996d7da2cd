package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(items: Seq[String], k: Int, parts: Int): Map[String, Long] =
    items.toDF("item").repartition(parts)
      .agg(MisraGriesAggregate.misraGries(col("item"), k).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.item"), col("e.wt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  // A skewed stream: "hot" 40%, "warm" 20%, tail of 200 singletons-ish.
  private val stream: Seq[String] = {
    val n = 1000
    val hot = Seq.fill(400)("hot")
    val warm = Seq.fill(200)("warm")
    val tail = (0 until 400).map(i => s"t${i % 200}")
    // Deterministic interleave (no Random): round-robin by index hash.
    (hot ++ warm ++ tail).zipWithIndex
      .sortBy { case (s, i) => (i * 2654435761L + s.hashCode) & 0x7fffffffL }
      .map(_._1)
  }

  test("every item above n/(k+1) is present, under any partitioning") {
    val n = stream.size
    val k = 9
    val exact = stream.groupBy(identity).map { case (s, v) => s -> v.size.toLong }
    val heavy = exact.filter { case (_, c) => c * (k + 1) > n }.keySet
    assert(heavy == Set("hot", "warm"), "fixture sanity: two heavy items")
    for (parts <- Seq(1, 3, 13)) {
      val mg = sketch(stream, k, parts)
      assert(heavy.subsetOf(mg.keySet),
        s"guarantee broken at parts=$parts: $heavy not all in ${mg.keySet}")
      assert(mg.size <= k, s"summary exceeded k entries: ${mg.size}")
    }
  }

  test("weights are lower bounds undercounting by at most n/(k+1)") {
    val n = stream.size
    val k = 9
    val exact = stream.groupBy(identity).map { case (s, v) => s -> v.size.toLong }
    for (parts <- Seq(1, 7)) {
      val mg = sketch(stream, k, parts)
      mg.foreach { case (item, wt) =>
        val truth = exact(item)
        assert(wt <= truth, s"$item: weight $wt exceeds true count $truth")
        assert(truth - wt <= n / (k + 1) + 1,
          s"$item: undercount ${truth - wt} exceeds bound ${n / (k + 1)}")
      }
    }
  }

  test("a stream with ≤ k distinct items is counted exactly") {
    val s = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val mg = sketch(s, k = 4, parts = 3)
    assert(mg == Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
  }

  test("NULL items contribute nothing; grouped sketches stay per-group") {
    val df = Seq(("g1", Some("x")), ("g1", Some("x")), ("g1", None),
        ("g2", Some("y"))).toDF("g", "item")
    val out = df.groupBy("g")
      .agg(MisraGriesAggregate.misraGries(col("item"), 4).as("mg"))
      .select(col("g"), explode(col("mg")).as("e"))
      .select(col("g"), col("e.item"), col("e.wt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(("g1", "x", 2L), ("g2", "y", 1L)))
  }

  test("output is sorted (wt desc, item asc)") {
    val s = Seq("b", "b", "a", "a", "c")
    val arr = s.toDF("item")
      .agg(MisraGriesAggregate.misraGries(col("item"), 8).as("mg"))
      .select(col("mg")).collect().head.getSeq[Row](0)
    val pairs = arr.map(r => (r.getString(0), r.getLong(1)))
    assert(pairs == Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }
}
