package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hllDistinct estimates within design error and is insensitive to duplication") {
    val base = (1 to 400).map(i => ("g", s"key_$i"))
    // Heavy duplication: every key appears 5×; distinct count unchanged.
    val dup = Seq.fill(5)(base).flatten
    val df = dup.toDF("grp", "k")
    val out = rows(Sketches.hllDistinct(df, col("k"), Seq("grp")))
    assert(out.size == 1)
    val est = out.head.getAs[Double]("estimate")
    // m=64 ⇒ σ ≈ 13%; 3σ bound keeps the test deterministic-safe
    // (the sketch itself is fully deterministic given the key set).
    assert(math.abs(est - 400.0) / 400.0 < 0.4, s"estimate $est too far from 400")

    val once = rows(Sketches.hllDistinct(base.toDF("grp", "k"), col("k"), Seq("grp")))
    assert(once.head.getAs[Double]("estimate") == est,
      "estimate must depend only on the distinct key set")
  }

  test("hllDistinct registers merge across partitionings (repartition-invariant)") {
    val df = (1 to 300).map(i => (s"g${i % 3}", s"k$i")).toDF("grp", "k")
    val a = sortedRows(Sketches.hllDistinct(df, col("k"), Seq("grp")))
    val b = sortedRows(Sketches.hllDistinct(df.repartition(17), col("k"), Seq("grp")))
    assert(a == b, "two-level aggregation must be partition-order invariant")
  }

  test("small exact cardinalities produce distinct register states") {
    val df = Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("grp", "k")
    val out = rows(Sketches.hllDistinct(df, col("k"), Seq("grp")))
      .map(r => r.getAs[String]("grp") -> r.getAs[Long]("harmonic_q55")).toMap
    // Group a saw {x, y}, group b saw {x}: harmonic sums must differ.
    assert(out("a") != out("b"))
  }
}
