package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows on one hot key — the shape salting exists for.
  private val skewed = ((1 to 900).map(i => ("hot", i.toLong))
    ++ (1 to 100).map(i => (s"k${i % 10}", i.toLong)))
    .toDF("k", "v")

  test("saltedCount == plain groupBy count") {
    val plain = skewed.groupBy(col("k")).agg(count(lit(1)).as("n"))
    val salted = Skew.saltedCount(skewed, Seq("k"), salts = 8)
    assert(sortedRows(salted) == sortedRows(plain))
  }

  test("saltedAggregate supports sum-of-sums finals") {
    val plain = skewed.groupBy(col("k"))
      .agg(sum(col("v")).as("total"), count(lit(1)).as("n"))
    val salted = Skew.saltedAggregate(skewed, Seq("k"), salts = 8,
      partials = Seq("s_part" -> sum(col("v")), "n_part" -> count(lit(1))),
      finals = Seq(sum(col("s_part")).as("total"), sum(col("n_part")).as("n")))
    assert(sortedRows(salted) == sortedRows(plain))
  }

  test("saltedJoin == plain inner equi-join") {
    val dim = Seq(("hot", "HOT"), ("k1", "K1"), ("k5", "K5")).toDF("k", "label")
    val plain = skewed.join(dim, "k").select("k", "v", "label")
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8).select("k", "v", "label")
    assert(sortedRows(salted) == sortedRows(plain))
  }
}
