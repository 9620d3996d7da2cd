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

  test("keySkew: hot-key share, NULLs counted apart, integer salt advice") {
    // 90 rows on "hot", 10 spread, 5 NULL keys; 10 reducers.
    val df = ((1 to 90).map(_ => Some("hot")) ++
      (1 to 10).map(i => Some(s"k$i")) ++
      (1 to 5).map(_ => None)).toDF("k")
    val r = Skew.keySkew(df, "k", parts = 10).collect().head
    assert(r.getAs[Long]("n_rows") == 105L)
    assert(r.getAs[Long]("n_null_keys") == 5L)
    assert(r.getAs[Long]("n_keys") == 11L)
    assert(r.getAs[String]("top_key") == "hot")
    assert(r.getAs[Long]("top_count") == 90L)
    // round(1e6*90/105) = 857143; ceil(90*10/105) = 9 salts.
    assert(r.getAs[Long]("top_share_micro") == 857143L)
    assert(r.getAs[Long]("suggested_salts") == 9L)
    // Balanced key set: 1 = no salting needed.
    val bal = (1 to 10).flatMap(i => Seq(s"b$i", s"b$i")).toDF("k")
    val rb = Skew.keySkew(bal, "k", parts = 10).collect().head
    assert(rb.getAs[Long]("suggested_salts") == 1L)
  }
}
