package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("custom functions are callable from SQL after runtime registration") {
    val spark = graft.Graft.session("graft-ext-test", cpus = 2)
    GraftExtensions.register(spark)
    try {
      val r = spark.sql(
        """SELECT
          |  graft_simhash(array('the', 'quick', 'fox')) AS sh,
          |  graft_lang_id(array('the', 'cat', 'is')) AS lang,
          |  size(graft_minhash(array('a','b','c','d','e'))) AS k,
          |  size(graft_self_pairs(array(1L, 2L, 3L))) AS np,
          |  graft_sorted_shingles(array('b', 'c', 'a', 'b', 'c')) AS sh3,
          |  graft_jaccard_sorted(array('a', 'b'), array('b', 'c')) AS jac,
          |  graft_dot_q(array(2L, 3L), array(5L, 7L)) AS dot,
          |  graft_ws_tokens('  Foo\tBAR\nbaz  ') AS toks
          |""".stripMargin).head()
      assert(r.getAs[Long]("sh") >= 0)
      assert(r.getAs[String]("lang") == "en")
      assert(r.getAs[Int]("k") == 16)
      assert(r.getAs[Int]("np") == 3)
      assert(r.getSeq[String](r.fieldIndex("sh3")) == Seq("a b c", "b c a", "c a b"))
      assert(math.abs(r.getAs[Double]("jac") - 1.0 / 3.0) < 1e-12)
      assert(r.getAs[Long]("dot") == 31L)
      assert(r.getSeq[String](r.fieldIndex("toks")) == Seq("foo", "bar", "baz"))
      // same result as the Column-API path
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val viaApi = graft.operators.Dedup
        .simhash32(Seq((1L, "the quick fox")).toDF("id", "text"), "id", "text")
        .head().getLong(1)
      assert(r.getAs[Long]("sh") == viaApi)
    } finally {
      // leave the shared session for other suites (getOrCreate semantics)
    }
  }
}
