package graft.operators

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: updates win, absent keys carry over, new keys insert, NULL updates still win") {
    val current = Seq((1L, Some(10), "a"), (2L, Some(20), "b"), (3L, Some(30), "c"))
      .toDF("k", "v", "s")
    val updates = Seq((2L, Some(99), "B"), (3L, None: Option[Int], "C"), (4L, Some(40), "d"))
      .toDF("k", "v", "s")
    val got = Incremental.upsert(current, updates, Seq("k"))
      .as[(Long, Option[Int], String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, Some(10), "a"),   // untouched
      (2L, Some(99), "B"),   // replaced
      (3L, None, "C"),       // replaced INCLUDING the null payload value
      (4L, Some(40), "d")))  // inserted
  }

  test("upsert is idempotent: empty updates and self-updates are no-ops") {
    val current = Seq((1L, 10, "a"), (2L, 20, "b")).toDF("k", "v", "s")
    val empty = current.filter($"k" < 0)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Int, String)].collect().sortBy(_._1).toSeq
    assert(norm(Incremental.upsert(current, empty, Seq("k"))) == norm(current))
    assert(norm(Incremental.upsert(current, current, Seq("k"))) == norm(current))
  }

  test("upsert rejects mismatched schemas (names and types)") {
    val current = Seq((1L, 1)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Incremental.upsert(current, Seq((1L, 1)).toDF("k", "w"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      // Same names, different type — silent coercion would mutate the
      // state table's schema.
      Incremental.upsert(current, Seq((1L, "x")).toDF("k", "v"), Seq("k"))
    }
  }
}
