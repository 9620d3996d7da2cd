package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("columnProfile: completeness, cardinality, typed min/max in one pass") {
    val df = Seq(
      (1L, Some("b"), 10),
      (2L, None, 5),
      (3L, Some("a"), 10))
      .toDF("id", "s", "v")
    val got = Profile.columnProfile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5)))).toMap
    assert(got("id") == ((3L, 0L, 3L, "1", "3")))
    assert(got("s") == ((3L, 1L, 2L, "a", "b")))
    // Typed min/max: numeric 5 < 10 even though "10" < "5" as strings.
    assert(got("v") == ((3L, 0L, 2L, "5", "10")))
  }

  test("columnProfile: all-NULL column profiles NULL min/max, 0 distinct") {
    val df = Seq(1, 2).toDF("x")
      .withColumn("dead", lit(null).cast("string"))
    val r = Profile.columnProfile(df, Seq("dead")).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("checkConstraints: NULL verdicts count as violations") {
    val df = Seq[(java.lang.Long, String)](
      (5L, "A"), (60L, "N"), (null, "X"))
      .toDF("q", "f")
    val got = Profile.checkConstraints(df, Seq(
        "q_le_50" -> (col("q") <= 50), // NULL q -> violation
        "f_domain" -> col("f").isin("A", "N")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "q_le_50" -> ((3L, 2L)),   // 60 fails, NULL fails
      "f_domain" -> ((3L, 1L)))) // X fails
  }

  test("histogramDrift: one-sided buckets zero-fill, exact micro deltas") {
    val old = Seq(0, 0, 0, 1).toDF("bucket")      // 75% / 25%
    val neu = Seq(0, 1, 1, 2).toDF("bucket")      // 25% / 50% / 25%
    val got = Profile.histogramDrift(old, neu, "bucket")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got(0) == ((3L, 1L, 750000L, 250000L, 500000L)))
    assert(got(1) == ((1L, 2L, 250000L, 500000L, 250000L)))
    // Bucket 2 exists only in the new snapshot: old side zero-fills.
    assert(got(2) == ((0L, 1L, 0L, 250000L, 250000L)))
  }

  test("fkViolations: dangling keys surface, NULL fks are not violations") {
    val fact = Seq[(java.lang.Long, String)](
      (1L, "ok"), (7L, "dangling"), (null, "absent"))
      .toDF("fk", "tag")
    val dim = Seq(1L, 2L).toDF("pk")
    val got = Profile.fkViolations(fact, "fk", dim, "pk")
      .collect().map(_.getString(1)).toSeq
    assert(got == Seq("dangling"))
  }
}
