package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // (zip, age, diagnosis) — the textbook quasi-identifier shape.
  private def people = Seq(
    ("02138", 29, "a"), ("02138", 29, "b"), ("02138", 29, "c"),
    ("02139", 31, "a"), ("02139", 32, "b"),
    ("94305", 45, "c")).toDF("zip", "age", "dx")

  test("kAnonymityClasses: class sizes and verdicts") {
    val out = Privacy.kAnonymityClasses(
        people, Seq(col("zip"), col("age")), k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1),
        r.getLong(2), r.getBoolean(3))).toSet
    assert(out == Set(
      ("02138", 29, 3L, true),
      ("02139", 31, 1L, false),
      ("02139", 32, 1L, false),
      ("94305", 45, 1L, false)))
  }

  test("kAnonymityClasses: NULL quasi values form a real class") {
    val df = Seq((Some("a"), 1), (None, 1), (None, 1)).toDF("zip", "age")
    val out = Privacy.kAnonymityClasses(df, Seq(col("zip"), col("age")), 2)
      .collect().map(r => (Option(r.getString(0)), r.getLong(2))).toSet
    assert(out == Set((Some("a"), 1L), (None, 2L)))
  }

  test("generalizationLadder: coarser levels cost less suppression") {
    val ladder = Privacy.generalizationLadder(people, Seq(
      0 -> Seq(col("zip").as("z"), col("age").as("a")),
      1 -> Seq(col("zip").as("z"), lit(null).cast("int").as("a")),
      2 -> Seq(lit(null).cast("string").as("z"),
        lit(null).cast("int").as("a"))), k = 3)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // L0: classes {3,1,1,1} → 3 sub-k classes, 3 rows suppressed.
    assert(ladder(0) == (6L, 4L, 3L, 3L))
    // L1: zip-only classes {3,2,1} → two sub-k classes, 3 rows.
    assert(ladder(1) == (6L, 3L, 2L, 3L))
    // L2: everything in one class of 6 → nothing suppressed.
    assert(ladder(2) == (6L, 1L, 0L, 0L))
  }

  test("generalizationLadder is one scan: a single gather shuffle pair") {
    val plan = Privacy.generalizationLadder(people, Seq(
      0 -> Seq(col("zip").as("z")),
      1 -> Seq(lit(null).cast("string").as("z"))), k = 2)
      .queryExecution.executedPlan.toString
    // One explode (Generate), no join, no union of per-level scans.
    assert(!plan.contains("Union"), s"ladder re-scanned per level:\n$plan")
    assert(plan.contains("Generate"), s"expected one explode:\n$plan")
  }
}
