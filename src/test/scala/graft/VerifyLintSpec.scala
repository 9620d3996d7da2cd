package graft

import org.apache.spark.sql.functions._

/** Seeded-regression coverage for the two Verify dump lints: the r14
  * output-type lint and the r16 rounding-boundary argmin lint (the
  * r15 q402 driver-hash lesson — a float-rounded min/max(struct) key
  * flips the elected row on a 1-ulp FMA/libm difference whenever
  * candidates sit on the .5 boundary). */
class VerifyLintSpec extends SparkSpec {
  import spark.implicits._

  test("fragileArgminLint: flags a multi-op float round argmin key") {
    val df = Seq(("a", 1.0, 2.0, 1L), ("a", 3.0, 4.0, 2L))
      .toDF("g", "x", "y", "id")
    val fragile = df.groupBy($"g").agg(min(struct(
      round($"x" / $"y" * lit(2.0)).cast("long").as("k"),
      $"id".as("v"))).as("w"))
    assert(Verify.fragileArgminLint(fragile).nonEmpty)
  }

  test("fragileArgminLint: one correctly-rounded float op is exempt") {
    // mmrRerank's idiom: round(<exact long> / 1000.0) is a SINGLE
    // IEEE-754 divide — correctly rounded on any compliant engine,
    // no chain for FMA contraction to perturb. Not fragile.
    val df = Seq(("a", 10L, 1L)).toDF("g", "m", "id")
    val ok = df.groupBy($"g").agg(min(struct(
      round($"m".cast("double") / lit(1000.0)).cast("long").as("k"),
      $"id".as("v"))).as("w"))
    assert(Verify.fragileArgminLint(ok).isEmpty)
  }

  test("fragileArgminLint: fixed decisionStump plan is clean") {
    val df = Seq(("f", 1.0, true), ("f", 2.0, true),
      ("f", 3.0, false), ("f", 4.0, false)).toDF("feat", "v", "y")
    val stump = operators.Profile.decisionStump(df, "feat", "v", "y")
    assert(Verify.fragileArgminLint(stump).isEmpty)
    assert(Verify.outputTypeLint(stump.schema).isEmpty)
  }

  test("fragileArgminLint: traces the key through a prior alias") {
    val df = Seq(("a", 1.0, 2.0, 1L)).toDF("g", "x", "y", "id")
    val pre = df.select($"g",
      round($"x" / $"y" * lit(3.0)).cast("long").as("k"), $"id")
    val fragile = pre.groupBy($"g")
      .agg(max(struct($"k", $"id".as("v"))).as("w"))
    assert(Verify.fragileArgminLint(fragile).nonEmpty)
  }

  test("fragileArgminLint: integer and non-round struct keys clean") {
    val df = Seq(("a", 5L, 1L)).toDF("g", "d2", "b")
    val ok = df.groupBy($"g")
      .agg(min(struct($"d2", $"b")).as("w"))
    assert(Verify.fragileArgminLint(ok).isEmpty)
  }
}
