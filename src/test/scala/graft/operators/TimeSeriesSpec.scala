package graft.operators

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("groupTrend: exact rational slope, sign, and the no-slope NULL") {
    val obs = Seq(
      // A: y = 2x exactly -> num/den = 12/6 = 2, rising.
      ("A", 0L, 0L), ("A", 1L, 2L), ("A", 2L, 4L),
      // B: falling.
      ("B", 0L, 5L), ("B", 1L, 3L),
      // C: one distinct x -> den = 0, trend NULL.
      ("C", 4L, 1L), ("C", 4L, 7L))
      .toDF("k", "x", "y")
    val got = TimeSeries.groupTrend(obs, "k", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) null else r.getInt(4)))).toMap
    assert(got("A") == ((3L, 12L, 6L, 1)))
    assert(got("B") == ((2L, -2L, 1L, -1)))
    assert(got("C") == ((2L, 0L, 0L, null)))
  }

  test("groupTrend: flat series scores zero trend with positive den") {
    val obs = Seq(("F", 0L, 7L), ("F", 3L, 7L), ("F", 9L, 7L))
      .toDF("k", "x", "y")
    val r = TimeSeries.groupTrend(obs, "k", "x", "y").head()
    assert(r.getLong(2) == 0L && r.getLong(3) > 0L && r.getInt(4) == 0)
  }

  test("decayedCounts: shift-exact halving, negative-age clamp, 62 cap") {
    import org.apache.spark.sql.functions.lit
    val obs = Seq(
      ("hot", 0L),       // full weight
      ("hot", 7L),       // one half-life -> 500
      ("hot", 15L),      // two (15 div 7 = 2) -> 250
      ("hot", -3L),      // future-dated clamps to full weight
      ("cold", 7000L),   // ~1000 half-lives: capped shift -> 0
      ("cold", 70L))     // 10 half-lives of weight 1000 -> 0 (floored)
      .toDF("k", "age")
    val got = TimeSeries.decayedCounts(obs, "k", "age", lit(1000L), 7L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got("hot") == ((4L, 1000L + 500L + 250L + 1000L)))
    assert(got("cold") == ((2L, 0L))) // horizon: weight vanished
  }
}
