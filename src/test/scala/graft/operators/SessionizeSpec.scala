package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("edges surfaces the previous state per key in time order (pipeline.py:150-154)") {
    val df = Seq(
      ("d1", ts("2024-01-01 10:00:00"), 1L, "cleaning"),
      ("d1", ts("2024-01-01 10:01:00"), 2L, "cleaning"),
      ("d1", ts("2024-01-01 10:02:00"), 3L, "idle"),
      ("d2", ts("2024-01-01 10:00:30"), 4L, "idle"))
      .toDF("dev", "ts", "id", "state")
    val out = Sessionize.edges(df, "dev", "ts", "id", "state")
      .filter(Normalize.isCleaning(col("prev_state")) && Normalize.isIdle(col("state")))
    assert(rows(out).map(_.getAs[Long]("id")) == Seq(3L))
  }

  test("gapSessions starts a new session after the gap, 0-based per key") {
    val df = Seq(
      ("d1", ts("2024-01-01 10:00:00"), 1L),
      ("d1", ts("2024-01-01 10:30:00"), 2L),   // 1800 s gap, same session
      ("d1", ts("2024-01-01 12:00:00"), 3L),   // 5400 s gap, new session
      ("d2", ts("2024-01-01 00:00:00"), 4L))
      .toDF("dev", "ts", "id")
    val out = Sessionize.gapSessions(df, "dev", "ts", "id", 3600)
      .select(col("dev"), col("id"), col("session_id"))
    assert(sortedRows(out) == Seq(
      Seq("d1", 1L, 0L), Seq("d1", 2L, 0L), Seq("d1", 3L, 1L), Seq("d2", 4L, 0L)))
  }
}
