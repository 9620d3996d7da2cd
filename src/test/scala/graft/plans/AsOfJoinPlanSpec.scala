package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class AsOfJoinPlanSpec extends SparkSpec {
  import spark.implicits._

  private def quotes: DataFrame = Seq(
    ("aapl", 1L, 100.0), ("aapl", 5L, 105.0), ("aapl", 9L, 109.0),
    ("msft", 4L, 40.0),
    ("none", 7L, 7.0)) // key never queried
    .toDF("k", "rt", "px")

  test("as-of semantics: latest ≤, tie matches, before-first nulls") {
    val trades = Seq(
      ("aapl", 0L, "t0"), // before first quote -> null
      ("aapl", 5L, "t1"), // tie with rt=5 -> matches 105
      ("aapl", 8L, "t2"), // latest ≤ 8 is rt=5
      ("aapl", 99L, "t3"), // beyond all -> 109
      ("msft", 3L, "t4"), // before msft's only quote -> null
      ("zzzz", 5L, "t5")) // key absent from right -> null
      .toDF("k", "lt", "tag")
    val got = AsOfJoinPlan.join(trades, quotes, Seq("k"), "lt", "rt")
      .collect()
      .map(r => r.getString(2) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(got == Map("t0" -> null, "t1" -> 105.0, "t2" -> 105.0,
      "t3" -> 109.0, "t4" -> null, "t5" -> null))
  }

  test("the custom exec actually plans, and survives repartitioned inputs") {
    val trades = Seq(("aapl", 8L, "x")).toDF("k", "lt", "tag")
    val df = AsOfJoinPlan.join(
      trades.repartition(7, col("k")), quotes.repartition(3),
      Seq("k"), "lt", "rt")
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    assert(df.collect().map(_.getDouble(3)).toSeq == Seq(105.0))
  }

  test("parity with a brute-force reference on seeded random data, any partitioning") {
    val rnd = new scala.util.Random(42)
    val leftRows = Seq.tabulate(400)(i =>
      (s"k${rnd.nextInt(12)}", rnd.nextInt(1000).toLong, i.toLong))
    val rightRows = Seq.tabulate(300)(j =>
      (s"k${rnd.nextInt(15)}", rnd.nextInt(1000).toLong, j.toLong))
    // Right times unique per key (the documented determinism
    // contract): drop duplicate (key, time) pairs keeping max payload.
    val rightDedup = rightRows.groupBy(r => (r._1, r._2))
      .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toSeq
    val expected = leftRows.map { case (k, lt, id) =>
      val m = rightDedup.filter(r => r._1 == k && r._2 <= lt)
      id -> (if (m.isEmpty) null
             else java.lang.Long.valueOf(m.maxBy(_._2)._3))
    }.toMap
    for (parts <- Seq(1, 5)) {
      val l = leftRows.toDF("k", "lt", "lid").repartition(parts)
      val r = rightDedup.toDF("k", "rt", "rid").repartition(parts + 2)
      val got = AsOfJoinPlan.join(l, r, Seq("k"), "lt", "rt")
        .collect()
        .map(x => x.getLong(2) ->
          (if (x.isNullAt(3)) null else java.lang.Long.valueOf(x.getLong(3))))
        .toMap
      assert(got == expected, s"parity failed at parts=$parts")
    }
  }

  test("self-lineage right side is re-rooted, not mis-resolved") {
    val base = Seq(("a", 1L, 10L), ("a", 5L, 50L), ("b", 2L, 20L))
      .toDF("k", "t", "v")
    // State = the same frame, shifted: as-of against its own lineage.
    val right = base.select(col("k"), (col("t") + 1L).as("rt"),
      (col("v") * 100L).as("sv"))
    val got = AsOfJoinPlan.join(base, right, Seq("k"), "t", "rt")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) null else java.lang.Long.valueOf(r.getLong(3))))
      .toMap
    // rt values: a->2 (sv 1000), a->6 (sv 5000), b->3 (sv 2000).
    assert(got == Map(("a", 1L) -> null, ("a", 5L) -> 1000L,
      ("b", 2L) -> null))
  }

  test("NULL times: left NULL never matches; right NULLs are ignored") {
    val l = Seq[(String, java.lang.Long, String)](
      ("a", null, "ln"), ("a", 9L, "l9")).toDF("k", "lt", "tag")
    val r = Seq[(String, java.lang.Long, Long)](
      ("a", null, 666L), ("a", 3L, 3L)).toDF("k", "rt", "rid")
    val got = AsOfJoinPlan.join(l, r, Seq("k"), "lt", "rt")
      .collect()
      .map(x => x.getString(2) ->
        (if (x.isNullAt(3)) null else java.lang.Long.valueOf(x.getLong(3))))
      .toMap
    assert(got == Map("ln" -> null, "l9" -> 3L))
  }

  test("timestamp time columns work; wrong types are rejected") {
    val l = Seq(("a", "2024-01-01 00:00:05")).toDF("k", "ts")
      .select(col("k"), col("ts").cast("timestamp").as("lt"))
    val r = Seq(("a", "2024-01-01 00:00:03", 3L),
        ("a", "2024-01-01 00:00:07", 7L))
      .toDF("k", "ts", "rid")
      .select(col("k"), col("ts").cast("timestamp").as("rt"), col("rid"))
    val got = AsOfJoinPlan.join(l, r, Seq("k"), "lt", "rt").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(3L))
    val bad = intercept[IllegalArgumentException] {
      AsOfJoinPlan.join(
        Seq(("a", "x")).toDF("k", "lt"), r, Seq("k"), "lt", "rt")
    }
    assert(bad.getMessage.contains("BIGINT or TIMESTAMP"))
  }

  test("composes with Structured Streaming: as-of state enrichment per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // The streaming shape the reference's state lookup models (J1/J2):
    // each micro-batch of readings joins the latest config AT OR
    // BEFORE its time — the custom strategy must plan inside
    // foreachBatch exactly as in batch.
    val state = Seq(("dev1", 0L, "cfgA"), ("dev1", 100L, "cfgB"))
      .toDF("k", "rt", "cfg")
    val input = MemoryStream[(String, Long, String)](spark)
    val sink = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val q = input.toDF().toDF("k", "lt", "tag").writeStream
      .outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          AsOfJoinPlan.join(batch, state, Seq("k"), "lt", "rt")
            .collect().foreach(r => sink.synchronized {
              sink += ((r.getString(2),
                if (r.isNullAt(3)) null else r.getString(3)))
            })
      }
      .start()
    try {
      input.addData(("dev1", 50L, "t1"), ("dev1", 150L, "t2"),
        ("dev1", -5L, "t3"))
      q.processAllAvailable()
    } finally q.stop()
    assert(sink.toMap == Map("t1" -> "cfgA", "t2" -> "cfgB",
      "t3" -> null))
  }

  test("mismatched key or time types are rejected, not mis-merged") {
    val l = Seq((1, 5L)).toDF("k", "lt") // key INT
    val r = Seq((1L, 3L, "p")).toDF("k", "rt", "v") // key BIGINT
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoinPlan.join(l, r, Seq("k"), "lt", "rt")
    }
    assert(e1.getMessage.contains("key 'k' type mismatch"))
    // TIMESTAMP left vs BIGINT right time: each side valid alone.
    val lt = Seq(("a", "2024-01-01 00:00:05")).toDF("k", "ts")
      .select(col("k"), col("ts").cast("timestamp").as("lt"))
    val rl = Seq(("a", 3L, "p")).toDF("k", "rt", "v")
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoinPlan.join(lt, rl, Seq("k"), "lt", "rt")
    }
    assert(e2.getMessage.contains("time type mismatch"))
  }
}
