package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (1L to 2000L).toDF("id")

  test("hashSample keeps a stable, roughly-proportional, rerun-identical subset") {
    val s1 = Sampling.hashSample(ids, col("id"), 100).as[Long].collect().sorted.toSeq
    val s2 = Sampling.hashSample(ids.repartition(13), col("id"), 100)
      .as[Long].collect().sorted.toSeq
    assert(s1 == s2, "membership must not depend on partitioning or reruns")
    // ~10% ± generous tolerance (hash-uniformity, not RNG, so its
    // variance is fixed by the key set).
    assert(s1.size > 120 && s1.size < 280, s"got ${s1.size} of 2000 at 10%")
    // Sampling at a higher rate is a SUPERSET (bucket < p is monotone) —
    // the property RNG sampling lacks.
    val s3 = Sampling.hashSample(ids, col("id"), 300).as[Long].collect().toSet
    assert(s1.forall(s3.contains))
  }

  test("weightedSample: k per group, key-ordered, zero weights excluded, stable") {
    val df = ((1L to 50L).map(i => ("a", i, i % 7 + 1)) ++
      (51L to 60L).map(i => ("b", i, 1L)) ++
      Seq(("b", 61L, 0L)))                      // weight 0 → never sampled
      .toDF("source", "doc_id", "w")
    val out = Sampling.weightedSample(df, "source", "doc_id", "w", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    val byGroup = out.groupBy(_._1)
    assert(byGroup("a").length == 5 && byGroup("b").length == 5)
    assert(!out.exists(_._2 == 61L))
    for ((_, g) <- byGroup) {
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to 5L).toSeq)
      // rank ascends as the A-ES key descends (ties impossible here —
      // distinct ids hash apart).
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(-_).toSeq)
    }
    // Content-keyed: identical on re-evaluation.
    val again = Sampling.weightedSample(df, "source", "doc_id", "w", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    assert(out.sortBy(_._2).toSeq == again.sortBy(_._2).toSeq)
  }

  test("weightedSample keeps resolution under heavy weights") {
    // Weights ~1e9 dwarf |ln u| ≤ ~41.5: quantizing the QUOTIENT to
    // micro-nats would send every key to 0 and degenerate into
    // ascending-id selection. The exact-quotient key must keep the
    // rows distinct and weight-sensitive.
    val df = (1L to 200L).map(i => ("g", i, 1000000000L + i * 1000L))
      .toDF("source", "doc_id", "w")
    val out = Sampling.weightedSample(df, "source", "doc_id", "w", k = 20)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(out.length == 20)
    // All 20 winning keys distinct (no collapse to a single bucket)…
    assert(out.map(_._2).distinct.length == 20)
    // …and the winners are NOT simply the 20 lowest ids.
    assert(out.map(_._1).sorted.toSeq != (1L to 20L).toSeq)
  }

  test("assignSplit partitions every row into exactly one stable split") {
    val out = Sampling.assignSplit(ids, col("id"), 80, 10)
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000)
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 1400 && counts("val") > 100 && counts("test") > 100)
    // Determinism across re-evaluation.
    val again = Sampling.assignSplit(ids, col("id"), 80, 10)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again == counts)
  }

  test("effectiveSampleSize: uniform = n, skew shrinks, zero-weight group NULL") {
    val df = Seq(
      ("u", 1.0), ("u", 1.0), ("u", 1.0), ("u", 1.0),
      ("skew", 3.0), ("skew", 1.0),
      ("dead", 0.0), ("dead", -2.0))
      .toDF("g", "w")
    val got = Sampling.effectiveSampleSize(df, "g", "w").collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    assert(got("u").getAs[Long]("ess_micro") == 4000000L)
    assert(got("u").getAs[Long]("ess_ratio_micro") == 1000000L)
    // (3+1)^2 / (9+1) = 1.6; ratio 0.8
    assert(got("skew").getAs[Long]("ess_micro") == 1600000L)
    assert(got("skew").getAs[Long]("ess_ratio_micro") == 800000L)
    assert(got("dead").getAs[Long]("n") == 0L)
    assert(got("dead").isNullAt(got("dead").fieldIndex("ess_micro")))
  }

  test("bootstrapMeanCI: exact point mean, ordered deterministic CI") {
    assert(Sampling.PoissonThresholds60 ==
      Sampling.PoissonThresholds60.sorted)
    assert(math.abs(Sampling.PoissonThresholds60.head.toDouble /
      math.pow(2.0, 60.0) - math.exp(-1.0)) < 1e-9)

    val df = ((1 to 100).map(i => ("g", i.toLong, i.toDouble)) ++
      Seq(("solo", 1L, 42.0)))
      .toDF("g", "id", "v")
    val got = Sampling.bootstrapMeanCI(df, "g", "id", "v", b = 50)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val g = got("g")
    assert(g.getAs[Long]("mean_micro") == 50500000L)
    val (lo, hi) = (g.getAs[Long]("lo_micro"), g.getAs[Long]("hi_micro"))
    assert(lo < 50500000L && 50500000L < hi)
    assert(hi - lo < 40000000L) // ~2 * 1.96 * sd/sqrt(n) scale, loose
    assert(g.getAs[Long]("n_resamples") == 50L)
    // single row: every surviving replicate mean IS the value, and
    // ~e^{-1} of replicates die (weight 0)
    val s1 = got("solo")
    assert(s1.getAs[Long]("lo_micro") == 42000000L)
    assert(s1.getAs[Long]("hi_micro") == 42000000L)
    assert(s1.getAs[Long]("n_resamples") > 20L &&
      s1.getAs[Long]("n_resamples") < 50L)
    // bit-reproducible: a second run is identical
    val again = Sampling.bootstrapMeanCI(df, "g", "id", "v", b = 50)
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("lo_micro"), r.getAs[Long]("hi_micro"))).toMap
    assert(again("g") == ((lo, hi)))
  }
}
