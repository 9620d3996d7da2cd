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
}
