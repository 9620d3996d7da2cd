package graft.operators

import graft.SparkSpec

/** Property-style tests (seeded random trials) for the invariants
  * SURVEY.md §5.2 calls out. Plain loops rather than a ScalaCheck
  * runner: Spark jobs inside forAll shrink cycles are pathologically
  * slow, and the deps stay minimal. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("deltaClamp(cur, last) is never negative and bounded by cur") {
    (1 to 1000).foreach { _ =>
      val cur = rnd.nextLong(1000000)
      val last = rnd.nextLong(1000000)
      val d = math.max(0L, cur - last)
      assert(d >= 0 && d <= cur)
    }
  }

  test("dedupAppend twice == dedupAppend once (idempotent sync), random batches") {
    (1 to 3).foreach { _ =>
      val pairs = List.fill(30)((s"d${rnd.nextInt(3)}", rnd.nextInt(40)))
      val batch = pairs.toDF("dev", "seq")
      val existing = pairs.take(pairs.size / 2).toDF("dev", "seq")
      val once = Incremental.dedupAppend(batch, existing, Seq("dev", "seq"))
      val appended = existing.union(once)
      val twice = Incremental.dedupAppend(batch, appended, Seq("dev", "seq"))
      assert(twice.count() == 0)
    }
  }

  test("minhash similarity estimate tracks exact jaccard (random shuffled docs)") {
    val base = (1 to 40).map(i => s"tok$i")
    val docs = (0 until 8).map { i =>
      // Successive docs share a sliding window of tokens — varying overlap.
      val toks = base.drop(i * 4).take(24)
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 16, 3)
    val sigM = rows(sigs).map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.0)
    rows(exact).foreach { r =>
      val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val est = sigM(a).zip(sigM(b)).count { case (x, y) => x == y } / 16.0
      assert(math.abs(est - j) <= 0.45,
        s"pair ($a,$b): exact=$j est=$est diverged")
    }
  }
}
