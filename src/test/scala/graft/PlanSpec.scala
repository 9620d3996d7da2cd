package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan shape assertions — the scale properties the result
  * compare cannot see: broadcasts where a dimension is small, binned
  * equi-joins instead of nested-loop fallbacks, map-side partial
  * aggregation, and scan-level filter pushdown. A regression here
  * passes every correctness gate and then falls over at 100 TB. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q15: dims join via broadcast hash, never nested-loop or cartesian") {
    val p = plan("q15_region_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q43: the range predicate runs as an equi-join on bins, not BNLJ") {
    val p = plan("q43_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q16: aggregation is two-phase (map-side partial before the exchange)") {
    val p = plan("q16_pricing_summary")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "expected map-side partial aggregation")
  }

  test("q08: the watermark filter reaches the parquet scan as a pushed filter") {
    val p = plan("q08_watermark_filter")
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts"),
      s"watermark filter not pushed to the scan:\n$p")
  }

  test("near-dup pipelines never degrade to cartesian products") {
    for (q <- Seq("q36_neardup_pipeline", "q46_simhash_neardup",
        "q30_embedding_neardup", "q23_knn_lsh")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plan has a cartesian product")
    }
  }

  test("linkage and anomaly queries never degrade to cartesian products") {
    for (q <- Seq("q133_record_linkage", "q134_rate_anomaly",
        "q137_leakage_safe_split", "q136_canonical_docs")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plan has a cartesian product")
    }
  }

  test("bounded top-k queries aggregate, never window-partition the group") {
    for (q <- Seq("q135_top_tokens", "q106_bm25")) {
      val p = plan(q)
      assert(p.contains("ObjectHashAggregate"),
        s"$q should pick top-k through the bounded aggregate:\n$p")
      assert(!p.contains("RunningWindowFunction") &&
        !p.contains("Window [row_number"),
        s"$q must not rank through a per-group window")
    }
  }

  test("q02/q37 map-only queries stay in one whole-stage codegen span, no exchange") {
    for (q <- Seq("q02_normalize", "q37_string_surface")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q should be shuffle-free")
      // "*(n)" is the compact-plan marker for a WholeStageCodegen span.
      assert(p.contains("*(1)"), s"$q should be codegen'd")
    }
  }
}
