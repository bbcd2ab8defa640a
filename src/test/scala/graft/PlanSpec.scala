package graft

/** Physical-plan assertions: the plan SHAPES that SCALE.md claims —
  * filter pushdown into the parquet scan, column-pruned read schemas,
  * broadcast joins on dimension sides, TakeOrdered for top-k, and
  * whole-stage codegen coverage — pinned as tests instead of manual
  * `.explain` inspection, so a regression in any of them fails CI.
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf001)
    df.queryExecution.executedPlan.toString
  }

  test("q02: filter is pushed to the parquet scan and columns pruned") {
    val plan = planOf("q02_scan_project_filter")
    assert(plan.contains("PushedFilters:"), "no pushdown section in scan")
    assert(plan.contains("IsNotNull(o_orderstatus)") ||
      plan.contains("EqualTo(o_orderstatus"), s"status filter not pushed:\n$plan")
    // projection pruning: the scan must NOT read unused columns
    assert(!plan.contains("o_orderpriority"), "unused column read from parquet")
  }

  test("q14: dimension join is a broadcast hash join, not sort-merge") {
    val plan = planOf("q14_join_broadcast")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "dimension join degraded to sort-merge")
  }

  test("q21: top-k plans as TakeOrdered, never a full global sort") {
    val plan = planOf("q21_topk")
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered:\n$plan")
  }

  test("q01: aggregation runs inside whole-stage codegen") {
    // AQE only materializes codegen spans in the FINAL plan — execute
    // first, then read the adaptively finalized plan
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"))
    // codegen'd operators carry the "*(n)" codegen-id prefix
    assert(plan.contains("*(1) HashAggregate") || plan.contains("*(2) HashAggregate"),
      s"hash aggregate fell out of whole-stage codegen:\n$plan")
  }

  test("q40: brute-force knn broadcasts the query side") {
    val plan = planOf("q40_knn_bruteforce")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query vector not broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), "top-k not a TakeOrdered")
  }

  test("q34: exact dedup is a single hash-aggregate shuffle") {
    val plan = planOf("q34_dedup_exact")
    // two HashAggregates (partial + final) around ONE exchange
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected one shuffle, got $exchanges:\n$plan")
  }
}
