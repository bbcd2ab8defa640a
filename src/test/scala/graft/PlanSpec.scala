package graft

/** Physical-plan assertions: the plan SHAPES that SCALE.md claims —
  * filter pushdown into the parquet scan, column-pruned read schemas,
  * broadcast joins on dimension sides, TakeOrdered for top-k, and
  * whole-stage codegen coverage — pinned as tests instead of manual
  * `.explain` inspection, so a regression in any of them fails CI.
  */
class PlanSpec extends SparkSpec {

  // same contract as ScaleSpec: plan-shape pins must not see cached
  // subtrees registered by other suites on the shared session
  override protected def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    spark.catalog.clearCache()
    super.withFixture(test)
  }


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

  test("q76: the PII battery is map-only — no shuffle before the output sort") {
    val df = SparkEntry.queries("q76_pii_redact")(spark, sf001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the only exchange is the deterministic-output range sort; the
    // detect/redact work itself never hash-shuffles
    assert(!plan.contains("Exchange hashpartitioning"),
      s"PII detect/redact must not shuffle:\n$plan")
    // and the regex projection sits inside a whole-stage codegen span
    // (codegen ids only materialize in the AQE final plan)
    assert(plan.contains("isFinalPlan=true") && plan.contains("*(1)"),
      s"PII projection fell out of codegen:\n$plan")
  }

  test("vocabSketch (production form) is one partial/final agg shuffle") {
    val docs = Tables.load(spark, sf001, "documents")
    val plan = graft.ext.Sketches.vocabSketch(docs)
      .queryExecution.executedPlan.toString
    // one shuffle on the group key; HLL registers merge map-side.
    // (The q73 harness variant adds the exact countDistinct twin for
    // the oracle, which pays the distinct expand by design.)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected one shuffle, got $exchanges:\n$plan")
    assert(plan.contains("approx_count_distinct"))
  }

  test("ivfAssignJoin: partial argmin collapses before the exchange") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.load(spark, sf001, "embeddings")
    val cents = (0 until 16).map(c => c -> Seq.tabulate(64)(j => (c * 64 + j) / 1024.0f))
    val df = graft.ext.Similarity.ivfAssignJoin(emb, cents)
    val plan = df.queryExecution.executedPlan.toString
    // partial aggregate (min) must sit BELOW the exchange: the
    // n·k scored rows reduce to one row per vector map-side
    val partialIdx = plan.indexOf("partial_min")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    assert(partialIdx >= 0 && exchangeIdx >= 0, s"missing operators:\n$plan")
    assert(partialIdx > exchangeIdx,
      s"partial_min should appear below (after) the exchange in the plan tree:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "centroid table not broadcast")
    df.limit(1).collect() // and it executes
  }

  test("q168: hubness broadcasts the sampled query side, never sort-merges") {
    val plan = planOf("q168_hubness")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"query side not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"pair generation degraded to a cartesian product:\n$plan")
  }

  test("q173: skyline's membership join is broadcast (frontier is tiny)") {
    val plan = planOf("q173_skyline")
    assert(plan.contains("BroadcastHashJoin"),
      s"frontier membership join should broadcast:\n$plan")
  }

  test("q172: name-dictionary pairs never read the fact rows twice unpruned") {
    val plan = planOf("q172_jw_name_match")
    // dictionary build prunes to the single name column
    assert(plan.contains("ReadSchema: struct<p_name:string>"),
      s"name scan not column-pruned:\n$plan")
  }
}
