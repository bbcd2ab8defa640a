package graft

/** Every harness query must at least run at sf0.001 (full oracle
  * parity is the driver's t2 gate at sf0.01, replicated locally by
  * tools/check.py).
  */
class QueriesSpec extends SparkSpec {

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphan = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphan.isEmpty, s"oracleSql without queries: $orphan")
  }

  test("clean cache slate before the battery sweep") {
    // earlier suites on the shared session may have cached frames of
    // their own; the per-query leak assertions below must start clean
    spark.catalog.clearCache()
    graft.engine.TrackedCache.release()
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  // Battery-wide scale law: no partition-less ordered Window over a
  // row-scale frame anywhere in ANY query's optimized plan (the
  // single-reducer-sort shape that cannot survive a 100× scale-up).
  // Allowlisted entries window a DOCUMENTED bounded frame instead:
  //  - q130_compaction_plan: windows the file MANIFEST (metadata
  //    scale — ~1e6 rows per 100 TB at 128 MB files), never data rows
  //  - q173_skyline: windows the DISTINCT-POINT dictionary behind the
  //    grid-max prefilter that collapses dense frontiers first
  private val globalWindowAllowlist: Set[String] =
    Set("q130_compaction_plan", "q173_skyline")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf001)
      assert(df.columns.nonEmpty)
      if (!globalWindowAllowlist(name)) {
        val offenders = PlanChecks.rowScaleGlobalWindows(df)
        assert(offenders.isEmpty,
          s"$name has row-scale global windows:\n${offenders.mkString("\n")}")
      }
      df.count() // any exception fails the test
      // cache-hygiene law: after a battery query builds AND
      // materializes, releasing the TrackedCache ledger must leave
      // the session's CacheManager EMPTY — i.e. no operator persists
      // outside the ledger (the long-lived-session leak class).
      graft.engine.TrackedCache.release()
      val leaked = !spark.sharedState.cacheManager.isEmpty
      // start the next query's assertion from a clean slate either
      // way — one leaker must not cascade into 200 failures
      if (leaked) spark.catalog.clearCache()
      assert(!leaked,
        s"$name leaked cached frames past TrackedCache.release()")
    }
  }
}
