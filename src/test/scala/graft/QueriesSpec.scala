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

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf001)
      assert(df.columns.nonEmpty)
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
