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

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf001)
      assert(df.columns.nonEmpty)
      df.count() // any exception fails the test
    }
  }
}
