package graft

/** The SQL registration surface for the native expressions. */
class GraftFunctionsSpec extends SparkSpec {

  test("graft_dot and graft_simhash64 are callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(r.getDouble(0) === 11.0)
    val s = spark.sql(
      "SELECT graft_simhash64(array('spark', 'catalyst')) AS h").head()
    assert(s.getLong(0) !== 0L)
    // deterministic across calls
    val s2 = spark.sql(
      "SELECT graft_simhash64(array('spark', 'catalyst')) AS h").head()
    assert(s.getLong(0) === s2.getLong(0))
  }

  test("graft_dot promotes float arrays to double (parity with DataFrame path)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(CAST(array(0.5, 0.25) AS ARRAY<FLOAT>),
        |                 CAST(array(2.0, 4.0) AS ARRAY<FLOAT>)) AS d""".stripMargin).head()
    assert(r.getDouble(0) === 2.0)
  }

  test("graft_cosine and graft_bottom_k are callable from SQL") {
    GraftFunctions.register(spark)
    val c = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").head()
    assert(math.abs(c.getDouble(0) - 1.0) < 1e-12)
    val ortho = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c").head()
    assert(math.abs(ortho.getDouble(0)) < 1e-12)
    // aggregate: bottom-k sample over a grouped table, straight SQL
    import spark.implicits._
    Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))
      .toDF("id", "g").createOrReplaceTempView("t_bk")
    val rows = spark.sql(
      "SELECT g, graft_bottom_k(id, 2) AS s FROM t_bk GROUP BY g ORDER BY g")
      .collect()
    assert(rows.length === 2)
    assert(rows(0).getSeq[Long](1).size === 2)   // group a: 2 of 3 kept
    assert(rows(1).getSeq[Long](1) === Seq(4L))  // group b: all 1 kept
  }

  test("graft_approx_top_k is callable from SQL with exact small-set counts") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq("a", "a", "b", "a", "c", "b").toDF("tok")
      .createOrReplaceTempView("t_mg")
    val rows = spark.sql(
      "SELECT graft_approx_top_k(tok, 10) AS mg FROM t_mg").head()
      .getSeq[org.apache.spark.sql.Row](0)
    // under capacity: exact counts, sorted (est desc, tok)
    assert(rows.map(r => (r.getString(0), r.getLong(1))) ===
      Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("the declarative extensions class builds (deployment path)") {
    // can't attach extensions to the already-built shared session;
    // construct and apply against a fresh SparkSessionExtensions to
    // pin the injection wiring
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }

  test("withExtensions session resolves injected functions end-to-end") {
    // a genuinely NEW session on the same context, built through the
    // extensions hook — the declarative cluster path, no imperative
    // register call. getOrCreate returns the active session (ignoring
    // extensions) unless the active/default slots are cleared first;
    // restore them after, and never close s2 (it shares the context).
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master(spark.sparkContext.master)
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(s2 ne spark, "getOrCreate reused the old session — test is void")
      val r = s2.sql(
        "SELECT graft_dot(array(2.0D, 3.0D), array(4.0D, 5.0D)) AS d").head()
      assert(r.getDouble(0) === 23.0)
      val c = s2.sql(
        "SELECT graft_cosine(array(1.0D, 1.0D), array(1.0D, 1.0D)) AS c").head()
      assert(math.abs(c.getDouble(0) - 1.0) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
