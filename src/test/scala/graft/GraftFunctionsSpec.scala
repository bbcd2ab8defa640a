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

  test("the declarative extensions class builds (deployment path)") {
    // can't attach extensions to the already-built shared session;
    // construct and apply against a fresh SparkSessionExtensions to
    // pin the injection wiring
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
