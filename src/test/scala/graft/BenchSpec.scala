package graft

import org.apache.spark.sql.functions._

/** The bench must make failures visible: a throwing query gets an
  * error entry in the emitted JSON instead of silently reporting a
  * near-zero time (round-2 verdict, What's wrong #1).
  */
class BenchSpec extends SparkSpec {
  import spark.implicits._

  test("a broken query surfaces in measure() and the JSON errors field") {
    val (_, ok) = Bench.measure(Seq(1, 2, 3).toDF("x"))
    assert(ok.isEmpty)
    // analysis error at action time: unresolved column
    val (_, err) = Bench.measure(Seq(1).toDF("x").select(col("nope")))
    assert(err.isDefined)
    val json = Bench.renderJson(
      Seq(("q_ok", 1.5, None), ("q_bad", 0.01, err)), "sfX")
    assert(json.contains("\"errors\":{\"q_bad\":\""))
    assert(!json.contains("\"q_ok\":\"")) // only failures in errors
    // parseable: balanced braces + the driver's json.load contract
    assert(json.startsWith("{") && json.endsWith("}"))
  }

  test("runtime failures (not just analysis) are captured too") {
    // ANSI cast of a non-numeric string fails at EXECUTION time, not
    // analysis — exercises the task-failure path of measure()
    val boom = Seq("a").toDF("s").select((col("s").cast("int") + lit(1)).as("v"))
    val (_, err) = Bench.measure(boom)
    assert(err.isDefined && err.get.contains("CAST_INVALID_INPUT"))
  }
}
