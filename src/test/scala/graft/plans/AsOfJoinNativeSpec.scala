package graft.plans

import graft.{SparkSpec, Tables}
import graft.engine.AsOf
import org.apache.spark.sql.functions._

/** The native as-of operator must agree row-for-row with the
  * compositional general path, and actually plan as AsOfJoinExec.
  */
class AsOfJoinNativeSpec extends SparkSpec {

  private def purchases = Tables.load(spark, sf001, "events")
    .filter(col("event_type") === "purchase")
    .select("event_id", "user_id", "ts", "value")
  private def signups = Tables.load(spark, sf001, "events")
    .filter(col("event_type") === "signup")
    .select(col("user_id"), col("ts"), col("value").as("signup_value"))

  test("native as-of join plans as AsOfJoinExec (no window, no union)") {
    val df = AsOfJoinNative.asofBackward(purchases, signups,
      on = "user_id", leftTs = "ts", rightTs = "ts",
      rightPayload = Seq("signup_value"))
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the "Exec" suffix → shows as "AsOfJoin"
    assert(plan.contains("AsOfJoin"), plan.take(1500))
    assert(!plan.contains("Window"), "native path must not fall back to window")
    // physical contract: one hash exchange + (key, ts) sort per side
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2, plan.take(1500))
  }

  test("native as-of join agrees row-for-row with the compositional path") {
    val native = AsOfJoinNative.asofBackward(purchases, signups,
      "user_id", "ts", "ts", Seq("signup_value"))
      .select("event_id", "signup_value", "ts_matched")
      .collect().map(_.toSeq).toSet
    val general = AsOf.asofBackward(purchases, signups,
      Seq("user_id"), "ts", "ts", Seq("signup_value"))
      .select("event_id", "signup_value", "ts_matched")
      .collect().map(_.toSeq).toSet
    assert(native === general)
    assert(native.nonEmpty)
  }

  test("left rows with no prior right row come through with nulls") {
    val native = AsOfJoinNative.asofBackward(purchases, signups,
      "user_id", "ts", "ts", Seq("signup_value"))
    val unmatched = native.filter(col("signup_value").isNull).count()
    val total = native.count()
    assert(total === purchases.count()) // left-join row preservation
    assert(unmatched > 0 && unmatched < total)
  }

  test("self-join shape: both sides derived from ONE DataFrame") {
    // regression: shared exprIds made DeduplicateRelations remap the
    // right key/ts onto the left side, pruning the right child to
    // nothing and crashing at execution
    val ev = Tables.load(spark, sf001, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val s = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("value").as("signup_value"))
    val out = AsOfJoinNative.asofBackward(p, s, "user_id", "ts", "ts",
      Seq("signup_value"))
    assert(out.count() === p.count())
    assert(out.filter(col("signup_value").isNotNull).count() > 0)
  }

  test("null keys: left rows survive unmatched, right rows never match") {
    import spark.implicits._
    val l = Seq((1L, Some(10L), 100L), (2L, None, 100L), (3L, Some(10L), 200L))
      .toDF("id", "user_id", "ts")
    val r = Seq((Some(10L), 50L, "r1"), (None, 40L, "r-null"))
      .toDF("user_id", "ts", "payload")
    val out = AsOfJoinNative.asofBackward(l, r, "user_id", "ts", "ts",
      Seq("payload"))
      .select("id", "payload").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) null else x.getString(1)))
      .toMap
    assert(out(1L) === "r1")   // normal match
    assert(out(2L) === null)   // null left key: row preserved, no match
    assert(out(3L) === "r1")
    assert(out.size === 3)     // left-join row count preserved
  }

  test("non-long key is rejected toward the general path") {
    intercept[RuntimeException] {
      AsOfJoinNative.asofBackward(
        purchases.withColumn("user_id", col("user_id").cast("string")),
        signups.withColumn("user_id", col("user_id").cast("string")),
        "user_id", "ts", "ts", Seq("signup_value"))
    }
  }
}
