package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BottomKSampleSpec extends SparkSpec {

  private def orders = Tables.load(spark, sf001, "orders")

  test("sample is invariant to partitioning (mergeable sketch)") {
    def sample(parts: Int) = orders.repartition(parts)
      .groupBy("o_orderpriority")
      .agg(BottomKSample.bottomKSample(col("o_orderkey"), 5).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val a = sample(1)
    val b = sample(17)
    assert(a === b)
    assert(a.values.forall(_.size === 5))
  }

  test("sample members are drawn from the group and deterministic across runs") {
    val s1 = orders.groupBy("o_orderstatus")
      .agg(BottomKSample.bottomKSample(col("o_custkey"), 3).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val s2 = orders.groupBy("o_orderstatus")
      .agg(BottomKSample.bottomKSample(col("o_custkey"), 3).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(s1 === s2)
    val custkeys = orders.select("o_custkey").collect().map(_.getLong(0)).toSet
    assert(s1.values.flatten.forall(custkeys.contains))
  }

  test("groups smaller than k return every member") {
    import spark.implicits._
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "v")
    val out = tiny.groupBy("g")
      .agg(BottomKSample.bottomKSample(col("v"), 10).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    assert(out("a") === Set(1L, 2L))
    assert(out("b") === Set(3L))
  }
}
