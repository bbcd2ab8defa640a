package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws for the distributed exact-rank machinery: `ntileExact` /
  * `rowNumberExact` / `nearestRank` must be BIT-IDENTICAL to the
  * partition-less-Window forms they replace — including tie values
  * split across bucket boundaries, descending order, and the
  * short-frame (N < n) case — while never sorting the row-scale
  * frame on a single reducer.
  */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  // 200 rows over only 13 distinct values → heavy ties; deterministic
  private def frame = (1 to 200)
    .map(i => (i.toLong, ((i * 37) % 13).toLong))
    .toDF("id", "v")

  test("ntileExact equals ntile(n) OVER (ORDER BY v, id) for several n") {
    for (n <- Seq(1, 2, 3, 5, 7, 10, 64)) {
      val exact = Ranks.ntileExact(frame, n, "v", "id")
        .select("id", "bucket").as[(Long, Long)].collect().toMap
      val naive = frame.withColumn("bucket",
          ntile(n).over(Window.orderBy("v", "id")).cast("long"))
        .select("id", "bucket").as[(Long, Long)].collect().toMap
      assert(exact === naive, s"ntile($n) mismatch")
    }
  }

  test("ntileExact matches descending order with ascending id tie-break") {
    val exact = Ranks.ntileExact(frame, 5, "v", "id", valueDesc = true)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    val naive = frame.withColumn("bucket",
        ntile(5).over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(exact === naive)
  }

  test("ntileExact handles N < n (one row per bucket, buckets 1..N)") {
    val tiny = Seq((1L, 9L), (2L, 9L), (3L, 4L)).toDF("id", "v")
    val exact = Ranks.ntileExact(tiny, 10, "v", "id")
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    val naive = tiny.withColumn("bucket",
        ntile(10).over(Window.orderBy("v", "id")).cast("long"))
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(exact === naive)
    assert(exact.values.toSeq.sorted === Seq(1L, 2L, 3L))
  }

  test("ntileExact ranks NULL values instead of dropping them (Spark null ordering)") {
    val withNulls = frame.withColumn("v",
      when(col("id") % 7 === 0, lit(null)).otherwise(col("v")))
    val exact = Ranks.ntileExact(withNulls, 5, "v", "id")
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    val naive = withNulls.withColumn("bucket",
        ntile(5).over(Window.orderBy("v", "id")).cast("long"))
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(exact.size === 200, "null-valued rows must not drop")
    assert(exact === naive)
  }

  test("rowNumberExact equals row_number() OVER (ORDER BY v, id)") {
    val exact = Ranks.rowNumberExact(frame, "v", "id")
      .select("id", "_rn").as[(Long, Long)].collect().toMap
    val naive = frame.withColumn("_rn",
        row_number().over(Window.orderBy("v", "id")).cast("long"))
      .select("id", "_rn").as[(Long, Long)].collect().toMap
    assert(exact === naive)
  }

  test("nearestRank selects the same elements as global row_number picking") {
    val d = frame.select((col("v") * 1000 + col("id") % 7).as("delay"))
    val got = Ranks.nearestRank(d, "delay", Seq(
        "p50" -> (n => Ranks.idiv(n + lit(1L), lit(2L))),
        "p90" -> (n => Ranks.idiv(lit(9L) * n + lit(9L), lit(10L)))))
      .select("n_total", "p50", "p90").as[(Long, Long, Long)].head()
    val naive = d
      .withColumn("rn", row_number().over(Window.orderBy("delay")))
      .withColumn("n", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .agg(max("n").cast("long"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("delay"))).cast("long"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("delay"))).cast("long"))
      .as[(Long, Long, Long)].head()
    assert(got === naive)
  }

  test("the only ordered partition-less window runs over the value dictionary") {
    val offenders = graft.PlanChecks.rowScaleGlobalWindows(
      Ranks.ntileExact(frame, 5, "v", "id"))
    assert(offenders.isEmpty, offenders.mkString("\n"))
    // negative control: the naive form IS flagged
    val naive = frame.withColumn("bucket",
      ntile(5).over(Window.orderBy("v", "id")))
    assert(graft.PlanChecks.rowScaleGlobalWindows(naive).nonEmpty,
      "naive global ntile should be flagged as row-scale")
  }
}
