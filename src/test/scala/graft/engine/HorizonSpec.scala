package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the reference's horizon semantics (01_source_me.R:50-71):
  * CAGRs anchor ON the base year and are FRACTIONS; sums EXCLUDE the
  * base year; 10-year sum = 1st + 2nd (disjoint ranges).
  */
class HorizonSpec extends SparkSpec {
  import spark.implicits._

  private val fyod = 2024
  // value doubles every 5 years: v(2024)=100, v(2029)=200, v(2034)=400
  private def long = (0 to 10).map { i =>
    ("#1", (fyod + i).toString, 100.0 * math.pow(2.0, i / 5.0))
  }.toDF("noc", "year", "value")

  test("cagrs: anchored on base year, stored as fractions") {
    val r = Horizon.cagrs(long, Seq("noc"), fyod).collect().head
    val c1 = r.getAs[Double](Horizon.cagr1Name)
    val c2 = r.getAs[Double](Horizon.cagr2Name)
    val c10 = r.getAs[Double](Horizon.cagr10Name)
    // (200/100)^(1/5)-1 ≈ 0.148698 — a fraction, NOT multiplied by 100
    assert(math.abs(c1 - (math.pow(2.0, 0.2) - 1)) < 1e-12)
    assert(math.abs(c2 - (math.pow(2.0, 0.2) - 1)) < 1e-12)
    assert(math.abs(c10 - (math.pow(4.0, 0.1) - 1)) < 1e-12)
    // compounding invariant: (1+c10)^10 = (1+c1)^5 * (1+c2)^5
    assert(math.abs(math.pow(1 + c10, 10) - math.pow(1 + c1, 5) * math.pow(1 + c2, 5)) < 1e-9)
  }

  test("horizonSums EXCLUDE the base year (asymmetric with cagrs)") {
    val r = Horizon.horizonSums(long, Seq("noc"), fyod).collect().head
    val s1 = r.getAs[Double](Horizon.sum1Name)
    val s2 = r.getAs[Double](Horizon.sum2Name)
    val s10 = r.getAs[Double](Horizon.sum10Name)
    val vals = (1 to 10).map(i => 100.0 * math.pow(2.0, i / 5.0))
    assert(math.abs(s1 - vals.take(5).sum) < 1e-9)   // 2025..2029
    assert(math.abs(s2 - vals.drop(5).sum) < 1e-9)   // 2030..2034
    assert(math.abs(s10 - vals.sum) < 1e-9)          // 2025..2034, NO 2024
    assert(math.abs(s10 - (s1 + s2)) < 1e-9)         // disjoint ranges
  }

  test("year arrives as string and is compared via int cast") {
    // sanity: string years with leading zeros / spaces would break —
    // pin that plain numeric strings work through the cast
    val r = Horizon.horizonSums(long.withColumn("year", col("year").cast("string")),
      Seq("noc"), fyod).collect().head
    assert(r.getAs[Double](Horizon.sum1Name) > 0)
  }

  test("missing anchor years yield null CAGRs, not errors") {
    // group with no fyod+10 row: 10-year and 2nd-5-year CAGRs are null
    val partial = (0 to 5).map(i => ("#9", (fyod + i).toString, 100.0))
      .toDF("noc", "year", "value")
    val r = Horizon.cagrs(partial, Seq("noc"), fyod).collect().head
    assert(!r.isNullAt(r.fieldIndex(Horizon.cagr1Name)))
    assert(r.isNullAt(r.fieldIndex(Horizon.cagr2Name)))
    assert(r.isNullAt(r.fieldIndex(Horizon.cagr10Name)))
  }

  test("wideWithStats attaches stats to the pivoted frame") {
    val stats = Horizon.cagrs(long, Seq("noc"), fyod)
    val years = (fyod to fyod + 10).map(_.toString)
    val wide = Horizon.wideWithStats(long, Seq("noc"), fyod to fyod + 10, stats)
    assert(wide.columns.toSeq ===
      Seq("noc") ++ years ++ Seq(Horizon.cagr1Name, Horizon.cagr2Name, Horizon.cagr10Name))
    assert(wide.count() === 1)
  }
}
