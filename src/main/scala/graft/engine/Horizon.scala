package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group horizon statistics (SURVEY.md §2.5 A2/A3), replacing the
  * reference's nest → map(cagrs/sums) → unnest round-trip
  * (`01_source_me.R:50-71`, applied at `:104-110` etc.) with single-
  * pass conditional aggregation — one hash-aggregate shuffle per call,
  * fully inside Catalyst/whole-stage-codegen, no per-group
  * materialization. This is the load-bearing "dissolve the nested
  * list-column" design decision: at 100 TB a nest/unnest round trip
  * (collect_list of structs) would blow executor memory on skewed
  * groups; conditional aggregation has O(1) state per group.
  *
  * Semantics pinned from the reference:
  *  - CAGRs anchor ON the base year: v0 = value@fyod, v5 = @fyod+5,
  *    v10 = @fyod+10 (`:53-55`); stored as FRACTIONS, not percents
  *    (`:52` "NOT multiplied by 100").
  *  - Sums EXCLUDE the base year: [fyod+1, fyod+5], [fyod+6, fyod+10],
  *    [fyod+1, fyod+10] (`:65-67`) — asymmetric with CAGRs, a trap
  *    pinned in HorizonSpec.
  *  - Year arrives as a STRING column post-unpivot (pivot_longer names
  *    are strings); range predicates compare after int cast (§1.2).
  */
object Horizon {

  val cagr1Name = "1st 5-year CAGR"
  val cagr2Name = "2nd 5-year CAGR"
  val cagr10Name = "10-year CAGR"
  val sum1Name = "1st 5-year Sum"
  val sum2Name = "2nd 5-year Sum"
  val sum10Name = "10-year Sum"

  private def yr(yearCol: String): Column = col(yearCol).cast("int")

  /** value at an exact year, as a conditional aggregate. */
  def valueAt(year: Int, yearCol: String = "year", valueCol: String = "value"): Column =
    max(when(yr(yearCol) === lit(year), col(valueCol)))

  /** Σ value over an inclusive year range, as a conditional aggregate. */
  def sumOver(lo: Int, hi: Int, yearCol: String = "year", valueCol: String = "value"): Column =
    sum(when(yr(yearCol).between(lo, hi), col(valueCol)))

  /** (v1/v0)^(1/n) − 1 — fraction, not percent (`:52`). */
  def cagr(v0: Column, v1: Column, years: Int): Column =
    pow(v1 / v0, 1.0 / years) - lit(1.0)

  /** Group → one row per group with the three CAGR columns of
    * `cagrs()` (`:50-62`). Input is long (yearCol, valueCol) form.
    */
  def cagrs(df: DataFrame, groupCols: Seq[String], fyod: Int,
            yearCol: String = "year", valueCol: String = "value"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        valueAt(fyod, yearCol, valueCol).as("_v0"),
        valueAt(fyod + 5, yearCol, valueCol).as("_v5"),
        valueAt(fyod + 10, yearCol, valueCol).as("_v10"))
      .withColumn(cagr1Name, cagr(col("_v0"), col("_v5"), 5))
      .withColumn(cagr2Name, cagr(col("_v5"), col("_v10"), 5))
      .withColumn(cagr10Name, cagr(col("_v0"), col("_v10"), 10))
      .drop("_v0", "_v5", "_v10")

  /** Group → one row per group with the three horizon sums of
    * `sums()` (`:63-71`) — base year EXCLUDED.
    */
  def horizonSums(df: DataFrame, groupCols: Seq[String], fyod: Int,
                  yearCol: String = "year", valueCol: String = "value"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        sumOver(fyod + 1, fyod + 5, yearCol, valueCol).as(sum1Name),
        sumOver(fyod + 6, fyod + 10, yearCol, valueCol).as(sum2Name),
        sumOver(fyod + 1, fyod + 10, yearCol, valueCol).as(sum10Name))

  /** The reference's full shape: pivot the long frame back to wide
    * years AND attach the per-group stats — two aggregates over the
    * same grouping joined on the keys (equal-keyed shuffles; Catalyst
    * reuses the exchange under AQE).
    */
  def wideWithStats(df: DataFrame, groupCols: Seq[String], years: Seq[Int],
                    stats: DataFrame, yearCol: String = "year",
                    valueCol: String = "value"): DataFrame = {
    val wide = Reshape.pivotExplicit(df, groupCols, yearCol,
      years.map(_.toString), valueCol)
    wide.join(stats, groupCols, "left")
  }
}
