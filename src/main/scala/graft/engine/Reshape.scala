package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reshaping operators (SURVEY.md §2.4): unpivot/melt (reference
  * `pivot_longer`, `01_source_me.R:101` et al.), pivot with pinned
  * column order (`pivot_wider`, `:108` et al.), `separate` (`:336`),
  * and key-partitioned fan-out (`split`, `:140-145`).
  *
  * Scale notes:
  *  - `unpivot` is a narrow transformation (Expand node) — no shuffle,
  *    output rows = input rows × measures; safe at any scale.
  *  - `pivot` is given an explicit value list, which (a) avoids the
  *    implicit collect-distinct job Spark otherwise runs and (b) pins
  *    output column order, mirroring R's first-seen ordering.
  *  - `splitByKey` collects only the DISTINCT key roster to the driver
  *    (small by contract — report partitions); the per-key DataFrames
  *    remain lazy plans. For large outputs use `writePartitioned`.
  */
object Reshape {

  /** Wide → long. `df.unpivot` (Spark ≥ 3.4): id columns repeat, each
    * value column becomes a (nameCol, valueCol) row.
    */
  def unpivot(df: DataFrame, ids: Seq[String], values: Seq[String],
              nameCol: String, valueCol: String): DataFrame =
    df.unpivot(ids.map(col).toArray, values.map(col).toArray, nameCol, valueCol)

  /** The reference's dominant call shape: melt every column whose name
    * starts with `prefix` ("2" → the year columns, `:101`).
    */
  def unpivotByPrefix(df: DataFrame, prefix: String,
                      nameCol: String = "year", valueCol: String = "value"): DataFrame = {
    val values = df.columns.filter(_.startsWith(prefix)).toSeq
    val ids = df.columns.filterNot(_.startsWith(prefix)).toSeq
    unpivot(df, ids, values, nameCol, valueCol)
  }

  /** Long → wide with an explicit, ordered pivot-value list
    * (`pivot_wider`, `:108`). One hash-aggregate shuffle on the group
    * keys; `first(value)` assumes (keys, pivotCol) is unique upstream,
    * as in the reference.
    */
  def pivotExplicit(df: DataFrame, groupCols: Seq[String], pivotCol: String,
                    pivotValues: Seq[String], valueCol: String = "value"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .pivot(pivotCol, pivotValues)
      .agg(first(col(valueCol)))

  /** tidyr::separate with split-at-FIRST-separator semantics
    * (`sep=": "` at `:336`: descriptions may themselves contain the
    * separator, so limit = 2).
    */
  def separate(df: DataFrame, colName: String, into: (String, String),
               sep: String): DataFrame = {
    val parts = split(col(colName), java.util.regex.Pattern.quote(sep), 2)
    // get() (not getItem): rows without the separator yield null in
    // the second column — tidyr::separate's NA-with-warning behavior —
    // instead of an ANSI out-of-bounds error. One select (not chained
    // withColumn: when into._1 == colName the first rename would
    // clobber the source the second extraction still reads), replacing
    // the source column in place, as tidyr does.
    val out = df.columns.toSeq.flatMap {
      case c if c == colName =>
        Seq(get(parts, lit(0)).as(into._1), get(parts, lit(1)).as(into._2))
      case c => Seq(col(c))
    }
    df.select(out: _*)
  }

  /** base::split analogue (`:140-145`): one DataFrame per distinct key,
    * keyed by the key's string value. Only the roster is collected;
    * each branch is an independent lazy plan over the (cached) parent.
    */
  def splitByKey(df: DataFrame, keyCol: String): Seq[(String, DataFrame)] = {
    // null keys are dropped (base::split drops NA groups by default;
    // and a null key can't name a sheet/partition)
    val keys = df.select(col(keyCol)).filter(col(keyCol).isNotNull)
      .distinct().collect().map(_.get(0).toString).sorted
    keys.toSeq.map(k => k -> df.filter(col(keyCol) === lit(k)))
  }

  /** Scale path for splitByKey: hash-partitioned write, one directory
    * per key, no driver involvement.
    */
  def writePartitioned(df: DataFrame, keyCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(keyCol).parquet(path)

  /** Column reorder helper (dplyr::relocate, `:82`, `:109` etc.):
    * move `cols` immediately after `anchor`.
    */
  def relocateAfter(df: DataFrame, cols: Seq[String], anchor: String): DataFrame = {
    val rest = df.columns.filterNot(cols.contains)
    val i = rest.indexOf(anchor)
    require(i >= 0, s"relocateAfter: anchor $anchor not found")
    val (before, after) = rest.splitAt(i + 1)
    df.select((before ++ cols ++ after).map(col).toIndexedSeq: _*)
  }

  /** relocate(..., .after = everything()): move cols to the end. */
  def relocateToEnd(df: DataFrame, cols: Seq[String]): DataFrame = {
    val rest = df.columns.filterNot(cols.contains)
    df.select((rest ++ cols).map(col).toIndexedSeq: _*)
  }
}
