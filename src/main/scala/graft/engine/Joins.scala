package graft.engine

import org.apache.spark.sql.DataFrame

/** Natural joins with inferred-key logging (SURVEY.md §2.6).
  *
  * dplyr's `left_join(x, y)` / `inner_join(x, y)` with no `by=` joins
  * on ALL shared column names (`01_source_me.R:81`, `:339`). Silent
  * natural joins are a classic correctness trap, so the inferred key
  * set is logged and an empty intersection is an error, not a cross
  * join.
  *
  * Physical strategy is left to Catalyst: both reference joins are
  * small-dimension equi-joins that plan as broadcast-hash
  * automatically; callers with a known-small right side can pass
  * `broadcast(right)`.
  */
object Joins {
  @transient private lazy val log =
    org.apache.log4j.Logger.getLogger(getClass.getName)

  def sharedKeys(left: DataFrame, right: DataFrame): Seq[String] =
    left.columns.toSeq.intersect(right.columns.toSeq)

  private def natural(left: DataFrame, right: DataFrame, how: String): DataFrame = {
    val keys = sharedKeys(left, right)
    require(keys.nonEmpty,
      s"natural $how join: no shared columns between " +
        s"[${left.columns.mkString(",")}] and [${right.columns.mkString(",")}]")
    log.info(s"natural $how join on inferred keys: ${keys.mkString(", ")}")
    left.join(right, keys, how)
  }

  /** `left_join(x, y)` (`add_jo`, `01_source_me.R:78-84`). */
  def naturalLeft(left: DataFrame, right: DataFrame): DataFrame =
    natural(left, right, "left")

  /** `inner_join(x, y)` (`:339`) — the join doubles as a filter:
    * rows without a match drop out.
    */
  def naturalInner(left: DataFrame, right: DataFrame): DataFrame =
    natural(left, right, "inner")
}
