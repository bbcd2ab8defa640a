package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) over two maximize-dimensions — "which
  * customers/suppliers/sources are not strictly beaten on BOTH
  * metrics?" Spark has no skyline operator; the classic database
  * formulation is a quadratic dominance self-join. This is the
  * sort-based single-pass form:
  *
  * sort points by (x desc, y desc); a point is dominated iff some
  * earlier point has y ≥ its y — except exact-duplicate (x,y) points,
  * which never dominate each other. Deduplicate (x,y) FIRST, and the
  * rule collapses to `y > max(y) over the preceding frame`: after
  * distinct, an earlier point with equal y necessarily has larger x.
  *
  * The dominance test is therefore ONE ordered window over the
  * DISTINCT (x,y) point set (dictionary-sized, not row-sized), and
  * membership propagates back to rows by an equi-join on the point.
  * Dimensions are compared as exact integers (cents/micro units —
  * caller quantizes), so the frontier is bit-stable in any engine.
  *
  * Scale: the distinct point set is the only sorted structure; rows
  * stream through the final broadcast-able membership join. For
  * frontiers over genuinely row-sized point sets, pre-filter with a
  * grid-max pass (each grid cell keeps its max-y point) before the
  * exact window.
  */
object Skyline {

  /** Frontier of `df` maximizing integer columns `xCol`, `yCol`.
    * Returns the input rows that sit on the frontier.
    */
  def frontier(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = df.select(col(xCol).as("_x"), col(yCol).as("_y")).distinct()
    val w = Window.orderBy(col("_x").desc, col("_y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val sky = pts.withColumn("_maxy", max("_y").over(w))
      .filter(col("_maxy").isNull || col("_y") > col("_maxy"))
      .select(col("_x"), col("_y"))
    df.join(sky, col(xCol) === col("_x") && col(yCol) === col("_y"))
      .drop("_x", "_y")
  }
}
