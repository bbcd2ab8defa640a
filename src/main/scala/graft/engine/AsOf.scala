package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, the single most recent
  * right row with `rightTs <= leftTs`, per key. The classic
  * time-series operator Spark lacks natively (SURVEY.md §2.6 lists it
  * as an engine extension; DuckDB ships it as `ASOF JOIN`, which is
  * the oracle).
  *
  * Implementation: union-and-sweep, per preference order (a) —
  * compose existing operators before writing a custom LogicalPlan.
  * Both sides are tagged and unioned, then ONE window sweep per key
  * ordered by (ts, side) carries the latest right payload forward
  * (`last(..., ignoreNulls)`); left rows then read their match from
  * the carried columns.
  *
  * Scale: exactly one shuffle (the window partitioning on the key) —
  * the same cost as a sort-merge join on the key, with no range
  * explosion. Skewed keys fall to AQE. A broadcast-able right side
  * could instead use a sorted-array UDF per key, but the sweep wins
  * as soon as the right side is large, which is the case that
  * matters.
  */
object AsOf {

  /** @param on          equi-join keys
    * @param leftTs      left timestamp column name
    * @param rightTs     right timestamp column name
    * @param rightPayload right columns to carry (must not collide
    *                     with left column names)
    * @param tolerance   optional max lookback (a Column interval or
    *                    duration in the ts type's arithmetic): matches
    *                    older than `leftTs - tolerance` are nulled.
    */
  def asofBackward(left: DataFrame, right: DataFrame, on: Seq[String],
                   leftTs: String, rightTs: String,
                   rightPayload: Seq[String],
                   tolerance: Option[Column] = None): DataFrame = {
    val collisions = rightPayload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"rename right payload columns first: $collisions")

    val carried = rightPayload :+ rightTs
    // SQL equality semantics: null keys never match. The window
    // partitions nulls together, so a null-keyed right row would
    // otherwise be carried into null-keyed left rows. Right nulls are
    // dropped; null-keyed LEFT rows keep flowing (left-join) and see
    // no carried values (their partition then holds only left rows).
    // A null rightTs is dropped for the same reason: `null <= leftTs`
    // is never true, yet a null _asof_ts sorts FIRST (nulls-first) in
    // the sweep and would leak its payload into every left row — the
    // native operator (AsOfJoinNative) skips null-ts rows too.
    val rightNonNull = on.foldLeft(right)((df, k) => df.filter(col(k).isNotNull))
      .filter(col(rightTs).isNotNull)
    val r = rightNonNull.select(
      on.map(col) ++ Seq(col(rightTs).as("_asof_ts"), lit(0).as("_asof_side")) ++
        carried.map(c => col(c).as(s"_c_$c")): _*)
    val l = left.select(
      left.columns.map(col).toSeq ++
        Seq(col(leftTs).as("_asof_ts"), lit(1).as("_asof_side")) ++
        carried.map(c => lit(null).as(s"_c_$c")): _*)

    // right rows sort BEFORE left rows at equal ts → `<=` semantics
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_asof_ts"), col("_asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = l.unionByName(r, allowMissingColumns = true)
      .select((on.map(col) ++ Seq(col("_asof_ts"), col("_asof_side")) ++
        left.columns.filterNot(on.contains).map(col) ++
        carried.map(c => last(col(s"_c_$c"), ignoreNulls = true).over(w).as(s"_m_$c"))): _*)

    val matched = swept.filter(col("_asof_side") === 1)
    val withTol = tolerance match {
      case Some(tol) =>
        val inRange = col(s"_m_$rightTs") >= (col("_asof_ts") - tol)
        carried.foldLeft(matched) { (df, c) =>
          df.withColumn(s"_m_$c", when(inRange, col(s"_m_$c")))
        }
      case None => matched
    }
    val out = withTol
      .select((left.columns.toIndexedSeq.map(col) ++
        rightPayload.map(c => col(s"_m_$c").as(c)) :+
        col(s"_m_$rightTs").as(s"${rightTs}_matched")): _*)
    out
  }

  /** As-of NEAREST join — for each left row, the right row minimizing
    * |rightTs − leftTs| per key, ties broken toward the EARLIER
    * (backward) match. The sensor-alignment variant of [[asofBackward]]
    * (which only looks back): clock drift makes the nearest reading
    * sit on either side of the probe time.
    *
    * Same union-and-sweep, ONE shuffle: the backward carry
    * (`last ignoreNulls` over ts asc, right-before-left at equal ts)
    * and the forward carry (`first ignoreNulls` over the following
    * frame, left-before-right at equal ts) are two window specs over
    * the SAME key partitioning — Spark plans one exchange with two
    * in-partition sorts. Distances compare in epoch micros (exact
    * integers); at equal distance the backward match wins, so an
    * exactly-coincident right row resolves backward in every engine.
    */
  def asofNearest(left: DataFrame, right: DataFrame, on: Seq[String],
                  leftTs: String, rightTs: String,
                  rightPayload: Seq[String]): DataFrame = {
    val collisions = rightPayload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"rename right payload columns first: $collisions")
    val carried = rightPayload :+ rightTs
    val rightNonNull = on.foldLeft(right)((df, k) => df.filter(col(k).isNotNull))
      .filter(col(rightTs).isNotNull)
    val r = rightNonNull.select(
      on.map(col) ++ Seq(col(rightTs).as("_asof_ts"), lit(0).as("_asof_side")) ++
        carried.map(c => col(c).as(s"_c_$c")): _*)
    val l = left.select(
      left.columns.map(col).toSeq ++
        Seq(col(leftTs).as("_asof_ts"), lit(1).as("_asof_side")) ++
        carried.map(c => lit(null).as(s"_c_$c")): _*)
    // backward: right (side 0) sorts before left at equal ts → `<=`
    val wb = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_asof_ts"), col("_asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: left sorts before right at equal ts (side desc) → `>=`
    val wf = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_asof_ts"), col("_asof_side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val swept = l.unionByName(r, allowMissingColumns = true)
      .select((on.map(col) ++ Seq(col("_asof_ts"), col("_asof_side")) ++
        left.columns.filterNot(on.contains).map(col) ++
        carried.flatMap(c => Seq(
          last(col(s"_c_$c"), ignoreNulls = true).over(wb).as(s"_b_$c"),
          first(col(s"_c_$c"), ignoreNulls = true).over(wf).as(s"_f_$c")))): _*)
      .filter(col("_asof_side") === 1)
    // exact integer distances: epoch micros for timestamp clocks,
    // the raw value for integral clocks
    def ticks(c: Column): Column = left.schema(leftTs).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case _ => c.cast("long")
    }
    val bd = ticks(col("_asof_ts")) - ticks(col(s"_b_$rightTs"))
    val fd = ticks(col(s"_f_$rightTs")) - ticks(col("_asof_ts"))
    val takeBack = col(s"_f_$rightTs").isNull ||
      (col(s"_b_$rightTs").isNotNull && bd <= fd)
    swept.select((left.columns.toIndexedSeq.map(col) ++
      rightPayload.map(c =>
        when(takeBack, col(s"_b_$c")).otherwise(col(s"_f_$c")).as(c)) ++
      Seq(
        when(takeBack, col(s"_b_$rightTs")).otherwise(col(s"_f_$rightTs"))
          .as(s"${rightTs}_matched"),
        when(col(s"_b_$rightTs").isNull && col(s"_f_$rightTs").isNull, lit(null))
          .when(takeBack, lit("backward")).otherwise(lit("forward"))
          .as("direction"))): _*)
  }
}
