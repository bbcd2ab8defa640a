package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, NamedExpression, SortOrder, UnsafeProjection, Ascending}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native as-of join (SURVEY.md §2.6 extension; spark_guide "custom
  * operator" path c): LogicalPlan + Strategy + physical exec,
  * registered through `spark.experimental.extraStrategies`.
  *
  * Semantics: for each left row, the latest right row with
  * `rightTs <= leftTs` within the same key (backward as-of, equal
  * timestamps match) — identical to `engine.AsOf.asofBackward`, which
  * remains the general path. This native operator is the fast path
  * for the common shape: ONE numeric (long) key and a timestamp/long
  * ts on both sides. Compared with the compositional union-and-sweep,
  * it shuffles each side once on the key (no union of mismatched
  * schemas, no null-carry columns, no window state) and streams each
  * partition pair with O(1) memory.
  *
  * Physical contract: both children hash-clustered on their key and
  * sorted by (key, ts) — Spark's EnsureRequirements inserts the
  * exchanges/sorts, exactly as for SortMergeJoin.
  */
object AsOfJoinNative {

  // ——— logical node ———
  case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                      leftKey: Expression, rightKey: Expression,
                      leftTs: Expression, rightTs: Expression,
                      carried: Seq[NamedExpression]) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ carried.map(_.toAttribute.withNullability(true))
    override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
      copy(left = l, right = r)
  }

  // ——— physical operator ———
  case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                          leftKey: Expression, rightKey: Expression,
                          leftTs: Expression, rightTs: Expression,
                          carried: Seq[NamedExpression],
                          output: Seq[Attribute]) extends BinaryExecNode {

    override def requiredChildDistribution: Seq[Distribution] =
      Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

    override def outputOrdering: Seq[SortOrder] =
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val carriedLocal = carried
      val (lk, lt, rk, rt) = (leftKey, leftTs, rightKey, rightTs)
      val outAttrs = output
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(Seq(lk, lt), lOut)
        val rKeyProj = UnsafeProjection.create(Seq(rk, rt), rOut)
        val carriedProj = UnsafeProjection.create(carriedLocal.map(_.asInstanceOf[Expression]), rOut)
        val outProj = UnsafeProjection.create(outAttrs.map(_.asInstanceOf[Expression]),
          lOut ++ carriedLocal.map(_.toAttribute.withNullability(true)))
        val nullCarried = new GenericInternalRow(carriedLocal.size)
        val joined = new JoinedRow

        val rBuf = rIter.buffered
        var matchKey = 0L
        var hasMatch = false
        var matchRow: InternalRow = null

        lIter.map { lRow =>
          val lkRow = lKeyProj(lRow)
          // SQL equality semantics: a NULL key or ts matches nothing
          // (getLong on a null slot decodes as 0 and would otherwise
          // false-match key 0); null-key LEFT rows still come through
          // with null carried columns. Nulls sort FIRST, so skipping
          // them cannot starve later keys.
          val lNull = lkRow.isNullAt(0) || lkRow.isNullAt(1)
          val lKeyV = if (lNull) 0L else lkRow.getLong(0)
          val lTsV = if (lNull) 0L else lkRow.getLong(1)
          // advance the right side to the last row with
          // key < lKeyV, or key == lKeyV && ts <= lTsV
          var advancing = !lNull
          while (advancing && rBuf.hasNext) {
            val peek = rKeyProj(rBuf.head)
            if (peek.isNullAt(0) || peek.isNullAt(1)) {
              rBuf.next() // null-keyed right rows can never match
            } else {
              val rKeyV = peek.getLong(0)
              val rTsV = peek.getLong(1)
              if (rKeyV < lKeyV || (rKeyV == lKeyV && rTsV <= lTsV)) {
                val consumed = rBuf.next()
                if (rKeyV == lKeyV) {
                  matchKey = rKeyV
                  hasMatch = true
                  matchRow = carriedProj(consumed).copy()
                }
              } else advancing = false
            }
          }
          val matched = !lNull && hasMatch && matchKey == lKeyV
          outProj(joined(lRow, if (matched) matchRow else nullCarried))
        }
      }
    }

    override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
      copy(left = l, right = r)
  }

  // ——— strategy ———
  object AsOfStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case j @ AsOfJoin(l, r, lk, rk, lt, rt, carried) =>
        AsOfJoinExec(planLater(l), planLater(r),
          lk, rk, lt, rt, carried, j.output) :: Nil
      case _ => Nil
    }
  }

  // ——— DataFrame-facing API ———

  /** Native backward as-of join. Restrictions of the fast path: one
    * LONG key and LONG/TIMESTAMP ts on both sides (the common
    * time-series shape); anything else → use `engine.AsOf`
    * (compositional, fully general). Output = left columns ++ right
    * payload ++ `<rightTs>_matched`, exactly like the general path.
    */
  def asofBackward(left: DataFrame, right: DataFrame, on: String,
                   leftTs: String, rightTs: String,
                   rightPayload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}

    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy

    val lPlan = GraftBridge.analyzed(left)
    val rPlan0 = GraftBridge.analyzed(right)
    // Self-join safety: if both sides derive from the same source they
    // share exprIds, and DeduplicateRelations would remap this node's
    // right-side expressions onto the LEFT's attributes (it cannot
    // know which side an ambiguous reference means in a node it
    // doesn't recognize). Re-alias the right output → fresh exprIds.
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).nonEmpty) {
        import org.apache.spark.sql.catalyst.expressions.Alias
        import org.apache.spark.sql.catalyst.plans.logical.Project
        Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
      } else rPlan0
    def attr(plan: LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        sys.error(s"asofBackward: column $name not found"))
    def longBacked(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt == LongType || dt == TimestampType || dt == TimestampNTZType
    val (lk, rk) = (attr(lPlan, on), attr(rPlan, on))
    val (lt, rt) = (attr(lPlan, leftTs), attr(rPlan, rightTs))
    require(Seq(lk, rk, lt, rt).forall(a => longBacked(a.dataType)),
      "native as-of fast path needs long/timestamp key and ts; " +
        "use engine.AsOf for the general case")
    // the matched-ts rename must happen ABOVE the custom node: the
    // analyzer's CleanupAliases strips Alias from expressions of any
    // non-whitelisted operator, so an Alias inside `carried` is lost
    val carried = rightPayload.map(p => attr(rPlan, p)) :+ rt
    val node = AsOfJoin(lPlan, rPlan, lk, rk, lt, rt, carried)
    val df = GraftBridge.ofRows(spark, node)
    val outAttrs = node.output
    val cols = outAttrs.dropRight(1).map(a => GraftBridge.column(a)) :+
      GraftBridge.column(outAttrs.last).as(s"${rightTs}_matched")
    df.select(cols: _*)
  }
}
