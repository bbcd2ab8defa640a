package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, ExpressionSet, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, Project, Window => LWindow}
import org.apache.spark.sql.execution.{ProjectExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}

/** Structural scale checks shared by the plan-pin suites. */
object PlanChecks {

  /** Partition-less Window nodes in the optimized plan that would
    * single-reducer-sort a ROW-SCALE frame — the one plan shape that
    * cannot survive a 100× scale-up.
    *
    * A partition-less ORDERED window is dictionary-bounded exactly
    * when every ordering column is a GROUPING KEY of an Aggregate
    * beneath it (possibly re-derived through Projects of safe
    * columns): its input cardinality is then the number of distinct
    * key VALUES, not the number of rows. Aggregate-FUNCTION outputs
    * do not qualify — ordering a per-entity frame by an aggregated
    * measure is still one row per entity, i.e. row-scale. Cached
    * frames are seen through: an InMemoryRelation's physical plan is
    * walked for the same aggregate/project structure, so persisting a
    * dictionary does not hide its grouping keys from the law.
    *
    * A partition-less UNORDERED window (whole-frame running totals)
    * does no sort; it is accepted when an Aggregate sits anywhere
    * beneath it (the frame has been reduced), flagged when it runs
    * directly over un-aggregated rows.
    *
    * A window with a LIMIT beneath it is accepted regardless of its
    * ordering columns: the frame is bounded by the literal limit
    * (the `Ranks.topK` → rank-within-top-k shape). This is a lint
    * law, so the check is lineage-anywhere, not direct-child —
    * a join of a limited frame against an unbounded one would
    * slip through, but no battery operator windows such a join.
    */
  def rowScaleGlobalWindows(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.optimizedPlan
    plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty =>
        val safe = scala.collection.mutable.Set[ExprId]()
        var hasAgg = false
        var hasLimit = false

        def markAgg(groupingExpressions: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                    resultExpressions: Seq[NamedExpression]): Unit = {
          hasAgg = true
          val gset = ExpressionSet(groupingExpressions)
          resultExpressions.foreach {
            case attr: Attribute if gset.contains(attr) =>
              safe += attr.exprId
            case al @ Alias(c, _) if gset.contains(c) =>
              safe += al.exprId
            case _ => ()
          }
        }

        def markProject(projectList: Seq[NamedExpression]): Boolean = {
          var changed = false
          projectList.foreach {
            case al: Alias if !safe.contains(al.exprId) &&
                al.references.nonEmpty &&
                al.references.forall(r => safe.contains(r.exprId)) =>
              safe += al.exprId
              changed = true
            case _ => ()
          }
          changed
        }

        // An InMemoryRelation re-maps attribute exprIds: its OUTPUT
        // attrs are fresh while the cached physical plan keeps the
        // originals — so safety is decided INSIDE the cached plan
        // (same aggregate/project rules on physical nodes, seeing
        // through the leaf-like AQE wrapper), then translated to the
        // relation's output attrs POSITIONALLY.
        def physicalNodes(p: SparkPlan): Seq[SparkPlan] = {
          val buf = scala.collection.mutable.ArrayBuffer[SparkPlan]()
          p.foreach {
            case s: InMemoryTableScanExec =>
              buf += s
              buf ++= physicalNodes(s.relation.cachedPlan)
            case aqe: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              buf += aqe
              buf ++= physicalNodes(aqe.executedPlan)
            case n => buf += n
          }
          buf.toSeq
        }
        def markCached(imr: InMemoryRelation): Unit = {
          val nodes = physicalNodes(imr.cachedPlan)
          val safeP = scala.collection.mutable.Set[ExprId]()
          var anyAgg = false
          nodes.foreach {
            case a: BaseAggregateExec =>
              anyAgg = true
              val gset = ExpressionSet(a.groupingExpressions)
              a.resultExpressions.foreach {
                case attr: Attribute if gset.contains(attr) =>
                  safeP += attr.exprId
                case al @ Alias(c, _) if gset.contains(c) =>
                  safeP += al.exprId
                case _ => ()
              }
            case _ => ()
          }
          var moved = true
          while (moved) {
            moved = false
            nodes.foreach {
              case pe: ProjectExec =>
                pe.projectList.foreach {
                  case al: Alias if !safeP.contains(al.exprId) &&
                      al.references.nonEmpty &&
                      al.references.forall(r => safeP.contains(r.exprId)) =>
                    safeP += al.exprId
                    moved = true
                  case _ => ()
                }
              case _ => ()
            }
          }
          if (anyAgg) hasAgg = true
          imr.output.zip(imr.cachedPlan.output).foreach {
            case (outer, inner) if safeP.contains(inner.exprId) =>
              safe += outer.exprId
            case _ => ()
          }
        }

        w.child.foreach { node =>
          node match {
            case _: GlobalLimit | _: LocalLimit =>
              hasLimit = true
            case a: Aggregate =>
              markAgg(a.groupingExpressions, a.aggregateExpressions)
            case imr: InMemoryRelation =>
              markCached(imr)
            case _ => ()
          }
        }
        // a column derived purely from safe columns is itself safe
        var changed = true
        while (changed) {
          changed = false
          w.child.foreach { node =>
            node match {
              case p: Project =>
                if (markProject(p.projectList)) changed = true
              case _ => ()
            }
          }
        }
        val orderRefs = w.orderSpec.flatMap(_.child.references).map(_.exprId)
        val ok = hasLimit ||
          (if (orderRefs.nonEmpty) orderRefs.forall(safe.contains)
           else hasAgg)
        if (ok) None else Some(w.simpleString(160))
    }.flatten
  }
}
