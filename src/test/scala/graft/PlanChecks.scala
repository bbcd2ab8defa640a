package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, ExpressionSet}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, Project, Window => LWindow}

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
    * measure is still one row per entity, i.e. row-scale.
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
        w.child.foreach { node =>
          node match {
            case _: GlobalLimit | _: LocalLimit =>
              hasLimit = true
            case a: Aggregate =>
              hasAgg = true
              val gset = ExpressionSet(a.groupingExpressions)
              a.aggregateExpressions.foreach {
                case attr: Attribute if gset.contains(attr) =>
                  safe += attr.exprId
                case al @ Alias(c, _) if gset.contains(c) =>
                  safe += al.exprId
                case _ => ()
              }
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
                p.projectList.foreach {
                  case al: Alias if !safe.contains(al.exprId) &&
                      al.references.nonEmpty &&
                      al.references.forall(r => safe.contains(r.exprId)) =>
                    safe += al.exprId
                    changed = true
                  case _ => ()
                }
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
