package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ClassicConversions.ColumnConstructorExt
import org.apache.spark.sql.classic.{ColumnConversions => CC}

/** Bridge between the Connect-agnostic `Column` API and catalyst
  * `Expression`s for graft's native expressions (VectorOps, SimHash).
  *
  * Lives in `org.apache.spark.sql` because the `Column` companion —
  * the only sanctioned constructor from an `Expression` via
  * `ClassicConversions.ColumnConstructorExt` — is `private[sql]` in
  * Spark 4. This is the conventional shim for libraries that ship
  * custom catalyst expressions.
  */
object GraftBridge {
  def column(e: Expression): Column = Column(e)
  def expression(c: Column): Expression = CC.expression(c)

  /** Analyzed logical plan of a DataFrame (classic API). */
  def analyzed(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    classic.ClassicConversions.castToImpl(df).queryExecution.analyzed

  /** Construct a DataFrame over a custom LogicalPlan (the
    * `Dataset.ofRows` constructor is private[sql]).
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(classic.ClassicConversions.castToImpl(spark), plan)

  /** The RDDs backing a DataFrame's `LogicalRDD` leaves. A
    * `localCheckpoint()` persists the internal row RDD but does NOT
    * register the Dataset with the CacheManager, so
    * `Dataset.unpersist()` is a no-op on a checkpointed frame;
    * releasing its storage needs the leaf RDD itself (`rdd.unpersist`).
    * Used by iterative operators (connected components) that
    * checkpoint periodically and must free superseded checkpoints.
    */
  def leafRdds(df: Dataset[_]): Seq[org.apache.spark.rdd.RDD[_]] =
    classic.ClassicConversions.castToImpl(df).queryExecution.analyzed.collect {
      case lr: execution.LogicalRDD => lr.rdd
    }
}
