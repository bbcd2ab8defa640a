package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{SimHash, VectorOps}

/** SQL-surface registration for graft's native expressions, two ways:
  *
  *  1. `GraftFunctions.register(spark)` — imperative, per-session
  *     (used by tests and by `queries` that want SQL access).
  *  2. `spark.sql.extensions=graft.GraftExtensions` — declarative
  *     Catalyst injection at session build, the deployment path for a
  *     cluster (`SparkSessionExtensions.injectFunction`).
  *
  * Registered functions:
  *  - `graft_dot(array<float|double>, array<float|double>) → double`
  *  - `graft_simhash64(array<string>) → bigint`
  */
object GraftFunctions {

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> { exprs =>
      require(exprs.length == 2, "graft_dot(a, b) takes two arrays")
      VectorOps.DotProduct(exprs(0), exprs(1))
    },
    "graft_simhash64" -> { exprs =>
      require(exprs.length == 1, "graft_simhash64(tokens) takes one array")
      SimHash.SimHash64(exprs.head)
    })

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `--conf spark.sql.extensions=graft.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
}
