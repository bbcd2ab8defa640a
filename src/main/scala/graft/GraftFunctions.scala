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
  *  - `graft_cosine(a, b) → double`
  *  - `graft_simhash64(array<string>) → bigint`
  *  - `graft_bottom_k(col, k) → array<bigint>` (aggregate; k literal)
  *  - `graft_approx_top_k(col, k) → array<struct<tok,est>>`
  *    (Misra-Gries heavy hitters; aggregate; k literal)
  */
object GraftFunctions {

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> { exprs =>
      require(exprs.length == 2, "graft_dot(a, b) takes two arrays")
      VectorOps.DotProduct(exprs(0), exprs(1))
    },
    "graft_cosine" -> { exprs =>
      require(exprs.length == 2, "graft_cosine(a, b) takes two arrays")
      import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
      Divide(VectorOps.DotProduct(exprs(0), exprs(1)),
        Multiply(Sqrt(VectorOps.DotProduct(exprs(0), exprs(0))),
          Sqrt(VectorOps.DotProduct(exprs(1), exprs(1)))))
    },
    "graft_simhash64" -> { exprs =>
      require(exprs.length == 1, "graft_simhash64(tokens) takes one array")
      SimHash.SimHash64(exprs.head)
    },
    "graft_bottom_k" -> { exprs =>
      require(exprs.length == 2, "graft_bottom_k(col, k) takes a column and a literal k")
      val k = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => sys.error(s"graft_bottom_k: k must be an int literal, got $other")
      }
      graft.functions.BottomKSample.BottomK(exprs.head, k).toAggregateExpression()
    },
    "graft_approx_top_k" -> { exprs =>
      require(exprs.length == 2,
        "graft_approx_top_k(col, k) takes a column and a literal k")
      val k = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => sys.error(s"graft_approx_top_k: k must be an int literal, got $other")
      }
      graft.functions.ApproxTopK.MisraGries(exprs.head, k).toAggregateExpression()
    },
    "graft_bloom_agg" -> { exprs =>
      require(exprs.length == 3,
        "graft_bloom_agg(key, numBits, numHashes) — key BIGINT, literal sizes")
      import org.apache.spark.sql.catalyst.expressions.Literal
      val bits = exprs(1) match {
        case Literal(v: Long, _) => v
        case Literal(v: Int, _) => v.toLong
        case other => sys.error(s"graft_bloom_agg: numBits must be an integer literal, got $other")
      }
      val hashes = exprs(2) match {
        case Literal(v: Int, _) => v
        case other => sys.error(s"graft_bloom_agg: numHashes must be an int literal, got $other")
      }
      graft.functions.BloomFilter.BloomAgg(exprs.head, bits, hashes)
        .toAggregateExpression()
    },
    "graft_might_contain" -> { exprs =>
      require(exprs.length == 2, "graft_might_contain(blob, key) takes two args")
      graft.functions.BloomFilter.MightContain(exprs(0), exprs(1))
    },
    "graft_cms_agg" -> { exprs =>
      require(exprs.length == 3,
        "graft_cms_agg(token, depth, width) — literal sizes")
      import org.apache.spark.sql.catalyst.expressions.Literal
      val Seq(d, w) = exprs.tail.map {
        case Literal(v: Int, _) => v
        case other => sys.error(s"graft_cms_agg: depth/width must be int literals, got $other")
      }
      graft.functions.CountMin.CountMinAgg(exprs.head, d, w)
        .toAggregateExpression()
    },
    "graft_cms_estimate" -> { exprs =>
      require(exprs.length == 2, "graft_cms_estimate(blob, token) takes two args")
      graft.functions.CountMin.CmsEstimate(exprs(0), exprs(1))
    })

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `--conf spark.sql.extensions=graft.GraftExtensions` — functions
  * AND the native as-of join strategy, so a cluster session gets the
  * whole custom surface declaratively (no imperative register calls).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinNative.AsOfStrategy)
  }
}
