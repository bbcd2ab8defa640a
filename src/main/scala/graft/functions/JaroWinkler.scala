package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native codegen'd expression —
  * the fuzzy-match kernel for entity resolution over name/title
  * dictionaries (Spark has no built-in; a Scala UDF would box every
  * row and block whole-stage codegen).
  *
  * Semantics pinned to the textbook algorithm AS IMPLEMENTED by the
  * DuckDB oracle (`jaro_winkler_similarity`), verified value-by-value
  * in JaroWinklerSpec:
  *  - match window `max(len)/2 − 1` (floor), never negative;
  *  - transpositions = HALF the mismatch count of the matched
  *    sequences, TRUNCATED to integer (`pqrstu`/`qrpstu` — 3
  *    mismatches — scores as t = 1);
  *  - Winkler prefix boost `+ L·0.1·(1 − jaro)` with L = common
  *    prefix capped at 4, applied only when jaro > 0.7;
  *  - empty side → 0; equal strings → 1; null → null.
  */
object JaroWinklerImpl {

  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString; val s2 = b.toString
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1); val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var matched = false
      while (j <= hi && !matched) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatch = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) mismatch += 1
        k += 1
      }
      i += 1
    }
    val t = mismatch / 2 // truncated — matches the oracle
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val maxL = math.min(4, math.min(l1, l2))
      while (l < maxL && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"JaroWinkler expects (string, string), got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call — stays inside whole-stage codegen, no boxing
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerImpl.similarity($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaroWinkler {
  import org.apache.spark.sql.GraftBridge
  def jaroWinkler(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinkler(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
