package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch — the point-frequency member of graft's sketch
  * family (HLL distinct counts, GK quantiles, Misra-Gries top-k,
  * Bloom membership). A depth×width counter matrix; every update
  * increments one counter per row (row i's column = xxh64(token,
  * seed=i) mod width), an estimate is the min over rows. Merge is
  * element-wise add — commutative/associative, so map-side partials
  * compose under any partitioning and the per-group state is
  * depth·width longs no matter how many distinct tokens the corpus
  * holds (the exact form shuffles one row per distinct token).
  *
  * Guarantees (Cormode-Muthukrishnan; law-tested in CountMinSpec,
  * TRUE-pinned in q86):
  *  - estimate ≥ true frequency, always (counters only over-count);
  *  - estimate ≤ true + t·e·N/width with prob ≥ 1 − (e·t)^-depth
  *    per probe (Markov per row, independent rows) — q86 pins t = 3.
  *
  * Hashing is `Xxh64Ref` (graft's from-spec scalar xxh64, pinned
  * bit-for-bit against Spark's in Xxh64RefSpec) with the row index
  * as seed, shared by build and probe through the static helpers.
  */
object CountMin {

  def rowCol(token: UTF8String, row: Int, width: Int): Int =
    java.lang.Math.floorMod(
      Xxh64Ref.hash(token.getBytes, row.toLong), width)

  /** Static probe for generated code: min over rows of the token's
    * counter. Blob layout: int depth | int width | depth·width longs.
    */
  def estimate(blob: Array[Byte], token: UTF8String): Long = {
    val bb = ByteBuffer.wrap(blob)
    val depth = bb.getInt
    val width = bb.getInt
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = bb.getLong(8 + ((i.toLong * width + rowCol(token, i, width)) * 8).toInt)
      if (c < best) best = c
      i += 1
    }
    best
  }

  case class CountMinAgg(child: Expression, depth: Int, width: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] {
    require(depth > 0 && depth <= 16, s"cms depth in [1,16]: $depth")
    require(width > 0 && width <= (1 << 24), s"cms width in [1,2^24]: $width")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"cms_agg takes a string column, got ${child.dataType}")

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](depth * width)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val tok = v.asInstanceOf[UTF8String]
        var i = 0
        while (i < depth) {
          buf(i * width + rowCol(tok, i, width)) += 1L
          i += 1
        }
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any = {
      val bb = ByteBuffer.allocate(8 + buf.length * 8)
      bb.putInt(depth); bb.putInt(width)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(buf.length * 8)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      Array.fill(bytes.length / 8)(bb.getLong)
    }

    override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  }

  /** `cms_estimate(blob, token)` — codegen'd point-frequency probe. */
  case class CmsEstimate(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == BinaryType && right.dataType == StringType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"cms_estimate(blob BINARY, token STRING), got (${left.dataType}, ${right.dataType})")

    override protected def nullSafeEval(blob: Any, tok: Any): Any =
      estimate(blob.asInstanceOf[Array[Byte]], tok.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (blob, tok) =>
        s"${ev.value} = graft.functions.CountMin.estimate($blob, $tok);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  // ——— Column API ———

  import org.apache.spark.sql.GraftBridge

  def cmsAgg(token: Column, depth: Int, width: Int): Column =
    GraftBridge.column(
      CountMinAgg(GraftBridge.expression(token), depth, width)
        .toAggregateExpression())

  def cmsEstimate(blob: Column, token: Column): Column =
    GraftBridge.column(
      CmsEstimate(GraftBridge.expression(blob), GraftBridge.expression(token)))
}
