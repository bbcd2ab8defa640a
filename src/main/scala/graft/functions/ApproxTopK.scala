package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a `TypedImperativeAggregate` —
  * the frequent-items member of the sketch family (with HLL distinct
  * counts and GK quantiles in `ext.Sketches`). `approx_top_k(col, k)`
  * keeps AT MOST k (item, estimate) counters per group, mergeable
  * map-side, so the per-group state is O(k) no matter how many
  * distinct tokens the corpus holds — the exact top-k (a full
  * (group, token) aggregate, q45's shape) shuffles one row per
  * distinct token instead.
  *
  * Guarantees (the mergeable-summaries bounds, law-tested in
  * ApproxTopKSpec and TRUE-pinned in q75):
  *  - estimate ≤ true frequency ≤ estimate + n/(k+1), where n is the
  *    group's total item count — after ANY sequence of merges;
  *  - every item with true frequency > n/(k+1) is IN the summary.
  * Estimates themselves depend on merge order (as with any MG
  * deployment), so the harness exposes only the guaranteed facts.
  */
object ApproxTopK {

  type Buf = mutable.HashMap[String, Long]

  private val outType = ArrayType(StructType(Seq(
    StructField("tok", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  case class MisraGries(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buf] {
    require(k > 0, "approx_top_k needs k > 0")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = outType
    // analysis-time type check: without it a non-string column would
    // pass resolution and ClassCastException inside executor tasks
    // (ExpectsInputTypes is unavailable here — AbstractDataType is
    // private[sql] — so the check is implemented directly)
    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"approx_top_k requires a string column, got ${child.dataType}")

    override def createAggregationBuffer(): Buf = mutable.HashMap.empty

    override def update(buf: Buf, input: InternalRow): Buf = {
      val v = child.eval(input)
      if (v != null) {
        val s = v.asInstanceOf[UTF8String].toString
        buf.get(s) match {
          case Some(c) => buf.update(s, c + 1)
          case None if buf.size < k => buf.update(s, 1L)
          case None =>
            // classic MG decrement step: the new item and every
            // counter pay one; zeroed counters free their slot
            val dead = mutable.ArrayBuffer.empty[String]
            buf.foreach { case (t, c) =>
              if (c == 1L) dead += t else buf.update(t, c - 1)
            }
            dead.foreach(buf.remove)
        }
      }
      buf
    }

    override def merge(buf: Buf, other: Buf): Buf = {
      other.foreach { case (t, c) => buf.update(t, buf.getOrElse(t, 0L) + c) }
      if (buf.size > k) {
        // mergeable-summaries compression: subtract the (k+1)-th
        // largest count from everything, drop the non-positive
        val cutoff = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        val dead = mutable.ArrayBuffer.empty[String]
        buf.foreach { case (t, c) =>
          if (c - cutoff <= 0L) dead += t else buf.update(t, c - cutoff)
        }
        dead.foreach(buf.remove)
      }
      buf
    }

    override def eval(buf: Buf): Any = {
      val rows = buf.toSeq.sortBy { case (t, c) => (-c, t) }.map { case (t, c) =>
        InternalRow(UTF8String.fromString(t), c)
      }
      new GenericArrayData(rows.toArray[Any])
    }

    // length-prefixed raw UTF-8, not writeUTF: modified-UTF-8 caps a
    // string at 65535 encoded bytes, and one whitespace-free 64 KB+
    // token (base64 blob, minified JS) would fail the shuffle
    override def serialize(buf: Buf): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      buf.foreach { case (t, c) =>
        val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(b.length); out.write(b); out.writeLong(c)
      }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = createAggregationBuffer()
      (0 until n).foreach { _ =>
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
          in.readLong())
      }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): MisraGries =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MisraGries =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  }

  def approxTopK(c: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(MisraGries(GraftBridge.expression(c), k)
      .toAggregateExpression())
  }
}
