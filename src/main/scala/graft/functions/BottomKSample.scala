package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Deterministic distributed sampling as a custom
  * `TypedImperativeAggregate` (the sketch-state aggregate category —
  * spark_guide "For aggregates ... TypedImperativeAggregate (mutable
  * buffer, e.g., HLL/sketches)").
  *
  * `bottom_k_sample(col, k)` keeps the k values with the SMALLEST
  * md5(value) — a bottom-k hash sketch. Properties that matter for
  * training-data pipelines:
  *  - uniform-like selection without RNG state → the same inputs give
  *    the same sample on any cluster size (partial buffers merge by
  *    keeping the global bottom-k, so partitioning cannot change the
  *    result);
  *  - mergeable: O(k) state per group, map-side combine works;
  *  - engine-portable: md5 is shared with DuckDB, so the result is
  *    oracle-checkable (q51).
  *
  * Values are LONGs (ids — the usual sampling unit); output is the
  * sampled ids ordered by their hash (the canonical sketch order).
  */
object BottomKSample {

  private def md5Of(v: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(v.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** max-heap on (hash, value) so the worst member is evicted first */
  type Buf = mutable.PriorityQueue[(String, Long)]

  case class BottomK(child: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buf] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def createAggregationBuffer(): Buf =
      mutable.PriorityQueue.empty[(String, Long)](Ordering.Tuple2[String, Long])

    override def update(buf: Buf, input: InternalRow): Buf = {
      val v = child.eval(input)
      if (v != null) add(buf, (md5Of(v.asInstanceOf[Long]), v.asInstanceOf[Long]))
      buf
    }

    override def merge(buf: Buf, other: Buf): Buf = {
      other.foreach(add(buf, _))
      buf
    }

    private def add(buf: Buf, item: (String, Long)): Unit = {
      if (buf.size < k) buf.enqueue(item)
      else if (Ordering.Tuple2[String, Long].lt(item, buf.head)) {
        buf.dequeue(); buf.enqueue(item)
      }
    }

    override def eval(buf: Buf): Any =
      new GenericArrayData(buf.toSeq.sorted.map(_._2).toArray)

    override def serialize(buf: Buf): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      buf.foreach { case (h, v) => out.writeUTF(h); out.writeLong(v) }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = createAggregationBuffer()
      (0 until n).foreach(_ => buf.enqueue((in.readUTF(), in.readLong())))
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): BottomK =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BottomK =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  }

  def bottomKSample(c: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(BottomK(GraftBridge.expression(c), k)
      .toAggregateExpression())
  }
}
