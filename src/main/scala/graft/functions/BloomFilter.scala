package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Bloom-filter semi-join reduction, the classic shuffle killer for
  * "big fact ⋈ not-broadcastable dim": build a bitset over the dim
  * keys with ONE distributed aggregate, ship the blob (bits ≪ keys)
  * to every fact task, and drop non-matching fact rows MAP-SIDE
  * before they ever enter the join shuffle. False positives only —
  * the exact join downstream removes them — never false negatives,
  * so the reduced join's result is bit-identical to the unreduced
  * one (law-tested in BloomFilterSpec).
  *
  * Spark's optimizer has an internal runtime-filter version of this
  * shape; graft exposes it as a USER-level operator
  * (`engine.BloomReduce`) so a pipeline can apply it where the
  * optimizer can't see the opportunity (pre-computed key rosters,
  * cross-job reuse of a persisted blob, dim sides built outside the
  * current plan).
  *
  * Blob layout (self-describing, so `might_contain` needs no config):
  *   int numHashes | int numWords | numWords × long (little-endian).
  *
  * Hashing: double hashing over the caller-supplied 64-bit key
  * (callers pass `xxhash64(col)` — hashing stays visible in the
  * plan). h1 = key, h2 = splitmix64(key) | 1 (odd ⇒ full cycle);
  * bit_i = floorMod(h1 + i·h2, numBits) — the standard Kirsch-
  * Mitzenmacher construction.
  */
object BloomFilter {

  /** splitmix64 finalizer — the same public-domain mix graft's LSH
    * hyperplanes use; here it derives the second hash stream.
    */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def setBit(words: Array[Long], key: Long, numHashes: Int): Unit = {
    val numBits = words.length.toLong * 64L
    val h2 = mix64(key) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(key + i.toLong * h2, numBits)
      words((bit >>> 6).toInt) |= (1L << (bit & 63L))
      i += 1
    }
  }

  /** Static entry point referenced from generated Java — keep the
    * signature (byte[], long) stable.
    */
  def mightContain(blob: Array[Byte], key: Long): Boolean = {
    val bb = ByteBuffer.wrap(blob)
    val numHashes = bb.getInt
    val numWords = bb.getInt
    val numBits = numWords.toLong * 64L
    val h2 = mix64(key) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(key + i.toLong * h2, numBits)
      val word = bb.getLong(8 + (bit >>> 6).toInt * 8)
      if ((word & (1L << (bit & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  /** Bitset aggregate over 64-bit keys. numBits rounds up to a whole
    * number of words; merge is wordwise OR (commutative/associative ⇒
    * map-side partials compose in any order).
    */
  case class BloomAgg(child: Expression, numBits: Long, numHashes: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] {
    require(numBits > 0 && numBits <= (1L << 31) * 8,
      "bloom_agg: numBits must be in (0, 2^34]")
    require(numHashes > 0 && numHashes <= 16,
      "bloom_agg: numHashes must be in [1, 16]")

    private val numWords: Int = (((numBits + 63) / 64).min(Int.MaxValue)).toInt

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"bloom_agg takes a BIGINT key (pass xxhash64(col)), got ${child.dataType}")

    override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) setBit(buf, v.asInstanceOf[Long], numHashes)
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buf.length) { buf(i) |= other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any = {
      val bb = ByteBuffer.allocate(8 + buf.length * 8)
      bb.putInt(numHashes); bb.putInt(buf.length)
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
      Array.fill((bytes.length / 8))(bb.getLong)
    }

    override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  }

  /** `might_contain(blob, key)` — codegen'd membership probe. The
    * blob is typically a literal (one collected bitset, exactly like
    * the IVF centroid table), so the per-row work is the k probes.
    */
  case class MightContain(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == BinaryType && right.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"might_contain(blob BINARY, key BIGINT), got (${left.dataType}, ${right.dataType})")

    override protected def nullSafeEval(blob: Any, key: Any): Any =
      mightContain(blob.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (blob, key) =>
        s"${ev.value} = graft.functions.BloomFilter.mightContain($blob, $key);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  // ——— Column API ———

  import org.apache.spark.sql.GraftBridge

  def bloomAgg(key: Column, numBits: Long, numHashes: Int): Column =
    GraftBridge.column(
      BloomAgg(GraftBridge.expression(key), numBits, numHashes)
        .toAggregateExpression())

  def mightContain(blob: Column, key: Column): Column =
    GraftBridge.column(
      MightContain(GraftBridge.expression(blob), GraftBridge.expression(key)))
}
