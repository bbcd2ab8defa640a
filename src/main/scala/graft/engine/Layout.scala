package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering: Morton (Z-order) keys and the clustered
  * write that turns them into file-skipping.
  *
  * Why this matters at 100 TB: parquet scans prune FILES via
  * footer min/max stats, but a layout sorted on one column only
  * prunes predicates on that column — a filter on the second
  * dimension touches every file. Sorting by the interleaved-bit
  * Morton key bounds BOTH dimensions within each file, so a 2-D
  * selective query touches ~√(selectivity) of the files instead of
  * all of them. Same mechanism Delta/Iceberg's OPTIMIZE ZORDER
  * uses; here it is a plain column expression + repartitionByRange,
  * nothing engine-private.
  *
  * The key is pure integer arithmetic (shift/mask spreading, the
  * classic magic-number interleave), so it is codegen'd in Spark
  * and replayable verbatim in the DuckDB oracle (q85) — no UDF, no
  * engine-private hashing.
  */
object Layout {

  /** Spread the low 16 bits of `v` to the even bit positions of a
    * 32-bit lane: ...b2 b1 b0 → ...0 b2 0 b1 0 b0.
    */
  private def spread16(v: Column): Column = {
    val x0 = v.bitwiseAND(lit(0xFFFFL))
    val x1 = (x0.bitwiseOR(shiftleft(x0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton key of two dimensions, each truncated to its low 16 bits
    * (callers bucket/scale real values into [0, 2^16) first — q85
    * uses `% 256`). x occupies even bits, y odd bits.
    */
  def zValue(x: Column, y: Column): Column =
    spread16(x.cast("long")).bitwiseOR(shiftleft(spread16(y.cast("long")), 1))

  /** Driver-side inverse (even-bit gather) — the test oracle for
    * bijectivity; not part of any query plan.
    */
  def unspread16(z: Long): Int = {
    var x = z & 0x55555555L
    x = (x | (x >> 1)) & 0x33333333L
    x = (x | (x >> 2)) & 0x0F0F0F0FL
    x = (x | (x >> 4)) & 0x00FF00FFL
    x = (x | (x >> 8)) & 0x0000FFFFL
    x.toInt
  }

  /** Write `df` clustered by the Morton key of (xCol, yCol):
    * range-partition into `numFiles` tasks on the key, sort within
    * each, write parquet. Every output file then carries TIGHT
    * min/max footer stats on BOTH dimensions (each file covers one
    * z-curve segment, which is a union of small 2-D tiles), so
    * selective 2-D scans skip most files. Range partitioning
    * samples the key distribution — skewed dimensions still yield
    * balanced files.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    path: String, numFiles: Int = 64): Unit =
    df.withColumn("_z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Small-file compaction plan: assign each manifest entry to an
    * output bin by cumulative-offset division — entry i (in the
    * caller's `orderCols` total order) lands in
    * bin = floor(start_offset / targetBytes), the same packing rule
    * Spark's own file-coalescing (`maxPartitionBytes`) applies to
    * splits. Entries larger than the target get a bin to themselves
    * (their start offset opens it; the next entry starts a new one is
    * NOT guaranteed — the rule is offset division, so an oversized
    * entry simply spans; this keeps the plan a pure scan-order
    * prefix-sum, no driver-side first-fit loop).
    *
    * All-integer arithmetic (byte counts), so the plan is exactly
    * reproducible in any engine. The window runs over the MANIFEST
    * (file metadata, ~10⁶ rows for 100 TB at 128 MB files), not the
    * data — driver-free and cheap; pass a partition column in
    * `orderBy`'s prefix to keep bins partition-local.
    */
  def compactionPlan(manifest: DataFrame, sizeCol: String,
                     targetBytes: Long,
                     orderBy: Seq[Column]): DataFrame = {
    require(targetBytes > 0, "compactionPlan: targetBytes must be > 0")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    manifest
      .withColumn("_cum", sum(col(sizeCol).cast("long")).over(w))
      .withColumn("bin",
        floor((col("_cum") - col(sizeCol)) / targetBytes).cast("long"))
      .drop("_cum")
  }
}
