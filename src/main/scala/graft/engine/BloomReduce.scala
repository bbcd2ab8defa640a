package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomFilter

/** Semi-join reduction via a Bloom filter (`functions.BloomFilter`).
  *
  * The 100 TB shape this exists for: `fact ⋉ dim` where dim's key set
  * is too large to broadcast as an exact hash relation (Spark then
  * falls back to a shuffle join — BOTH sides repartition), but a
  * few-hundred-MB bitset over dim's keys still fits in one broadcast.
  * The bitset is built by one distributed aggregate over dim (partial
  * bitsets OR-merge map-side), and the fact side drops non-candidate
  * rows in its scan stage — the join shuffle then moves only rows
  * that (modulo the configured false-positive rate) actually join.
  * The exact join still runs on the survivors, so results are exact.
  *
  * Sizing: numBits ≈ 10 bits/key gives ~1% FP at numHashes = 7
  * (optimal k = bits/key · ln 2). Callers size for the dim
  * cardinality they expect; over-sizing only costs broadcast bytes.
  */
object BloomReduce {

  /** Build the dim-side bitset blob (driver-held, like a centroid
    * table: one row, `8 + numBits/8` bytes — never row data).
    */
  def buildBlob(keys: DataFrame, keyCol: String,
                numBits: Long, numHashes: Int): Array[Byte] =
    keys.agg(BloomFilter.bloomAgg(xxhash64(col(keyCol)), numBits, numHashes)
      .as("blob")).head().getAs[Array[Byte]](0)

  /** The map-side candidate predicate for `factKey` against a blob. */
  def candidate(blob: Array[Byte], factKey: Column): Column =
    BloomFilter.mightContain(lit(blob), xxhash64(factKey))

  /** Exact left-semi join with Bloom pre-reduction: filter fact
    * map-side by the blob, then left-semi join the survivors against
    * the true key set. Result equals the plain semi-join on any
    * input (no false negatives — law in BloomFilterSpec).
    */
  def semiJoin(fact: DataFrame, keys: DataFrame,
               factKey: String, keyCol: String,
               numBits: Long = 1L << 20, numHashes: Int = 7): DataFrame = {
    val blob = buildBlob(keys, keyCol, numBits, numHashes)
    fact.filter(candidate(blob, col(factKey)))
      .join(keys.select(col(keyCol).as(factKey)).distinct(),
        Seq(factKey), "left_semi")
  }
}
