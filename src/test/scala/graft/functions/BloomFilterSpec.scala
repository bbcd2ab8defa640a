package graft.functions

import graft.SparkSpec
import graft.engine.BloomReduce
import org.apache.spark.sql.functions._

/** Bloom-filter laws: zero false negatives under any partitioning
  * (merge = bitwise OR, order-free), a bounded false-positive rate at
  * the documented sizing, and the headline reduction law — the
  * Bloom-reduced semi join equals the plain semi join exactly.
  */
class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private val keys = (0L until 1000L).map(i => i * 7919L + 13L)
  private val nonKeys = (0L until 10000L).map(i => i * 104729L + 3L)
    .filterNot(keys.toSet)

  private def blob(parts: Int, bits: Long = 1L << 14, hashes: Int = 5): Array[Byte] =
    keys.toDF("k").repartition(parts)
      .agg(BloomFilter.bloomAgg(xxhash64($"k"), bits, hashes))
      .head().getAs[Array[Byte]](0)

  test("no false negatives, any partitioning") {
    for (parts <- Seq(1, 7, 32)) {
      val b = blob(parts)
      val misses = keys.toDF("k")
        .filter(!BloomFilter.mightContain(lit(b), xxhash64($"k"))).count()
      assert(misses === 0L, s"false negatives at parts=$parts")
    }
  }

  test("merge order cannot change the bitset (OR is order-free)") {
    assert(java.util.Arrays.equals(blob(1), blob(32)))
  }

  test("false-positive rate within theory margin") {
    // n=1000 keys, m=2^14 bits, k=5 → (1 - e^(-kn/m))^k ≈ 0.13%;
    // assert < 2% — two orders of magnitude of margin over the
    // expectation, far beyond plausible statistical swing
    val b = blob(8)
    val fp = nonKeys.toDF("k")
      .filter(BloomFilter.mightContain(lit(b), xxhash64($"k"))).count()
    assert(fp.toDouble / nonKeys.size < 0.02, s"fp=$fp of ${nonKeys.size}")
  }

  test("tiny filter saturates: all-positive, still no wrong answers") {
    // 64 bits for 1000 keys — every probe answers true (degenerate but
    // legal); the semi-join law below is what keeps results exact
    val b = keys.toDF("k").agg(BloomFilter.bloomAgg(xxhash64($"k"), 64, 3))
      .head().getAs[Array[Byte]](0)
    val hits = nonKeys.take(100).toDF("k")
      .filter(BloomFilter.mightContain(lit(b), xxhash64($"k"))).count()
    assert(hits === 100L)
  }

  test("reduction law: bloom semi join == plain semi join") {
    val fact = (0L until 5000L).map(i => (i % 2777L, i)).toDF("fk", "payload")
    val dim = keys.map(k => k % 2777L).distinct.toDF("dk")
    val reduced = BloomReduce.semiJoin(fact, dim, "fk", "dk",
      numBits = 1L << 12, numHashes = 5)
    val plain = fact.join(dim.select($"dk".as("fk")).distinct(), Seq("fk"), "left_semi")
    assert(reduced.exceptAll(plain).isEmpty && plain.exceptAll(reduced).isEmpty)
    assert(reduced.count() === plain.count())
  }

  test("SQL surface: graft_bloom_agg + graft_might_contain round-trip") {
    graft.GraftFunctions.register(spark)
    keys.toDF("k").createOrReplaceTempView("bf_keys")
    val n = spark.sql(
      """WITH b AS (SELECT graft_bloom_agg(xxhash64(k), 16384, 5) AS blob FROM bf_keys)
        |SELECT count(*) AS n FROM bf_keys, b
        |WHERE graft_might_contain(b.blob, xxhash64(k))""".stripMargin)
      .head().getLong(0)
    assert(n === keys.size.toLong)
  }
}
