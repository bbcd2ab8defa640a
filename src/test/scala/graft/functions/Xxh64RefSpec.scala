package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** The independent scalar xxh64 must agree bit-for-bit with Spark's
  * XXH64 (the hash the native SimHash64 expression uses) — this is
  * what licenses Fixtures.simhashScalar as an oracle reference.
  */
class Xxh64RefSpec extends AnyFunSuite {

  private def sparkHash(bytes: Array[Byte], seed: Long): Long = {
    val u = UTF8String.fromBytes(bytes)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), seed)
  }

  test("agrees with Spark's XXH64 on every length 0..100, multiple seeds") {
    // deterministic pseudo-random content (no Random: reproducible)
    for (len <- 0 to 100; seed <- Seq(0L, 42L, -1L, 0x123456789abcdefL)) {
      val bytes = Array.tabulate(len)(i => ((i * 131 + len * 7 + 13) % 251).toByte)
      assert(Xxh64Ref.hash(bytes, seed) === sparkHash(bytes, seed),
        s"len=$len seed=$seed")
    }
  }

  test("agrees on utf8 strings incl. multibyte") {
    for (s <- Seq("", "a", "hello world", "caffè", "naïve — dash", "日本語テキスト",
      "x" * 1000)) {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      assert(Xxh64Ref.hashUtf8(s, 42L) === sparkHash(b, 42L), s"s=$s")
    }
  }
}
