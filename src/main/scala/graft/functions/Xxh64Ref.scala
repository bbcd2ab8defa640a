package graft.functions

/** Independent scalar xxHash64 — implemented from the public xxHash
  * specification (Yann Collet, BSD — the same algorithm Spark's
  * `catalyst.expressions.XXH64` implements), NOT by calling Spark's
  * class. Purpose: an engine-independent reference for the oracle
  * fixtures (q61): the native `SimHash64` Catalyst expression is
  * verified end-to-end against signatures recomputed with this
  * implementation on the driver, so a bug in the expression's eval
  * loop, tokenization plumbing, or bit-vote logic cannot cancel out.
  * Agreement with Spark's XXH64 across lengths 0..100 is pinned in
  * Xxh64RefSpec.
  */
object Xxh64Ref {

  private final val P1 = 0x9e3779b185ebca87L
  private final val P2 = 0xc2b2ae3d27d4eb4fL
  private final val P3 = 0x165667b19e3779f9L
  private final val P4 = 0x85ebca77c2b2ae63L
  private final val P5 = 0x27d4eb2f165667c5L

  def hashUtf8(s: String, seed: Long): Long =
    hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  def hash(bytes: Array[Byte], seed: Long): Long = {
    import java.lang.Long.rotateLeft
    val len = bytes.length
    var off = 0
    var h =
      if (len >= 32) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        while (off <= len - 32) {
          v1 = round(v1, readLong(bytes, off))
          v2 = round(v2, readLong(bytes, off + 8))
          v3 = round(v3, readLong(bytes, off + 16))
          v4 = round(v4, readLong(bytes, off + 24))
          off += 32
        }
        var acc = rotateLeft(v1, 1) + rotateLeft(v2, 7) +
          rotateLeft(v3, 12) + rotateLeft(v4, 18)
        acc = mergeRound(acc, v1)
        acc = mergeRound(acc, v2)
        acc = mergeRound(acc, v3)
        acc = mergeRound(acc, v4)
        acc
      } else seed + P5
    h += len
    while (off <= len - 8) {
      h ^= round(0L, readLong(bytes, off))
      h = rotateLeft(h, 27) * P1 + P4
      off += 8
    }
    if (off <= len - 4) {
      h ^= (readInt(bytes, off) & 0xffffffffL) * P1
      h = rotateLeft(h, 23) * P2 + P3
      off += 4
    }
    while (off < len) {
      h ^= (bytes(off) & 0xffL) * P5
      h = rotateLeft(h, 11) * P1
      off += 1
    }
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }

  private def round(acc: Long, input: Long): Long =
    java.lang.Long.rotateLeft(acc + input * P2, 31) * P1

  private def mergeRound(h: Long, v: Long): Long =
    (h ^ round(0L, v)) * P1 + P4

  private def readLong(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) |
      ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) |
      ((b(o + 3) & 0xffL) << 24) |
      ((b(o + 4) & 0xffL) << 32) |
      ((b(o + 5) & 0xffL) << 40) |
      ((b(o + 6) & 0xffL) << 48) |
      ((b(o + 7) & 0xffL) << 56)

  private def readInt(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) |
      ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)
}
