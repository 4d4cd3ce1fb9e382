package graft.functions

/** Self-contained XXH64 implementation (public-domain algorithm,
  * xxhash.com spec) used by the native sketch expressions. Operates on
  * byte arrays; deterministic across JVMs and runs.
  */
object XxHash64 {
  private val Prime1 = -7046029288634856825L // 11400714785074694791
  private val Prime2 = -4417276706812531889L // 14029467366897019727
  private val Prime3 = 1609587929392839161L
  private val Prime4 = -8796714831421723037L // 9650029242287828579
  private val Prime5 = 2870177450012600261L

  def hash(data: Array[Byte], seed: Long): Long = hash(data, 0, data.length, seed)

  /** Hash of `data[off, off+len)` — byte-identical to hashing a copied
    * slice, so callers can hash windows of one packed buffer without a
    * per-window allocation (the MinHash/gram hot paths).
    */
  def hash(data: Array[Byte], off: Int, len: Int, seed: Long): Long = {
    val end = off + len
    var h: Long = 0L
    var i = off
    if (len >= 32) {
      var v1 = seed + Prime1 + Prime2
      var v2 = seed + Prime2
      var v3 = seed
      var v4 = seed - Prime1
      while (i + 32 <= end) {
        v1 = round(v1, readLong(data, i))
        v2 = round(v2, readLong(data, i + 8))
        v3 = round(v3, readLong(data, i + 16))
        v4 = round(v4, readLong(data, i + 24))
        i += 32
      }
      h = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
        java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
      h = mergeRound(h, v1); h = mergeRound(h, v2); h = mergeRound(h, v3); h = mergeRound(h, v4)
    } else {
      h = seed + Prime5
    }
    h += len
    while (i + 8 <= end) {
      h ^= round(0L, readLong(data, i))
      h = java.lang.Long.rotateLeft(h, 27) * Prime1 + Prime4
      i += 8
    }
    if (i + 4 <= end) {
      h ^= (readInt(data, i) & 0xffffffffL) * Prime1
      h = java.lang.Long.rotateLeft(h, 23) * Prime2 + Prime3
      i += 4
    }
    while (i < end) {
      h ^= (data(i) & 0xffL) * Prime5
      h = java.lang.Long.rotateLeft(h, 11) * Prime1
      i += 1
    }
    h ^= h >>> 33
    h *= Prime2
    h ^= h >>> 29
    h *= Prime3
    h ^= h >>> 32
    h
  }

  private def round(acc: Long, input: Long): Long =
    java.lang.Long.rotateLeft(acc + input * Prime2, 31) * Prime1

  private def mergeRound(acc0: Long, v: Long): Long = {
    val acc = acc0 ^ round(0L, v)
    acc * Prime1 + Prime4
  }

  private def readLong(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) | ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) | ((b(i + 7) & 0xffL) << 56)

  private def readInt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
}
