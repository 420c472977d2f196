package graft.functions

import java.security.MessageDigest

/** The engine's shingle hash, computed without MessageDigest overhead.
  *
  * Every cross-engine hash in this codebase is derived from md5
  * (SharedHash: first 15 hex chars = first 8 digest bytes big-endian
  * >>> 4), and the dedup/fingerprint walks call it once per shingle —
  * tens of millions of times per task on a document scan. The JDK
  * MessageDigest path pays per-call engine-buffer management that
  * dwarfs the actual compression for ~30-byte inputs, so this object
  * implements the RFC 1321 md5 compression directly for the dominant
  * case: messages ≤ 55 bytes, which pad to exactly ONE 64-byte block.
  * Longer inputs fall back to MessageDigest (bit-identical by
  * definition — both are md5). Only the first 8 digest bytes are
  * needed for h60, i.e. the A and B state words — C/D are folded into
  * the computation but never serialized.
  *
  * Constants are the RFC 1321 table T[i] = floor(2^32·|sin(i+1)|) and
  * the standard per-round rotation amounts. Md5H60Spec pins equality
  * against java.security.MessageDigest on random inputs of every
  * length class.
  */
object Md5H60 extends Serializable {

  private val K = Array(
    0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee,
    0xf57c0faf, 0x4787c62a, 0xa8304613, 0xfd469501,
    0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
    0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821,
    0xf61e2562, 0xc040b340, 0x265e5a51, 0xe9b6c7aa,
    0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
    0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed,
    0xa9e3e905, 0xfcefa3f8, 0x676f02d9, 0x8d2a4c8a,
    0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
    0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70,
    0x289b7ec6, 0xeaa127fa, 0xd4ef3085, 0x04881d05,
    0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
    0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039,
    0x655b59c3, 0x8f0ccc92, 0xffeff47d, 0x85845dd1,
    0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
    0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391)

  private val S = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)

  private val md5tl = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Reused single-block message schedule — one per thread. */
  private val mtl = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](16)
  }

  /** h60 of `buf[off, off+len)`: the first 15 hex chars of its md5
    * parsed base-16 — the value `SharedHash.hash60` computes in SQL. */
  def hash60(buf: Array[Byte], off: Int, len: Int): Long = {
    if (len > 55) return fallback(buf, off, len)
    val m = mtl.get()
    java.util.Arrays.fill(m, 0)
    var i = 0
    while (i < len) {
      m(i >> 2) |= (buf(off + i) & 0xff) << ((i & 3) << 3)
      i += 1
    }
    m(len >> 2) |= 0x80 << ((len & 3) << 3)
    m(14) = len << 3 // bit length, low word; high word m(15) stays 0

    var a = 0x67452301
    var b = 0xefcdab89
    var c = 0x98badcfe
    var d = 0x10325476
    i = 0
    while (i < 16) {
      val f = ((b & c) | (~b & d)) + a + K(i) + m(i)
      a = d; d = c; c = b
      b = b + Integer.rotateLeft(f, S(i))
      i += 1
    }
    while (i < 32) {
      val f = ((d & b) | (~d & c)) + a + K(i) + m((5 * i + 1) & 15)
      a = d; d = c; c = b
      b = b + Integer.rotateLeft(f, S(i))
      i += 1
    }
    while (i < 48) {
      val f = (b ^ c ^ d) + a + K(i) + m((3 * i + 5) & 15)
      a = d; d = c; c = b
      b = b + Integer.rotateLeft(f, S(i))
      i += 1
    }
    while (i < 64) {
      val f = (c ^ (b | ~d)) + a + K(i) + m((7 * i) & 15)
      a = d; d = c; c = b
      b = b + Integer.rotateLeft(f, S(i))
      i += 1
    }
    val outA = 0x67452301 + a
    val outB = 0xefcdab89 + b
    // digest bytes 0-7 are LE(outA) ++ LE(outB); h60 reads them as one
    // big-endian word >>> 4 — i.e. byte-reverse each half
    val v = (Integer.reverseBytes(outA).toLong << 32) |
      (Integer.reverseBytes(outB).toLong & 0xffffffffL)
    v >>> 4
  }

  private def fallback(buf: Array[Byte], off: Int, len: Int): Long = {
    val md = md5tl.get()
    md.update(buf, off, len)
    val d = md.digest()
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    v >>> 4
  }
}
