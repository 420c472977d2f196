package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Md5H60

/** The hand-rolled single-block md5 must agree with
  * java.security.MessageDigest for every input length class — the
  * shingle hashes it feeds are row-compared against the DuckDB oracle's
  * md5, so any drift is a correctness failure, not a perf bug.
  */
class Md5H60Spec extends AnyFunSuite {

  private def reference(buf: Array[Byte], off: Int, len: Int): Long = {
    val d = MessageDigest.getInstance("MD5").digest(
      java.util.Arrays.copyOfRange(buf, off, off + len))
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    v >>> 4
  }

  test("every length 0..200 on deterministic bytes (covers one-block and fallback)") {
    val rnd = new scala.util.Random(0x1321)
    for (len <- 0 to 200) {
      val buf = new Array[Byte](len + 16)
      rnd.nextBytes(buf)
      val off = rnd.nextInt(8)
      assert(Md5H60.hash60(buf, off, len) === reference(buf, off, len), s"len=$len off=$off")
    }
  }

  test("boundary lengths 54/55/56/63/64/65 at random offsets, many trials") {
    val rnd = new scala.util.Random(0x60)
    for (_ <- 1 to 500; len <- Seq(54, 55, 56, 63, 64, 65)) {
      val buf = new Array[Byte](len + 32)
      rnd.nextBytes(buf)
      val off = rnd.nextInt(16)
      assert(Md5H60.hash60(buf, off, len) === reference(buf, off, len), s"len=$len off=$off")
    }
  }

  test("2000 random inputs of random lengths") {
    val rnd = new scala.util.Random(0xd5)
    for (_ <- 1 to 2000) {
      val len = rnd.nextInt(120)
      val buf = new Array[Byte](len + 8)
      rnd.nextBytes(buf)
      val off = rnd.nextInt(4)
      assert(Md5H60.hash60(buf, off, len) === reference(buf, off, len), s"len=$len off=$off")
    }
  }

  test("known vectors: md5 of '' and 'abc' and a shingle-shaped string") {
    // md5("") = d41d8cd98f00b204e9800998ecf8427e -> first 15 hex = d41d8cd98f00b20
    assert(Md5H60.hash60(Array.empty[Byte], 0, 0) === java.lang.Long.parseLong("d41d8cd98f00b20", 16))
    val abc = "abc".getBytes("UTF-8")
    // md5("abc") = 900150983cd24fb0d6963f7d28e17f72
    assert(Md5H60.hash60(abc, 0, 3) === java.lang.Long.parseLong("900150983cd24fb", 16))
    val sh = "merge batch spark line".getBytes("UTF-8")
    assert(Md5H60.hash60(sh, 0, sh.length) === reference(sh, 0, sh.length))
  }
}
