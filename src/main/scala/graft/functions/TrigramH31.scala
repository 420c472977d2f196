package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_trigram_h31(text)` — the word-3-gram shingle stream of a text
  * as an `array<long>` of [[SharedHash.h31]] codes, one per trigram
  * position (duplicates kept; `distinct` happens downstream).
  *
  * Value-identical to the declarative form it replaces on the d17
  * candidate path:
  *
  * {{{
  *   h31(explode(CASE WHEN size(w) >= 3
  *       THEN transform(sequence(1, size(w)-2),
  *                      i -> concat_ws(' ', slice(w, i, 3)))
  *       ELSE array() END))                 -- w = split(text, '\\s+')
  * }}}
  *
  * equality pinned by spec: tokenization is the same
  * `String.split("\\s+", -1)` Spark's `split` uses, the hashed bytes
  * are the UTF-8 of the single-space-joined trigram exactly as
  * `concat_ws` builds it, and the hash is the same first-15-hex-chars
  * of md5 (taken from the digest bytes directly: the first 8 bytes as
  * an unsigned big-endian word, shifted right one nibble) reduced mod
  * 2^31-1. The DuckDB oracle keeps the string formulation — both sides
  * stay bit-identical.
  *
  * Why it exists: the declarative chain pays interpreted
  * higher-order-function eval (`transform` lambdas are CodegenFallback)
  * plus one string allocation per trigram — the r11 decomposition
  * measured the shingle build owning ~8 of d17's 13 s at sf1. This
  * expression is one byte-walk per row: tokens feed a reused MD5
  * digest incrementally, no trigram string is ever materialized, and
  * the array rows carry primitive longs.
  */
case class TrigramH31(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_trigram_h31 expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_trigram_h31"

  override def nullSafeEval(input: Any): Any =
    TrigramH31.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // static-style call keeps the expression inside whole-stage codegen
      val helper = ctx.addReferenceObj("trigramH31", TrigramH31,
        "graft.functions.TrigramH31$")
      s"${ev.value} = (ArrayData) $helper.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TrigramH31 =
    copy(child = newChild)
}

/** `graft_trigram_h60(text)` — [[TrigramH31]]'s stream before the mod:
  * the raw 60-bit [[SharedHash.hash60]] of each trigram. For consumers
  * that join/count on shingle hashes and never need the minhash
  * permutation domain, 60 bits makes a collision-induced count drift
  * (~2⁻⁶⁰ per shingle pair) negligible at any corpus size. */
case class TrigramH60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_trigram_h60 expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_trigram_h60"

  override def nullSafeEval(input: Any): Any =
    TrigramH31.computeH60(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val helper = ctx.addReferenceObj("trigramH60", TrigramH31,
        "graft.functions.TrigramH31$")
      s"${ev.value} = (ArrayData) $helper.computeH60($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TrigramH60 =
    copy(child = newChild)
}

object TrigramH31 {
  private val EmptyCodes: ArrayData = ArrayData.toArrayData(Array.empty[Long])

  def compute(s: UTF8String): ArrayData = hashStream(s, toH31 = true)
  def computeH60(s: UTF8String): ArrayData = hashStream(s, toH31 = false)

  private def hashStream(s: UTF8String, toH31: Boolean): ArrayData = {
    // r13: the byte-level split (TextWalks.splitOffsets — exact
    // String.split("\\s+", -1) semantics, spec-pinned) replaced the
    // regex split, and the single-block md5 (Md5H60, spec-pinned
    // against MessageDigest) replaced the per-trigram digest calls —
    // same values, no String decode, no token arrays, no MessageDigest
    // per-call overhead. The hashed bytes are still the UTF-8 of the
    // single-space-joined trigram exactly as concat_ws builds it.
    val b = s.getBytes
    val (offs, n) = TextWalks.splitOffsets(b, new Array[Int](64))
    if (n < 3) return EmptyCodes
    val out = new Array[Long](n - 2)
    var win = new Array[Byte](256)
    var i = 0
    while (i < n - 2) {
      var wlen = 0
      var j = 0
      while (j < 3) {
        val t = i + j
        val tl = offs(2 * t + 1) - offs(2 * t)
        if (wlen + tl + 1 > win.length)
          win = java.util.Arrays.copyOf(win, math.max(win.length * 2, wlen + tl + 1))
        if (j > 0) { win(wlen) = ' '; wlen += 1 }
        System.arraycopy(b, offs(2 * t), win, wlen, tl)
        wlen += tl
        j += 1
      }
      val h60 = Md5H60.hash60(win, 0, wlen)
      out(i) = if (toH31) h60 % SharedHash.P31 else h60
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}
