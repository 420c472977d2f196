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
  private val Space: Array[Byte] = Array(' '.toByte)

  // MessageDigest is stateful; one per executor thread, reset by digest()
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String): ArrayData = hashStream(s, toH31 = true)
  def computeH60(s: UTF8String): ArrayData = hashStream(s, toH31 = false)

  private def hashStream(s: UTF8String, toH31: Boolean): ArrayData = {
    // the same split semantics as Spark's split(text, "\\s+"): Java
    // regex, limit -1 (trailing empty tokens kept)
    val tokens = s.toString.split("\\s+", -1)
    val n = tokens.length
    if (n < 3) return EmptyCodes
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      bytes(i) = tokens(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    val md = md5.get()
    val out = new Array[Long](n - 2)
    i = 0
    while (i < n - 2) {
      md.update(bytes(i)); md.update(Space)
      md.update(bytes(i + 1)); md.update(Space)
      md.update(bytes(i + 2))
      val d = md.digest() // resets the digest for the next trigram
      // first 15 hex chars of the md5 = first 8 digest bytes as an
      // unsigned big-endian word, dropped one (lowest) nibble
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      val h60 = v >>> 4
      out(i) = if (toH31) h60 % SharedHash.P31 else h60
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}
