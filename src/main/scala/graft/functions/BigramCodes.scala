package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_bigram_codes(text)` — the character-bigram stream of a string
  * as an `array<long>` of codepoint-pair codes, `cp(i)*0x110000 + cp(i+1)`.
  *
  * The built-in formulation — `split(text, '')` to a per-codepoint string
  * array, then `transform(sequence(...), i -> concat(element_at(c,i),
  * element_at(c,i+1)))` — allocates one single-char string per character
  * plus one two-char string per bigram: ~35M short-lived objects per 50k
  * docs, and the bigram explode that feeds language-ID profile building
  * (t01) spends its time in that allocation churn, not in the aggregate.
  * This expression walks the UTF-8 bytes once per row and emits a
  * primitive long array.
  *
  * The long code ORDER and EQUALITY agree exactly with the string form:
  * the encoding is injective over codepoint pairs (0x110000 > any
  * codepoint), and comparing codes numerically equals comparing the
  * two-char strings byte-wise because UTF-8 byte order is codepoint
  * order. So profiles built by grouping/tie-breaking on codes select the
  * same bigrams, and set intersections count the same overlaps, as the
  * string formulation the DuckDB oracle keeps (spec-pinned).
  *
  * Strings with fewer than two codepoints yield an EMPTY array (the
  * `CASE WHEN size >= 2 ... ELSE array()` contract: explode drops the
  * doc, array_distinct intersects to zero).
  */
case class BigramCodes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bigram_codes expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bigram_codes"

  override def nullSafeEval(input: Any): Any =
    BigramCodes.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // static-style call keeps the expression inside whole-stage codegen
      // (no iterator break); the helper itself is one tight byte walk
      val helper = ctx.addReferenceObj("bigramCodes", BigramCodes,
        "graft.functions.BigramCodes$")
      s"${ev.value} = (ArrayData) $helper.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BigramCodes =
    copy(child = newChild)
}

object BigramCodes {
  private val EmptyCodes: ArrayData =
    ArrayData.toArrayData(Array.empty[Long])

  /** One pass over the UTF-8 bytes: decode codepoints, emit pair codes.
    * Surrogate-correct by construction (codepoints, not UTF-16 units),
    * matching DuckDB's character semantics for `substring(text, i, 2)`. */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < 2) return EmptyCodes
    val out = new Array[Long](n - 1)
    var prev = str.codePointAt(0)
    var at = Character.charCount(prev)
    var i = 0
    while (i < n - 1) {
      val cur = str.codePointAt(at)
      out(i) = prev.toLong * 0x110000L + cur
      prev = cur
      at += Character.charCount(cur)
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}
