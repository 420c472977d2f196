package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_canon(text)` — the d13 canonicalization (lowercase, strip
  * non-`[a-z0-9 ]`, collapse space runs, trim) as ONE byte-walk.
  *
  * Value-identical to the declarative chain it replaces:
  *
  * {{{
  *   trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""),
  *        " +", " "))
  * }}}
  *
  * equality pinned by spec (property test vs the chain, plus the unicode
  * edge cases: İ/K/ß/ſ map into ASCII under full lowercasing, combining
  * marks, NBSP, tabs, emoji). Pure-ASCII rows — the overwhelming case on
  * any real corpus, and checkable in the same walk — take a single pass
  * with no regex, no intermediate string, and no UTF8String→String
  * round-trip. Rows with any non-ASCII byte fall back to the EXACT chain
  * semantics: `UTF8String.toLowerCase` (the same call Spark's `lower`
  * makes under the default collation) followed by the same two
  * `java.util.regex` replacements `RegExpReplace` runs — after the
  * strip the text is pure `[a-z0-9 ]`, so the shared ASCII walk finishes
  * the collapse+trim. Compiled patterns are cached statically; the chain
  * re-checks its pattern per row.
  *
  * Why it exists: the chain pays two full regex scans plus four
  * string materializations per row (lower copy, two matcher
  * StringBuffer→String rebuilds, the UTF8String re-wraps). At sf10 that
  * owned most of d13's 21 s — per-row linear work, but 100 TB of
  * canonicalization-at-ingest is exactly the scan this engine should do
  * at memory-bandwidth speed (the t01/d17 lesson applied again).
  */
case class CanonText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_canon expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_canon"

  override def nullSafeEval(input: Any): Any =
    CanonText.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // static-style call keeps the expression inside whole-stage codegen
      val helper = ctx.addReferenceObj("canonText", CanonText,
        "graft.functions.CanonText$")
      s"${ev.value} = (UTF8String) $helper.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): CanonText =
    copy(child = newChild)
}

object CanonText {
  // the same literal patterns the declarative chain hands RegExpReplace;
  // replacement "" / " " carry no $-refs, so Matcher.replaceAll equals
  // RegExpReplace's appendReplacement loop byte-for-byte
  private val Strip = Pattern.compile("[^a-z0-9 ]")

  def compute(s: UTF8String): UTF8String = {
    val in = s.getBytes
    var ascii = true
    var i = 0
    while (i < in.length) {
      if (in(i) < 0) { ascii = false; i = in.length } else i += 1
    }
    if (ascii) walk(in)
    else {
      // exact chain semantics for the non-ASCII tail: lower() delegates
      // to UTF8String.toLowerCase, then the strip regex; what survives
      // is pure [a-z0-9 ], so the shared walk finishes collapse+trim
      val stripped = Strip.matcher(s.toLowerCase.toString).replaceAll("")
      walk(stripped.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    }
  }

  /** Lower+strip+collapse+trim over ASCII bytes in one pass. A space is
    * emitted only lazily — before the next kept character, and never at
    * offset 0 — which IS collapse-then-trim: spaces separated by
    * stripped characters merge (the chain strips first), and leading or
    * trailing runs vanish. Stripped characters do not reset the pending
    * space, exactly as deleting them before the collapse pass would. */
  private def walk(in: Array[Byte]): UTF8String = {
    val out = new Array[Byte](in.length)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < in.length) {
      var b = in(i)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if (b == ' ') pendingSpace = true
      else if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = b; o += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }
}
