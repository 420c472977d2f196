package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `graft_dot(a, b)` — double-precision dot product of two float arrays.
  *
  * The built-in formulation `aggregate(zip_with(a, b, (x,y) -> x*y), 0d,
  * (acc,v) -> acc+v)` is a HigherOrderFunction: CodegenFallback, boxing a
  * lambda per element. On the 12.5M-pair near-dup join at sf0.1 that is
  * >20 s of pure interpretation overhead. This expression generates a
  * tight primitive loop inside whole-stage codegen — same semantics, same
  * bit-exact left-to-right summation (so DuckDB oracle parity is
  * unchanged), ~20× faster. The custom-Expression escape hatch of
  * SURVEY.md §7.3, used exactly where built-ins genuinely can't express
  * the performance.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  // Mismatched lengths yield NULL (not a silently-truncated partial dot):
  // a corrupt short vector must surface, and the zip_with/list_transform
  // oracle formulations also null out on length mismatch. A null ELEMENT
  // in either array also yields NULL — the fold it claims bit-identity
  // with propagates the null product through `acc + q` (r12: the loop
  // used to silently read 0.0 for null slots; these are user-visible
  // registered SQL functions, so the fold semantics must hold for every
  // input, not just fixture arrays).
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if ($anyNull) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}

/** `graft_dot_fd(a, b)` — double-precision dot product of a float array
  * against a double array: the centroid-distance fold of the IVF family
  * (embedding is float, trained centroids are double). Same bit-exact
  * left-to-right summation as the `aggregate(zip_with(a, b, (x, y) ->
  * cast(x AS double) * y), 0d, (acc, q) -> acc + q)` formulation it
  * replaces (so the DuckDB mirrors are unchanged), minus the
  * HigherOrderFunction's per-element lambda interpretation — the same
  * ~20× win [[DotProductD]] bought the float×float pair sweep. Null
  * elements null the result, matching the fold (see [[DotProductD]]). */
case class DotProductFD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot_fd expects (array<float>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot_fd"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getFloat(i).toDouble * y.getDouble(i)
        i += 1
      }
      acc
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |    $acc += (double) $a.getFloat($i) * $b.getDouble($i);
         |  }
         |  if ($anyNull) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFD =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering graft-native functions; attach with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductD].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_dot`",
              "expectedNum" -> "2",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        DotProductD(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bigram_codes"),
      new ExpressionInfo(classOf[BigramCodes].getName, "graft_bigram_codes"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_bigram_codes`",
              "expectedNum" -> "1",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        BigramCodes(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_trigram_h31"),
      new ExpressionInfo(classOf[TrigramH31].getName, "graft_trigram_h31"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_trigram_h31`",
              "expectedNum" -> "1",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        TrigramH31(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot_fd"),
      new ExpressionInfo(classOf[DotProductFD].getName, "graft_dot_fd"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_dot_fd`",
              "expectedNum" -> "2",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        DotProductFD(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cell_top1"),
      new ExpressionInfo(classOf[CellTop1].getName, "graft_cell_top1"),
      (children: Seq[Expression]) => {
        if (children.length != 3)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_cell_top1`",
              "expectedNum" -> "3",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        CellTop1(children(0), children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_trigram_h60"),
      new ExpressionInfo(classOf[TrigramH60].getName, "graft_trigram_h60"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_trigram_h60`",
              "expectedNum" -> "1",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        TrigramH60(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_canon"),
      new ExpressionInfo(classOf[CanonText].getName, "graft_canon"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_canon`",
              "expectedNum" -> "1",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        CanonText(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_ngram_fp"),
      new ExpressionInfo(classOf[NgramFpStats].getName, "graft_ngram_fp"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_ngram_fp`",
              "expectedNum" -> "2",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        NgramFpStats(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_ngram_h60"),
      new ExpressionInfo(classOf[NgramH60Stream].getName, "graft_ngram_h60"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_ngram_h60`",
              "expectedNum" -> "2",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        NgramH60Stream(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_rep_stats"),
      new ExpressionInfo(classOf[RepStats].getName, "graft_rep_stats"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_rep_stats`",
              "expectedNum" -> "1",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        RepStats(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_strip_spans"),
      new ExpressionInfo(classOf[StripSpans].getName, "graft_strip_spans"),
      (children: Seq[Expression]) => {
        if (children.length != 3)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_strip_spans`",
              "expectedNum" -> "3",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        StripSpans(children(0), children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_token_counts"),
      new ExpressionInfo(classOf[TokenCounts].getName, "graft_token_counts"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_token_counts`",
              "expectedNum" -> "1",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        TokenCounts(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_pii_stats"),
      new ExpressionInfo(classOf[PiiStats].getName, "graft_pii_stats"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_pii_stats`",
              "expectedNum" -> "1",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        PiiStats(children.head)
      }))
  }
}
