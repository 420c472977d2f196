package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_cell_top1(embedding, nrm, cents)` — 1-based position of the
  * best centroid in `cents` (array<struct<cent_id: bigint,
  * ce: array<double>, cn: double>>) for a float-array `embedding` with
  * precomputed norm `nrm`, under the IVF family's total order:
  * cosine = graft_dot_fd(embedding, ce) / (nrm · cn) DESCENDING, ties to
  * the smaller cent_id. One native loop replaces the interpreted
  * `transform(...struct per centroid...)` + comparator `array_sort`
  * whose per-centroid allocations dominated assignment at corpus-sized
  * k (ProbeSemK r11: k=256 at 200k vectors spent ~4× longer in
  * assignment than in the Σ cell² sweep it feeds). Bit-identical
  * decision: the same left-to-right IEEE dot and the same
  * (cc desc, cent_id asc) order; the result is independent of the array
  * order of `cents`. A centroid whose `ce` length mismatches the
  * embedding never wins (the dot would be NULL in the fold forms).
  * Returns NULL for an empty centroid array.
  *
  * Degenerate-input contract (explicit since r12 — the tie-break used
  * to treat a NaN cosine as a tie, making the winner array-order
  * dependent): cosines compare under `java.lang.Double.compare`, the
  * SAME total order Spark's and DuckDB's ORDER BY use for doubles —
  * NaN above +Inf, so a zero-norm embedding or centroid (cc = 0/0 =
  * NaN) ranks ABOVE every finite cosine exactly as the window form
  * `orderBy(cc.desc, cent_id.asc)` ranked it, and ties still go to the
  * smaller cent_id. Null ELEMENTS (the fold forms return a NULL dot):
  * a null slot in `embedding` nulls every centroid's cosine, so the
  * result is NULL; a null `cents` entry, or a null slot in one
  * centroid's `ce`, disqualifies that centroid only (a NULL cosine
  * sorts below every value under desc, so it can never win — it only
  * decided the degenerate all-centroids-null case, where the window
  * form would pick the min cent_id over all-NULL cosines and this
  * expression returns NULL; preferred, since an all-null argmax is
  * undefined).
  */
case class CellTop1(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  private def centsTypeOk(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(Array(f0, f1, f2)), _) =>
      f0.dataType == LongType &&
        (f1.dataType match { case ArrayType(DoubleType, _) => true; case _ => false }) &&
        f2.dataType == DoubleType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), DoubleType, ct) if centsTypeOk(ct) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "graft_cell_top1 expects (array<float>, double, array<struct<" +
          "cent_id bigint, ce array<double>, cn double>>), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cell_top1"
  override def nullable: Boolean = true

  override def nullSafeEval(e: Any, nrmAny: Any, caAny: Any): Any = {
    val emb = e.asInstanceOf[ArrayData]
    val nrm = nrmAny.asInstanceOf[Double]
    val ca = caAny.asInstanceOf[ArrayData]
    val n = ca.numElements()
    val m = emb.numElements()
    var i0 = 0
    while (i0 < m) { // null emb slot nulls every fold-form cosine
      if (emb.isNullAt(i0)) return null
      i0 += 1
    }
    var bestCc = Double.NegativeInfinity
    var bestId = Long.MaxValue
    var bestPos = 0
    var j = 0
    while (j < n) {
      if (!ca.isNullAt(j)) {
        val c = ca.getStruct(j, 3)
        val ce = c.getArray(1)
        if (ce.numElements() == m) {
          val id = c.getLong(0)
          val cn = c.getDouble(2)
          var acc = 0.0
          var i = 0
          var ok = true
          while (ok && i < m) {
            if (ce.isNullAt(i)) ok = false
            else { acc += emb.getFloat(i).toDouble * ce.getDouble(i); i += 1 }
          }
          if (ok) {
            val cc = acc / (nrm * cn)
            val cmp = java.lang.Double.compare(cc, bestCc)
            if (bestPos == 0 || cmp > 0 || (cmp == 0 && id < bestId)) {
              bestCc = cc; bestId = id; bestPos = j + 1
            }
          }
        }
      }
      j += 1
    }
    if (bestPos == 0) null else bestPos
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, nrm, ca) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val ce = ctx.freshName("ce")
      val id = ctx.freshName("id")
      val cn = ctx.freshName("cn")
      val acc = ctx.freshName("acc")
      val cc = ctx.freshName("cc")
      val bestCc = ctx.freshName("bestCc")
      val bestId = ctx.freshName("bestId")
      val bestPos = ctx.freshName("bestPos")
      val embNull = ctx.freshName("embNull")
      val ok = ctx.freshName("ok")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $n = $ca.numElements();
         |int $m = $e.numElements();
         |boolean $embNull = false;
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($e.isNullAt($i)) { $embNull = true; break; }
         |}
         |double $bestCc = Double.NEGATIVE_INFINITY;
         |long $bestId = Long.MAX_VALUE;
         |int $bestPos = 0;
         |if (!$embNull) for (int $j = 0; $j < $n; $j++) {
         |  if ($ca.isNullAt($j)) continue;
         |  org.apache.spark.sql.catalyst.InternalRow $c = $ca.getStruct($j, 3);
         |  org.apache.spark.sql.catalyst.util.ArrayData $ce = $c.getArray(1);
         |  if ($ce.numElements() == $m) {
         |    long $id = $c.getLong(0);
         |    double $cn = $c.getDouble(2);
         |    double $acc = 0.0;
         |    boolean $ok = true;
         |    for (int $i = 0; $i < $m; $i++) {
         |      if ($ce.isNullAt($i)) { $ok = false; break; }
         |      $acc += (double) $e.getFloat($i) * $ce.getDouble($i);
         |    }
         |    if (!$ok) continue;
         |    double $cc = $acc / ($nrm * $cn);
         |    int $cmp = java.lang.Double.compare($cc, $bestCc);
         |    if ($bestPos == 0 || $cmp > 0 || ($cmp == 0 && $id < $bestId)) {
         |      $bestCc = $cc; $bestId = $id; $bestPos = $j + 1;
         |    }
         |  }
         |}
         |if ($bestPos == 0) { ${ev.isNull} = true; } else { ${ev.value} = $bestPos; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CellTop1 =
    copy(first = newFirst, second = newSecond, third = newThird)
}
