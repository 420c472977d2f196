package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** graft_dot must be BIT-IDENTICAL to the built-in left-to-right fold —
  * the DuckDB oracle parity of every similarity operator depends on it. */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private val builtinDot =
    "aggregate(zip_with(a, b, (x, y) -> cast(x AS double) * cast(y AS double)), " +
      "cast(0.0 AS double), (acc, v) -> acc + v)"

  test("graft_dot equals the interpreted fold bit-for-bit on random vectors") {
    val rnd = new Random(42)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.between(-10f, 10f)),
      Array.fill(64)(rnd.between(-10f, 10f))))
    val out = rows.toDF("a", "b")
      .select(expr("graft_dot(a, b)").as("custom"), expr(builtinDot).as("builtin"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_dot handles empty arrays and nulls") {
    val df = Seq((Array.empty[Float], Array.empty[Float])).toDF("a", "b")
    assert(df.select(expr("graft_dot(a, b)")).first().getDouble(0) === 0.0)
    val withNull = spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))")
    assert(withNull.first().isNullAt(0))
  }

  test("graft_dot returns NULL on length mismatch (corrupt vectors surface, not truncate)") {
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    assert(df.select(expr("graft_dot(a, b)")).first().isNullAt(0))
    // and through the non-codegen eval path too
    val interpreted = spark.range(1).select(
      expr("graft_dot(array(cast(1.0 as float), cast(2.0 as float)), array(cast(1.0 as float)))"))
    assert(interpreted.first().isNullAt(0))
  }

  private val builtinDotFD =
    "aggregate(zip_with(a, b, (x, y) -> cast(x AS double) * y), " +
      "cast(0.0 AS double), (acc, v) -> acc + v)"

  test("graft_dot_fd equals the interpreted mixed fold bit-for-bit on random vectors") {
    val rnd = new Random(43)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.between(-10f, 10f)),
      Array.fill(64)(rnd.between(-10.0, 10.0))))
    val out = rows.toDF("a", "b")
      .select(expr("graft_dot_fd(a, b)").as("custom"), expr(builtinDotFD).as("builtin"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_dot_fd nulls on length mismatch and rejects wrong types") {
    val df = Seq((Array(1f, 2f, 3f), Array(1.0, 2.0))).toDF("a", "b")
    assert(df.select(expr("graft_dot_fd(a, b)")).first().isNullAt(0))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_dot_fd(array(1.0D), array(1.0D))").collect()
    }
    assert(err.getMessage.contains("graft_dot_fd"))
  }

  test("graft_cell_top1 equals the comparator-argsort form on random centroids (incl. ties)") {
    val rnd = new Random(44)
    // low-resolution vectors so cosine TIES actually occur and exercise
    // the cent_id tiebreak
    val cents = (0L until 16L).map(i =>
      (i, Seq.fill(8)(rnd.between(-2, 3).toDouble), 1.0 + (i % 3)))
    val rows = Seq.fill(300)(Array.fill(8)(rnd.between(-2, 3).toFloat))
    val df = rows.toDF("embedding")
      .withColumn("nrm", sqrt(expr(
        "aggregate(zip_with(embedding, embedding, (x, y) -> cast(x AS double) * cast(y AS double)), cast(0.0 AS double), (acc, v) -> acc + v)")))
      .where(col("nrm") > 0)
      .withColumn("__cents", typedlit(cents))
    val argsortForm = expr(
      """element_at(array_sort(
        |  transform(__cents, c -> struct(
        |    graft_dot_fd(embedding, c._2) / (nrm * c._3) AS cc, c._1 AS cent_id)),
        |  (a, b) -> CASE WHEN a.cc > b.cc THEN -1 WHEN a.cc < b.cc THEN 1
        |                 WHEN a.cent_id < b.cent_id THEN -1
        |                 WHEN a.cent_id > b.cent_id THEN 1 ELSE 0 END), 1).cent_id"""
        .stripMargin.replace("\n", " "))
    val top1Form = expr("element_at(__cents, graft_cell_top1(embedding, nrm, __cents))._1")
    val out = df.select(argsortForm.as("sorted"), top1Form.as("native")).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("graft_cell_top1 participates in whole-stage codegen and nulls on empty centroid arrays") {
    // embedding derives from id so constant folding can't pre-evaluate
    val df = spark.range(2).select(
        expr("array(cast(1.0 + id AS float), cast(2.0 - id AS float))").as("embedding"))
      .withColumn("nrm", sqrt(expr(
        "aggregate(zip_with(embedding, embedding, (x, y) -> cast(x AS double) * cast(y AS double)), cast(0.0 AS double), (acc, v) -> acc + v)")))
      .withColumn("__cents", typedlit(Seq((0L, Seq(1.0, 0.0), 1.0), (1L, Seq(0.0, 1.0), 1.0))))
      .select(expr("graft_cell_top1(embedding, nrm, __cents)").as("pos"))
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined &&
      !plan.contains("CodegenFallback"),
      s"graft_cell_top1 fell out of whole-stage codegen:\n$plan")
    // id=0 → (1,2): cos favors dim-2-heavy centroid 1 → position 2;
    // id=1 → (2,1): centroid 0 → position 1
    assert(df.orderBy(col("pos")).collect().map(_.getInt(0)).toSeq === Seq(1, 2))
    val empty = spark.sql(
      "SELECT graft_cell_top1(array(cast(1.0 AS float)), 1.0D, " +
        "CAST(array() AS ARRAY<STRUCT<cent_id: BIGINT, ce: ARRAY<DOUBLE>, cn: DOUBLE>>))")
    assert(empty.first().isNullAt(0))
  }

  test("graft_dot / graft_dot_fd null ELEMENTS null the result, matching the fold (r12 advisory)") {
    // the fold forms propagate a null product through acc + q; the native
    // loops must not silently sum 0.0 for null slots
    val d = spark.range(1).select(
      expr("graft_dot(array(cast(1.0 AS float), NULL), array(cast(1.0 AS float), cast(2.0 AS float)))").as("g"),
      expr("aggregate(zip_with(array(cast(1.0 AS float), NULL), array(cast(1.0 AS float), cast(2.0 AS float)), " +
        "(x, y) -> cast(x AS double) * cast(y AS double)), cast(0.0 AS double), (acc, v) -> acc + v)").as("f"))
      .first()
    assert(d.isNullAt(0) && d.isNullAt(1))
    val fd = spark.range(1).select(
      expr("graft_dot_fd(array(cast(1.0 AS float), cast(2.0 AS float)), array(1.0D, NULL))").as("g"),
      expr("aggregate(zip_with(array(cast(1.0 AS float), cast(2.0 AS float)), array(1.0D, NULL), " +
        "(x, y) -> cast(x AS double) * y), cast(0.0 AS double), (acc, v) -> acc + v)").as("f"))
      .first()
    assert(fd.isNullAt(0) && fd.isNullAt(1))
    // ...and through the codegen path (derive from id so folding can't pre-eval)
    val cg = spark.range(1).select(expr(
      "graft_dot(array(cast(id AS float), NULL), array(cast(1.0 AS float), cast(2.0 AS float)))"))
    assert(cg.first().isNullAt(0))
  }

  test("graft_cell_top1 NaN cosines follow Double.compare order (NaN above all, ties to min cent_id)") {
    // cn = 0 makes cc = x/0·nrm → NaN for zero-norm centroids: under the
    // window form's ORDER BY cc DESC (Spark ranks NaN above +Inf) a NaN
    // centroid WINS, and among several the smaller cent_id does — the
    // r12 fix makes the native argmax match that instead of being
    // array-order dependent. Both array orders must agree.
    def cents(order: Seq[(Long, Seq[Double], Double)]) =
      spark.range(1).select(
          expr("array(cast(1.0 AS float), cast(0.0 AS float))").as("embedding"),
          lit(1.0).as("nrm"))
        .withColumn("__cents", typedlit(order))
        .select(expr("element_at(__cents, graft_cell_top1(embedding, nrm, __cents))._1"))
        .first().getLong(0)
    val a = (5L, Seq(0.0, 0.0), 0.0)   // NaN cosine
    val b = (3L, Seq(0.0, 0.0), 0.0)   // NaN cosine, smaller id
    val c = (1L, Seq(1.0, 0.0), 1.0)   // finite cosine 1.0
    assert(cents(Seq(a, b, c)) === 3L)
    assert(cents(Seq(c, a, b)) === 3L)
    assert(cents(Seq(b, c, a)) === 3L)
  }

  test("graft_cell_top1 null elements: null emb slot → NULL; null centroid/ce slot skipped") {
    val df = spark.range(1).select(
      expr("graft_cell_top1(array(cast(1.0 AS float), NULL), 1.0D, " +
        "array(named_struct('cent_id', 0L, 'ce', array(1.0D, 0.0D), 'cn', 1.0D)))"))
    assert(df.first().isNullAt(0))
    // centroid 0 has a null ce slot (its fold dot is NULL — sorts below
    // every finite cosine under desc) → centroid 1 wins
    val skip = spark.range(1).select(
      expr("graft_cell_top1(array(cast(1.0 AS float), cast(0.0 AS float)), 1.0D, array(" +
        "named_struct('cent_id', 0L, 'ce', array(1.0D, NULL), 'cn', 1.0D), " +
        "named_struct('cent_id', 1L, 'ce', array(0.0D, 1.0D), 'cn', 1.0D)))"))
    assert(skip.first().getInt(0) === 2)
    // a NULL cents ENTRY is skipped, not an NPE
    val nullEntry = spark.range(1).select(
      expr("graft_cell_top1(array(cast(1.0 AS float)), 1.0D, array(" +
        "CAST(NULL AS STRUCT<cent_id: BIGINT, ce: ARRAY<DOUBLE>, cn: DOUBLE>), " +
        "named_struct('cent_id', 7L, 'ce', array(2.0D), 'cn', 2.0D)))"))
    assert(nullEntry.first().getInt(0) === 2)
    // all centroids disqualified → NULL (the undefined argmax)
    val allNull = spark.range(1).select(
      expr("graft_cell_top1(array(cast(1.0 AS float)), 1.0D, array(" +
        "named_struct('cent_id', 0L, 'ce', array(CAST(NULL AS DOUBLE)), 'cn', 1.0D)))"))
    assert(allNull.first().isNullAt(0))
  }

  test("graft_dot participates in whole-stage codegen (no CodegenFallback)") {
    val df = spark.range(4).select(
        expr("transform(sequence(1, 8), i -> cast(i * (id + 1) AS float))").as("a"),
        expr("transform(sequence(1, 8), i -> cast(i + id AS float))").as("b"))
      .select(expr("graft_dot(a, b)").as("d"), col("a"), col("b"))
    // a `*(n)` stage prefix on the graft_dot Project = inside WholeStageCodegen
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[graft_dot""".r.findFirstIn(plan).isDefined,
      s"graft_dot fell out of whole-stage codegen:\n$plan")
    // id=0: a=[1..8], b=[1..8] → Σ i²
    assert(df.orderBy(col("d")).first().getDouble(0) === (1 to 8).map(i => i * i).sum.toDouble)
  }
}
