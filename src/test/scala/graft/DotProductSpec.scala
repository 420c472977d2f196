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
