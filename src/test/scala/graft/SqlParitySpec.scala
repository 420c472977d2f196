package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{CartAnalytics, CartSql}

/** SQL-text entry point ≡ DataFrame builder: both paths must return the
  * same rows in the same order (SURVEY.md §3.1 — the reference's dominant
  * entry path is `spark.sql`). */
class SqlParitySpec extends SparkSpec {

  private def sameRows(a: DataFrame, b: DataFrame): Unit = {
    val (ra, rb) = (a.collect(), b.collect())
    assert(ra.length === rb.length, s"row counts differ: ${ra.length} vs ${rb.length}")
    ra.zip(rb).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x === y, s"row $i differs:\n  dsl=$x\n  sql=$y")
    }
  }

  test("q01 SQL text == DataFrame builder") {
    sameRows(CartAnalytics.q01TopAbandonedParts(spark, sf), CartSql.q01Sql(spark, sf))
  }

  test("q04 SQL text (HAVING on alias) == DataFrame builder") {
    sameRows(CartAnalytics.q04YoyIncrease(spark, sf), CartSql.q04Sql(spark, sf))
  }

  test("q05 SQL text (FULL JOIN zero-fill) == DataFrame builder") {
    sameRows(CartAnalytics.q05AbandonedByCustomerNation(spark, sf), CartSql.q05Sql(spark, sf))
  }

  test("q06 SQL text (chained LEFT-then-RIGHT left-deep join) == DataFrame builder") {
    sameRows(CartAnalytics.q06AbandonedBySupplierNation(spark, sf), CartSql.q06Sql(spark, sf))
  }

  test("q07 SQL text (computed-key equi join) == DataFrame builder") {
    sameRows(CartAnalytics.q07ComputedKeyJoin(spark, sf), CartSql.q07Sql(spark, sf))
  }

  test("q08 SQL text (GROUP BY alias) == DataFrame builder") {
    sameRows(CartAnalytics.q08LaunchCohorts(spark, sf), CartSql.q08Sql(spark, sf))
  }

  test("q09 SQL text (scalar-subquery launch-year filter) == DataFrame builder") {
    sameRows(CartAnalytics.q09LaunchYearTopParts(spark, sf), CartSql.q09Sql(spark, sf))
  }

  test("q11 SQL text (daily spine gapfill, bounds CTE) == DataFrame builder") {
    sameRows(CartAnalytics.q11DailyGapfill(spark, sf), CartSql.q11Sql(spark, sf))
  }

  test("q10 SQL text (spine gapfill, GROUP BY alias, multi-key ORDER BY on aliases) " +
      "== DataFrame builder") {
    sameRows(CartAnalytics.q10MonthlyGapfill(spark, sf), CartSql.q10Sql(spark, sf))
  }

  test("q12 SQL text (6-way mixed outer export join) == DataFrame builder") {
    sameRows(CartAnalytics.q12ExportJoin(spark, sf), CartSql.q12Sql(spark, sf))
  }

  test("q22 SQL text (analytic windows: lag/framed sum/rank) == DataFrame builder") {
    sameRows(CartAnalytics.q22WindowAnalytics(spark, sf), CartSql.q22Sql(spark, sf))
  }

  test("q02 reference-literal shape (comma join + CASE canonical key + row_number " +
      "rank=1) == canonical least/greatest pair builder") {
    // the reference's own q02 text (py:197-213) re-expressed on the
    // synthetic schema must produce exactly the engine's PRODUCTION pair
    // stage (CartAnalytics.q02CanonicalPairs — the same code q02 runs):
    // the CASE/row_number dedup and least/greatest+groupBy are the same
    // algebra (the builder's extra null-pair bucket is excluded — the
    // reference's WHERE c1.p_order = c2.p_order drops null-extended rows,
    // making its RIGHT JOIN effectively inner)
    import org.apache.spark.sql.functions._
    val sqlRows = CartSql.q02PairsRefShapeSql(spark, sf)
    val builder = CartAnalytics.q02CanonicalPairs(
        CartAnalytics.q02AbandonedLines(spark, sf))
      .orderBy(col("abandoned_orders").desc, col("part_a").asc, col("part_b").asc)
      .limit(100)
    sameRows(builder, sqlRows)
  }

  test("reference comma-join precedence: literal `FROM c1, c2 RIGHT JOIN …` text " +
      "parses left-deep and equals the explicit CROSS JOIN rewrite (SURVEY §7.4-2)") {
    // The reference's q02 (`TyreStore Challenge.py:205-207`) mixes a comma
    // join with RIGHT JOIN whose ON references the FIRST comma operand.
    // Spark 4.1.2 resolves this as the left-deep
    // ((c1 × c2) RIGHT JOIN orders) — this test pins both that the literal
    // text RUNS and that it means exactly the documented rewrite.
    Tables.register(spark, sf, Seq("lineitem", "orders"))
    val literal = spark.sql(
      """SELECT c1.l_partkey AS part_a, c2.l_partkey AS part_b,
        |       count(DISTINCT o.o_orderkey) AS n
        |FROM lineitem AS c1, lineitem AS c2
        |RIGHT JOIN orders AS o ON c1.l_orderkey = o.o_orderkey
        |WHERE o.o_orderstatus = 'O'
        |  AND c1.l_orderkey = c2.l_orderkey
        |  AND c1.l_partkey <> c2.l_partkey
        |GROUP BY c1.l_partkey, c2.l_partkey""".stripMargin)
    val rewrite = spark.sql(
      """SELECT c1.l_partkey AS part_a, c2.l_partkey AS part_b,
        |       count(DISTINCT o.o_orderkey) AS n
        |FROM lineitem AS c1 CROSS JOIN lineitem AS c2
        |RIGHT JOIN orders AS o ON c1.l_orderkey = o.o_orderkey
        |WHERE o.o_orderstatus = 'O'
        |  AND c1.l_orderkey = c2.l_orderkey
        |  AND c1.l_partkey <> c2.l_partkey
        |GROUP BY c1.l_partkey, c2.l_partkey""".stripMargin)
    val (a, b) = (literal.collect().toSet, rewrite.collect().toSet)
    assert(a.nonEmpty && a === b,
      s"comma-join text diverges from the explicit rewrite: ${a.size} vs ${b.size} rows")
  }

  test("reference 3-arg DATEADD text parses natively on Spark 4.1.2 (SURVEY §7.3)") {
    // `YEAR(DATEADD(MONTH,-1,'${carts.last_datetime}'))` — the reference's
    // exact shape (py:230): unit keyword + string literal timestamp.
    val r = spark.sql(
      """SELECT year(DATEADD(MONTH, -1, '2020-01-15')) AS y,
        |       month(DATEADD(MONTH, -1, '2020-01-15')) AS m,
        |       CAST(DATEADD(MONTH, -2, '2020-01-15 10:30:00') AS DATE) AS d""".stripMargin)
      .first()
    assert(r.getInt(0) === 2019 && r.getInt(1) === 12)
    assert(r.getDate(2).toString === "2019-11-15")
  }

  test("reference nested-DATEADD month-start idiom (py:467) == date_trunc rewrite") {
    // `DATEADD(DAY,1-DAY(DATEADD(MONTH,-11,ts)),DATEADD(MONTH,-11,ts))`
    // — the reference's month-start-11-months-back spine bound, built from
    // DATEADD alone. Must equal the engine's date_trunc form on every day
    // of a year, including end-of-month clamp days (Jan 31 − 11 months).
    val diffs = spark.sql(
      """SELECT d FROM (
        |  SELECT explode(sequence(DATE'2023-01-01', DATE'2023-12-31')) AS d)
        |WHERE CAST(DATEADD(DAY, 1-DAY(DATEADD(MONTH,-11,d)), DATEADD(MONTH,-11,d)) AS DATE)
        |   <> CAST(date_trunc('MONTH', add_months(d, -11)) AS DATE)""".stripMargin)
      .count()
    assert(diffs === 0L)
  }

  test("q03 reference-dialect twin (DATEADD + ${carts.last_datetime} substitution) " +
      "== DataFrame builder") {
    // the full py:222-246 text on the synthetic schema: a user pasting the
    // reference's DATEADD dialect — conf-var and all — gets the engine's
    // exact q03 rows with no rewrite.
    sameRows(CartAnalytics.q03MomIncrease(spark, sf), CartSql.q03RefDialectSql(spark, sf))
  }
}
