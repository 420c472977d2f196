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

  test("q08 SQL text (GROUP BY alias) == DataFrame builder") {
    sameRows(CartAnalytics.q08LaunchCohorts(spark, sf), CartSql.q08Sql(spark, sf))
  }

  test("q12 SQL text (6-way mixed outer export join) == DataFrame builder") {
    sameRows(CartAnalytics.q12ExportJoin(spark, sf), CartSql.q12Sql(spark, sf))
  }
}
