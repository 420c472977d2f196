package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables

/** Reference-parity analytics re-expressed on the synthetic star schema.
  *
  * Role mapping (FIXTURES.md §B): `orders` = cart header (abandoned ≡
  * `o_orderstatus = 'O'`, the reference's `p_paymentinfo IS NULL`,
  * `TyreStore Challenge.py:171`), `lineitem` = cart lines
  * (`l_orderkey`→orders, `l_partkey` = product).
  *
  * Every query is a declarative DataFrame build — Catalyst handles
  * predicate pushdown, column pruning, join-strategy selection (broadcast
  * for the small dims), and AQE re-planning. Scale notes per query inline.
  */
object CartAnalytics {

  /** Abandonment predicate — reference: `carts.p_paymentinfo IS NULL` (py:171). */
  private val abandoned: Column = col("o_orderstatus") === "O"

  /** Exact money arithmetic: sum in DECIMAL(18,2) (exact, order-independent)
    * then one cast to double — bit-identical across engines regardless of
    * partitioning/summation order, unlike a raw double sum. Matters for a
    * distributed engine: result must not depend on the shuffle layout.
    */
  private def moneySum(c: Column): Column =
    coalesce(sum(c.cast(DecimalType(18, 2))).cast(DoubleType), lit(0.0))

  /** Q1 — top-100 parts by abandoned-order count (reference py:180-188).
    * Shape: RIGHT OUTER join (preserves empty orders), null-tolerant
    * IS-abandoned filter, exact COUNT(DISTINCT), top-k.
    * Scale: the filter on the preserved (orders) side pushes into the
    * parquet scan; ORDER BY+LIMIT plans as TakeOrderedAndProject (no global
    * sort); the distinct-agg is two-phase partial/final over the group keys.
    */
  def q01TopAbandonedParts(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey"), "right_outer")
      .where(abandoned)
      .groupBy(col("l_partkey"))
      .agg(
        countDistinct(col("o_orderkey")).as("abandoned_orders"),
        moneySum(col("l_extendedprice")).as("abandoned_value"))
      .orderBy(col("abandoned_orders").desc, col("l_partkey").asc)
      .limit(100)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_top_abandoned_parts" -> q01TopAbandonedParts _
  )

  val oracleSql: Map[String, String] = Map(
    "q01_top_abandoned_parts" ->
      """SELECT l_partkey,
        |       count(DISTINCT o_orderkey) AS abandoned_orders,
        |       coalesce(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS abandoned_value
        |FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'O'
        |GROUP BY l_partkey
        |ORDER BY abandoned_orders DESC NULLS LAST, l_partkey ASC NULLS FIRST
        |LIMIT 100""".stripMargin
  )
}
