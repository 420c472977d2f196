package graft

import java.sql.Date

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Typed module boundary (SURVEY.md §1.5): case classes + Encoders for
  * the star schema, for engine users who want compile-time column safety.
  *
  * The loaders select exactly the modeled columns BEFORE `.as[T]`, so the
  * typed boundary keeps column pruning; predicates should stay Column
  * expressions (`ds.filter(col("o_orderstatus") === "O")`) — a Scala
  * lambda (`ds.filter(_.o_orderstatus == "O")`) would deserialize every
  * row and kill scan pushdown (ModelSpec pins both properties).
  */
object Model {
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: Date, o_orderpriority: String)
  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_shipdate: Date)
  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Long,
      c_mktsegment: String)
  case class Nation(n_nationkey: Long, n_name: String, n_regionkey: Long)

  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_orderpriority"))
      .as[Order]
  }

  def lineitems(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_shipdate").cast("date").as("l_shipdate"))
      .as[Lineitem]
  }

  def customers(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"))
      .as[Customer]
  }
}
