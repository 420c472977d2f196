package graft

import org.apache.spark.sql.functions._

import graft.Model

/** Typed Dataset boundary: encoders round-trip, and Column-expression
  * predicates keep scan pushdown through `.as[T]`. */
class ModelSpec extends SparkSpec {
  import spark.implicits._

  test("typed orders round-trip through the encoder") {
    val os = Model.orders(spark, sf)
    val first = os.orderBy($"o_orderkey").head()
    assert(first.o_orderkey >= 0 && first.o_orderstatus.nonEmpty)
    assert(os.count() === Tables.load(spark, sf, "orders").count())
  }

  test("column predicates on a typed Dataset still push to the scan") {
    val q = Model.orders(spark, sf).filter(col("o_orderstatus") === "O")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(o_orderstatus,O)"),
      s"typed boundary lost pushdown:\n$plan")
  }

  test("typed joinWith keeps both sides' types") {
    val joined = Model.lineitems(spark, sf)
      .joinWith(Model.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
    val (li, o) = joined.head()
    assert(li.l_orderkey === o.o_orderkey)
  }
}
