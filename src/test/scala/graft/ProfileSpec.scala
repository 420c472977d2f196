package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

/** The reusable summarize surface (reference `dbutils.data.summarize`,
  * SURVEY §2.4 A11) on a hand-computable frame: nulls, zeros, a constant
  * column (the stddev zero-clamp path), and known mean/stddev/median. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("summarize: count/nonnull/distinct/zeros/min/max/mean/stddev/median on a known frame") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 2.0), (2L, 4.0), (3L, 6.0), (0L, null), (4L, 8.0))
      .toDF("k", "v")
    val out = Profile.summarize(df, Seq("k", "v")).collect()
      .map(r => r.getString(0) -> r).toMap

    val k = out("k")
    assert(k.getAs[Long]("n_rows") === 5L)
    assert(k.getAs[Long]("n_nonnull") === 5L)
    assert(k.getAs[Long]("n_distinct") === 5L)
    assert(k.getAs[Long]("n_zeros") === 1L)
    assert(k.getAs[Double]("min_value") === 0.0)
    assert(k.getAs[Double]("max_value") === 4.0)
    assert(k.getAs[Double]("mean_value") === 2.0)
    // population stddev of {1,2,3,0,4} = sqrt(mean(x²) − mean²) = sqrt(6 − 4)
    assert(math.abs(k.getAs[Double]("stddev_value") - math.sqrt(2.0)) < 1e-12)
    assert(k.getAs[Double]("median_value") === 2.0)

    val v = out("v")
    assert(v.getAs[Long]("n_nonnull") === 4L) // null excluded
    assert(v.getAs[Double]("mean_value") === 5.0)
    // population stddev of {2,4,6,8} = sqrt(30 − 25)
    assert(math.abs(v.getAs[Double]("stddev_value") - math.sqrt(5.0)) < 1e-12)
    assert(v.getAs[Double]("median_value") === 5.0) // interpolated between 4 and 6
  }

  test("summarize: constant column has stddev exactly 0.0 (zero clamp, not NaN)") {
    val df = spark.range(100).select(lit(7L).as("c"))
    val row = Profile.summarize(df, Seq("c")).collect().head
    assert(row.getAs[Double]("stddev_value") === 0.0)
    assert(row.getAs[Long]("n_distinct") === 1L)
  }

  test("summarizeStrings: modal value with deterministic tiebreak") {
    val df = Seq("b", "a", "b", "c", "a").toDF("s")
    val row = Profile.summarizeStrings(df, Seq("s")).collect().head
    assert(row.getAs[Long]("n_distinct") === 3L)
    // a and b tie at 2; (cnt, value) max_by breaks toward the larger value
    assert(row.getAs[String]("top_value") === "b")
    assert(row.getAs[Long]("top_freq") === 2L)
  }

  test("summarize shares ONE cached aggregate across column branches (no per-column scans)") {
    // the persisted wide aggregate substitutes into every union branch; a
    // regression to unshared branches would re-plan the full
    // scan+aggregate subtree once PER COLUMN (measured: 3 FileScans for
    // 3 columns with no cross-branch reuse)
    val df = Tables.load(spark, sf, "orders")
    val out = Profile.summarize(df, Seq("o_orderkey", "o_custkey", "o_totalprice"))
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("InMemoryRelation"),
      s"union branches must read the persisted aggregate, not rescan:\n$plan")
    assert(out.count() === 3L)
  }

  test("summarize: all-null column yields null mean and 0.0 stddev (null-ignoring clamp)") {
    val df = spark.range(10).select(lit(null).cast("double").as("c"))
    val row = Profile.summarize(df, Seq("c")).collect().head
    assert(row.getAs[Long]("n_nonnull") === 0L)
    assert(row.isNullAt(row.fieldIndex("mean_value")))
    assert(row.getAs[Double]("stddev_value") === 0.0)
  }

  test("q15/q17 serve persisted profile artifacts, bit-identical to the raw cores (r16)") {
    import graft.operators.CartAnalytics
    val ordDf = Tables.load(spark, sf, "orders")
    val raw15 = Profile.summarize(ordDf, Seq("o_orderkey", "o_custkey", "o_totalprice"))
      .collect().map(_.toString).toSeq
    val raw17 = Profile.summarizeStrings(ordDf, Seq("o_orderstatus", "o_orderpriority"))
      .collect().map(_.toString).toSeq
    val served15 = CartAnalytics.q15ProfileOrders(spark, sf)
    val served17 = CartAnalytics.q17ProfileOrdersStrings(spark, sf)
    assert(served15.collect().map(_.toString).toSeq === raw15,
      "served q15 diverged from the raw summarize core")
    assert(served17.collect().map(_.toString).toSeq === raw17,
      "served q17 diverged from the raw summarizeStrings core")
    // serve path: an artifact scan (the statistics-table idiom), not a
    // per-query full sort-aggregate of the fact
    Seq("profile_" -> served15, "profstr_" -> served17).foreach { case (p, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains(graft.sources.Artifacts.Db) && plan.contains(p),
        s"profile must serve the $p artifact:\n${plan.take(1500)}")
    }
  }
}
