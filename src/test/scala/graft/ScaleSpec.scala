package graft

import org.apache.spark.sql.functions._

import graft.plans.Scale

/** Scale utilities: salted joins, two-phase top-k, bucketed co-location. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on skewed data") {
    // 90% of rows share one hot key
    val big = spark.range(2000)
      .select(when($"id" % 10 === 0, $"id").otherwise(lit(7L)).as("k"), $"id".as("payload"))
    val small = Seq((7L, "hot"), (0L, "a"), (10L, "b"), (20L, "c")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select($"k", $"payload", $"name")
    val salted = Scale.saltedJoin(big, small, "k", salt = 8).select($"k", $"payload", $"name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("two-phase top-k per key equals the single-window top-k") {
    val df = spark.range(5000).select(
      ($"id" % 13).as("g"), ($"id" * 2654435761L % 1000003L).as("score"), $"id")
    val naive = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"g").orderBy($"score".desc, $"id".asc)
      df.withColumn("r", row_number().over(w)).where($"r" <= 5).drop("r")
    }
    val phased = Scale.twoPhaseTopKByKey(df.repartition(16), $"g",
      Seq($"score".desc, $"id".asc), 5)
    assert(phased.count() === naive.count())
    assert(phased.exceptAll(naive).isEmpty && naive.exceptAll(phased).isEmpty)
  }

  test("two-phase RANKED top-k equals the single-window ranked top-k") {
    val df = spark.range(5000).select(
      ($"id" % 13).as("g"), ($"id" * 2654435761L % 1000003L).as("score"), $"id")
    val naive = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"g").orderBy($"score".desc, $"id".asc)
      df.withColumn("rank", row_number().over(w)).where($"rank" <= 5)
    }
    val phased = Scale.twoPhaseTopKRanked(df.repartition(16), $"g",
      Seq($"score".desc, $"id".asc), 5, "rank")
      .select($"g", $"score", $"id", $"rank")
    assert(phased.count() === naive.count())
    assert(phased.exceptAll(naive).isEmpty && naive.exceptAll(phased).isEmpty,
      "ranks must agree row-for-row with the naive single window")
  }

  test("quadratic-baseline guard: d05 refuses an over-cap corpus") {
    import graft.operators.Dedup
    intercept[IllegalArgumentException] {
      Dedup.requireBaselineSize(Dedup.BaselineMaxVectors + 1,
        Dedup.BaselineMaxVectors, "d05_embedding_neardup", "Similarity.s02")
    }
    Dedup.requireBaselineSize(10, Dedup.BaselineMaxVectors, "d05", "s02") // under cap: fine
  }

  test("bucketed co-join plans without exchanges") {
    val orders = Tables.load(spark, sf, "orders").select($"o_orderkey", $"o_totalprice")
    val lines = Tables.load(spark, sf, "lineitem").select($"l_orderkey".as("o_orderkey"), $"l_extendedprice")
    Scale.Bucketing.writeBucketed(orders, "graftdb", "orders_b", "o_orderkey", 8)
    Scale.Bucketing.writeBucketed(lines, "graftdb", "lineitem_b", "o_orderkey", 8)
    // force the sort-merge path (sf0.001 tables would auto-broadcast and
    // hide the bucketing benefit this test is about)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Scale.Bucketing.cojoin(spark, "graftdb", "orders_b", "lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge over buckets:\n$plan")
      // and it returns the same rows as the plain join
      assert(joined.count() === orders.join(lines, Seq("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
