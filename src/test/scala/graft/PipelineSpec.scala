package graft

import java.nio.file.{Files, Paths}

/** End-to-end lifecycle: ingest → calendar/scalar → clean → analyze →
  * export, all through the catalog. */
class PipelineSpec extends SparkSpec {

  test("full pipeline runs end-to-end and writes a single-file report") {
    val report = Files.createTempDirectory("graft-pipe").resolve("report.txt").toString
    val res = Pipeline.run(spark, sf, "pipedb", report)

    assert(res.reportRows > 0 && res.reportRows <= 50)
    assert(res.anchorDate.matches("\\d{4}-\\d{2}-\\d{2}"))
    assert(spark.conf.get("graft.orders.last_date") === res.anchorDate)

    // cleaned orders table kept only positive-price rows
    val cleaned = spark.table("`pipedb`.`orders`")
    assert(cleaned.where("o_totalprice <= 0").count() === 0)
    assert(cleaned.count() > 0)

    // calendar spans the full order range
    val cal = spark.table("`pipedb`.`calendar`").count()
    assert(cal > 300)

    // report file: header + <=50 data rows, pipe-delimited
    val lines = Files.readAllLines(Paths.get(report))
    assert(lines.get(0).split("\\|").length === 7)
    assert(lines.size.toLong === res.reportRows + 1)
  }

  test("fact tables are bucketed: orders⋈lineitem plans with no shuffle exchange") {
    import org.apache.spark.sql.functions.col
    val report = Files.createTempDirectory("graft-pipe").resolve("report.txt").toString
    Pipeline.run(spark, sf, "pipedb_b", report)
    // broadcast disabled so the fact join can't dodge the question — the
    // co-bucketed layout itself must make the sort-merge join
    // exchange-free on BOTH sides
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("`pipedb_b`.`lineitem`")
        .join(spark.table("`pipedb_b`.`orders`"),
          col("l_orderkey") === col("o_orderkey"), "right_outer")
      val plan = j.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge fact join:\n$plan")
      assert(!plan.linesIterator.exists(_.trim.matches("""\(\d+\) Exchange\b.*""")),
        s"bucketed fact join must not shuffle either side:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }
}
