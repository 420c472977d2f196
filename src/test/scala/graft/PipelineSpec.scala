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
}
