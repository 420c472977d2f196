package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Clean, Export, Ingest}

/** The reference's end-to-end lifecycle (SURVEY.md §3), Spark-first:
  *
  *  1. ingest raw tables into a catalog database (reference `py:51-72`)
  *  2. derive a calendar dimension + capture the anchor scalar (`py:74-82`)
  *  3. clean by re-materialization (`py:162-166`, staging-swap here)
  *  4. run analytics from catalog tables (`py:180-543`)
  *  5. export a single-file delimited report (`py:531-546`)
  *
  * Each step is an isolated, resumable job — the structure a 100 TB run
  * needs (steps 1 and 3 are the only full-data writes; analytics read the
  * cleaned table, which is why the reference materializes it once instead
  * of re-filtering in every query).
  */
object Pipeline {

  case class Result(db: String, anchorDate: String, reportPath: String, reportRows: Long)

  /** Bucket count for the fact tables (orders, lineitem) — both bucketed
    * on their order key so the repeated fact⋈fact join pays its shuffle
    * once at ingest/clean time and every downstream orders⋈lineitem
    * equi-join plans with NO exchange (PipelineSpec pins the plan). */
  val FactBuckets = 8

  def run(spark: SparkSession, sfDir: String, db: String, reportPath: String): Result = {
    // 1. ingest: facts + dims into the catalog (parquet managed tables);
    // lineitem lands bucketed on l_orderkey at write time
    Ingest.ensureDatabase(spark, db)
    graft.plans.Scale.Bucketing.writeBucketed(
      Tables.load(spark, sfDir, "lineitem"), db, "lineitem", "l_orderkey", FactBuckets)
    Seq("orders", "customer", "nation", "region").foreach { t =>
      Ingest.saveAsTable(Tables.load(spark, sfDir, t), db, t)
    }

    // 2. calendar dim + anchor scalar (conf-published, reference S8/S9)
    val bounds = spark.table(s"`$db`.`orders`")
      .agg(date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("lo"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("hi")).first()
    Ingest.saveAsTable(
      Ingest.calendar(spark, bounds.getString(0), bounds.getString(1)), db, "calendar")
    val anchor = Ingest.captureScalar(spark,
      spark.table(s"`$db`.`orders`")
        .agg(date_format(max(col("o_orderdate")), "yyyy-MM-dd")),
      "graft.orders.last_date")

    // 3. clean: drop zero-price orders, swap in place (the reference's
    // self-overwrite, without relying on Delta snapshots). The rewrite —
    // already a full write — emits orders bucketed on o_orderkey to
    // match lineitem's layout, making the fact join exchange-free.
    Clean.rewriteTable(spark, db, "orders", bucket = Some(("o_orderkey", FactBuckets)))(
      _.where(col("o_totalprice") > 0))

    // 4. analytics over catalog tables: the export join (reference Q12)
    val report = exportReport(spark, db)

    // 5. single-file pipe-delimited report; row count comes from the
    // written file (header excluded) — re-running report.count() would
    // execute the whole 6-way join a second time
    // (physical-line count: correct here because no exported column can
    // contain a newline; a general CSV would need a quote-aware count)
    val written = Export.asDelimitedFile(report, reportPath)
    val lineStream = java.nio.file.Files.lines(written)
    val rows = try lineStream.count() - 1 finally lineStream.close()
    Result(db, anchor, reportPath, rows)
  }

  /** Reference `py:531-543`: multi-dim outer-join rollup, top-50. */
  def exportReport(spark: SparkSession, db: String): DataFrame = {
    def t(n: String) = spark.table(s"`$db`.`$n`")
    t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"), "right_outer")
      .join(t("customer"), col("o_custkey") === col("c_custkey"), "left_outer")
      .join(t("nation"), col("c_nationkey") === col("n_nationkey"), "left_outer")
      .join(t("region"), col("n_regionkey") === col("r_regionkey"), "left_outer")
      .where(col("o_orderstatus") === "O")
      .groupBy(col("o_orderkey"), col("o_totalprice"), col("c_name"), col("n_name"), col("r_name"))
      .agg(count(col("l_linenumber")).as("n_items"),
        coalesce(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"), lit(0.0))
          .as("items_value"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(50)
  }
}
