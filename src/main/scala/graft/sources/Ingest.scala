package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.zip.ZipFile

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion surface (reference SURVEY.md §2.1 S1-S5, S7-S9).
  *
  * The reference ingests pipe-delimited CSVs (header, no schema inference
  * → all-string columns, `TyreStore Challenge.py:56-59`), zip-wrapped
  * parquet (`py:25-30`), and registers everything as managed tables in a
  * catalog database (`py:51-72`). This module is the Spark-first
  * equivalent: declarative readers (Catalyst pushes filters/pruning into
  * the scans), driver-side zip extraction (file unpack is not a
  * distributed operator), and `saveAsTable` for catalog registration.
  */
object Ingest {

  /** S1 — delimiter CSV scan, header row, NO schema inference: every
    * column lands as nullable string, exactly like the reference. */
  def csvAllString(spark: SparkSession, path: String, sep: String = "|"): DataFrame =
    spark.read.option("header", "true").option("sep", sep).csv(path)

  /** S1b — schema-inferring variant for engine users who want types. */
  def csvInferred(spark: SparkSession, path: String, sep: String = "|"): DataFrame =
    spark.read.option("header", "true").option("sep", sep)
      .option("inferSchema", "true").csv(path)

  /** S2 — parquet scan (embedded schema, vectorized reader). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S2b — JSON-lines scan (beyond the reference surface): one JSON
    * object per line, schema inferred from the data — the interchange
    * format crawl/annotation pipelines actually deliver. Multiline
    * documents should be repacked to JSONL upstream; a distributed scan
    * needs line-splittable input. */
  def jsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** S2c — ORC scan (beyond the reference surface): the other columnar
    * container Spark ships a vectorized reader for; same pushdown/
    * pruning properties as parquet. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S3 — zip ingestion: extract a zip archive (driver-side, like the
    * reference's `ZipFile.extractall`) and read the contained parquet.
    * Returns the extraction dir so callers can clean up. */
  def unzip(zipPath: String, destDir: String): Path = {
    val dest = Paths.get(destDir)
    Files.createDirectories(dest)
    val zf = new ZipFile(zipPath)
    try {
      zf.entries().asScala.foreach { e =>
        val out = dest.resolve(e.getName).normalize()
        require(out.startsWith(dest), s"zip entry escapes dest: ${e.getName}")
        if (e.isDirectory) Files.createDirectories(out)
        else {
          Files.createDirectories(out.getParent)
          val in = zf.getInputStream(e)
          try Files.copy(in, out, StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
        }
      }
    } finally zf.close()
    dest
  }

  def zippedParquet(spark: SparkSession, zipPath: String, scratchDir: String): DataFrame =
    parquet(spark, unzip(zipPath, scratchDir).toString)

  /** S5 — idempotent database DDL. */
  def ensureDatabase(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")

  /** S4 — managed-table sink (parquet provider; the environment ships no
    * Delta jars). Overwrite mode mirrors the reference's
    * `write.format('delta').mode('overwrite').saveAsTable`. The catalog
    * here is in-memory per session, so a warehouse directory can outlive
    * its table entry — drop both before writing (orphan dirs otherwise
    * fail CTAS with LOCATION_ALREADY_EXISTS). */
  /** Drop a table AND its warehouse directory — the in-memory catalog
    * can lose the table entry (new session) while the directory persists,
    * and a later CTAS then fails with LOCATION_ALREADY_EXISTS. */
  def dropTableAndLocation(spark: SparkSession, db: String, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$db.db/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  def saveAsTable(df: DataFrame, db: String, table: String): Unit = {
    val spark = df.sparkSession
    ensureDatabase(spark, db)
    dropTableAndLocation(spark, db, table)
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(s"`$db`.`$table`")
  }

  /** Partitioned managed-table sink — the 100 TB layout: one directory
    * per partition value, so date/category predicates prune whole
    * partitions at planning time (and DPP prunes them at runtime from
    * join-side filters). The reference's tables are unpartitioned; this
    * is the deployment-scale variant of S4. */
  def saveAsTablePartitioned(df: DataFrame, db: String, table: String,
      partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    ensureDatabase(spark, db)
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
    val loc = new org.apache.hadoop.fs.Path(
      s"${spark.conf.get("spark.sql.warehouse.dir")}/$db.db/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .format("parquet").saveAsTable(s"`$db`.`$table`")
  }

  /** Bucketed managed-table sink — the co-located-join layout: rows are
    * hash-distributed into `nBuckets` files per the bucket column, and
    * Spark records the bucket spec in the catalog. Two tables bucketed
    * the same way join WITHOUT any Exchange (SourcesSpec pins the plan):
    * at 100 TB that deletes the single most expensive stage of a
    * fact-to-fact join — both shuffles — for every query that joins on
    * the bucket key, in exchange for one up-front bucketed write. Also
    * sorts within buckets on the same key so the join can run as a
    * zero-sort merge. */
  def saveAsTableBucketed(df: DataFrame, db: String, table: String,
      bucketCol: String, nBuckets: Int): Unit = {
    val spark = df.sparkSession
    ensureDatabase(spark, db)
    dropTableAndLocation(spark, db, table)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet").saveAsTable(s"`$db`.`$table`")
  }

  /** S8/S9 — scalar-param capture: evaluate a 1-row/1-col query, park the
    * value in Spark conf for `${key}` SQL variable substitution (the
    * reference's `spark.conf.set('carts.last_datetime', …)` pattern).
    * Callers on the DataFrame path should prefer splicing the returned
    * value as a literal — Catalyst then constant-folds it. */
  def captureScalar(spark: SparkSession, df: DataFrame, confKey: String): String = {
    val v = df.first().get(0).toString
    spark.conf.set(confKey, v)
    v
  }

  /** Calendar dimension (reference `py:74-76`): one row per day. */
  def calendar(spark: SparkSession, fromDate: String, toDate: String): DataFrame =
    spark.range(1).select(explode(sequence(
      to_date(lit(fromDate)), to_date(lit(toDate)), expr("interval 1 day")
    )).as("calendar_date"))
}
