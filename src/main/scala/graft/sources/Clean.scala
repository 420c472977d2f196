package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Safe self-overwrite of a managed table (SURVEY.md §7.4 hazard 1).
  *
  * The reference filters `delta.carts` and overwrites it in one statement
  * (`TyreStore Challenge.py:162-166`) — legal on Delta thanks to snapshot
  * isolation, but on a parquet managed table Spark throws "Cannot
  * overwrite a path that is also being read from". The engine equivalent
  * materializes through a staging table and swaps, which is also the
  * right shape for a petabyte table on a real cluster: the rewrite is a
  * single distributed write job, and the swap is metadata-only.
  */
object Clean {

  /** Rewrite `db.table` as `transform(db.table)`.
    *
    * Swap order keeps the data recoverable at every step: the live table
    * is renamed aside (not dropped) before staging takes its name, so a
    * crash mid-swap leaves either the original (under `__old`) or both —
    * never zero copies. The `__old` drop is last and best-effort.
    *
    * `bucket = Some((key, n))` writes the staging table bucketed+sorted
    * on `key`: the rewrite is already a full-table write, so hashing the
    * rows into buckets on the way out is free relative to the IO, and
    * every later equi-join on `key` against an equally-bucketed table
    * plans with no exchange (Pipeline's orders⋈lineitem).
    */
  def rewriteTable(spark: SparkSession, db: String, table: String,
      bucket: Option[(String, Int)] = None)(
      transform: DataFrame => DataFrame): Unit = {
    val fq = s"`$db`.`$table`"
    val staging = s"`$db`.`${table}__staging`"
    val old = s"`$db`.`${table}__old`"
    // re-runnability: clear any staging/old leftovers (catalog entry AND
    // warehouse dir) from a previous crashed run before writing
    Ingest.dropTableAndLocation(spark, db, s"${table}__staging")
    Ingest.dropTableAndLocation(spark, db, s"${table}__old")
    val writer = transform(spark.table(fq))
      .write.mode(SaveMode.Overwrite).format("parquet")
    bucket.fold(writer) { case (key, n) => writer.bucketBy(n, key).sortBy(key) }
      .saveAsTable(staging)
    spark.sql(s"ALTER TABLE $fq RENAME TO $old")
    try spark.sql(s"ALTER TABLE $staging RENAME TO $fq")
    catch {
      case e: Throwable =>
        // restore the original so readers never see a missing table
        spark.sql(s"ALTER TABLE $old RENAME TO $fq")
        throw e
    }
    spark.sql(s"DROP TABLE IF EXISTS $old")
  }
}
