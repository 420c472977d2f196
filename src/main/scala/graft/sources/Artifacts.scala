package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Build-once-serve-many index artifacts (dedup cluster labels, IVF
  * centroids) persisted as CATALOG TABLES, not JVM caches: the artifact
  * must outlive the process that built it — a deployment builds the
  * label/centroid table in one job and every later session serves reads
  * from the warehouse.
  *
  * Registration is EXTERNAL (files written to the warehouse location,
  * then `CREATE TABLE ... USING parquet LOCATION`), deliberately not a
  * managed `saveAsTable`: this environment's catalog is in-memory per
  * session (SURVEY §7.1 — no persistent metastore jars), so the catalog
  * ENTRY dies with the session while the files persist. Dropping a
  * managed table would delete the artifact with the entry; the external
  * form lets a cold session (or cold JVM) find the files and re-register
  * instead of rebuilding — which is the whole point of persisting.
  *
  * Table names carry (corpus-dir hash, defining-plan semanticHash): a
  * different corpus or a changed derivation can never serve a stale
  * artifact — it simply misses and rebuilds under a new name.
  */
object Artifacts {
  val Db = "graft_artifacts"

  private def qualified(table: String) = s"`$Db`.`$table`"

  def location(spark: SparkSession, table: String): Path =
    new Path(s"${spark.conf.get("spark.sql.warehouse.dir")}/$Db.db/$table")

  /** Serve `table` from the catalog; on a catalog miss re-register the
    * existing warehouse files, and only if those are absent too run
    * `build` and persist its result. The served frame is always the
    * parquet table — cold and warm reads are byte-identical.
    *
    * The miss path is serialized per JVM (parallel test suites — or any
    * two threads constructing plans over the same corpus — must not race
    * one build), and registration is IF-NOT-EXISTS so losing a race to
    * another session over the shared in-memory catalog stays benign. */
  def servePersisted(spark: SparkSession, table: String)(build: => DataFrame): DataFrame = {
    if (!spark.catalog.tableExists(s"$Db.$table")) buildLock.synchronized {
      if (!spark.catalog.tableExists(s"$Db.$table")) {
        Ingest.ensureDatabase(spark, Db)
        val loc = location(spark, table)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // _SUCCESS gates on a COMPLETE prior write — a crashed build's
        // partial directory is overwritten, never served
        if (!fs.exists(new Path(loc, "_SUCCESS"))) {
          build.write.mode(SaveMode.Overwrite).parquet(loc.toString)
        }
        spark.sql(s"CREATE TABLE IF NOT EXISTS ${qualified(table)} USING parquet " +
          s"LOCATION '${fs.makeQualified(loc).toString}'")
      }
    }
    spark.table(qualified(table))
  }

  private object buildLock

  /** Drop catalog entry AND files — force a truly cold rebuild. */
  def dropArtifact(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${qualified(table)}")
    val loc = location(spark, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Drop only the catalog ENTRY, keeping the files — simulates a fresh
    * session/JVM against an already-built warehouse (test hook). */
  def dropEntry(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${qualified(table)}")

  /** Deterministic table-name key: corpus-dir digest + defining-plan
    * digest. The plan digest hashes the CANONICALIZED plan's string form,
    * NOT `semanticHash()` — canonicalized expression ids print as stable
    * ordinals (#0, #1, …) while `ExprId.hashCode` mixes in
    * `NamedExpression.jvmId`, a per-JVM random UUID, which would give
    * every fresh JVM a different key and silently defeat cross-JVM
    * artifact reuse (observed: five labels_* tables for one corpus). */
  def key(dir: String, defining: DataFrame): String =
    s"${md5hex(dir).take(10)}_" +
      md5hex(defining.queryExecution.analyzed.canonicalized.toString).take(8)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
