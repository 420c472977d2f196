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
        ensureBuilt(fs, loc)(build)
        spark.sql(s"CREATE TABLE IF NOT EXISTS ${qualified(table)} USING parquet " +
          s"LOCATION '${fs.makeQualified(loc).toString}'")
      }
    }
    spark.table(qualified(table))
  }

  private object buildLock
  /** A builder that holds the lock longer than this is presumed dead
    * (crashed JVM left its lock file behind); waiters break the lock. */
  private val StaleLockMs = 30L * 60 * 1000
  private val LockWaitMs  = 60L * 60 * 1000

  /** Cross-PROCESS exclusive build of the artifact files at `loc`.
    *
    * The per-JVM `buildLock` above serializes threads; two concurrent
    * JVMs (sbt test alongside Bench) previously could both miss and both
    * `Overwrite` into `loc`, each deleting the other's in-progress files
    * — and a reader registered on the half-written directory could serve
    * a partial artifact. Protocol here:
    *   1. `_SUCCESS` present → a COMPLETE prior write exists; serve it.
    *   2. Otherwise take a create-exclusive `<loc>.lock` file (atomic on
    *      local FS and HDFS). The winner builds into a private staging
    *      dir, deletes any crashed-build partial at `loc`, and RENAMES
    *      staging into place — readers only ever see absent-or-complete.
    *   3. Losers poll for the winner's `_SUCCESS`, breaking locks whose
    *      mtime says the holder died. The duplicate-work race (two
    *      sessions building the same 172 s sf1 artifact) is gone: the
    *      loser waits instead of rebuilding. */
  private[graft] def ensureBuilt(fs: org.apache.hadoop.fs.FileSystem, loc: Path)(
      build: => DataFrame): Unit = {
    val success = new Path(loc, "_SUCCESS")
    if (fs.exists(success)) return
    fs.mkdirs(loc.getParent)
    val lock = new Path(loc.getParent, loc.getName + ".lock")
    val deadline = System.currentTimeMillis() + LockWaitMs
    // create-exclusive: Hadoop's LOCAL create(overwrite=false) is a
    // non-atomic exists-then-create (two racers can both "win"), so on
    // file:// the lock is taken with File.createNewFile (O_CREAT|O_EXCL,
    // atomic); on HDFS-like schemes create(false) is atomic server-side.
    def tryAcquire(): Boolean =
      if (fs.getScheme == "file")
        try new java.io.File(lock.toUri.getPath).createNewFile()
        catch { case _: java.io.IOException => false }
      else
        try { fs.create(lock, false).close(); true }
        catch { case _: java.io.IOException => false }
    while (!fs.exists(success)) {
      val acquired = tryAcquire()
      if (acquired) {
        try {
          if (!fs.exists(success)) {
            val stage = new Path(loc.getParent,
              loc.getName + "_stage_" + java.util.UUID.randomUUID().toString.take(8))
            try {
              build.write.mode(SaveMode.Overwrite).parquet(stage.toString)
              if (fs.exists(loc)) fs.delete(loc, true) // crashed-build partial
              if (!fs.rename(stage, loc))
                throw new java.io.IOException(s"rename $stage -> $loc failed")
            } finally if (fs.exists(stage)) fs.delete(stage, true)
          }
        } finally fs.delete(lock, false)
        return
      }
      // lock held elsewhere: wait for its _SUCCESS, breaking stale locks
      val stale =
        try fs.getFileStatus(lock).getModificationTime < System.currentTimeMillis() - StaleLockMs
        catch { case _: java.io.IOException => false } // holder just released
      if (stale) fs.delete(lock, false) else Thread.sleep(100)
      if (System.currentTimeMillis() > deadline)
        throw new java.io.IOException(s"timed out waiting for artifact build lock $lock")
    }
  }

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

  /** Deterministic table-name key: corpus-dir digest + corpus CONTENT
    * fingerprint + defining-plan digest.
    *
    * The content fingerprint closes the stale-serve hole: the warehouse
    * outlives the JVM, so regenerating a corpus in place (the documented
    * tools/gen_sf_local.py workflow) must MISS and rebuild, not silently
    * serve the old corpus's labels/centroids. Any file added, removed,
    * resized, or rewritten under the corpus dir changes the key.
    *
    * The plan digest hashes the CANONICALIZED plan's string form,
    * NOT `semanticHash()` — canonicalized expression ids print as stable
    * ordinals (#0, #1, …) while `ExprId.hashCode` mixes in
    * `NamedExpression.jvmId`, a per-JVM random UUID, which would give
    * every fresh JVM a different key and silently defeat cross-JVM
    * artifact reuse (observed: five labels_* tables for one corpus). */
  def key(spark: SparkSession, dir: String, defining: DataFrame): String =
    keyOf(dir, corpusFingerprint(spark, dir), defining)

  private def keyOf(dir: String, fp: String, defining: DataFrame): String =
    s"${md5hex(dir).take(10)}_${fp.take(8)}_" +
      md5hex(defining.queryExecution.analyzed.canonicalized.toString).take(8)

  /** [[key]] with the defining-plan construction MEMOIZED per
    * (kind, dir, corpus fingerprint). The fingerprint is recomputed on
    * every call — one FS metadata walk, which is what keeps the
    * documented staleness contract (a corpus regenerated in place
    * changes the fingerprint, so it misses and re-derives) — but the
    * expensive part, constructing + analyzing + canonicalizing the full
    * defining derivation tree, runs once per corpus state per JVM.
    * Within one JVM the code is fixed, so (kind, dir, content) fully
    * determines the defining plan — given two JVM-stable inputs the
    * plan also embeds: the session's defaultParallelism (Repartition
    * numPartitions from Scale.spreadIfNarrow is hashed) and the spread
    * decision itself. Parallelism is fixed per session; the spread memo
    * is made safe here: a fingerprint CHANGE for this dir evicts the
    * dir's spread decisions (Scale.clearSpreadMemoUnder) before the
    * defining plan is rebuilt, so the rebuilt plan is the one a fresh
    * JVM reading the new content would build — without that eviction an
    * in-place corpus rewrite would mint a key no other JVM reproduces
    * and strand a duplicate artifact table (the exact failure [[key]]'s
    * docstring warns about). Cross-JVM artifact reuse is untouched
    * because the derived key is byte-identical to [[key]]'s.
    * `kind` must be unique per artifact FAMILY (edges/labels/...) —
    * two families over the same corpus may legitimately share one
    * defining plan (labels and edges both key on the edge derivation)
    * and still need their own memo rows. The memo keeps only the LATEST
    * fingerprint per (kind, dir): regenerating a corpus in place many
    * times over one driver lifetime replaces the row instead of leaking
    * one per state.
    *
    * Measured (r14): every d/s-family consumer re-derived its defining
    * plan per query — a diffuse ~0.1-0.8 s per artifact-served row at
    * sf0.1 (PERF.md 14c's plan-construction tax), all of it skippable
    * because the key is fully determined by (kind, content). */
  def keyFor(spark: SparkSession, dir: String, kind: String)(
      defining: => DataFrame): String = {
    val fp = corpusFingerprint(spark, dir)
    // dir-level (not per-kind) change tracking: after a rewrite, the
    // FIRST keyFor of ANY kind over the dir must rebuild from a fresh
    // spread decision, even if that kind never keyed the old state.
    // First OBSERVATION evicts too (r15 advisory): spreadIfNarrow may
    // have memoized a decision against content keyFor never saw — if
    // the corpus was then rewritten in place, a change-only check would
    // hash the stale spread into the key. Eviction on a miss costs one
    // re-probe per (dir, JVM), nothing at steady state.
    if (!dirFpSeen.put(dir, fp).contains(fp))
      graft.plans.Scale.clearSpreadMemoUnder(dir)
    keyMemo.get((kind, dir)) match {
      case Some((oldFp, k)) if oldFp == fp => k
      case _ =>
        val k = keyOf(dir, fp, defining)
        keyMemo.put((kind, dir), (fp, k))
        k
    }
  }

  /** dir → last fingerprint any keyFor observed (latest state only). */
  private val dirFpSeen =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** (kind, dir) → (corpus fingerprint, derived key); latest state only. */
  private val keyMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), (String, String)]

  /** Content fingerprint of a data dir: md5 over the sorted recursive
    * file listing (path, length, mtime). A directory listing — not a
    * data read — so it costs one FS metadata walk, no job. Also keys the
    * scalar-probe memos (anchor/docCount/packMaxId/skew): memo hits are
    * only valid while the underlying files are untouched. */
  def corpusFingerprint(spark: SparkSession, dir: String): String = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(d: Path): Unit =
      fs.listStatus(d).sortBy(_.getPath.getName).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (!st.getPath.getName.startsWith(".")) // ignore CRC sidecars
          entries += s"${st.getPath.toUri.getPath}|${st.getLen}|${st.getModificationTime}"
      }
    if (fs.exists(p)) walk(p)
    md5hex(entries.mkString("\n"))
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
