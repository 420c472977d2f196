package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier

/** Safe self-overwrite of a managed table (SURVEY.md §7.4 hazard 1).
  *
  * The reference filters `delta.carts` and overwrites it in one statement
  * (`TyreStore Challenge.py:162-166`) — legal on Delta thanks to snapshot
  * isolation, but on a parquet managed table Spark throws "Cannot
  * overwrite a path that is also being read from". The engine equivalent
  * writes the rewrite into a fresh versioned directory and atomically
  * re-points the table there, which recovers the two Delta behaviors the
  * rewrite actually relies on:
  *
  *  - **no missing-table window**: the swap is ONE catalog operation
  *    (`ALTER TABLE ... SET LOCATION`), so `spark.table` never fails
  *    mid-swap (the old staged RENAME-aside/RENAME-back dance had a
  *    window where the name did not exist);
  *  - **reader snapshot isolation**: the previous version's files stay
  *    on disk until a later rewrite vacuums them, so a scan that listed
  *    its files before the swap keeps reading a consistent snapshot —
  *    exactly what Delta's `delta.carts` readers get during `py:162-166`.
  *
  * The snapshot path also carries Delta's third behavior, writer-writer
  * OPTIMISTIC concurrency: each writer does its (long) rewrite against
  * the version it read, into a writer-private `tmp_*` directory, and
  * commits in a short critical section — re-validate that the table
  * still points at the version the transform read, then atomically
  * rename `tmp_*` → `v=N+1` and `SET LOCATION`. A writer that lost the
  * race gets a loud [[ConcurrentRewriteException]] (its half is
  * discarded; nothing it did is visible), and
  * [[Clean.rewriteTableWithRetries]] re-runs its transform against the
  * NEW current version — Delta's commit-retry loop. The rename is the
  * cross-process CAS on filesystems with atomic rename (HDFS); within
  * one driver JVM a per-table commit lock serializes the critical
  * section outright. The swap path (schema-changing / bucketed
  * rewrites) remains single-writer, as in Delta, where metadata-changing
  * commits conflict with everything.
  */
object Clean {

  /** Thrown when a snapshot-path rewrite loses the commit race: another
    * writer moved the table off the version this transform read. The
    * losing rewrite left no visible trace; catch and re-run the
    * transform against the new current version (or use
    * [[Clean.rewriteTableWithRetries]]). */
  final class ConcurrentRewriteException(msg: String)
    extends RuntimeException(msg)

  // Per-table commit locks: the critical section (validate + rename +
  // SET LOCATION) is metadata-only and short; the expensive rewrite
  // write runs OUTSIDE it. One driver JVM is the common topology for a
  // pipeline's writers (local mode here, a shared driver at cluster
  // scale); across drivers the rename-CAS still rejects the loser on
  // rename-atomic filesystems.
  private val commitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def commitLock(db: String, table: String): Object =
    commitLocks.computeIfAbsent(s"$db.$table", _ => new Object)

  /** Versions kept on disk: the current one plus `KeepSnapshots - 1`
    * predecessors; older `v=N` dirs are vacuumed best-effort after a
    * successful swap. Default 2 = current + previous, enough for any
    * reader that started before the swap to finish its scan; deployments
    * with longer-running readers raise GRAFT_KEEP_SNAPSHOTS (floored at
    * 2 — 1 would vacuum the version a pre-swap reader is still
    * scanning, exactly the isolation this path exists to provide).
    * Under writer-writer concurrency the same knob is the conflict
    * window: a loser re-reads the CURRENT version on retry, so depth 2
    * covers any number of retrying writers; only a writer stalled
    * across `KeepSnapshots` competing commits could see its input
    * vacuumed mid-write, and it then fails loudly (missing files or
    * lost CAS), never publishes. */
  val KeepSnapshots: Long =
    math.max(2L, graft.operators.Dedup.envLong("GRAFT_KEEP_SNAPSHOTS", 2L))

  /** Minimum age (mtime, seconds) before an orphan `tmp_*` staging dir is
    * vacuumed after a successful commit. The floor exists because age is
    * the ONLY signal distinguishing a crashed writer's leftovers from a
    * live competitor's private staging — a live writer that pauses longer
    * than this between its last file write and its commit can have its
    * staging deleted out from under it and then fails its (otherwise
    * winnable) commit LOUDLY, never corruptly. Deployments whose rewrite
    * transforms legitimately stall (multi-hour upstream barriers) should
    * raise GRAFT_TMP_VACUUM_MIN_AGE_SEC alongside GRAFT_KEEP_SNAPSHOTS;
    * the default is 1 hour. */
  val TmpVacuumMinAgeSec: Long =
    math.max(60L, graft.operators.Dedup.envLong("GRAFT_TMP_VACUUM_MIN_AGE_SEC", 3600L))

  /** Rewrite `db.table` as `transform(db.table)`.
    *
    * Same-schema rewrites (the reference's shape: a filter) go through
    * the snapshot path above. Bucketed rewrites — and any transform that
    * CHANGES the table schema — fall back to the staged-swap path,
    * because bucket spec and schema live on the catalog ENTRY, which
    * `SET LOCATION` deliberately does not touch.
    */
  def rewriteTable(spark: SparkSession, db: String, table: String,
      bucket: Option[(String, Int)] = None)(
      transform: DataFrame => DataFrame): Unit =
    rewriteTableImpl(spark, db, table, bucket, () => ())(transform)

  /** [[rewriteTable]] that re-runs `transform` (against the NEW current
    * version) when a snapshot-path commit loses the writer-writer race —
    * the optimistic-concurrency retry loop. `maxAttempts` bounds
    * livelock under sustained contention; the last loss is rethrown. */
  def rewriteTableWithRetries(spark: SparkSession, db: String, table: String,
      bucket: Option[(String, Int)] = None, maxAttempts: Int = 3)(
      transform: DataFrame => DataFrame): Unit = {
    require(maxAttempts >= 1, s"rewriteTableWithRetries: maxAttempts=$maxAttempts")
    var attempt = 1
    var done = false
    while (!done) {
      try { rewriteTable(spark, db, table, bucket)(transform); done = true }
      catch {
        case e: ConcurrentRewriteException =>
          if (attempt >= maxAttempts) throw e
          attempt += 1
      }
    }
  }

  /** `beforeCommit` runs after the rewrite is materialized but before
    * the critical section — the deterministic interleaving point the
    * concurrency specs use to stage a competing commit. */
  private[sources] def rewriteTableImpl(spark: SparkSession, db: String,
      table: String, bucket: Option[(String, Int)], beforeCommit: () => Unit)(
      transform: DataFrame => DataFrame): Unit = {
    val fq = s"`$db`.`$table`"
    // The location the transform READS, captured before building its
    // plan: commit-time validation compares against this, so a rewrite
    // whose input may be stale can only lose the race, never publish.
    val readLoc = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table, Some(db))).location
    val rewritten = transform(spark.table(fq))
    // either path clears crashed-run staging/old leftovers first, so a
    // swap-path crash followed by a snapshot-path rerun (or vice versa)
    // cannot strand catalog entries or warehouse dirs
    Ingest.dropTableAndLocation(spark, db, s"${table}__staging")
    Ingest.dropTableAndLocation(spark, db, s"${table}__old")
    // The snapshot path must also be refused when the CURRENT table is
    // bucketed: `SET LOCATION` keeps the catalog entry (including its
    // bucket spec) and only re-points the files, so a plain
    // rewriteTable(bucket = None) on a previously-bucketed table would
    // point a still-bucketed catalog entry at plain parquet — later
    // scans fail ("Invalid bucket file") or wrongly elide exchanges.
    // Instead fall through to the staged swap and RE-APPLY the existing
    // bucket spec, so a filter-rewrite of a bucketed table stays
    // bucketed (the property its exchange-free joins depend on).
    val meta = spark.sessionState.catalog.getTableMetadata(TableIdentifier(table, Some(db)))
    val existingBucket: Option[(String, Int)] = meta.bucketSpec.map { bs =>
      require(bs.bucketColumnNames.size == 1 && bs.sortColumnNames.size <= 1,
        s"rewriteTable: $fq has a multi-column bucket spec ($bs); " +
          "re-applying it through a rewrite is not implemented — pass the " +
          "spec explicitly once multi-column bucketing exists in this engine")
      (bs.bucketColumnNames.head, bs.numBuckets)
    }
    if (bucket.isEmpty && existingBucket.isEmpty &&
        rewritten.schema == spark.table(fq).schema)
      rewriteTableSnapshot(spark, db, table, rewritten, readLoc, beforeCommit)
    else
      rewriteTableSwap(spark, db, table, bucket.orElse(existingBucket), rewritten)
  }

  /** Drop `db.table` AND the snapshot machinery the rewrites built for
    * it: plain `DROP TABLE` on a managed table deletes only the CURRENT
    * location — after snapshot rewrites that is `…__snap/v=N`, so the
    * retained predecessor versions (and, for a table adopted from a
    * pre-snapshot managed dir, the original dir) would leak on disk.
    * This is the drop the pipeline should use for rewrite-managed
    * tables. Uses the catalog location BEFORE dropping, so external
    * tables at user-chosen `v=N`-style paths (which never get a
    * `__snap` root) are untouched beyond the normal drop. */
  def dropTableWithSnapshots(spark: SparkSession, db: String, table: String): Unit = {
    val ident = TableIdentifier(table, Some(db))
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    if (spark.sessionState.catalog.tableExists(ident)) {
      val current = new Path(spark.sessionState.catalog.getTableMetadata(ident).location)
      spark.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
      val fs = current.getFileSystem(hadoopConf)
      if (fs.exists(current)) fs.delete(current, true)
    }
    // Root + pre-adoption dir cleanup runs even when the catalog ENTRY is
    // gone: this environment's catalog is in-memory per session, so a new
    // session sees no entry while the previous incarnation's `__snap`
    // versions and managed dir still sit in the warehouse — exactly the
    // orphans this drop exists to reclaim (and which a later same-name
    // table must never list as its own retained versions).
    snapRoot(spark, db, table).foreach { root =>
      val fs = root.getFileSystem(hadoopConf)
      if (fs.exists(root)) fs.delete(root, true)
    }
    if (spark.sessionState.catalog.databaseExists(db)) {
      val managed = new Path(
        s"${spark.conf.get("spark.sql.warehouse.dir")}/$db.db/$table")
      val fs = managed.getFileSystem(hadoopConf)
      if (fs.exists(managed)) fs.delete(managed, true)
    }
  }

  /** The `__snap` version root the snapshot path would use for
    * `db.table`, if the database exists. */
  private def snapRoot(spark: SparkSession, db: String, table: String): Option[Path] =
    if (spark.sessionState.catalog.databaseExists(db))
      Some(new Path(
        new Path(spark.sessionState.catalog.getDatabaseMetadata(db).locationUri),
        s"${table}__snap"))
    else None

  /** Snapshot path: write the rewrite into a writer-private `tmp_*`
    * directory next to the current files, then commit in a short
    * critical section — validate the table still points at `readLoc`
    * (the version the transform read), rename `tmp_*` → `v=N+1` (the
    * CAS: an existing `v=N+1` means another writer won), one atomic
    * `SET LOCATION`, then vacuum versions older than [[KeepSnapshots]].
    * A crash before the rename leaves the live table untouched (the
    * orphan `tmp_*` is reclaimed by the next successful commit's
    * vacuum); a crash after the ALTER leaves the commit complete. Never
    * zero live copies, and a LOSING writer publishes nothing. */
  private def rewriteTableSnapshot(spark: SparkSession, db: String,
      table: String, rewritten: DataFrame, readLoc: java.net.URI,
      beforeCommit: () => Unit): Unit = {
    val fq = s"`$db`.`$table`"
    val ident = TableIdentifier(table, Some(db))
    val current = new Path(spark.sessionState.catalog.getTableMetadata(ident).location)
    // version root: adopt `<db-location>/<table>__snap/` on first use;
    // later rewrites recognize their own layout and continue it. The
    // root must carry the `__snap` marker, not just a `v=N` basename —
    // a user's EXTERNAL table could legitimately sit at a
    // partition-style `v=3` directory, and treating its parent as our
    // root would vacuum sibling partitions.
    val (root, next) = current.getName match {
      case VersionDir(n) if Option(current.getParent)
          .exists(_.getName.endsWith("__snap")) => (current.getParent, n + 1)
      case _ =>
        val dbLoc = new Path(spark.sessionState.catalog.getDatabaseMetadata(db).locationUri)
        val fresh = new Path(dbLoc, s"${table}__snap")
        // ADOPTION must start from an empty root: the current location is
        // not under it, so any `v=N` already there is an orphan from a
        // previous same-name incarnation (this catalog is in-memory per
        // session — entries die, files persist). Left in place they would
        // be listed as THIS table's retained versions and a pinned read
        // could serve another incarnation's data.
        // (Two writers ADOPTING concurrently can delete each other's
        // staging here — first-rewrite-ever racing is the analog of
        // Delta's concurrent CREATE conflict and surfaces as a failed
        // write or a loud commit error, never silent corruption; OCC
        // proper starts once the layout exists.)
        val ffs = fresh.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (ffs.exists(fresh)) ffs.delete(fresh, true)
        (fresh, 1L)
    }
    // materialize into a writer-PRIVATE directory before the critical
    // section: the write reads the current location while writing the
    // new one — disjoint paths, no self-overwrite — and concurrent
    // writers can never clobber each other's staging files because no
    // two writers share a tmp dir.
    val tmp = new Path(root, s"tmp_${java.util.UUID.randomUUID()}")
    rewritten.write.mode(SaveMode.Overwrite).format("parquet").save(tmp.toString)
    beforeCommit()
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(root, s"v=$next")
    // Critical section — metadata-only, so contention cost is a rename
    // and an ALTER, not a write job. The JVM lock serializes same-driver
    // writers; across drivers the exists-check + rename is the CAS on
    // rename-atomic filesystems.
    val committed = commitLock(db, table).synchronized {
      val nowLoc = spark.sessionState.catalog.getTableMetadata(ident).location
      if (nowLoc != readLoc || fs.exists(target)) false
      else if (!fs.rename(tmp, target))
        throw new java.io.IOException(
          s"rewriteTable: rename $tmp -> $target failed with no competing commit visible")
      else {
        spark.sql(s"ALTER TABLE $fq SET LOCATION '${target.toString}'")
        spark.catalog.refreshTable(s"$db.$table")
        true
      }
    }
    if (!committed) {
      try fs.delete(tmp, true) catch { case _: java.io.IOException => () }
      val nowLoc = spark.sessionState.catalog.getTableMetadata(ident).location
      throw new ConcurrentRewriteException(
        s"rewriteTable: $fq moved off $readLoc (now $nowLoc) while this " +
          "rewrite ran — another writer committed first. Nothing from this " +
          "attempt is visible; re-run the transform against the current " +
          "version (rewriteTableWithRetries does this).")
    }
    // vacuum: only `v=N` dirs under OUR root past the retention window,
    // plus orphaned `tmp_*` staging left by CRASHED writers (ours is
    // gone — renamed on commit, deleted on loss; a live competitor's tmp
    // is safe only while it is younger than [[TmpVacuumMinAgeSec]] — age
    // is a heuristic, not a guarantee, see the knob's doc). Never the
    // original managed dir (a pre-snapshot reader may still be scanning
    // it; it falls out of scope when the table is dropped).
    try {
      val tmpAgeFloorMs = TmpVacuumMinAgeSec * 1000
      val now = System.currentTimeMillis()
      if (fs.exists(root)) fs.listStatus(root).foreach { st =>
        st.getPath.getName match {
          case VersionDir(n) if n <= next - KeepSnapshots =>
            fs.delete(st.getPath, true)
          case tn if tn.startsWith("tmp_") &&
              now - st.getModificationTime > tmpAgeFloorMs =>
            fs.delete(st.getPath, true)
          case _ => ()
        }
      }
    } catch { case _: java.io.IOException => () } // vacuum is best-effort
  }

  /** Retained snapshot versions of a rewrite-managed table, ascending.
    * Empty when the table has never taken the snapshot path (or a
    * swap-path rewrite reset the layout — the swap makes no retention
    * promise and vacuums the root). */
  def versions(spark: SparkSession, db: String, table: String): Seq[Long] =
    snapRoot(spark, db, table).toSeq.flatMap { root =>
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(root)) Seq.empty[Long]
      else fs.listStatus(root).toSeq
        .flatMap(st => VersionDir.unapply(st.getPath.getName))
    }.sorted

  /** Read a RETAINED version of a rewrite-managed table — the engine's
    * analog of Delta's `VERSION AS OF` (the reference's tables are Delta,
    * `TyreStore Challenge.py:65-72`, and its clean step leans on the
    * retained predecessor the same way). Versions survive exactly
    * [[KeepSnapshots]] rewrites; asking for a vacuumed (or never
    * written) version fails loudly naming the root and what IS retained,
    * rather than silently reading the wrong data. The snapshot path only
    * accepts same-schema rewrites, so every retained version shares the
    * live table's schema. */
  def readVersion(spark: SparkSession, db: String, table: String,
      version: Long): DataFrame = {
    val root = snapRoot(spark, db, table).getOrElse(throw new IllegalArgumentException(
      s"readVersion: database `$db` does not exist"))
    val vs = versions(spark, db, table)
    require(vs.contains(version),
      s"readVersion: version $version of `$db`.`$table` is not on disk under " +
        s"$root (retained: ${if (vs.isEmpty) "none — not snapshot-managed" else vs.mkString(", ")}); " +
        s"older versions are vacuumed after GRAFT_KEEP_SNAPSHOTS (=$KeepSnapshots) rewrites")
    spark.read.parquet(new Path(root, s"v=$version").toString)
  }

  private object VersionDir {
    private val Re = "v=([0-9]+)".r
    def unapply(name: String): Option[Long] = name match {
      case Re(n) => Some(n.toLong)
      case _ => None
    }
  }

  /** Staged-swap path (bucketed / schema-changing rewrites).
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
  private def rewriteTableSwap(spark: SparkSession, db: String, table: String,
      bucket: Option[(String, Int)], rewritten: DataFrame): Unit = {
    val fq = s"`$db`.`$table`"
    val staging = s"`$db`.`${table}__staging`"
    val old = s"`$db`.`${table}__old`"
    val writer = rewritten.write.mode(SaveMode.Overwrite).format("parquet")
    bucket.fold(writer) { case (key, n) => writer.bucketBy(n, key).sortBy(key) }
      .saveAsTable(staging)
    // After snapshot rewrites the live data sits under `__snap/v=N` while
    // the PRE-ADOPTION managed dir lingers for old readers — but RENAME
    // validates that the target name's default location is free, so a
    // swap over a snapshot-layout table would die with
    // LOCATION_ALREADY_EXISTS (spec-pinned). Clear the stale default dir
    // when it is not the live location; the swap path makes no
    // reader-isolation promise, so dropping it here is consistent.
    val ident = TableIdentifier(table, Some(db))
    val current = new Path(spark.sessionState.catalog.getTableMetadata(ident).location)
    val defaultLoc = new Path(spark.sessionState.catalog.defaultTablePath(ident))
    if (current.toUri.getPath != defaultLoc.toUri.getPath) {
      val fs = defaultLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(defaultLoc)) fs.delete(defaultLoc, true)
    }
    spark.sql(s"ALTER TABLE $fq RENAME TO $old")
    try spark.sql(s"ALTER TABLE $staging RENAME TO $fq")
    catch {
      case e: Throwable =>
        // restore the original so readers never see a missing table
        spark.sql(s"ALTER TABLE $old RENAME TO $fq")
        throw e
    }
    spark.sql(s"DROP TABLE IF EXISTS $old")
    // A swap resets the layout to a plain managed location, so any
    // `__snap` version root left by earlier snapshot rewrites is now
    // unreferenced — vacuum it (best-effort). The swap path makes no
    // reader-isolation promise (it just dropped `__old`, the pre-swap
    // data), so deleting retained versions here is consistent.
    snapRoot(spark, db, table).foreach { root =>
      try {
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(root)) fs.delete(root, true)
      } catch { case _: java.io.IOException => () }
    }
  }
}
