package graft.sources

import java.util.concurrent.Executors

import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.TableIdentifier

/** Writer-writer optimistic concurrency on the snapshot rewrite path —
  * the engine analog of Delta's commit-retry loop (the reference's
  * tables are Delta, `TyreStore Challenge.py:65-72`; its clean step's
  * overwrite relies on Delta transactions). In package graft.sources to
  * reach the `beforeCommit` interleaving hook. */
class CleanConcurrencySpec extends graft.SparkSpec {
  import spark.implicits._

  private def fixture(table: String): Unit = {
    Clean.dropTableWithSnapshots(spark, "graftdb", table)
    Ingest.saveAsTable(
      Seq((1L, 10.0), (2L, 0.0), (3L, 5.0), (4L, -1.0)).toDF("pk", "price"),
      "graftdb", table)
    // adopt the version layout up front so the specs exercise OCC proper
    // (first-ever adoption racing is the documented concurrent-CREATE
    // analog, out of OCC's scope)
    Clean.rewriteTable(spark, "graftdb", table)(identity) // v=1
  }

  private def pks(table: String): Set[Long] =
    spark.table(s"`graftdb`.`$table`").select("pk").as[Long].collect().toSet

  private def snapRootOf(table: String): Path =
    new Path(spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table, Some("graftdb"))).location).getParent

  test("OCC: the losing writer detects the competing commit, publishes " +
      "nothing, cleans its staging, and a retry lands on the new version") {
    fixture("carts_occ_spec")
    // writer A materializes its rewrite; before A's critical section,
    // writer B commits a competing rewrite (deterministic interleaving
    // via the beforeCommit hook)
    val e = intercept[Clean.ConcurrentRewriteException] {
      Clean.rewriteTableImpl(spark, "graftdb", "carts_occ_spec", None,
        () => Clean.rewriteTable(spark, "graftdb", "carts_occ_spec")(
          _.where($"pk" =!= 2L)))(
        _.where($"price" > 0))
    }
    assert(e.getMessage.contains("another writer committed first"))
    // only B is visible: A's filter (price>0 would drop pk=4) must not
    // have applied — a half-applied loser would be silent corruption
    assert(pks("carts_occ_spec") === Set(1L, 3L, 4L),
      "the losing writer must publish nothing")
    val root = snapRootOf("carts_occ_spec")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(root).exists(_.getPath.getName.startsWith("tmp_")),
      "the losing writer must delete its private staging dir")
    // the retry loop re-runs A's transform against B's version — BOTH
    // effects land (Delta's commit-retry semantics, not lost-update)
    Clean.rewriteTableWithRetries(spark, "graftdb", "carts_occ_spec")(
      _.where($"price" > 0))
    assert(pks("carts_occ_spec") === Set(1L, 3L))
  }

  test("OCC: sustained contention exhausts maxAttempts, re-running the " +
      "transform once per attempt, and rethrows loudly") {
    fixture("carts_occ_budget_spec")
    var attempts = 0
    intercept[Clean.ConcurrentRewriteException] {
      Clean.rewriteTableWithRetries(
        spark, "graftdb", "carts_occ_budget_spec", maxAttempts = 2) { df =>
        // a competitor commits during EVERY attempt — the livelock shape
        // the attempt budget exists for
        Clean.rewriteTable(spark, "graftdb", "carts_occ_budget_spec")(identity)
        attempts += 1
        df.where($"price" > 0)
      }
    }
    assert(attempts === 2, "the transform must re-run once per attempt")
    // every attempt lost ⇒ only the competitors' identity rewrites are
    // visible; the table stays consistent and readable
    assert(pks("carts_occ_budget_spec") === Set(1L, 2L, 3L, 4L))
  }

  test("OCC: two concurrent writers with retries serialize — both " +
      "transforms land, no staging leaks, retention still holds") {
    fixture("carts_occ_race_spec")
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // commutative transforms, so the serialized outcome is unique:
      // price>0 drops {2,4}; pk=!=1 drops {1} → {3} iff BOTH applied
      val a = Future(Clean.rewriteTableWithRetries(
        spark, "graftdb", "carts_occ_race_spec", maxAttempts = 5)(
        _.where($"price" > 0)))
      val b = Future(Clean.rewriteTableWithRetries(
        spark, "graftdb", "carts_occ_race_spec", maxAttempts = 5)(
        _.where($"pk" =!= 1L)))
      Await.result(a, 180.seconds)
      Await.result(b, 180.seconds)
    } finally pool.shutdown()
    assert(pks("carts_occ_race_spec") === Set(3L),
      "a lost update — one writer's transform overwritten by the other")
    val root = snapRootOf("carts_occ_race_spec")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(root).exists(_.getPath.getName.startsWith("tmp_")))
    // both committed (possibly after a retry) ⇒ versions advanced past
    // the fixture's v=1, and the retention window still holds
    val vs = Clean.versions(spark, "graftdb", "carts_occ_race_spec")
    assert(vs.size === Clean.KeepSnapshots && vs.max >= 3L,
      s"expected both commits recorded within retention, got $vs")
  }

  test("a plain rewrite of a bucketed table stays bucketed and its " +
      "self-join stays exchange-free (r11 advisory pin)") {
    Clean.dropTableWithSnapshots(spark, "graftdb", "carts_bucketed_rw_spec")
    Ingest.saveAsTable(
      Seq((1L, 10.0), (2L, 0.0), (3L, 5.0), (4L, -1.0)).toDF("pk", "price"),
      "graftdb", "carts_bucketed_rw_spec")
    Clean.rewriteTable(spark, "graftdb", "carts_bucketed_rw_spec",
      bucket = Some(("pk", 4)))(identity)
    // plain rewrite (bucket = None): the guard must detect the CURRENT
    // catalog entry's bucket spec and re-apply it through the swap path —
    // a snapshot-path SET LOCATION would point the still-bucketed entry
    // at plain parquet
    Clean.rewriteTable(spark, "graftdb", "carts_bucketed_rw_spec")(
      _.where($"price" > 0))
    val meta = spark.sessionState.catalog.getTableMetadata(
      TableIdentifier("carts_bucketed_rw_spec", Some("graftdb")))
    assert(meta.bucketSpec.exists(bs =>
        bs.bucketColumnNames == Seq("pk") && bs.numBuckets == 4),
      s"rewrite dropped the bucket spec: ${meta.bucketSpec}")
    assert(pks("carts_bucketed_rw_spec") === Set(1L, 3L))
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = spark.table("`graftdb`.`carts_bucketed_rw_spec`")
      val j = t.as("a").join(t.as("b"),
        org.apache.spark.sql.functions.col("a.pk") ===
          org.apache.spark.sql.functions.col("b.pk"))
      val plan = j.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!plan.linesIterator.exists(_.trim.matches("""\(\d+\) Exchange\b.*""")),
        s"rewritten bucketed table must still join exchange-free:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("rewriteTable refuses a multi-column bucket spec loudly (r11 advisory pin)") {
    // dropTableWithSnapshots, not bare DROP: the in-memory catalog loses
    // entries across JVMs while the managed dir persists — a bare DROP
    // in a fresh session leaves the old dir and the re-create dies with
    // LOCATION_ALREADY_EXISTS
    Clean.dropTableWithSnapshots(spark, "graftdb", "carts_multibucket_spec")
    Seq((1L, 2L, 3.0)).toDF("a", "b", "v").write
      .bucketBy(4, "a", "b").sortBy("a")
      .format("parquet").saveAsTable("`graftdb`.`carts_multibucket_spec`")
    val e = intercept[IllegalArgumentException] {
      Clean.rewriteTable(spark, "graftdb", "carts_multibucket_spec")(identity)
    }
    assert(e.getMessage.contains("multi-column bucket spec"))
    // the refusal must leave the table untouched and readable
    assert(spark.table("`graftdb`.`carts_multibucket_spec`").count() === 1L)
  }
}
