package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Tables mirror the reference's star schema roles (FIXTURES.md §B):
  * `orders` plays the cart-header fact ("abandoned" = `o_orderstatus = 'O'`),
  * `lineitem` the cart-lines fact, `customer`/`nation`/`region` the
  * user/region dimensions, `part`/`supplier` the small broadcast dims.
  * `documents`/`embeddings`/`events` back the training-data-pipeline
  * operators (dedup, similarity, streaming).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one synthetic table. Parquet scan → columnar, vectorized; filters
    * and projections placed on top are pushed into the scan by Catalyst.
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * schema converter rejects outright. With
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by [[graft.Session]]
    * and the Verify/Bench mains) the column surfaces as nanos-since-epoch
    * LongType; we convert to a proper TimestampType (micro precision,
    * floor-truncated like DuckDB's TIMESTAMP_NS→TIMESTAMP read).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Snapshot memo key for dir-keyed scalar-probe memos (anchor date,
    * doc count, pack max-id): the dir plus a content fingerprint of its
    * file listing. Overwriting any table in place changes the key, so
    * the memos refresh instead of serving stale values — keyed by
    * (dir, snapshot), not dir alone. One FS metadata walk, no job. */
  def snapshotKey(spark: SparkSession, dir: String): String =
    dir + "@" + graft.sources.Artifacts.corpusFingerprint(spark, dir)

  /** Register all tables as temp views so SQL-text entry points work too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
