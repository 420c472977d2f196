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
    * `events.ts` has been written by different generator versions with
    * different parquet logical types, so the loader adapts to whatever the
    * scan surfaces instead of hard-coding one physical schema:
    *  - TIMESTAMP(NANOS): Spark's converter rejects it outright unless
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set by [[graft.Session]]),
    *    under which it surfaces as nanos-since-epoch LongType → convert to
    *    TimestampType (micro precision, floor-truncated like DuckDB's
    *    TIMESTAMP_NS→TIMESTAMP read).
    *  - TIMESTAMP(MICROS, adjusted-to-UTC): surfaces as TimestampType →
    *    pass through.
    *  - TIMESTAMP(MICROS, not adjusted): surfaces as TimestampNTZType →
    *    cast to TimestampType. Session timezone is pinned UTC, so the
    *    wall-clock values map to the same instants the nanos path produced.
    * Anything else is a generator change we haven't seen: fail loudly with
    * the file path rather than let 15 downstream queries mis-analyze.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = spark.read.parquet(path)
    if (name == "events") {
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      df.schema("ts").dataType match {
        case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampType    => df
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case other => throw new IllegalArgumentException(
          s"$path: events.ts surfaced as $other; expected nanos-as-long LongType, " +
            "TimestampType, or TimestampNTZType. The generator's physical schema " +
            "changed again — extend Tables.load for the new type.")
      }
    } else df
  }

  /** Snapshot memo key for dir-keyed scalar-probe memos (anchor date,
    * doc count, pack max-id): the dir plus a content fingerprint of its
    * file listing. Overwriting any table in place changes the key, so
    * the memos refresh instead of serving stale values — keyed by
    * (dir, snapshot), not dir alone. One FS metadata walk, no job. */
  def snapshotKey(spark: SparkSession, dir: String): String =
    dir + "@" + graft.sources.Artifacts.corpusFingerprint(spark, dir)

  /** Register just the named tables as temp views. Registration is
    * per-table so a schema break in one table can only fail queries that
    * actually read it — round 9 lost q14 (orders-only) to a broken
    * `events` because the old all-or-nothing registration loaded every
    * table eagerly. */
  def register(spark: SparkSession, dir: String, tables: Seq[String]): Unit =
    tables.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Table names referenced by a SQL text, by word-boundary match against
    * the known catalog. Conservative on purpose: a table name appearing in
    * a comment or string literal registers one extra view (harmless),
    * whereas missing a real reference would fail analysis — so err toward
    * matching. Column names (`l_partkey`, `part_a`) don't false-positive:
    * `_` is a word character, so `\bpart\b` doesn't match inside them. */
  def referencedTables(sql: String): Seq[String] =
    names.filter(n => ("\\b" + n + "\\b").r.findFirstIn(sql).isDefined)

  /** Register only the tables a SQL text references, then it's safe to run
    * `spark.sql(sql)`: unrelated tables are never loaded. */
  def registerFor(spark: SparkSession, dir: String, sql: String): Unit =
    register(spark, dir, referencedTables(sql))

  /** Register all tables as temp views so ad-hoc SQL works too. Prefer
    * [[registerFor]] in query entry points: this form loads every table,
    * so one broken file fails the whole call. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    register(spark, dir, names)
}
