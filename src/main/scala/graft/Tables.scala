package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables as temp views so SQL-text entry points work too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
