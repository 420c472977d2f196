package graft

import org.apache.spark.sql.SparkSession

/** The one place engine SparkSession conf lives (SURVEY.md §7.2 step 1).
  *
  * Defaults are scale-oriented: AQE on (runtime shuffle coalescing + skew
  * join splitting), shuffle partitions sized to the local core count (not
  * the 200 default — on a real cluster this would be a multiple of total
  * executor cores), UTC session time, nanos-parquet compatibility for the
  * `events` table.
  */
object Session {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  def builder(appName: String): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false")

  def get(appName: String): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
