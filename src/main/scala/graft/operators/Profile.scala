package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType, StructField, StructType}

/** Reusable column-profile surface — the engine's equivalent of the
  * reference's `dbutils.data.summarize` cells (SURVEY §2.4 A11; reference
  * dbc cmds 2, 7, 42, 43): per-column statistics over arbitrary
  * DataFrames, not just the q15/q17 oracle queries (which delegate here).
  *
  * Scale design: ONE aggregate job for all numeric columns (a single wide
  * `agg` the optimizer partial-aggregates map-side), then a tiny union of
  * literal-labeled one-row frames — never a per-column scan. Mean and
  * stddev accumulate in DECIMAL (exact, partition-order-independent) with
  * one double cast at the end; stddev uses the sum-of-squares algebra
  * `sqrt(max(0, sum2/n − mean²))`, clamped at zero because a constant
  * column can land one ulp negative.
  */
object Profile {

  /** Numeric profile: one output row per column —
    * count / nonnull / distinct / zeros / min / max / mean / stddev /
    * median (exact linear-interpolated percentile).
    *
    * The wide aggregate is fetched to the driver ONCE (the engine's S8
    * scalar-capture pattern, like `anchorDate`) and the per-column rows
    * are built locally — a union of per-column selects over the aggregate
    * would replicate the whole scan+aggregate subtree per column (Spark
    * plans no reuse across union branches: measured 3 FileScans for 3
    * columns), which at corpus scale is N full scans for one profile.
    * Driver-side arithmetic is the SAME IEEE ops codegen would emit
    * (BigDecimal.doubleValue cast, double divide/multiply/sqrt), so
    * results are bit-identical to the in-plan form. */
  def summarize(df: DataFrame, numericCols: Seq[String]): DataFrame = {
    require(numericCols.nonEmpty, "summarize needs at least one column")
    val aggs = numericCols.flatMap { c =>
      val d = col(c).cast(DecimalType(19, 2))
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        sum(when(col(c) === 0, 1L).otherwise(0L)).as(s"${c}__zeros"),
        min(col(c)).cast(DoubleType).as(s"${c}__min"),
        max(col(c)).cast(DoubleType).as(s"${c}__max"),
        (sum(col(c).cast(DecimalType(28, 2))).cast(DoubleType) /
          count(col(c)).cast(DoubleType)).as(s"${c}__mean"),
        sum(d * d).as(s"${c}__sum2"),
        expr(s"percentile($c, 0.5)").as(s"${c}__median"))
    } :+ count(lit(1)).as("n_rows")
    val w = df.agg(aggs.head, aggs.tail: _*).first()
    val rows = numericCols.map { c =>
      val nonnull = w.getAs[Long](s"${c}__nonnull")
      val mean = w.getAs[java.lang.Double](s"${c}__mean")
      val sum2 = w.getAs[java.math.BigDecimal](s"${c}__sum2")
      // clamp at 0: a constant column's sum2/n and mean² can differ by
      // one ulp with mean² larger — sqrt(-ε) would be NaN here and an
      // ERROR in the DuckDB oracle, so both sides clamp identically
      val stddev: java.lang.Double =
        if (sum2 == null || mean == null || nonnull == 0L) null
        else math.sqrt(math.max(0.0,
          sum2.doubleValue / nonnull.toDouble - mean * mean))
      Row(
        c,
        w.getAs[Long]("n_rows"),
        nonnull,
        w.getAs[Long](s"${c}__distinct"),
        w.getAs[java.lang.Long](s"${c}__zeros"),
        w.getAs[java.lang.Double](s"${c}__min"),
        w.getAs[java.lang.Double](s"${c}__max"),
        mean,
        stddev,
        w.getAs[java.lang.Double](s"${c}__median"))
    }.sortBy(_.getString(0))
    val schema = StructType(Seq(
      StructField("column_name", StringType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("n_nonnull", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = false),
      StructField("n_zeros", LongType, nullable = true),
      StructField("min_value", DoubleType, nullable = true),
      StructField("max_value", DoubleType, nullable = true),
      StructField("mean_value", DoubleType, nullable = true),
      StructField("stddev_value", DoubleType, nullable = true),
      StructField("median_value", DoubleType, nullable = true)))
    import scala.jdk.CollectionConverters._
    df.sparkSession.createDataFrame(rows.asJava, schema)
      .orderBy(col("column_name").asc)
  }

  /** String profile (the top/freq half of summarize): per column, the
    * distinct count and the modal value with its frequency — one groupBy
    * per column over a pruned scan, modal pick via max_by with a
    * deterministic (count, value) tiebreak. */
  def summarizeStrings(df: DataFrame, strCols: Seq[String]): DataFrame = {
    require(strCols.nonEmpty, "summarizeStrings needs at least one column")
    val perCol = strCols.map { c =>
      val counts = df.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
      counts.agg(
          count(lit(1)).as("n_distinct"),
          expr("max_by(v, struct(cnt, v))").as("top_value"),
          max(struct(col("cnt"), col("v"))).getField("cnt").as("top_freq"))
        .select(lit(c).as("column_name"), col("n_distinct"),
          col("top_value"), col("top_freq"))
    }
    perCol.reduce(_.unionAll(_)).orderBy(col("column_name").asc)
  }
}
