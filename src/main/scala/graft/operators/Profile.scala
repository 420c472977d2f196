package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Reusable column-profile surface — the engine's equivalent of the
  * reference's `dbutils.data.summarize` cells (SURVEY §2.4 A11; reference
  * dbc cmds 2, 7, 42, 43): per-column statistics over arbitrary
  * DataFrames, not just the q15/q17 oracle queries (which delegate here).
  *
  * Scale design: ONE wide aggregate (partial-aggregated map-side) feeds
  * every per-column output row. The 1-row aggregate is persisted, so the
  * per-column union branches substitute the cached plan instead of each
  * replanning the whole scan+aggregate (without the persist, Spark reuses
  * NOTHING across union branches — measured 3 FileScans for 3 columns).
  * The query stays lazy and its real plan stays visible to plan tests.
  *
  * Numeric contract — read before pointing this at arbitrary columns:
  *  - mean and stddev are computed on values quantized to `scale`
  *    decimal places (default 2 — exact for the engine's money
  *    convention and for integer keys); min/max/median/zeros/distinct
  *    use the RAW values. Columns with sub-grid magnitudes (ratios,
  *    embedding scores) need a larger `scale` or their mean/stddev
  *    quantize toward zero while min/max stay raw.
  *  - capacity: values must fit DECIMAL(19, scale) and
  *    Σx²·10^(2·scale) must stay under 10^38 (the DECIMAL(38, 2·scale)
  *    sum-of-squares accumulator); beyond that the profile FAILS LOUDLY
  *    on both engines (ANSI overflow here, out-of-range in the oracle)
  *    rather than silently degrading.
  *  - each call persists its 1-row wide aggregate (a CacheManager entry
  *    shared by the column branches); long-lived callers profiling many
  *    distinct inputs should `spark.catalog.clearCache()` periodically.
  *  - stddev uses the sum-of-squares algebra
  *    `sqrt(greatest(0, sum2/n − mean²))`, clamped at zero because a
  *    constant column can land one ulp negative.
  */
object Profile {

  /** Numeric profile: one output row per column —
    * count / nonnull / distinct / zeros / min / max / mean / stddev /
    * median (exact linear-interpolated percentile). */
  def summarize(df: DataFrame, numericCols: Seq[String], scale: Int = 2): DataFrame = {
    require(numericCols.nonEmpty, "summarize needs at least one column")
    val aggs = numericCols.flatMap { c =>
      val x = df(c) // exact-name resolution — no dot/backtick parsing
      val d = x.cast(DecimalType(19, scale))
      Seq(
        count(x).as(s"${c}__nonnull"),
        countDistinct(x).as(s"${c}__distinct"),
        sum(when(x === 0, 1L).otherwise(0L)).as(s"${c}__zeros"),
        min(x).cast(DoubleType).as(s"${c}__min"),
        max(x).cast(DoubleType).as(s"${c}__max"),
        (sum(x.cast(DecimalType(28, scale))).cast(DoubleType) /
          count(x).cast(DoubleType)).as(s"${c}__mean"),
        sum(d * d).as(s"${c}__sum2"),
        percentile(x, lit(0.5)).as(s"${c}__median")) // exact, linear-interpolated
    } :+ count(lit(1)).as("n_rows")
    // persisted: the per-column branches below each reference this 1-row
    // frame; the cache substitution makes them share ONE scan+aggregate
    val wide = df.agg(aggs.head, aggs.tail: _*)
      .transform(graft.operators.Dedup.persistOnce)
    val perCol = numericCols.map { c =>
      val mean = wide(s"${c}__mean")
      wide.select(
        lit(c).as("column_name"),
        wide("n_rows"),
        wide(s"${c}__nonnull").as("n_nonnull"),
        wide(s"${c}__distinct").as("n_distinct"),
        wide(s"${c}__zeros").as("n_zeros"),
        wide(s"${c}__min").as("min_value"),
        wide(s"${c}__max").as("max_value"),
        mean.as("mean_value"),
        // clamp at 0: a constant column's sum2/n and mean² can differ by
        // one ulp with mean² larger — Spark's sqrt(-ε) is NaN but DuckDB
        // ERRORS, so both sides of the oracle clamp identically; for an
        // all-null column the null-ignoring greatest yields 0.0
        sqrt(greatest(lit(0.0), wide(s"${c}__sum2").cast(DoubleType) /
          wide(s"${c}__nonnull").cast(DoubleType) - mean * mean)).as("stddev_value"),
        wide(s"${c}__median").as("median_value"))
    }
    perCol.reduce(_.unionAll(_)).orderBy(col("column_name").asc)
  }

  /** String profile (the top/freq half of summarize): per column, the
    * distinct count and the modal value with its frequency — one groupBy
    * per column over a pruned scan, modal pick via max_by with a
    * deterministic (count, value) tiebreak. */
  def summarizeStrings(df: DataFrame, strCols: Seq[String]): DataFrame = {
    require(strCols.nonEmpty, "summarizeStrings needs at least one column")
    val perCol = strCols.map { c =>
      val counts = df.groupBy(df(c).as("v")).agg(count(lit(1)).as("cnt"))
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
