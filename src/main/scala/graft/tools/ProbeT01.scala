package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for t01's two halves (not part of the driver
  * contract; see PERF.md). Times the profile build alone, then the
  * full query, so the classification half is the difference. */
object ProbeT01 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata-local/sf1")
    val spark = graft.Session.get("probe-t01")
    val docs = graft.Tables.load(spark, dir, "documents")
    def time(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $tag run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    val bigrams = docs.where(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), col("lang"),
        explode(expr("graft_bigram_codes(text)")).as("bg"))
    time("explode codes + count") {
      bigrams.groupBy(col("lang")).count().count()
    }
    val profile = bigrams
      .groupBy(col("lang").as("p_lang"), col("bg"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("p_lang")).orderBy(col("cnt").desc, col("bg").asc)))
      .where(col("rk") <= 20)
    time("profile build") { profile.count() }
    val holdoutFold = docs.where(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("lang"),
        expr("array_distinct(graft_bigram_codes(text))").as("bgs"))
    time("holdout fold only") {
      holdoutFold.select(sum(size(col("bgs")))).collect().head.getLong(0)
    }
    time("full t01") { graft.operators.TextAnalysis.languageId(docs).count() }
    spark.stop()
  }
}
