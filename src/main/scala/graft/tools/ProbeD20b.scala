package graft.tools

import org.apache.spark.sql.functions._

/** 14b follow-up: does spreadIfNarrow fire, and what does stage C cost
  * with the spread in place? */
object ProbeD20b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata-local/sf10full")
    val spark = graft.Session.get("probe-d20b")
    val docs = graft.Tables.load(spark, dir, "documents")
    val proj = docs.select(col("doc_id"), col("text"))
    println(s"[probe] scan partitions: ${proj.rdd.getNumPartitions}, " +
      s"defaultParallelism: ${spark.sparkContext.defaultParallelism}")
    val spread = graft.plans.Scale.spreadIfNarrow(proj)
    println(s"[probe] spread partitions: ${spread.rdd.getNumPartitions}")
    def time(tag: String)(f: => Long): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime(); val n = f; spark.catalog.clearCache()
      println(f"[probe] $tag run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    val w = "graft_ngram_h60(text, 4)"
    time("A' spread walk + count") {
      spread.select(explode(expr(w)).as("g")).groupBy().count().first().getLong(0)
    }
    time("C' spread df aggregate -> hot") {
      spread.select(explode(array_distinct(expr(w))).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("df"))
        .where(col("df") >= 3).count()
    }
    time("C'' spread + repartition(g) final-only agg") {
      spread.select(explode(array_distinct(expr(w))).as("g"))
        .repartition(col("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("df"))
        .where(col("df") >= 3).count()
    }
    spark.stop()
  }
}
