package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler decomposing d20's strip pipeline (not part of the
  * driver contract; see PERF.md 14b): the ngram md5 walk alone, the
  * in-row dedup, the df aggregate, the start-list build, and the strip
  * walk — so each stage's share of the end-to-end wall is measured,
  * not guessed. */
object ProbeD20 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata-local/sf10full")
    val spark = graft.Session.get("probe-d20")
    val docs = graft.Tables.load(spark, dir, "documents")
    def time(tag: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        spark.catalog.clearCache()
        println(f"[probe] $tag run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    val w = s"graft_ngram_h60(text, ${graft.operators.Dedup.SpanWidth})"
    time("A ngram walk + count") {
      docs.select(explode(expr(w)).as("g")).groupBy().count().first().getLong(0)
    }
    time("B walk + array_distinct") {
      docs.select(explode(array_distinct(expr(w))).as("g"))
        .groupBy().count().first().getLong(0)
    }
    time("C df aggregate -> hot") {
      docs.select(explode(array_distinct(expr(w))).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("df"))
        .where(col("df") >= graft.operators.Dedup.BoilerMinDocs).count()
    }
    time("D badStarts end-to-end") {
      val hot = docs.select(explode(array_distinct(expr(w))).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("df"))
        .where(col("df") >= graft.operators.Dedup.BoilerMinDocs).select(col("g"))
      docs.select(col("doc_id"), posexplode(expr(w)).as(Seq("i0", "g")))
        .select(col("doc_id"), (col("i0") + 1).as("i"), col("g"))
        .join(hot, Seq("g"), "left_semi")
        .groupBy(col("doc_id")).agg(collect_list(col("i")).as("starts"))
        .count()
    }
    time("E strip walk alone (empty starts)") {
      docs.select(expr(
        s"graft_strip_spans(text, array(), ${graft.operators.Dedup.SpanWidth})").as("r"))
        .agg(sum(col("r.n_words"))).first(); docs.count()
    }
    spark.stop()
  }
}
