package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for t04's stable sf10full wall (r14 verdict task 3:
  * "profile the 10.1 s — land a measured ≥2× or document why it's
  * floor"). Stages the pipeline so each increment's wall AND executor
  * CPU (CpuMeter) are visible:
  *   scan      — bare single-row-group scan + decompress, sum(length)
  *   spread    — + the round-robin exchange (what loadSpread adds)
  *   walk      — + graft_ngram_fp over the spread rows (no sort)
  *   full t04  — + the ORDER BY + consume
  * Not part of the driver contract; results land in PERF.md 15b. */
object ProbeT04 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata-local/sf10full")
    val spark = graft.Session.get("probe-t04")
    graft.CpuMeter.install(spark)
    def time(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val (c0, _) = graft.CpuMeter.snapshot(spark)
        val t0 = System.nanoTime()
        val n = f
        val wall = (System.nanoTime() - t0) / 1e9
        val (c1, _) = graft.CpuMeter.snapshot(spark)
        println(f"[probe-t04] $tag%-28s run $i: $wall%7.3f s cpu ${c1 - c0}%7.3f s ($n rows)")
      }
    }
    val bare = graft.Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
    time("scan (no spread)") {
      bare.agg(sum(length(col("text")))).collect().head.getLong(0)
    }
    val spread = graft.plans.Scale.spreadIfNarrow(bare)
    time("scan + spread") {
      spread.agg(sum(length(col("text")))).collect().head.getLong(0)
    }
    val walk = spread
      .select(col("doc_id"), expr("graft_ngram_fp(text, 4)").as("fp"))
      .where(col("fp.n_windows") > 0)
    time("spread + walk (no sort)") {
      walk.agg(count(lit(1))).collect().head.getLong(0)
    }
    time("full t04 (consume)") {
      graft.BenchConsume.consume(
        graft.operators.TextAnalysis.t04Fingerprint(spark, dir))._1
    }
    spark.stop()
  }
}
