package graft.tools

import org.apache.spark.sql.functions._

/** A/B for s01's serial scan stage (r14 verdict task 6): the sf10full
  * embeddings file is ONE 53 MB row group, so the broadcast-probe dot
  * products fuse into a scan stage where a single task does all the
  * work (ProbeStages: 13 tasks, wall 7.9 s ≈ cpu 8.0 s). Variant B
  * spreads the corpus before scoring. Results land in PERF 15c. */
object ProbeS01 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata-local/sf10full")
    val spark = graft.Session.get("probe-s01")
    graft.CpuMeter.install(spark)
    def time(tag: String)(f: => (Long, Long)): Unit = {
      (1 to 3).foreach { i =>
        val (c0, _) = graft.CpuMeter.snapshot(spark)
        val t0 = System.nanoTime()
        val (n, d) = f
        val wall = (System.nanoTime() - t0) / 1e9
        val (c1, _) = graft.CpuMeter.snapshot(spark)
        spark.catalog.clearCache()
        println(f"[probe-s01] $tag%-14s run $i: $wall%7.3f s cpu ${c1 - c0}%7.3f s ($n rows, digest $d%016x)")
      }
    }
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val probes = emb.where(col("vec_id") < graft.operators.Similarity.QuerySet)
    time("as-is") {
      graft.BenchConsume.consume(graft.operators.Similarity.annBruteforce(emb, probes))
    }
    time("spread-corpus") {
      graft.BenchConsume.consume(graft.operators.Similarity.annBruteforce(
        graft.plans.Scale.spreadIfNarrow(emb), probes))
    }
    spark.stop()
  }
}
