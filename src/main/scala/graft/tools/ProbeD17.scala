package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for d17's stages (see PERF.md): anchor+candidate
  * derivation vs the exact verify/score tail. */
object ProbeD17 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata-local/sf1")
    val spark = graft.Session.get("probe-d17")
    def time(tag: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $tag run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    val docs = graft.operators.Dedup.excerptAugmented(spark, dir)
    time("candidates only") {
      val n = graft.operators.Dedup.sketchCandidates(docs,
        graft.operators.Dedup.AnchorDfCap).count()
      spark.catalog.clearCache()
      n
    }
    time("full d17") {
      val n = graft.operators.Dedup.containmentSketch(docs).count()
      spark.catalog.clearCache()
      n
    }
    spark.stop()
  }
}
