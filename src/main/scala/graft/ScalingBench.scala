package graft

/** Scaling-study harness (PERF.md's sublinearity table): times the five
  * scale-path operators across locally generated corpora a decade beyond
  * the driver's sf0.1 (tools/gen_sf_local.py), and demonstrates the
  * quadratic-baseline caps refusing an over-cap corpus while the bucketed
  * paths keep running. One JVM for the whole sweep so JIT/codegen warmth
  * is shared and numbers are comparable across (query, sf).
  *
  * Usage: runMain graft.ScalingBench [dir ...]
  * Default dirs: target/testdata-local/{sf0.1,sf1}; pass an extra
  * over-cap dir (capcheck) to exercise the guards.
  */
object ScalingBench {
  private val ScaleQueries = Seq(
    "d03_minhash_lsh", "d08_lsh_clusters", "t07_stratified_sample",
    "p02_shard_packing", "s03_ann_ivf",
    // round-6 additions over the documents table: the containment audit
    // (band-join scale path), the contamination-pair anti-join apply,
    // the closed-form sequence-pack manifest, and the spectrum rollup
    "d16_containment_audit", "d15_decontaminate_apply",
    "p10_sequence_pack", "t18_freq_spectrum",
    // round-7 additions: the guaranteed-recall containment sketch and
    // the grouped recursive prefix sum (skew-proof targets)
    "d17_containment_sketch", "p12_budget_head_cut")
  private val CappedQueries = Seq("d02_ngram_jaccard", "d05_embedding_neardup")

  def main(args: Array[String]): Unit = {
    // fail fast on a typo'd query name rather than aborting mid-sweep
    val unknown = (ScaleQueries ++ CappedQueries).filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"ScalingBench names not in SparkEntry.queries: ${unknown.mkString(", ")}")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("target/testdata-local/sf0.1", "target/testdata-local/sf1")
    val capDir = sys.env.get("GRAFT_CAPCHECK_DIR")
    val spark = Session.get("graft-scaling")
    CpuMeter.install(spark)
    for (dir <- dirs; name <- ScaleQueries) {
      val fn = SparkEntry.queries(name)
      val runs = (1 to 3).map { _ =>
        val (c0, _) = CpuMeter.snapshot(spark)
        val t0 = System.nanoTime()
        val n = BenchConsume.consume(fn(spark, dir))._1
        val (c1, _) = CpuMeter.snapshot(spark)
        ((System.nanoTime() - t0) / 1e9, n, c1 - c0)
      }
      spark.catalog.clearCache()
      println(f"[scaling] $name%-22s $dir%-30s min=${runs.map(_._1).min}%7.3f s " +
        f"cpu=${runs.map(_._3).min}%7.3f s " +
        f"runs=${runs.map(r => f"${r._1}%.2f").mkString("/")} rows=${runs.head._2}")
    }
    capDir.foreach { dir =>
      // the quadratic exactness baselines must REFUSE the over-cap corpus…
      for (name <- CappedQueries) {
        val fired =
          try { BenchConsume.consume(SparkEntry.queries(name)(spark, dir)); false }
          catch { case e: IllegalArgumentException =>
            println(s"[scaling] $name cap FIRED at $dir: ${e.getMessage.linesIterator.next()}")
            true
          }
        if (!fired) println(s"[scaling] $name cap DID NOT FIRE at $dir — guard regression")
      }
      // …while the bucketed scale paths still run on the same corpus
      for (name <- Seq("d03_minhash_lsh", "s03_ann_ivf")) {
        val t0 = System.nanoTime()
        val n = BenchConsume.consume(SparkEntry.queries(name)(spark, dir))._1
        spark.catalog.clearCache()
        println(f"[scaling] $name%-22s $dir%-30s over-cap single run " +
          f"${(System.nanoTime() - t0) / 1e9}%7.3f s rows=$n")
      }
    }
    spark.stop()
  }
}
