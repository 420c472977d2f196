package graft.tools

import org.apache.spark.sql.functions._

import graft.{BenchConsume, CpuMeter, Session, Tables}
import graft.operators.Dedup

/** r17 (verdict task 1 "Done" criterion): measure the incremental
  * artifact refresh against a full from-scratch rebuild on an APPENDED
  * corpus, and prove digest equality family by family.
  *
  * Usage: runMain graft.tools.ProbeRefresh <oldDir> <newDir> [batchFrac]
  *
  * `newDir` is created on first run as oldDir's documents plus a
  * synthesized batch (default 1% of the corpus): half near-dup mutations
  * of sampled old docs — so band collisions, contamination pairs, and
  * cluster merges actually happen — and half fresh text. Then:
  *   phase old:     ensure oldDir's artifact families exist (timed;
  *                  ~0 when a prebuild leg already built them)
  *   phase refresh: refresh each family incrementally onto newDir
  *   phase scratch: drop newDir's artifacts, rebuild each from scratch
  * and print one JSON line with per-family wall/CPU for both phases and
  * a per-family digest comparison (BenchConsume xor-fold — order-
  * insensitive, all columns).
  */
object ProbeRefresh {
  def main(args: Array[String]): Unit = {
    val oldDir = args(0)
    val newDir = args(1)
    val batchFrac = if (args.length > 2) args(2).toDouble else 0.01
    val spark = Session.get("graft-probe-refresh")
    CpuMeter.install(spark)

    // ---- corpus: newDir = oldDir + synthesized batch ------------------
    val newDocsPath = s"$newDir/documents.parquet"
    val fs = new org.apache.hadoop.fs.Path(newDocsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(newDocsPath))) {
      val docs = Tables.load(spark, oldDir, "documents")
      val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
      val nBatch = math.max(1L, (docs.count() * batchFrac).toLong)
      val sampled = docs.orderBy(col("doc_id")).limit(nBatch.toInt)
      val batch = sampled.select(
        (col("doc_id") + maxId + 1L).as("doc_id"),
        when((col("doc_id") + maxId + 1L) % 2 === 0,
            concat_ws(" ", slice(split(col("text"), "\\s+"), 2, Int.MaxValue)))
          .otherwise(concat(lit("fresh append r17 "), col("text"))).as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
      docs.select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars").cast("long").as("n_chars"))
        .unionByName(batch)
        .write.mode("overwrite").parquet(newDocsPath)
      System.err.println(s"[probe-refresh] wrote $newDocsPath (+$nBatch batch docs)")
    }

    def timed[A](body: => A): (A, Double, Double) = {
      val t0 = System.nanoTime()
      val (a, cpu, _) = CpuMeter.measure(spark)(body)
      (a, (System.nanoTime() - t0) / 1e9, cpu)
    }

    // ---- phase old: the deployment precondition -----------------------
    val (_, oldWall, oldCpu) = timed {
      Dedup.persistedShingles(spark, oldDir)
      Dedup.persistedH60Shingles(spark, oldDir)
      Dedup.persistedDedupIndex(spark, oldDir)
      Dedup.persistedScoredCandidates(spark, oldDir)
      Dedup.persistedLshEdges(spark, oldDir)
      Dedup.persistedContamPairs(spark, oldDir)
      Dedup.clusterLabels(spark, oldDir)
    }
    spark.catalog.clearCache()

    // a prior run (or its scratch phase) may have left newDir artifacts
    // behind — drop them so the refresh phase measures a real build
    Seq(Dedup.shingleArtifactName(spark, newDir),
      Dedup.h60ArtifactName(spark, newDir),
      Dedup.dedupIndexArtifactName(spark, newDir),
      Dedup.scoredArtifactName(spark, newDir),
      Dedup.edgesArtifactName(spark, newDir),
      Dedup.contamPairsArtifactName(spark, newDir),
      Dedup.labelsArtifactName(spark, newDir))
      .foreach(t => graft.sources.Artifacts.dropArtifact(spark, t))

    // ---- phase refresh: incremental, per family -----------------------
    val refreshSteps: Seq[(String, () => Unit)] = Seq(
      "shingles" -> (() => { Dedup.refreshedShingles(spark, oldDir, newDir); () }),
      "h60" -> (() => { Dedup.refreshedH60Shingles(spark, oldDir, newDir); () }),
      "dedupsig" -> (() => { Dedup.refreshedDedupIndex(spark, oldDir, newDir); () }),
      "scored" -> (() => { Dedup.refreshedScoredCandidates(spark, oldDir, newDir); () }),
      "edges" -> (() => { Dedup.persistedLshEdges(spark, newDir); () }),
      "contam" -> (() => { Dedup.refreshedContamPairs(spark, oldDir, newDir); () }),
      "labels" -> (() => { Dedup.refreshedClusterLabelsViaEdges(spark, oldDir, newDir); () }))
    val refreshTimes = refreshSteps.map { case (fam, step) =>
      val (_, w, c) = timed(step())
      System.err.println(f"[probe-refresh] refresh $fam: $w%.1f s / $c%.1f cpu-s")
      fam -> (w, c)
    }
    spark.catalog.clearCache()

    val tables: Seq[(String, String)] = Seq(
      "shingles" -> Dedup.shingleArtifactName(spark, newDir),
      "h60" -> Dedup.h60ArtifactName(spark, newDir),
      "dedupsig" -> Dedup.dedupIndexArtifactName(spark, newDir),
      "scored" -> Dedup.scoredArtifactName(spark, newDir),
      "edges" -> Dedup.edgesArtifactName(spark, newDir),
      "contam" -> Dedup.contamPairsArtifactName(spark, newDir),
      "labels" -> Dedup.labelsArtifactName(spark, newDir))
    def digests(): Map[String, (Long, Long)] = tables.map { case (fam, tbl) =>
      fam -> BenchConsume.consume(
        spark.table(s"`${graft.sources.Artifacts.Db}`.`$tbl`"))
    }.toMap
    val refreshDigests = digests()

    // ---- phase scratch: drop + ordinary cold-build path ---------------
    tables.foreach { case (_, tbl) =>
      graft.sources.Artifacts.dropArtifact(spark, tbl)
    }
    spark.catalog.clearCache()
    val scratchSteps: Seq[(String, () => Unit)] = Seq(
      "shingles" -> (() => { Dedup.persistedShingles(spark, newDir); () }),
      "h60" -> (() => { Dedup.persistedH60Shingles(spark, newDir); () }),
      "dedupsig" -> (() => { Dedup.persistedDedupIndex(spark, newDir); () }),
      "scored" -> (() => { Dedup.persistedScoredCandidates(spark, newDir); () }),
      "edges" -> (() => { Dedup.persistedLshEdges(spark, newDir); () }),
      "contam" -> (() => { Dedup.persistedContamPairs(spark, newDir); () }),
      "labels" -> (() => { Dedup.clusterLabels(spark, newDir); () }))
    val scratchTimes = scratchSteps.map { case (fam, step) =>
      val (_, w, c) = timed(step())
      System.err.println(f"[probe-refresh] scratch $fam: $w%.1f s / $c%.1f cpu-s")
      fam -> (w, c)
    }
    val scratchDigests = digests()

    def jnum(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val fams = tables.map(_._1)
    val famJson = fams.map { fam =>
      val (rw, rc) = refreshTimes.find(_._1 == fam).get._2
      val (sw, sc) = scratchTimes.find(_._1 == fam).get._2
      val (rn, rd) = refreshDigests(fam)
      val (sn, sd) = scratchDigests(fam)
      s""""$fam":{"refresh_s":${jnum(rw)},"refresh_cpu_s":${jnum(rc)},""" +
        s""""scratch_s":${jnum(sw)},"scratch_cpu_s":${jnum(sc)},""" +
        s""""rows":$rn,"digest_match":${rn == sn && rd == sd}}"""
    }.mkString("{", ",", "}")
    val rTot = refreshTimes.map(_._2._1).sum
    val rCpuTot = refreshTimes.map(_._2._2).sum
    val sTot = scratchTimes.map(_._2._1).sum
    val sCpuTot = scratchTimes.map(_._2._2).sum
    val allMatch = fams.forall(f => refreshDigests(f) == scratchDigests(f))
    val line =
      s"""{"probe":"refresh","old":"$oldDir","new":"$newDir",""" +
      s""""old_build_s":${jnum(oldWall)},"old_build_cpu_s":${jnum(oldCpu)},""" +
      s""""refresh_s":${jnum(rTot)},"refresh_cpu_s":${jnum(rCpuTot)},""" +
      s""""scratch_s":${jnum(sTot)},"scratch_cpu_s":${jnum(sCpuTot)},""" +
      s""""refresh_over_scratch":${jnum(rTot / math.max(sTot, 1e-9))},""" +
      s""""digests_equal":$allMatch,"families":$famJson}"""
    println(line)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/probe_refresh.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    println(line)
  }
}
