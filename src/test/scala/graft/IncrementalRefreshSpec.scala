package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Incremental artifact refresh (VERDICT r6 task 6): appending a batch
  * updates the labels / centroid artifacts at batch-probe cost — no
  * corpus-wide propagation loop, no unconditional retrain — and the
  * refreshed artifacts are EXACTLY what a from-scratch rebuild produces
  * (labels) or a drift-gate-justified reuse (centroids).
  */
class IncrementalRefreshSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------------------------
  // crafted corpora: shingle arithmetic puts pair similarities on the
  // designed side of ClusterThreshold=0.6 (word-3-grams; an interior
  // single-word substitution kills exactly 3 shingles, an interior
  // 8-word segment substitution kills exactly 10)
  // -------------------------------------------------------------------
  private def words(prefix: String, n: Int): IndexedSeq[String] =
    (0 until n).map(i => s"$prefix$i")

  private def substituted(base: IndexedSeq[String], at: Seq[Int], tag: String): String =
    base.zipWithIndex.map { case (w, i) =>
      if (at.contains(i)) s"$tag$i" else w
    }.mkString(" ")

  private val base62 = words("tok", 62)
  private val subsAll = Seq(5, 12, 19, 26, 33, 40, 47, 54) // interior, ≥7 apart

  /** Two distinct near-dup clusters (A,A') and (B,B'):
    * j(A,B) = 36/84 ≈ 0.43 < 0.6, within-cluster j = 57/63 ≈ 0.90. */
  private val docA  = base62.mkString(" ")
  private val docA2 = substituted(base62, Seq(30), "alt")
  private val docB  = substituted(base62, subsAll, "sub")
  private val docB2 = substituted(base62, subsAll, "sub")
    .split(" ").updated(31, "alt31b").mkString(" ")
  /** Bridge doc: B's first four substitutions only —
    * j(C,A) = j(C,B) = 48/72 ≈ 0.667, both ≥ 0.6. */
  private val docC = substituted(base62, subsAll.take(4), "sub")
  private val docIso  = words("iso", 40).mkString(" ")     // isolated in v1
  private val docIso2 = substituted(words("iso", 40), Seq(20), "late")

  private def labelSet(df: DataFrame): Set[(Long, Long)] =
    df.select("doc_id", "label").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("refreshLabels == from-scratch rebuild, including a merge bridged by the batch") {
    val existing = Seq(
      10L -> docA, 11L -> docA2, 20L -> docB, 21L -> docB2, 30L -> docIso
    ).toDF("doc_id", "text")
    val batch = Seq(100L -> docC, 101L -> docIso2).toDF("doc_id", "text")

    val oldLabels = Dedup.minLabelComponents(Dedup.lshEdgesOf(existing))
    // preconditions: two distinct clusters, isolated doc unlabeled
    val before = labelSet(oldLabels)
    assert(before === Set((10L, 10L), (11L, 10L), (20L, 20L), (21L, 20L)),
      s"v1 corpus must form exactly two clusters, got $before")

    val refreshed = labelSet(Dedup.refreshLabels(existing, oldLabels, batch))
    val scratch = labelSet(Dedup.minLabelComponents(
      Dedup.lshEdgesOf(existing.unionAll(batch))))
    assert(refreshed === scratch, "incremental refresh must equal a full rebuild")
    // the bridge merged both clusters under the global min label…
    assert(Set(10L, 11L, 20L, 21L, 100L).forall(d => refreshed.contains((d, 10L))),
      s"bridge doc must merge A- and B-clusters under label 10: $refreshed")
    // …and the previously-isolated doc gained its first edge
    assert(refreshed.contains((30L, 30L)) && refreshed.contains((101L, 30L)))
  }

  /** Count Spark jobs triggered by `body` (job-group scoped; the listener
    * bus is async, so poll until the count settles). */
  private def countJobs(body: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger
    val group = s"count-${System.nanoTime()}"
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (Option(j.properties.getProperty("spark.jobGroup.id")).contains(group))
          n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    spark.sparkContext.setJobGroup(group, group)
    try body finally spark.sparkContext.clearJobGroup()
    var (prev, settled) = (-1, n.get())
    while (prev != settled) { Thread.sleep(300); prev = settled; settled = n.get() }
    spark.sparkContext.removeSparkListener(l)
    settled
  }

  /** An 8-doc near-dup CHAIN (adjacent j = 60/80 = 0.75, two-apart
    * j = 50/90 ≈ 0.56 < 0.6): propagation needs ~diameter rounds, so a
    * from-scratch rebuild pays many loop jobs that the contracted
    * refresh must not. */
  private val chainBase = words("ch", 72)
  private def chainDoc(i: Int): String =
    chainBase.zipWithIndex.map { case (w, p) =>
      if (p < 8 * i) s"cs$p" else w
    }.mkString(" ")

  test("refreshedClusterLabels: artifact refresh is batch-scale and a cold serve sees it") {
    val oldDir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "inc-old-").toString
    val newDir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "inc-new-").toString
    val chain = (0 until 8).map(i => (i.toLong, chainDoc(i), "en", "s", 100L))
    val batchRows = Seq((100L, chainDoc(7).replace("ch70", "zz70"), "en", "s", 100L))
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    chain.toDF(cols: _*).write.parquet(s"$oldDir/documents.parquet")
    (chain ++ batchRows).toDF(cols: _*).write.parquet(s"$newDir/documents.parquet")

    // build (and persist) the v1 artifacts — the deployment precondition:
    // a corpus under incremental maintenance has its labels AND its
    // signature index/shingle tables materialized (the refresh probes
    // the latter instead of re-reading the corpus text)
    val v1 = labelSet(Dedup.clusterLabels(spark, oldDir))
    Dedup.persistedDedupIndex(spark, oldDir)
    Dedup.persistedShingles(spark, oldDir)
    assert(v1 === (0 until 8).map(i => (i.toLong, 0L)).toSet,
      s"chain must form one cluster labeled 0, got $v1")

    var refreshedLabels: Set[(Long, Long)] = null
    val refreshJobs = countJobs {
      refreshedLabels = labelSet(Dedup.refreshedClusterLabels(spark, oldDir, newDir))
    }
    val refreshRounds = Dedup.lastPropagationRounds.get()
    val scratchJobs = countJobs {
      assert(labelSet(Dedup.minLabelComponents(Dedup.lshEdges(spark, newDir)))
        === refreshedLabels, "refresh must equal the from-scratch label table")
    }
    val scratchRounds = Dedup.lastPropagationRounds.get()
    assert(refreshedLabels.contains((100L, 0L)), "batch doc joins the chain cluster")
    info(s"refresh: $refreshJobs jobs / $refreshRounds propagation rounds; " +
      s"from-scratch: $scratchJobs jobs / $scratchRounds rounds")
    // the scale contract is the LOOP DEPTH: the refresh propagates over
    // the CONTRACTED batch-scale graph (existing components collapsed to
    // their label), so it must converge in fewer rounds than the
    // corpus-wide loop over the full chain. (Total job counts are a
    // constant-factor proxy that path compression invalidated — at this
    // fixture size both paths are dominated by fixed per-call overhead.)
    assert(refreshRounds < scratchRounds,
      s"contracted refresh loop ($refreshRounds rounds) must be shallower than " +
        s"the corpus-wide propagation loop ($scratchRounds rounds)")

    // cold serve: drop only the CATALOG entry (files persist, as after a
    // JVM restart) — d08's serve path must re-register and read the
    // incrementally built table without any build jobs
    spark.sql(s"DROP TABLE IF EXISTS `${graft.sources.Artifacts.Db}`." +
      s"`${Dedup.labelsArtifactName(spark, newDir)}`")
    var coldServed: Set[(Long, Long)] = null
    val serveJobs = countJobs {
      coldServed = labelSet(Dedup.clusterLabels(spark, newDir))
    }
    assert(coldServed === refreshedLabels, "cold serve must see the refreshed labels")
    info(s"cold serve jobs=$serveJobs")
    assert(serveJobs < refreshJobs,
      "serving the refreshed artifact must not rebuild anything")
  }

  test("refreshedClusterLabels reads NO existing text: poisoning the old corpus's " +
      "text (while serving the real artifacts) still yields the exact rebuild labels") {
    import graft.sources.Artifacts
    val oldDir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "poison-old-").toString
    val newDir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "poison-new-").toString
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val oldRows = Seq((10L, docA), (11L, docA2), (20L, docB), (21L, docB2))
      .map { case (i, t) => (i, t, "en", "s", 100L) }
    val batchRows = Seq((100L, docC, "en", "s", 100L)) // bridges A- and B-clusters
    oldRows.toDF(cols: _*).write.parquet(s"$oldDir/documents.parquet")
    (oldRows ++ batchRows).toDF(cols: _*).write.parquet(s"$newDir/documents.parquet")

    // build the v1 artifacts from the REAL text, and the expected result
    Dedup.persistedDedupIndex(spark, oldDir)
    Dedup.persistedShingles(spark, oldDir)
    Dedup.clusterLabels(spark, oldDir)
    val realNames = Seq(Dedup.dedupIndexArtifactName(spark, oldDir),
      Dedup.shingleArtifactName(spark, oldDir), Dedup.labelsArtifactName(spark, oldDir))
    val expected = labelSet(Dedup.minLabelComponents(Dedup.lshEdgesOf(
      (oldRows ++ batchRows).toDF(cols: _*).select($"doc_id", $"text"))))
    assert(Set(10L, 11L, 20L, 21L, 100L).forall(d => expected.contains((d, 10L))),
      s"fixture must merge both clusters through the bridge doc: $expected")

    // poison the old corpus's TEXT in place (same doc_ids, same schema),
    // then alias the real artifact files under the poisoned-fingerprint
    // names — the serve path now behaves as if the artifacts were built
    // from this corpus, but any code path that goes back to the old
    // corpus's TEXT reads garbage and must corrupt the labels
    oldRows.map { case (i, _, l, s, n) => (i, s"poison $i", l, s, n) }
      .toDF(cols: _*).write.mode("overwrite").parquet(s"$oldDir/documents.parquet")
    val poisonedNames = Seq(Dedup.dedupIndexArtifactName(spark, oldDir),
      Dedup.shingleArtifactName(spark, oldDir), Dedup.labelsArtifactName(spark, oldDir))
    assert(realNames.zip(poisonedNames).forall { case (a, b) => a != b },
      "poisoning must change the artifact keys (else this test is vacuous)")
    realNames.zip(poisonedNames).foreach { case (real, poisoned) =>
      val loc = Artifacts.location(spark, real)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      spark.sql(s"CREATE TABLE IF NOT EXISTS `${Artifacts.Db}`.`$poisoned` " +
        s"USING parquet LOCATION '${fs.makeQualified(loc)}'")
    }
    val got = labelSet(Dedup.refreshedClusterLabels(spark, oldDir, newDir))
    assert(got === expected,
      "refresh must consume ONLY the persisted index/shingles/labels — a divergence " +
        "here means some path re-read the (poisoned) existing corpus text")
  }

  test("three chained refreshes with cross-batch and bridging merges equal " +
      "the from-scratch union rebuild") {
    val existing = Seq(10L -> docA, 11L -> docA2, 20L -> docB, 21L -> docB2)
      .toDF("doc_id", "text")
    val b1 = Seq(100L -> docIso).toDF("doc_id", "text")  // isolated on arrival
    val b2 = Seq(101L -> docIso2).toDF("doc_id", "text") // merges with PRIOR batch's doc
    val b3 = Seq(102L -> docC).toDF("doc_id", "text")    // bridges the two v1 clusters
    var corpus = existing
    var labels = Dedup.minLabelComponents(Dedup.lshEdgesOf(existing))
    for (b <- Seq(b1, b2, b3)) {
      labels = Dedup.refreshLabels(corpus, labels, b)
      corpus = corpus.unionAll(b)
    }
    val chained = labelSet(labels)
    val scratch = labelSet(Dedup.minLabelComponents(Dedup.lshEdgesOf(corpus)))
    assert(chained === scratch,
      "chained refreshes must stay exactly equal to a from-scratch rebuild")
    assert(Set(10L, 11L, 20L, 21L, 102L).forall(d => chained.contains((d, 10L))),
      s"round-3 bridge must merge the two v1 clusters: $chained")
    assert(chained.contains((100L, 100L)) && chained.contains((101L, 100L)),
      s"docs isolated in round 1 must pair up in round 2: $chained")
  }

  test("refreshArtifactsAfterAppend: every refreshed family is row-identical " +
      "to a from-scratch rebuild on the appended corpus (r16 verdict task 1)") {
    import graft.sources.Artifacts
    val v1 = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "inc-fam-v1-").toString
    val v2 = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "inc-fam-v2-").toString
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    // ids chosen to exercise every family's split: 10/20/30/100 are eval
    // (%10==0) and 11/21/101 train for contam_; docC bridges the A- and
    // B-clusters for labels_; docIso2 pairs with the isolated docIso
    val v1Rows = Seq(10L -> docA, 11L -> docA2, 20L -> docB, 21L -> docB2,
      30L -> docIso).map { case (i, t) => (i, t, "en", "s", 100L) }
    val batchRows = Seq(100L -> docC, 101L -> docIso2)
      .map { case (i, t) => (i, t, "en", "s", 100L) }
    v1Rows.toDF(cols: _*).write.parquet(s"$v1/documents.parquet")
    (v1Rows ++ batchRows).toDF(cols: _*).write.parquet(s"$v2/documents.parquet")

    val refreshed = Dedup.refreshArtifactsAfterAppend(spark, v1, v2)
    assert(refreshed.map(_._1).toSet ===
      Set("shingles", "h60", "dedupsig", "scored", "edges", "contam", "labels"))
    def rowsOf(tbl: String): Seq[String] =
      spark.table(s"`${Artifacts.Db}`.`$tbl`").collect().map(_.toString).sorted.toSeq
    val incremental = refreshed.map { case (fam, tbl) => fam -> rowsOf(tbl) }.toMap
    // the refresh must have found actual work: batch docs appear in the
    // per-row families and the bridge doc merges the clusters
    assert(incremental("labels").exists(_.contains("[100,10]")),
      s"bridge doc must carry the merged min label: ${incremental("labels")}")

    // from-scratch control: drop every v2 artifact (files + entries),
    // then let the ordinary cold-build path rebuild each family
    refreshed.foreach { case (_, tbl) => Artifacts.dropArtifact(spark, tbl) }
    Dedup.persistedShingles(spark, v2)
    Dedup.persistedH60Shingles(spark, v2)
    Dedup.persistedDedupIndex(spark, v2)
    Dedup.persistedScoredCandidates(spark, v2)
    Dedup.persistedLshEdges(spark, v2)
    Dedup.persistedContamPairs(spark, v2)
    Dedup.clusterLabels(spark, v2)
    refreshed.foreach { case (fam, tbl) =>
      assert(rowsOf(tbl) === incremental(fam),
        s"family '$fam' incremental refresh must equal the from-scratch rebuild")
    }
  }

  // -------------------------------------------------------------------
  // drift-gated centroid refresh: deterministic two-cluster embedding
  // fixture; a same-distribution batch reuses the trained index, a
  // shifted batch forces retraining
  // -------------------------------------------------------------------
  private def vec(center: Array[Float], i: Int): Array[Float] =
    center.zipWithIndex.map { case (c, d) => c + 0.01f * (((i * 7 + d * 3) % 5) - 2) }

  private val c0 = Array(1f, 0f, 0f, 0f)
  private val c1 = Array(0f, 1f, 0f, 0f)
  private val cShift = Array(0f, 0f, 1f, 0f) // ‖c0 − cShift‖ = √2 ≫ 0.3

  private def writeEmb(dir: String, rows: Seq[(Long, Array[Float], Int)]): Unit =
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

  test("refreshedCentroids: same-distribution batch reuses, drifted batch retrains") {
    val oldRows = (0 until 20).map(i => (i.toLong, vec(c0, i), 0)) ++
      (20 until 40).map(i => (i.toLong, vec(c1, i), 1))
    val calmBatch = (100 until 110).map(i => (i.toLong, vec(c0, i), 0)) ++
      (110 until 120).map(i => (i.toLong, vec(c1, i), 1))
    val driftBatch = (200 until 220).map(i => (i.toLong, vec(cShift, i), 0))

    val dirs = (1 to 3).map(_ => java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "inc-emb-").toString)
    writeEmb(dirs(0), oldRows)
    writeEmb(dirs(1), oldRows ++ calmBatch)
    writeEmb(dirs(2), oldRows ++ driftBatch)

    def cents(df: DataFrame): Set[(Long, Seq[Double])] =
      df.select(col("cent_id"), col("ce")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toSet
    val oldCents = cents(Similarity.trainedCentroids(spark, dirs(0)))

    val (calm, calmRebuilt) = Similarity.refreshedCentroids(spark, dirs(0), dirs(1))
    assert(!calmRebuilt, "an un-drifted batch must not trigger retraining")
    assert(cents(calm) === oldCents,
      "the reused index must be byte-identical to the v1 centroids")

    val (shifted, driftRebuilt) = Similarity.refreshedCentroids(spark, dirs(0), dirs(2))
    assert(driftRebuilt, "a cluster that moved √2 must trip the 0.3 gate")
    assert(cents(shifted) !== oldCents,
      "retraining on the drifted corpus must move the centroids")
  }
}
