package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft._
import graft.operators.Dedup
import graft.streaming.DedupStream

/** DedupStream at corpus scale (r11 verdict task 7): drive the
  * foreachBatch verdict stream over a REAL corpus split into ≥5 ordered
  * micro-batch triggers, measuring per-trigger wall clock and the
  * stream-side state growth (the parquet index this design keeps INSTEAD
  * of state-store rows — it must grow by exactly one index row + the
  * shingle rows per admitted doc, nothing unbounded), then replay the
  * same split as the sequential batch fold and require verdict equality.
  *
  *   ProbeStream <sfDir> [nBatches=5]
  */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/testdata-local/sf1"
    val nBatches = if (args.length > 1) args(1).toInt else 5
    val spark = Session.get("probe-stream")
    import spark.implicits._

    val docs = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = docs.where(col("doc_id") % Dedup.IncrementalMod =!= 0)
    val streamSide = docs.where(col("doc_id") % Dedup.IncrementalMod === 0)
      .withColumn("b", expr(
        s"(doc_id div ${Dedup.IncrementalMod}) % $nBatches"))
      .collect()
    println(s"[probe-stream] $dir corpus=${corpus.count()} stream=${streamSide.length} batches=$nBatches")

    val base = java.nio.file.Files.createTempDirectory("graft-pstream").toString
    val t0 = System.nanoTime()
    Dedup.withBatchIndex(corpus) { (idx, sh) =>
      idx.write.parquet(s"$base/corpus_index")
      sh.write.parquet(s"$base/corpus_shingles")
    }
    println(f"[probe-stream] corpus index build: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = DedupStream.verdictStream(mem.toDF().toDF("doc_id", "text"),
      spark.read.parquet(s"$base/corpus_index"),
      spark.read.parquet(s"$base/corpus_shingles"),
      s"$base/out", s"$base/ckpt")
    var seen = 0L
    try {
      (0 until nBatches).foreach { i =>
        val batch = streamSide.filter(_.getLong(2) == i)
          .map(r => (r.getLong(0), r.getString(1))).toSeq
        mem.addData(batch: _*)
        val tb = System.nanoTime()
        q.processAllAvailable()
        val wall = (System.nanoTime() - tb) / 1e9
        seen += batch.size
        val idxRows = spark.read.parquet(s"$base/out/stream_index").count()
        val shRows = spark.read.parquet(s"$base/out/stream_shingles").count()
        // state contract: EXACTLY one index row per stream doc seen
        require(idxRows == seen,
          s"stream index must hold one row per admitted doc: $idxRows vs $seen")
        println(f"[probe-stream] trigger $i: ${batch.size}%d docs  $wall%6.1f s  " +
          f"state: index=$idxRows%d shingles=$shRows%d")
      }
    } finally q.stop()

    // the sequential batch fold over the SAME split — verdict equality
    val tf = System.nanoTime()
    def ordinal(c: org.apache.spark.sql.Column) =
      pmod(call_function("div", c.cast("long"), lit(Dedup.IncrementalMod)), lit(nBatches))
    val fold = (0 until nBatches).map { i =>
      Dedup.incrementalDedup(
        docs.where(col("doc_id") % Dedup.IncrementalMod === 0 && ordinal(col("doc_id")) === i),
        docs.where(col("doc_id") % Dedup.IncrementalMod =!= 0 ||
          ordinal(col("doc_id")) < i))
    }.reduce(_ unionAll _)
    def asSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("verdict"), coalesce(col("match_id"), lit(-1L)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val foldSet = asSet(fold)
    val foldSec = (System.nanoTime() - tf) / 1e9
    val streamSet = asSet(spark.read.parquet(s"$base/out/verdicts"))
    println(f"[probe-stream] fold: ${foldSet.size}%d verdicts in $foldSec%.1f s; " +
      f"stream ≡ fold: ${streamSet == foldSet}")
    require(streamSet == foldSet, "stream verdicts must equal the ordered batch fold")
    spark.stop()
  }
}
