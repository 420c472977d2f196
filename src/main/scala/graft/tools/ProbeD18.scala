package graft.tools
import graft._
import org.apache.spark.sql.functions._

/** Measures what d18 DECOUPLES from: d07's intrinsic driver is the
  * eval×train hash join's Σ_h dfE(h)·dfT(h) output (ProbeD07: 99.2× per
  * decade on this corpus); d18's candidate stream is bounded by
  * evalDocs·K·dfCap by construction. Prints, per corpus: the exact-join
  * output, d18's candidate count, and each path's qualifying-pair wall —
  * the sf1→sf10 pair the r11 verdict asked for.
  *   ProbeD18 <sfDir> [sfDir ...]
  */
object ProbeD18 {
  def main(args: Array[String]): Unit = {
    val spark = Session.get("probe-d18")
    val D = graft.operators.Dedup
    args.foreach { dir =>
      val docs = Tables.load(spark, dir, "documents")
      val ev = docs.where(col("doc_id") % 10 === 0)
      val train = docs.where(col("doc_id") % 10 =!= 0)
      val e = D.hashed60ShinglesOf(ev)
      val t = D.hashed60ShinglesOf(train)
      val exactOut = e.select(col("doc_id").as("eval_id"), col("h"))
        .join(t.select(col("doc_id").as("train_id"), col("h")), Seq("h")).count()
      val cand = D.contamSketchCandidates(e, t, D.ContamDfCap).count()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val exactPairs = D.contaminationPairs(train, ev).count()
      val exactSec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val t1 = System.nanoTime()
      val sketchPairs = D.contaminationSketchPairs(train, ev).count()
      val sketchSec = (System.nanoTime() - t1) / 1e9
      println(f"[probe] $dir%s  exact-join rows: $exactOut%d  d18 candidates: $cand%d  " +
        f"exact pairs: $exactPairs%d ($exactSec%.1f s)  sketch pairs: $sketchPairs%d ($sketchSec%.1f s)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
