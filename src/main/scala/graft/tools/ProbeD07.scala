package graft.tools
import graft._
import org.apache.spark.sql.functions._

/** Measures d07/d15's INTRINSIC cost driver: the eval×train trigram-hash
  * join's pre-aggregation output is Σ_h dfE(h)·dfT(h) rows — exact
  * contamination must touch every one. Run over several corpora to
  * adjudicate wall-clock growth against intrinsic pair growth:
  *   ProbeD07 <sfDir> [sfDir ...]
  */
object ProbeD07 {
  def main(args: Array[String]): Unit = {
    val spark = Session.get("probe-d07")
    val D = graft.operators.Dedup
    args.foreach { dir =>
      val docs = Tables.load(spark, dir, "documents")
      val ev = docs.where(col("doc_id") % 10 === 0)
      val train = docs.where(col("doc_id") % 10 =!= 0)
      val e = D.hashed60ShinglesOf(ev).select(col("doc_id").as("eval_id"), col("h"))
      val t = D.hashed60ShinglesOf(train).select(col("doc_id").as("train_id"), col("h"))
      val t0 = System.nanoTime()
      val pairs = e.join(t, Seq("h")).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $dir%s  pair-output rows: $pairs%d  ($secs%.1f s)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
