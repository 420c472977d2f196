package graft.tools
import graft._
import org.apache.spark.sql.functions._
object ProbeD17 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata-local/sf1")
    val spark = Session.get("probe-d17")
    val D = graft.operators.Dedup
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime()-t0)/1e9}%7.2f s  ($r)"); r
    }
    for (round <- 1 to 2) {
      println(s"[probe] --- round $round")
      val docs = D.excerptAugmented(spark, dir).select(col("doc_id"), col("text"))
      val hs = D.hashedShinglesOf(docs)
      t("hashed shingles")(hs.count())
      val cand = D.sketchCandidatesHashed(hs, D.AnchorDfCap)
      t("candidates")(cand.count())
      t("full d17")(D.containmentSketch(docs).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
