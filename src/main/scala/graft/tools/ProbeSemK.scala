package graft.tools
import graft._
import org.apache.spark.sql.functions._

/** Measures the SemDeDup scale knob: the Σ cell² pair sweep under the
  * fixture's k = IvfCells vs a corpus-sized k on the same embeddings —
  * the demonstration that growing k with the corpus (the published
  * SemDeDup deployment contract, Similarity.trainCentroids) bounds cell
  * population and keeps the sweep linear per decade. Run:
  *   ProbeSemK <sfDir> <k1> [k2 ...]
  */
object ProbeSemK {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata-local/sf1")
    val ks = args.drop(1).map(_.toInt).toSeq match {
      case Nil => Seq(graft.operators.Similarity.IvfCells, 64)
      case s   => s
    }
    val spark = Session.get("probe-semk")
    val S = graft.operators.Similarity
    val emb = Tables.load(spark, dir, "embeddings")
    val n = emb.count()
    println(s"[probe] corpus $dir: $n vectors")
    ks.foreach { k =>
      val t0 = System.nanoTime()
      val cents = S.trainCentroids(emb, k)
      val verdicts = S.semDedup(emb, cents)
      val byStatus = verdicts.groupBy(col("status")).count()
        .orderBy(col("status")).collect()
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")
      val secs = (System.nanoTime() - t0) / 1e9
      // Intrinsic sweep cost is Σ cell² — report it so the wall-clock
      // can be checked against the pair count, not just eyeballed.
      val (maxCell, sumCellSq) = S.semDedupCellSizes(emb, cents)
      println(f"[probe] k=$k%-6d train+sweep $secs%7.2f s  " +
        f"maxCell=$maxCell%d  sumCellSq=$sumCellSq%d  ($byStatus)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
