package graft.tools

import graft.Session
import graft.operators.Dedup

/** Drop the d-chain's served contamination/containment artifacts (pair,
  * audit, and their h60/shingle inputs) for a corpus dir — the cold-
  * warehouse reset the r16 serve proof (tools/run_serve_d_r16.sh)
  * starts from. */
object DropServeArtifacts {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = Session.get("graft-drop-artifacts")
    Dedup.clearContamCache(spark, dir)
    Dedup.clearContAuditCache(spark, dir)
    Dedup.clearScoredCache(spark, dir)
    graft.sources.Artifacts.dropArtifact(spark, Dedup.h60ArtifactName(spark, dir))
    graft.sources.Artifacts.dropArtifact(spark, Dedup.shingleArtifactName(spark, dir))
    println(s"[drop-artifacts] dropped contam/contaud/scored/h60/shingles for $dir")
    spark.stop()
  }
}
