package graft.tools

/** Plan-hygiene sweep: explain every SparkEntry query and flag plan
  * shapes that die at scale — CartesianProduct, BroadcastNestedLoopJoin
  * (legitimate only for the 1-row scalar-join idiom and tiny bounded
  * frames), and zero-partition windows. A human (or PERF.md) reviews
  * the flags; the per-query pins in PlanSpec stay the enforcement. */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Session.get("graft-explain-all")
    val flags = Seq("CartesianProduct", "BroadcastNestedLoopJoin",
      "WindowExec: No Partition Defined")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val verdict =
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          val hits = flags.filter(plan.contains)
          if (hits.isEmpty) "ok" else hits.mkString("FLAG: ", ", ", "")
        } catch { case e: Throwable => s"ERROR: ${e.getMessage.take(120)}" }
      println(f"[explain] $name%-28s $verdict")
    }
    spark.stop()
  }
}
