package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage profiler for any SparkEntry query (r15): prints each
  * completed stage's task count, wall, executor CPU, and run time, so
  * "wall ≫ cpu/cores" diagnoses resolve to a NAMED stage instead of a
  * guess. Two timed passes (pass 1 warms JIT + builds artifacts; pass 2
  * is the steady state the bench min reports).
  *
  * Usage: runMain graft.tools.ProbeStages <query> [sfDir] [passes]
  */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "target/testdata-local/sf10full"
    val passes = if (args.length > 2) args(2).toInt else 2
    val spark = graft.Session.get("probe-stages")
    graft.CpuMeter.install(spark)
    @volatile var pass = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val wall = (for (c <- i.completionTime; s <- i.submissionTime) yield (c - s) / 1e3)
          .getOrElse(-1.0)
        val m = i.taskMetrics
        println(f"[stage p$pass] id=${i.stageId}%-4d tasks=${i.numTasks}%-4d " +
          f"wall=$wall%7.2f s cpu=${m.executorCpuTime / 1e9}%8.2f s " +
          f"run=${m.executorRunTime / 1e3}%8.2f s  ${i.name.linesIterator.next()}")
      }
    })
    val fn = graft.SparkEntry.queries(name)
    (1 to passes).foreach { p =>
      pass = p
      val ((n, digest), cpu, _) = graft.CpuMeter.measure(spark) {
        val t0 = System.nanoTime()
        val r = graft.BenchConsume.consume(fn(spark, dir))
        println(f"[probe-stages] $name pass $p wall ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      spark.catalog.clearCache()
      println(f"[probe-stages] $name pass $p cpu $cpu%.3f s ($n rows, digest $digest%016x)")
    }
    spark.stop()
  }
}
