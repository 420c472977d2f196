package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window}
import org.apache.spark.sql.functions._

/** The bench must measure the plan a CONSUMER of the result pays for
  * (r11 verdict task 4): under bare `count()` Catalyst eliminates
  * cardinality-preserving stages — s12's unique-key verdict join
  * vanished and its r11 bench row timed only the assignment pass.
  * [[BenchConsume]] hashes every output column, which makes elimination
  * illegal; this suite pins that property over EVERY benched query and
  * pins the hazard itself on s12.
  */
class BenchConsumeSpec extends SparkSpec {

  private def stages(p: LogicalPlan): (Int, Int) =
    (p.collect { case j: Join => j }.size,
      p.collect { case w: Window => w }.size)

  test("every benched plan retains the query's joins and windows under BenchConsume") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val (j0, w0) = stages(df.queryExecution.optimizedPlan)
      val (j1, w1) = stages(BenchConsume.consumedFrame(df).queryExecution.optimizedPlan)
      assert(j1 >= j0 && w1 >= w0,
        s"$name: benched plan dropped stages (joins $j0->$j1, windows $w0->$w1)")
    }
  }

  test("the hazard is real: the s12 DERIVATION under bare count() loses its verdict join") {
    // r15 re-pointed this pin: s12_semdedup now SERVES the semv_* artifact
    // (zero joins on both sides, so the served plan can't exhibit the
    // hazard), but the derivation body still carries the left-outer
    // verdict join that count() legally eliminates — the reason
    // BenchConsume hashes every column instead of counting.
    val df = operators.Similarity.s12Derive(spark, sf)
    val (jCount, _) = stages(df.agg(count(lit(1))).queryExecution.optimizedPlan)
    val (jConsume, _) = stages(
      BenchConsume.consumedFrame(df).queryExecution.optimizedPlan)
    assert(jCount < jConsume,
      s"expected count() to elide s12Derive's verdict join ($jCount vs $jConsume) — " +
        "if this starts failing the optimizer stopped eliminating it and the " +
        "r11 PERF.md caveat can be retired")
  }

  test("the served s12 plan is join-free on both sides (the r15 serve-rewrite)") {
    val df = SparkEntry.queries("s12_semdedup")(spark, sf)
    val (jCount, _) = stages(df.agg(count(lit(1))).queryExecution.optimizedPlan)
    val (jConsume, _) = stages(
      BenchConsume.consumedFrame(df).queryExecution.optimizedPlan)
    assert(jCount === 0 && jConsume === 0,
      s"served s12 should read semv_* with zero joins ($jCount/$jConsume)")
  }

  test("digest is order-insensitive and value-sensitive") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val b = Seq((3L, "z"), (1L, "x"), (2L, "y")).toDF("k", "v")
    val c = Seq((1L, "x"), (2L, "y"), (3L, "ZZ")).toDF("k", "v")
    val (na, da) = BenchConsume.consume(a)
    val (nb, db) = BenchConsume.consume(b)
    val (nc, dc) = BenchConsume.consume(c)
    assert(na === 3L && nb === 3L && nc === 3L)
    assert(da === db, "row order must not change the digest (XOR fold)")
    assert(da !== dc, "a changed value must change the digest")
    // empty frame: count 0, digest 0 (bit_xor over nothing is NULL → 0)
    val (ne, de) = BenchConsume.consume(a.where($"k" < 0))
    assert(ne === 0L && de === 0L)
    // MapType columns are hashed via map_entries, not rejected
    val m = Seq((1L, Map("a" -> 1))).toDF("k", "m")
    assert(BenchConsume.consume(m)._1 === 1L)
  }
}
