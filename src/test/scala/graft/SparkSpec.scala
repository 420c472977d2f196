package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session — the
  * suites run in a single forked JVM, so getOrCreate dedupes). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = Session.get("graft-test")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = () // keep the session for the next suite
}
