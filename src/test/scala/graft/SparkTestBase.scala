package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared JVM-singleton session for all suites (getOrCreate on the same
  * builder config as every production entry point — Tables.localSession —
  * so tests exercise exactly the session the driver runs).
  */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = Tables.localSession(4)
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

trait SparkTestBase extends AnyFunSuite {
  def spark: SparkSession = SparkTestBase.spark
  def sf: String = SparkTestBase.sf
}
