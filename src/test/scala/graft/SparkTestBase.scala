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

  /** Flatten an executed plan across AQE wrappers (AdaptiveSparkPlanExec,
    * query stages, reused stages) into every physical node — the typed
    * counterpart of grepping executedPlan.toString, for pins that need
    * node OUTPUT (e.g. exchange schemas), which the string form omits.
    */
  def flattenPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      flattenPlan(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      q +: flattenPlan(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      r +: flattenPlan(r.child)
    case _ => p +: p.children.flatMap(flattenPlan)
  }

  /** All shuffle exchanges of a FULLY EXECUTED df's final adaptive plan. */
  def shuffleExchanges(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec] =
    flattenPlan(df.queryExecution.executedPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }

  /** WindowExec nodes with NO partition spec (global single-partition
    * windows) — the inventory the packing plans must keep at exactly one
    * (the bounded block-prefix cumsum) per plan.
    */
  def unpartitionedWindows(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.window.WindowExec] =
    flattenPlan(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
}
