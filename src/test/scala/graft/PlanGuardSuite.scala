package graft

import org.apache.spark.sql.catalyst.expressions.{
  BRound, Cast, Ceil, Expression, Floor, Round, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{
  ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType}

import graft.queries.Registry

/** Structural guard over EVERY registered query's analyzed plan (r16
  * verdict #6): Spark casts double→integral by TRUNCATION while DuckDB
  * casts by ROUNDING — the silent cross-engine divergence class behind the
  * r15/r16 q231 incident. A floating value may therefore only reach an
  * integral type through a boundary-safe wrapper: floor / ceil / round /
  * bround (where both engines agree because the wrapped value is already
  * integral-exact), the isqrt idiom being CAST(floor(sqrt(double)) AS
  * BIGINT) + the ±3 correction window. A raw CAST(double AS BIGINT)
  * anywhere in any plan fails this suite at authoring time instead of as a
  * driver-side hash mystery two rounds later.
  */
class PlanGuardSuite extends SparkTestBase {

  private def isIntegral(t: org.apache.spark.sql.types.DataType): Boolean =
    t == LongType || t == IntegerType || t == ShortType || t == ByteType

  private def isFloating(t: org.apache.spark.sql.types.DataType): Boolean =
    t == DoubleType || t == FloatType

  /** Raw floating→integral casts in one expression tree (lambda bodies and
    * nested subquery plans included), minus the blessed wrappers.
    */
  private def badCasts(e: Expression): Seq[Cast] = {
    val buf = scala.collection.mutable.ArrayBuffer[Cast]()
    e.foreach {
      case c: Cast
          if isFloating(c.child.dataType) && isIntegral(c.dataType) =>
        c.child match {
          case _: Floor | _: Ceil | _: Round | _: BRound => // blessed
          case _ => buf += c
        }
      case s: SubqueryExpression => buf ++= badCastsIn(s.plan)
      case _ =>
    }
    buf.toSeq
  }

  private def badCastsIn(plan: LogicalPlan): Seq[Cast] = {
    val buf = scala.collection.mutable.ArrayBuffer[Cast]()
    plan.foreach { node =>
      node.expressions.foreach(ex => buf ++= badCasts(ex))
    }
    buf.toSeq
  }

  test("no query casts double->integral outside floor/ceil/round wrappers") {
    val offenders = Registry.entries.flatMap { e =>
      val bad =
        try badCastsIn(e.q(spark, sf).queryExecution.analyzed)
        catch {
          // a query that cannot CONSTRUCT here is the correctness gate's
          // problem, not this guard's
          case ex: Throwable =>
            fail(s"${e.name}: plan construction failed: ${ex.getMessage}")
        }
      bad.map(c => s"${e.name}: ${c.sql}")
    }
    assert(offenders.isEmpty,
      s"raw double->integral casts found (Spark truncates, DuckDB rounds):\n" +
        offenders.mkString("\n"))
  }
}
