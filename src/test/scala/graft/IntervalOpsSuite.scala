package graft

import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Interval-overlap join (q245): the day-decomposed equi-join formulation
  * must equal a literal sessions × windows interval join replayed on the
  * driver, and the plan must contain NO nested-loop join — that rewrite is
  * the operator's entire scale claim.
  */
class IntervalOpsSuite extends SparkTestBase {

  private val DayNs = 24L * 3600 * 1000 * 1000 * 1000
  private val HourNs = 3600L * 1000 * 1000 * 1000

  test("q245 equals a literal interval-overlap join replay") {
    val rows = Registry.byName("q245_interval_join").q(spark, sf).collect()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // sequential sessionize (30-min gap) per user
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ts = es.map(_._2).sorted
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var s = ts.head; var e = ts.head
      for (t <- ts.tail) {
        if (t - e > 1800L * 1000 * 1000 * 1000) { bounds += ((s, e)); s = t }
        e = t
      }
      bounds += ((s, e))
      bounds.map { case (a, b) => (u, a, b) }
    }
    val d0 = ev.map(_._2).min / DayNs
    val d1 = ev.map(_._2).max / DayNs
    assert(rows.length == (d1 - d0 + 1).toInt, "one row per calendar day")
    for (r <- rows) {
      val day = r.getLong(0)
      val ws = day * DayNs + 2 * HourNs
      val we = day * DayNs + 4 * HourNs
      val hits = sessions.filter { case (_, s, e) => s < we && e >= ws }
        .map { case (u, s, e) =>
          (u, math.min(e + 1, we) - math.max(s, ws)) }
      assert(r.getLong(1) == hits.length.toLong, s"day $day n_sessions")
      assert(r.getLong(2) == hits.map(_._1).distinct.length.toLong,
        s"day $day n_users")
      assert(r.getLong(3) == hits.map(_._2).sum / 1000000L,
        s"day $day overlap_ms")
      assert(r.getLong(4) ==
        (if (hits.isEmpty) 0L else hits.map(_._2).max / 1000000L),
        s"day $day max_overlap_ms")
      hits.foreach { case (_, ov) =>
        assert(ov >= 1L && ov <= 2L * HourNs, "overlap bounded by the window")
      }
    }
  }

  test("q245 plan: equi-join only — no nested-loop interval join") {
    val df = Registry.byName("q245_interval_join").q(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"interval join must not plan a cartesian product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"interval join must decompose to an equi-join, not a BNLJ:\n$plan")
  }
}
