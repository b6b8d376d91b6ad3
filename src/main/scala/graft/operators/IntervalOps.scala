package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Entry
import graft.{Tables => T}

/** Interval-algebra operators over event-derived intervals — the join
  * family q51 (point-in-interval containment) and q50/q80 (as-of) leave
  * open: INTERVAL × INTERVAL overlap. The scale discipline is the same
  * bin-then-equi-join rewrite every streaming/warehouse engine uses for
  * interval joins: a literal overlap predicate plans a
  * BroadcastNestedLoopJoin (quadratic); decomposing each left interval
  * into the calendar days it touches turns the join into a day-keyed
  * equi-join + residual overlap filter — exact, because two intervals
  * overlap iff they overlap within at least one shared calendar day the
  * left interval touches (windows here are day-contained by
  * construction).
  *
  * Reference scope (JasperWoo/MapReduceCore): no temporal types at all
  * (description.md:70-71 — wordcount only); this is the extension tier's
  * operator family (Integrity.scala:16-19 posture).
  */
object IntervalOps {

  private val HourNs = 3600L * 1000 * 1000 * 1000
  private val DayNs = 24L * 3600 * 1000 * 1000 * 1000
  private val GapNs = 1800L * 1000 * 1000 * 1000 // q26's 30-min session gap

  val entries: Seq[Entry] = Seq(

    // q245: INTERVAL OVERLAP JOIN — user sessions (q26's 30-min-gap
    // sessionize, closed [first_ts, last_ts] at event granularity ⇒
    // half-open [s, e+1ns) for duration math) joined against the daily
    // 02:00–04:00 UTC maintenance window ([ws, we) half-open), per-day
    // impact rollup: how many sessions/users were live inside the window
    // and for how long — the "can we take the maintenance" question.
    // Overlap: s < we AND e ≥ ws; duration = least(e+1, we) −
    // greatest(s, ws) ns (≥ 1 for any match — a single-event session
    // inside the window counts 1 ns, not 0). Session-id arithmetic is
    // tie-safe: only ts DIFFS decide boundaries, so equal-timestamp
    // ordering nondeterminism cannot move a boundary (diff 0 < gap).
    // Plan: ONE user-keyed exchange (sessionize) → sessions exploded into
    // the calendar days they touch (O(session-days) rows — a month-long
    // always-on session costs 30 rows, not a nested loop) → day-keyed equi-join against
    // the 30-row broadcast window dim + residual overlap filter — never a
    // nested-loop interval predicate; the final rollup groups by the
    // 30-day calendar.
    Entry(
      "q245_interval_join",
      (s, d) => {
        val ev = T.events(s, d)
          .select(col("user_id"), col("ts").as("tsn"))
        val wU = Window.partitionBy(col("user_id")).orderBy(col("tsn"))
        val ses = ev
          .withColumn("brk",
            when(col("tsn") - lag(col("tsn"), 1).over(wU) > GapNs
              || lag(col("tsn"), 1).over(wU).isNull, 1L).otherwise(0L))
          .withColumn("sid", sum(col("brk")).over(
            wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("tsn")).as("s"), max(col("tsn")).as("e"))
        val spine = ev.agg(
            expr(s"min(tsn) div $DayNs").as("d0"),
            expr(s"max(tsn) div $DayNs").as("d1"))
          .select(explode(sequence(col("d0"), col("d1"))).as("day"))
        val win = spine
          .select(col("day"),
            (col("day") * DayNs + lit(2L * HourNs)).as("ws"),
            (col("day") * DayNs + lit(4L * HourNs)).as("we"))
        val hits = ses
          .select(col("user_id"), col("s"), col("e"),
            explode(expr(s"sequence(s div $DayNs, e div $DayNs)")).as("day"))
          .join(broadcast(win), Seq("day"))
          .filter(col("s") < col("we") && col("e") >= col("ws"))
          .withColumn("ov",
            least(col("e") + 1, col("we")) - greatest(col("s"), col("ws")))
        val agg = hits.groupBy(col("day"))
          .agg(count(lit(1)).as("n_sessions"),
            countDistinct(col("user_id")).as("n_users"),
            expr("sum(ov) div 1000000L").as("overlap_ms"),
            expr("max(ov) div 1000000L").as("max_overlap_ms"))
        win.select(col("day"))
          .join(agg, Seq("day"), "left")
          .select(col("day"),
            coalesce(col("n_sessions"), lit(0L)).as("n_sessions"),
            coalesce(col("n_users"), lit(0L)).as("n_users"),
            coalesce(col("overlap_ms"), lit(0L)).as("overlap_ms"),
            coalesce(col("max_overlap_ms"), lit(0L)).as("max_overlap_ms"))
          .orderBy(col("day"))
      },
      // Oracle runs the LITERAL interval-overlap join (sessions × windows,
      // no day decomposition) — the two formulations agreeing IS the proof
      // that the bin-then-equi-join rewrite is exact.
      Some("""WITH e AS (SELECT user_id,
             |    CAST(epoch_ns(ts) AS BIGINT) AS tsn FROM events),
             |l AS (SELECT user_id, tsn, lag(tsn) OVER (
             |    PARTITION BY user_id ORDER BY tsn) AS pt FROM e),
             |m AS (SELECT user_id, tsn, CASE WHEN pt IS NULL
             |    OR tsn - pt > 1800000000000 THEN 1 ELSE 0 END AS brk FROM l),
             |sd AS (SELECT user_id, tsn, sum(brk) OVER (
             |    PARTITION BY user_id ORDER BY tsn
             |    ROWS UNBOUNDED PRECEDING) AS sid FROM m),
             |ses AS (SELECT user_id, sid, CAST(min(tsn) AS BIGINT) AS s,
             |    CAST(max(tsn) AS BIGINT) AS e FROM sd GROUP BY 1, 2),
             |b AS (SELECT min(tsn) // 86400000000000 AS d0,
             |    max(tsn) // 86400000000000 AS d1 FROM e),
             |w AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM b),
             |wd AS (SELECT day, day * 86400000000000 + 7200000000000 AS ws,
             |    day * 86400000000000 + 14400000000000 AS we FROM w),
             |j AS (SELECT wd.day, ses.user_id,
             |    least(ses.e + 1, wd.we) - greatest(ses.s, wd.ws) AS ov
             |  FROM ses JOIN wd ON ses.s < wd.we AND ses.e >= wd.ws),
             |ag AS (SELECT day, CAST(count(*) AS BIGINT) AS n_sessions,
             |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             |    CAST(sum(ov) AS BIGINT) // 1000000 AS overlap_ms,
             |    CAST(max(ov) AS BIGINT) // 1000000 AS max_overlap_ms
             |  FROM j GROUP BY 1)
             |SELECT wd.day,
             |  CAST(coalesce(ag.n_sessions, 0) AS BIGINT) AS n_sessions,
             |  CAST(coalesce(ag.n_users, 0) AS BIGINT) AS n_users,
             |  CAST(coalesce(ag.overlap_ms, 0) AS BIGINT) AS overlap_ms,
             |  CAST(coalesce(ag.max_overlap_ms, 0) AS BIGINT)
             |    AS max_overlap_ms
             |FROM wd LEFT JOIN ag USING (day) ORDER BY wd.day""".stripMargin))
  )
}
