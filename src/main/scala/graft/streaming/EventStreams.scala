package graft.streaming

import graft.Tables
import graft.queries.Entry
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Structured Streaming surface over `events`: the same time-series semantics
  * as the batch operators (EventOps), expressed as streams.
  *
  *   - [[hourlyCountsStream]]: readStream → event-time tumbling window agg →
  *     memory sink. q29 runs it with Trigger.AvailableNow over the fixture
  *     parquet, so the driver's batch oracle applies verbatim — the point is
  *     that the SAME aggregation runs unbounded with a watermark in
  *     production.
  *   - [[sessionize]]: custom session state via flatMapGroupsWithState — the
  *     stateful-operator path for semantics window aggs can't express.
  *     Exercised in StreamingSuite against the batch q26 results.
  */
object EventStreams {

  final case class EventRow(event_id: Long, ts: Long, user_id: Long,
                            event_type: String, value: Double)
  final case class SessionAgg(user_id: Long, n_sessions: Long, n_events: Long)
  final case class SessionState(lastTs: Long, nSessions: Long, nEvents: Long)

  private val SessionGapNs = 30L * 60 * 1000 * 1000 * 1000

  /** Event-time hourly tumbling counts as a stream. `ts` arrives as epoch
    * nanos (long); we bucket in exact integer math and aggregate on the
    * bucket — watermarkable via timestamp_micros(bucket) in production (here
    * complete-mode over a bounded source, so results are exact and
    * oracle-comparable).
    */
  def hourlyCountsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // The fixture table is a single FILE; FileStreamSource accepts only a
    // directory or a glob, so address it as the glob `events*` (in production
    // this is the arrival directory the stream tails).
    val src = spark.readStream.schema(schema).parquet(s"$dir/events*")
    val agg = src
      .withColumn(
        "hour_epoch",
        ((col("ts") - pmod(col("ts"), lit(3600L * 1000 * 1000 * 1000))) /
          lit(1000000000L)).cast("long"))
      .groupBy(col("hour_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))

    spark.streams.active.filter(_.name == "graft_stream_hourly").foreach(_.stop())
    val query = agg.writeStream
      .format("memory")
      .queryName("graft_stream_hourly")
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    spark
      .table("graft_stream_hourly")
      .orderBy(col("hour_epoch"), col("event_type"))
  }

  /** Gap-based sessionization with explicit keyed state — one state record
    * per user, event-count and session-count accumulated as batches arrive.
    * With real event-time watermarks you'd time out state via
    * GroupStateTimeout.EventTimeTimeout; the fixture is bounded so state
    * lives for the run.
    *
    * NOTE: exact per-batch session stitching requires events per user to
    * arrive in ts order across batches (guaranteed here: single AvailableNow
    * batch, sorted within group below).
    */
  def sessionize(events: Dataset[EventRow]): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAgg](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts, e.event_id))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val newSession = st.lastTs == Long.MinValue || e.ts - st.lastTs > SessionGapNs
            st = SessionState(
              lastTs = e.ts,
              nSessions = st.nSessions + (if (newSession) 1 else 0),
              nEvents = st.nEvents + 1)
          }
          state.update(st)
          Iterator(SessionAgg(userId, st.nSessions, st.nEvents))
      }
  }

  /** The stateful sessionize as a driver-checked query: stream the fixture
    * through [[sessionize]] with AvailableNow + memory sink; bounded input ⇒
    * results equal the batch q26 oracle exactly.
    */
  def sessionizeStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(s"$dir/events.parquet")
      .select("event_id", "ts", "user_id", "event_type", "value").schema
    val src = spark.readStream.schema(schema).parquet(s"$dir/events*")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventRow]
    spark.streams.active.filter(_.name == "graft_stream_sessions").foreach(_.stop())
    val q = sessionize(src).writeStream
      .format("memory")
      .queryName("graft_stream_sessions")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table("graft_stream_sessions")
      .groupBy(col("user_id")) // one row per user per micro-batch → keep last
      .agg(max(col("n_sessions")).as("n_sessions"), max(col("n_events")).as("n_events"))
      .orderBy(col("user_id"))
  }

  val entries: Seq[Entry] = Seq(
    Entry(
      "q29_stream_hourly",
      hourlyCountsStream,
      Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
             | event_type, count(*) AS n, round(sum(value),2) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    Entry(
      "q63_stream_sessionize",
      sessionizeStream,
      Some("""WITH g AS (
             | SELECT user_id,
             |  CASE WHEN lag(ts) OVER w IS NULL
             |        OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
             |       THEN 1 ELSE 0 END AS new_session
             | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
             | count(*) AS n_events
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin))
  )
}
