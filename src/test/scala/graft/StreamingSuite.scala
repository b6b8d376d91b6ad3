package graft

import graft.queries.Registry
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming surface vs the equivalent batch operators: the same events must
  * produce the same aggregates whether processed bounded-batch or as a
  * stream (AvailableNow).
  */
class StreamingSuite extends SparkTestBase {

  test("stream hourly counts == batch hourly counts (modulo avg col)") {
    val streamRows = Registry.byName("q29_stream_hourly").q(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val batchRows = Registry.byName("q25_events_hourly").q(spark, sf)
      .select(col("hour_epoch"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(streamRows.toSeq == batchRows.toSeq)
  }

  test("flatMapGroupsWithState sessionize == batch window sessionize (q26)") {
    val s = spark
    import s.implicits._
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.EventRow]
    // run the stateful function through a memory-sink stream over the same data
    val schema = events.schema
    val src = spark.readStream.schema(schema)
      .parquet(s"$sf/events*")
      .as[EventStreams.EventRow]
    val out = EventStreams.sessionize(src)
    spark.streams.active.filter(_.name == "test_sessionize").foreach(_.stop())
    val q = out.writeStream.format("memory").queryName("test_sessionize")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("test_sessionize")
      .groupBy(col("user_id"))
      .agg(max(col("n_sessions")).as("n_sessions"), max(col("n_events")).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Registry.byName("q26_sessionize").q(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batch)
  }
}
