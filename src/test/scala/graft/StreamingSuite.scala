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

  /** Build a multi-batch arrival dir from the fixture: two time-ordered
    * chunks plus two far-future sentinel events (user −1) whose batches push
    * the watermark past all real data. Files get increasing mod times —
    * FileStreamSource orders arrivals by modification time — so with
    * maxFilesPerTrigger=1 each file is one micro-batch. Returns (glob,
    * schema).
    */
  private def arrivalDir(prefix: String): (String, org.apache.spark.sql.types.StructType) = {
    val s = spark
    import s.implicits._
    import java.nio.file.Files
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val maxTs = ev.agg(max("ts")).head().getLong(0)
    val dir = Files.createTempDirectory(prefix).toString
    val mid = ev.agg(expr("percentile(ts, 0.5)")).head().getDouble(0).toLong
    def writeChunk(df: org.apache.spark.sql.DataFrame, name: String, order: Int): Unit = {
      val tmp = s"$dir/${name}_stage"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = new java.io.File(s"$dir/ev_$name.parquet")
      Files.move(part.toPath, target.toPath)
      target.setLastModified(1000000L * order)
    }
    val dayNs = 24L * 3600 * 1000 * 1000 * 1000
    writeChunk(ev.filter(col("ts") <= mid), "c1", 1)
    writeChunk(ev.filter(col("ts") > mid), "c2", 2)
    writeChunk(
      Seq((9000001L, maxTs + dayNs, -1L, "view", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value"), "c3", 3)
    writeChunk(
      Seq((9000002L, maxTs + 2 * dayNs, -1L, "view", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value"), "c4", 4)
    (s"$dir/ev_*.parquet", ev.schema)
  }

  test("stream hourly counts == batch hourly counts (modulo avg col)") {
    val streamRows = Registry.byName("q29_stream_hourly").q(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val batchRows = Registry.byName("q25_events_hourly").q(spark, sf)
      .select(col("hour_epoch"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(streamRows.toSeq == batchRows.toSeq)
  }

  test("watermarked sessionize: state expires via EventTimeTimeout and finals match q26") {
    val s = spark
    import s.implicits._
    val (glob, schema) = arrivalDir("wm_events")
    val src = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(glob)
      .as[EventStreams.EventRow]
    val out = EventStreams.sessionizeWatermarked(src, "0 seconds")
    spark.streams.active.filter(_.name == "test_wm_sessionize").foreach(_.stop())
    val q = out.writeStream.format("memory").queryName("test_wm_sessionize")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // emissions are additive per activity epoch — SUM per user must equal
    // the batch sessionize (here each user happens to close in one epoch,
    // so this also exercises the documented consumption pattern)
    val finals = spark.table("test_wm_sessionize")
      .filter(col("user_id") >= 0)
      .groupBy(col("user_id"))
      .agg(sum(col("n_sessions")).as("s"), sum(col("n_events")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = Registry.byName("q26_sessionize").q(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(finals.toSet == batch,
      s"watermarked finals != batch sessionize (missing: ${batch.diff(finals.toSet).take(5)})")
  }

  test("watermarked hourly agg: closed windows equal the batch aggregate") {
    val (glob, schema) = arrivalDir("wm_hourly")
    val src = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(glob)
    val out = EventStreams.hourlyCountsWatermarked(src, "0 seconds")
    spark.streams.active.filter(_.name == "test_wm_hourly").foreach(_.stop())
    val q = out.writeStream.format("memory").queryName("test_wm_hourly")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // every real-data hour closes below the sentinel-driven watermark; the
    // sentinel hours themselves may or may not have closed — exclude them
    val batch = Registry.byName("q25_events_hourly").q(spark, sf)
      .select(col("hour_epoch"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val maxRealHour = batch.map(_._1).max
    val got = spark.table("test_wm_hourly")
      .filter(col("hour_epoch") <= maxRealHour)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == batch,
      s"closed windows != batch agg (missing: ${batch.diff(got).take(5)})")
  }

  test("q79 stream dedup == q68 == batch aggregate on the bounded fixture") {
    val wm = Registry.byName("q79_stream_dedup_wm").q(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val unbounded = Registry.byName("q68_stream_dedup").q(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(wm == unbounded, "watermarked dedup diverged from unbounded dedup")
  }

  test("dropDuplicatesWithinWatermark: dup suppressed within delay, state expires after") {
    val s = spark
    import s.implicits._
    import java.nio.file.Files
    // four micro-batches (mod-time ordered, maxFilesPerTrigger=1):
    //   b1: id=1 @ t=0        -> emitted (fresh key)
    //   b2: id=1 @ t=1min     -> suppressed (within the 10 min delay)
    //   b3: id=2 @ t=100min   -> emitted; pushes the max event time to 100min
    //   b4: id=3 @ t=101min   -> emitted; runs with watermark 90min, so id=1's
    //                            state (expiry 11min) is evicted by batch end
    //                            (eviction happens at the end of the batch the
    //                            advanced watermark is applied to)
    //   b5: id=1 @ t=102min   -> EMITTED AGAIN: the key's state is gone -- the
    //                            documented WithinWatermark re-admission that
    //                            bounds state where dropDuplicates never would
    val minUs = 60L * 1000 * 1000
    val dir = Files.createTempDirectory("wm_dedup").toString
    def write(rows: Seq[(Long, Long)], name: String, order: Int): Unit = {
      val tmp = s"$dir/${name}_stage"
      rows.toDF("event_id", "ts_us")
        .withColumn("event_time", expr("timestamp_micros(ts_us)"))
        .select("event_id", "event_time")
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      val target = new java.io.File(s"$dir/ev_$name.parquet")
      Files.move(part.toPath, target.toPath)
      target.setLastModified(1000000L * order)
    }
    write(Seq((1L, 0L)), "b1", 1)
    write(Seq((1L, 1 * minUs)), "b2", 2)
    write(Seq((2L, 100 * minUs)), "b3", 3)
    write(Seq((3L, 101 * minUs)), "b4", 4)
    write(Seq((1L, 102 * minUs)), "b5", 5)
    val src = spark.readStream
      .schema(spark.read.parquet(s"$dir/ev_b1.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/ev_*.parquet")
    val out = src.withWatermark("event_time", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    spark.streams.active.filter(_.name == "test_wm_dedup").foreach(_.stop())
    val q = out.writeStream.format("memory").queryName("test_wm_dedup")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("test_wm_dedup")
      .groupBy(col("event_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 1L),
      s"expected id=1 re-admitted after expiry (2 emissions) and the in-delay " +
        s"dup suppressed, got $got")
  }

  test("late bridging event across batches lowers the final session count") {
    val s = spark
    import s.implicits._
    import java.nio.file.Files
    // batch 1: events at t=0 and t=40min → 2 sessions; batch 2 delivers a
    // LATE event at t=20min that merges them into one. n_sessions is
    // non-monotonic, so the final answer must come from the LATEST batch
    // (seq), never max(n_sessions).
    val minNs = 60L * 1000 * 1000 * 1000
    val dir = Files.createTempDirectory("late_bridge").toString
    def write(rows: Seq[(Long, Long, Long, String, Double)], name: String, order: Int): Unit = {
      val tmp = s"$dir/${name}_stage"
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      val target = new java.io.File(s"$dir/ev_$name.parquet")
      Files.move(part.toPath, target.toPath)
      target.setLastModified(1000000L * order)
    }
    write(Seq((1L, 0L, 7L, "view", 0.0), (2L, 40 * minNs, 7L, "view", 0.0)), "b1", 1)
    write(Seq((3L, 20 * minNs, 7L, "view", 0.0)), "b2", 2)
    val src = spark.readStream
      .schema(spark.read.parquet(s"$dir/ev_b1.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/ev_*.parquet")
      .as[EventStreams.EventRow]
    spark.streams.active.filter(_.name == "test_late_bridge").foreach(_.stop())
    val q = EventStreams.sessionize(src).writeStream
      .format("memory").queryName("test_late_bridge")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val emissions = spark.table("test_late_bridge")
      .orderBy(col("seq")).collect()
      .map(r => (r.getLong(3), r.getLong(1), r.getLong(2))) // (seq, n_sessions, n_events)
    assert(emissions.toSeq == Seq((1L, 2L, 2L), (2L, 1L, 3L)),
      s"unexpected emissions: ${emissions.toSeq}")
    // the registered q63 selection (max_by seq) returns the merged count
    val fin = spark.table("test_late_bridge")
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("n_sessions"), col("n_events")), col("seq")).as("last"))
      .select(col("last.n_sessions"), col("last.n_events")).head()
    assert(fin.getLong(0) == 1L && fin.getLong(1) == 3L)
  }

  test("interval-state sessionize handles a hot user and out-of-order arrival") {
    val s = spark
    import s.implicits._
    val gapNs = 30L * 60 * 1000 * 1000 * 1000
    // 100k events for ONE user: runs of 1000 events 1s apart, then a jump
    // past the gap → 100 sessions. Shuffled order: interval state must not
    // depend on arrival order (and must never buffer/sort the batch).
    val nRuns = 100
    val perRun = 1000
    val ts = for {
      r <- 0 until nRuns
      i <- 0 until perRun
    } yield r.toLong * (perRun * 1000000000L + 2 * gapNs) + i * 1000000000L
    val shuffled = new scala.util.Random(7).shuffle(ts.toVector)
    import scala.collection.mutable.ArrayBuffer
    val buf = ArrayBuffer.empty[EventStreams.SessionInterval]
    shuffled.foreach(t => EventStreams.mergeEvent(buf, t, gapNs))
    assert(buf.length == nRuns, s"expected $nRuns sessions, got ${buf.length}")
    assert(buf.iterator.map(_.n).sum == nRuns.toLong * perRun)
    // and through the real streaming operator (single AvailableNow batch)
    val dir = java.nio.file.Files.createTempDirectory("hot_events").toString
    shuffled.zipWithIndex
      .map { case (t, i) => (i.toLong, t, 42L, "view", 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(4).write.parquet(s"$dir/e")
    val src = spark.readStream
      .schema(spark.read.parquet(s"$dir/e").schema)
      .parquet(s"$dir/e")
      .as[EventStreams.EventRow]
    spark.streams.active.filter(_.name == "test_hot_sessionize").foreach(_.stop())
    val q = EventStreams.sessionize(src).writeStream
      .format("memory").queryName("test_hot_sessionize")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val row = spark.table("test_hot_sessionize")
      .groupBy(col("user_id"))
      .agg(max(col("n_sessions")).as("s"), max(col("n_events")).as("n"))
      .head()
    assert(row.getLong(1) == nRuns.toLong && row.getLong(2) == nRuns.toLong * perRun)
  }

  test("flatMapGroupsWithState sessionize == batch window sessionize (q26)") {
    val s = spark
    import s.implicits._
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.EventRow]
    // run the stateful function through a memory-sink stream over the same
    // data. Read with the RAW file schema, then normalize — declaring the
    // normalized Long schema over a TIMESTAMP(MICROS) file would silently
    // read micro longs and break the nano gap math (the production sources
    // in EventStreams use exactly this raw-schema + normalize idiom).
    val rawSchema = spark.read.parquet(s"$sf/events.parquet").schema
    val src = Tables.normalizeEventTs(
      spark.readStream.schema(rawSchema).parquet(s"$sf/events*")
        .select("event_id", "ts", "user_id", "event_type", "value"))
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

  test("q139 streaming ingest: redelivered chunk re-converges, admissions persist") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val root = Dedup.dedupStreamRoot(sf)
    // drain the stream once (build-if-absent inside)
    val acct1 = Registry.byName("q139_stream_ingest").q(spark, sf)
      .collect()(0)
    assert(acct1.getBoolean(0), "expected >= 2 micro-batches")
    val gen1 = graft.sources.Sources.currentGeneration(spark, root)
    val ids1 = spark.read.parquet(s"$gen1/index")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // REDELIVERY of one already-processed chunk (the novel-parity half):
    // a retried foreachBatch turn must re-converge — same index content
    // under a fresh generation, earlier admissions untouched
    val redelivered = Dedup.mixedBatch(spark, sf).filter(col("doc_id") % 2 === 1)
    Dedup.ingestChunk(spark, root, sf, redelivered)
    val gen2 = graft.sources.Sources.currentGeneration(spark, root)
    assert(gen1 != gen2, "retry must publish a FRESH generation name")
    val ids2 = spark.read.parquet(s"$gen2/index")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids2 == ids1, "redelivered chunk must not change the index content")
  }

  test("multi-epoch exactly-once publish: ≥2 epochs, retry no-ops, crash dir invisible") {
    import graft.sources.Sources
    import java.nio.file.Files
    val s = spark
    import s.implicits._
    // two single-file arrival chunks (even/odd event ids) with increasing
    // mod times, so maxFilesPerTrigger=1 delivers exactly two micro-batches
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val dir = Files.createTempDirectory("graft_pub_src").toString
    def writeChunk(df: org.apache.spark.sql.DataFrame, name: String, order: Int): Unit = {
      val tmp = s"$dir/${name}_stage"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = new java.io.File(s"$dir/ev_$name.parquet")
      Files.move(part.toPath, target.toPath)
      target.setLastModified(1000000L * order)
    }
    writeChunk(ev.filter(col("event_id") % 2 === 0), "even", 1)
    writeChunk(ev.filter(col("event_id") % 2 === 1), "odd", 2)
    val root = Files.createTempDirectory("graft_pub_root").toString + "/tbl"
    val src = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/ev_*.parquet")
    spark.streams.active.filter(_.name == "test_epoch_publish").foreach(_.stop())
    val q = src.writeStream
      .queryName("test_epoch_publish")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        Sources.commitEpoch(batch.sparkSession, root, batch, f"epoch-$batchId%09d")
      }
      .start()
    q.awaitTermination()
    val nEvents = ev.count()
    assert(Sources.committedEpochs(spark, root).size == 2,
      "maxFilesPerTrigger=1 over two files must commit two epochs")
    assert(Sources.readEpochs(spark, root).count() == nEvents)
    // SIMULATED RETRY of a committed epoch (redelivery after the manifest
    // swap landed but before the checkpoint recorded it): must NO-OP —
    // no double-append, and the already-published dir is not rewritten
    // (we pass a deliberately DIFFERENT batch; any rewrite would change
    // the union count).
    Sources.commitEpoch(spark, root, ev, "epoch-000000000")
    assert(Sources.committedEpochs(spark, root).size == 2, "retry must not add an epoch")
    assert(Sources.readEpochs(spark, root).count() == nEvents, "retry must not change data")
    // CRASH-BEFORE-SWAP: a dir written but never listed is invisible
    ev.limit(5).write.parquet(s"$root/epoch-000000099")
    assert(Sources.readEpochs(spark, root).count() == nEvents,
      "unlisted epoch dir must be invisible to readers")
    // a genuinely new epoch appends exactly its own rows
    Sources.commitEpoch(spark, root, ev.limit(7), "epoch-000000002")
    assert(Sources.committedEpochs(spark, root).size == 3)
    assert(Sources.readEpochs(spark, root).count() == nEvents + 7)
  }

  test("q176 streaming anomaly monitor emits exactly the batch q153 alerts") {
    // the deployment-equality proof (the q139 pattern): the streamed rollup
    // joined to the history-trained thresholds must flag the SAME hours as
    // the pure-batch detector — row for row, z included
    val streamed = Registry.byName("q176_stream_anomaly")
      .q(spark, sf).collect().map(_.toSeq).toSeq
    val batch = Registry.byName("q153_anomaly_3sigma")
      .q(spark, sf).collect().map(_.toSeq).toSeq
    assert(streamed == batch,
      "streaming monitor diverges from the batch detector on identical data")
    assert(streamed.nonEmpty)
  }

  test("q220 dead letter: counts partition the stream, rerun is idempotent") {
    val rows = Registry.byName("q220_stream_dead_letter").q(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3)).sum == total,
      "first + on-time + late must partition every event")
    assert(rows.map(_.getLong(3)).sum > 0, "fixture jitter must produce late rows")
    val wms = rows.map(_.getLong(5)).distinct
    assert(wms.length == 1, "one frozen watermark across all types")
    rows.foreach { r =>
      assert(r.getLong(4) ==
        r.getLong(3) * 1000000L / math.max(r.getLong(2) + r.getLong(3), 1L))
    }
    // exactly-once accounting: a full redelivery (second run over the same
    // content-keyed dirs) must reproduce identical bytes
    val again = Registry.byName("q220_stream_dead_letter").q(spark, sf).collect()
    assert(again.map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq,
      "rerun diverged -- the sinks are not content-keyed idempotent")
  }

  test("q267 streaming session_window equals the batch native form row-for-row") {
    val streamRows = Registry.byName("q267_stream_session_window")
      .q(spark, sf).collect().map(_.toSeq).toSeq
    val batchRows = Registry.byName("q212_session_window_native")
      .q(spark, sf).collect().map(_.toSeq).toSeq
    assert(streamRows == batchRows,
      "streaming session_window diverged from the batch native sessionize")
    assert(streamRows.nonEmpty)
    // the drained memory table carries raw per-session rows — the streaming
    // session-window machinery actually ran and emitted one row per session
    val sess = spark.table("graft_stream_session")
    assert(sess.columns.toSeq == Seq("user_id", "n_ev", "span_us"))
    // every per-user session count in the drained table matches the final agg
    val perUser = sess.groupBy(col("user_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- Registry.byName("q267_stream_session_window").q(spark, sf).collect())
      assert(perUser(r.getLong(0)) == r.getLong(1), s"user ${r.getLong(0)}")
  }

  test("q294 streaming PII redact equals the batch q284 row-for-row") {
    val streamRows = Registry.byName("q294_stream_pii_redact")
      .q(spark, sf).collect().map(_.toSeq).toSeq
    val batchRows = Registry.byName("q284_pii_redact")
      .q(spark, sf).collect().map(_.toSeq).toSeq
    assert(streamRows == batchRows,
      "streaming redact diverged from the batch scan — the shared-oracle " +
        "parity claim would be vacuous")
    assert(streamRows.nonEmpty && streamRows.exists(_(6).asInstanceOf[Long] > 0),
      "the stream must actually see injected PII")
  }

  test("q304 streaming byte-BPE equals batch q297; artifact learn runs once") {
    val streamRows = Registry.byName("q304_stream_byte_bpe")
      .q(spark, sf).collect().map(_.toSeq).toSeq
    val batchRows = Registry.byName("q297_byte_bpe_encode")
      .q(spark, sf).collect().map(_.toSeq).toSeq
    assert(streamRows == batchRows,
      "streaming byte-BPE encode diverged from the batch form — the " +
        "shared-oracle parity claim would be vacuous")
    // every doc round-trips through the stream too (no-OOV under deployment)
    assert(streamRows.forall(_(5).asInstanceOf[Long] == 0L))
    // the merge artifact published once; a re-run converges and neither
    // re-learns nor republishes (generation dir untouched)
    val root = graft.sources.Sources.scratch(sf, "byte_bpe_merges")
    val gen = graft.sources.Sources.currentGeneration(spark, root)
    val files1 = spark.read.parquet(s"$gen/merges").inputFiles.sorted.toSeq
    val again = Registry.byName("q304_stream_byte_bpe")
      .q(spark, sf).collect().map(_.toSeq).toSeq
    assert(again == streamRows, "stream re-run must converge")
    assert(spark.read.parquet(s"$gen/merges").inputFiles.sorted.toSeq == files1,
      "re-run must not re-learn or rewrite the published merge artifact")
  }
}
