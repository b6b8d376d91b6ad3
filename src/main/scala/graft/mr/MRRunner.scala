package graft.mr

import org.apache.spark.sql.{Dataset, SparkSession}

import scala.collection.mutable.ArrayBuffer

/** The MapReduce pipeline re-expressed as one declarative Spark plan
  * (SURVEY.md §3): scan → flatMap(map) → hash-partition shuffle on key →
  * per-partition key sort → streaming group-runs → reduce → partitioned
  * sorted text sink.
  *
  * Everything the reference implements by hand maps to a Spark facility:
  * sharding (file_shard.h) → FilePartition planning via maxPartitionBytes;
  * M×R intermediate files + master routing (mr_tasks.h, master.h:297) →
  * sort-based shuffle; the map/reduce phase barrier (master.h:243,315) → the
  * stage boundary at the exchange; stragglers/faults (master.h:271-309) →
  * speculation + task retry. We only author the dataflow.
  *
  * Scale: the only shuffle is the single hash repartition on key — the
  * minimum any MapReduce requires. Reduce is streaming (one key's values in
  * memory at a time, like the reference's std::map but without holding the
  * whole partition). Skewed keys spill via UnsafeExternalSorter rather than
  * OOM. For algebraic reducers prefer [[reduceByKeyDF]], which adds map-side
  * partial aggregation the reference never had.
  */
object MRRunner {

  /** Groups a key-sorted iterator into (key, values-of-key) runs without
    * materializing more than one key's values — the reduce-side grouping of
    * /root/reference/src/worker.h:125-152 as a streaming iterator.
    */
  def sortedRuns(it: Iterator[(String, String)]): Iterator[(String, Seq[String])] =
    new Iterator[(String, Seq[String])] {
      private val in = it.buffered
      def hasNext: Boolean = in.hasNext
      def next(): (String, Seq[String]) = {
        val key = in.head._1
        val buf = new ArrayBuffer[String]
        while (in.hasNext && in.head._1 == key) buf += in.next()._2
        key -> buf.toSeq
      }
    }

  /** map → shuffle(R, key) → sort-within-partition → grouped reduce.
    * Output keeps the reference's guarantees: R partitions, each key-sorted,
    * every key in exactly one partition (Murmur3 instead of std::hash — see
    * SURVEY.md §7 gotcha 3: parity is at multiset level, not file bytes).
    */
  def transform(
      spark: SparkSession,
      lines: Dataset[String],
      job: MRJob,
      nOutput: Int): Dataset[(String, String)] = {
    import spark.implicits._
    lines
      .flatMap(job.map _)
      .repartition(nOutput, $"_1")
      .sortWithinPartitions($"_1")
      .mapPartitions(it => sortedRuns(it).flatMap { case (k, vs) => job.reduce(k, vs) })
  }

  /** Full job: spec → text scan → transform → `key value` text sink with
    * exactly R files (mr_tasks.h:109-121's `result_part_<r>` shape).
    */
  def run(spark: SparkSession, spec: MRSpec): Unit = {
    val errs = MRSpec.validate(spec)
    require(errs.isEmpty, s"invalid spec: ${errs.mkString("; ")}")
    val job = JobRegistry.get(spec.userId)
    // map_kilobytes ↔ input split size (file_shard.h:35's M = ceil(kb/map_kb)).
    // The split size is scoped to THIS job: restore the session's previous
    // value afterwards so later queries don't inherit the MR split size.
    val splitKey = "spark.sql.files.maxPartitionBytes"
    val prevSplit = spark.conf.getOption(splitKey)
    spark.conf.set(splitKey, spec.mapKilobytes * 1024L)
    try {
      import spark.implicits._
      val lines = spark.read.textFile(spec.inputFiles: _*)
      transform(spark, lines, job, spec.nOutputFiles)
        .map { case (k, v) => s"$k $v" }
        .write
        .mode("overwrite")
        .text(spec.outputDir)
    } finally prevSplit match {
      case Some(v) => spark.conf.set(splitKey, v)
      case None    => spark.conf.unset(splitKey)
    }
  }

  /** Combiner upgrade path the reference lacks: for associative+commutative
    * reducers, partial-aggregate map-side so the shuffle carries one row per
    * (partition, key) instead of one per emit — the difference between
    * shuffling 100 TB and shuffling the distinct-key set at scale.
    *
    * Takes the map function directly (not an MRJob): the caller-supplied
    * `merge` REPLACES the job's reduce here, and taking the whole job would
    * invite the two to drift silently.
    */
  def reduceByKeyDF(
      spark: SparkSession,
      lines: Dataset[String],
      mapFn: String => IterableOnce[(String, String)],
      merge: (String, String) => String,
      nOutput: Int): Dataset[(String, String)] = {
    import spark.implicits._
    lines
      .flatMap(mapFn)
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, merge(a._2, b._2)))
      .map { case (k, (_, v)) => (k, v) }
      .repartition(nOutput, $"_1")
      .sortWithinPartitions($"_1")
  }
}
