package graft

import graft.mr.{MRRunner, MRSpec, WordCount}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** MR-surface parity with the reference engine's semantics
  * (/root/reference/src/worker.h, mr_tasks.h — see SURVEY.md §2.1):
  * word count over the reference's own test corpus, R output partitions,
  * each key-sorted, every key in exactly one partition, counts exact.
  */
class MRRunnerSuite extends SparkTestBase {

  private val refInput =
    Seq(1, 2, 3).map(i => s"/root/reference/test/input/testdata_$i.txt")
      .filter(f => Files.exists(Paths.get(f)))

  test("word count over the reference corpus matches a naive independent count") {
    assume(refInput.nonEmpty, "reference test corpus not present")
    val lines = spark.read.textFile(refInput: _*)
    val R = 8
    val result = MRRunner.transform(spark, lines, WordCount, R)
    val got = result.collect().map { case (k, v) => (k, v.toLong) }.toMap

    // independent oracle: plain Scala count on the driver
    val expected = spark.read.textFile(refInput: _*).collect()
      .iterator
      .flatMap(WordCount.tokenize)
      .foldLeft(Map.empty[String, Long]) { (m, w) => m.updated(w, m.getOrElse(w, 0L) + 1) }
    assert(got.size == expected.size)
    assert(got == expected)
  }

  test("output has R partitions, each key-sorted, keys disjoint across partitions") {
    assume(refInput.nonEmpty, "reference test corpus not present")
    val lines = spark.read.textFile(refInput: _*)
    val R = 8
    val result = MRRunner.transform(spark, lines, WordCount, R)
    assert(result.rdd.getNumPartitions == R)
    val perPart: Array[Seq[String]] = result.rdd
      .mapPartitions(it => Iterator(it.map(_._1).toSeq))
      .collect()
    assert(perPart.length == R)
    perPart.foreach { keys =>
      assert(keys == keys.sorted, "partition not key-sorted")
      assert(keys.distinct.size == keys.size, "duplicate key within a partition")
    }
    val all = perPart.flatten
    assert(all.distinct.size == all.size, "a key appeared in more than one partition")
  }

  test("full run writes exactly R text files in 'key value' format") {
    assume(refInput.nonEmpty, "reference test corpus not present")
    val out = Files.createTempDirectory("mr_out").toString
    val spec = MRSpec(
      nWorkers = 4,
      workerAddrs = (0 until 4).map(i => s"localhost:500$i"),
      inputFiles = refInput,
      outputDir = out,
      nOutputFiles = 8,
      mapKilobytes = 500,
      userId = "cs6210")
    MRRunner.run(spark, spec)
    val parts = Files.list(Paths.get(out)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("part-")).toSeq
    assert(parts.size == 8, s"expected 8 part files, got $parts")
    val lines = parts.flatMap(p =>
      Files.readAllLines(Paths.get(out, p)).asScala)
    assert(lines.nonEmpty)
    assert(lines.forall(_.matches("\\S+ \\S+")), "sink lines must be 'key value'")
  }

  test("spec INI parse + validation mirrors the reference's checks") {
    val outDir = Files.createTempDirectory("mr_spec_out").toString
    val ini =
      s"""n_workers=2
        |worker_ipaddr_ports=localhost:5000,localhost:5001
        |input_files=/root/reference/test/input/testdata_1.txt
        |output_dir=$outDir
        |n_output_files=4
        |map_kilobytes=500
        |user_id=cs6210""".stripMargin
    val spec = MRSpec.fromIni(ini)
    assert(spec.nWorkers == 2 && spec.nOutputFiles == 4)
    assert(MRSpec.validate(spec).isEmpty)

    assert(MRSpec.validate(spec.copy(nWorkers = 3)).exists(_.contains("n_workers")))
    assert(MRSpec.validate(spec.copy(workerAddrs = Seq("localhost:99999", "x")))
      .exists(_.contains("port")))
    assert(MRSpec.validate(spec.copy(inputFiles = Seq("/no/such/file")))
      .exists(_.contains("missing")))
    assert(MRSpec.validate(spec.copy(mapKilobytes = 0)).nonEmpty)
    assert(MRSpec.validate(spec.copy(userId = "")).nonEmpty)
  }

  test("spec validation probes output-dir writability (mapreduce_spec.h:147-155)") {
    val spec = MRSpec(
      nWorkers = 1,
      workerAddrs = Seq("localhost:5000"),
      inputFiles = refInput.take(1),
      outputDir = "/proc/graft_no_such_writable_dir",
      nOutputFiles = 1,
      mapKilobytes = 500,
      userId = "cs6210")
    assume(refInput.nonEmpty, "reference test corpus not present")
    // /proc: exists-as-dir check passes for /proc itself? use both shapes —
    // a missing dir and an unwritable existing dir must each be rejected
    assert(MRSpec.validate(spec).exists(e =>
      e.contains("not writable") || e.contains("missing or not a directory")))
    assert(MRSpec.validate(spec.copy(outputDir = "/proc"))
      .exists(_.contains("not writable")))
    val ok = Files.createTempDirectory("mr_probe").toString
    assert(!MRSpec.validate(spec.copy(outputDir = ok))
      .exists(e => e.contains("not writable") || e.contains("missing")))
  }

  test("run() restores the session split-size conf it scoped to the job") {
    assume(refInput.nonEmpty, "reference test corpus not present")
    val key = "spark.sql.files.maxPartitionBytes"
    val before = spark.conf.getOption(key)
    spark.conf.set(key, "134217728")
    try {
      val out = Files.createTempDirectory("mr_conf_out").toString
      val spec = MRSpec(
        nWorkers = 2,
        workerAddrs = Seq("localhost:5000", "localhost:5001"),
        inputFiles = refInput.take(1),
        outputDir = out,
        nOutputFiles = 2,
        mapKilobytes = 64,
        userId = "cs6210")
      MRRunner.run(spark, spec)
      // the MR job ran with its own 64 KB split size, but the session conf
      // must come back exactly as it was — later queries in the same session
      // must not inherit the job's split size
      assert(spark.conf.get(key) == "134217728",
        s"run() leaked its split-size override: ${spark.conf.get(key)}")
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("tokenizer matches strtok semantics on the reference delimiters") {
    val toks = WordCount.tokenize("""Hello, world. "it's  a test"""").toSeq
    // strtok(" ,.\"'") splits on every delimiter run, no empty tokens
    assert(toks == Seq("Hello", "world", "it", "s", "a", "test"))
    assert(WordCount.tokenize("").isEmpty)
    assert(WordCount.tokenize(" ,.'\"").isEmpty)
  }

  test("grep job: per-line occurrence counts, overlap-free, selective emission") {
    val g = new graft.mr.Grep("aba")
    // non-overlapping matches only — indexOf advances past the whole pattern
    assert(g.map("7:ababa").iterator.toSeq == Seq("7" -> "1"))
    assert(g.map("7:abaaba xabay").iterator.toSeq.size == 3)
    assert(g.map("7:zzz").iterator.isEmpty, "non-matching line must emit nothing")
    assert(g.map("no separator").iterator.isEmpty)
    assert(g.reduce("7", Seq("1", "1", "1")).iterator.toSeq == Seq("7" -> "3"))
    // the registered q177 matches an independent Scala sweep over the corpus
    import org.apache.spark.sql.functions.col
    val got = graft.queries.Registry.byName("q177_mr_grep").q(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val t = r.getString(1)
        var (i, n) = (t.indexOf("scan"), 0)
        while (i >= 0) { n += 1; i = t.indexOf("scan", i + 4) }
        r.getLong(0) -> n.toLong
      }.filter(_._2 > 0).toMap
    assert(got == direct, "MR grep diverges from the direct substring sweep")
  }
}
