package graft

import graft.mr.{MRJob, MRRunner}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property tests for the MR surface (SURVEY.md §5 item 4): results are
  * invariant under the output-partition count, word counts conserve tokens,
  * and the streaming group-runs iterator is a faithful groupBy on sorted
  * input. Deterministic seeded generation (scalacheck's forAll bridge for
  * scalatest isn't in the offline cache).
  */
class MRPropertySuite extends AnyFunSuite {

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")

  object Count extends MRJob {
    def map(line: String): IterableOnce[(String, String)] =
      line.split(' ').iterator.filter(_.nonEmpty).map(_ -> "1")
    def reduce(key: String, values: Seq[String]): IterableOnce[(String, String)] =
      Iterator(key -> values.map(_.toLong).sum.toString)
  }

  test("sortedRuns groups a sorted iterator exactly (100 random cases)") {
    val rnd = new Random(42)
    for (_ <- 1 to 100) {
      val pairs = List.fill(rnd.nextInt(50))(
        ("k" + rnd.nextInt(10), rnd.nextInt(1000).toString))
      val sorted = pairs.sortBy(_._1)
      val runs = MRRunner.sortedRuns(sorted.iterator).toSeq
      assert(runs.map(_._1) == runs.map(_._1).distinct.sorted)
      val rebuilt = runs.flatMap { case (k, vs) => vs.map(k -> _) }
      assert(rebuilt.sortBy(p => (p._1, p._2)) == sorted.sortBy(p => (p._1, p._2)))
    }
  }

  test("interval-state sessionize == sort-then-gap reference (200 random cases)") {
    import graft.streaming.EventStreams
    import scala.collection.mutable.ArrayBuffer
    val rnd = new Random(13)
    for (_ <- 1 to 200) {
      val gap = 1 + rnd.nextInt(50)
      val n = 1 + rnd.nextInt(60)
      // clustered timestamps with duplicates and arbitrary arrival order
      val ts = List.fill(n)(rnd.nextInt(500).toLong)
      val buf = ArrayBuffer.empty[EventStreams.SessionInterval]
      ts.foreach(t => EventStreams.mergeEvent(buf, t, gap))
      // reference: sort, count gap-exceeding steps
      val sorted = ts.sorted
      val expectedSessions = 1 + sorted.zip(sorted.tail).count { case (a, b) => b - a > gap }
      assert(buf.length == expectedSessions,
        s"gap=$gap ts=$ts: intervals=${buf.toList} expected $expectedSessions")
      assert(buf.iterator.map(_.n).sum == n.toLong)
      // intervals sorted, disjoint, separated by more than the gap
      buf.toList.sliding(2).foreach {
        case List(a, b) => assert(b.start - a.end > gap)
        case _          => ()
      }
    }
  }

  test("inverted index postings: sorted, distinct, complete, R-invariant") {
    import graft.mr.InvertedIndex
    val s = SparkTestBase.spark
    import s.implicits._
    val rnd = new Random(23)
    val corpus = (0 until 40).map { id =>
      val words = List.fill(1 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
      s"$id:${words.mkString(" ")}"
    }
    val ds = s.createDataset(corpus)
    val r4 = MRRunner.transform(s, ds, InvertedIndex, 4).collect().toMap
    val r9 = MRRunner.transform(s, ds, InvertedIndex, 9).collect().toMap
    assert(r4 == r9, "posting lists must not depend on R")
    // independent reference: word → sorted distinct doc ids
    val expected = corpus.flatMap { line =>
      val Array(id, text) = line.split(":", 2)
      text.split(' ').filter(_.nonEmpty).map(_ -> id.toLong)
    }.groupBy(_._1).map { case (w, ps) =>
      w -> ps.map(_._2).distinct.sorted.mkString(",")
    }
    assert(r4 == expected)
  }

  test("MR result is invariant under R and conserves total token count") {
    val s = SparkTestBase.spark
    import s.implicits._
    val rnd = new Random(7)
    for (_ <- 1 to 5) {
      val corpus = List.fill(30)(
        List.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val ds = s.createDataset(corpus)
      val r4 = MRRunner.transform(s, ds, Count, 4).collect().toMap
      val r7 = MRRunner.transform(s, ds, Count, 7).collect().toMap
      assert(r4 == r7)
      val totalTokens = corpus.iterator.flatMap(_.split(' ')).count(_.nonEmpty)
      assert(r4.values.map(_.toLong).sum == totalTokens)
    }
  }
}
