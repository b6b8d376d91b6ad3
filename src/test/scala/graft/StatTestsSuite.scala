package graft

import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Nonparametric drift-test family (q231 KS, q232 MWU): statistics tie to
  * independent brute-force recomputations over collected fixture rows, and
  * the plans keep every window value-domain-partitioned (no corpus-sized
  * global sort anywhere in a rank test — the whole point of the
  * count-table formulation).
  */
class StatTestsSuite extends SparkTestBase {

  test("q231 KS: D matches a brute-force CDF sweep; location is the true argmax") {
    val rows = Registry.byName("q231_ks_drift").q(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = docs.length.toLong
    assert(rows.map(_.getLong(1)).sum == n, "per-source n partitions the corpus")
    rows.take(3).foreach { r =>
      val src = r.getString(0)
      val mine = docs.filter(_._1 == src).map(_._2)
      val rest = docs.filter(_._1 != src).map(_._2)
      val grid = docs.map(_._2).distinct.sorted
      val (n1, n2) = (mine.length.toLong, rest.length.toLong)
      val brute = grid.map { v =>
        math.abs(mine.count(_ <= v) * n2 - rest.count(_ <= v) * n1)
      }.max
      assert(r.getLong(2) == brute * 1000000L / (n1 * n2),
        s"$src d_ppm diverges from the brute CDF sweep")
      val at = grid.filter { v =>
        math.abs(mine.count(_ <= v) * n2 - rest.count(_ <= v) * n1) == brute
      }.min
      assert(r.getLong(3) == at, s"$src ks_at is not the first argmax value")
      assert(r.getBoolean(5) == (r.getLong(2) > r.getLong(4)),
        "drift flag must be the d_ppm/crit_ppm compare")
    }
  }

  test("q232 MWU: U ties to a direct rank-free count; z is symmetric under swap") {
    val rows = Registry.byName("q232_mwu_matrix").q(spark, sf).collect()
    assert(rows.length == 10, "5 event types give 10 unordered pairs")
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.take(2).foreach { r =>
      val a = ev.filter(_._1 == r.getString(0)).map(_._2)
      val b = ev.filter(_._1 == r.getString(1)).map(_._2)
      assert(r.getLong(2) == a.length.toLong && r.getLong(3) == b.length.toLong)
      // 2·U1 counting wins twice, ties once — brute pair sweep
      val u2 = a.iterator.map { x =>
        2L * b.count(_ < x) + b.count(_ == x)
      }.sum
      assert(r.getLong(4) == u2, "u2 diverges from the brute pair count")
      // U1 + U1' = n1·n2: the swapped statistic is determined
      assert(u2 >= 0 && u2 <= 2L * a.length * b.length)
    }
  }

  test("q235 k-anonymity: classes partition the corpus; generalization sums siblings") {
    val rows = Registry.byName("q235_k_anonymity").q(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), expr("n_chars div 200"), col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.map(_.getLong(2)).sum == docs.length.toLong,
      "class sizes must partition the corpus")
    for (r <- rows) {
      val mine = docs.filter(d => d._1 == r.getString(0) && d._2 == r.getLong(1))
      assert(r.getLong(2) == mine.length.toLong, "class_size brute mismatch")
      assert(r.getLong(3) == mine.map(_._3).distinct.length.toLong,
        "l-diversity distinct-sensitive brute mismatch")
      assert(r.getBoolean(4) == (r.getLong(2) >= 5))
      assert(r.getBoolean(5) == (r.getLong(3) >= 3))
      val sibs = docs.filter(d =>
        d._1 == r.getString(0) && d._2 / 2 == r.getLong(1) / 2)
      assert(r.getLong(6) == sibs.length.toLong,
        "generalized class must sum exactly its sibling classes")
      assert(r.getBoolean(7) == (r.getLong(6) >= 5))
    }
    // generalization can only grow a class — the ladder's defining property
    rows.foreach(r => assert(r.getLong(6) >= r.getLong(2)))
  }

  test("stat-test plans: windows stay partitioned; one corpus scan each") {
    for (name <- Seq("q231_ks_drift", "q232_mwu_matrix")) {
      val df = Registry.byName(name).q(spark, sf)
      df.write.format("noop").mode("overwrite").save()
      assert(unpartitionedWindows(df).isEmpty,
        s"$name must not plan a global unpartitioned window")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name must not plan a cartesian product:\n$plan")
      // post-checkpoint plan never re-reads parquet: the single corpus
      // count exchange happened before the barrier
      val scans = flattenPlan(df.queryExecution.executedPlan)
        .count(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
      assert(scans == 0, s"$name re-scans parquet $scans times past the barrier")
    }
  }
}
