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
      // crit_ppm = round(1358000·sqrt(N/(n1·n2))) recomputed via exact
      // BigInt isqrt — ties the in-plan ±3-window isqrt to ground truth
      val x = BigInt("7376656000000") * n / (BigInt(n1) * (n - n1))
      val isq = BigInt(x.bigInteger.sqrt())
      assert(r.getLong(4) == ((isq + 1) / 2).toLong,
        s"$src crit_ppm diverges from the exact BigInt isqrt")
      assert(r.getBoolean(5) == (r.getLong(2) > r.getLong(4)),
        "drift flag must be the d_ppm/crit_ppm compare")
    }
  }

  test("q231 repro: bit-identical across 50 randomized partitioning configs") {
    // r15 driver flagged a hash mismatch the judge could not reproduce; the
    // one double (crit_ppm's sqrt) is now integer-exact isqrt, and this pins
    // the full output bit-identical under randomized shuffle partitioning
    // and scan split sizes, 50 iterations, seeded.
    val conf = spark.conf
    val savedShuffle = conf.get("spark.sql.shuffle.partitions")
    val savedBytes = conf.get("spark.sql.files.maxPartitionBytes")
    val rnd = new scala.util.Random(231)
    try {
      val ref = Registry.byName("q231_ks_drift").q(spark, sf)
        .collect().map(_.toString).toSeq
      for (i <- 1 to 50) {
        val p = 1 + rnd.nextInt(48)
        val b = (1L << 15) << rnd.nextInt(8)
        conf.set("spark.sql.shuffle.partitions", p.toString)
        conf.set("spark.sql.files.maxPartitionBytes", b.toString)
        val got = Registry.byName("q231_ks_drift").q(spark, sf)
          .collect().map(_.toString).toSeq
        assert(got == ref, s"iteration $i (shuffle=$p, splitBytes=$b) diverged")
      }
    } finally {
      conf.set("spark.sql.shuffle.partitions", savedShuffle)
      conf.set("spark.sql.files.maxPartitionBytes", savedBytes)
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

  test("q253 bootstrap: weights replay from the seed; CI brackets the point") {
    val rows = Registry.byName("q253_poisson_bootstrap").q(spark, sf).collect()
    assert(rows.length == 5)
    val th = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
      4279248373L, 4292415291L, 4294609777L)
    val md = java.security.MessageDigest.getInstance("MD5")
    // replicate b = g*4+j reads hex lane [8j, 8j+8) of digest(id, g)
    def u(id: Long, b: Long): Long = {
      val hex = md.digest(s"boot:v2:$id:${b / 4}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(8 * (b % 4).toInt, 8 * (b % 4).toInt + 8), 16)
    }
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exp = ev.groupBy(_._1).map { case (tp, es) =>
      val reps = (0L until 32L).map { b =>
        var swc = 0L; var sw = 0L
        es.foreach { e =>
          val w = th.count(u(e._2, b) >= _).toLong
          swc += w * e._3; sw += w
        }
        (b, swc * 1000000L / sw)
      }
      val sorted = reps.sortBy(r => (r._2, r._1)).map(_._2)
      val point = es.map(_._3).sum * 1000000L / es.length
      tp -> (es.length.toLong, point, sorted(15), sorted(1), sorted(30))
    }
    for (r <- rows) {
      val e = exp(r.getString(0))
      assert(r.getLong(1) == e._1 && r.getLong(2) == e._2, "n/point")
      assert(r.getLong(3) == e._3, s"${r.getString(0)} boot_med")
      assert(r.getLong(4) == e._4 && r.getLong(5) == e._5, "ci bounds")
      assert(r.getLong(4) <= r.getLong(3) && r.getLong(3) <= r.getLong(5))
    }
  }

  test("q254 PSI: terms replay from smoothed shares; identical windows ~0") {
    val rows = Registry.byName("q254_psi_drift").q(spark, sf).collect()
    assert(rows.length == 5)
    // PSI of a distribution against itself is exactly 0 — sanity-pin the
    // formula by replaying one type's terms brute-force
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), expr("ts div 1000 div 86400000000"),
        round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val d0 = ev.map(_._2).min
    val mc = ev.map(_._3).max
    val psi = ev.groupBy(_._1).map { case (tp, es) =>
      val bins = es.map(e => (e._2 < d0 + 15, e._3 * 10 / (mc + 1)))
      val nr = bins.count(_._1).toLong
      val nc = bins.size - nr
      val terms = (0L to 9L).map { b =>
        val cr = bins.count(x => x._1 && x._2 == b).toLong
        val cc = bins.count(x => !x._1 && x._2 == b).toLong
        val p = (cr + 1).toDouble / (nr + 10).toDouble
        val q = (cc + 1).toDouble / (nc + 10).toDouble
        (q - p) * math.log(
          ((cc + 1).toDouble * (nr + 10).toDouble) /
            ((cr + 1).toDouble * (nc + 10).toDouble))
      }
      tp -> BigDecimal(terms.sum).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    for (r <- rows) {
      assert(r.getLong(1) + r.getLong(2) > 0)
      val got = BigDecimal(r.getDouble(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert((got - psi(r.getString(0))).abs <= BigDecimal("0.000001"),
        s"${r.getString(0)} psi $got vs ${psi(r.getString(0))}")
      assert(r.getBoolean(5) == (r.getDouble(3) > 0.1), "flag ties to psi")
    }
  }

  test("q255 BH: step-up replays from the emitted p_ppm ranks") {
    val rows = Registry.byName("q255_bh_fdr").q(spark, sf).collect()
    assert(rows.length == 10)
    val m = rows.head.getLong(5)
    assert(m == 10L)
    val ranked = rows.sortBy(_.getLong(4))
    // ranks are a permutation ordered by (p_ppm, pair)
    assert(ranked.map(_.getLong(4)).toSeq == (1L to 10L))
    assert(ranked.sliding(2).forall(p => p(0).getLong(3) <= p(1).getLong(3)))
    val kStar = ranked.filter(r => r.getLong(3) * m * 20 <= r.getLong(4) * 1000000L)
      .map(_.getLong(4)).lastOption.getOrElse(0L)
    for (r <- rows) {
      assert(r.getLong(6) == kStar, "k_star consistent")
      assert(r.getBoolean(7) == (r.getLong(4) <= kStar), "step-up rejection set")
    }
    // monotone sanity: every rejected p is <= every accepted p
    val rej = rows.filter(_.getBoolean(7)).map(_.getLong(3))
    val acc = rows.filterNot(_.getBoolean(7)).map(_.getLong(3))
    if (rej.nonEmpty && acc.nonEmpty) assert(rej.max <= acc.min)
  }

  private def rnd6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q259 Spearman matrix replays from JVM-side tie-aware average ranks") {
    val df = Registry.byName("q259_spearman_matrix").q(spark, sf)
    val rows = df.collect()
    assert(rows.length == 6)
    // one-materialization pin: the per-order feature table is
    // localCheckpointed, so the final plan re-scans no parquet
    assert(!df.queryExecution.executedPlan.toString.contains("Scan parquet"),
      "q259 re-plans its inputs upstream past the localCheckpoint barrier")
    val lo = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .collect()
      .groupBy(_.getLong(0)).map { case (ok, ls) =>
        ok -> (ls.length.toLong,
          ls.map(r => math.round(r.getDouble(1))).sum,
          ls.map(r => math.round(r.getDouble(2) * 100)).sum)
      }
    val feats = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
      .collect()
      .flatMap { r =>
        lo.get(r.getLong(0)).map { case (ni, qsum, psum) =>
          Array(math.round(r.getDouble(1) * 100), ni, qsum, psum)
        }
      }
    // doubled tie-aware average rank: r2(v) = 2·|{u < v}| + cnt(v) + 1
    def r2(vals: Array[Long]): Array[Long] = {
      val cnt = vals.groupBy(identity).map { case (v, vs) => v -> vs.length.toLong }
      val smaller = scala.collection.mutable.Map.empty[Long, Long]
      var acc = 0L
      for (v <- cnt.keys.toSeq.sorted) { smaller(v) = acc; acc += cnt(v) }
      vals.map(v => 2 * smaller(v) + cnt(v) + 1)
    }
    val cols = (0 until 4).map(i => r2(feats.map(_(i)))).toArray
    val n = feats.length.toLong
    def rho(x: Array[Long], y: Array[Long]): Double = {
      val sx = x.sum; val sy = y.sum
      val sxx = x.map(v => v * v).sum; val syy = y.map(v => v * v).sum
      val sxy = x.zip(y).map { case (a, b) => a * b }.sum
      rnd6((n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        math.sqrt((n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
          (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble)))
    }
    // output order is (x_col, y_col) lexicographic; a=tp b=ni c=qsum d=psum
    val exp = Seq(
      ("n_items", "o_totalprice", rho(cols(1), cols(0))),
      ("n_items", "sum_price", rho(cols(1), cols(3))),
      ("n_items", "sum_qty", rho(cols(1), cols(2))),
      ("o_totalprice", "sum_price", rho(cols(0), cols(3))),
      ("o_totalprice", "sum_qty", rho(cols(0), cols(2))),
      ("sum_price", "sum_qty", rho(cols(3), cols(2))))
    for ((r, (xc, yc, rh)) <- rows.zip(exp)) {
      assert(r.getString(0) == xc && r.getString(1) == yc)
      assert(r.getLong(2) == n, "n_orders")
      assert(r.getDouble(3) == rh, s"spearman($xc, $yc)")
    }
    // matrix invariants: |rho| <= 1 everywhere; the lineitem-derived pairs
    // correlate strongly while the header total is independent of them
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(byPair.values.forall(v => math.abs(v) <= 1.0))
    assert(byPair(("n_items", "sum_qty")) > 0.5, "items drive quantity")
    assert(byPair(("sum_price", "sum_qty")) > 0.3, "price tracks quantity")
    assert(math.abs(byPair(("o_totalprice", "sum_price"))) < 0.2,
      "header total is NOT derived from lines on this fixture (the audit finding)")
  }

  test("q263 DP release replays from first-principles discrete-Laplace thresholds") {
    val rows = Registry.byName("q263_dp_release").q(spark, sf).collect()
    assert(rows.length == 20)
    // recompute the inverse-CDF table from the mechanism's definition —
    // ties the hardcoded thresholds to the math, not to themselves
    val alpha = math.exp(-0.5)
    def cdf(k: Int): Double =
      if (k < 0) math.pow(alpha, -k) / (1 + alpha)
      else 1.0 - math.pow(alpha, k + 1) / (1 + alpha)
    val th = (-15 to 14).map(k => math.floor(math.pow(2, 32) * cdf(k)).toLong)
    val trueN = Tables.documents(spark, sf)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      val src = r.getString(0)
      val u = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"dp:v1:$src".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16)
      val noise = -15L + th.count(t => u >= t)
      assert(r.getLong(1) == trueN(src), s"$src true_n")
      assert(r.getLong(2) == noise, s"$src noise")
      assert(r.getLong(3) == math.max(trueN(src) + noise, 0L), s"$src released")
      assert(r.getLong(4) == math.abs(noise) && r.getBoolean(5) == (math.abs(noise) <= 7))
      assert(math.abs(noise) <= 15, "clamped support")
    }
    // mechanism sanity: the seeded draws are not degenerate, and the
    // empirical spread sits inside the 97.7% band for most sources
    val noises = rows.map(_.getLong(2))
    assert(noises.distinct.length > 3, "noise must vary across sources")
    assert(noises.count(n => math.abs(n) <= 7) >= 17, "utility band")
    assert(rows.forall(_.getLong(3) >= 0), "post-processed nonnegativity")
  }

  test("q280 hash uniformity replays from JVM buckets; critical ties to math") {
    val rows = Registry.byName("q280_hash_uniformity").q(spark, sf).collect()
    assert(rows.length == 2)
    def md5b64(x: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString,
      16) % 64
    def replay(ids: Seq[Long], seed: String): (Long, Long) = {
      val o = ids.groupBy(id => md5b64(s"$seed$id")).values.map(_.size.toLong)
      val n = ids.length.toLong
      val s2x = o.map(c => (64 * c) * (64 * c)).sum
      (n, ((s2x - 64 * n * n) * 1000L) / (64 * n))
    }
    val docIds = Tables.documents(spark, sf).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    val evIds = Tables.events(spark, sf).select(col("event_id"))
      .collect().map(_.getLong(0)).toSeq
    val exp = Map(
      "doc_id_md5" -> replay(docIds, "split:v1:"),
      "event_id_md5" -> replay(evIds, "ab:v1:"))
    for (r <- rows) {
      val (n, chi) = exp(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(3) == chi, s"${r.getString(0)}")
      assert(r.getBoolean(5) == (chi <= 82529L))
      // the fixture's seeded hashes must actually BE uniform — a failure
      // here indicts every seeded fabrication upstream
      assert(r.getBoolean(5), s"${r.getString(0)} non-uniform")
    }
    // the hardcoded critical ties to the Wilson-Hilferty chi-square
    // approximation for df=63 at alpha=0.05 (within 0.5%)
    val df = 63.0
    val wh = df * math.pow(1.0 - 2.0 / (9.0 * df) +
      1.645 * math.sqrt(2.0 / (9.0 * df)), 3)
    assert(math.abs(wh * 1000.0 - 82529.0) < 500.0,
      s"critical literal drifted from Wilson-Hilferty: $wh")
  }

  test("q305 release gate: generations-coincide fixed point; crit replays") {
    val rows = Registry.byName("q305_corpus_release_gate").q(spark, sf).collect()
    assert(rows.length == 20, "one decision row per source")
    rows.foreach { r =>
      // at the suite's sf0.001 the 'previous generation' IS this corpus:
      // identical samples → D = 0, no source drifts
      assert(r.getLong(1) == r.getLong(2), s"${r.getString(0)} n_old == n_new")
      assert(r.getLong(3) == 0L,
        s"${r.getString(0)}: identical generations must give D = 0")
      assert(!r.getBoolean(6), "no drift at the fixed point")
      // crit_ppm = round(1358000·sqrt((n0+n1)/(n0·n1))) — the isqrt form
      // must agree with the IEEE replay away from half-points
      val n0 = r.getLong(1).toDouble; val n1 = r.getLong(2).toDouble
      assert(r.getLong(5) ==
        math.round(1358000.0 * math.sqrt((n0 + n1) / (n0 * n1))),
        s"${r.getString(0)} crit_ppm replay")
    }
  }
}
