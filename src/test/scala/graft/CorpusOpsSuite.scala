package graft

import graft.queries.Registry
import java.security.MessageDigest

/** Property checks for the corpus-curation operators (q110-q113) beyond
  * their oracle gates: redaction completeness, split determinism against an
  * independent JVM md5, and score-shape invariants.
  */
class CorpusOpsSuite extends SparkTestBase {

  test("q110 boilerplate: short docs keep, fully-duplicated docs drop") {
    val rows = Registry.byName("q110_boilerplate_scrub").q(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nGrams, nBoiler, drop) = (r.getLong(1), r.getLong(2), r.getBoolean(3))
      assert(nBoiler <= nGrams, s"doc ${r.getLong(0)}: n_boiler > n_grams")
      if (nGrams == 0) assert(!drop, s"doc ${r.getLong(0)}: gramless doc dropped")
      if (nGrams > 0 && nBoiler == nGrams)
        assert(drop, s"doc ${r.getLong(0)}: fully-boilerplate doc kept")
    }
    // the fixture's near-dup mass guarantees both classes are non-empty —
    // a scrub that drops nothing (or everything) is broken even if typed
    assert(rows.exists(_.getBoolean(3)), "no doc dropped on a corpus with near-dups")
    assert(rows.count(!_.getBoolean(3)) > rows.length / 2, "majority of corpus dropped")
  }

  test("q111 redaction leaves no live PII pattern and exact per-type counts") {
    val rows = Registry.byName("q111_pii_redaction").q(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 2L && r.getLong(2) == 1L && r.getLong(3) == 1L,
        s"doc ${r.getLong(0)}: counts ${(r.getLong(1), r.getLong(2), r.getLong(3))}")
      val red = r.getString(4)
      assert(!red.contains("@example.com") && !red.contains("@mail.net"),
        s"doc ${r.getLong(0)}: live email survived redaction")
      assert(!red.contains("+1-555-"), s"doc ${r.getLong(0)}: live phone survived")
      assert(!red.contains(" 10.0."), s"doc ${r.getLong(0)}: live ip survived")
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>") && red.contains("<IP>"))
    }
  }

  test("q112 split matches an independent JVM md5 and is seed-deterministic") {
    val rows = Registry.byName("q112_split_assign").q(spark, sf).collect()
    assert(rows.nonEmpty)
    val md = MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val id = r.getLong(0)
      val hex = md.digest(s"split:v1:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val expected = java.lang.Long.parseLong(hex.substring(0, 8), 16) % 100
      assert(r.getLong(1) == expected,
        s"doc $id: bucket ${r.getLong(1)} != independent md5 bucket $expected")
      val split = r.getString(2)
      val want =
        if (expected < 80) "train" else if (expected < 90) "val" else "test"
      assert(split == want, s"doc $id: split $split != $want")
    }
    // 80/10/10 within loose binomial tolerance on the 500-doc fixture
    val n = rows.length.toDouble
    val frac = rows.groupBy(_.getString(2)).view.mapValues(_.length / n).toMap
    assert(math.abs(frac.getOrElse("train", 0.0) - 0.8) < 0.08, s"train frac $frac")
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.1) < 0.06, s"val frac $frac")
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.1) < 0.06, s"test frac $frac")
  }

  test("q113 importance: mass bounds, descending order, target docs rank high") {
    val rows = Registry.byName("q113_importance_weights").q(spark, sf).collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2),
        s"doc ${r.getLong(0)}: target_mass > corpus_mass")
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores not descending")
    // the scorer must find the target subset itself more target-like than
    // the corpus at large: src13 docs are ~5% of the corpus but must be
    // over-represented in the top-100 (a flat scorer would put ~5 here)
    val src13 = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("source") === "src13")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hit = rows.count(r => src13.contains(r.getLong(0)))
    assert(hit >= 10, s"only $hit src13 docs in top-100 (expected enrichment)")
  }

  test("plan posture: q110 single gram pass, q113 broadcast+top-k, q120 group-limit") {
    def executed(name: String): String = {
      val df = Registry.byName(name).q(spark, sf)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    // q110: the exploded gram table is planned once — the adaptive FINAL
    // plan echoes the initial one, so scans appear 2× per source read; the
    // window count-per-gram form must keep that at ≤ 2 sources (explode +
    // final doc join), where the aggregate+join form planned 3
    val p110 = executed("q110_boilerplate_scrub")
    val winScans = p110.linesIterator.count(_.contains("Scan parquet"))
    assert(winScans <= 4, s"q110 re-plans its gram subtree: $winScans scan nodes")
    assert(p110.contains("Window"), "q110 lost its count window")
    // q113: bounded feature table broadcast + global top-100 as partial top-k
    val p113 = executed("q113_importance_weights")
    assert(p113.contains("BroadcastHashJoin"), "q113 feature table not broadcast")
    assert(p113.contains("TakeOrderedAndProject"), "q113 top-100 is a full sort")
    // q120: rank-limit window compiles to map-side partial top-k
    val p120 = executed("q120_knn_graph")
    assert(p120.contains("WindowGroupLimit"), "q120 rank window not group-limited")
    // q120: the confirmed pair set is localCheckpointed BEFORE the
    // symmetrizing self-union (the q93/q94/q107 one-materialization idiom),
    // so the plan downstream of the barrier contains ZERO parquet scans —
    // the static-plan form computed the whole q37 upstream twice (48 scans,
    // 0 ReusedExchange, r12 judge audit) and only AQE runtime stage-reuse
    // saved it. A parquet scan reappearing here means the barrier was lost.
    assert(!p120.contains("Scan parquet"),
      "q120 plans its q37 upstream past the localCheckpoint barrier")
  }

  test("q127 hash-only scrub: no exchange carries a string; equals q110 exactly") {
    // the variant's whole claim is WHAT THE SHUFFLE CARRIES: after
    // gh = xxhash64(gram) the gram string must be projected away before
    // every exchange (16 bytes/row on the wire instead of 16 + the ~50-byte
    // verbatim 8-gram)
    val df = Registry.byName("q127_boilerplate_hash").q(spark, sf)
    df.collect()
    val exchanges = shuffleExchanges(df)
    assert(exchanges.nonEmpty, "expected shuffle exchanges in q127")
    exchanges.foreach { e =>
      val strings = e.output.filter(
        _.dataType == org.apache.spark.sql.types.StringType)
      assert(strings.isEmpty,
        s"q127 exchange carries string column(s) ${strings.map(_.name).mkString(",")}")
    }
    // fixture-scale equality with the oracle-exact string form: zero 64-bit
    // gram collisions ⇒ identical output, row for row
    val exact = Registry.byName("q110_boilerplate_scrub").q(spark, sf)
      .collect().toSeq
    assert(df.collect().toSeq == exact, "hash-only scrub diverges from exact form")
  }

  test("q134 two-phase budget selection equals the naive global-window form") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // independent reference: the single corpus-sized global window the
    // two-phase plan exists to avoid (fine at suite fixture scale)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(
        col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        size(array_distinct(col("t"))).cast("long").as("score"))
      .filter(col("n_tokens") > 0)
      .localCheckpoint()
    val w = Window.orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = docs.agg(expr("sum(n_tokens) div 2").as("b"))
    val naive = docs
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .crossJoin(broadcast(budget))
      .filter(col("cum_tokens") <= col("b"))
      .select(col("doc_id"), col("score"), col("n_tokens"), col("cum_tokens"))
      .collect().map(_.toSeq).toSet
    val twoPhase = Registry.byName("q134_token_budget_select").q(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(twoPhase == naive,
      s"extra=${twoPhase.diff(naive).take(3)} missing=${naive.diff(twoPhase).take(3)}")
    assert(naive.nonEmpty, "empty selection — test is vacuous")
  }

  test("q151 split drift: non-negative, small on a random split, no split join") {
    val df = Registry.byName("q151_split_drift").q(spark, sf)
    val r = df.collect().head
    val (vocab, nt, nv) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (tv, vt) = (r.getDouble(3), r.getDouble(4))
    assert(vocab > 0 && nt > 0 && nv > 0)
    // smoothed distributions are both normalized, so KL >= 0 (up to the
    // 1e-12 pico rounding) — a negative reading means the smoothing or
    // normalization broke
    assert(tv >= -1e-9 && vt >= -1e-9, s"negative KL: $tv / $vt")
    // q112's split is seeded-random, so the two distributions must be
    // close: a healthy-split reading that drifts above this bound means
    // the assignment or the count plumbing regressed
    assert(tv < 0.05 && vt < 0.05, s"random split reads drifted: $tv / $vt")
    // both splits' counts come from ONE vocab-keyed aggregate of one scan
    // — a shuffled join appearing means the splits were counted separately
    // and joined back
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("SortMergeJoin") && !physical.contains("ShuffledHashJoin"),
      s"q151 joins the splits instead of conditional-aggregating:\n$physical")
  }

  test("q154 weighted sample: top-k plan, ordered keys, length bias realized") {
    import org.apache.spark.sql.functions.{avg, col}
    val df = Registry.byName("q154_weighted_sample").q(spark, sf)
    val rows = df.collect()
    assert(rows.length == 100)
    val keys = rows.map(_.getDouble(2)).toSeq
    assert(keys == keys.sorted.reverse, "sample not in key order")
    assert(rows.forall(_.getLong(1) > 0), "zero-weight doc selected")
    // weight-proportional sampling must realize its bias: the selected
    // docs' mean length should exceed the corpus mean materially
    val corpusMean = Tables.documents(spark, sf)
      .filter(col("n_chars") > 0)
      .agg(avg(col("n_chars"))).collect().head.getDouble(0)
    val sampleMean = rows.map(_.getLong(1)).sum.toDouble / rows.length
    assert(sampleMean > corpusMean,
      s"length bias not realized: sample $sampleMean vs corpus $corpusMean")
    // global top-k must compile to TakeOrderedAndProject — a full corpus
    // sort appearing here breaks the one-pass claim
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("TakeOrderedAndProject"),
      s"q154 sorts the corpus:\n$physical")
  }

  test("q155 fuzzy match: blocking recall is 1.0 and the catalog broadcasts") {
    import org.apache.spark.sql.functions.col
    val df = Registry.byName("q155_fuzzy_match").q(spark, sf)
    val rows = df.collect()
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == parts.size, "a corrupted row found no candidate")
    rows.foreach { r =>
      val (key, dirty, matched, lev) =
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))
      // single-char deletion ⇒ the true origin is always the best match
      assert(matched == parts(key),
        s"part $key: '$dirty' matched '$matched', origin '${parts(key)}'")
      assert(lev == 1L, s"part $key: expected distance 1, got $lev")
      assert(dirty.length == parts(key).length - 1)
      assert(dirty.head == parts(key).head, "corruption touched the blocking char")
    }
    // the catalog side must broadcast — a shuffled join here would exchange
    // the corpus on a blocking key instead of streaming it map-side
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin") ||
      physical.contains("BroadcastNestedLoopJoin"),
      s"q155 does not broadcast the catalog:\n$physical")
  }

  test("q158 pareto frontier equals the brute-force dominance spec") {
    import org.apache.spark.sql.functions.{array_distinct, col, size, split}
    val scored = Tables.documents(spark, sf)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = scored.filter { case (_, n, sc) =>
      !scored.exists { case (_, n2, s2) =>
        n2 <= n && s2 >= sc && (n2 < n || s2 > sc)
      }
    }.map(t => (t._1, t._2, t._3)).toSet
    val got = Registry.byName("q158_pareto_frontier").q(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute, "two-phase skyline diverges from the dominance spec")
    assert(got.nonEmpty)
  }

  test("q167 epoch shuffle: two-phase positions equal the direct per-shard rank") {
    val rows = Registry.byName("q167_epoch_shuffle").q(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length.toLong == nDocs, "not a permutation: doc count mismatch")
    assert(rows.map(_._1).distinct.length == rows.length, "doc appears twice")
    // every shard's positions are exactly 1..n_shard
    rows.groupBy(_._2).foreach { case (sh, v) =>
      assert(v.map(_._3).sorted.toSeq == (1L to v.length.toLong),
        s"shard $sh: positions not contiguous")
    }
    // direct recompute of the permutation from the seeded hash
    val direct = rows.map { case (id, _, _) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"shuffle:v1:$id".getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
      (id, h)
    }
    val expected = direct.groupBy { case (_, h) => h % 8 }.toSeq.flatMap { case (sh, v) =>
      v.sortBy { case (id, h) => (h, id) }.zipWithIndex
        .map { case ((id, _), i) => (id, sh, i + 1L) }
    }.toSet
    assert(rows.toSet == expected, "shuffle order diverges from the seeded hash spec")
  }

  test("q169 novelty: first-occurrence attribution matches a direct sweep") {
    import org.apache.spark.sql.functions.col
    val rows = Registry.byName("q169_novelty_curve").q(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ", -1).sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toArray.distinct)
    val firstDoc = scala.collection.mutable.Map.empty[String, Long]
    docs.sortBy(_._1).foreach { case (id, gs) =>
      gs.foreach(g => if (!firstDoc.contains(g)) firstDoc(g) = id)
    }
    val perBucket = docs.groupBy(_._1 / 50).map { case (b, ds) =>
      b -> (
        ds.length.toLong,
        ds.map(_._2.length.toLong).sum,
        ds.map { case (id, gs) => gs.count(g => firstDoc(g) == id).toLong }.sum)
    }
    rows.foreach { r =>
      val (b, nd, ng, nn) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(perBucket(b) == ((nd, ng, nn)), s"bucket $b diverges")
      assert(r.getDouble(4) == nn.toDouble / ng.toDouble)
    }
    // the novelty fraction must actually fall across the corpus: the last
    // bucket re-collects content the corpus already has
    assert(rows.last.getDouble(4) < rows.head.getDouble(4),
      "novelty curve is not decreasing end-to-end — fixture assumption broken")
  }

  test("q228 rebalance: conservation, direction, gate, determinism") {
    val rows = graft.queries.Registry.byName("q228_split_rebalance")
      .q(spark, sf).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(3)).sum == rows.map(_.getLong(4)).sum,
      "every shed doc is received exactly once")
    assert(rows.map(_.getLong(1)).sum == rows.map(_.getLong(5)).sum,
      "rebalancing conserves the corpus")
    rows.foreach { r =>
      val (before, target, out, in, after) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(after == before - out + in)
      if (out > 0) assert(before > target, "only over-full splits shed")
      if (in > 0) assert(before < target, "only under-full splits receive")
      assert(!(out > 0 && in > 0), "no split both sheds and receives")
      assert(r.getBoolean(7), s"${r.getString(0)} missed the balance gate")
      assert(math.abs(after - target) <= math.max(3L, target / 100))
    }
    val again = graft.queries.Registry.byName("q228_split_rebalance")
      .q(spark, sf).collect()
    assert(again.map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
  }

  test("q295 water-filling: saturation redistributes; ties to a JVM replay") {
    val sess = spark
    import sess.implicits._
    // one tiny source among giants — the path the near-uniform fixture
    // never exercises: 60% of the total dwarfs the tiny source, so it must
    // CAP at its availability and its shortfall flows to the giants
    val avail = Seq(("tiny", 100L), ("g1", 100000L), ("g2", 200000L),
      ("g3", 400000L))
    val rows = graft.operators.CorpusOps
      .waterfillAlloc(avail.toDF("source", "avail")).collect()
    def isqrt(x: Long): Long = {
      var c = math.sqrt(x.toDouble).toLong + 3
      while (c * c > x) c -= 1
      c
    }
    val b = avail.map(_._2).sum * 6 / 10
    val sw = avail.map(a => isqrt(a._2)).sum
    var alloc = avail.map { case (s, a) =>
      (s, a, isqrt(a), math.min(b * isqrt(a) / sw, a))
    }
    for (_ <- 1 to 2) {
      val lft = b - alloc.map(_._4).sum
      val swu = math.max(alloc.filter(x => x._4 < x._2).map(_._3).sum, 1L)
      alloc = alloc.map { case (s, a, w, al) =>
        (s, a, w, if (al < a) al + math.min(lft * w / swu, a - al) else al)
      }
    }
    rows.foreach { r =>
      val (s, a, w, al) = alloc.find(_._1 == r.getString(0)).get
      assert(r.getLong(1) == a && r.getLong(2) == w, s"$s avail/weight")
      assert(r.getLong(3) == al, s"$s alloc ${r.getLong(3)} != replay $al")
      assert(r.getBoolean(4) == (al == a), s"$s capped flag")
    }
    assert(rows.find(_.getString(0) == "tiny").get.getBoolean(4),
      "the tiny source must saturate")
    assert(alloc.map(_._4).sum <= b, "the budget is a hard ceiling")
    // registered query at sf: allocation bookkeeping holds corpus-wide
    val reg = Registry.byName("q295_token_budget_waterfill")
      .q(spark, sf).collect()
    assert(reg.forall(r => r.getLong(3) <= r.getLong(1)), "alloc <= avail")
    val bReg = reg.map(_.getLong(1)).sum * 6 / 10
    assert(reg.map(_.getLong(3)).sum <= bReg, "corpus budget ceiling")
    assert(reg.head.getLong(6) >= 999000,
      "near-uniform sources must fill ~the whole budget after 3 rounds")
  }
}
