package graft

import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Corpus-statistics additions (q216-q218): each operator's hashed /
  * fold-based distributed formulation is proven against an independent
  * driver-side brute force over the raw strings.
  */
class TextStatsSuite extends SparkTestBase {

  private lazy val docs: Array[(Long, String, String, String)] =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  test("q216 dup spans equal a brute-force string-gram count per source") {
    val grams = docs.map { case (id, src, _, text) =>
      val t = text.split(" ", -1)
      val gs = (0 to t.length - 8).map(i => t.slice(i, i + 8).mkString(" "))
      (id, src, gs)
    }
    val docsPerGram = grams
      .flatMap { case (id, _, gs) => gs.distinct.map(g => (g, id)) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.length }
    val expect = grams
      .groupBy(_._2)
      .map { case (src, ds) =>
        val total = ds.map(_._3.length.toLong).sum
        val dup = ds.map(_._3.count(g => docsPerGram(g) >= 2).toLong).sum
        src -> ((ds.length.toLong, total, dup))
      }
    val rows = Registry.byName("q216_dup_spans").q(spark, sf).collect()
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (nd, total, dup) = expect(r.getString(0))
      assert(r.getLong(1) == nd, s"${r.getString(0)} n_docs")
      assert(r.getLong(2) == total, s"${r.getString(0)} n_grams")
      assert(r.getLong(3) == dup,
        s"${r.getString(0)} dup_grams ${r.getLong(3)} != brute $dup")
      assert(r.getLong(4) == dup * 1000000L / math.max(total, 1L), "ppm")
    }
  }

  test("q292 ladder equals brute string-grams per (source, L); dup monotone in L") {
    val rows = Registry.byName("q292_dup_resolution_ladder").q(spark, sf)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for (l <- Seq(4, 8, 16, 32)) {
      val grams = docs.map { case (id, src, _, text) =>
        val t = text.split(" ", -1)
        (id, src, (0 to t.length - l).map(i => t.slice(i, i + l).mkString(" ")))
      }
      val docsPerGram = grams
        .flatMap { case (id, _, gs) => gs.distinct.map(g => (g, id)) }
        .groupBy(_._1).map { case (g, xs) => g -> xs.length }
      grams.groupBy(_._2).foreach { case (src, ds) =>
        val total = ds.map(_._3.length.toLong).sum
        val dup = ds.map(_._3.count(g => docsPerGram(g) >= 2).toLong).sum
        val (nPos, dupPos, ppm) = rows((src, l.toLong))
        assert(nPos == total, s"$src L=$l n_pos")
        assert(dupPos == dup, s"$src L=$l dup_pos $dupPos != brute $dup")
        assert(ppm == dup * 1000000L / math.max(total, 1L), s"$src L=$l ppm")
      }
    }
    // a position whose 2L-gram recurs has a recurring L-gram prefix at the
    // same position, so dup_pos can only fall as L doubles
    rows.keys.map(_._1).toSeq.distinct.foreach { src =>
      for (Seq(a, b) <- Seq(4L, 8L, 16L, 32L).sliding(2))
        assert(rows((src, b))._2 <= rows((src, a))._2,
          s"$src dup_pos must be non-increasing from L=$a to L=$b")
    }
  }

  test("q216 rollup after the (gram,doc) barrier plans ZERO parquet re-scans") {
    val df = Registry.byName("q216_dup_spans").q(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    val scans = flattenPlan(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
    assert(scans == 0,
      s"q216 re-scans parquet $scans times after the checkpoint barrier")
  }

  test("q217 sorted-run Sigma-c-squared fold equals word-count arithmetic") {
    val expect = docs.groupBy(_._3).map { case (lang, ds) =>
      val ppms = ds.map { case (_, _, _, text) =>
        val t = text.split(" ", -1)
        val n = t.length.toLong
        val s2 = t.groupBy(identity).values.map(g => g.length.toLong * g.length).sum
        if (n >= 2) (s2 - n) * 1000000L / (n * (n - 1)) else 0L
      }
      lang -> ((ds.length.toLong, ppms.sum / ds.length, ppms.max))
    }
    val rows = Registry.byName("q217_simpson_diversity").q(spark, sf).collect()
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (nd, mean, mx) = expect(r.getString(0))
      assert(r.getLong(1) == nd && r.getLong(2) == mean && r.getLong(3) == mx,
        s"${r.getString(0)}: (${r.getLong(1)},${r.getLong(2)},${r.getLong(3)})" +
          s" != brute ($nd,$mean,$mx)")
    }
  }

  test("q218 vocab overlap equals brute-force set intersection per lang pair") {
    val vocab = docs.groupBy(_._3).map { case (lang, ds) =>
      lang -> ds.flatMap(_._4.split(" ", -1)).toSet
    }
    val rows = Registry.byName("q218_vocab_overlap").q(spark, sf).collect()
    val langs = vocab.keys.toSeq.sorted
    assert(rows.length == langs.combinations(2).size)
    rows.foreach { r =>
      val (va, vb) = (vocab(r.getString(0)), vocab(r.getString(1)))
      assert(r.getLong(2) == va.size.toLong, s"${r.getString(0)} size1")
      assert(r.getLong(3) == vb.size.toLong, s"${r.getString(1)} size2")
      val inter = (va intersect vb).size.toLong
      assert(r.getLong(4) == inter, "intersection")
      assert(r.getLong(5) == inter * 1000000L / (va.size + vb.size - inter),
        "jaccard ppm")
    }
  }

  test("q224 TVD drift equals brute-force distribution arithmetic per source") {
    val bySource = docs.groupBy(_._2)
    val global = docs.groupBy(d => d._4.length / 100).map { case (b, xs) => b -> xs.length.toLong }
    val bigN = docs.length.toLong
    val rows = Registry.byName("q224_distribution_drift").q(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == bigN, "per-source docs partition the corpus")
    rows.foreach { r =>
      val ds = bySource(r.getString(0))
      val n = ds.length.toLong
      val mine = ds.groupBy(d => d._4.length / 100).map { case (b, xs) => b -> xs.length.toLong }
      val l1 = global.map { case (b, m) => math.abs(mine.getOrElse(b, 0L) * bigN - m * n) }.sum
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == l1 * 1000000L / (2 * n * bigN),
        s"${r.getString(0)}: tvd ${r.getLong(2)} != brute")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 1000000L)
    }
  }

  test("q227 QQ calibration equals brute-force count-based deciles") {
    val scores = docs.map { case (_, src, _, text) =>
      src -> text.split(" ", -1).distinct.length.toLong }
    def decile(xs: Seq[Long], k: Int): Long = {
      val sorted = xs.sorted
      val n = sorted.length.toLong
      sorted.zipWithIndex.collectFirst {
        case (v, i) if (i + 1) * 10L >= k * n => v }.get
    }
    val global = scores.map(_._2)
    val rows = Registry.byName("q227_quantile_qq_map").q(spark, sf).collect()
    assert(rows.length == scores.map(_._1).distinct.length * 9)
    rows.foreach { r =>
      val src = r.getString(0)
      val k = r.getLong(1).toInt
      val sq = decile(scores.filter(_._1 == src).map(_._2).toSeq, k)
      val gq = decile(global.toSeq, k)
      assert(r.getLong(2) == sq, s"$src decile $k source_q")
      assert(r.getLong(3) == gq, s"decile $k global_q")
      assert(r.getLong(4) == sq * 1000000L / math.max(gq, 1L))
    }
  }

  test("q241 LOO valuation equals a brute per-source recompute; rank is a permutation") {
    val df = Registry.byName("q241_loo_source_value").q(spark, sf)
    val rows = df.collect()
    // plan pin: the corpus scan happens once, inside the eager 20-row
    // checkpoint — the published plan reads no parquet
    val scans = flattenPlan(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
    assert(scans == 0, s"q241 re-scans parquet $scans times past the barrier")
    val docs = Tables.documents(spark, sf)
      .select(col("source"), split(col("text"), " ").as("t"))
      .select(col("source"), size(col("t")).cast("long").as("n"),
        size(array_distinct(col("t"))).cast("long").as("nd"))
      .collect()
      .map(r => (r.getString(0),
        r.getLong(2) * 1000000L / math.max(r.getLong(1), 1L), r.getLong(1)))
    val total = docs.map(_._2).sum
    val nn = docs.length.toLong
    val overall = total * 1000L / nn
    assert(rows.length == docs.map(_._1).distinct.length)
    for (r <- rows) {
      val src = r.getString(0)
      val mine = docs.filter(_._1 == src)
      assert(r.getLong(1) == mine.length.toLong, s"$src n_docs")
      assert(r.getLong(2) == mine.map(_._3).sum, s"$src tok_mass")
      assert(r.getLong(3) == overall, s"$src overall_mppm")
      val loo = (total - mine.map(_._2).sum) * 1000L /
        math.max(nn - mine.length, 1L)
      assert(r.getLong(4) == loo, s"$src loo_mppm")
      assert(r.getLong(5) == loo - overall, s"$src delta_mppm")
      assert(r.getBoolean(7) == (loo - overall > 0), s"$src harmful")
    }
    val byRank = rows.sortBy(_.getLong(6))
    assert(byRank.map(_.getLong(6)).toSeq == (1L to rows.length.toLong).toSeq,
      "value_rank must be a 1..n permutation")
    assert(byRank.map(_.getLong(5)).toSeq ==
      byRank.map(_.getLong(5)).toSeq.sorted,
      "value_rank must order by delta ascending")
  }

  test("q243 Zipf slope equals a sequential OLS replay; natural-text shape") {
    val rows = Registry.byName("q243_zipf_slope").q(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val counts = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val top = counts.sortBy { case (w, f) => (-f, w) }.take(1000)
    val xy = top.zipWithIndex.map { case ((w, f), i) =>
      (w, f, math.round(math.log((i + 1).toDouble) * 1000000.0),
        math.round(math.log(f.toDouble) * 1000000.0))
    }
    val n = xy.length.toLong
    val sx = xy.map(_._3).sum; val sy = xy.map(_._4).sum
    val sxy = xy.map(t => t._3 * t._4).sum
    val sxx = xy.map(t => t._3 * t._3).sum
    val syy = xy.map(t => t._4 * t._4).sum
    def rd6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val num = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
    val den = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
    assert(r.getLong(0) == n)
    assert(r.getString(1) == xy.head._1, "top_term")
    assert(r.getLong(2) == xy.head._2, "top_freq")
    assert(r.getDouble(3) == rd6(num / den), "slope")
    assert(r.getDouble(4) ==
      rd6(((sy.toDouble - num / den * sx.toDouble) / n.toDouble) / 1000000.0),
      "intercept_ln")
    assert(r.getDouble(5) ==
      rd6(num * num / (den * (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))),
      "r2")
    assert(r.getDouble(3) < 0.0, "Zipf slope must be negative")
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0, "r2 in [0,1]")
  }

  test("q270 corpus datasheet replays from direct JVM corpus statistics") {
    val rows = Registry.byName("q270_corpus_datasheet").q(spark, sf).collect()
    assert(rows.length == 1)
    val docs = Tables.documents(spark, sf)
      .select(col("text"), col("lang"), col("source"), col("n_chars"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    val n = docs.length.toLong
    val r = rows.head
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == docs.map(_._3).distinct.length.toLong, "n_sources")
    assert(r.getLong(2) == docs.map(_._2).distinct.length.toLong, "n_langs")
    assert(r.getLong(3) == docs.map(_._4).sum, "total_chars")
    val tokenLists = docs.map(_._1.split(" ", -1).toSeq)
    val totalTokens = tokenLists.map(_.length.toLong).sum
    assert(r.getLong(4) == totalTokens, "total_tokens")
    val vocab = tokenLists.flatten.distinct.length.toLong
    assert(r.getLong(5) == vocab, "vocab_size")
    assert(r.getLong(6) == vocab * 1000000L / totalTokens, "ttr_ppm")
    assert(r.getLong(7) == docs.map(_._4).sum * 1000L / n, "mean_chars_milli")
    val sorted = docs.map(_._4).sorted
    assert(r.getLong(8) == sorted(((n + 1) / 2 - 1).toInt), "p50_chars")
    val dupDocs = n - docs.map(_._1).distinct.length.toLong
    assert(r.getLong(9) == dupDocs * 1000000L / n, "exact_dup_ppm")
    val lowQ = tokenLists.count { t =>
      val d = t.distinct.length; (t.length - d) * 5 > t.length }.toLong
    assert(r.getLong(10) == lowQ * 1000000L / n, "low_quality_ppm")
    val (topLang, topN) = docs.groupBy(_._2).view.mapValues(_.length.toLong)
      .toSeq.maxBy { case (l, c) => (c, l) }
    assert(r.getString(11) == topLang && r.getLong(12) == topN * 1000000L / n)
    // datasheet sanity: shares are ppm, card coheres
    assert(r.getLong(9) >= 0 && r.getLong(9) <= 1000000L)
    assert(r.getLong(12) * r.getLong(2) >= 1000000L,
      "top lang share must be at least 1/n_langs")
  }
}
