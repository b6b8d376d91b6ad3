package graft

import graft.queries.Registry

/** Recall/quality checks for the approximate (oracle-less) dedup and ANN
  * queries against their exact in-repo baselines.
  */
class DedupSimilaritySuite extends SparkTestBase {

  private def rows(name: String): Array[org.apache.spark.sql.Row] =
    Registry.byName(name).q(spark, sf).collect()

  test("q36 MinHash LSH recalls exact 3-shingle-Jaccard near-dups") {
    import org.apache.spark.sql.functions._
    // independent exact baseline: true Jaccard over the SAME similarity q36
    // estimates — 3-token shingles (q37 is word-SET Jaccard, a different
    // measure; comparing those two would be apples-to-oranges).
    val shingles = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(
        col("doc_id"),
        array_distinct(
          transform(
            sequence(lit(0), greatest(size(col("t")) - 3, lit(0))),
            i => concat_ws(" ", slice(col("t"), i + 1, lit(3))))).as("sh"))
    val a = shingles.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = shingles.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    val exact = a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))).cast("double"))
      .withColumn("jac", col("inter") / (size(col("a_sh")) + size(col("b_sh")) - col("inter")))
      .filter(col("jac") >= 0.95)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assume(exact.nonEmpty, "fixture has no exact shingle near-dup pairs")
    val lsh = rows("q36_minhash_lsh")
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall < 0.9 (missed ${exact.diff(lsh)})")
  }

  test("q41 ANN LSH: recall floor AND candidate-fraction budget (vs q40)") {
    val exact = rows("q40_cosine_topk")
      .map(r => (r.getLong(0), r.getLong(2))).toSet // (q_id, n_id)
    val ann = graft.operators.Similarity.annTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(ann.contains).toDouble / exact.size
    assert(recall >= 0.75, s"ANN recall $recall < 0.75")
    // the pruning claim, not just the recall claim: pairs surviving to the
    // exact-cosine stage must be <=25% of the 8x(N-1) brute-force pairs --
    // a fraction near 1 would mean the index re-created the cross join
    val nVec = Tables.embeddings(spark, sf).count()
    val nCand = graft.operators.Similarity.annCandidates(spark, sf).count()
    val frac = nCand.toDouble / (8.0 * (nVec - 1))
    assert(frac <= 0.25, f"ANN candidate fraction $frac%.3f > 0.25")
    // and the registered self-check form agrees on both
    val check = rows("q41_ann_lsh")
    assert(check.length == 1 && check(0).getBoolean(1), "q41 recall_ok is false")
    assert(check(0).getBoolean(2), "q41 cand_ok is false")
  }

  test("q56 IVF ANN beats the LSH recall floor (vs q40)") {
    val exact = rows("q40_cosine_topk")
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = graft.operators.Similarity.ivfTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall < 0.8")
    val check = rows("q56_ann_ivf")
    assert(check.length == 1 && check(0).getBoolean(1), "q56 recall_ok is false")
    // the quantizer trains on a SAMPLE: the training scan carries the
    // hash-mod predicate and yields a strict fraction of the corpus -- the
    // posexplode Lloyd stage must never see the full corpus
    val train = graft.operators.Similarity.ivfTrainingSample(spark, sf)
    assert(train.queryExecution.optimizedPlan.toString.contains("xxhash64"),
      "training subplan lost its sampling filter")
    val nTrain = train.count()
    val nVec = Tables.embeddings(spark, sf).count()
    // mod-2 keeps ~half the corpus (the recall knee on the 500-vector
    // fixture); 60% is the slack-adjusted ceiling for "strictly a sample"
    assert(nTrain > 0 && nTrain <= nVec * 3 / 5,
      s"training sample $nTrain of $nVec is not a strict sample")
  }

  test("pruned pair queries carry no cartesian product in the physical plan") {
    // q36/q37/q55: LSH band equi-join candidates; q39: grid-blocked
    // theta-join. None may plan a CartesianProduct or a broadcast
    // nested-loop join — the all-pairs scale-killers the pruned forms
    // replace. (The brute-force shapes live only in tests and oracles.)
    Seq("q36_minhash_lsh", "q37_wordset_jaccard", "q39_embedding_neardup",
        "q55_ngram_jaccard", "q86_winnow_overlap",
        // r15 pair/fragment queries: rare-shingle-blocked containment,
        // positional dup spans, CDC chunk dedup
        "q219_containment", "q216_dup_spans", "q229_cdc_chunking").foreach { name =>
      val plan = Registry.byName(name).q(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name plans a BNLJ:\n$plan")
    }
  }

  test("q41 candidate dedup shuffles bare id pairs, never the vectors") {
    // the distinct that dedups band-join candidates must key and carry only
    // (q_id, n_id): the r10 form deduped rows still holding both full d-dim
    // vectors, and the ~1 KB-per-row exchange was q41's bimodality suspect.
    // Vectors may re-attach only AFTER the distinct.
    import graft.operators.Similarity
    val plan = Similarity.annCandidates(spark, sf).queryExecution
      .optimizedPlan.toString
    val aggLines = plan.linesIterator.filter(_.contains("Aggregate")).toSeq
    assert(aggLines.nonEmpty, s"no aggregate (distinct) in plan:\n$plan")
    aggLines.foreach { l =>
      assert(!l.contains("_v#") && !l.contains("q_v") && !l.contains("n_v"),
        s"candidate distinct carries a vector column:\n$l")
    }
  }

  test("q94 PQ encodes every vector with exactly one code per subspace") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions._
    val codebook = Similarity.pqCodebook(spark, sf)
    // codebook bounded by construction: ≤ m×ks rows, every codeword 8-dim
    val cb = codebook.collect()
    assert(cb.length <= 8 * 32, s"codebook not bounded: ${cb.length} rows")
    assert(cb.forall(_.getSeq[Double](2).length == 8), "codeword dim != subdim")
    // recall vs brute at the suite fixture — the in-query bound is 0.75;
    // pin the measured 0.925 here with slack so a codebook regression
    // (not just a catastrophe) fails the suite
    val pq = Similarity.pqTopK(spark, sf).select(col("q_id"), col("n_id"))
    val ex = Similarity.bruteTopK(spark, sf).select(col("q_id"), col("n_id"))
    val hit = ex.intersect(pq).count().toDouble
    assert(hit / ex.count() >= 0.85, s"PQ recall regressed: ${hit / ex.count()}")
  }

  test("q94 PQ side plans no cartesian product or BNLJ") {
    // pqTopK only — the registered query wraps it in recallCheck, whose
    // EXACT side is q40's deliberate bounded-probe cross join (8-row build)
    val plan = graft.operators.Similarity.pqTopK(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"q94 plans a cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"q94 plans a BNLJ:\n$plan")
  }

  test("q109 serve plan reads the published artifact with no training stage") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions._
    val serve = Similarity.pqIndexServe(spark, sf)
    val plan = serve.queryExecution.optimizedPlan.toString
    // reads the persisted index, not an in-query codebook (file paths only
    // print in the physical plan's scan locations)
    val physical = serve.queryExecution.executedPlan.toString
    assert(physical.contains("pq_index"), s"serve does not read the artifact:\n$physical")
    // the training chain's signature is the hash-mod sampling filter — a
    // serve plan containing it is retraining per query, the exact gap the
    // artifact exists to close (Lloyd rounds only ever run over the sample)
    assert(!plan.contains("xxhash64"),
      s"serve plan contains the training-sample filter:\n$plan")
    // serving from the artifact loses nothing vs the in-query form
    val fromArtifact = serve.select(col("q_id"), col("n_id"))
    val ex = Similarity.bruteTopK(spark, sf).select(col("q_id"), col("n_id"))
    val hit = ex.intersect(fromArtifact).count().toDouble
    assert(hit / ex.count() >= 0.85, s"artifact-served recall: ${hit / ex.count()}")
    // and the registered self-checks agree
    val build = rows("q108_ann_index_build")
    assert(build.length == 1 && build(0).getBoolean(2), "q108 codebook_ok is false")
    val check = rows("q109_ann_index_serve")
    assert(check.length == 1 && check(0).getBoolean(1), "q109 recall_ok is false")
  }

  test("q91 pigeonhole banding equals brute-force Hamming pairs on the full fixture") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val sigs = Tables.documents(spark, sf)
      .select(col("doc_id"), call_function("simhash64", col("text")).as("sig"))
    val brute = sigs.select(col("doc_id").as("a_id"), col("sig").as("a_sig"))
      .crossJoin(sigs.select(col("doc_id").as("b_id"), col("sig").as("b_sig")))
      .filter(col("a_id") < col("b_id"))
      .withColumn("hamming", bit_count(col("a_sig").bitwiseXOR(col("b_sig"))))
      .filter(col("hamming") <= 3)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .collect().map(_.toSeq).toSet
    val banded = Dedup.simhashPairs(spark, sf).collect().map(_.toSeq).toSet
    assert(banded == brute,
      s"extra=${banded.diff(brute).take(5)} missing=${brute.diff(banded).take(5)}")
    assert(brute.nonEmpty, "fixture yields no Hamming-3 pairs — test is vacuous")
  }

  test("q103 banded phash histogram equals brute-force pairs on the full fixture") {
    import org.apache.spark.sql.functions._
    import graft.operators.Multimodal
    import graft.Tables
    // independent reference: brute N² Hamming over the same stub dHash
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text").cast("binary")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def dhash(n: Long): Long = {
      var h = 0L
      for (r <- 0 until 8; c <- 0 until 8) {
        val i = r * 9 + c
        if ((n * (i + 2)) % 251 > (n * (i + 1)) % 251) h |= 1L << (r * 8 + c)
      }
      h
    }
    val hs = docs.map { case (id, n) => (id, dhash(n)) }
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield d.toLong).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val banded = Multimodal.phashPairs(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(banded == brute, s"banded=$banded brute=$brute")
  }

  test("q87 clusters agree with brute-force union-find over brute pairs") {
    import org.apache.spark.sql.functions._
    // independent reference: exact pairwise Jaccard (cross join, test-only)
    // closed into components by a driver-side union-find
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    val pairs = sets.select(col("doc_id").as("a_id"), col("toks").as("a_toks"))
      .crossJoin(sets.select(col("doc_id").as("b_id"), col("toks").as("b_toks")))
      .filter(col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("a_toks"), col("b_toks"))).cast("double"))
      .filter(col("inter") / (size(col("a_toks")) + size(col("b_toks")) - col("inter")) >= 0.95)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val docs = Tables.documents(spark, sf).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(docs.toIndexedSeq.map(d => d -> d): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = docs.groupBy(find).map { case (root, m) => (root, m.length.toLong) }.toSet
    val got = Registry.byName("q87_neardup_clusters").q(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"cluster mismatch: extra=${got.diff(want)} missing=${want.diff(got)}")
  }

  test("q37/q55/q39 pruned outputs equal their brute-force forms") {
    import org.apache.spark.sql.functions._
    // brute word-set Jaccard (the pre-round-4 q37 shape, now test-only)
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    val bruteWs = sets.select(col("doc_id").as("a_id"), col("toks").as("a_toks"))
      .crossJoin(sets.select(col("doc_id").as("b_id"), col("toks").as("b_toks")))
      .filter(col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("a_toks"), col("b_toks"))).cast("double"))
      .withColumn("jac", col("inter") / (size(col("a_toks")) + size(col("b_toks")) - col("inter")))
      .filter(col("jac") >= 0.95)
      .select(col("a_id"), col("b_id"), round(col("jac"), 4).as("jac"))
      .collect().map(_.toSeq).toSet
    assert(rows("q37_wordset_jaccard").map(_.toSeq).toSet == bruteWs)

    val grams = Tables.documents(spark, sf).select(
      col("doc_id"),
      expr("array_distinct(transform(sequence(1, greatest(length(text)-2, 1)), i -> substr(text, i, 3)))").as("g"))
    val bruteNg = grams.select(col("doc_id").as("a_id"), col("g").as("a_g"))
      .crossJoin(grams.select(col("doc_id").as("b_id"), col("g").as("b_g")))
      .filter(col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("a_g"), col("b_g"))).cast("double"))
      .withColumn("jac", col("inter") / (size(col("a_g")) + size(col("b_g")) - col("inter")))
      .filter(col("jac") >= 0.9)
      .select(col("a_id"), col("b_id"), round(col("jac"), 4).as("jac"))
      .collect().map(_.toSeq).toSet
    assert(rows("q55_ngram_jaccard").map(_.toSeq).toSet == bruteNg)

    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val bruteCos = vecs.select(col("vec_id").as("a_id"), col("v").as("a_v"))
      .crossJoin(vecs.select(col("vec_id").as("b_id"), col("v").as("b_v")))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", call_function("cosine_sim", col("a_v"), col("b_v")))
      .filter(col("cos") >= 0.4)
      .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos"))
      .collect().map(_.toSeq).toSet
    assert(rows("q39_embedding_neardup").map(_.toSeq).toSet == bruteCos)
  }

  test("first-shared-band candidates equal the distinct form (and per-pair uniqueness)") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    // the dedup-free emission (first_agree_idx == joined band index) must
    // produce EXACTLY the candidate set the `.distinct()` form produces —
    // same pairs, and each pair exactly once
    val withBands = Tables.documents(spark, sf)
      .select(
        col("doc_id"),
        call_function(
          "bands_from_sig",
          call_function("minhash_sig", col("text"), lit(32), lit(1)),
          lit(2)).as("bands"))
    val viaDistinct = Dedup.bandCandidates(
      withBands.select(col("doc_id"), explode(col("bands")).as("band")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaFirstShared = Dedup.bandCandidatesNoDistinct(withBands)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaFirstShared.length == viaFirstShared.distinct.length,
      "first-shared-band emission produced a duplicate pair")
    assert(viaFirstShared.toSet == viaDistinct.toSet,
      s"extra=${viaFirstShared.toSet.diff(viaDistinct.toSet).take(5)} " +
        s"missing=${viaDistinct.toSet.diff(viaFirstShared.toSet).take(5)}")
    assert(viaDistinct.nonEmpty, "fixture yields no band candidates — test is vacuous")
  }

  test("q38 simhash: exact duplicates get identical signatures") {
    import org.apache.spark.sql.functions._
    val df = Tables.documents(spark, sf)
      .select(col("doc_id"), call_function("simhash64", col("text")).as("sh"),
        xxhash64(col("text")).as("xh"))
    // group by exact text hash: all members of a text-equal group must share simhash
    val bad = df.groupBy(col("xh"))
      .agg(countDistinct(col("sh")).as("n"))
      .filter(col("n") > 1)
      .count()
    assert(bad == 0)
  }

  test("q35 exact dedup keeps one representative per distinct text") {
    val n = rows("q35_dedup_exact").length
    val distinctTexts = Tables.documents(spark, sf).select("text").distinct().count()
    assert(n.toLong == distinctTexts)
  }

  test("q35 exchange is keyed on the 8-byte hash alone, never the text") {
    // every Exchange hashpartitioning key set in the main path must be hash/
    // id columns — a text-typed partitioning key would mean the full
    // document rides the exchange key again (the pre-r12 shape)
    val plan = Registry.byName("q35_dedup_exact").q(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, s"no hash exchange in q35 plan:\n$plan")
    exchanges.foreach { l =>
      assert(!l.contains("text#"),
        s"q35 exchange carries text in its partitioning key:\n$l")
    }
  }

  test("q35 collision residual branch regroups colliding hashes exactly") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val doubled = docs.union(docs.select(col("doc_id") + 1000000L, col("text")))
    // a 3-bucket "hash" makes nearly every h-group a multi-text collision —
    // the residual branch must still produce exactly one row per distinct
    // text with the true min id and copy count (here: 2 copies each)
    val got = Dedup.dedupExactOn(doubled, t => pmod(xxhash64(t), lit(3L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = doubled.groupBy(col("text"))
      .agg(min(col("doc_id")).as("k"), count(lit(1)).as("n"))
      .select(col("k"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want,
      s"extra=${got.diff(want).take(5)} missing=${want.diff(got).take(5)}")
  }

  test("index generation names are never reused; delete is idempotent; GC spares current") {
    import graft.operators.Similarity
    // nextGen: monotone fresh names from any current-generation basename
    assert(Similarity.nextGen("/r/gen-build", "gen-upd-") == "gen-upd-1")
    assert(Similarity.nextGen("/r/gen-upd-7", "gen-upd-") == "gen-upd-8")
    assert(Similarity.nextGen("/r/gen-upd-7", "gen-del-") == "gen-del-1")
    assert(Similarity.nextGen("/r/gen-del-3", "gen-del-") == "gen-del-4")
    // delete lifecycle on its own root: two runs converge to the same
    // artifact CONTENT under fresh generation names (never an in-place
    // rewrite of the published dir)
    val root = Similarity.pqIndexDelRoot(sf)
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(rp)) fs.delete(rp, true)
    Similarity.pqIndexDelete(spark, sf)
    val gen1 = graft.sources.Sources.currentGeneration(spark, root)
    val rows1 = spark.read.parquet(s"$gen1/codes").count()
    Similarity.pqIndexDelete(spark, sf)
    val gen2 = graft.sources.Sources.currentGeneration(spark, root)
    assert(gen1 != gen2, "re-delete must publish a FRESH generation name")
    assert(fs.exists(new org.apache.hadoop.fs.Path(gen1)),
      "previous generation must survive until GC (readers may be mid-scan)")
    assert(spark.read.parquet(s"$gen2/codes").count() == rows1,
      "delete must be idempotent by content")
    // GC with ttl 0 removes every superseded dir, never the current one
    val removed = Similarity.pqIndexGc(spark, root, ttlMs = 0L)
    assert(removed >= 1, "expected at least the superseded generation swept")
    assert(fs.exists(new org.apache.hadoop.fs.Path(gen2)), "GC removed the CURRENT generation")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(gen1)), "superseded generation not swept")
    assert(spark.read.parquet(s"$gen2/codes").count() == rows1, "served index damaged by GC")
  }

  test("q132 serve plan reads the dedup index artifact, never the corpus") {
    import graft.operators.Dedup
    val serve = Dedup.dedupIndexQuery(spark, sf)
    val physical = serve.queryExecution.executedPlan.toString
    assert(physical.contains("dedup_index"),
      s"serve does not read the artifact:\n$physical")
    // the corpus contributes ONLY its persisted band/feature rows: a
    // documents.parquet scan in the served plan means corpus text is being
    // re-read (the batch fabrication reads it once, behind the bounded
    // batch checkpoint, so the RETURNED plan must carry zero such scans)
    assert(!physical.contains("documents.parquet"),
      s"serve plan re-scans the corpus:\n$physical")
    // and no signature computation either — batch signatures were computed
    // batch-side before the checkpoint; corpus signatures live in the index
    assert(!serve.queryExecution.optimizedPlan.toString.contains("minhash_sig"),
      "serve plan recomputes MinHash signatures")
  }

  test("bandCandidatesCross equals the distinct two-sided band join") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val batch = Dedup.dedupIndexRows(Dedup.dedupBatch(spark, sf))
      .select(col("doc_id"), col("bands")).localCheckpoint()
    val corpus = Dedup.dedupIndexRows(
      Tables.documents(spark, sf).select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("bands")).localCheckpoint()
    val got = Dedup.bandCandidatesCross(batch, corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = batch
      .select(col("doc_id").as("new_id"), explode(col("bands")).as("band"))
      .join(
        corpus.select(col("doc_id").as("old_id"), explode(col("bands")).as("band")),
        Seq("band"))
      .select(col("new_id"), col("old_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive,
      s"extra=${got.diff(naive).take(5)} missing=${naive.diff(got).take(5)}")
    assert(naive.nonEmpty, "no cross candidates — test is vacuous")
  }

  test("q141 ANN ingest gates admission and converges on retry") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val root = Similarity.pqIngestRoot(sf)
    val r1 = Registry.byName("q141_ann_ingest").q(spark, sf).collect()(0)
    val gen1 = graft.sources.Sources.currentGeneration(spark, root)
    val nOdds = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 2 === 1).count()
    assert(r1.getLong(1) == nOdds,
      s"expected exactly the ${nOdds} negated odds admitted, got ${r1.getLong(1)}")
    // no re-ingested duplicate may be admitted
    val dupAdmitted = spark.read.parquet(s"$gen1/codes")
      .filter(col("vec_id") >= 10000000L && col("vec_id") < 20000000L).count()
    assert(dupAdmitted == 0, s"$dupAdmitted duplicate code rows admitted")
    // retry: same accounting, fresh generation, converged content
    val r2 = Registry.byName("q141_ann_ingest").q(spark, sf).collect()(0)
    val gen2 = graft.sources.Sources.currentGeneration(spark, root)
    assert(gen1 != gen2, "retry must publish a FRESH generation name")
    assert(r2.getLong(0) == r1.getLong(0) && r2.getLong(1) == r1.getLong(1),
      "retry must converge to the same artifact accounting")
  }

  test("q142 segment append is O(delta) and re-runs converge") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val root = Similarity.pqSegRoot(sf)
    val r1 = Registry.byName("q142_ann_segment_append").q(spark, sf).collect()(0)
    // the newest segment carries ONLY the delta's code rows — the O(delta)
    // write contract (m·100, never m·corpus)
    assert(r1.getLong(2) == 8 * 100L,
      s"newest segment has ${r1.getLong(2)} rows — not the m*|delta| contract")
    val segs1 = graft.sources.Sources.committedEpochs(spark, s"$root/codes")
    assert(segs1.size == 3, s"expected 3 segments, got ${segs1.mkString(",")}")
    // a redelivered append is a no-op by committed-check: same segments,
    // same accounting, and the base segment's files are untouched
    val baseFiles = spark.read.parquet(s"$root/codes/${segs1.head}").inputFiles.sorted
    val r2 = Registry.byName("q142_ann_segment_append").q(spark, sf).collect()(0)
    val segs2 = graft.sources.Sources.committedEpochs(spark, s"$root/codes")
    assert(segs1 == segs2, "re-run must not add or rename segments")
    assert(r2.getLong(1) == r1.getLong(1), "re-run must not change row accounting")
    assert(spark.read.parquet(s"$root/codes/${segs2.head}").inputFiles.sorted
      .sameElements(baseFiles), "re-run must not rewrite committed segment files")
  }

  test("q143 compaction: copied root, serve-once vs persisted topk, invisible") {
    import graft.operators.Similarity
    val r = Registry.byName("q143_ann_segment_compact").q(spark, sf).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L,
      "3 segments must compact to 1")
    assert(r.getBoolean(4), "top-k must be identical before vs after compaction")
    // the pre-compaction top-k is a PERSISTED artifact shared with q142
    // (r16 verdict #7: one serve, not a rebuild plus two serves) and its
    // row count is exactly the n_topk the equality proof joined over
    val base = Similarity.pqSegRoot(sf)
    assert(spark.read.parquet(s"$base/topk_precompact").count() == r.getLong(3),
      "persisted pre-compaction top-k must back the equality proof")
    // re-run converges bit-identically (fresh compaction root per run)
    val r2 = Registry.byName("q143_ann_segment_compact").q(spark, sf).collect()(0)
    assert(r2.toString == r.toString, "q143 re-run must converge")
  }

  test("q302 cross-gen ANN: artifact serve, sf fixed point rank-1 = self") {
    import graft.operators.Similarity
    val df = Registry.byName("q302_ann_cross_corpus").q(spark, sf)
    val r = df.collect()(0)
    assert(r.getBoolean(2), "cross-generation recall must clear the bound")
    assert(r.getLong(1) == 40L, "n_exact = topK * nQueries")
    assert(r.getLong(0) == 8L * Tables.embeddings(spark, sf).count(),
      "index rows = pqSubs * build-corpus vectors")
    // the serve plan reads the PUBLISHED artifact (codebook + codes), not
    // a re-trained in-query codebook
    val scans = flattenPlan(df.queryExecution.executedPlan)
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.count(_.toString.contains("cross_gen_ann")) >= 2,
      "serve must read the published codebook and codes artifacts")
    // at the suite's sf0.001 build == serve: every query's exact rank-1
    // neighbor is itself at cos 1.0 (no self-exclusion across generations)
    val brute = Similarity.bruteTopKCross(spark, sf, sf).collect()
    brute.filter(_.getLong(1) == 1L).foreach { b =>
      assert(b.getLong(2) == b.getLong(0) && b.getDouble(3) == 1.0,
        s"fixed point: rank-1 of q${b.getLong(0)} must be itself at 1.0")
    }
  }

  test("q144 dedup segment append is O(delta), serve reads both segments") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val idxRoot = s"${Dedup.dedupSegRoot(sf)}/index"
    val r1 = Registry.byName("q144_dedup_segment_append").q(spark, sf)
      .collect()
    val segs = graft.sources.Sources.committedEpochs(spark, idxRoot)
    assert(segs.size == 2, s"expected 2 segments, got ${segs.mkString(",")}")
    // O(delta): the appended segment carries exactly the batch's rows
    val nBatch = Tables.documents(spark, sf).filter(col("doc_id") % 2 === 0).count()
    val nSeg1 = spark.read.parquet(s"$idxRoot/${segs.last}").count()
    assert(nSeg1 == nBatch, s"appended segment has $nSeg1 rows, batch is $nBatch")
    // both segments resolved: every probe's dup set spans the corpus source
    // (keep_id < 10M) AND its +10M copy
    val spanning = r1.count(r => r.getLong(1) >= 2 && r.getLong(2) < 10000000L)
    assert(spanning == nBatch,
      s"$spanning of $nBatch probes matched across both segments")
    // redelivery: converged accounting, no new segments
    Registry.byName("q144_dedup_segment_append").q(spark, sf).write
      .format("noop").mode("overwrite").save()
    assert(graft.sources.Sources.committedEpochs(spark, idxRoot) == segs,
      "re-run must not add segments")
  }

  test("q136 dedup index delete: ids absent, survivors exact, idempotent") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val root = Dedup.dedupIndexDelRoot(sf)
    Dedup.dedupIndexDelete(spark, sf)
    val gen1 = graft.sources.Sources.currentGeneration(spark, root)
    val idx1 = spark.read.parquet(s"$gen1/index")
    assert(idx1.filter(Dedup.dedupIsDeleted(col("doc_id"))).count() == 0,
      "deleted doc_ids still present in the post-delete index")
    val expectSurvivors = Tables.documents(spark, sf)
      .filter(!Dedup.dedupIsDeleted(col("doc_id"))).count()
    assert(idx1.count() == expectSurvivors,
      s"survivor count ${idx1.count()} != $expectSurvivors")
    // re-run converges to identical content under a fresh generation name
    Dedup.dedupIndexDelete(spark, sf)
    val gen2 = graft.sources.Sources.currentGeneration(spark, root)
    assert(gen1 != gen2, "re-run must publish a FRESH generation name")
    assert(spark.read.parquet(s"$gen2/index").count() == expectSurvivors,
      "delete must be idempotent by content")
  }

  test("q138 ingest admits exactly the novel docs, idempotently") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val root = Dedup.dedupIngestRoot(sf)
    val disp1 = Dedup.ingestDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    val gen1 = graft.sources.Sources.currentGeneration(spark, root)
    val idx1 = spark.read.parquet(s"$gen1/index")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val nCorpus = Tables.documents(spark, sf).count()
    val novel = disp1.filter(!_._2).keySet
    val dups = disp1.filter(_._2).keySet
    assert(novel.subsetOf(idx1), "every novel doc must be admitted to the index")
    assert(dups.intersect(idx1).isEmpty, "no duplicate doc may enter the index")
    assert(idx1.size.toLong == nCorpus + novel.size,
      s"index rows ${idx1.size} != corpus $nCorpus + novel ${novel.size}")
    assert(novel.nonEmpty && dups.nonEmpty,
      "fixture must exercise BOTH disposition branches")
    // re-ingesting the same chunk converges: classification runs against
    // corpus rows only, so the admitted novels do NOT match their own
    // prior copies — disposition is stable and the index content is a
    // fixed point, under a fresh generation name
    val disp2 = Dedup.ingestDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    val gen2 = graft.sources.Sources.currentGeneration(spark, root)
    assert(gen1 != gen2, "re-run must publish a FRESH generation name")
    assert(disp2 == disp1, "retried chunk must reproduce its disposition")
    val idx2 = spark.read.parquet(s"$gen2/index")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(idx2 == idx1, "re-ingest must converge to the same index content")
  }

  test("q133 dedup index update is idempotent and advances the generation") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val root = Dedup.dedupIndexUpdRoot(sf)
    Dedup.dedupIndexUpdate(spark, sf)
    val gen1 = graft.sources.Sources.currentGeneration(spark, root)
    val ids1 = spark.read.parquet(s"$gen1/index")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    Dedup.dedupIndexUpdate(spark, sf)
    val gen2 = graft.sources.Sources.currentGeneration(spark, root)
    assert(gen1 != gen2, "re-run must publish a FRESH generation name")
    val ids2 = spark.read.parquet(s"$gen2/index")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(ids1.sameElements(ids2),
      "re-running the update must converge to the same index content")
    val nBatch = ids1.count(_ >= Dedup.dedupBatchIdOffset)
    val nCorpus = ids1.length - nBatch
    assert(nBatch.toLong ==
      Tables.documents(spark, sf).filter(col("doc_id") % 2 === 0).count(),
      "batch must appear exactly once (no double-append)")
    assert(nCorpus.toLong == Tables.documents(spark, sf).count(),
      "corpus rows must survive the update")
    // the superseded generation survives until GC (readers may be mid-scan)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(gen1)),
      "previous generation must survive the swap")
  }

  test("q147 SemDeDup: first-shared-cluster candidates equal the distinct form") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val probed = Similarity.semProbed(spark, sf).localCheckpoint()
    val firstShared = Similarity.semCandidates(probed)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // reference form: explode both sides, equi-join on cid, distinct pairs
    val side = probed.select(col("vec_id"), explode(col("cids")).as("cid"))
    val distinctForm = side.select(col("cid"), col("vec_id").as("a_id"))
      .join(side.select(col("cid"), col("vec_id").as("b_id")), Seq("cid"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(firstShared.length == firstShared.toSet.size,
      "first-shared emission produced a duplicate pair")
    assert(firstShared.toSet == distinctForm.toSet,
      s"candidate sets differ: first-shared ${firstShared.length} vs distinct ${distinctForm.length}")
    // and the registered self-check holds at suite scale
    val out = Registry.byName("q147_semdedup").q(spark, sf).collect()
    assert(out.length == 1)
    assert(out.head.getBoolean(1), "q147 recall below bound")
    assert(out.head.getBoolean(2), "q147 candidate budget exceeded")
  }

  test("q149 recursion: UnionLoop plan, no cartesian, exact seed level") {
    import org.apache.spark.sql.functions._
    val df = Registry.byName("q149_reachability_bfs").q(spark, sf)
    val out = df.collect()
    val physical = df.queryExecution.executedPlan.toString
    // the recursion must compile to UnionLoop (the SQL front-end surface
    // under test), and the edge table must enter as the grid-blocked
    // near-dup join's checkpointed OUTPUT — a CartesianProduct anywhere
    // means the all-pairs cosine sneaked into the recursive plan
    assert(physical.contains("UnionLoop"), s"recursion not compiled to UnionLoop:\n$physical")
    assert(!physical.contains("CartesianProduct"),
      s"q149 plans an all-pairs join:\n$physical")
    // level 0 is exactly the seed set
    val nLabel0 = Tables.embeddings(spark, sf).filter(col("label") === 0).count()
    val hop0 = out.find(_.getLong(0) == 0L).map(_.getLong(1))
    assert(hop0.contains(nLabel0), s"hop-0 count $hop0 != label-0 seeds $nLabel0")
    // hop levels are distinct, bounded, and non-empty through the frontier
    val hops = out.map(_.getLong(0)).toSeq
    assert(hops == hops.distinct.sorted && hops.forall(h => h >= 0 && h <= 4),
      s"broken hop levels: $hops")
  }

  test("q160 pagerank: distributed fixed-point equals an in-memory replay") {
    import org.apache.spark.sql.functions._
    val edges = graft.operators.Dedup.embeddingNeardup(spark, sf)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nodes = Tables.embeddings(spark, sf)
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted
    val n = nodes.length.toLong
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    var r = nodes.map(_ -> 1000000000000L / n).toMap
    for (_ <- 1 to 5) {
      val contrib = sym
        .groupBy(_._2)
        .map { case (dst, es) =>
          dst -> es.map { case (src, _) => (17L * r(src)) / (20L * deg(src)) }.sum
        }
      r = nodes.map(v => v -> (150000000000L / n + contrib.getOrElse(v, 0L))).toMap
    }
    val expected = r.toSeq.sortBy { case (v, rk) => (-rk, v) }.take(20)
    val got = rows("q160_pagerank").map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got == expected, "integer fixed-point replay diverges")
    // mass sanity: rank concentrates on connected nodes — the top node must
    // beat the isolated-node fixed point (base-only rank)
    assert(expected.head._2 > 150000000000L / n)
  }

  test("q172 dedup ranking: no kept doc has a better-ranked near-dup; barrier holds") {
    import org.apache.spark.sql.functions._
    val df = Registry.byName("q172_dedup_ranking").q(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // recompute scores and the confirmed pair set independently
    val scores = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = graft.operators.Dedup.wordsetNeardup(spark, sf)
      .select(col("a_id"), col("b_id")).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
    def better(y: Long, x: Long): Boolean =
      scores(y) > scores(x) || (scores(y) == scores(x) && y < x)
    val kept = rows.map(_.getLong(2)).toSet
    kept.foreach { x =>
      pairs.filter(_._1 == x).foreach { case (_, y) =>
        assert(!better(y, x),
          s"kept doc $x has better-ranked near-dup $y — suppression leaked")
      }
    }
    // ranks are 1..k contiguous per lang and scores non-increasing
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length.toLong),
        s"$lang: ranks not contiguous")
      val ss = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(ss.zip(ss.drop(1)).forall { case (a, b) => a >= b },
        s"$lang: scores increase down the ranking")
    }
    // q120's barrier idiom: the plan past the localCheckpoint scans no parquet
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      "q172 plans its q37 upstream past the localCheckpoint barrier")
    assert(plan.contains("WindowGroupLimit"), "q172 rank window not group-limited")
  }

  test("q173 triangles: oriented count equals brute force; barrier holds") {
    import org.apache.spark.sql.functions.col
    val df = Registry.byName("q173_triangle_count").q(spark, sf)
    val r = df.collect().head
    val edges = graft.operators.Dedup.embeddingNeardup(spark, sf)
      .select(col("a_id"), col("b_id")).collect()
      .map(e => (e.getLong(0), e.getLong(1)))
    val edgeSet = edges.toSet
    assert(r.getLong(0) == edges.length.toLong, "edge count mismatch")
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (v, o) => v -> o.length.toLong }
    assert(r.getLong(1) == deg.values.map(d => d * (d - 1) / 2).sum, "wedges")
    // brute-force triangle enumeration over a<b<c triples of actual edges
    val brute = (for {
      (a, b) <- edges
      c <- deg.keys if c > b && edgeSet((b, c)) && edgeSet((a, c))
    } yield 1).size.toLong
    assert(r.getLong(2) == brute, s"triangles: got ${r.getLong(2)}, brute $brute")
    assert(r.getDouble(3) == 3.0 * brute / deg.values.map(d => d * (d - 1) / 2).sum)
    // edge table localCheckpointed once: nothing downstream re-scans parquet
    df.collect()
    assert(!df.queryExecution.executedPlan.toString.contains("Scan parquet"),
      "q173 re-plans the edge derivation past the barrier")
  }

  test("q186 histogram: sizes partition the corpus; removable = docs - clusters") {
    val rows = Registry.byName("q186_cluster_size_histogram").q(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == nDocs,
      "cluster sizes must partition the corpus exactly")
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1), "n_docs = size * n_clusters")
      assert(r.getLong(3) == (r.getLong(0) - 1) * r.getLong(1), "removable")
    }
    // consistency with q87's cluster table itself
    val clusters = Registry.byName("q87_neardup_clusters").q(spark, sf).collect()
      .map(_.getLong(1)).groupBy(identity).map { case (sz, v) => sz -> v.length.toLong }
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap == clusters,
      "histogram diverges from the q87 cluster table")
  }

  test("q174 hard negatives: label constraints, margin identity, group-limit") {
    import org.apache.spark.sql.functions.col
    val df = Registry.byName("q174_hard_negatives").q(spark, sf)
    val rows = df.collect()
    assert(rows.length == 8 * 5, s"expected 8 queries x 5, got ${rows.length}")
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (q, n, p) = (r.getLong(0), r.getLong(2), r.getLong(4))
      assert(labels(n) != labels(q), s"query $q: negative $n shares its label")
      assert(labels(p) == labels(q), s"query $q: positive $p has a different label")
      // margin = pos_cos - neg_cos at displayed precision (both rounded from
      // the same raw doubles, so the identity holds within one ulp of 1e-4)
      assert(math.abs(r.getDouble(6) - (r.getDouble(5) - r.getDouble(3))) < 1.01e-4,
        s"query $q rank ${r.getLong(1)}: margin inconsistent")
    }
    // negatives are rank-ordered non-increasing per query
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val cs = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cs.zip(cs.drop(1)).forall { case (a, b) => a >= b },
        s"query $q: negative similarity increases down the ranking")
    }
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "q174 rank windows not group-limited")
  }

  test("q192 adaptive salt: sizing law, clamps, and output invariance") {
    import org.apache.spark.sql.functions._
    val sess = spark
    import sess.implicits._
    // sizing law S = ceil(m²/(2P)) clamped to [1, 64], on synthetic band
    // histograms with a known hottest cell: m docs sharing ONE band key
    def bandedWithHotCell(m: Int): org.apache.spark.sql.DataFrame =
      (0 until math.max(m, 1)).map(i => (i.toLong, Array(7L)))
        .toDF("doc_id", "bands")
    // m=1000 → m²/2e8 = 0.005 → clamp up to 1
    assert(graft.operators.Dedup.adaptiveBandSalt(bandedWithHotCell(1000)) == 1)
    // m=40000 → 1.6e9/2e8 = 8 — the default's documented design point
    assert(graft.operators.Dedup.adaptiveBandSalt(bandedWithHotCell(40000)) == 8)
    // m=60000 → 3.6e9/2e8 = 18
    assert(graft.operators.Dedup.adaptiveBandSalt(bandedWithHotCell(60000)) == 18)
    // pathological cell → hard cap 64 (the replication cost law)
    assert(graft.operators.Dedup.adaptiveBandSalt(bandedWithHotCell(200000)) == 64)
    // empty profile → 1 (no data, no salt — the coalesce path)
    assert(graft.operators.Dedup.adaptiveBandSalt(
      bandedWithHotCell(1).filter(col("doc_id") < 0L)) == 1)
    // end-to-end: union of adaptive+static pair sets matches q36 exactly
    // (matches_static proves the runs identical; n_pairs then proves both
    // equal the true pair set)
    val r = Registry.byName("q192_adaptive_salt").q(spark, sf).collect().head
    val q36 = Registry.byName("q36_minhash_lsh").q(spark, sf).count()
    assert(r.getBoolean(1), "derived salt out of range")
    assert(r.getBoolean(2), "adaptive pair set diverges from static")
    assert(r.getLong(0) == q36, "pair-set union differs from q36's pair set")
    // the conf knob is restored after the query builds
    assert(!spark.conf.getOption("graft.dedup.bandJoinSalt").exists(_ != "8"),
      "q192 leaked its salt override into the session")
  }

  test("q211 source matrix: cells tie to the labeled pair set; ppm identity") {
    import org.apache.spark.sql.functions._
    val rows = Registry.byName("q211_dup_source_matrix").q(spark, sf).collect()
    assert(rows.nonEmpty)
    // cells sum to the confirmed q37 pair count
    val nPairs = Registry.byName("q37_wordset_jaccard").q(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == nPairs, "matrix cells partition the pairs")
    val total = rows.head.getLong(3)
    assert(total == nPairs)
    rows.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "unordered cell normalization")
      assert(r.getLong(3) == total)
    }
    val cross = rows.filter(r => r.getString(0) != r.getString(1)).map(_.getLong(2)).sum
    assert(rows.head.getLong(4) == cross * 1000000L / total, "cross-source ppm")
  }

  test("q219 containment finds the small-inside-big pair resemblance misses") {
    val sess = spark
    import sess.implicits._
    // big doc of 100 distinct tokens; small doc = tokens 40..59 verbatim
    // (containment 1.0, Jaccard ~0.18 -- far below any near-dup gate);
    // a third unrelated doc must stay unpaired.
    val big = (0 until 100).map(i => s"w$i").mkString(" ")
    val small = (40 until 60).map(i => s"w$i").mkString(" ")
    val other = (0 until 50).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, big), (2L, small), (3L, other)).toDF("doc_id", "text")
    val rows = graft.operators.Dedup.containmentPairs(docs).collect()
    assert(rows.length == 1, s"exactly the contained pair: ${rows.mkString(";")}")
    val r = rows.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 98L && r.getLong(3) == 18L && r.getLong(4) == 18L)
    assert(r.getLong(5) == 1000000L, "full containment")
    assert(r.getLong(6) < 600000L,
      s"Jaccard ${r.getLong(6)} must sit BELOW the resemblance gate -- " +
        "that is the pair class this operator exists for")
  }

  test("q219 mass boilerplate: a block pasted into 200 docs still surfaces") {
    val sess = spark
    import sess.implicits._
    // The r15 verdict defect: every shingle of a mass-pasted block has
    // df ≈ 201 ≫ 10, so the DF-band generator alone is blind to exactly
    // the boilerplate-inclusion class this operator was built for. The
    // min-df generator must recover it: the pure-block doc's RAREST df≥2
    // shingles ARE the block's, pairing it with every host.
    val block = (0 until 40).map(i => s"tos$i").mkString(" ")
    val hosts = (1 to 200).map { h =>
      (h.toLong, (0 until 30).map(i => s"u${h}w$i").mkString(" ") + " " + block)
    }
    val docs = ((0L, block) +: hosts).toDF("doc_id", "text")
    val rows = graft.operators.Dedup.containmentPairs(docs).collect()
    val blockPairs = rows.filter(_.getLong(0) == 0L).map(_.getLong(1)).sorted
    assert(blockPairs.toSeq == (1L to 200L),
      s"pure block must pair with ALL 200 hosts, got ${blockPairs.length}")
    rows.filter(_.getLong(0) == 0L).foreach { r =>
      assert(r.getLong(5) == 1000000L, "block is fully contained in each host")
    }
    // host-host pairs share only the block (~38 of ~68 shingles, <0.6):
    // candidates exist but the confirm threshold must drop them
    assert(rows.forall(_.getLong(0) == 0L),
      "no host-host pair may pass the containment threshold")
  }

  test("q219 registered query matches its declared blocking semantics") {
    val rows = Registry.byName("q219_containment").q(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(5) >= 600000L, "containment threshold applied")
      assert(r.getLong(4) <= math.min(r.getLong(2), r.getLong(3)),
        "intersection bounded by set sizes")
    }
  }

  test("q229 CDC chunking is SHIFT-RESISTANT: one prepended char perturbs one chunk") {
    import org.apache.spark.sql.functions._
    val sess = spark
    import sess.implicits._
    val rnd = new scala.util.Random(1234)
    val base = (1 to 600).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq((1L, "s", base), (2L, "s", "X" + base))
      .toDF("doc_id", "source", "text")
    val ch = graft.operators.Dedup.cdcChunks(docs).collect()
    val a = ch.filter(_.getLong(0) == 1L).map(_.getLong(3))
    val b = ch.filter(_.getLong(0) == 2L).map(_.getLong(3))
    assert(a.length > 3, s"fixture must produce several chunks, got ${a.length}")
    assert(b.length == a.length, "a 1-char prepend must not change the cut count")
    // every chunk except the first re-deduplicates byte-identically
    assert(a.drop(1).toSeq == b.drop(1).toSeq,
      "all chunks after the first must re-align after a 1-char shift")
    assert(a.head != b.head, "the edited chunk itself must differ")
    // and the registered rollup agrees with a direct recount, off ONE scan
    val reg = graft.queries.Registry.byName("q229_cdc_chunking").q(spark, sf)
    reg.write.format("noop").mode("overwrite").save()
    val scans = flattenPlan(reg.queryExecution.executedPlan)
      .count(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
    // the chunk rows are checkpointed once (probe + stats consumers): the
    // single corpus scan happens building the barrier, so the visible plan
    // must not re-read parquet at all
    assert(scans == 0, s"q229 re-reads parquet $scans times past the barrier")
    val rows = reg.collect()
    val all = graft.operators.Dedup.cdcChunks(
      Tables.documents(spark, sf).select(col("doc_id"), col("source"), col("text")))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    val copies = all.groupBy(_._3).map { case (h, xs) => h -> xs.length }
    rows.foreach { r =>
      val mine = all.filter(_._1 == r.getString(0))
      assert(r.getLong(1) == mine.length, s"${r.getString(0)} n_chunks")
      assert(r.getLong(2) == mine.map(_._2).sum, "n_chars")
      assert(r.getLong(4) == mine.count(c => copies(c._3) >= 2), "dup_chunks")
    }
  }

  test("q229 hot-chunk probe: planted universal chunk switches the plan shape") {
    val sess = spark
    import sess.implicits._
    // every doc starts with the same 600-char block → its chunks are
    // universal (60 copies each); unique tails keep the docs distinct
    val rnd = new scala.util.Random(229)
    val block = (1 to 600).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val docs = (1 to 60).map { i =>
      (i.toLong, "s", block + s" tail$i " +
        (1 to 40).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    }.toDF("doc_id", "source", "text")
    def hasWindow(df: org.apache.spark.sql.DataFrame): Boolean =
      flattenPlan(df.queryExecution.executedPlan)
        .exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec])
    // default threshold (1e6): the window shape stands
    val ref = graft.operators.Dedup.cdcChunkStats(docs)
    val refRows = ref.collect().map(_.toString).toSeq
    assert(hasWindow(ref), "below threshold the single-exchange window wins")
    val saved = spark.conf.getOption("graft.dedup.cdcHotChunk")
    try {
      spark.conf.set("graft.dedup.cdcHotChunk", "10")
      val df = graft.operators.Dedup.cdcChunkStats(docs)
      val got = df.collect().map(_.toString).toSeq
      assert(got == refRows, "fallback shape must be output-identical")
      assert(!hasWindow(df),
        "above threshold the unsplittable hot-key window must be replaced " +
          "by two-phase count + join-back (AQE can skew-split a join)")
    } finally {
      saved match {
        case Some(v) => spark.conf.set("graft.dedup.cdcHotChunk", v)
        case None => spark.conf.unset("graft.dedup.cdcHotChunk")
      }
    }
  }

  test("q285 IVF-PQ: raw recall >= 0.75 AND routed fraction <= 0.25 vs brute") {
    import graft.operators.Similarity
    // the composed index must beat BOTH its parents' bounds at once:
    // q56-style routing budget and q94-style post-quantization recall
    val ann = Similarity.ivfpqTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ex = Similarity.bruteTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = ex.intersect(ann).size.toDouble / ex.size
    assert(recall >= 0.75, f"recall $recall%.3f below the registered bound")
    val nCand = Similarity.ivfpqCandIds(spark, sf).count()
    val nVec = Tables.embeddings(spark, sf).count()
    val frac = nCand.toDouble / (8.0 * (nVec - 1))
    assert(frac <= 0.25, f"routed candidate fraction $frac%.3f exceeds budget")
    // routing is REAL pruning, not a near-complete scan in disguise
    assert(frac > 0.05, f"fraction $frac%.3f suspiciously low — routing broken?")
  }

  test("q230 hash-only containment: no exchange carries a string; equals q219") {
    val df = graft.queries.Registry.byName("q230_containment_hash").q(spark, sf)
    df.collect()
    val exchanges = shuffleExchanges(df)
    assert(exchanges.nonEmpty, "expected shuffle exchanges in q230")
    exchanges.foreach { e =>
      val strings = e.output.filter(
        _.dataType == org.apache.spark.sql.types.StringType)
      assert(strings.isEmpty,
        s"q230 exchange carries string column(s) ${strings.map(_.name).mkString(",")}")
    }
    val exact = graft.queries.Registry.byName("q219_containment")
      .q(spark, sf).collect().toSeq
    assert(df.collect().toSeq == exact,
      "hash-only containment diverges from the exact-string form")
  }

  test("q326 int8 quant audit replays JVM-side bit-exactly; clamp path real") {
    val out = queries.Registry.byName("q326_int8_quant_audit").q(spark, sf)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val data = Tables.embeddings(spark, sf)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    val P = 2147483647L
    val agg = scala.collection.mutable.Map
      .empty[Int, (Long, Long, Long, Long, Long)]
    data.foreach { case (lab, emb) =>
      var (nclip, maxe, se2, dg) = (0L, 0L, 0L, 0L)
      emb.foreach { vf =>
        val v = vf.toDouble
        val qr = math.floor(v * 256d + 0.5d).toLong
        if (qr > 127L || qr < -127L) nclip += 1L
        val qc = math.max(-127L, math.min(127L, qr))
        val e = math.floor(math.abs(v - qc.toDouble / 256d) * 1048576d).toLong
        maxe = math.max(maxe, e)
        se2 += e * e
        dg = (dg * 131L + qc + 128L) % P
      }
      val a = agg.getOrElse(lab, (0L, 0L, 0L, 0L, 0L))
      agg(lab) = (a._1 + 1L, a._2 + nclip, math.max(a._3, maxe),
        a._4 + se2, (a._5 + dg) % P)
    }
    assert(out.keySet == agg.keySet)
    agg.foreach { case (lab, exp) =>
      assert(out(lab) == exp, s"label $lab replay")
    }
    // the clamp path is real: a component above 127/256 must clip through
    // the SAME expression text the query uses
    val clipped = spark.sql(
      "SELECT transform(array(CAST(0.6 AS FLOAT), CAST(-0.9 AS FLOAT))," +
        " v -> least(greatest(CAST(floor(CAST(v AS DOUBLE) * 256D + 0.5D)" +
        " AS BIGINT), -127L), 127L)) AS qc").head().getSeq[Long](0)
    assert(clipped == Seq(127L, -127L), "saturation at both rails")
  }
}
