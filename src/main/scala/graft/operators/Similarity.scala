package graft.operators

import graft.Tables
import graft.queries.Entry
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Similarity search over the `embeddings` table (`array<float>` column).
  *
  * q40 is brute-force top-k (the exactness baseline): broadcast the small
  * query set against the corpus — one pass over the corpus, no shuffle except
  * the final per-query top-k. q41 is the scale path: random-hyperplane LSH
  * banding turns candidate generation into an equi-join on a 64-bit band key,
  * linear-ish in corpus size; at 100 TB you tune planes/bands for the
  * recall/candidate-count trade-off (an IVF coarse quantizer would slot into
  * the same shape: bucket id = nearest centroid instead of hyperplane signs).
  */
object Similarity {

  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"), col("label"))

  private val nQueries = 8
  private val topK = 5

  /** Brute-force exact top-k cosine for the first `nQueries` vectors. */
  private[graft] def bruteTopK(s: SparkSession, d: String): DataFrame =
    bruteTopKWhere(s, d, lit(true))

  /** [[bruteTopK]] with a predicate restricting the NEIGHBOR side (queries
    * always come from the full table) — the exact baseline for recall
    * checks against an index that no longer contains every vector (q126's
    * post-delete serve must be compared against exact-over-survivors, not
    * exact-over-all, or deleted ids would count as unrecallable misses).
    */
  private[graft] def bruteTopKWhere(
      s: SparkSession, d: String, keepNeighbor: Column): DataFrame = {
    val e = vecs(s, d)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    e.filter(keepNeighbor)
      .select(col("vec_id").as("n_id"), col("v").as("n_v"))
      .crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", call_function("cosine_sim", col("q_v"), col("n_v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** q41 sign-LSH operating point. The synthetic embeddings are
    * near-isotropic (true top-5 neighbors at cos≈0.3 ⇒ per-plane
    * disagreement ≈0.40; random pairs ≈0.5), which is the hostile case for
    * sign-LSH — band collisions alone can't prune hard at useful recall. So
    * candidate generation is TWO cheap stages off ONE packed 64-bit
    * signature per vector:
    *
    *   1. blocking: 16 disjoint 4-bit slices of the signature are the band
    *      keys (banding recall ≈0.89 for cos≈0.3 pairs) — the equi-join that
    *      replaces the O(N²) cross join;
    *   2. Hamming prefilter: bit_count(sig_q XOR sig_n) ≤ HammingMax inside
    *      the joined candidates — integer ops on two longs, codegen'd,
    *      BEFORE the pair ever reaches the d-dim cosine or the distinct
    *      shuffle. E[Hamming] is 64·p_disagree: ≈25.6 for true neighbors vs
    *      ≈32 for random pairs; the threshold sits between.
    *
    * Stage 1 is MULTI-PROBED on the query side: each query band key is
    * probed with its four 1-bit-flip neighbors (standard multi-probe LSH —
    * perturb the probe sequence instead of adding tables), which lifts
    * banding recall to ≈1 at zero corpus-side cost; the Hamming prefilter
    * then carries the entire pruning budget. Measured on the fixtures:
    * recall 0.775–0.85 at a candidate fraction ≤0.24 (pre-multi-probe form
    * was ≈0.7 at the same budget; the old band-only form was 0.75 @ ~0.5 —
    * the fraction is the part that matters at 100×, where half the cross
    * join IS the cross join). DedupSimilaritySuite asserts BOTH metrics;
    * the registered q41 emits both as self-check booleans.
    */
  private val AnnPlanes = 64
  private val AnnBandBits = 4
  private val AnnBands = AnnPlanes / AnnBandBits
  private val AnnHammingMax = 28
  private val AnnCandBudget = 0.25

  /** Candidate pairs surviving blocking + Hamming prefilter (pre-cosine) —
    * the set whose size/recall trade-off the suite asserts.
    */
  private[graft] def annCandidates(s: SparkSession, d: String): DataFrame = {
    val sigs = vecs(s, d).select(
      col("vec_id"),
      col("v"),
      call_function("rhp_sig", col("v"), lit(AnnPlanes), lit(42L)).as("sig"))
    val mask = (1L << AnnBandBits) - 1
    // band key = (band index, 4 signature bits) packed in one long; pure
    // integer ops on the sig column, no per-band rehash of the vector
    def bandKey(b: Int, flip: Int): Column = {
      val bits = shiftrightunsigned(col("sig"), b * AnnBandBits).bitwiseAND(lit(mask))
      val probed = if (flip < 0) bits else bits.bitwiseXOR(lit(1L << flip))
      probed.bitwiseOR(lit((b + 1).toLong << 32))
    }
    val bandArr = array((0 until AnnBands).map(bandKey(_, -1)): _*)
    // MULTI-PROBE on the query side only: each band key is probed together
    // with its four 1-bit-flip neighbors (flip = one of the 4 slice bits),
    // recovering pairs whose slices disagree in exactly one bit. 8 queries ×
    // 16 bands × 5 probes = 640 broadcast rows — the corpus side still emits
    // its 16 exact keys, so corpus-side cost is unchanged; the Hamming
    // prefilter below remains the candidate-budget guarantee.
    val probeArr = array((for {
      b <- 0 until AnnBands; flip <- -1 until AnnBandBits
    } yield bandKey(b, flip)): _*)
    // Banded rows carry (id, sig, band) ONLY — 24 bytes/row through the
    // 16-band explode and join, never the d-dim vector (which would
    // otherwise be replicated once per band). The post-join dedup likewise
    // runs on bare (q_id, n_id) pairs: the old form ran `.distinct()` over
    // rows still holding BOTH full vectors, so the dedup exchange moved and
    // hash-compared ~1 KB per candidate instead of 16 bytes — flagged two
    // rounds running as q41's bimodality suspect. Vectors re-attach AFTER
    // the distinct: corpus side by one equi-join on n_id, query side from an
    // 8-row broadcast (the attachFeatures shape from Dedup).
    val banded = sigs.select(col("vec_id"), col("sig"), explode(bandArr).as("band"))
    val q = sigs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("sig").as("q_sig"),
        explode(probeArr).as("band"))
    val candIds = banded
      .select(col("vec_id").as("n_id"), col("sig").as("n_sig"), col("band"))
      .join(broadcast(q), Seq("band"))
      .filter(col("q_id") =!= col("n_id") &&
        bit_count(col("q_sig").bitwiseXOR(col("n_sig"))) <= AnnHammingMax)
      .select(col("q_id"), col("n_id"))
      .distinct()
    val e = vecs(s, d)
    candIds
      .join(e.select(col("vec_id").as("n_id"), col("v").as("n_v")), Seq("n_id"))
      .join(
        broadcast(e.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("q_id"), col("v").as("q_v"))),
        Seq("q_id"))
      .select(col("q_id"), col("q_v"), col("n_id"), col("n_v"))
  }

  /** LSH ANN: exact cosine + top-k within [[annCandidates]] only. */
  private[graft] def annTopK(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    annCandidates(s, d)
      .withColumn("cos", call_function("cosine_sim", col("q_v"), col("n_v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** IVF-style ANN: a coarse quantizer (k centroids — trained on a
    * deterministic SAMPLE, see [[ivfCentroids]]) buckets the corpus;
    * queries probe their `nprobe` nearest centroids and run exact cosine
    * only inside those buckets.
    *
    * Measured on the fixtures this dominates sign-LSH (q41): recall ≥0.9 at
    * a ~0.25 candidate fraction — IVF adapts to the data where fixed
    * hyperplanes can't. The 100 TB shape: sample-trained quantizer,
    * broadcast k×d centroid table (tiny), assignment is one scan, candidate
    * generation is an equi-join on bucket id.
    */
  /** Keep the `keep` nearest of the broadcast centroid table per point —
    * one scan of `points`, bounded k×d build side.
    */
  private def nearestCent(points: DataFrame, cents: DataFrame, keep: Int): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    points.crossJoin(broadcast(cents))
      .withColumn("ccos", call_function("cosine_sim", col("v"), col("cv")))
      .withColumn("crk", row_number().over(w))
      .filter(col("crk") <= keep)
  }

  /** Training sample: deterministic hash-mod of vec_id, ~1/IvfTrainMod of
    * the corpus. Hash-mod instead of a seeded `.sample()` because sampleBy/
    * sample draw from per-partition rand streams — the chosen rows would
    * shift with partition layout, and the quantizer (hence recall) with
    * them. A quantizer needs O(k·100) points regardless of corpus size; at
    * 100 TB the modulus scales up so the training set stays ~10^5 rows.
    * Mod 2 on the 500-vector fixtures = ~250 points (~16/centroid — the
    * measured knee: 124 points drops recall to ~0.65, 250 holds ≥0.8).
    */
  private val IvfTrainMod = 2L

  private[graft] def ivfTrainingSample(s: SparkSession, d: String): DataFrame =
    vecs(s, d).select(col("vec_id"), col("v"))
      .filter(pmod(xxhash64(col("vec_id")), lit(IvfTrainMod)) === 0L)

  /** Coarse quantizer, trained on [[ivfTrainingSample]] ONLY: the first k
    * vectors seed the centroids, one Lloyd round re-centers them
    * (element-wise mean via posexplode + struct-sorted regroup — exact
    * array order). The 64× posexplode row expansion therefore touches the
    * sample, never the corpus: training cost is decoupled from corpus size,
    * which is what lets this query survive a 100× scale-up (the corpus-side
    * stages below are one assignment scan + a bucket equi-join).
    */
  private[graft] def ivfCentroids(s: SparkSession, d: String, k: Int): DataFrame = {
    val seeds = vecs(s, d).filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cid"), col("v").as("cv"))
    val assigned = nearestCent(ivfTrainingSample(s, d), seeds, 1)
      .select(col("cid"), col("v"))
    // r21: element-wise mean as ONE aggregation (64 per-dimension avg
    // buffers) instead of posexplode → (cid, pos) avg → collect_list +
    // struct-sort regroup — two exchanges and a 64× row expansion removed
    // per training pass; same per-dimension mean over the same rows.
    assigned
      .groupBy(col("cid"))
      .agg(array((0 until 64).map(i => avg(col("v").getItem(i))): _*).as("cv"))
  }

  private[graft] def ivfTopK(s: SparkSession, d: String): DataFrame = {
    val k = 16
    val nprobe = 4
    val e = vecs(s, d).select(col("vec_id"), col("v"))
    val centroids = ivfCentroids(s, d, k)

    val bucketed = nearestCent(e, centroids, 1)
      .select(col("vec_id"), col("v"), col("cid").as("bucket"))
    val probes = nearestCent(e.filter(col("vec_id") < nQueries), centroids, nprobe)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"), col("cid").as("bucket"))

    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    bucketed
      .select(col("vec_id").as("n_id"), col("v").as("n_v"), col("bucket"))
      .join(broadcast(probes), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("q_v"), col("n_id"), col("n_v"))
      .distinct()
      .withColumn("cos", call_function("cosine_sim", col("q_v"), col("n_v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  // ---- Product quantization (Jégou/Douze/Schmid, TPAMI'11) ----
  // m=8 subspaces × 8 dims over d=64; ks=32 codewords per subspace. The
  // vector compresses to m 5-bit codes (5 bytes vs 512 — the PQ storage
  // win), and query-time scoring is Asymmetric Distance Computation: a
  // per-query (sub, code) → dot lookup table (Q·m·ks = 2048 rows here),
  // summed across subspaces. Embeddings are unit-norm (fixture-verified),
  // so the summed subspace dots approximate cosine directly. Measured
  // recall@5 vs brute: 0.925 / 0.90 / 0.85 at sf0.001/0.01/0.1 — the
  // registered bound 0.75 leaves 0.1 margin at the tightest SF.
  private val pqSubs = 8
  private val pqSubDim = 8
  private val pqK = 32
  private val pqCandK = topK * 16 // ADC candidates per query before re-rank
  private val pqLloydRounds = 2

  /** One 8-dim subvector row per (vector, subspace): (id, sub, sv). */
  private def pqSlices(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol), posexplode(expr(
      s"transform(sequence(0, ${pqSubs - 1}), s -> slice(v, s * $pqSubDim + 1, $pqSubDim))"))
      .as(Seq("sub", "sv")))

  // r21: native codegen kernels (bit-identical to the former
  // aggregate(zip_with(...)) HOFs — same left-to-right fold; the HOF pair
  // was interpreted and allocated an intermediate array per slice×codeword
  // in the Lloyd rounds, the L2SqLong lesson replayed on doubles)
  private def l2sq(a: String, b: String): Column =
    graft.functions.GraftColumns.l2sqDouble(col(a), col(b))

  private def dotC(a: String, b: String): Column =
    graft.functions.GraftColumns.dotDouble(col(a), col(b))

  /** Per-subspace codebooks: seeded by the first `pqK` vectors' slices, then
    * `pqLloydRounds` (= 2) Lloyd rounds over [[ivfTrainingSample]] ONLY
    * (same decoupling as IVF — training touches the sample, never the
    * corpus; the pinned recall numbers were measured at 2 rounds). Argmin is
    * `min(struct(dist, cid))` — partial-aggregatable and deterministic
    * (cid breaks distance ties), so nothing here shuffles more than the
    * sample. Empty clusters simply drop (fewer codewords in that subspace).
    */
  private[graft] def pqCodebook(s: SparkSession, d: String): DataFrame = {
    val sampleSlices = pqSlices(ivfTrainingSample(s, d), "vec_id")
    var cb = pqSlices(
      vecs(s, d).filter(col("vec_id") < pqK).select(col("vec_id"), col("v")), "vec_id")
      .select(col("sub"), col("vec_id").cast("int").as("cid"), col("sv").as("cw"))
    for (_ <- 1 to pqLloydRounds) {
      val assigned = sampleSlices
        .join(broadcast(cb), Seq("sub"))
        .withColumn("dist", l2sq("sv", "cw"))
        .groupBy(col("sub"), col("vec_id"))
        .agg(min(struct(col("dist"), col("cid"))).as("am"), first(col("sv")).as("sv"))
        .select(col("sub"), col("am.cid").as("cid"), col("sv"))
      // r21: element-wise mean as ONE aggregation per round (8 per-dim avg
      // buffers) — the posexplode → (sub, cid, pos) avg → regroup form paid
      // two exchanges and an 8× row expansion per Lloyd round.
      cb = assigned
        .groupBy(col("sub"), col("cid"))
        .agg(array((0 until pqSubDim).map(i => avg(col("sv").getItem(i))): _*)
          .as("cw"))
    }
    cb
  }

  /** Encode the corpus against a codebook: one (vec_id, sub, cid) row per
    * vector×subspace — nearest codeword per subspace via a broadcast-join
    * scan, argmin as the partial-aggregatable `min(struct)`, NO window over
    * the corpus.
    */
  private def pqEncode(e: DataFrame, codebook: DataFrame): DataFrame =
    pqSlices(e, "vec_id")
      .join(broadcast(codebook), Seq("sub"))
      .withColumn("dist", l2sq("sv", "cw"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("dist"), col("cid"))).as("am"))
      .select(col("vec_id"), col("sub"), col("am.cid").as("cid"))

  /** The SERVING half of PQ ANN, taking codebook + codes as inputs (q94
    * feeds in-query artifacts, q109 feeds the persisted index): score every
    * (query, vector) by the summed ADC lookup, keep `pqCandK` candidates
    * per query, then exact-cosine re-rank. Corpus-side shuffles: the
    * (q_id, n_id) score sum (Q-bounded fan-out) — everything else is
    * broadcast. At 100 TB: codes are ~5 bytes/vector, the ADC table is
    * Q·m·ks rows, and candidate generation never materializes a d-dim
    * vector until the ≤ Q·pqCandK re-rank rows.
    */
  private def pqAdcTopK(
      s: SparkSession, d: String, codebook: DataFrame, codes: DataFrame): DataFrame = {
    val e = vecs(s, d).select(col("vec_id"), col("v"))
    val qdots = pqSlices(e.filter(col("vec_id") < nQueries), "vec_id")
      .join(broadcast(codebook), Seq("sub"))
      .withColumn("dot", dotC("sv", "cw"))
      .select(col("vec_id").as("q_id"), col("sub"), col("cid"), col("dot"))
    val wc = Window.partitionBy(col("q_id")).orderBy(col("adc").desc, col("n_id"))
    val cand = codes
      .join(broadcast(qdots), Seq("sub", "cid"))
      .groupBy(col("q_id"), col("vec_id").as("n_id"))
      .agg(sum(col("dot")).as("adc"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("crk", row_number().over(wc))
      .filter(col("crk") <= pqCandK)
      .select(col("q_id"), col("n_id"))
    val wr = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    cand
      .join(e.select(col("vec_id").as("q_id"), col("v").as("q_v")), Seq("q_id"))
      .join(e.select(col("vec_id").as("n_id"), col("v").as("n_v")), Seq("n_id"))
      .withColumn("cos", call_function("cosine_sim", col("q_v"), col("n_v")))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** PQ ANN top-k, fully in-query: train, encode, serve in one plan. The
    * codebook (≤ m·ks = 256 rows) is materialized before fan-out: codes and
    * qdots both consume it, and column pruning defeats exchange reuse
    * across the two — without this the whole sample-training chain (sample
    * scan + 2 Lloyd rounds) re-plans per consumer. localCheckpoint is the
    * in-query stand-in for the PERSISTED artifact, which q108/q109 now
    * implement for real (build once through the atomic generational
    * publish, serve from the artifact with no training stage).
    */
  private[graft] def pqTopK(s: SparkSession, d: String): DataFrame = {
    val e = vecs(s, d).select(col("vec_id"), col("v"))
    val codebook = pqCodebook(s, d).localCheckpoint()
    pqAdcTopK(s, d, codebook, pqEncode(e, codebook))
  }

  // ---- q285: IVF-PQ composition (the production ANN shape) ----
  // q56 routes queries to coarse cells and scores EXACT cosine in-cell;
  // q94 PQ-scores the WHOLE corpus. Production ANN (FAISS IVFPQ) composes
  // them: route to nprobe cells, ADC-score only the vectors living there,
  // exact re-rank the survivors — candidate work bounded by the routed
  // fraction AND per-candidate cost bounded by the 5-byte code. At 100 TB
  // the corpus-side artifacts are the bucket id (4 B) + m codes
  // (~5 B)/vector; queries broadcast (centroids, ADC table); the only
  // corpus exchange is the (q_id, n_id) ADC sum over ROUTED rows.

  private val IvfpqK = 16
  private val IvfpqProbe = 3 // 3/16 cells ≈ 0.19 routed fraction target

  /** Routed candidate ids: (q_id, n_id) for every corpus vector living in
    * one of the query's `IvfpqProbe` nearest cells.
    */
  private[graft] def ivfpqCandIds(s: SparkSession, d: String): DataFrame = {
    val e = vecs(s, d).select(col("vec_id"), col("v"))
    val centroids = ivfCentroids(s, d, IvfpqK)
      .localCheckpoint() // consumers: corpus assignment + query probes
    val bucketed = nearestCent(e, centroids, 1)
      .select(col("vec_id").as("n_id"), col("cid").as("bucket"))
    val probes = nearestCent(e.filter(col("vec_id") < nQueries), centroids, IvfpqProbe)
      .select(col("vec_id").as("q_id"), col("cid").as("bucket"))
    bucketed.join(broadcast(probes), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"))
  }

  /** IVF-PQ serve: ADC-score only the routed candidates, exact-cosine
    * re-rank the per-query `pqCandK` ADC survivors (q94's tail over q56's
    * routing). Measured recall@5 vs brute: 0.800/0.825/0.925 at
    * sf0.001/0.01/0.1 with routed fraction 0.185-0.188 — the registered
    * 0.75/0.25 bounds hold with margin at every gate SF.
    */
  private[graft] def ivfpqTopK(s: SparkSession, d: String): DataFrame =
    ivfpqTopKFrom(s, d, ivfpqCandIds(s, d))

  /** [[ivfpqTopK]] over an already-materialized routed-candidate table —
    * the registered entry checkpoints [[ivfpqCandIds]] once and feeds BOTH
    * the serve path and the budget count from it (the routing pipeline
    * must not train/assign twice for one query).
    */
  private[graft] def ivfpqTopKFrom(
      s: SparkSession, d: String, cand: DataFrame): DataFrame = {
    val e = vecs(s, d).select(col("vec_id"), col("v"))
    val codebook = pqCodebook(s, d).localCheckpoint() // consumers: encode + ADC
    val codes = pqEncode(e, codebook)
    val qdots = pqSlices(e.filter(col("vec_id") < nQueries), "vec_id")
      .join(broadcast(codebook), Seq("sub"))
      .withColumn("dot", dotC("sv", "cw"))
      .select(col("vec_id").as("q_id"), col("sub"), col("cid"), col("dot"))
    val wc = Window.partitionBy(col("q_id")).orderBy(col("adc").desc, col("n_id"))
    val adcTop = codes.select(col("vec_id").as("n_id"), col("sub"), col("cid"))
      .join(cand, Seq("n_id")) // the IVF routing gate
      .join(broadcast(qdots), Seq("q_id", "sub", "cid"))
      .groupBy(col("q_id"), col("n_id"))
      .agg(sum(col("dot")).as("adc"))
      .withColumn("crk", row_number().over(wc))
      .filter(col("crk") <= pqCandK)
      .select(col("q_id"), col("n_id"))
    val wr = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    adcTop
      .join(e.select(col("vec_id").as("q_id"), col("v").as("q_v")), Seq("q_id"))
      .join(e.select(col("vec_id").as("n_id"), col("v").as("n_v")), Seq("n_id"))
      .withColumn("cos", call_function("cosine_sim", col("q_v"), col("n_v")))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  // ---- Persisted PQ index artifact (q108 build / q109 serve) ----
  // The production ANN lifecycle the in-query q94 stand-in names: train +
  // encode ONCE, publish codebook + codes atomically through the
  // generational manifest machinery (Sources.publishGeneration — readers
  // see the old complete index or the new complete one, never a mix), then
  // serve every query from the artifact with NO training stage in the plan.

  private[graft] def pqIndexRoot(d: String): String =
    graft.sources.Sources.scratch(d, "pq_index")

  /** Train the codebook, encode the corpus, and atomically publish both as
    * one index generation (`<root>/<gen>/{codebook,codes}`). `rootOverride`
    * lets q122's update lifecycle run against its OWN root so the serve
    * queries (q109) keep reading the pristine build no matter the driver's
    * execution order.
    */
  private[graft] def pqIndexBuild(
      s: SparkSession, d: String, rootOverride: Option[String] = None): Unit = {
    val root = rootOverride.getOrElse(pqIndexRoot(d))
    val gen = "gen-build"
    val codebook = pqCodebook(s, d).localCheckpoint()
    codebook.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/$gen/codebook")
    pqEncode(vecs(s, d).select(col("vec_id"), col("v")), codebook)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/$gen/codes")
    graft.sources.Sources.publishGeneration(s, root, gen)
  }

  private[graft] def pqIndexUpdRoot(d: String): String =
    graft.sources.Sources.scratch(d, "pq_index_upd")

  /** INCREMENTAL index update — the third verb of the lifecycle (q108
    * build / q109 serve / q122 update): new arrivals (vec_id < 100
    * re-ingested with +10M ids — the q98 fixture-fabrication pattern) are
    * encoded with the PERSISTED codebook — no Lloyd round anywhere, which
    * is the whole point: at 100 TB re-training on every append would
    * rescan the corpus, while encode-with-frozen-codebook touches only the
    * delta — and published as a NEW generation carrying the unchanged
    * codebook plus old∪delta codes. Readers see the old complete index or
    * the new complete one (the manifest swap), never a half-appended one.
    * Idempotent by CONTENT: prior delta codes are dropped before the union,
    * so re-running converges to the same artifact bytes — but each run
    * publishes under a FRESH generation name (gen-upd-1, gen-upd-2, …
    * derived from the current manifest). A constant name would make a
    * re-run Overwrite the directory `_current` already points at, so a
    * concurrent reader mid-scan could see a half-rewritten generation —
    * exactly the mix the manifest contract rules out. Superseded update
    * generations are left on disk (a reader holding the old resolved path
    * may still be scanning it); production would age them out with the
    * same TTL sweep publishGeneration applies to orphaned manifest tmps.
    * Runs against its own root (see pqIndexBuild) so q109's serve path
    * stays pristine.
    */
  private[graft] def pqIndexUpdate(
      s: SparkSession, d: String, rootOverride: Option[String] = None): Unit = {
    val root = rootOverride.getOrElse(pqIndexUpdRoot(d))
    val manifest = new org.apache.hadoop.fs.Path(s"$root/_current")
    val fs = manifest.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(manifest)) pqIndexBuild(s, d, Some(root))
    val cur = graft.sources.Sources.currentGeneration(s, root)
    val codebook = s.read.parquet(s"$cur/codebook").localCheckpoint()
    val oldCodes = s.read.parquet(s"$cur/codes")
      .filter(col("vec_id") < 10000000L).localCheckpoint()
    val delta = vecs(s, d).filter(col("vec_id") < 100)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("v"))
    val gen = nextGen(cur, "gen-upd-")
    codebook.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/$gen/codebook")
    oldCodes.unionByName(pqEncode(delta, codebook))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/$gen/codes")
    graft.sources.Sources.publishGeneration(s, root, gen)
  }

  private[graft] def pqIndexDelRoot(d: String): String =
    graft.sources.Sources.scratch(d, "pq_index_del")

  /** Tombstoned delete-batch: vec_ids [nQueries, nQueries+100) — a
    * contiguous compliance batch of 100, disjoint from the query ids so
    * the post-delete recall check still has its 8 probes.
    */
  private[graft] val delLo: Int = nQueries
  private[graft] val delHi: Int = nQueries + 100
  private[graft] def isDeleted(id: Column): Column =
    id >= delLo && id < delHi

  /** INDEX DELETE — the fourth verb of the persisted-ANN lifecycle (q108
    * build / q109 serve / q122 update / q126 delete): remove a batch of
    * vec_ids from the index (the GDPR / right-to-be-forgotten path every
    * production index needs). The codebook is NOT retrained — a delete
    * must never rescan the corpus, exactly like q122's append — so the new
    * generation carries the frozen codebook plus the code rows of the
    * SURVIVORS only, published atomically through the manifest (readers
    * see the pre-delete index or the post-delete one, never a mix).
    * Idempotent by content (the filter is a pure predicate on vec_id);
    * each run publishes under a fresh generation name (see [[nextGen]]).
    * Runs against its own root so q109's serve path and q122's update
    * lineage stay pristine regardless of driver execution order.
    */
  private[graft] def pqIndexDelete(s: SparkSession, d: String): Unit = {
    val root = pqIndexDelRoot(d)
    val manifest = new org.apache.hadoop.fs.Path(s"$root/_current")
    val fs = manifest.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(manifest)) pqIndexBuild(s, d, Some(root))
    val cur = graft.sources.Sources.currentGeneration(s, root)
    val codebook = s.read.parquet(s"$cur/codebook").localCheckpoint()
    val survivors = s.read.parquet(s"$cur/codes")
      .filter(!isDeleted(col("vec_id"))).localCheckpoint()
    val gen = nextGen(cur, "gen-del-")
    codebook.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/$gen/codebook")
    survivors.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/$gen/codes")
    graft.sources.Sources.publishGeneration(s, root, gen)
  }

  private[graft] def pqIndexGcRoot(d: String): String =
    graft.sources.Sources.scratch(d, "pq_index_gc")

  /** GENERATION GC — the retention half every publish verb here defers to
    * ("superseded generations are left on disk … aged out with a TTL
    * sweep"): delete every top-level dir under the index root that is NOT
    * the manifest-named current generation and whose modification time is
    * older than `ttlMs`. The TTL is the safety contract — it must exceed
    * the longest reader scan, because a reader that resolved the OLD
    * manifest may still be reading the old dir; with that bound, anything
    * older and unlisted is provably unreachable (new readers resolve the
    * manifest, which no longer names it). Returns the number of dirs
    * removed. Sweep failures on individual dirs are non-fatal (same
    * posture as the manifest-tmp GC in publishManifestText): retention
    * must never block serving, and a half-deleted superseded dir is
    * unlisted garbage the next sweep finishes.
    */
  private[graft] def pqIndexGc(s: SparkSession, root: String, ttlMs: Long): Long = {
    val conf = s.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    val cur = graft.sources.Sources.currentGeneration(s, root)
    val curName = cur.substring(cur.lastIndexOf('/') + 1)
    val cutoff = System.currentTimeMillis() - ttlMs
    fs.listStatus(rootPath).count { st =>
      val name = st.getPath.getName
      st.isDirectory && name != curName && st.getModificationTime < cutoff && {
        try fs.delete(st.getPath, true)
        catch { case scala.util.control.NonFatal(_) => false }
      }
    }.toLong
  }

  /** Fresh generation name: `<prefix><n+1>` where n is parsed from the
    * CURRENT generation's basename (0 when current is the build or carries
    * a different prefix). Never reuses an existing name, so a publish
    * always writes a directory no reader can be pointed at yet — a re-run
    * with a CONSTANT name would Overwrite the directory `_current` points
    * at in place, letting a concurrent reader mid-scan see a half-written
    * generation.
    */
  private[graft] def nextGen(currentGenPath: String, prefix: String): String = {
    val base = currentGenPath.substring(currentGenPath.lastIndexOf('/') + 1)
    val n =
      if (base.startsWith(prefix))
        scala.util.Try(base.stripPrefix(prefix).toInt).getOrElse(0)
      else 0
    s"$prefix${n + 1}"
  }

  /** Serve PQ ANN from the published artifact. Build-if-absent is SETUP
    * (the q57/q75 write-then-read pattern, so the query is self-contained
    * in any execution order); the RETURNED plan resolves the manifest and
    * reads only the index parquet + the embeddings for queries/re-rank —
    * DedupSimilaritySuite asserts it contains no training-sample stage.
    */
  private[graft] def pqIndexServe(s: SparkSession, d: String): DataFrame = {
    val root = pqIndexRoot(d)
    val manifest = new org.apache.hadoop.fs.Path(s"$root/_current")
    val fs = manifest.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(manifest)) pqIndexBuild(s, d)
    val idx = graft.sources.Sources.currentGeneration(s, root)
    pqAdcTopK(s, d,
      s.read.parquet(s"$idx/codebook"),
      s.read.parquet(s"$idx/codes"))
  }

  /** Driver-checkable form of an approximate top-k: recall against the
    * in-query exact baseline, reduced to (n_exact, recall_ok). The exact
    * side is the same one-pass broadcast-8-queries scan as q40, so the
    * whole self-check stays linear in corpus size. The DuckDB oracle
    * reproduces the row as data-derived n_exact + literal TRUE — the driver
    * check passes iff the ANN clears its recall bound.
    */
  private def recallCheck(ann: DataFrame, exact: DataFrame, bound: Double): DataFrame = {
    val e = exact.select(col("q_id"), col("n_id"))
    val a = ann.select(col("q_id").as("aq"), col("n_id").as("an"), lit(1L).as("hit"))
    e.join(a, col("q_id") === col("aq") && col("n_id") === col("an"), "left_outer")
      .agg(
        count(lit(1)).as("n_exact"),
        (sum(coalesce(col("hit"), lit(0L))) / count(lit(1))).as("recall"))
      .select(col("n_exact"), (col("recall") >= bound).as("recall_ok"))
  }

  private val recallOracle: String =
    s"""SELECT CAST($topK * count(*) AS BIGINT) AS n_exact, TRUE AS recall_ok
       |FROM embeddings WHERE vec_id < $nQueries""".stripMargin

  // ---- q141: ANN INGEST — near-dup-gated vector admission ----

  private[graft] def pqIngestRoot(d: String): String =
    graft.sources.Sources.scratch(d, "pq_index_ingest")

  /** The ANN side of the dedup family's ingest loop (Dedup q138): an
    * arriving vector batch is admitted to the PQ index ONLY if genuinely
    * novel — a re-ingested duplicate (cosine ≥ 0.99 against some corpus
    * vector) is rejected instead of bloating the index with near-copies.
    * Classification is the EXACT blocked cosine join (q39's bounded-task
    * theta-join shape, with the BATCH side replicated ×B — the small side,
    * per the bandCandidatesCross sizing lesson); admission encodes the
    * novels with the FROZEN codebook (q122: no Lloyd round, no corpus
    * rescan) and publishes old∪novel codes as a fresh generation. The
    * fixture batch drives both branches: evens verbatim (+10M — cos ≈ 1.0
    * vs their source, rejected) and odds NEGATED (+20M — cos = −1 vs their
    * source and inside the isotropic bulk vs everything else, admitted).
    * Fixture margins vs the 0.99 threshold are ≥ 0.44 on every pair
    * (measured |cos| ≤ 0.55 across non-identical pairs at all gate SFs),
    * so the float compare cannot flip between engines and the DuckDB
    * brute-force oracle decides the truth. Classification runs against the
    * CORPUS vectors — the index minus the batch's own prior admissions —
    * so a retry reproduces its admit set and the artifact converges (the
    * q138 read-side delta-drop pattern).
    */
  private[graft] def annIngest(s: SparkSession, d: String): DataFrame = {
    val root = pqIngestRoot(d)
    val manifest = new org.apache.hadoop.fs.Path(s"$root/_current")
    val fs = manifest.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(manifest)) pqIndexBuild(s, d, Some(root))
    val cur = graft.sources.Sources.currentGeneration(s, root)
    val e = vecs(s, d).select(col("vec_id"), col("v"))
    val batch = e.filter(col("vec_id") % 2 === 0)
      .select((col("vec_id") + 10000000L).as("new_id"), col("v"))
      .unionByName(
        e.filter(col("vec_id") % 2 === 1)
          .select((col("vec_id") + 20000000L).as("new_id"),
            transform(col("v"), x => -x).as("v")))
      .localCheckpoint() // three consumers: probes, novel anti-join, encode
    val blocks = 8
    val corpus = e.select(
      col("vec_id"), col("v"),
      pmod(col("vec_id"), lit(blocks.toLong)).cast("int").as("blk"))
    val probes = batch.select(
      col("new_id"), col("v").as("bv"),
      explode(array((0 until blocks).map(lit): _*)).as("blk"))
    val matched = probes.join(corpus, Seq("blk"))
      .filter(call_function("cosine_sim", col("bv"), col("v")) >= 0.99)
      .select(col("new_id")).distinct()
    val novel = batch.join(matched, Seq("new_id"), "left_anti")
      .select(col("new_id").as("vec_id"), col("v"))
    val codebook = s.read.parquet(s"$cur/codebook").localCheckpoint()
    val oldCodes = s.read.parquet(s"$cur/codes")
      .filter(col("vec_id") < 10000000L).localCheckpoint()
    val gen = nextGen(cur, "gen-ing-")
    codebook.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/$gen/codebook")
    oldCodes.unionByName(pqEncode(novel, codebook))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/$gen/codes")
    graft.sources.Sources.publishGeneration(s, root, gen)
    val idx = graft.sources.Sources.currentGeneration(s, root)
    val counts = s.read.parquet(s"$idx/codes").agg(
      count(lit(1)).as("n_code_rows"),
      countDistinct(when(col("vec_id") >= 10000000L, col("vec_id")))
        .as("n_admitted"))
    val cbOk = s.read.parquet(s"$idx/codebook").agg(
      (count(lit(1)) <= pqSubs * pqK &&
        min(size(col("cw"))) === pqSubDim &&
        max(size(col("cw"))) === pqSubDim).as("codebook_ok"))
    counts.crossJoin(broadcast(cbOk))
      .select(col("n_code_rows"), col("n_admitted"), col("codebook_ok"))
  }

  // ---- q142/q143: SEGMENTED (LSM) index — O(delta) append + compaction ----

  private[graft] def pqSegRoot(d: String): String =
    graft.sources.Sources.scratch(d, "pq_index_seg")

  /** Segmented index layout: `<root>/codebook` is a single-generation
    * manifest root (the codebook is FROZEN after build — q122's contract),
    * and `<root>/codes` is a CUMULATIVE epoch-manifest root whose listed
    * dirs are code SEGMENTS. This is the LSM answer to the one scale flaw
    * left in the generational update verbs: q122/q126/q133/q136/q141 all
    * publish `old ∪ delta` as a fresh generation — correct and atomic, but
    * the write is O(corpus) PER APPEND. At 100 TB an append must cost
    * O(delta): here it encodes the delta with the frozen codebook and
    * commits ONLY those rows as a new segment dir plus one atomic manifest
    * swap (Sources.commitEpoch — the q123 exactly-once machinery, so a
    * redelivered batch is a no-op by committed-check, not by rewrite).
    * Readers resolve the manifest once and scan the union of listed
    * segments; ADC scoring is segment-invariant by construction (it
    * depends only on the (codebook, codes) SET, not their file layout).
    * The fixture drives one base segment (the encoded corpus) plus two
    * 100-vector appends (+10M ids — disjoint source ranges, so the target
    * ids never collide).
    */
  private[graft] def segEnsureAppends(s: SparkSession, d: String, root: String): Unit = {
    val cbRoot = s"$root/codebook"
    val codesRoot = s"$root/codes"
    val manifest = new org.apache.hadoop.fs.Path(s"$codesRoot/_current")
    val fs = manifest.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(manifest)) {
      val cb = pqCodebook(s, d).localCheckpoint()
      cb.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$cbRoot/gen-build")
      graft.sources.Sources.publishGeneration(s, cbRoot, "gen-build")
      graft.sources.Sources.commitEpoch(s, codesRoot,
        pqEncode(vecs(s, d).select(col("vec_id"), col("v")), cb), "seg-000-base")
    }
    val cb = graft.sources.Sources.readCurrent(s, cbRoot).localCheckpoint()
    val e = vecs(s, d).select(col("vec_id"), col("v"))
    def delta(lo: Int, hi: Int): DataFrame =
      e.filter(col("vec_id") >= lo && col("vec_id") < hi)
        .select((col("vec_id") + 10000000L).as("vec_id"), col("v"))
    graft.sources.Sources.commitEpoch(s, codesRoot, pqEncode(delta(0, 100), cb), "seg-001")
    graft.sources.Sources.commitEpoch(s, codesRoot, pqEncode(delta(100, 200), cb), "seg-002")
  }

  /** Serve the segmented index's CORPUS view (production tags segments
    * with source lineage; here the +10M id range is the lineage) and check
    * recall against the exact baseline — the segment union feeds the same
    * [[pqAdcTopK]] the monolithic artifacts use.
    */
  private def segServeCorpus(s: SparkSession, d: String, root: String): DataFrame =
    pqAdcTopK(s, d,
      graft.sources.Sources.readCurrent(s, s"$root/codebook").localCheckpoint(),
      graft.sources.Sources.readEpochs(s, s"$root/codes")
        .filter(col("vec_id") < 10000000L))

  /** Serve the base segmented root's corpus view ONCE per root and persist
    * the top-k table under it — q142's recall check reads it back, and
    * q143's compaction-invisibility proof compares against it instead of
    * paying a second full ADC serve (r16 verdict #7).
    */
  private def segTopkEnsure(s: SparkSession, d: String, root: String): String = {
    val path = s"$root/topk_precompact"
    val ok = new org.apache.hadoop.fs.Path(s"$path/_SUCCESS")
    val fs = ok.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(ok))
      segServeCorpus(s, d, root).write
        .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
    path
  }

  /** q142 registered row: segment count, total code rows, NEWEST-segment
    * rows (the O(delta) write proof: m·100, never m·corpus), and the
    * recall self-check served through the multi-segment read.
    */
  private[graft] def annSegmentAppend(s: SparkSession, d: String): DataFrame = {
    val root = pqSegRoot(d)
    segEnsureAppends(s, d, root)
    val segs = graft.sources.Sources.committedEpochs(s, s"$root/codes")
    val counts = graft.sources.Sources.readEpochs(s, s"$root/codes")
      .agg(count(lit(1)).as("n_code_rows"))
      .crossJoin(broadcast(
        s.read.parquet(s"$root/codes/${segs.last}")
          .agg(count(lit(1)).as("n_newest_rows"))))
    val served = s.read.parquet(segTopkEnsure(s, d, root))
    counts
      .crossJoin(broadcast(recallCheck(served, bruteTopK(s, d), 0.75)))
      .select(lit(segs.size.toLong).as("n_segments"), col("n_code_rows"),
        col("n_newest_rows"), col("n_exact"), col("recall_ok"))
  }

  /** q143: SEGMENT COMPACTION — the maintenance verb the LSM shape needs
    * (unchecked, a year of hourly appends is 8760 segment dirs and the
    * manifest list itself becomes the read-planning bottleneck). Reuses
    * the q129 epoch-compaction machinery verbatim: rewrite the union of
    * listed segments into ONE dir, swap in a manifest listing only it;
    * superseded dirs await TTL GC (q130's sweep). The registered row
    * proves the verb END-TO-END: the served top-k is computed BEFORE
    * compaction (materialized — the manifest is about to move) and AFTER,
    * and the two must agree EXACTLY (same (q_id, rank, n_id, cos) rows) —
    * ADC geometry depends only on the code set, so compaction must be
    * invisible to every query. Fresh root per run (q129 precedent):
    * compaction renames epochs, so pre-compaction segment names can't
    * anchor re-run idempotency.
    */
  private[graft] def annSegmentCompact(s: SparkSession, d: String): DataFrame = {
    // base index + its persisted pre-compaction top-k (one serve, shared
    // with q142 — r16 verdict #7 trimmed the second full serve this query
    // used to pay)
    val base = pqSegRoot(d)
    segEnsureAppends(s, d, base)
    val servedBefore = s.read.parquet(segTopkEnsure(s, d, base))
    // fresh compaction root per run (compaction renames epochs, so re-run
    // idempotency can't anchor on pre-compaction segment names) — built by
    // COPYING the base root's codebook + segments, never re-learning the
    // codebook or re-encoding the corpus: identical (codebook, codes) set
    // by construction, which is exactly the precondition of the
    // compaction-invisibility claim being proven
    val root = graft.sources.Sources.scratch(d, "pq_index_seg_cmp")
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(rootPath)) fs.delete(rootPath, true)
    graft.sources.Sources.readCurrent(s, s"$base/codebook")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/codebook/gen-build")
    graft.sources.Sources.publishGeneration(s, s"$root/codebook", "gen-build")
    val codesRoot = s"$root/codes"
    graft.sources.Sources.committedEpochs(s, s"$base/codes").foreach { e =>
      graft.sources.Sources.commitEpoch(s, codesRoot,
        s.read.parquet(s"$base/codes/$e"), e)
    }
    val nBefore = graft.sources.Sources.committedEpochs(s, codesRoot).size
    graft.sources.Sources.compactEpochs(s, codesRoot, 4)
    val nAfter = graft.sources.Sources.committedEpochs(s, codesRoot).size
    val cmp = servedBefore
      .select(col("q_id"), col("rank"), col("n_id").as("b_n"), col("cos").as("b_c"))
      .join(segServeCorpus(s, d, root)
        .select(col("q_id"), col("rank"), col("n_id").as("a_n"), col("cos").as("a_c")),
        Seq("q_id", "rank"), "full_outer")
      .agg(count(lit(1)).as("n_topk"),
        sum(when(col("b_n") <=> col("a_n") && col("b_c") <=> col("a_c"), 0L)
          .otherwise(1L)).as("n_mismatch"))
    cmp
      .crossJoin(broadcast(graft.sources.Sources.readEpochs(s, codesRoot)
        .agg(count(lit(1)).as("n_code_rows"))))
      .select(lit(nBefore.toLong).as("n_segments_before"),
        lit(nAfter.toLong).as("n_segments_after"), col("n_code_rows"),
        col("n_topk"), (col("n_mismatch") === 0L).as("topk_equal"))
  }

  // ---- q147: SemDeDup — semantic (embedding-space) cluster-then-dedup ----
  // Abbas et al. '23 (SemDeDup): k-means-cluster the embedding corpus, then
  // confirm cosine near-dups WITHIN clusters only — pair-generation cost
  // falls from n² to Σ|cluster|² (≈ n²/k balanced), the trick that makes
  // embedding dedup tractable at web scale. Precision is 1 by construction
  // (every emitted pair is exact-cosine-confirmed); the clustering only
  // costs RECALL (a τ-similar pair split across clusters is unseen), so the
  // query carries an in-query recall self-check against the exact
  // grid-blocked all-pairs baseline (q39's operator — reused, not
  // re-derived) plus a candidate-budget check, the q56 discipline.

  private val SemK = 16
  private val SemProbe = 3 // multi-probe: each vector joins its 3 nearest clusters
  private val SemTau = 0.4 // q39's threshold — its pair set IS the exact baseline
  private val SemRecallBound = 0.75
  // candidate pairs must stay under this fraction of all n(n-1)/2 pairs —
  // the structural proof the cluster join isn't quietly quadratic
  private val SemCandFrac = 0.6

  /** Single-row self-check: (n_exact, recall_ok, cand_bounded).
    *
    * Single-assignment (the paper's form) measures 0.24–0.37 recall on the
    * fixture embeddings at τ=0.4 — they are near-isotropic, the adversarial
    * case for cluster-locality — so each vector joins its `SemProbe`
    * nearest clusters instead (the IVF nprobe idea applied to BOTH sides).
    * Measured operating point (DebugSem sweep, k=16 p=3): recall 0.92
    * (sf0.01) / 0.82 (sf0.1) at candidate fraction 0.48 — half the pair
    * work of brute force on a corpus with no cluster structure to exploit,
    * and far less on a corpus that has it.
    * A pair sharing several probed clusters is emitted ONCE, at its
    * numerically-least shared cluster id — the q37 first-shared-band trick
    * (3-int array intersect per joined row) — so no corpus-pair `distinct`
    * exchange exists in the plan.
    *
    * 100 TB shape: centroids train on a hash-mod sample ([[ivfCentroids]] —
    * corpus-size-decoupled) and broadcast; assignment is one scan; the only
    * exchange keyed by cluster id carries (id, vector, 3 ints) — and a hot
    * cluster would take the q37 salted-band treatment (split its id across
    * salts, replicate the smaller side) before this ever ships to a real
    * corpus. The exact-baseline side exists for the self-check only and
    * would be dropped (or sampled) in production, exactly as q41/q56/q94
    * note.
    */
  /** Per-vector probe set (vec_id, v, cids): each corpus vector with its
    * `SemProbe` nearest centroid ids, SORTED so the least-shared-cluster
    * emission rule of [[semCandidates]] is well-defined.
    */
  private[graft] def semProbed(s: SparkSession, d: String): DataFrame =
    nearestCent(vecs(s, d).select(col("vec_id"), col("v")), ivfCentroids(s, d, SemK), SemProbe)
      .groupBy(col("vec_id"))
      .agg(first(col("v")).as("v"), array_sort(collect_list(col("cid"))).as("cids"))

  /** Candidate pairs of a probed corpus, each unordered pair emitted
    * EXACTLY ONCE — at its numerically-least shared cluster id (the q37
    * first-shared-band trick, here a 3-int array intersect per joined
    * row) — so no corpus-pair `distinct` exchange exists in the plan.
    * Suite-proven equal to the distinct-based form.
    */
  private[graft] def semCandidates(probed: DataFrame): DataFrame = {
    val side = probed.select(
      col("vec_id"), col("v"), col("cids"), explode(col("cids")).as("cid"))
    side
      .select(col("cid"), col("vec_id").as("a_id"), col("v").as("a_v"), col("cids").as("a_cids"))
      .join(
        side.select(col("cid"), col("vec_id").as("b_id"), col("v").as("b_v"), col("cids").as("b_cids")),
        Seq("cid"))
      .filter(col("a_id") < col("b_id"))
      .filter(col("cid") === array_min(array_intersect(col("a_cids"), col("b_cids"))))
      .select(col("a_id"), col("a_v"), col("b_id"), col("b_v"))
  }

  private[graft] def semDedup(s: SparkSession, d: String): DataFrame = {
    val e = vecs(s, d).select(col("vec_id"), col("v"))
    // probe set materialized once for both join sides
    val cand = semCandidates(semProbed(s, d).localCheckpoint())
    // one pass over candidates: total count + confirmed count together
    val stats = cand
      .withColumn("cos", call_function("cosine_sim", col("a_v"), col("b_v")))
      .agg(
        count(lit(1)).as("n_cand"),
        sum(when(col("cos") >= SemTau, 1L).otherwise(0L)).as("n_found"))
    val nVec = e.agg(count(lit(1)).as("n_vec"))
    Dedup.embeddingNeardup(s, d)
      .agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(nVec))
      .select(
        col("n_exact"),
        (col("n_found") >= lit(SemRecallBound) * col("n_exact")).as("recall_ok"),
        // 2·n_cand ≤ frac·n(n-1)  ⇔  n_cand ≤ frac·n(n-1)/2, exact integers
        (col("n_cand") * 2 <= lit(SemCandFrac) * col("n_vec") * (col("n_vec") - 1))
          .as("cand_bounded"))
  }

  val entries: Seq[Entry] = Seq(
    Entry(
      "q40_cosine_topk",
      bruteTopK,
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              |q AS (SELECT vec_id AS q_id, v AS q_v FROM e WHERE vec_id < $nQueries),
              |s AS (SELECT q.q_id, e.vec_id AS n_id,
              |        list_cosine_similarity(q.q_v, e.v) AS cos
              |      FROM q JOIN e ON e.vec_id <> q.q_id),
              |r AS (SELECT q_id, n_id, cos,
              |        CAST(row_number() OVER (PARTITION BY q_id
              |          ORDER BY cos DESC, n_id) AS BIGINT) AS rank
              |      FROM s)
              |SELECT q_id, rank, n_id, round(cos,4) AS cos
              |FROM r WHERE rank <= $topK ORDER BY q_id, rank""".stripMargin)),

    // q41: sign-LSH ANN (see annCandidates doc for the operating point),
    // registered as its recall self-check vs the exact baseline PLUS the
    // candidate-fraction budget check — both driver-checkable booleans. q56's
    // IVF remains the recommended ANN (it adapts to the data); q41 is the
    // data-INDEPENDENT-index variant: no training stage, signature computable
    // the moment a vector is ingested, which is what you want for streaming
    // ingest or when the corpus distribution drifts. DedupSimilaritySuite
    // additionally asserts recall and candidate fraction on the raw outputs.
    Entry(
      "q41_ann_lsh",
      (s, d) => {
        val rc = recallCheck(annTopK(s, d), bruteTopK(s, d), 0.75)
        val nCand = annCandidates(s, d).agg(count(lit(1)).as("n_cand"))
        val nVec = vecs(s, d).agg(count(lit(1)).as("n_vec"))
        // all three sides are 1-row aggregates — broadcast-combine them
        rc.crossJoin(broadcast(nCand)).crossJoin(broadcast(nVec))
          .select(
            col("n_exact"),
            col("recall_ok"),
            (col("n_cand") / (lit(nQueries) * (col("n_vec") - 1)) <= AnnCandBudget)
              .as("cand_ok"))
      },
      Some(s"""SELECT CAST($topK * count(*) AS BIGINT) AS n_exact,
              |  TRUE AS recall_ok, TRUE AS cand_ok
              |FROM embeddings WHERE vec_id < $nQueries""".stripMargin)),

    // q56: IVF coarse-quantizer ANN (see ivfTopK doc) — the recommended ANN
    // path; registered as its recall self-check vs the exact baseline.
    Entry(
      "q56_ann_ivf",
      (s, d) => recallCheck(ivfTopK(s, d), bruteTopK(s, d), 0.8),
      Some(recallOracle)),

    // q94: PQ ANN — encode, ADC-score, re-rank (see pqCodebook/pqTopK docs).
    // Registered like q41/q56: recall vs the in-query exact baseline, bound
    // chosen with margin under the measured recall at all three SFs.
    Entry(
      "q94_ann_pq",
      (s, d) => recallCheck(pqTopK(s, d), bruteTopK(s, d), 0.75),
      Some(recallOracle)),

    // q108: ANN INDEX BUILD — train + encode + ATOMIC PUBLISH of the PQ
    // index artifact (see pqIndexBuild). The manifest row is read back
    // THROUGH the published generation, so a pass proves the publish cycle:
    // n_code_rows counts the artifact's codes parquet (must be m=8 per
    // vector), codebook_ok bounds the codebook read from the artifact
    // (≤ m·ks rows, every codeword 8-dim).
    Entry(
      "q108_ann_index_build",
      (s, d) => {
        pqIndexBuild(s, d)
        val idx = graft.sources.Sources.currentGeneration(s, pqIndexRoot(d))
        val nVec = vecs(s, d).agg(count(lit(1)).as("n_vecs"))
        val nCodes = s.read.parquet(s"$idx/codes")
          .agg(count(lit(1)).as("n_code_rows"))
        val cbOk = s.read.parquet(s"$idx/codebook")
          .agg(
            (count(lit(1)) <= pqSubs * pqK &&
              min(size(col("cw"))) === pqSubDim &&
              max(size(col("cw"))) === pqSubDim).as("codebook_ok"))
        // three 1-row aggregates — broadcast-combine (the q41 shape)
        nVec.crossJoin(broadcast(nCodes)).crossJoin(broadcast(cbOk))
          .select(col("n_vecs"), col("n_code_rows"), col("codebook_ok"))
      },
      Some(s"""SELECT count(*) AS n_vecs,
              |  CAST($pqSubs * count(*) AS BIGINT) AS n_code_rows,
              |  TRUE AS codebook_ok
              |FROM embeddings""".stripMargin)),

    // q109: ANN INDEX SERVE — the query path a production ANN runs per
    // request: resolve the manifest, read codebook + codes from the
    // artifact, ADC-score + re-rank. NO training stage in the plan
    // (suite-asserted); recall vs the exact baseline must clear the same
    // bound as the in-query q94 (the codebook is deterministic, so serving
    // from the artifact loses nothing).
    Entry(
      "q109_ann_index_serve",
      (s, d) => recallCheck(pqIndexServe(s, d), bruteTopK(s, d), 0.75),
      Some(recallOracle)),

    // q122: ANN INDEX INCREMENTAL UPDATE (see pqIndexUpdate) — the manifest
    // row is read back THROUGH the updated generation: total code rows must
    // be m·(n+100) (old corpus plus the 100-vector delta), the delta must
    // appear exactly once (idempotency — re-running the update cannot
    // double-append), and the codebook read from the NEW generation must
    // still be the frozen build shape (no retraining happened).
    Entry(
      "q122_ann_index_update",
      (s, d) => {
        pqIndexUpdate(s, d)
        val idx = graft.sources.Sources.currentGeneration(s, pqIndexUpdRoot(d))
        val codes = s.read.parquet(s"$idx/codes")
        val counts = codes.agg(
          count(lit(1)).as("n_code_rows"),
          countDistinct(when(col("vec_id") >= 10000000L, col("vec_id")))
            .as("n_new_vecs"))
        val cbOk = s.read.parquet(s"$idx/codebook")
          .agg(
            (count(lit(1)) <= pqSubs * pqK &&
              min(size(col("cw"))) === pqSubDim &&
              max(size(col("cw"))) === pqSubDim).as("codebook_ok"))
        counts.crossJoin(broadcast(cbOk))
          .select(col("n_code_rows"), col("n_new_vecs"), col("codebook_ok"))
      },
      Some(s"""SELECT CAST($pqSubs * (count(*) + 100) AS BIGINT) AS n_code_rows,
              |  CAST(100 AS BIGINT) AS n_new_vecs,
              |  TRUE AS codebook_ok
              |FROM embeddings""".stripMargin)),

    // q126: ANN INDEX DELETE (see pqIndexDelete) — completes the lifecycle
    // (build / serve / update / DELETE). Read back THROUGH the post-delete
    // manifest: total code rows must be m·(n − 100) (the tombstoned batch
    // gone), zero code rows for any deleted vec_id, and serving from the
    // shrunken index must still clear the same recall bound against the
    // exact baseline computed over SURVIVORS (deleting vectors must not
    // degrade retrieval of what remains — the codebook is frozen, so the
    // ADC geometry of surviving codes is untouched by construction).
    Entry(
      "q126_ann_index_delete",
      (s, d) => {
        pqIndexDelete(s, d)
        val idx = graft.sources.Sources.currentGeneration(s, pqIndexDelRoot(d))
        val codes = s.read.parquet(s"$idx/codes")
        val counts = codes.agg(
          count(lit(1)).as("n_code_rows"),
          sum(when(isDeleted(col("vec_id")), 1L).otherwise(0L))
            .as("n_deleted_present"))
        val serve = recallCheck(
          pqAdcTopK(s, d, s.read.parquet(s"$idx/codebook"), codes),
          bruteTopKWhere(s, d, !isDeleted(col("vec_id"))),
          0.75)
        counts.crossJoin(broadcast(serve))
          .select(col("n_code_rows"), col("n_deleted_present"),
            col("n_exact"), col("recall_ok"))
      },
      Some(s"""SELECT
              |  CAST($pqSubs * sum(CASE WHEN vec_id >= $delLo AND vec_id < $delHi
              |    THEN 0 ELSE 1 END) AS BIGINT) AS n_code_rows,
              |  CAST(0 AS BIGINT) AS n_deleted_present,
              |  CAST($topK * $nQueries AS BIGINT) AS n_exact,
              |  TRUE AS recall_ok
              |FROM embeddings""".stripMargin)),

    // q130: ANN INDEX GENERATION GC (see pqIndexGc) — the retention verb
    // closing the artifact lifecycle: two updates stack three generation
    // dirs on disk (one current, two superseded); the TTL sweep removes
    // exactly the unlisted ones, the served index is untouched (code-row
    // accounting re-proven through the post-GC manifest). Runs on its own
    // root; deterministic across re-runs because each update re-converges
    // to the same content under a fresh generation name.
    Entry(
      "q130_ann_index_gc",
      (s, d) => {
        val root = pqIndexGcRoot(d)
        pqIndexUpdate(s, d, Some(root))
        pqIndexUpdate(s, d, Some(root))
        def genDirs(): Long = {
          val rp = new org.apache.hadoop.fs.Path(root)
          rp.getFileSystem(s.sparkContext.hadoopConfiguration)
            .listStatus(rp).count(_.isDirectory).toLong
        }
        val before = genDirs()
        val removed = pqIndexGc(s, root, ttlMs = 0L)
        val after = genDirs()
        val idx = graft.sources.Sources.currentGeneration(s, root)
        s.read.parquet(s"$idx/codes")
          .agg(
            count(lit(1)).as("n_code_rows"),
            countDistinct(when(col("vec_id") >= 10000000L, col("vec_id")))
              .as("n_new_vecs"))
          .select(
            lit(before == 3L && removed == 2L && after == 1L).as("gc_ok"),
            col("n_code_rows"), col("n_new_vecs"))
      },
      Some(s"""SELECT TRUE AS gc_ok,
              |  CAST($pqSubs * (count(*) + 100) AS BIGINT) AS n_code_rows,
              |  CAST(100 AS BIGINT) AS n_new_vecs
              |FROM embeddings""".stripMargin)),

    // q92: INT8 SYMMETRIC QUANTIZATION of the embedding column — the ANN
    // storage/serving primitive (8× smaller vectors; IVF/PQ pipelines
    // quantize exactly like this before indexing). Per vector: scale =
    // max|x|/127, q_i = floor(x_i·127 / max|x|) — floor, not round,
    // because floor(double) is bit-identical across engines while
    // round()'s half-tie semantics are not. Output is INTEGER-ONLY per
    // label (vector count, sum of quantized components, clip count), so
    // the oracle match is exact with no float-boundary risk. One scan,
    // per-row HOFs, no shuffle beyond the final small groupBy.
    Entry(
      "q92_embedding_quantize",
      (s, d) =>
        vecs(s, d)
          .withColumn("ma", expr("array_max(transform(v, x -> abs(x)))"))
          .withColumn("q",
            expr("transform(v, x -> CASE WHEN ma = 0D THEN 0L ELSE floor(x * 127 / ma) END)"))
          .groupBy(col("label").cast("long").as("label"))
          .agg(
            count(lit(1)).as("n_vecs"),
            sum(expr("aggregate(q, 0L, (acc, x) -> acc + x)")).as("q_sum"),
            sum(expr("size(filter(q, y -> abs(y) >= 127))").cast("long")).as("n_clip"))
          .orderBy(col("label")),
      Some("""WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |m AS (SELECT label, v, list_max(list_transform(v, x -> abs(x))) AS ma FROM e),
             |z AS (SELECT label,
             |    list_transform(v, x -> CASE WHEN ma = 0 THEN 0 ELSE floor(x * 127 / ma) END) AS q
             |  FROM m)
             |SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vecs,
             |  CAST(sum(list_sum(q)) AS BIGINT) AS q_sum,
             |  CAST(sum(len(list_filter(q, y -> abs(y) >= 127))) AS BIGINT) AS n_clip
             |FROM z GROUP BY 1 ORDER BY 1""".stripMargin)),

    // q42: vector-norm statistics per label — `aggregate` HOF dot product,
    // strictly sequential accumulation to stay bit-identical with the oracle.
    Entry(
      "q42_embedding_stats",
      (s, d) =>
        vecs(s, d)
          .withColumn(
            "norm",
            sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))
          .groupBy(col("label").cast("long").as("label"))
          .agg(
            count(lit(1)).as("n"),
            round(avg(col("norm")), 4).as("avg_norm"),
            round(min(col("norm")), 4).as("min_norm"),
            round(max(col("norm")), 4).as("max_norm"))
          .orderBy(col("label")),
      Some("""WITH n AS (SELECT CAST(label AS BIGINT) AS label,
             |  sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x))) AS norm
             | FROM embeddings)
             |SELECT label, count(*) AS n, round(avg(norm),4) AS avg_norm,
             | round(min(norm),4) AS min_norm, round(max(norm),4) AS max_norm
             |FROM n GROUP BY label ORDER BY label""".stripMargin)),

    // q141: ANN INGEST (see annIngest) — near-dup-gated vector admission,
    // the ANN counterpart of the dedup ingest loop q138. Oracle replays
    // the batch fabrication and the brute-force cosine classification.
    Entry(
      "q141_ann_ingest",
      (s, d) => annIngest(s, d),
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              |b AS (
              |  SELECT vec_id + 10000000 AS new_id, v FROM e WHERE vec_id % 2 = 0
              |  UNION ALL
              |  SELECT vec_id + 20000000 AS new_id,
              |    list_transform(v, x -> -x) AS v FROM e WHERE vec_id % 2 = 1),
              |m AS (SELECT DISTINCT b.new_id FROM b CROSS JOIN e
              |  WHERE list_cosine_similarity(b.v, e.v) >= 0.99)
              |SELECT CAST($pqSubs * ((SELECT count(*) FROM e)
              |    + (SELECT count(*) FROM b) - (SELECT count(*) FROM m))
              |    AS BIGINT) AS n_code_rows,
              |  CAST((SELECT count(*) FROM b) - (SELECT count(*) FROM m)
              |    AS BIGINT) AS n_admitted,
              |  TRUE AS codebook_ok""".stripMargin)),

    // q142: SEGMENTED INDEX APPEND (see segEnsureAppends) — the O(delta)
    // update the generational verbs lack: a new batch lands as ONE segment
    // dir (m·|delta| rows) + one atomic manifest swap, never an O(corpus)
    // codes rewrite. n_newest_rows pins the write cost; the recall check
    // serves through the 3-segment read.
    Entry(
      "q142_ann_segment_append",
      (s, d) => annSegmentAppend(s, d),
      Some(s"""SELECT CAST(3 AS BIGINT) AS n_segments,
              |  CAST($pqSubs * (count(*) + 200) AS BIGINT) AS n_code_rows,
              |  CAST($pqSubs * 100 AS BIGINT) AS n_newest_rows,
              |  CAST($topK * $nQueries AS BIGINT) AS n_exact,
              |  TRUE AS recall_ok
              |FROM embeddings""".stripMargin)),

    // q143: SEGMENT COMPACTION (see annSegmentCompact) — q129's epoch
    // compaction applied to the LSM index: 3 segments → 1, zero code rows
    // lost, and the served top-k provably IDENTICAL before and after.
    Entry(
      "q143_ann_segment_compact",
      (s, d) => annSegmentCompact(s, d),
      Some(s"""SELECT CAST(3 AS BIGINT) AS n_segments_before,
              |  CAST(1 AS BIGINT) AS n_segments_after,
              |  CAST($pqSubs * (count(*) + 200) AS BIGINT) AS n_code_rows,
              |  CAST($topK * $nQueries AS BIGINT) AS n_topk,
              |  TRUE AS topk_equal
              |FROM embeddings""".stripMargin)),

    // q147: SemDeDup (see semDedup) — the oracle brute-forces the exact
    // τ-pair count; recall/candidate-budget booleans are the q56-style
    // in-query self-checks the driver verifies as literals.
    Entry(
      "q147_semdedup",
      (s, d) => semDedup(s, d),
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              |    FROM embeddings)
              |SELECT CAST(count(*) AS BIGINT) AS n_exact,
              |  TRUE AS recall_ok, TRUE AS cand_bounded
              |FROM e a JOIN e b ON a.vec_id < b.vec_id
              |WHERE list_cosine_similarity(a.v, b.v) >= $SemTau""".stripMargin)),

    // q174: HARD-NEGATIVE MINING — the contrastive/metric-learning batch
    // prep (triplet mining): for each query vector, the top-5 most-similar
    // vectors of a DIFFERENT label (the negatives a retriever most needs
    // to learn to separate), each with the query's nearest SAME-label
    // positive alongside and the triplet margin pos_cos − neg_cos (margin
    // ≤ 0 = an active triplet that produces gradient). One corpus pass:
    // the 8-query side broadcasts (bounded by construction — the q40
    // shape), both the negative top-5 and the positive top-1 come from
    // the SAME scored stream via two rank windows keyed (q_id ×
    // label-match), each compiling to WindowGroupLimit; ranking is raw
    // cosine with n_id tie-break (the proven q40 cross-engine posture),
    // rounding only at emission.
    Entry(
      "q174_hard_negatives",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(
            col("vec_id"),
            col("embedding").cast("array<double>").as("v"),
            col("label"))
        val q = e.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("q_id"), col("v").as("q_v"), col("label").as("q_label"))
        val scored = e
          .select(col("vec_id").as("n_id"), col("v").as("n_v"), col("label").as("n_label"))
          .crossJoin(broadcast(q))
          .filter(col("q_id") =!= col("n_id"))
          .withColumn("cos", call_function("cosine_sim", col("q_v"), col("n_v")))
        val wNeg = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
        val negs = scored
          .filter(col("n_label") =!= col("q_label"))
          .withColumn("rank", row_number().over(wNeg).cast("long"))
          .filter(col("rank") <= topK)
          .select(col("q_id"), col("rank"), col("n_id"), col("cos").as("neg_cos"))
        val pos = scored
          .filter(col("n_label") === col("q_label"))
          .withColumn("prank", row_number().over(wNeg))
          .filter(col("prank") === 1)
          .select(col("q_id"), col("n_id").as("pos_id"), col("cos").as("pos_cos"))
        // no broadcast hint on pos: it derives from the corpus-sized scored
        // stream (the hint-policy suite bans forced broadcasts of such
        // subtrees) — at runtime it is nQueries rows and AQE broadcasts it
        negs.join(pos, Seq("q_id"))
          .select(
            col("q_id"), col("rank"), col("n_id"),
            round(col("neg_cos"), 4).as("neg_cos"),
            col("pos_id"),
            round(col("pos_cos"), 4).as("pos_cos"),
            round(col("pos_cos") - col("neg_cos"), 4).as("margin"))
          .orderBy(col("q_id"), col("rank"))
      },
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
              |  FROM embeddings),
              |q AS (SELECT vec_id AS q_id, v AS q_v, label AS q_label
              |  FROM e WHERE vec_id < $nQueries),
              |s AS (SELECT q.q_id, q.q_label, e.vec_id AS n_id, e.label AS n_label,
              |    list_cosine_similarity(q.q_v, e.v) AS cos
              |  FROM q JOIN e ON e.vec_id <> q.q_id),
              |n AS (SELECT q_id, n_id, cos,
              |    CAST(row_number() OVER (PARTITION BY q_id
              |      ORDER BY cos DESC, n_id) AS BIGINT) AS rank
              |  FROM s WHERE n_label <> q_label),
              |p AS (SELECT q_id, n_id AS pos_id, cos AS pos_cos,
              |    row_number() OVER (PARTITION BY q_id
              |      ORDER BY cos DESC, n_id) AS prank
              |  FROM s WHERE n_label = q_label)
              |SELECT n.q_id, n.rank, n.n_id, round(n.cos, 4) AS neg_cos,
              |  p.pos_id, round(p.pos_cos, 4) AS pos_cos,
              |  round(p.pos_cos - n.cos, 4) AS margin
              |FROM n JOIN p ON n.q_id = p.q_id AND p.prank = 1
              |WHERE n.rank <= $topK ORDER BY n.q_id, n.rank""".stripMargin)),

    // q285: IVF-PQ COMPOSED ANN (see ivfpqTopK) — the production index
    // shape q56 and q94 each implement half of: route to nprobe cells,
    // ADC-score in-cell, exact re-rank. Registered q41-style: recall vs
    // the exact baseline AND the routed-candidate budget, both
    // driver-checkable booleans; the suite asserts the raw numbers.
    Entry(
      "q285_ann_ivfpq",
      (s, d) => {
        val cand = ivfpqCandIds(s, d)
          .localCheckpoint() // consumers: serve path + budget count
        val rc = recallCheck(ivfpqTopKFrom(s, d, cand), bruteTopK(s, d), 0.75)
        val nCand = cand.agg(count(lit(1)).as("n_cand"))
        val nVec = vecs(s, d).agg(count(lit(1)).as("n_vec"))
        rc.crossJoin(broadcast(nCand)).crossJoin(broadcast(nVec))
          .select(
            col("n_exact"),
            col("recall_ok"),
            (col("n_cand") / (lit(nQueries) * (col("n_vec") - 1)) <= 0.25)
              .as("cand_ok"))
      },
      Some(s"""SELECT CAST($topK * count(*) AS BIGINT) AS n_exact,
              |  TRUE AS recall_ok, TRUE AS cand_ok
              |FROM embeddings WHERE vec_id < $nQueries""".stripMargin))
  )

  /** ADC + exact re-rank with the QUERY side from generation `dq` and the
    * NEIGHBOR/re-rank side from generation `dOld` — [[pqAdcTopK]] across a
    * corpus swap. No self-exclusion: the two generations are different
    * namespaces (a numerically equal vec_id names different vectors), and
    * when dq == dOld (the suite's fixed point) each query's rank-1 hit is
    * legitimately itself at cos 1.0 on BOTH the ADC and brute sides.
    */
  private def pqAdcTopKCross(
      s: SparkSession, dq: String, dOld: String,
      codebook: DataFrame, codes: DataFrame): DataFrame = {
    val q = vecs(s, dq).select(col("vec_id"), col("v"))
      .filter(col("vec_id") < nQueries)
    val n = vecs(s, dOld).select(col("vec_id"), col("v"))
    val qdots = pqSlices(q, "vec_id")
      .join(broadcast(codebook), Seq("sub"))
      .withColumn("dot", dotC("sv", "cw"))
      .select(col("vec_id").as("q_id"), col("sub"), col("cid"), col("dot"))
    val wc = Window.partitionBy(col("q_id")).orderBy(col("adc").desc, col("n_id"))
    val cand = codes
      .join(broadcast(qdots), Seq("sub", "cid"))
      .groupBy(col("q_id"), col("vec_id").as("n_id"))
      .agg(sum(col("dot")).as("adc"))
      .withColumn("crk", row_number().over(wc))
      .filter(col("crk") <= pqCandK)
      .select(col("q_id"), col("n_id"))
    val wr = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    cand
      .join(q.select(col("vec_id").as("q_id"), col("v").as("q_v")), Seq("q_id"))
      .join(n.select(col("vec_id").as("n_id"), col("v").as("n_v")), Seq("n_id"))
      .withColumn("cos", call_function("cosine_sim", col("q_v"), col("n_v")))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Exact brute cross-generation baseline for [[pqAdcTopKCross]]. */
  private[graft] def bruteTopKCross(
      s: SparkSession, dq: String, dOld: String): DataFrame = {
    val q = vecs(s, dq).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    vecs(s, dOld).select(col("vec_id").as("n_id"), col("v").as("n_v"))
      .crossJoin(broadcast(q))
      .withColumn("cos", call_function("cosine_sim", col("q_v"), col("n_v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** q302 body: PQ artifact built ONCE from the sf0.001 embeddings
    * generation, served against queries from the CURRENT generation.
    */
  private[graft] def annCrossCorpus(s: SparkSession, d: String): DataFrame = {
    val old = Transforms.siblingBuildCorpus(d)
    val root = graft.sources.Sources.scratch(d, "cross_gen_ann")
    val manifest = new org.apache.hadoop.fs.Path(s"$root/_current")
    val fs = manifest.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(manifest)) {
      val cb = pqCodebook(s, old).localCheckpoint()
      cb.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$root/gen-build/codebook")
      pqEncode(vecs(s, old).select(col("vec_id"), col("v")), cb)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$root/gen-build/codes")
      graft.sources.Sources.publishGeneration(s, root, "gen-build")
    }
    val cur = graft.sources.Sources.currentGeneration(s, root)
    val cb = s.read.parquet(s"$cur/codebook").localCheckpoint()
    val codes = s.read.parquet(s"$cur/codes")
    val served = pqAdcTopKCross(s, d, old, cb, codes)
    recallCheck(served, bruteTopKCross(s, d, old), 0.6)
      .crossJoin(broadcast(codes.agg(count(lit(1)).as("n_index_rows"))))
      .select(col("n_index_rows"), col("n_exact"), col("recall_ok"))
  }

  /** Round-17 batch (JVM method-size discipline, the entries2 precedent). */
  val entries2: Seq[Entry] = Seq(

    // q302: CROSS-GENERATION ANN SERVE — q299's artifact-outlives-its-
    // corpus contract for the ANN family: the PQ index (frozen codebook +
    // codes, the q108/q109 artifact shape) is built ONCE from the sf0.001
    // embeddings GENERATION and answers queries from the CURRENT
    // generation — vectors the index has never seen, which is what
    // retrieval serving actually looks like (every other ANN entry
    // self-queries its own corpus). ADC candidates + exact re-rank against
    // the OLD corpus vectors; recall self-checked against the exact brute
    // cross-generation baseline at 0.6 (the bound holds at all three gate
    // SFs; cross-generation queries sit in the isotropic bulk, the
    // sign-LSH-hostile regime q41 documents — PQ-ADC with 16×topK
    // candidates clears it with margin). At the suite's sf0.001 the two
    // generations coincide and rank-1 is each query itself at cos 1.0 on
    // both sides — the fixed point the suite pins. At 100 TB this is the
    // operational shape: the index is rebuilt on the corpus cadence
    // (weekly), queries arrive from every LATER corpus and product
    // surface; nothing about the serve plan references the build corpus
    // except through the published artifact (suite-pinned scans).
    Entry(
      "q302_ann_cross_corpus",
      (s, d) => annCrossCorpus(s, d),
      Some(s"""SELECT CAST($pqSubs * (SELECT count(*)
              |    FROM '/root/testdata/sf0.001/embeddings.parquet')
              |    AS BIGINT) AS n_index_rows,
              |  CAST($topK * $nQueries AS BIGINT) AS n_exact,
              |  TRUE AS recall_ok""".stripMargin))
  )

  /** Round-18: embedding deployment-side quantization. */
  val entries3: Seq[Entry] = Seq(

    // q326: INT8 QUANTIZATION AUDIT — the deploy decision every embedding
    // serving stack makes (4× memory/bandwidth for how much error?):
    // symmetric int8 with a POWER-OF-TWO scale (2^-8), so quantize /
    // dequantize are exact dyadic arithmetic — the only float op per
    // component is one floor(|v − q/256|·2^20), identical IEEE both
    // engines; everything after is integer (max, Σe², clip counts, and an
    // order-dependent per-vector digest of the quantized codes). The
    // round is floor(x·256 + 0.5) — branchless, no round-half-to-even
    // cross-engine hazard. Scale 2^-8 is chosen so the fixture genuinely
    // CLIPS (|v|max ≈ 0.53 > 127/256 at sf0.01+) — the saturation
    // accounting is exercised, not vacuous. One map pass over the
    // array column (codegen HOFs: transform/zip_with/aggregate — no
    // explode, rows never widen), one ≤10-row label rollup.
    Entry(
      "q326_int8_quant_audit",
      (s, d) => {
        val P = 2147483647L
        Tables.embeddings(s, d)
          .withColumn("qr", expr("transform(embedding, v -> " +
            "CAST(floor(CAST(v AS DOUBLE) * 256D + 0.5D) AS BIGINT))"))
          .withColumn("qc", expr("transform(qr, q -> " +
            "least(greatest(q, -127L), 127L))"))
          .withColumn("eq", expr("zip_with(embedding, qc, (v, q) -> " +
            "CAST(floor(abs(CAST(v AS DOUBLE) - CAST(q AS DOUBLE) / 256D) " +
            "* 1048576D) AS BIGINT))"))
          .select(col("label"),
            expr("CAST(size(filter(qr, q -> q > 127L OR q < -127L)) " +
              "AS BIGINT)").as("nclip"),
            expr(s"aggregate(qc, 0L, (a, q) -> (a * 131L + q + 128L) % ${P}L)")
              .as("dg"),
            expr("array_max(eq)").as("maxe"),
            expr("aggregate(eq, 0L, (a, x) -> a + x * x)").as("se2"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(col("nclip")).as("n_clipped"),
            max(col("maxe")).as("max_err_q20"),
            sum(col("se2")).as("sum_err2"),
            pmod(sum(col("dg")), lit(P)).as("q_digest"))
          .orderBy(col("label"))
      },
      Some("""WITH e AS (SELECT label, vec_id, embedding FROM embeddings),
             |v AS (SELECT label, vec_id, embedding,
             |    list_transform(range(1, 65), i ->
             |      CAST(floor(CAST(embedding[i] AS DOUBLE) * 256 + 0.5)
             |        AS BIGINT)) AS qr
             |  FROM e),
             |m AS (SELECT label, embedding, qr,
             |    list_transform(qr, q -> least(greatest(q, -127), 127)) AS qc
             |  FROM v),
             |s AS (SELECT label,
             |    len(list_filter(qr, q -> q > 127 OR q < -127)) AS nclip,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(qc, q -> q + 128)),
             |      (a, x) -> (a * 131 + x) % 2147483647) AS dg,
             |    list_max(list_transform(range(1, 65), i ->
             |      CAST(floor(abs(CAST(embedding[i] AS DOUBLE)
             |        - CAST(qc[i] AS DOUBLE) / 256) * 1048576) AS BIGINT)))
             |      AS maxe,
             |    list_sum(list_transform(range(1, 65), i ->
             |      CAST(floor(abs(CAST(embedding[i] AS DOUBLE)
             |        - CAST(qc[i] AS DOUBLE) / 256) * 1048576) AS BIGINT)
             |      * CAST(floor(abs(CAST(embedding[i] AS DOUBLE)
             |        - CAST(qc[i] AS DOUBLE) / 256) * 1048576) AS BIGINT)))
             |      AS se2
             |  FROM m)
             |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
             |  CAST(sum(nclip) AS BIGINT) AS n_clipped,
             |  CAST(max(maxe) AS BIGINT) AS max_err_q20,
             |  CAST(sum(se2) AS BIGINT) AS sum_err2,
             |  CAST(sum(dg) % 2147483647 AS BIGINT) AS q_digest
             |FROM s GROUP BY label ORDER BY label""".stripMargin))
  )
}
