package graft.operators

import graft.Tables
import graft.queries.Entry
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

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
  private[graft] def bruteTopK(s: SparkSession, d: String): DataFrame = {
    val e = vecs(s, d)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    e.select(col("vec_id").as("n_id"), col("v").as("n_v"))
      .crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", call_function("cosine_sim", col("q_v"), col("n_v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** LSH-bucketed ANN: candidates share ≥1 random-hyperplane band key, then
    * exact cosine + top-k within candidates only.
    *
    * Parameter note (measured on the fixtures): the synthetic embeddings are
    * near-isotropic — true top-5 neighbors sit at cos≈0.3, where sign-LSH
    * separates weakly, so 10 bands × 4 bits buys recall≈0.75 at a ~0.5
    * candidate fraction. On real (clustered) embedding spaces the same band
    * join prunes orders of magnitude harder at equal recall; tune
    * planes/bands per corpus — more bits/band = fewer candidates, more bands
    * = higher recall.
    */
  private[graft] def annTopK(s: SparkSession, d: String): DataFrame = {
    val banded = vecs(s, d)
      .select(
        col("vec_id"),
        col("v"),
        explode(call_function("rhp_bands", col("v"), lit(40), lit(10), lit(42L))).as("band"))
    val q = banded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"), col("band"))
    val cand = banded
      .select(col("vec_id").as("n_id"), col("v").as("n_v"), col("band"))
      .join(broadcast(q), Seq("band"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("q_v"), col("n_id"), col("n_v"))
      .distinct()
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    cand
      .withColumn("cos", call_function("cosine_sim", col("q_v"), col("n_v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** IVF-style ANN: a coarse quantizer (k centroids, deterministic seed =
    * first k vectors + one Lloyd refinement, all in DataFrame ops) buckets
    * the corpus; queries probe their `nprobe` nearest centroids and run
    * exact cosine only inside those buckets.
    *
    * Measured on the fixtures this dominates sign-LSH (q41): recall≈0.93 at
    * a ~0.25 candidate fraction vs 0.75@0.5 — IVF adapts to the data where
    * fixed hyperplanes can't. At 100 TB: train on a sample, broadcast the
    * k×d centroid table (tiny), assignment is one scan, and candidate
    * generation is an equi-join on bucket id.
    */
  private[graft] def ivfTopK(s: SparkSession, d: String): DataFrame = {
    val k = 16
    val nprobe = 4
    val e = vecs(s, d).select(col("vec_id"), col("v"))

    def nearest(points: DataFrame, cents: DataFrame, keep: Int): DataFrame = {
      val w = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
      points.crossJoin(broadcast(cents))
        .withColumn("ccos", call_function("cosine_sim", col("v"), col("cv")))
        .withColumn("crk", row_number().over(w))
        .filter(col("crk") <= keep)
    }

    // seed centroids: the first k vectors; one Lloyd round: assign all
    // vectors, then element-wise mean per cluster (posexplode + struct-sorted
    // regroup keeps the array order exact).
    val seeds = e.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cid"), col("v").as("cv"))
    val assigned = nearest(e, seeds, 1).select(col("cid"), col("v"))
    val centroids = assigned
      .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("x"))
      .groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("x")))),
        st => st.getField("x")).as("cv"))

    val bucketed = nearest(e, centroids, 1)
      .select(col("vec_id"), col("v"), col("cid").as("bucket"))
    val probes = nearest(e.filter(col("vec_id") < nQueries), centroids, nprobe)
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

    // q41: sign-LSH ANN, registered as its recall self-check vs the exact
    // baseline (driver-checkable; see recallCheck). On this isotropic
    // fixture the pruning is parameter-weak — q56's IVF is the recommended
    // ANN (higher recall at a quarter of the candidates); q41 remains the
    // data-independent-index variant. DedupSimilaritySuite additionally
    // asserts recall on the raw annTopK output.
    Entry(
      "q41_ann_lsh",
      (s, d) => recallCheck(annTopK(s, d), bruteTopK(s, d), 0.6),
      Some(recallOracle)),

    // q56: IVF coarse-quantizer ANN (see ivfTopK doc) — the recommended ANN
    // path; registered as its recall self-check vs the exact baseline.
    Entry(
      "q56_ann_ivf",
      (s, d) => recallCheck(ivfTopK(s, d), bruteTopK(s, d), 0.8),
      Some(recallOracle)),

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
             |FROM n GROUP BY label ORDER BY label""".stripMargin))
  )
}
