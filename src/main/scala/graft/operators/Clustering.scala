package graft.operators

import graft.Tables
import graft.queries.Entry
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed clustering over the embedding corpus.
  *
  * The production shape this models: Lloyd's k-means over billions of
  * embedding vectors is THE workhorse of training-data curation — SemDeDup
  * (q147) needs cluster assignments, IVF (q109) needs a codebook,
  * DSIR-style domain balancing needs per-cluster counts. At 100 TB the
  * algorithm is embarrassingly Spark-shaped: the k centroids broadcast
  * (k·dim ≪ executor memory), assignment is a map-side argmin over the
  * broadcast table, and the centroid update is one partial-aggregated
  * shuffle keyed on (cluster, dimension) — nothing corpus-sized ever
  * crosses the wire. Each round's driver barrier materializes ONLY the
  * k-row centroid table (localCheckpoint — the q120 discipline), never an
  * assignment.
  *
  * Everything runs in FIXED-POINT micro-units (round(x·10⁶) as long) so
  * distances, argmins, and centroid means are integer-exact and therefore
  * bit-identical in any summation order — which is what makes an exact
  * cross-engine oracle possible at all (float k-means is reduction-order
  * sensitive; the oracle proves the integer plan, and the float production
  * variant is the same plan with the cast dropped). Magnitudes: |comp| ≤
  * ~5.3·10⁵ µu, so a 64-dim squared distance ≤ ~7·10¹³ and corpus inertia
  * ≤ ~10¹⁷ — comfortably inside int64, and inside double's 2^53 integer
  * range for the oracle's dot-product formulation.
  */
object Clustering {

  private val T = Tables

  private val K = 8
  private val Rounds = 3
  private val Dim = 64

  /** Fixed-point micro-unit quantization of the embedding column. The float
    * component is widened to double FIRST (exact), multiplied in double
    * (IEEE-identical in DuckDB), then half-away-from-zero rounded — the
    * q190 cents discipline applied per dimension.
    */
  private def quantized(s: SparkSession, d: String): DataFrame =
    T.embeddings(s, d).select(
      col("vec_id"),
      transform(col("embedding"), x => round(x.cast("double") * 1e6).cast("long")).as("v"))

  /** One Lloyd round: map-side argmin against the broadcast k-row centroid
    * table, then one (cluster, dimension)-keyed aggregate rebuilds the
    * centroids. Component mean is TRUNCATING integer division (Spark `div`
    * ≡ DuckDB `//`), ties in the argmin break to the lowest cluster id, and
    * a cluster that loses every point keeps its previous centroid
    * (left-join + coalesce) — every branch deterministic, so the oracle
    * can replay the identical recursion.
    */
  private def assign(points: DataFrame, centroids: DataFrame): DataFrame = {
    val dist = aggregate(
      zip_with(col("v"), col("cv"), (a: Column, b: Column) => (a - b) * (a - b)),
      lit(0L),
      (acc: Column, x: Column) => acc + x)
    val scored = points
      .crossJoin(broadcast(centroids.select(col("cid"), col("v").as("cv"))))
      .withColumn("dist", dist)
      .drop("cv")
    scored
      .withColumn(
        "rn",
        row_number().over(Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** The Lloyd recursion: quantize once, seed from the k lowest vec_ids
    * (TakeOrdered k rows FIRST, then the row_number window runs over k rows
    * only — never a corpus-sized unpartitioned window), then
    * assign/update `rounds` times materializing ONLY the k-row centroid
    * table per round. Returns (final assignment, final centroids).
    */
  private[graft] def run(
      s: SparkSession, d: String, rounds: Int): (DataFrame, DataFrame) = {
    val pts = quantized(s, d).localCheckpoint() // consumed once per round
    val init = pts
      .orderBy(col("vec_id"))
      .limit(K)
      .withColumn("rn", row_number().over(Window.orderBy(col("vec_id"))))
      .select((col("rn") - 1).cast("long").as("cid"), col("v"))
      .localCheckpoint()
    (1 to rounds).foldLeft((Option.empty[DataFrame], init)) { case ((_, c), _) =>
      val a = assign(pts, c)
      (Some(a), update(a, c).localCheckpoint())
    } match { case (a, c) => (a.get, c) }
  }

  /** Exact inertia of the FINAL assignment after `rounds` Lloyd rounds —
    * the suite's monotonicity probe.
    */
  private[graft] def inertiaAfter(s: SparkSession, d: String, rounds: Int): Long =
    run(s, d, rounds)._1.agg(sum(col("dist"))).collect().head.getLong(0)

  private def update(assigned: DataFrame, centroids: DataFrame): DataFrame = {
    val comps = assigned
      .select(col("cid"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("cid"), col("i"))
      .agg(expr("sum(x) div count(1)").as("comp"))
    val rebuilt = comps
      .groupBy(col("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(i, comp))), s -> s.comp)").as("nv"))
    centroids
      .join(rebuilt, Seq("cid"), "left")
      .select(col("cid"), coalesce(col("nv"), col("v")).as("v"))
  }

  val entries: Seq[Entry] = Seq(
    // q196: K-MEANS (Lloyd, k=8, 3 rounds) over the embedding corpus in
    // exact fixed-point. Init = the k lowest vec_ids (deterministic, the
    // standard "first k" seeding both engines share). Per round only the
    // 8-row centroid table is materialized; the final round's assignment
    // feeds per-cluster size + inertia. The oracle replays the identical
    // recursion in DuckDB using the |q|²+|c|²−2q·c expansion over double
    // dot products (exact: all intermediates < 2^53) — two independent
    // distance formulations agreeing per round is the correctness proof.
    Entry(
      "q196_kmeans",
      (s, d) => {
        val (lastAssign, centroids) = run(s, d, Rounds)
        val stats = lastAssign
          .groupBy(col("cid"))
          .agg(count(lit(1)).as("n_points"), sum(col("dist")).as("inertia"))
        stats
          .join(centroids, Seq("cid"))
          .select(
            col("cid"),
            col("n_points"),
            col("inertia"),
            element_at(col("v"), 1).as("c1"),
            element_at(col("v"), 2).as("c2"),
            element_at(col("v"), 3).as("c3"),
            element_at(col("v"), 4).as("c4"),
            aggregate(col("v"), lit(0L), (acc: Column, x: Column) => acc + x).as("csum"))
          .orderBy(col("cid"))
      },
      Some {
        // Shared fragments: quantized points with norm, one assignment
        // round, one update round. DuckDB's list_dot_product runs in
        // double — exact here because every value stays below 2^53.
        def asg(c: String, a: String): String =
          s"""$a AS (
             |  SELECT vec_id, v, vd, qq, cid, dist FROM (
             |    SELECT e.vec_id, e.v, e.vd, e.qq, c.cid,
             |      CAST(e.qq + list_dot_product(c.cvd, c.cvd)
             |           - 2 * list_dot_product(e.vd, c.cvd) AS BIGINT) AS dist,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY CAST(e.qq + list_dot_product(c.cvd, c.cvd)
             |           - 2 * list_dot_product(e.vd, c.cvd) AS BIGINT), c.cid) AS rn
             |    FROM q e CROSS JOIN $c c) WHERE rn = 1)""".stripMargin
        def upd(prev: String, a: String, c: String): String =
          s"""${c}_u AS (
             |  SELECT cid, list(comp ORDER BY i) AS v FROM (
             |    SELECT t.cid, r.i, CAST(sum(t.v[r.i]) AS BIGINT) // count(*) AS comp
             |    FROM $a t, range(1, ${Dim + 1}) r(i) GROUP BY t.cid, r.i) GROUP BY cid),
             |$c AS (
             |  SELECT p.cid, coalesce(u.v, p.v) AS v,
             |    CAST(coalesce(u.v, p.v) AS DOUBLE[]) AS cvd
             |  FROM $prev p LEFT JOIN ${c}_u u USING (cid))""".stripMargin
        s"""WITH q AS (
           |  SELECT vec_id,
           |    [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) for x in embedding] AS v,
           |    [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS DOUBLE) for x in embedding] AS vd,
           |    list_dot_product(
           |      [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS DOUBLE) for x in embedding],
           |      [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS DOUBLE) for x in embedding]) AS qq
           |  FROM embeddings),
           |c0 AS (
           |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
           |    v, CAST(v AS DOUBLE[]) AS cvd
           |  FROM q ORDER BY vec_id LIMIT $K),
           |${asg("c0", "a1")},
           |${upd("c0", "a1", "c1")},
           |${asg("c1", "a2")},
           |${upd("c1", "a2", "c2")},
           |${asg("c2", "a3")},
           |${upd("c2", "a3", "c3")}
           |SELECT s.cid, s.n_points, s.inertia,
           |  c.v[1] AS c1, c.v[2] AS c2, c.v[3] AS c3, c.v[4] AS c4,
           |  CAST(list_aggregate(c.v, 'sum') AS BIGINT) AS csum
           |FROM (SELECT cid, CAST(count(*) AS BIGINT) AS n_points,
           |        CAST(sum(dist) AS BIGINT) AS inertia FROM a3 GROUP BY cid) s
           |JOIN c3 c USING (cid) ORDER BY cid""".stripMargin
      })
  )
}
