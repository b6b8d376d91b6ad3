package graft.operators

import org.apache.spark.sql.functions._

import graft.queries.Entry
import graft.{Tables => T}

/** Johnson–Lindenstrauss random projection — the dimensionality-reduction
  * sketch under every large-scale embedding system (feed a 64-dim column
  * through a ±1 Rademacher matrix to k=16 dims; pairwise distances survive
  * in expectation with E[‖Rx‖²] = k·‖x‖²). Everything here is exact
  * integer arithmetic: embeddings quantized to milli-units, the sign
  * matrix derived from the engine's deterministic affine-mod hash family
  * (q223's — no libm, no RNG state), so BOTH the projection and the
  * distance-preservation audit are bit-reproducible and oracle-checkable —
  * most systems can only property-test a random projection; this one is
  * replayable.
  *
  * Reference scope (JasperWoo/MapReduceCore): no vector types in the
  * reference (description.md:70-71); extension-tier operator beside the
  * sign-LSH (q41) and PQ (q94) sketches.
  */
object Projection {

  val entries: Seq[Entry] = Seq(

    // q246: JL PROJECTION DISTANCE-PRESERVATION AUDIT — project the
    // DIFFERENCE vector of each probe pair (linearity: R(a−b) = Ra − Rb,
    // so only pair participants are ever projected — the audit costs
    // O(pairs·d·k), not O(corpus·d·k)) and compare ‖R(a−b)‖² against
    // k·‖a−b‖² in exact ppm. Sign matrix: sign(i,j) = parity of
    // m² mod 2³¹−1 with m = ((i·16+j)·2654435761 + 12345) mod 2³¹−1 —
    // the SQUARED affine-mod hash: the raw affine parity leaves the 16
    // projection rows linearly structured (measured: two rows exactly
    // anti-correlated, |row·row| = 64 — the q214 HRW linear-family
    // pitfall in matrix form); squaring mod the odd prime breaks the
    // linearity (measured |row·row| ≤ 18, random-like). Milli-unit
    // quantization keeps every intermediate int64-safe: |dv_i| ≤ 4·10³,
    // |p_j| ≤ 2.6·10⁵, d_proj·10⁶ ≤ ~10¹⁸. within_50pct is the k=16
    // honesty flag — ε ≈ 1/√k means individual pairs DO stray; the suite
    // asserts the aggregate JL guarantee (median near 1, most pairs in
    // band), not a per-pair bound no 16-dim projection can promise.
    // Plan: corpus scan filtered to the 2/50 probe slice BEFORE any
    // compute; the pair join is a shifted-key equi-join; all folds are
    // per-row HOFs over 64/16-element arrays.
    Entry(
      "q246_jl_projection",
      (s, d) => {
        val mv = "transform(embedding, x -> cast(round(cast(x as double) * 1000.0) as bigint))"
        val e = T.embeddings(s, d)
        val a = e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("a_id"), expr(mv).as("va"))
        val b = e.filter(col("vec_id") % 50 === 1)
          .select((col("vec_id") - 1).as("a_id"), expr(mv).as("vb"))
        val m = "(((i * 16 + j) * 2654435761L + 12345) % 2147483647)"
        val sign = s"if(($m * $m) % 2147483647 % 2 = 0, 1L, -1L)"
        a.join(b, Seq("a_id"))
          .withColumn("dv", expr("zip_with(va, vb, (x, y) -> x - y)"))
          .withColumn("d_orig",
            expr("aggregate(dv, cast(0 as bigint), (acc, x) -> acc + x * x)"))
          .withColumn("pd", expr(
            s"""transform(sequence(0, 15), j ->
               |  aggregate(sequence(0, 63), cast(0 as bigint),
               |    (acc, i) -> acc + element_at(dv, i + 1) * $sign))""".stripMargin))
          .withColumn("d_proj",
            expr("aggregate(pd, cast(0 as bigint), (acc, x) -> acc + x * x)"))
          .select(col("a_id"), (col("a_id") + 1).as("b_id"),
            col("d_orig"), col("d_proj"),
            expr("d_proj * 1000000L div greatest(16L * d_orig, 1L)")
              .as("ratio_ppm"))
          .withColumn("within_50pct",
            abs(col("ratio_ppm") - 1000000L) <= 500000L)
          .orderBy(col("a_id"))
      },
      Some("""WITH e AS (SELECT vec_id,
             |    [CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)
             |      for x in embedding] AS v
             |  FROM embeddings WHERE vec_id % 50 <= 1),
             |pr AS (SELECT a.vec_id AS a_id, a.v AS va, b.v AS vb
             |  FROM (SELECT * FROM e WHERE vec_id % 50 = 0) a
             |  JOIN (SELECT * FROM e WHERE vec_id % 50 = 1) b
             |    ON b.vec_id = a.vec_id + 1),
             |pd AS (SELECT a_id,
             |    [va[k + 1] - vb[k + 1] for k in range(0, 64)] AS dv
             |  FROM pr),
             |do_ AS (SELECT a_id, CAST(list_reduce(
             |    list_prepend(CAST(0 AS BIGINT), [x * x for x in dv]),
             |    (a, x) -> a + x) AS BIGINT) AS d_orig FROM pd),
             |pj AS (SELECT pd.a_id, j.j,
             |    CAST(sum(pd.dv[i.i + 1] * (CASE WHEN
             |      ((((i.i * 16 + j.j) * 2654435761 + 12345) % 2147483647)
             |       * (((i.i * 16 + j.j) * 2654435761 + 12345) % 2147483647))
             |        % 2147483647 % 2 = 0
             |      THEN 1 ELSE -1 END)) AS BIGINT) AS p
             |  FROM pd, range(0, 16) j(j), range(0, 64) i(i)
             |  GROUP BY 1, 2),
             |dp AS (SELECT a_id, CAST(sum(p * p) AS BIGINT) AS d_proj
             |  FROM pj GROUP BY 1)
             |SELECT do_.a_id, do_.a_id + 1 AS b_id, do_.d_orig, dp.d_proj,
             |  dp.d_proj * 1000000 // greatest(16 * do_.d_orig, 1)
             |    AS ratio_ppm,
             |  abs(dp.d_proj * 1000000 // greatest(16 * do_.d_orig, 1)
             |    - 1000000) <= 500000 AS within_50pct
             |FROM do_ JOIN dp USING (a_id) ORDER BY do_.a_id""".stripMargin))
  )
}
