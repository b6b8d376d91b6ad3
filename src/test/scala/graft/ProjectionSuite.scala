package graft

import org.apache.spark.sql.functions._
import graft.queries.Registry

/** JL projection audit (q246): every row replayed with exact integer
  * arithmetic on the driver, plus the two properties that make the fixed
  * sign matrix a legitimate JL matrix — near-orthogonal rows (the raw
  * affine parity FAILED this with two exactly anti-correlated rows; the
  * squared hash must stay random-like) and the aggregate distance-
  * preservation guarantee.
  */
class ProjectionSuite extends SparkTestBase {

  private def sign(i: Int, j: Int): Long = {
    val m = ((i * 16 + j).toLong * 2654435761L + 12345L) % 2147483647L
    if ((m * m) % 2147483647L % 2 == 0) 1L else -1L
  }

  test("q246 rows equal an exact integer replay; matrix is random-like") {
    val rows = Registry.byName("q246_jl_projection").q(spark, sf).collect()
    assert(rows.nonEmpty)
    val vecs = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 50 <= 1)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 1000.0) as bigint))"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toMap
    for (r <- rows) {
      val aId = r.getLong(0)
      assert(r.getLong(1) == aId + 1)
      val dv = vecs(aId).zip(vecs(aId + 1)).map { case (x, y) => x - y }
      val dOrig = dv.map(x => x * x).sum
      val proj = (0 until 16).map(j =>
        (0 until 64).map(i => dv(i) * sign(i, j)).sum).toArray
      val dProj = proj.map(p => p * p).sum
      assert(r.getLong(2) == dOrig, s"pair $aId d_orig")
      assert(r.getLong(3) == dProj, s"pair $aId d_proj")
      val ratio = dProj * 1000000L / math.max(16L * dOrig, 1L)
      assert(r.getLong(4) == ratio, s"pair $aId ratio_ppm")
      assert(r.getBoolean(5) == (math.abs(ratio - 1000000L) <= 500000L))
    }
    // sign-matrix quality (the q214 linear-family lesson in matrix form):
    // rows near-orthogonal and columns near-balanced — random ±1 rows of
    // length 64 have sd 8; the raw affine parity measured |dot| = 64
    val dots = for (a <- 0 until 16; b <- (a + 1) until 16)
      yield (0 until 64).map(i => sign(i, a) * sign(i, b)).sum
    assert(dots.map(math.abs).max <= 24,
      s"projection rows must be near-orthogonal, max |dot| = ${dots.map(math.abs).max}")
    val bal = (0 until 16).map(j => (0 until 64).map(i => sign(i, j)).sum)
    assert(bal.map(math.abs).max <= 20,
      s"each projection row must be near-balanced, got $bal")
    // aggregate JL guarantee at k=16: median ratio near 1, most in band
    val ratios = rows.map(_.getLong(4)).sorted
    val median = ratios(ratios.length / 2)
    assert(median >= 600000L && median <= 1400000L,
      s"median distortion ratio $median outside the JL band")
    assert(rows.count(_.getBoolean(5)) * 10 >= rows.length * 6,
      "at least 60% of probe pairs must be within 50% distortion")
  }
}
