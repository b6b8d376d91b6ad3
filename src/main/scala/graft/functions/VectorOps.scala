package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Vector kernels invoked from generated code (whole-stage codegen calls these
  * static forwarders directly — see the `doGenCode` of the expressions in
  * [[graft.functions]]). All accumulation is sequential left-to-right so
  * results are deterministic and bit-stable across runs/engines.
  *
  * Scale note: these run per-row inside codegen with zero boxing beyond the
  * ArrayData accessors; at 100 TB the same kernels apply unchanged (they are
  * embarrassingly parallel per row).
  */
object VectorOps {

  /** Cosine similarity of two equal-length double vectors. Returns 0.0 when
    * either norm is 0 (instead of NaN) so downstream thresholds stay sane.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def l2norm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** Per-JVM cache of derived hyperplane coefficient matrices, keyed by
    * (planes, dims, seed). Derivation is deterministic from splitmix64 — no
    * stored model and no broadcast; every executor materializes an identical
    * matrix ONCE instead of re-deriving planes×dims hashes per row (at
    * planes=40, dims=64 that's 2 560 hash+divide ops saved per row).
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Array[Double]]]()

  private def planeMatrix(planes: Int, dims: Int, seed: Long): Array[Array[Double]] =
    planeCache.computeIfAbsent((planes, dims, seed), { key =>
      val (p0, d0, s0) = key
      Array.tabulate(p0, d0) { (p, i) =>
        val h = HashKernels.splitmix64(s0 + p.toLong * 1000003L + i)
        // map to [-1, 1): uniform is fine for sign-of-projection LSH
        (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
      }
    })

  /** Packed random-hyperplane sign signature: bit p of the result is the
    * sign of the projection onto plane p (planes <= 64). One kernel call per
    * row yields BOTH the ANN blocking keys (bit slices of the signature are
    * the band keys — pure integer ops downstream) and the signature the
    * Hamming prefilter compares with bit_count(xor) before any d-dim cosine.
    */
  def rhpSig(a: ArrayData, planes: Int, seed: Long): Long = {
    val dims = a.numElements()
    val mat = planeMatrix(planes, dims, seed)
    var sig = 0L
    var p = 0
    while (p < planes) {
      val row = mat(p)
      var s = 0.0
      var i = 0
      while (i < dims) {
        s += row(i) * a.getDouble(i)
        i += 1
      }
      if (s >= 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Random-hyperplane signature split into `bands` band-keys.
    *
    * `planes * dims` pseudo-gaussian coefficients are derived deterministically
    * from splitmix64 — no stored model, so executors recompute identical planes
    * with zero broadcast. The signature's `planes` sign bits are grouped into
    * `bands` chunks; each chunk becomes a 64-bit band key (band index mixed in
    * so keys from different bands never collide). Two vectors with high cosine
    * similarity share at least one band key with high probability — the
    * standard LSH scale path for ANN: candidates = equi-join on band key (a
    * shuffle on a long), instead of an O(N²) cross join.
    */
  def rhpBands(a: ArrayData, planes: Int, bands: Int, seed: Long): ArrayData = {
    val dims = a.numElements()
    val mat = planeMatrix(planes, dims, seed)
    val bits = new Array[Boolean](planes)
    var p = 0
    while (p < planes) {
      val row = mat(p)
      var s = 0.0
      var i = 0
      while (i < dims) {
        s += row(i) * a.getDouble(i)
        i += 1
      }
      bits(p) = s >= 0.0
      p += 1
    }
    val perBand = planes / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var k = 0L
      var j = 0
      while (j < perBand) {
        k = (k << 1) | (if (bits(b * perBand + j)) 1L else 0L)
        j += 1
      }
      keys(b) = HashKernels.splitmix64(k ^ (b.toLong << 56))
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(keys)
  }
}
