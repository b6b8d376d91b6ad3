package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector/text kernels.
  *
  * Each participates in whole-stage codegen (`doGenCode` emits a direct static
  * call into [[VectorOps]]/[[HashKernels]]) — no UDF boxing, no codegen
  * fallback, so they sit inside the same generated loop as the surrounding
  * parquet scan and filters. Registered as SQL functions by
  * [[GraftExtensions]].
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Exact squared L2 distance between two long vectors ([[VectorOps
  * .l2sqLong]]) — the fixed-point k-means/k-center distance kernel. A
  * native codegen expression instead of `aggregate(zip_with(...))`: the
  * HOF pair is interpreted (no codegen) and allocates an intermediate
  * array per row·centroid; this is one static call in the generated loop.
  */
case class L2SqLong(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "l2sq_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.l2sqLong(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.l2sqLong($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Exact Jaccard between two sorted long-hash sets ([[HashKernels
  * .jaccardSorted]]): the near-dup confirm kernel — a primitive merge the
  * generated loop calls statically, replacing the per-pair hash-set build of
  * `array_intersect`.
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.jaccardSorted(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.jaccardSorted($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** UNCHECKED variant of [[JaccardSorted]] ([[HashKernels
  * .jaccardSortedUnchecked]]): same merge, no precondition validation — for
  * ENGINE-CONSTRUCTED inputs whose sortedness is guaranteed by plan shape
  * (`array_sort` over a distinct hash set). Every internal near-dup confirm
  * uses this via [[GraftColumns.jaccardSortedUnchecked]]; the checked
  * [[JaccardSorted]] guards the public SQL surface, and this expression is
  * deliberately NOT SQL-registered (see [[GraftExtensions]]).
  */
case class JaccardSortedUnchecked(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted_unchecked"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.jaccardSortedUnchecked(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      (a, b) => s"graft.functions.HashKernels.jaccardSortedUnchecked($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Column constructors for engine-internal expressions that are kept OUT of
  * the public SQL namespace — plans wrap the Catalyst expression directly
  * instead of routing through `call_function`, so the fast-but-unsafe
  * variants never become callable from user SQL.
  */
object GraftColumns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnShim

  /** See [[HashKernels.jaccardSortedUnchecked]] for the precondition the
    * CALLER's plan shape must guarantee (both arrays `array_sort` of a
    * distinct hash set).
    */
  def jaccardSortedUnchecked(a: Column, b: Column): Column =
    ColumnShim.column(
      JaccardSortedUnchecked(
        ColumnShim.expression(a),
        ColumnShim.expression(b)))

  /** See [[HashKernels.intersectCountSorted]] — same sorted-input
    * precondition and same internal-only status.
    */
  def intersectCountSorted(a: Column, b: Column): Column =
    ColumnShim.column(
      IntersectCountSorted(
        ColumnShim.expression(a),
        ColumnShim.expression(b)))

  /** See [[HashKernels.intersectCountSortedStr]] — the string-array form,
    * same sorted-input precondition and internal-only status.
    */
  def intersectCountSortedStr(a: Column, b: Column): Column =
    ColumnShim.column(
      IntersectCountSortedStr(
        ColumnShim.expression(a),
        ColumnShim.expression(b)))

  /** See [[HashKernels.firstAgreeIdx]] — the band self-join's
    * dedup-free-candidates emission test. Internal-only: it is meaningful
    * only against the band arrays the engine's own plans construct.
    */
  def firstAgreeIdx(a: Column, b: Column): Column =
    ColumnShim.column(
      FirstAgreeIdx(
        ColumnShim.expression(a),
        ColumnShim.expression(b)))

  /** See [[VectorOps.l2sqLong]] — the fixed-point clustering distance. */
  def l2sqLong(a: Column, b: Column): Column =
    ColumnShim.column(
      L2SqLong(
        ColumnShim.expression(a),
        ColumnShim.expression(b)))

  /** See [[VectorOps.l2sqDouble]] — the PQ Lloyd-round distance (r21). */
  def l2sqDouble(a: Column, b: Column): Column =
    ColumnShim.column(
      L2SqDouble(
        ColumnShim.expression(a),
        ColumnShim.expression(b)))

  /** See [[VectorOps.dot]] — the PQ ADC lookup dot product (r21). */
  def dotDouble(a: Column, b: Column): Column =
    ColumnShim.column(
      DotDouble(
        ColumnShim.expression(a),
        ColumnShim.expression(b)))
}

/** First positional agreement index of two equal-length long arrays
  * ([[HashKernels.firstAgreeIdx]]) — the emission test that makes the LSH
  * band self-join produce each candidate pair exactly once without a
  * distinct exchange. Internal-only (constructed via
  * [[GraftColumns.firstAgreeIdx]]).
  */
case class FirstAgreeIdx(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "first_agree_idx"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.firstAgreeIdx(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.firstAgreeIdx($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Positional agreement fraction of two k-component MinHash signatures
  * ([[HashKernels.sigAgreeFrac]]) — the Jaccard estimate the candidate
  * prefilter thresholds.
  */
case class SigAgreeFrac(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sig_agree_frac"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.sigAgreeFrac(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.sigAgreeFrac($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Intersection size of two sorted duplicate-free long arrays ([[HashKernels
  * .intersectCountSorted]]) — the per-pair confirm of the winnowing overlap
  * query. Internal-only (not SQL-registered): sortedness is a plan-shape
  * precondition, not runtime-checked.
  */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "intersect_count_sorted"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.intersectCountSorted(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      (a, b) => s"graft.functions.HashKernels.intersectCountSorted($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Squared L2 distance between two double vectors ([[VectorOps.l2sqDouble]])
  * — the PQ Lloyd-round distance kernel (r21), bit-identical to the
  * `aggregate(zip_with(...))` HOF it replaces (same left-to-right fold).
  * Internal-only (constructed via [[GraftColumns.l2sqDouble]]).
  */
case class L2SqDouble(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2sq_double"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.l2sqDouble(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.l2sqDouble($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Dot product of two double vectors ([[VectorOps.dot]]) — the PQ ADC
  * lookup-table kernel (r21), bit-identical to the
  * `aggregate(zip_with(...))` HOF it replaces. Internal-only.
  */
case class DotDouble(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_double"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Distinct xxhash64 of every n-token shingle
  * ([[HashKernels.tokenShingleHashes]]) — the q36/q76 shingle featurization
  * (r21), identical values to the former interpreted
  * `array_distinct(transform(..., i -> xxhash64(concat_ws(' ', slice(t,
  * i+1, n)))))` chain without materializing shingle strings.
  */
case class TokenShingleHashes(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_shingle_hashes"

  override protected def nullSafeEval(s: Any): Any =
    HashKernels.tokenShingleHashes(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.tokenShingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct xxhash64 of every n-codepoint window
  * ([[HashKernels.charGramHashes]]) — the q55 char-trigram featurization
  * (r21), identical values to the former
  * `array_distinct(transform(..., i -> xxhash64(substr(text, i, n))))`.
  */
case class CharGramHashes(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"

  override protected def nullSafeEval(s: Any): Any =
    HashKernels.charGramHashes(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.charGramHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Intersection size of two sorted duplicate-free STRING arrays
  * ([[HashKernels.intersectCountSortedStr]]) — the q219 exact-string
  * containment confirm (r21). Internal-only (not SQL-registered), same
  * plan-shape sortedness precondition as [[IntersectCountSorted]].
  */
case class IntersectCountSortedStr(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "intersect_count_sorted_str"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.intersectCountSortedStr(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      (a, b) => s"graft.functions.HashKernels.intersectCountSortedStr($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Winnowing fingerprint selection ([[HashKernels.winnowFps]]): distinct
  * sorted minima of `t`-hash windows over `w`-byte k-gram hashes — the MOSS
  * local-fingerprinting scheme with its shared-substring detection
  * guarantee at length ≥ w + t − 1.
  */
case class WinnowFps(child: Expression, w: Int, t: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(s: Any): Any =
    HashKernels.winnowFps(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w, t)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.winnowFps($c, $w, $t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode text normalization ([[TextKernels.normalizeText]]): NFC
  * composition, ROOT-locale lowercase, whitespace collapse/trim — the
  * corpus-ingest first stage every downstream tokenizer here assumes.
  * Zero-allocation pass-through on already-normalized ASCII input.
  */
case class NormalizeText(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(s: Any): Any =
    TextKernels.normalizeText(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.normalizeText($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash64(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(s: Any): Any =
    HashKernels.simhash64(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Fingerprint64(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  override protected def nullSafeEval(s: Any): Any =
    HashKernels.fingerprint64(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.fingerprint64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MinWindowFp(child: Expression, window: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "min_window_fp"

  override protected def nullSafeEval(s: Any): Any =
    HashKernels.minWindowFp(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minWindowFp($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature: array of k permutation minima over token shingles. */
case class MinHashSig(child: Expression, k: Int, shingle: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(s: Any): Any =
    HashKernels.minhashArray(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, shingle)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"graft.functions.HashKernels.minhashArray($c, $k, $shingle)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature over character n-grams (UTF-8 codepoint windows). */
case class MinHashSigChars(child: Expression, k: Int, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_chars"

  override protected def nullSafeEval(s: Any): Any =
    HashKernels.minhashCharsArray(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"graft.functions.HashKernels.minhashCharsArray($c, $k, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** LSH band keys derived from the MinHash signature (k/r keys). */
case class MinHashBands(child: Expression, k: Int, shingle: Int, r: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(s: Any): Any =
    HashKernels.minhashBands(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, shingle, r)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"graft.functions.HashKernels.minhashBands($c, $k, $shingle, $r)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** LSH band keys from an already-computed MinHash signature column. */
case class BandsFromSig(child: Expression, r: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bands_from_sig"

  override protected def nullSafeEval(a: Any): Any =
    HashKernels.bandsFromSig(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], r)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.bandsFromSig($c, $r)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Packed 64-bit random-hyperplane sign signature (bit p = sign of the
  * projection onto plane p) — band keys and Hamming prefilter both derive
  * from this one value with plain integer ops.
  */
case class RhpSig(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def prettyName: String = "rhp_sig"

  override protected def nullSafeEval(a: Any): Any =
    VectorOps.rhpSig(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      planes,
      seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"graft.functions.VectorOps.rhpSig($c, $planes, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane LSH band keys for ANN over embedding vectors. */
case class RhpBands(child: Expression, planes: Int, bands: Int, seed: Long)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rhp_bands"

  override protected def nullSafeEval(a: Any): Any =
    VectorOps.rhpBands(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      planes,
      bands,
      seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"graft.functions.VectorOps.rhpBands($c, $planes, $bands, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whole-string char-polynomial digest ([[PolyKernels.charPoly]]) — the
  * native form of the house `(a*131 + codepoint) % (2^31-1)` fold that the
  * span/dedup family previously spelled as an interpreted
  * `aggregate(filter(split(s, '')))` HOF chain (r21 optimization round;
  * the L2SqLong precedent). Identical value, one static call per row.
  */
case class CharPoly(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "char_poly"

  override protected def nullSafeEval(s: Any): Any =
    PolyKernels.charPoly(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyKernels.charPoly($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-token char-poly digests ([[PolyKernels.tokenPolys]]): split on single
  * spaces with empty tokens kept (split limit -1 semantics), each token
  * folded as [[CharPoly]] — the native ThExpr.
  */
case class TokenPolys(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_polys"

  override protected def nullSafeEval(s: Any): Any =
    PolyKernels.tokenPolys(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyKernels.tokenPolys($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sliding L-window poly fold over a long array, each hash emitted as
  * `fold * scale + offset` ([[PolyKernels.polySlide]]) — the q216 gram
  * array (scale=1, offset=0) and the q292 packed ladder key (scale=64,
  * offset=L).
  */
case class PolySlide(child: Expression, l: Int, scale: Long, offset: Long)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poly_slide"

  override protected def nullSafeEval(a: Any): Any =
    PolyKernels.polySlide(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], l, scale, offset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"graft.functions.PolyKernels.polySlide($c, $l, ${scale}L, ${offset}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Non-overlapping `width`-block poly folds over a long array
  * ([[PolyKernels.polyBlocks]]) — the native q283 BhArrExpr.
  */
case class PolyBlocks(child: Expression, width: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poly_blocks"

  override protected def nullSafeEval(a: Any): Any =
    PolyKernels.polyBlocks(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyKernels.polyBlocks($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hashed unigram+bigram classifier score ([[PolyKernels.clsScore]]) — the
  * q194 linear model inference over a filtered token array, bigrams chained
  * through the fold instead of materialized as strings.
  */
case class ClsScore(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "cls_score"

  override protected def nullSafeEval(a: Any): Any =
    PolyKernels.clsScore(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyKernels.clsScore($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-defined chunking under the q229 cut rule
  * ([[PolyKernels.cdcChunks]]): per chunk (clen, chash) in one native pass —
  * the 16-codepoint rolling-hash boundary scan was O(16·len) interpreted
  * HOF work per row.
  */
case class CdcChunks(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("clen", LongType, nullable = false),
      StructField("chash", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(s: Any): Any =
    PolyKernels.cdcChunks(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyKernels.cdcChunks($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
