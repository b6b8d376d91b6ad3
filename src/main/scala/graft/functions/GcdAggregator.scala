package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed-`Aggregator` UDAF: greatest common divisor of a Long column — the
  * price-quantum detector (the gcd of every observed amount IS the unit the
  * amounts are quantized to). This is the repo's concrete demonstration of
  * the `Aggregator[IN, BUF, OUT]` surface SURVEY §2.2 names as the UDAF
  * upgrade path: gcd is associative and commutative, so `reduce`/`merge`
  * compose freely and Catalyst plans it as an ObjectHashAggregate WITH
  * map-side partial merge — the shuffle carries one buffer per (partition,
  * group), exactly like a built-in aggregate. The honest trade: object
  * aggregation is not whole-stage-codegen'd — reach for an Aggregator only
  * when no builtin/native-expression composition exists (the decision the
  * rest of this repo makes the other way, e.g. HashKernels).
  *
  * gcd(0, x) = x makes 0 the identity, so empty partitions merge cleanly;
  * the result is normalized |abs| AFTER the Euclidean recursion (gcd is
  * sign-free) — normalizing the INPUT via math.abs is wrong for
  * Long.MinValue, whose absolute value has no positive Long (r13 ADVICE).
  * The one unrepresentable answer is gcd = 2^63 exactly (every input a
  * multiple of Long.MinValue): returned as Long.MinValue, the only
  * negative output, documented rather than silently wrong.
  */
object GcdAgg extends Aggregator[Long, Long, Long] {
  @annotation.tailrec
  private def euclid(a: Long, b: Long): Long = if (b == 0L) a else euclid(b, a % b)
  // Euclid is sign-correct on negatives (JVM % keeps |a % b| < |b|); only
  // the final normalization needs the MinValue guard.
  private def gcd(a: Long, b: Long): Long = {
    val g = euclid(a, b)
    if (g == Long.MinValue) g else math.abs(g)
  }

  override def zero: Long = 0L
  override def reduce(buf: Long, x: Long): Long = gcd(buf, x)
  override def merge(a: Long, b: Long): Long = gcd(a, b)
  override def finish(buf: Long): Long = buf
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
