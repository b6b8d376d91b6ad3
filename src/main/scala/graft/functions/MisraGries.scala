package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Misra-Gries heavy-hitter summary (Misra & Gries 1982; mergeable form per
  * Agarwal et al., "Mergeable Summaries", PODS 2012) as a typed
  * `Aggregator` — the second concrete UDAF beside [[GcdAgg]], and the
  * bounded-memory alternative to a full `groupBy(token).count()` when the
  * key cardinality is corpus-sized but only the > n/(K+1) tail matters.
  *
  * State is K counters plus the exact stream length n. `reduce` is the
  * textbook step (increment a held key; admit while fewer than K keys are
  * held; otherwise decrement ALL counters and evict zeros — amortized O(1)
  * per token since each O(K) decrement retires ≥ K prior increments);
  * `merge` sums the two counter maps and, when more than K keys survive,
  * subtracts the (K+1)-th largest count from every key and keeps the
  * positives — the PODS-2012 merge that preserves the sketch invariant
  * under ANY partitioning/merge tree, which is what makes the Aggregator
  * safe as a map-side-combined distributed aggregate.
  *
  * Guarantee carried through reduce AND merge: every counter undercounts
  * its key's true frequency by at most n/(K+1), hence any key with
  * true_freq > n/(K+1) is GUARANTEED present in the final summary. The
  * summary's per-key estimates (and its exact membership beyond the
  * guaranteed keys) depend on partition merge order — so queries must
  * register only the deterministic part: use the summary as a CANDIDATE
  * set and verify counts with an exact pass (q252's shape, the canonical
  * two-pass heavy-hitter algorithm).
  */
object MisraGries {
  /** 63 counters ⇒ guaranteed capture of every key with freq > n/64. */
  val K = 63

  final case class Buf(counts: Map[String, Long], n: Long)
}

class MisraGriesAgg extends Aggregator[String, MisraGries.Buf, MisraGries.Buf] {
  import MisraGries.{Buf, K}

  override def zero: Buf = Buf(Map.empty, 0L)

  override def reduce(b: Buf, t: String): Buf = {
    val c = b.counts
    if (c.contains(t)) Buf(c.updated(t, c(t) + 1L), b.n + 1L)
    else if (c.size < K) Buf(c.updated(t, 1L), b.n + 1L)
    else {
      // decrement-all: the new key and one unit of every held key cancel
      val dec = c.iterator
        .map { case (k, v) => (k, v - 1L) }
        .filter(_._2 > 0L)
        .toMap
      Buf(dec, b.n + 1L)
    }
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val combined = b.counts.foldLeft(a.counts) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (combined.size <= K) Buf(combined, a.n + b.n)
    else {
      // subtract the (K+1)-th largest count, keep strictly-positive keys
      val off = combined.valuesIterator.toArray.sorted(Ordering[Long].reverse)(K)
      val kept = combined.iterator
        .map { case (k, v) => (k, v - off) }
        .filter(_._2 > 0L)
        .toMap
      Buf(kept, a.n + b.n)
    }
  }

  override def finish(buf: Buf): Buf = buf
  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
}
