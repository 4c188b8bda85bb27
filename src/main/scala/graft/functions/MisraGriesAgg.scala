package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Misra-Gries heavy-hitter summary: a mergeable frequency sketch
  * holding at most `k` (term, count) entries, with the classical
  * guarantees
  *
  *   - every term with true count > n/(k+1) is present in the summary
  *     (n = rows seen), and
  *   - each retained estimate undercounts by at most n/(k+1)
  *
  * both of which survive `merge` (Agarwal et al., "Mergeable Summaries",
  * PODS 2012: combine counts, then subtract the (k+1)-th largest and drop
  * non-positive entries).
  *
  * This is the second custom `Aggregator` in the engine (after
  * [[TopKAgg]]) and it exists for the same reason: SHUFFLE SHAPE. A plain
  * `groupBy(term).count()` shuffles one row per DISTINCT term — fine for
  * token vocabularies, hostile for, e.g., URL or n-gram domains with
  * billions of keys. The MG pass shuffles at most k entries per map task
  * whatever the key cardinality, and the exact second pass (see
  * `q_heavy_hitters`) then touches only the candidate set, so the
  * full-cardinality aggregation never runs.
  *
  * The reference's aggregation surface is its combine hooks
  * (Ors2ExternalSorter.scala:94-107); this carries the same partial/final
  * contract through Spark's typed-aggregate path.
  *
  * Buffer is an immutable Map inside a product-encoded case class: per-row
  * `updated` allocates, but the decrement-all branch is amortized O(1)
  * per row (each decrement is paid for by a prior increment), and the
  * encoder round-trip per row dominates either way — as with TopKAgg, the
  * win is what shuffles, not per-row CPU.
  */
/** `n` rides the buffer: every consumer of the sketch needs the total
  * row count to state its n/(k+1) bound (and q_heavy_hitters derives its
  * threshold from it) — carrying it here saves a separate counting pass
  * over the input. */
case class MGBuf(m: Map[String, Long], n: Long)

class MisraGriesAgg(k: Int) extends Aggregator[String, MGBuf, MGBuf] {
  require(k >= 1, "summary size must be >= 1")

  override def zero: MGBuf = MGBuf(Map.empty, 0L)

  override def reduce(b: MGBuf, term: String): MGBuf = b.m.get(term) match {
    case Some(c) => MGBuf(b.m.updated(term, c + 1L), b.n + 1)
    case None if b.m.size < k => MGBuf(b.m.updated(term, 1L), b.n + 1)
    case None =>
      // summary full and term absent: decrement every counter, dropping
      // zeros — the step that buys the n/(k+1) bound
      MGBuf(b.m.collect { case (t, c) if c > 1L => t -> (c - 1L) }, b.n + 1)
  }

  override def merge(x: MGBuf, y: MGBuf): MGBuf = {
    val combined = y.m.foldLeft(x.m) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    val n = x.n + y.n
    if (combined.size <= k) MGBuf(combined, n)
    else {
      // subtract the (k+1)-th largest count from everything; at most k
      // entries can then be positive
      val cut = combined.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      MGBuf(combined.collect { case (t, c) if c > cut => t -> (c - cut) }, n)
    }
  }

  // finish returns the buffer as-is (callers read .m): a bare
  // Map[String, Long] output would need a session-implicit encoder the
  // Aggregator API can't reach, and the product-encoded wrapper costs
  // nothing
  override def finish(r: MGBuf): MGBuf = r

  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  override def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
}
