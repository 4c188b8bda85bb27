package graft.sources

/** Shared PRECISION-GATE types for the banded index families
  * ([[DedupIndex]] text MinHash, [[FingerprintIndex]] image dHash) —
  * the sibling of [[VectorIndex.RecallProbe]], closing the family's
  * observe-then-act symmetry (r16 verdict #2): the r16 round made
  * banded-candidate precision OBSERVABLE in-gate; this arms it. The
  * reference analog is the worker status manager not merely reporting
  * busy workers but acting on them (ShuffleWorkerStatusManager.java:
  * 81-88 punishes; here a tripped floor escalates the band family).
  *
  * Failure mode being gated: a banded index generates candidates by
  * bucket collision and exact-verifies them downstream, so OUTPUT
  * correctness never degrades — what collapses at scale is candidate
  * PRECISION (verified/candidates), which silently multiplies the
  * verify-join cost until the index is doing all-pairs work in
  * disguise. The floor turns that from a dashboard reading into a
  * same-cycle remedy.
  */

/** Arms a precision floor on an index `maintain` cycle: after the
  * merge, the artifact's stored probe is read
  * ([[DedupIndex.probePrecision]] / [[FingerprintIndex.probePrecision]]);
  * a measured precision below `floor` escalates the artifact to the
  * next band family and re-probes ONCE. A floor still unmet at the
  * escalated family — or an exhausted escalation ladder — surfaces per
  * `failUnrecovered`: throw (true) or log a warning (false, default),
  * so a permanently-failing gate is observable instead of a silent
  * escalation every cycle (the [[VectorIndex.RecallProbe]] contract). */
final case class PrecisionProbe(floor: Double,
    failUnrecovered: Boolean = false)

/** What a precision probe measured: sampled probe members, candidate
  * pairs their stored band keys generated, and how many of those pairs
  * the production verification confirmed. Zero candidates reads as
  * `precision` None — vacuously above any floor (an index generating
  * no background candidates is exactly healthy). */
final case class ProbeStats(probeDocs: Long, candidates: Long,
    verified: Long) {
  def precision: Option[Double] =
    if (candidates > 0) Some(verified.toDouble / candidates) else None
  /** True when a measured precision sits below `floor` — the trip
    * predicate ([[precision]] None never trips). */
  def below(floor: Double): Boolean = precision.exists(_ < floor)
}

/** Arms the vector index's bucket-OCCUPANCY gate on a `maintain` cycle
  * — the hyperplane path's analog of the banded families' precision
  * floor: the count schedule keeps expected occupancy at the target,
  * but corpus DENSITY can saturate buckets at an unchanged count. A
  * measured mean occupancy above `factor` × the scheduled target
  * escalates the artifact one width rung ([[VectorIndex.escalateWidth]])
  * and re-probes once; still-saturated surfaces per `failUnrecovered`
  * (the [[PrecisionProbe]] contract). */
final case class OccupancyProbe(factor: Double = 4.0,
    failUnrecovered: Boolean = false)

/** A bucket-occupancy reading: live (non-empty) buckets, mean
  * occupancy over them, widest bucket. */
final case class OccupancyStats(buckets: Long, meanOccupancy: Double,
    maxWidth: Long)
