package graft

import org.scalatest.funsuite.AnyFunSuite

/** Read-path fault injection (SURVEY §2A #35, the reference's
  * mockReadErrorProbability): with every task's first attempt failing
  * synthetically, the ledger queries must complete via Spark's task
  * retries and produce results BIT-IDENTICAL to the injection-off run —
  * retry-determinism end-to-end, not just "the job survives". */
class ChaosSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // the dedup-ledger family: dropDuplicates + window + aggregation over
  // the chaos-gated events scan — the queries whose retry semantics the
  // reference's LongHashSet/latest-attempt machinery exists to protect —
  // plus the two flow-control STATE MACHINES (r8): a retried task replays
  // its whole sorted partition through the admission ledger, so their
  // determinism under first-attempt failure is exactly what makes the
  // mapPartitions formulation safe at scale
  // ... and one CODEC-STAGE query (r8): a retried task re-runs its whole
  // encode→decode→fingerprint partition, so bit-identical results pin
  // that the codec stages are deterministic under Spark's retry path too
  // ... and the two ARTIFACT-BACKED probes (r12): their sessions publish
  // the index under injection (write-stage tasks retry through the gated
  // corpus read) and then probe it through the chaos-gated index-dataset
  // scans (VectorIndex/DedupIndex raw loaders), so the whole
  // publish→load→probe cycle is pinned retry-deterministic — including
  // the ADC path's codes-only scan
  // ... and the NATIVE-FORMAT pipe probe (r17): its session publishes a
  // real .dat_final tree through the DSv2 writer while the fixture scan
  // underneath fails first attempts, then verifies CRC ledgers through
  // the connector — publish→finalize→scan→verify retry-deterministic
  // over the binary format, not just parquet
  private val ledgerQueries =
    Seq("q_dedup_exact", "q_latest_attempt", "q_checksum_verify",
      "q_ledger_order", "q_flow_control", "q_flow_busy",
      "q_audio_fingerprint", "q_ann_ivfpq_idx", "q_cross_dedup_idx",
      "q_pipe_checksum_verify")

  // Each phase runs in a FRESH child session: the chaos gate is planned
  // from the session conf at plan-construction time, and SharedPlans
  // memoizes per session — reusing one session would hand the chaotic
  // phase the clean phase's gate-less memoized codec frame, silently
  // skipping injection for q_audio_fingerprint.
  private def runAll(s: org.apache.spark.sql.SparkSession): Map[String, Seq[Seq[Any]]] =
    try {
      ledgerQueries.map { q =>
        q -> SparkEntry.queries(q)(s, TestSpark.sf0001)
          .collect().toSeq.map(_.toSeq)
      }.toMap
    } finally s.catalog.clearCache()

  test("ledger queries are bit-identical under full first-attempt failure") {
    val clean = runAll(spark.newSession())
    val chaoticSession = spark.newSession()
    chaoticSession.conf.set(Chaos.ProbConf, "1.0")
    val before = Chaos.injected.get()
    val chaotic = runAll(chaoticSession)
    assert(Chaos.injected.get() > before,
      "chaos gate engaged but injected no failures")
    for (q <- ledgerQueries)
      assert(chaotic(q) == clean(q), s"$q diverged under injection")
  }

  test("partial probability fails a deterministic subset and still matches") {
    val clean = runAll(spark.newSession())
    val chaoticSession = spark.newSession()
    chaoticSession.conf.set(Chaos.ProbConf, "0.5")
    chaoticSession.conf.set(Chaos.SeedConf, "7")
    val chaotic = runAll(chaoticSession)
    for (q <- ledgerQueries)
      assert(chaotic(q) == clean(q), s"$q diverged under injection")
  }

  test("gate is an identity when disabled (no extra stage in the plan)") {
    val plain = Tables.events(spark, TestSpark.sf0001)
    // default-off: the gate must return the scan itself, so pushdown and
    // pruning survive — the plan contains no (De)serialize/mapPartitions
    val plan = plain.queryExecution.optimizedPlan.toString
    assert(!plan.contains("MapPartitions"), s"chaos gate left a stage:\n$plan")
  }
}
