package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}

/** Conf-probability fault injection for the read path — the test-harness
  * chaos flag SURVEY.md §2A #35 maps from the reference's
  * `mockReadErrorProbability` (Ors2Config.scala:272-276): every table
  * scan can be made to throw a synthetic error on a task's FIRST attempt,
  * exercising Spark's task-retry machinery end-to-end so a spec can
  * assert that query results are bit-identical with injection on.
  *
  * Injection rule: a task fails iff `attemptNumber == 0` and the portable
  * hash of (partitionId, seed) lands under the configured probability —
  * deterministic per partition, so "which tasks fail" is reproducible,
  * and the retry (attempt 1) always succeeds, so the job completes with
  * `spark.task.maxFailures >= 2`. The failure fires before a single
  * input row is consumed.
  *
  * Scale/plan note: with the probability at its default 0.0 the gate
  * returns the input frame UNTOUCHED — no extra stage, pushdown and
  * pruning intact. When engaged (tests only) the wrapper is a
  * mapPartitions barrier, which blocks filter pushdown past it; that is
  * acceptable for a chaos harness and is why the gate must never default
  * on. */
object Chaos {
  val ProbConf = "spark.graft.chaos.readErrorProbability"
  val SeedConf = "spark.graft.chaos.seed"

  /** Injected-failure count. Diagnostic only: a per-JVM static, which in
    * local mode (driver == executors) observes every injection; on a real
    * cluster each executor counts its own — use logs/event listeners for
    * cluster-wide accounting. */
  val injected = new java.util.concurrent.atomic.AtomicLong(0)

  /** Wrap a scan with the conf-gated synthetic failure stage. */
  def gate(s: SparkSession, df: DataFrame): DataFrame = {
    val p = s.conf.get(ProbConf, "0.0").toDouble
    if (p <= 0.0) df
    else {
      val seed = s.conf.get(SeedConf, "0").toLong
      df.mapPartitions { it =>
        val ctx = TaskContext.get()
        if (ctx != null && ctx.attemptNumber() == 0) {
          // portable hash of (partitionId, seed) -> [0, 1)
          val h = (((ctx.partitionId() + 31L * seed + 1) % 1000000007L) *
            2654435761L) % 1000000007L
          if (h.toDouble / 1000000007L < p) {
            injected.incrementAndGet()
            throw new RuntimeException(
              s"graft chaos: synthetic read failure " +
                s"(partition=${ctx.partitionId()}, attempt=0, p=$p)")
          }
        }
        it
      }(Encoders.row(df.schema))
    }
  }
}
