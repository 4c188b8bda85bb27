package graft

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Observation-based instrumentation — the engine's counterpart to the
  * reference's Prometheus metrics export (`Ors2MetricsExport.java`,
  * `ShuffleServerMetrics` counters: rows/bytes written, read, dropped per
  * stage). Where the reference increments mutable counters inside its
  * transport, a Spark-native pipeline attaches `observe()` aggregates to
  * the declarative plan: `CollectMetricsExec` computes them on the rows
  * ACTUALLY flowing through that exact point of the physical plan — no
  * second scan, no sampling — and publishes them through the
  * `QueryExecutionListener`/`Observation` machinery with the first action.
  *
  * Scale notes (100 TB): observed metrics are plan-local aggregates that
  * piggyback on the stage already being executed; their cost is one
  * accumulator-style partial per task, merged on the driver. Instrumenting
  * a funnel therefore costs O(stages) driver memory and ZERO extra
  * executor passes — unlike the "count() after every stage" anti-pattern,
  * which re-runs the whole lineage per counter.
  */
object Metrics {

  /** Handle to one instrumented stage: resolve values AFTER an action has
    * run over the instrumented frame ([[Observation.get]] blocks until the
    * metrics materialize, so resolving before any action deadlocks — same
    * contract as upstream Spark). */
  final case class Stage(name: String, observation: Observation) {
    /** All observed metrics for this stage (blocks until available). */
    def metrics: Map[String, Any] = observation.get
    /** Rows that flowed through the instrumented point. */
    def rows: Long = metrics("n_rows").asInstanceOf[Long]
    def metricLong(key: String): Long = metrics(key) match {
      case null    => 0L
      case l: Long => l
      case other   => other.toString.toLong
    }
  }

  /** Attach a named observation point to `df`: always counts rows
    * (`n_rows`), plus any caller-supplied aggregate columns. Returns the
    * instrumented frame (use it in place of `df` — metrics only see rows
    * that flow through THIS node) and the [[Stage]] handle to read after
    * the first action. */
  def instrument(df: DataFrame, name: String,
                 extra: (String, Column)*): (DataFrame, Stage) = {
    val obs = Observation(name)
    val cols = count(lit(1)).as("n_rows") +:
      extra.map { case (alias, c) => c.as(alias) }
    (df.observe(obs, cols.head, cols.tail: _*), Stage(name, obs))
  }
}
