package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Worker-health blacklist/punish state machine — the one reference
  * algorithm with genuinely stateful semantics (SURVEY.md §2A #20):
  * the master blacklists a worker on a missed heartbeat or failed
  * self-check, requires `OkTimesToRecover` consecutive OK self-checks to
  * bring it back (ShuffleWorkerStatusManager.java:110-123,
  * ShuffleServerConfig.java:47 workerSelfCheckOkTimes=3), and "punishes" a
  * busy worker for a window that DOUBLES if it is still busy when the
  * window expires (ShuffleWorkerStatusManager.java:80-95,125-129;
  * ServerDetailWithStatus.java addToPunishList/doublePunishTime;
  * busy ⇔ throughput/reject-count/held-bytes over threshold,
  * ShuffleWorkerStatusManager.java:184-188). A worker is online iff
  * neither blacklisted nor punished (ServerDetailWithStatus.isOnLine).
  *
  * Re-expression, not a port: the reference evaluates expiry on a master
  * timer thread (workerCheckInterval=15s) against mutable per-worker
  * objects. Here the machine is a PURE function over the heartbeat
  * stream, settled at event granularity — when a heartbeat arrives, state
  * the timer would have changed during the silence is settled first
  * (punish-window expiry using the PREVIOUS heartbeat's busy flag, since
  * that is what the master would have read; then gap-blacklist if the
  * silence exceeded the threshold). Two deliberate deviations, both
  * documented rather than silently inherited: (a) a punish window that
  * expires during a long silence doubles ONCE per arriving heartbeat, not
  * once per elapsed 15s check tick — same fixed point (busy ⇒ still
  * punished, idle ⇒ released), deterministic at any data scale; (b) the
  * reference increments `selfCheckOkTimes` for ANY heartbeat from a
  * blacklisted worker, even a failing one (ShuffleWorkerStatusManager
  * .java:117-123 guards only the else-branch entry), so 2 fails + 1 OK
  * can "recover" a worker — we implement the documented intent ("N
  * consecutive OKs"): a failed self-check RESETS the OK counter.
  *
  * The same [[step]] drives the batch operator (HealthOps.qWorkerHealth)
  * and the streaming tracker ([[track]]); batch/stream decision parity is
  * by construction and pinned in WorkerHealthSpec ("streaming tracker
  * matches batch q_worker_health on sf0.001").
  */
object WorkerHealth {

  /** Default thresholds, tuned to the heartbeat cadence: the reference's
    * are 15s/5min against 10s heartbeats (ShuffleServerConfig.java:48-49);
    * the fixture's median inter-event gap is ~7h, so the same shape scaled
    * up: gap-blacklist after 24h of silence, 6h base punish window. */
  val GapBlacklistMs: Long = 86400000L
  val PunishBaseMs: Long = 21600000L
  val OkTimesToRecover: Int = 3

  /** One observed heartbeat: `ok` = self-check passed, `busy` = any load
    * threshold exceeded (the isWorkerBusy disjunction, pre-evaluated).
    * `seq` is a stable tie-break for equal timestamps (event id in the
    * fixtures) so processing order — hence the whole machine — is
    * deterministic. */
  case class Heartbeat(worker: Long, ts: Long, ok: Boolean, busy: Boolean,
      seq: Long = 0L)

  /** Full machine state between heartbeats. `prevTs`/`prevBusy` carry the
    * last heartbeat so silence and expiry settle correctly on the next. */
  case class HealthState(
      black: Boolean, okTimes: Int,
      punished: Boolean, punishStart: Long, punishDur: Long,
      prevTs: Long, prevBusy: Boolean, seen: Boolean,
      nEvents: Long, nBlack: Long, nRecover: Long, nPunish: Long,
      nDouble: Long)

  val initial: HealthState =
    HealthState(black = false, okTimes = 0, punished = false,
      punishStart = 0L, punishDur = 0L, prevTs = 0L, prevBusy = false,
      seen = false, nEvents = 0L, nBlack = 0L, nRecover = 0L,
      nPunish = 0L, nDouble = 0L)

  /** Per-worker summary — the query/oracle contract (all-integer, so
    * hash-comparison against DuckDB is exact). */
  case class HealthSummary(
      worker_id: Long, n_events: Long, n_black: Long, n_recover: Long,
      n_punish: Long, n_double: Long, final_black: Int, final_punished: Int,
      final_online: Int)

  def summarize(worker: Long, s: HealthState): HealthSummary =
    HealthSummary(worker, s.nEvents, s.nBlack, s.nRecover, s.nPunish,
      s.nDouble,
      if (s.black) 1 else 0, if (s.punished) 1 else 0,
      if (!s.black && !s.punished) 1 else 0)

  /** Advance the machine by one heartbeat. Pure; total; O(1). */
  def step(s: HealthState, hb: Heartbeat): HealthState = {
    var black = s.black; var okTimes = s.okTimes
    var punished = s.punished; var pStart = s.punishStart; var pDur = s.punishDur
    var nBlack = s.nBlack; var nRecover = s.nRecover
    var nPunish = s.nPunish; var nDouble = s.nDouble

    // 1. settle an expired punish window against the last observed load
    //    (ShuffleWorkerStatusManager.java:80-88: busy → double, else online)
    if (punished && hb.ts > pStart + pDur) {
      if (s.prevBusy) { nDouble += 1; pDur *= 2 }
      else punished = false
    }
    // 2. missed-heartbeat blacklist: the master would have fired during
    //    the silence; requires the worker to have been online (:90-95)
    if (s.seen && hb.ts - s.prevTs > GapBlacklistMs && !black && !punished) {
      black = true; okTimes = 0; nBlack += 1
    }
    // 3. self-check result (:110-123; consecutive-OK deviation documented
    //    in the object scaladoc)
    if (!hb.ok && !black) {
      black = true; okTimes = 0; nBlack += 1
    } else if (black) {
      if (hb.ok) {
        okTimes += 1
        if (okTimes >= OkTimesToRecover) { black = false; okTimes = 0; nRecover += 1 }
      } else okTimes = 0
    }
    // 4. busy → punish, if not already punished (:125-129)
    if (hb.busy && !punished) {
      punished = true; pStart = hb.ts; pDur = PunishBaseMs; nPunish += 1
    }
    HealthState(black, okTimes, punished, pStart, pDur,
      prevTs = hb.ts, prevBusy = hb.busy, seen = true,
      nEvents = s.nEvents + 1, nBlack = nBlack, nRecover = nRecover,
      nPunish = nPunish, nDouble = nDouble)
  }

  /** Fold a time-ordered run of heartbeats for one worker. */
  def run(worker: Long, hbs: Iterator[Heartbeat]): HealthSummary =
    summarize(worker, hbs.foldLeft(initial)(step))

  /** Streaming tracker: the same machine as an incremental
    * `flatMapGroupsWithState` over a heartbeat stream, emitting the
    * refreshed per-worker summary each time a batch touches the worker
    * (OutputMode.Update downstream). Heartbeats are applied in (ts)
    * order WITHIN each micro-batch; cross-batch order is arrival order,
    * exactly like the reference master, which trusts its inbound RPC
    * stream. State is one fixed-size record per live worker — bounded by
    * fleet size, not by stream length, so no watermark eviction is
    * needed for correctness (add a timeout if workers churn forever). */
  def track(spark: SparkSession, heartbeats: Dataset[Heartbeat]): DataFrame = {
    import spark.implicits._
    heartbeats
      .groupByKey(_.worker)
      .flatMapGroupsWithState[HealthState, HealthSummary](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (worker: Long, batch: Iterator[Heartbeat], gs: GroupState[HealthState]) =>
          val st0 = gs.getOption.getOrElse(initial)
          val st = batch.toSeq.sortBy(h => (h.ts, h.seq)).foldLeft(st0)(step)
          gs.update(st)
          Iterator(summarize(worker, st))
      }
      .toDF()
  }
}
