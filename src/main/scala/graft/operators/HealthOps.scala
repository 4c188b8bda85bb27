package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.WorkerHealth
import graft.streaming.WorkerHealth.{Heartbeat, HealthSummary}

/** Batch surface of the worker-health blacklist/punish state machine
  * (SURVEY.md §2A #20; semantics and reference citations in
  * [[graft.streaming.WorkerHealth]] — the SAME step function drives both
  * this operator and the streaming tracker).
  *
  * Heartbeat fixture, derived deterministically from `events`:
  * worker = user_id, ts = epoch millis, self-check OK ⇔ event_type is not
  * 'error', busy ⇔ value > 120 (the isWorkerBusy threshold disjunction,
  * pre-evaluated — ShuffleWorkerStatusManager.java:184-188).
  *
  * Scale shape (the 1000-executor plan): ONE hash exchange on worker id,
  * a partition-local spillable sort (worker, ts, seq) — Tungsten
  * SortExec, not a per-group in-memory buffer — then a single
  * mapPartitions pass holding O(1) state per run. No window over the
  * full stream, no driver collect; parallelism = worker-id cardinality
  * spread over executors, and a fleet's heartbeat history per worker is
  * days × 8640, never unbounded. */
object HealthOps {
  private type Q = (SparkSession, String) => DataFrame

  /** Busy threshold on the fixture's load column (`value` p77 ≈ 120). */
  val BusyThreshold = 120.0

  def heartbeats(s: SparkSession, d: String): Dataset[Heartbeat] = {
    import s.implicits._
    Tables.events(s, d)
      .select(
        col("user_id").as("worker"),
        // ts arrives as int64 nanos (nanosAsLong); div 10^6 = epoch_ms
        expr("ts div 1000000").as("ts"),
        (col("event_type") =!= "error").as("ok"),
        (col("value") > BusyThreshold).as("busy"),
        col("event_id").as("seq"))
      .as[Heartbeat]
  }

  private val qWorkerHealth: Q = (s, d) => {
    import s.implicits._
    heartbeats(s, d)
      .repartition(col("worker"))
      .sortWithinPartitions(col("worker"), col("ts"), col("seq"))
      .mapPartitions { it =>
        val b = it.buffered
        new Iterator[HealthSummary] {
          def hasNext: Boolean = b.hasNext
          def next(): HealthSummary = {
            val w = b.head.worker
            var st = WorkerHealth.initial
            while (b.hasNext && b.head.worker == w) st = WorkerHealth.step(st, b.next())
            WorkerHealth.summarize(w, st)
          }
        }
      }
      .toDF()
      .orderBy("worker_id")
  }

  /** Admission-quota parameters (ApplicationRequestController):
    * resourceNum (semaphore permits per name-space and control interval),
    * appNamePreLen (name-prefix length defining the quota space — the
    * q_similarity_prefix grouping), and one excluded prefix that bypasses
    * the quota entirely (filterExcludes). */
  val AdmissionCap = 2
  val AdmissionPrefixLen = 3
  val AdmissionExclude = "err"

  /** Per-name-space hourly admission quota
    * (ApplicationRequestController.java:82-112): within each (name-space,
    * hour-window), at most [[AdmissionCap]] DISTINCT holders acquire the
    * semaphore; a request from an appId already holding re-admits
    * (holderList.contains), a new appId past the cap is rejected, and
    * excluded name prefixes bypass without consuming permits (:83-87).
    * The window is the controller's appControlInterval (clearAppMap resets
    * holders each interval). Batch formulation: admitted ⇔ the appId is
    * among the first cap distinct appIds of its window by arrival order —
    * request = event, appName = event_type (name-space = its
    * [[AdmissionPrefixLen]]-prefix, as in q_similarity_prefix), appId =
    * user_id, arrival = (ts, event_id).
    *
    * Scale shape: one partial-aggregated groupBy to first-arrivals (keys
    * only, text never shuffles), a window ranking over (ns, hr) partitions
    * whose size is bounded by distinct holders per window — never the raw
    * request count — and one key-join back to requests that AQE plans by
    * the aggregated side's runtime size. */
  private val qAdmissionQuota: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val req = Tables.events(s, d).select(
      col("event_id"), col("user_id"),
      substring(col("event_type"), 1, AdmissionPrefixLen).as("ns"),
      // µs-epoch hour buckets (ts arrives as int64 nanos)
      expr("(ts div 1000) div 3600000000").as("hr"),
      expr("ts div 1000").as("ep"))
    val firsts = req.filter(col("ns") =!= AdmissionExclude)
      .groupBy("ns", "hr", "user_id")
      .agg(min(struct(col("ep"), col("event_id"))).as("first_req"))
    val ranked = firsts
      .withColumn("holder_rank", row_number().over(
        Window.partitionBy("ns", "hr").orderBy(col("first_req"))))
      .select("ns", "hr", "user_id", "holder_rank")
    req.join(ranked, Seq("ns", "hr", "user_id"), "left")
      .select(col("event_id"), col("ns"), col("hr"), col("user_id"),
        (col("ns") === AdmissionExclude ||
          col("holder_rank") <= AdmissionCap).as("admitted"))
      .orderBy("event_id")
  }

  /** Flow-control parameters (the batch analog of the reference's
    * two-level memory/busy barrier, FlowController.java:110-149,160-202):
    * a tenant's requests occupy their byte size for [[FlowHoldUs]] after
    * arrival, and a request is admitted iff the tenant's in-flight bytes
    * plus its own stay within [[FlowLimit]]. The reference BLOCKS the
    * connection until memory frees; the batch formulation flags the
    * would-block decision instead (the admit/reject ledger a capacity
    * audit replays).
    *
    * Constants sized to the fixture's density (events span ~720 h, ~9-byte
    * payloads, ~0.3 requests/tenant-hour): a 48 h hold with a 100-byte
    * budget makes the barrier BIND — ~30% of sf0.01 requests reject — so
    * the ledger arithmetic is actually exercised, not vacuously admitted. */
  val FlowLimit = 100L
  val FlowHoldUs = 172800000000L // 48 hours in µs
  val FlowTenants = 50L

  /** One flow-control request (public: the Dataset encoder's generated
    * code must be able to reach the class). */
  case class FlowReq(tenant: Long, ep: Long, eventId: Long, bytes: Long)

  /** Per-tenant concurrent-bytes admission ledger — SURVEY §2A #13's one
    * previously-unexpressed semantics. Sequential per-tenant state, so the
    * plan is the same shape as [[qWorkerHealth]]: ONE hash exchange on
    * tenant, a partition-local spillable sort (tenant, ep, event_id), and
    * a single mapPartitions pass whose state is the in-flight queue —
    * bounded by FlowLimit / min(bytes) entries, NEVER the tenant's request
    * history. No window over the full stream, no driver collect;
    * parallelism = tenant cardinality spread over executors. */
  private val qFlowControl: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select((col("user_id") % FlowTenants).as("tenant"),
        expr("ts div 1000").as("ep"),
        col("event_id").as("eventId"),
        length(col("props")).cast("long").as("bytes"))
      .as[FlowReq]
      .repartition(col("tenant"))
      .sortWithinPartitions(col("tenant"), col("ep"), col("eventId"))
      .mapPartitions { it =>
        var cur = Long.MinValue
        // (ep, bytes) of admitted, still-held requests; enqueue order is
        // ep-sorted, so the head is always the earliest holder
        val inflight = scala.collection.mutable.Queue.empty[(Long, Long)]
        var inBytes = 0L
        it.map { r =>
          if (r.tenant != cur) { cur = r.tenant; inflight.clear(); inBytes = 0L }
          while (inflight.nonEmpty && inflight.head._1 <= r.ep - FlowHoldUs) {
            inBytes -= inflight.dequeue()._2
          }
          val admitted = inBytes + r.bytes <= FlowLimit
          if (admitted) { inflight.enqueue((r.ep, r.bytes)); inBytes += r.bytes }
          (r.eventId, r.tenant, r.bytes, admitted)
        }
      }
      .toDF("event_id", "tenant", "bytes", "admitted")
      .orderBy("event_id")
  }

  /** Busy-control parameters — the SECOND half of the reference's
    * two-level barrier (FlowController.busyFlowControl, the connection
    * slots; q_flow_control covers the memory half): a request is admitted
    * iff the worker's held connections fit BOTH the priority/retry-raised
    * barrier `base + prio·perPriority + min(retry, maxRetryIdx)·perRetry`
    * (reference: higher job priority and later retries may pass a busier
    * worker) AND the hard slot total. An admitted connection holds its
    * slot for [[FlowHoldUs]]. Constants sized so every regime is
    * exercised at the fixture density: the barrier range is 3..8 against
    * 8 total slots, retry 4 is CLAMPED by maxRetryIdx 3 (the reference's
    * MAX_RETRY_INDEX min), and the hard cap binds above every barrier. */
  val BusyWorkers = 8L
  val BusyBaseConns = 2L
  val BusyPerPriority = 1L
  val BusyPerRetry = 1L
  val BusyMaxRetryIdx = 3L
  val BusyTotalConns = 8L

  /** One busy-control request (public for the Dataset encoder). */
  case class BusyReq(worker: Long, ep: Long, eventId: Long,
      prio: Long, retry: Long)

  /** Per-worker connection-slot admission ledger — same plan shape as
    * [[qFlowControl]]: ONE hash exchange on worker, a partition-local
    * sorted pass, state = the held-slot queue (<= BusyTotalConns eps,
    * O(1) per worker). Priority/retry derive deterministically from
    * event_id so the oracle replays them bit-for-bit. */
  private val qFlowBusy: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select((col("user_id") % BusyWorkers).as("worker"),
        expr("ts div 1000").as("ep"),
        col("event_id").as("eventId"),
        (col("event_id") % 3 + 1).as("prio"),
        (col("event_id") % 5).as("retry"))
      .as[BusyReq]
      .repartition(col("worker"))
      .sortWithinPartitions(col("worker"), col("ep"), col("eventId"))
      .mapPartitions { it =>
        var cur = Long.MinValue
        // eps of admitted, still-held connections (enqueue order = ep
        // order, so the head is always the earliest holder)
        val held = scala.collection.mutable.Queue.empty[Long]
        it.map { r =>
          if (r.worker != cur) { cur = r.worker; held.clear() }
          while (held.nonEmpty && held.head <= r.ep - FlowHoldUs) held.dequeue()
          val barrier = BusyBaseConns + r.prio * BusyPerPriority +
            math.min(r.retry, BusyMaxRetryIdx) * BusyPerRetry
          // reference order: used-vs-barrier check, then the free-slot
          // check — both on the count BEFORE this admission
          val admitted = held.size <= barrier && held.size < BusyTotalConns
          if (admitted) held.enqueue(r.ep)
          (r.eventId, r.worker, r.prio, r.retry, admitted)
        }
      }
      .toDF("event_id", "worker", "prio", "retry", "admitted")
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map(
    "q_worker_health" -> qWorkerHealth,
    "q_admission_quota" -> qAdmissionQuota,
    "q_flow_control" -> qFlowControl,
    "q_flow_busy" -> qFlowBusy,
  )

  /** The oracle steps the identical machine event-by-event in a recursive
    * CTE: state at event n joins event n+1; the CASE stages mirror
    * WorkerHealth.step's phases (settle punish → gap blacklist →
    * self-check → busy punish) in order via nested derived tables. */
  val oracles: Map[String, String] = Map(
    // Steps the identical in-flight ledger event-by-event: the recursion
    // carries the admitted-and-still-held (ep, bytes) list per tenant,
    // filters it by the hold horizon, and decides exactly as the Spark
    // state machine does.
    "q_flow_control" ->
      s"""WITH RECURSIVE ev AS (
        |  SELECT user_id % $FlowTenants AS tenant,
        |         epoch_us(ts) AS ep, event_id,
        |         CAST(length(props) AS BIGINT) AS bytes,
        |         CAST(row_number() OVER (PARTITION BY user_id % $FlowTenants
        |              ORDER BY epoch_us(ts), event_id) AS INT) AS n
        |  FROM events),
        |seed AS (SELECT DISTINCT tenant FROM ev),
        |rec AS (
        |  SELECT tenant, 0 AS n, CAST(NULL AS BIGINT) AS event_id,
        |         CAST(NULL AS BIGINT) AS bytes, FALSE AS admitted,
        |         CAST([] AS STRUCT(ep BIGINT, b BIGINT)[]) AS fl
        |  FROM seed
        |  UNION ALL
        |  SELECT tenant, n, event_id, bytes,
        |         coalesce(list_sum(list_transform(kept, x -> x.b)), 0)
        |           + bytes <= $FlowLimit AS admitted,
        |         CASE WHEN coalesce(list_sum(list_transform(kept, x -> x.b)), 0)
        |                   + bytes <= $FlowLimit
        |              THEN list_append(kept, {'ep': ep, 'b': bytes})
        |              ELSE kept END AS fl
        |  FROM (
        |    SELECT e.tenant, e.n, e.event_id, e.ep, e.bytes,
        |           list_filter(r.fl, x -> x.ep > e.ep - $FlowHoldUs) AS kept
        |    FROM rec r JOIN ev e ON e.tenant = r.tenant AND e.n = r.n + 1))
        |SELECT event_id, tenant, bytes, admitted
        |FROM rec WHERE n > 0 ORDER BY event_id""".stripMargin,
    // The busy twin: the recursion carries the held-connection ep list
    // per worker, filters by the hold horizon, and admits against the
    // priority/retry-raised barrier plus the hard slot total — the same
    // decision order as the Spark state machine (and the reference).
    "q_flow_busy" ->
      s"""WITH RECURSIVE ev AS (
        |  SELECT user_id % $BusyWorkers AS worker,
        |         epoch_us(ts) AS ep, event_id,
        |         event_id % 3 + 1 AS prio, event_id % 5 AS retry,
        |         CAST(row_number() OVER (PARTITION BY user_id % $BusyWorkers
        |              ORDER BY epoch_us(ts), event_id) AS INT) AS n
        |  FROM events),
        |seed AS (SELECT DISTINCT worker FROM ev),
        |rec AS (
        |  SELECT worker, 0 AS n, CAST(NULL AS BIGINT) AS event_id,
        |         CAST(NULL AS BIGINT) AS prio, CAST(NULL AS BIGINT) AS retry,
        |         FALSE AS admitted, CAST([] AS BIGINT[]) AS fl
        |  FROM seed
        |  UNION ALL
        |  SELECT worker, n, event_id, prio, retry,
        |         (len(kept) <= $BusyBaseConns + prio * $BusyPerPriority
        |            + least(retry, $BusyMaxRetryIdx) * $BusyPerRetry
        |          AND len(kept) < $BusyTotalConns) AS admitted,
        |         CASE WHEN (len(kept) <= $BusyBaseConns
        |                      + prio * $BusyPerPriority
        |                      + least(retry, $BusyMaxRetryIdx) * $BusyPerRetry
        |                    AND len(kept) < $BusyTotalConns)
        |              THEN list_append(kept, ep) ELSE kept END AS fl
        |  FROM (
        |    SELECT e.worker, e.n, e.event_id, e.ep, e.prio, e.retry,
        |           list_filter(r.fl, x -> x > e.ep - $FlowHoldUs) AS kept
        |    FROM rec r JOIN ev e ON e.worker = r.worker AND e.n = r.n + 1))
        |SELECT event_id, worker, prio, retry, admitted
        |FROM rec WHERE n > 0 ORDER BY event_id""".stripMargin,
    "q_admission_quota" ->
      s"""WITH req AS (
        |  SELECT event_id, user_id,
        |         substring(event_type, 1, $AdmissionPrefixLen) AS ns,
        |         epoch_us(ts) // 3600000000 AS hr,
        |         epoch_us(ts) AS ep
        |  FROM events),
        |firsts AS (
        |  SELECT ns, hr, user_id, ep, event_id,
        |         row_number() OVER (PARTITION BY ns, hr, user_id
        |           ORDER BY ep, event_id) AS rn
        |  FROM req WHERE ns <> '$AdmissionExclude'),
        |ranked AS (
        |  SELECT ns, hr, user_id,
        |         row_number() OVER (PARTITION BY ns, hr
        |           ORDER BY ep, event_id) AS holder_rank
        |  FROM firsts WHERE rn = 1)
        |SELECT r.event_id, r.ns, r.hr, r.user_id,
        |       (r.ns = '$AdmissionExclude'
        |         OR coalesce(k.holder_rank <= $AdmissionCap, FALSE))
        |         AS admitted
        |FROM req r LEFT JOIN ranked k
        |  ON r.ns = k.ns AND r.hr = k.hr AND r.user_id = k.user_id
        |ORDER BY r.event_id""".stripMargin,
    "q_worker_health" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id AS w, epoch_ms(ts) AS ts,
        |         (event_type <> 'error') AS ok, (value > 120) AS busy,
        |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS INT) AS n
        |  FROM events
        |), seed AS (SELECT DISTINCT user_id AS w FROM events),
        |rec AS (
        |  SELECT w, 0 AS n, FALSE AS black, 0 AS okt, FALSE AS pun,
        |         CAST(0 AS BIGINT) AS ps, CAST(0 AS BIGINT) AS pd,
        |         CAST(0 AS BIGINT) AS pts, FALSE AS pbusy, FALSE AS seen,
        |         CAST(0 AS BIGINT) AS nb, CAST(0 AS BIGINT) AS nr,
        |         CAST(0 AS BIGINT) AS np, CAST(0 AS BIGINT) AS nd
        |  FROM seed
        |  UNION ALL
        |  SELECT w, n, black3, okt3, pun4, ps4, pd4, ts, busy, TRUE,
        |         nb3, nr3, np4, nd1
        |  FROM (
        |    SELECT *,
        |      (pun1 OR (busy AND NOT pun1)) AS pun4,
        |      CASE WHEN busy AND NOT pun1 THEN ts ELSE ps END AS ps4,
        |      CASE WHEN busy AND NOT pun1 THEN CAST(21600000 AS BIGINT) ELSE pd1 END AS pd4,
        |      np + CASE WHEN busy AND NOT pun1 THEN 1 ELSE 0 END AS np4
        |    FROM (
        |      SELECT *,
        |        CASE WHEN NOT ok AND NOT black2 THEN TRUE
        |             WHEN black2 AND ok AND okt2 + 1 >= 3 THEN FALSE
        |             ELSE black2 END AS black3,
        |        CASE WHEN NOT ok AND NOT black2 THEN 0
        |             WHEN black2 AND ok AND okt2 + 1 >= 3 THEN 0
        |             WHEN black2 AND ok THEN okt2 + 1
        |             WHEN black2 THEN 0
        |             ELSE okt2 END AS okt3,
        |        nb2 + CASE WHEN NOT ok AND NOT black2 THEN 1 ELSE 0 END AS nb3,
        |        nr + CASE WHEN black2 AND ok AND okt2 + 1 >= 3 THEN 1 ELSE 0 END AS nr3
        |      FROM (
        |        SELECT *,
        |          (black OR gapped) AS black2,
        |          CASE WHEN gapped THEN 0 ELSE okt END AS okt2,
        |          nb + CASE WHEN gapped THEN 1 ELSE 0 END AS nb2
        |        FROM (
        |          SELECT *,
        |            (seen AND ts - pts > 86400000 AND NOT black AND NOT pun1) AS gapped
        |          FROM (
        |            SELECT rec.w, ev.n, ev.ts, ev.ok, ev.busy,
        |                   rec.black, rec.okt, rec.pun, rec.ps, rec.pd,
        |                   rec.pts, rec.pbusy, rec.seen,
        |                   rec.nb, rec.nr, rec.np, rec.nd,
        |                   CASE WHEN rec.pun AND ev.ts > rec.ps + rec.pd AND NOT rec.pbusy THEN FALSE ELSE rec.pun END AS pun1,
        |                   CASE WHEN rec.pun AND ev.ts > rec.ps + rec.pd AND rec.pbusy THEN rec.pd * 2 ELSE rec.pd END AS pd1,
        |                   rec.nd + CASE WHEN rec.pun AND ev.ts > rec.ps + rec.pd AND rec.pbusy THEN 1 ELSE 0 END AS nd1
        |            FROM rec JOIN ev ON ev.w = rec.w AND ev.n = rec.n + 1
        |          )
        |        )
        |      )
        |    )
        |  )
        |)
        |SELECT w AS worker_id, CAST(n AS BIGINT) AS n_events,
        |       nb AS n_black, nr AS n_recover, np AS n_punish, nd AS n_double,
        |       CAST(CASE WHEN black THEN 1 ELSE 0 END AS INT) AS final_black,
        |       CAST(CASE WHEN pun THEN 1 ELSE 0 END AS INT) AS final_punished,
        |       CAST(CASE WHEN NOT black AND NOT pun THEN 1 ELSE 0 END AS INT) AS final_online
        |FROM rec
        |QUALIFY n = max(n) OVER (PARTITION BY w)
        |ORDER BY worker_id""".stripMargin,
  )
}
