package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-series analytics over the `events` stream table — the two
  * classic shapes every telemetry/product pipeline runs that the
  * relational family (sessionize / cohort / windows) does not yet cover:
  * time-series GAP FILL with last-observation-carried-forward, and the
  * ordered multi-step FUNNEL.
  *
  * Both are exact and engine-neutral: day indices are integer divisions
  * of the epoch-nanos contract `Tables.events` guarantees, and value sums
  * ride the DECIMAL(18,2) discipline (double-sum order independence —
  * SCALING.md "Principles"). */
object EventOps {
  private type Q = (SparkSession, String) => DataFrame

  private val NanosPerDay = 86400000000000L

  /** Daily gap-fill per user: aggregate events to (user, day) rows, then
    * materialize EVERY day of each user's own [first, last] span, marking
    * synthesized days and carrying the last observed daily sum forward
    * (LOCF) — the imputation step before any per-user time-series model.
    *
    * Scale shape: ONE exchange keys everything by user (daily agg, span
    * agg, day explode and the LOCF window all share it — Catalyst
    * collapses the matching partitionings); the explode is bounded by
    * span length, never event count, and the LOCF window is partition-
    * local per user. A mega-user is the q_scd_merge skew class (its
    * history still aggregates to one row per day before the window). */
  private val qGapFill: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .select(col("user_id"), expr(s"ts div $NanosPerDay").as("day"),
        col("value"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("dsum"))
    val days = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        col("n").isNull.as("filled"),
        last(col("dsum"), ignoreNulls = true).over(w)
          .cast("double").as("filled_sum"))
      .orderBy("user_id", "day")
  }

  /** Ordered conversion funnel signup → view → click → purchase: a user
    * reaches step k iff the steps' events exist with STRICTLY increasing
    * timestamps (each step's anchor is the EARLIEST qualifying event —
    * the standard unordered-window funnel definition). Emits one row per
    * step with the users-reached count.
    *
    * Scale shape: each stage is a groupBy(user) min over a filtered scan
    * plus a join whose per-user-anchor side is aggregate-tiny (one row
    * per qualifying user — AQE broadcasts it); no per-user event arrays
    * ever materialize, so a mega-user costs nothing beyond their scan.
    * The alternative single-pass collect_list fold carries O(events per
    * user) state — the jumbo-row hazard this formulation avoids. */
  private val qEventFunnel: Q = (s, d) => {
    // µs granularity (`ts div 1000`) so the strict > anchors compare at
    // exactly the oracle's epoch_us precision whatever the fixture's
    // parquet timestamp unit — the q_scd_merge discipline
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ts"))
    val steps = Seq("signup", "view", "click", "purchase")
    var anchors = ev.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts").as("t"))
    var out = anchors.agg(count(lit(1)).as("users"))
      .select(lit(1L).as("step"), lit(steps.head).as("step_name"), col("users"))
    for (k <- 1 until steps.length) {
      anchors = ev.filter(col("event_type") === steps(k))
        .join(anchors, "user_id")
        .filter(col("ts") > col("t"))
        .groupBy("user_id").agg(min("ts").as("t"))
      out = out.unionByName(anchors.agg(count(lit(1)).as("users"))
        .select(lit((k + 1).toLong).as("step"), lit(steps(k)).as("step_name"),
          col("users")))
    }
    out.orderBy("step")
  }

  /** Robust per-type outliers: |value − median| / (1.4826·MAD) > 3.5 —
    * the median/MAD robust z-score (the classic Iglewicz–Hoaglin cut at
    * 3.5), immune to the outliers it hunts, unlike mean/stddev scoring
    * which a heavy tail drags. Emits the flagged events with the rounded
    * score.
    *
    * Engine parity: Spark's `median` and DuckDB's `median` both compute
    * the exact linearly-interpolated 0.5-quantile, so the two medians
    * (and the MAD of deviations from them) agree to the last ulp; the
    * score rounds at 4 digits and the fixture's 0.01-granular values put
    * no score near the 3.5 cut (rational-grid argument, same class as
    * the q_stats_moments rounding note).
    *
    * Scale shape (100 TB): groupBy(event_type) is a VOCABULARY-sized
    * reduce whose per-group exact median needs the group's value
    * multiset — the one non-sketch step. At billions of rows per type
    * the remedy is the standard two-pass selection (bucket histogram →
    * recurse into the median bucket) or `approx_percentile`'s t-digest
    * when a 1e-4-relative median suffices; both keep the map side a
    * streaming pass. The median/MAD frames are 5 rows → broadcast joins,
    * zero fact-side shuffle beyond the two aggregations. */
  /** The median/MAD core over (event_id, event_type, value) rows.
    * Types with MAD = 0 (>= 50% identical values — the score would be
    * 0/0 or Infinity) are EXCLUDED, in both this plan and the oracle:
    * a degenerate spread carries no outlier signal, and engines differ
    * on zero-division semantics (Spark Infinity vs SQL NULL). */
  private[graft] def robustOutliers(ev: DataFrame, cut: Double = 3.5): DataFrame = {
    val med = ev.groupBy("event_type").agg(median(col("value")).as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("dv", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type").agg(median(col("dv")).as("mad"))
      .filter(col("mad") > 0)
    dev.join(broadcast(mad), "event_type")
      .withColumn("score", col("dv") / (lit(1.4826) * col("mad")))
      .filter(col("score") > cut)
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("score"), 4).as("score"))
      .orderBy("event_type", "event_id")
  }

  private val qOutlierMad: Q = (s, d) =>
    robustOutliers(Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value")))

  /** Top-50 session event-type paths: 30-min-gap sessionization (the
    * q_window_session definition), each session rendered as its first-8
    * event types joined with '>' — the "how do users actually move"
    * report behind funnel design.
    *
    * Scale shape: ONE exchange keys everything by user (gap window,
    * session-id running sum, and the per-session rank all share the
    * user partitioning; the (user, sid) rank is a finer key of the same
    * partition — no second exchange). The first-8 cap is applied by
    * row_number BEFORE collect_list, so a bot mega-session contributes 8
    * rows to the aggregate, never a jumbo array. The path table is
    * bounded by min(sessions, |types|^8) and the top-50 is
    * TakeOrderedAndProject — no global sort materializes. Ties at the
    * cut break by path text: a deterministic total order, so both
    * engines pick the same 50. */
  private val qSessionPaths: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    val sess = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("ep"))
      .withColumn("gap", col("ep") - lag(col("ep"), 1).over(w))
      .withColumn("ns",
        when(col("gap").isNull || col("gap") > 1800000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("ns")).over(w))
    val wSess = Window.partitionBy("user_id", "sid").orderBy("ep", "event_id")
    sess
      .withColumn("rn", row_number().over(wSess))
      .filter(col("rn") <= 8)
      .groupBy("user_id", "sid")
      .agg(array_join(expr(
        "transform(array_sort(collect_list(struct(ep, event_id, event_type))), x -> x.event_type)"),
        ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(50)
  }

  /** Trailing-7-day distinct users per active day — the DAU/WAU rolling
    * reach metric. The EXACT counts are the oracle-checked output; the
    * mergeable HLL path rides alongside as a 5% boolean gate (the
    * q_hll_distinct convention — DuckDB cannot replay the datasketches
    * registers, the estimate's accuracy is what is checkable).
    *
    * Scale shape (100 TB): the naive formulation is a day-range
    * SELF-JOIN (anchors × trailing days — re-scans the fact slice per
    * anchor); this plan instead EXPLODES each distinct (user, day) into
    * the ≤ 7 anchors it contributes to — a bounded ×7 fan-out of the
    * already-deduped user-day slice, never of raw events — semi-joins
    * the real anchor days, and counts distinct per anchor: one hash
    * exchange keyed (anchor, user). The HLL twin is the path that
    * survives at full scale: per-day sketches are partial-aggregable
    * O(kB) summaries, so the window merge (hll_union_agg over the same
    * bounded expansion) never re-shuffles raw user ids — per-anchor
    * state is 7 sketches instead of the day's distinct-user set. */
  private val qRollingDistinct: Q = (s, d) => {
    val ud = graft.Caching.persist(Tables.events(s, d)
      .select(col("user_id"), expr(s"ts div $NanosPerDay").as("day"))
      .distinct())
    val anchors = ud.select(col("day").as("anchor")).distinct()
    val exact = ud
      .select(col("user_id"), explode(expr("sequence(day, day + 6)")).as("anchor"))
      .join(anchors, Seq("anchor"), "left_semi")
      .groupBy("anchor").agg(countDistinct("user_id").as("n_users_7d"))
    val est = ud.groupBy("day").agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .select(col("sk"), explode(expr("sequence(day, day + 6)")).as("anchor"))
      .join(anchors, Seq("anchor"), "left_semi")
      .groupBy("anchor")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx"))
    exact.join(est, "anchor")
      .select(col("anchor").as("day"), col("n_users_7d"),
        (abs(col("approx") - col("n_users_7d")) <=
          col("n_users_7d") * 0.05).as("approx_ok"))
      .orderBy("day")
  }

  val queries: Map[String, Q] = Map(
    "q_gap_fill" -> qGapFill,
    "q_event_funnel" -> qEventFunnel,
    "q_outlier_mad" -> qOutlierMad,
    "q_session_paths" -> qSessionPaths,
    "q_rolling_distinct" -> qRollingDistinct,
  )

  val oracles: Map[String, String] = Map(
    // epoch_us // 86400e6 == (epoch-nanos div 86400e9): both floor the
    // same post-epoch instants to the same day index
    "q_gap_fill" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, value
        |  FROM events),
        |daily AS (
        |  SELECT user_id, day, count(*) AS n,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS dsum
        |  FROM ev GROUP BY 1, 2),
        |spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |          FROM daily GROUP BY 1),
        |days AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM spans),
        |j AS (SELECT days.user_id, days.day, daily.n, daily.dsum
        |      FROM days LEFT JOIN daily USING (user_id, day))
        |SELECT user_id, CAST(day AS BIGINT) AS day,
        |       CAST(coalesce(n, 0) AS BIGINT) AS n_events,
        |       n IS NULL AS filled,
        |       CAST(last_value(dsum IGNORE NULLS) OVER (
        |         PARTITION BY user_id ORDER BY day
        |         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS filled_sum
        |FROM j ORDER BY user_id, day""".stripMargin,
    "q_event_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t FROM ev
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT ev.user_id, min(us) AS t FROM ev JOIN s1 USING (user_id)
        |       WHERE event_type = 'view' AND us > s1.t GROUP BY 1),
        |s3 AS (SELECT ev.user_id, min(us) AS t FROM ev JOIN s2 USING (user_id)
        |       WHERE event_type = 'click' AND us > s2.t GROUP BY 1),
        |s4 AS (SELECT ev.user_id, min(us) AS t FROM ev JOIN s3 USING (user_id)
        |       WHERE event_type = 'purchase' AND us > s3.t GROUP BY 1)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step, 'signup' AS step_name,
        |         CAST((SELECT count(*) FROM s1) AS BIGINT) AS users
        |  UNION ALL SELECT 2, 'view', CAST((SELECT count(*) FROM s2) AS BIGINT)
        |  UNION ALL SELECT 3, 'click', CAST((SELECT count(*) FROM s3) AS BIGINT)
        |  UNION ALL SELECT 4, 'purchase', CAST((SELECT count(*) FROM s4) AS BIGINT))
        |ORDER BY step""".stripMargin,
    "q_outlier_mad" ->
      """WITH med AS (SELECT event_type, median(value) AS med FROM events GROUP BY 1),
        |dev AS (SELECT e.event_id, e.event_type, e.value,
        |               abs(e.value - med.med) AS dv
        |        FROM events e JOIN med USING (event_type)),
        |mad AS (SELECT event_type, median(dv) AS mad FROM dev
        |        GROUP BY 1 HAVING median(dv) > 0)
        |SELECT dev.event_id, dev.event_type, dev.value,
        |       round(dv / (1.4826 * mad.mad), 4) AS score
        |FROM dev JOIN mad USING (event_type)
        |WHERE dv / (1.4826 * mad.mad) > 3.5
        |ORDER BY event_type, event_id""".stripMargin,
    "q_session_paths" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ep FROM events),
        |g AS (SELECT user_id, event_id, event_type, ep,
        |             CASE WHEN ep - lag(ep) OVER w IS NULL
        |                    OR ep - lag(ep) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
        |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)),
        |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ep, event_id
        |                              ROWS UNBOUNDED PRECEDING) AS sid FROM g),
        |capped AS (SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, sid
        |                                 ORDER BY ep, event_id) AS rn
        |    FROM s) WHERE rn <= 8),
        |p AS (SELECT user_id, sid,
        |             array_to_string(list(event_type ORDER BY ep, event_id), '>') AS path
        |      FROM capped GROUP BY 1, 2)
        |SELECT path, CAST(count(*) AS BIGINT) AS n
        |FROM p GROUP BY 1 ORDER BY n DESC, path LIMIT 50""".stripMargin,
    // exact trailing-window distinct; approx_ok TRUE is the contract the
    // Spark side must meet (the q_hll_distinct convention)
    "q_rolling_distinct" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |                   epoch_us(ts) // 86400000000 AS day FROM events),
        |a AS (SELECT DISTINCT day AS anchor FROM ud)
        |SELECT CAST(a.anchor AS BIGINT) AS day,
        |       CAST(count(DISTINCT ud.user_id) AS BIGINT) AS n_users_7d,
        |       true AS approx_ok
        |FROM a JOIN ud ON ud.day BETWEEN a.anchor - 6 AND a.anchor
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
