package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.Tables.{dec2, sumd2}

/** Core relational operator family — the user-facing query surface of the
  * shuffle contract the reference serves (SURVEY.md §2B).
  *
  * Every query is a pure `(SparkSession, sfDir) => DataFrame` whose result
  * is deterministic (explicit total ORDER BY, exact decimal arithmetic for
  * float aggregates) so the driver can hash-compare it against the DuckDB
  * oracle in [[CoreOps.oracles]].
  *
  * Scale notes: aggregations are declared via `groupBy().agg()` so Catalyst
  * plans partial (map-side) + final aggregation — the same split the
  * reference implements by hand in its sort writer
  * (Ors2ExternalSorter.scala:90-117) and reader (Ors2ShuffleReader.scala:69-81).
  * Small dimension tables are broadcast explicitly; large joins stay
  * shuffle-based and AQE-eligible.
  */
object CoreOps {
  private type Q = (SparkSession, String) => DataFrame

  /** Flagship: repartition + global agg — the reference's golden e2e test
    * (count=10000, sum=50005000; Ors2ShuffleManagerTest.scala:74-81). The
    * repartition(10) is the explicit shuffle the reference exists to serve.
    */
  def qRepartitionCount(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .repartition(10)
      .agg(count(lit(1)).as("cnt"), sumd2(col("l_quantity")).as("sum_qty"))

  /** Hash agg with map-side combine (partial+final split; SURVEY §2A #6, #29). */
  private val qGroupbyPartialFinal: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("cnt"),
        sumd2(col("l_quantity")).as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        (sum(dec2(col("l_extendedprice"))).cast("double") / count(lit(1)))
          .as("avg_price"))
      .orderBy("l_returnflag", "l_linestatus")

  /** High-cardinality group key — exercises the spill-path semantics the
    * reference handles in Ors2ExternalSorter.scala:148-193. */
  private val qGroupbyHighcard: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("cnt"), sumd2(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_orderkey")

  /** distinct = shuffle + dedup (SURVEY §2A #25). */
  private val qDistinct: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_linenumber"))
      .distinct()
      .orderBy("l_returnflag", "l_linestatus", "l_linenumber")

  /** Reduce-side total order (Ors2ShuffleReader.scala:84-103 → SortExec). */
  private val qSortGlobal: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // string date: engines/readers disagree on date32 vs timestamp repr
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
      .orderBy("ship_date", "l_orderkey", "l_linenumber")

  /** Partition-local order: map output is partition-sorted, not key-sorted
    * (Ors2SortShuffleWriter.scala:43-48). We *physically verify* the
    * invariant with a mapPartitions scan: violations must be 0. */
  private val qSortWithinPartitions: Q = (s, d) => {
    import s.implicits._
    val sorted = Tables.lineitem(s, d)
      .repartition(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey", "l_linenumber")
    sorted.select(col("l_orderkey")).as[Long]
      .mapPartitions { it =>
        var prev = Long.MinValue; var viol = 0L; var n = 0L
        it.foreach { k => if (k < prev) viol += 1; prev = k; n += 1 }
        Iterator((viol, n))
      }
      .toDF("v", "n")
      .agg(sum("v").as("violations"), sum("n").as("rows_total"))
  }

  /** Top-k per group — the dispatcher "pick k workers by weight" semantics
    * (WeightedRandomDispatcher.java:31-47, ThroughputBasedDispatcher.java:35-43)
    * as a revenue top-3 per nation. Broadcast the supplier dim. */
  private val qTopk: Q = (s, d) => {
    val rev = dec2(col("l_extendedprice")) *
      (lit(1).cast("decimal(18,2)") - dec2(col("l_discount")))
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("revenue").desc, col("s_suppkey"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"), col("s_suppkey"))
      .agg(sum(rev).cast("double").as("revenue"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("s_nationkey", "s_suppkey", "revenue", "rk")
      .orderBy("s_nationkey", "rk")
  }

  /** Rotating slice selection (RoundRobinDispatcher.java:39-81): cursor=1,
    * every 3rd worker in sorted order. Global row number via the
    * distributed [[RankOps.globalRowNumber]] (bucketed two-pass), not a
    * single-partition window. */
  private val qRoundrobinSlice: Q = (s, d) =>
    RankOps.globalRowNumber(
        Tables.supplier(s, d).select("s_suppkey", "s_name"),
        col("s_suppkey"), Nil, buckets = 8, out = "rn")
      .filter((col("rn") - 1) % 3 === 1)
      .select("s_suppkey", "s_name", "rn")
      .orderBy("rn")

  /** Partition→group balanced assignment: p % numGroups, balance invariant
    * max−min ≤ 1 (Ors2ShuffleManager.scala:355-364;
    * Ors2ShuffleDistributeTest.scala:56-74 uses 4000 partitions / 3 groups). */
  private val qGroupAssignment: Q = (s, _) =>
    s.range(4000)
      .select(pmod(col("id"), lit(3)).cast("int").as("group_id"))
      .groupBy("group_id")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("group_id")

  /** Equi-join on the fact tables — the canonical consumer of the shuffle
    * contract (ShuffleDependency semantics, Ors2ShuffleManager.scala:105-111).
    * Left as a shuffle join on purpose (both sides large at scale). */
  private val qJoinEqui: Q = (s, d) => {
    val rev = dec2(col("l_extendedprice")) *
      (lit(1).cast("decimal(18,2)") - dec2(col("l_discount")))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), sum(rev).cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** Broadcast-join variant: small dim (part) broadcast to every executor —
    * no shuffle of the fact side at all. */
  private val qJoinBroadcast: Q = (s, d) =>
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("cnt"), sumd2(col("l_quantity")).as("sum_qty"))
      .orderBy("p_brand")

  /** Existence/absence joins — the checksum missing-map detection is an
    * anti-join (ShufflePartitionReader.java:227-239). */
  private val qJoinSemiAnti: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("cnt")).withColumn("kind", lit("semi"))
    val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("cnt")).withColumn("kind", lit("anti"))
    anti.unionByName(semi).select("kind", "cnt").orderBy("kind")
  }

  /** Multi-level totals — per-(dc, cluster) worker rollups
    * (ShuffleWorkerStatusManager.java groups workers by dc/cluster). */
  private val qAggRollup: Q = (s, d) =>
    Tables.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), sumd2(col("o_totalprice")).as("sum_total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("cnt"), col("sum_total"))
      .orderBy("status", "priority")

  /** Set ops — blacklist conf vs live worker set (BlackListRefresher.java). */
  private val qUnionExcept: Q = (s, d) => {
    val live = Tables.customer(s, d).select(col("c_nationkey").as("nkey")).distinct()
    val conf = Tables.supplier(s, d).select(col("s_nationkey").as("nkey")).distinct()
    live.except(conf).withColumn("op", lit("except"))
      .unionByName(live.intersect(conf).withColumn("op", lit("intersect")))
      .unionByName(live.union(conf).distinct().withColumn("op", lit("union")))
      .select("op", "nkey")
      .orderBy("op", "nkey")
  }

  /** Heartbeat-gap sessionization (expired ⇔ gap > interval;
    * ShuffleWorkerStatusManager.java:90-95). Gap threshold 30 min, epochs in
    * exact microseconds: ts arrives as int64 nanos (nanosAsLong) and
    * `div 1000` matches DuckDB's ns→µs truncation exactly. */
  private val qWindowSession: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ep"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ep"))
      .withColumn("gap", col("ep") - lag(col("ep"), 1).over(w))
      .withColumn("ns", when(col("gap").isNull || col("gap") > 1800000000L, 1).otherwise(0))
      .groupBy("user_id")
      .agg(sum(col("ns")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** Native session windows: Spark's session_window operator over the
    * heartbeat stream — same 30-min-gap semantics as q_window_session but
    * emitting one row per session with its start time (the state-store
    * backed operator Structured Streaming uses). */
  private val qSessionWindow: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("user_id"),
        timestamp_micros(expr("ts div 1000")).as("tstamp"))
      .groupBy(session_window(col("tstamp"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("sess_start"),
        col("n_events"))
      .orderBy("user_id", "sess_start")

  /** General window functions: running spend per customer (cumulative exact
    * decimal sum) + order index. */
  private val qWindowFuncs: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(dec2(col("o_totalprice"))).over(w).cast("double").as("cum_spend"),
        row_number().over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_orderdate"), col("o_orderkey"))).as("order_idx"))
      .orderBy("o_custkey", "order_idx")
  }

  /** Approximate distinct at scale (HLL). Output is the exact count plus a
    * boolean gate that the HLL estimate is within 5% — keeps the result
    * deterministic/oracle-checkable while still exercising the sketch. */
  private val qHllDistinct: Q = (s, d) =>
    Tables.events(s, d)
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        // rsd=0.02: the 0.05 default is a std-dev, not a bound — at sf0.1
        // it landed outside the 5% gate. 0.02 stays well inside (measured
        // error <= 0.4% at sf0.001/0.01/0.1) at a quarter of the register
        // cost of 0.01 (HLL update cost grows with sketch width here).
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .select(
        col("exact_users"),
        (abs(col("approx") - col("exact_users")) <=
          col("exact_users") * 0.05).as("approx_ok"))

  /** Throughput-based dispatch, implemented for real (the reference's
    * ThroughputBasedDispatcher.java:35-43 is a stub returning null): top-3
    * workers by exact total throughput. Worker fixture per FIXTURES.md §B. */
  private val qThroughputTopk: Q = (s, d) =>
    Tables.events(s, d)
      .select(
        concat(lit("w"), (col("user_id") % 32).cast("string")).as("worker_id"),
        col("value"))
      .groupBy("worker_id")
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("throughput"))
      // top-k via TakeOrderedAndProject: only k rows funnel to one
      // partition (vs a global window funneling ALL groups); the trailing
      // 3-row window just materializes the rank column
      .orderBy(col("throughput").desc, col("worker_id"))
      .limit(3)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("throughput").desc, col("worker_id"))))
      .orderBy("rk")

  /** Weighted sampling without replacement (A-Res, Efraimidis–Spirakis) —
    * WeightedRandomDispatcher.java:31-47 made deterministic by replacing
    * rand() with the portable hash so the oracle can replay it. */
  private val qWeightedSample: Q = (s, d) => {
    val u = (Tables.phash(col("s_suppkey")) + lit(1)).cast("double") / lit(1000000008.0)
    val weight = abs(col("s_acctbal")) + lit(1.0)
    Tables.supplier(s, d)
      .withColumn("skey", pow(u, lit(1.0) / weight))
      // TakeOrderedAndProject funnels only k rows, not the population
      .orderBy(col("skey").desc, col("s_suppkey"))
      .limit(3)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("skey").desc, col("s_suppkey"))))
      .select("s_suppkey", "s_name", "rk")
      .orderBy("rk")
  }

  /** Prefix-similarity grouping: two names "similar" iff their first p chars
    * are equal (SimilarityUtils.java:21-41, used for app-name quota spaces
    * at ApplicationRequestController.java:125-131). */
  private val qSimilarityPrefix: Q = (s, d) =>
    Tables.part(s, d)
      .groupBy(substring(col("p_type"), 1, 8).as("prefix"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col("p_type")).as("n_types"))
      .orderBy("prefix")

  /** Partition scrambling (RandomSortPartition.java:34-90): tasks traverse
    * partitions in a pseudo-random order so concurrent tasks don't hammer
    * one worker; sort/restore must be a bijection
    * (Ors2ShuffleDistributeTest.scala:29-54). Modeled with the portable
    * hash as the scramble key; the query proves the bijection. */
  private val qPartitionScramble: Q = (s, _) => {
    val parts = RankOps.globalRowNumber(
      s.range(1024).select(col("id").as("p")),
      Tables.phash(col("p")), Seq(col("p")), buckets = 8, out = "scramble_rank")
    parts.agg(
      count(lit(1)).as("n_parts"),
      countDistinct(col("scramble_rank")).as("n_positions"),
      (min("scramble_rank") === 1 &&
        max("scramble_rank") === count(lit(1))).as("is_bijection"))
  }

  /** Full cube — all grouping-set combinations (multi-dim health rollups). */
  private val qAggCube: Q = (s, d) =>
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), sumd2(col("o_totalprice")).as("sum_total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("cnt"), col("sum_total"))
      .orderBy("status", "priority")

  /** lag/lead deltas — heartbeat throughput change per worker
    * (ShuffleWorkerStatusManager.java throughput tracking). */
  private val qWindowLag: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ep"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("value"),
        expr("ts div 1000").as("ep"))
      .select(col("user_id"), col("event_id"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta"),
        lead(col("event_id"), 1).over(w).as("next_event"))
      .orderBy("user_id", "event_id")
  }

  /** As-of join (time-series point-in-time lookup — an operator Spark
    * lacks natively; composed per the preference order from existing ops):
    * for each event, the latest order of the same customer key with
    * order time <= event time. Union both sides, one window pass carrying
    * the last seen order key — O(n log n) in the shuffle sort, no
    * range-join explosion. */
  private val qAsofJoin: Q = (s, d) =>
    AsOfOps.asofJoin(
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ep")),
        Tables.orders(s, d),
        leftKey = col("user_id"), leftTime = col("ep"),
        rightKey = col("o_custkey"),
        // o_orderdate is TIMESTAMP_NTZ; session TZ is UTC so the cast is exact
        rightTime = unix_micros(col("o_orderdate").cast("timestamp")),
        rightValue = col("o_orderkey"), tieBreak = col("o_orderkey"),
        out = "asof_orderkey")
      .select("user_id", "event_id", "asof_orderkey")
      .orderBy("user_id", "event_id")

  /** Pivot: per-user event-type counts as columns. */
  private val qPivot: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .select(col("user_id"),
        coalesce(col("click"), lit(0L)).as("n_click"),
        coalesce(col("view"), lit(0L)).as("n_view"),
        coalesce(col("purchase"), lit(0L)).as("n_purchase"),
        coalesce(col("signup"), lit(0L)).as("n_signup"),
        coalesce(col("error"), lit(0L)).as("n_error"))
      .orderBy("user_id")

  /** Exact percentiles over the (heavily repeated) integer quantity domain —
    * interpolation lands on equal neighbors, so the result is engine-exact. */
  private val qPercentile: Q = (s, d) =>
    Tables.lineitem(s, d)
      .agg(
        count(lit(1)).as("cnt"),
        expr("percentile(l_quantity, 0.5D)").as("p50_qty"),
        expr("percentile(l_quantity, 0.9D)").as("p90_qty"))

  /** Sketch-based quantiles with a correctness gate (same contract as
    * q_hll_distinct): exact percentiles are the oracle-checked output,
    * booleans assert the sketch estimate by RANK error — the guarantee
    * approx_percentile actually makes. A value-error gate is meaningless
    * on a discrete domain (the sketch returns a real element, exact
    * percentile interpolates between two). Gate: the fraction of values
    * strictly below the estimate must not exceed q+eps, and the fraction
    * at-or-below must reach q-eps. The sketch is the scale path: exact
    * percentile materializes the whole column, the sketch is a
    * partial-aggregable summary. */
  private val qApproxPercentile: Q = (s, d) => {
    val sk = Tables.lineitem(s, d).agg(
      expr("approx_percentile(l_quantity, 0.5D, 10000)").cast("double").as("a50"),
      expr("approx_percentile(l_quantity, 0.9D, 10000)").cast("double").as("a90"))
    def rankOk(a: Column, q: Double, eps: Double): Column = {
      val n = count(lit(1)).cast("double")
      val below = sum(when(col("l_quantity") < a, 1L).otherwise(0L)).cast("double")
      val atOrBelow = sum(when(col("l_quantity") <= a, 1L).otherwise(0L)).cast("double")
      (below / n <= q + eps) && (atOrBelow / n >= q - eps)
    }
    Tables.lineitem(s, d).select("l_quantity").crossJoin(broadcast(sk))
      .agg(
        expr("percentile(l_quantity, 0.5D)").as("p50"),
        expr("percentile(l_quantity, 0.9D)").as("p90"),
        rankOk(col("a50"), 0.5, 0.005).as("approx_ok_50"),
        rankOk(col("a90"), 0.9, 0.005).as("approx_ok_90"))
  }

  /** Rolling-frame aggregation: per-user moving sum/avg of the last 5
    * events (ROWS 4 PRECEDING..CURRENT) — the bounded-frame window every
    * metering pipeline runs. Partitioned by user (no global window);
    * decimal arithmetic keeps the 5-term sums engine-exact. */
  private val qRollingAgg: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ep"), col("event_id"))
      .rowsBetween(-4, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("ep"),
        col("value").cast("decimal(18,6)").as("v"))
      .select(col("user_id"), col("event_id"),
        sum(col("v")).over(w).cast("double").as("roll_sum"),
        count(lit(1)).over(w).as("roll_n"))
      .orderBy("user_id", "event_id")
  }

  /** Time-RANGE rolling aggregation: per-user sum/count of events in the
    * trailing 10 minutes — the VALUE-based frame (q_rolling_agg covers the
    * ROWS frame). RANGE frames are peer-inclusive: equal timestamps share
    * one frame, so the result is deterministic without a tie-break column.
    * Partitioned by user — no global window; decimal sums stay exact. */
  private val qRollingRange: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ep"))
      .rangeBetween(-600000000L, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("ep"),
        col("value").cast("decimal(18,6)").as("v"))
      .select(col("user_id"), col("event_id"),
        sum(col("v")).over(w).cast("double").as("range_sum"),
        count(lit(1)).over(w).as("range_n"))
      .orderBy("user_id", "event_id")
  }

  /** Two-stage salted aggregation as a registered query (SkewOps is the
    * library form): the salt spreads a hot key over 8 reducers and the
    * merge must be invisible in the result — the oracle is the direct
    * one-stage groupBy. */
  private val qSaltedAgg: Q = (s, d) =>
    SkewOps.saltedSumCount(
      Tables.lineitem(s, d)
        // floor() on BOTH sides: Spark cast-to-long truncates but DuckDB
        // CAST AS BIGINT rounds — explicit floor removes the latent
        // divergence should a fixture ever carry fractional quantities
        .select(col("l_returnflag"), floor(col("l_quantity")).cast("long").as("qty")),
      "l_returnflag", "qty", salts = 8, sumCol = "sum_qty", cntCol = "cnt")
      .orderBy("l_returnflag")

  /** Top-k per group through the typed [[graft.functions.TopKAgg]]
    * aggregator — the partial-aggregable formulation: each map task's
    * buffer carries at most k pairs per group, so the shuffle moves
    * k×groups rows instead of everything (the window/row_number plan
    * shuffles all rows even with WindowGroupLimit's partial pass). The
    * oracle is the window formulation — both must agree exactly. */
  private val qTopkAgg: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select(col("event_type"), col("value"), col("event_id"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new graft.functions.TopKAgg(3).toColumn.name("top"))
      .flatMap { case (etype, buf) =>
        buf.scores.zip(buf.ids).zipWithIndex.map {
          case ((score, id), i) => (etype, i + 1, id, score)
        }
      }
      .toDF("event_type", "rk", "event_id", "value")
      .orderBy("event_type", "rk")
  }

  /** Semi-structured extraction: pull a typed field out of the JSON props
    * column and aggregate — the schema-on-read path of a training
    * pipeline's metadata columns. */
  private val qJsonExtract: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** Deterministic hash-sampling: a stable ~10% subsample via the portable
    * hash — reproducible downsampling for eval splits (unlike TABLESAMPLE,
    * identical across engines and runs). */
  private val qHashSample: Q = (s, d) =>
    Tables.events(s, d)
      .filter(Tables.phash(col("event_id")) % 100 < 10)
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))

  /** Time bucketing: orders per calendar month (training pipelines
    * partition and audit by date buckets). String-formatted month avoids
    * the DATE-dtype reader ambiguity. */
  private val qTimeBucket: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("cnt"), sumd2(col("o_totalprice")).as("sum_total"))
      .orderBy("month")

  /** Explicit grouping sets (beyond rollup/cube): per-status totals and
    * per-priority totals in one pass, via the SQL surface. */
  private val qGroupingSets: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(1) AS cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY status, priority""".stripMargin)
  }

  /** Theta (non-equi) join: pairs of same-nation suppliers ranked by
    * account balance — an equi key (nation) plus an inequality residual,
    * so Catalyst plans a hash/merge join on the key with the residual as
    * join condition, NOT a cartesian product. */
  private val qJoinTheta: Q = (s, d) => {
    val a = Tables.supplier(s, d)
      .select(col("s_nationkey").as("nk"), col("s_acctbal").as("bal_a"))
    val b = Tables.supplier(s, d)
      .select(col("s_nationkey").as("nk"), col("s_acctbal").as("bal_b"))
    a.join(b, Seq("nk")).filter(col("bal_a") < col("bal_b"))
      .groupBy("nk")
      .agg(count(lit(1)).as("n_ordered_pairs"))
      .orderBy("nk")
  }

  /** Multiset (bag) set ops: EXCEPT ALL / INTERSECT ALL preserve
    * multiplicity — the duplicate-aware variants of q_union_except. */
  private val qExceptAll: Q = (s, d) => {
    val a = Tables.lineitem(s, d).select(col("l_suppkey").as("k"))
    val b = Tables.supplier(s, d).select(col("s_suppkey").as("k"))
    a.exceptAll(b).groupBy().agg(count(lit(1)).as("except_all_cnt"))
      .crossJoin(
        a.intersectAll(b).groupBy().agg(count(lit(1)).as("intersect_all_cnt")))
  }

  /** Ordered-argument aggregates: per nation, the supplier holding the max
    * account balance (max_by) and min (min_by) — single-pass argmax. */
  private val qArgmax: Q = (s, d) =>
    Tables.supplier(s, d)
      .groupBy(col("s_nationkey"))
      .agg(
        // plain scalar key: acctbal is tie-free per nation in this data
        // (verified at all SFs); composite keys would need struct support
        // in the oracle's arg_max, which DuckDB 1.0 lacks
        max_by(col("s_suppkey"), col("s_acctbal")).as("richest"),
        min_by(col("s_suppkey"), col("s_acctbal")).as("poorest"),
        count(lit(1)).as("n"))
      .orderBy("s_nationkey")

  /** Ordered string aggregation: deterministic csv of each nation's
    * supplier keys (collect_list is unordered — sort_array restores a
    * total order before joining). */
  private val qStringAgg: Q = (s, d) =>
    Tables.supplier(s, d)
      .groupBy(col("s_nationkey"))
      .agg(array_join(
        sort_array(collect_list(col("s_suppkey"))), ",").as("supp_csv"))
      .orderBy("s_nationkey")

  /** Deep multi-join (TPC-H Q5 shape): lineitem ⋈ orders ⋈ customer ⋈
    * nation ⋈ region with a selective date filter — the plan-quality
    * stressor for join ordering and runtime strategy selection. No hints
    * on purpose: nation/region are broadcast by size estimate, customer
    * vs the fact join is AQE's runtime call (broadcast at these SFs,
    * shuffle join on a real corpus), and the orderdate filter must reach
    * the orders scan as a pushed predicate so the join tree starts from
    * the filtered side. Revenue in exact decimal (price 2dp × (1-disc)
    * 2dp = 4dp, exact in decimal), cast to double at the end. */
  private val qMultiJoin: Q = (s, d) => {
    val rev = dec2(col("l_extendedprice")) *
      (lit(1).cast("decimal(18,2)") - dec2(col("l_discount")))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .filter(col("o_orderdate").cast("date") >= lit("1995-01-01").cast("date"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_items"), sum(rev).cast("double").as("revenue"))
      .orderBy("r_name", "n_name")
  }

  /** Exact statistical moments: variance derived from exact power sums
    * (Σx, Σx²) so the result is order-independent. Computed over the
    * small-integer quantity domain: both sums stay far below 2^53, so the
    * decimal→double casts and the final divisions are bit-exact in any
    * engine at any scale (a currency domain's Σx² exceeds double's exact
    * range and picks up ±1 ulp in the cast — measured at sf0.1). */
  private val qStatsMoments: Q = (s, d) => {
    val x = dec2(col("l_quantity"))
    Tables.lineitem(s, d)
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sum_x"),
        sum(x * x).cast("double").as("sum_x2"))
      .select(col("n"), col("sum_x"),
        ((col("sum_x2") - col("sum_x") * col("sum_x") / col("n")) /
          (col("n") - 1)).as("var_samp"))
  }

  /** Weekly cohort retention over the event stream — the
    * first-seen-week × activity-week-offset matrix product analytics
    * reads off every engagement dashboard. All time math is integer —
    * ts is int64 NANOS here (nanosAsLong), so epoch-week = ts div
    * 86400e9 div 7, which equals the oracle's epoch_us // 86400e6 // 7
    * under floor division — so the bucketing is engine-exact.
    * Plan: one distinct over (user, week) — the only pass over raw
    * events — then user-keyed min + join and a bounded (cohort, offset)
    * aggregation; cohort sizes ride a broadcast of the per-cohort
    * aggregate. Every stage after the distinct works on O(users) rows,
    * not O(events), which is what holds at 100 TB of clickstream. */
  private val qCohortRetention: Q = (s, d) => {
    val weeks = Tables.events(s, d)
      .select(col("user_id"),
        expr("(ts div 86400000000000) div 7").as("wk"))
      .distinct()
    val cohort = weeks.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    val sizes = cohort.groupBy("cohort_wk").agg(count(lit(1)).as("n_cohort"))
    weeks.join(cohort, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_wk")
      .select(col("cohort_wk"), col("week_offset"), col("n_active"),
        col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort"), 4)
          .as("retention"))
      .orderBy("cohort_wk", "week_offset")
  }

  val queries: Map[String, Q] = Map(
    "q_cohort_retention" -> qCohortRetention,
    "q_join_theta" -> qJoinTheta,
    "q_multi_join" -> qMultiJoin,
    "q_except_all" -> qExceptAll,
    "q_argmax" -> qArgmax,
    "q_string_agg" -> qStringAgg,
    "q_stats_moments" -> qStatsMoments,
    "q_time_bucket" -> qTimeBucket,
    "q_grouping_sets" -> qGroupingSets,
    "q_json_extract" -> qJsonExtract,
    "q_hash_sample" -> qHashSample,
    "q_asof_join" -> qAsofJoin,
    "q_pivot" -> qPivot,
    "q_percentile" -> qPercentile,
    "q_approx_percentile" -> qApproxPercentile,
    "q_rolling_agg" -> qRollingAgg,
    "q_rolling_range" -> qRollingRange,
    "q_salted_agg" -> qSaltedAgg,
    "q_topk_agg" -> qTopkAgg,
    "q_partition_scramble" -> qPartitionScramble,
    "q_agg_cube" -> qAggCube,
    "q_window_lag" -> qWindowLag,
    "q_repartition_count" -> (qRepartitionCount(_, _)),
    "q_groupby_partial_final" -> qGroupbyPartialFinal,
    "q_groupby_highcard" -> qGroupbyHighcard,
    "q_distinct" -> qDistinct,
    "q_sort_global" -> qSortGlobal,
    "q_sort_within_partitions" -> qSortWithinPartitions,
    "q_topk" -> qTopk,
    "q_roundrobin_slice" -> qRoundrobinSlice,
    "q_group_assignment" -> qGroupAssignment,
    "q_join_equi" -> qJoinEqui,
    "q_join_broadcast" -> qJoinBroadcast,
    "q_join_semi_anti" -> qJoinSemiAnti,
    "q_agg_rollup" -> qAggRollup,
    "q_union_except" -> qUnionExcept,
    "q_window_session" -> qWindowSession,
    "q_session_window" -> qSessionWindow,
    "q_window_funcs" -> qWindowFuncs,
    "q_hll_distinct" -> qHllDistinct,
    "q_throughput_topk" -> qThroughputTopk,
    "q_weighted_sample" -> qWeightedSample,
    "q_similarity_prefix" -> qSimilarityPrefix,
  )

  val oracles: Map[String, String] = Map(
    "q_cohort_retention" ->
      """WITH w AS (
        |  SELECT DISTINCT user_id,
        |         (epoch_us(ts) // 86400000000) // 7 AS wk
        |  FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_wk FROM w GROUP BY 1),
        |sz AS (SELECT cohort_wk, count(*) AS n_cohort FROM c GROUP BY 1),
        |a AS (
        |  SELECT c.cohort_wk, w.wk - c.cohort_wk AS week_offset,
        |         count(*) AS n_active
        |  FROM w JOIN c USING (user_id) GROUP BY 1, 2)
        |SELECT a.cohort_wk, a.week_offset, a.n_active, sz.n_cohort,
        |       round(CAST(a.n_active AS DOUBLE) / sz.n_cohort, 4) AS retention
        |FROM a JOIN sz USING (cohort_wk)
        |ORDER BY 1, 2""".stripMargin,
    "q_join_theta" ->
      """SELECT a.s_nationkey AS nk, count(*) AS n_ordered_pairs
        |FROM supplier a JOIN supplier b
        |  ON a.s_nationkey = b.s_nationkey AND a.s_acctbal < b.s_acctbal
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_multi_join" ->
      """SELECT r_name, n_name, count(*) AS n_items,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey  = o_orderkey
        |JOIN customer ON o_custkey   = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_except_all" ->
      """SELECT (SELECT count(*) FROM
        |          (SELECT l_suppkey AS k FROM lineitem EXCEPT ALL
        |           SELECT s_suppkey FROM supplier)) AS except_all_cnt,
        |       (SELECT count(*) FROM
        |          (SELECT l_suppkey AS k FROM lineitem INTERSECT ALL
        |           SELECT s_suppkey FROM supplier)) AS intersect_all_cnt""".stripMargin,
    "q_argmax" ->
      """SELECT s_nationkey,
        |       arg_max(s_suppkey, s_acctbal) AS richest,
        |       arg_min(s_suppkey, s_acctbal) AS poorest,
        |       count(*) AS n
        |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_string_agg" ->
      """SELECT s_nationkey,
        |       string_agg(CAST(s_suppkey AS VARCHAR), ',' ORDER BY s_suppkey) AS supp_csv
        |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stats_moments" ->
      """SELECT n, sum_x, (sum_x2 - sum_x * sum_x / n) / (n - 1) AS var_samp
        |FROM (SELECT count(*) AS n,
        |             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_x,
        |             CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) *
        |                      CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_x2
        |      FROM lineitem)""".stripMargin,
    "q_time_bucket" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY 1, 2""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |       CAST(min(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
        |       CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_hash_sample" ->
      """SELECT count(*) AS cnt, count(DISTINCT user_id) AS n_users,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events WHERE ((event_id % 1000000007) * 2654435761) % 1000000007 % 100 < 10""".stripMargin,
    "q_asof_join" ->
      """WITH u AS (
        |  SELECT o_custkey AS k, epoch_us(o_orderdate) AS t, 0 AS is_event,
        |         o_orderkey AS okey, CAST(NULL AS BIGINT) AS eid FROM orders
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts), 1, NULL, event_id FROM events)
        |SELECT k AS user_id, eid AS event_id,
        |       last_value(okey IGNORE NULLS) OVER (
        |         PARTITION BY k ORDER BY t, is_event, okey, eid
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_orderkey
        |FROM u QUALIFY is_event = 1 ORDER BY user_id, event_id""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |       count(*) FILTER (event_type = 'click') AS n_click,
        |       count(*) FILTER (event_type = 'view') AS n_view,
        |       count(*) FILTER (event_type = 'purchase') AS n_purchase,
        |       count(*) FILTER (event_type = 'signup') AS n_signup,
        |       count(*) FILTER (event_type = 'error') AS n_error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_percentile" ->
      """SELECT count(*) AS cnt,
        |       quantile_cont(l_quantity, 0.5) AS p50_qty,
        |       quantile_cont(l_quantity, 0.9) AS p90_qty
        |FROM lineitem""".stripMargin,
    // exact percentiles oracle-checked; the sketch-vs-exact gates are
    // asserted Spark-side (DuckDB cannot replay Spark's sketch), the
    // oracle pins them true — same contract as q_hll_distinct
    "q_approx_percentile" ->
      """SELECT quantile_cont(l_quantity, 0.5) AS p50,
        |       quantile_cont(l_quantity, 0.9) AS p90,
        |       true AS approx_ok_50, true AS approx_ok_90
        |FROM lineitem""".stripMargin,
    "q_rolling_agg" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ep,
        |                  CAST(value AS DECIMAL(18,6)) AS v FROM events)
        |SELECT user_id, event_id,
        |       CAST(sum(v) OVER w AS DOUBLE) AS roll_sum,
        |       CAST(count(*) OVER w AS BIGINT) AS roll_n
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_rolling_range" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ep,
        |                  CAST(value AS DECIMAL(18,6)) AS v FROM events)
        |SELECT user_id, event_id,
        |       CAST(sum(v) OVER w AS DOUBLE) AS range_sum,
        |       CAST(count(*) OVER w AS BIGINT) AS range_n
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ep
        |             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_topk_agg" ->
      """SELECT event_type, rk, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |         CAST(row_number() OVER (
        |           PARTITION BY event_type
        |           ORDER BY value DESC, event_id) AS INT) AS rk
        |  FROM events)
        |WHERE rk <= 3 ORDER BY event_type, rk""".stripMargin,
    "q_salted_agg" ->
      """SELECT l_returnflag,
        |       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_partition_scramble" ->
      """SELECT count(*) AS n_parts,
        |       count(DISTINCT scramble_rank) AS n_positions,
        |       (min(scramble_rank) = 1 AND max(scramble_rank) = count(*)) AS is_bijection
        |FROM (SELECT CAST(row_number() OVER (
        |        ORDER BY ((range % 1000000007) * 2654435761) % 1000000007, range) AS INT) AS scramble_rank
        |      FROM range(1024))""".stripMargin,
    "q_agg_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY 1, 2""".stripMargin,
    "q_window_lag" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS ep FROM events)
        |SELECT user_id, event_id,
        |       value - lag(value) OVER w AS delta,
        |       lead(event_id) OVER w AS next_event
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_repartition_count" ->
      """SELECT count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem""".stripMargin,
    "q_groupby_partial_final" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       min(l_extendedprice) AS min_price,
        |       max(l_extendedprice) AS max_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_groupby_highcard" ->
      """SELECT l_orderkey, count(*) AS cnt,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber
        |FROM lineitem ORDER BY 1, 2, 3""".stripMargin,
    "q_sort_global" ->
      """SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem ORDER BY 3, 1, 2""".stripMargin,
    "q_sort_within_partitions" ->
      """SELECT CAST(0 AS BIGINT) AS violations, count(*) AS rows_total
        |FROM lineitem""".stripMargin,
    "q_topk" ->
      """SELECT s_nationkey, s_suppkey, revenue, rk FROM (
        |  SELECT s_nationkey, s_suppkey, revenue,
        |         CAST(row_number() OVER (PARTITION BY s_nationkey
        |                            ORDER BY revenue DESC, s_suppkey) AS INT) AS rk
        |  FROM (
        |    SELECT s_nationkey, s_suppkey,
        |           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |    GROUP BY 1, 2))
        |WHERE rk <= 3 ORDER BY s_nationkey, rk""".stripMargin,
    "q_roundrobin_slice" ->
      """SELECT s_suppkey, s_name, rn FROM (
        |  SELECT s_suppkey, s_name,
        |         CAST(row_number() OVER (ORDER BY s_suppkey) AS INT) AS rn FROM supplier)
        |WHERE (rn - 1) % 3 = 1 ORDER BY rn""".stripMargin,
    "q_group_assignment" ->
      """SELECT CAST(range % 3 AS INT) AS group_id, count(*) AS cnt
        |FROM range(4000) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_join_equi" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_join_broadcast" ->
      """SELECT p_brand, count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_join_semi_anti" ->
      """SELECT 'anti' AS kind, count(*) AS cnt FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'semi' AS kind, count(*) AS cnt FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY kind""".stripMargin,
    "q_agg_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY 1, 2""".stripMargin,
    "q_union_except" ->
      """WITH live AS (SELECT DISTINCT c_nationkey AS nkey FROM customer),
        |     conf AS (SELECT DISTINCT s_nationkey AS nkey FROM supplier)
        |SELECT 'except' AS op, nkey FROM (SELECT nkey FROM live EXCEPT SELECT nkey FROM conf)
        |UNION ALL
        |SELECT 'intersect' AS op, nkey FROM (SELECT nkey FROM live INTERSECT SELECT nkey FROM conf)
        |UNION ALL
        |SELECT 'union' AS op, nkey FROM (SELECT nkey FROM live UNION SELECT nkey FROM conf)
        |ORDER BY op, nkey""".stripMargin,
    "q_window_session" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ep FROM events),
        |     g AS (SELECT user_id,
        |                  CASE WHEN ep - lag(ep) OVER w IS NULL
        |                         OR ep - lag(ep) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
        |           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id))
        |SELECT user_id, CAST(sum(ns) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_session_window" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ep FROM events),
        |     g AS (SELECT user_id, ep, event_id,
        |                  CASE WHEN ep - lag(ep) OVER w IS NULL
        |                         OR ep - lag(ep) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
        |           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)),
        |     sess AS (SELECT user_id, ep,
        |                     sum(ns) OVER (PARTITION BY user_id ORDER BY ep, event_id
        |                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |              FROM g)
        |SELECT user_id, min(ep) AS sess_start, count(*) AS n_events
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start""".stripMargin,
    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spend,
        |       CAST(row_number() OVER (PARTITION BY o_custkey
        |                               ORDER BY o_orderdate, o_orderkey) AS INT) AS order_idx
        |FROM orders ORDER BY o_custkey, order_idx""".stripMargin,
    "q_hll_distinct" ->
      """SELECT count(DISTINCT user_id) AS exact_users, true AS approx_ok
        |FROM events""".stripMargin,
    "q_throughput_topk" ->
      """SELECT worker_id, throughput, rk FROM (
        |  SELECT worker_id, throughput,
        |         CAST(row_number() OVER (ORDER BY throughput DESC, worker_id) AS INT) AS rk
        |  FROM (
        |    SELECT 'w' || CAST(user_id % 32 AS VARCHAR) AS worker_id,
        |           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS throughput
        |    FROM events GROUP BY 1))
        |WHERE rk <= 3 ORDER BY rk""".stripMargin,
    "q_weighted_sample" ->
      """SELECT s_suppkey, s_name, rk FROM (
        |  SELECT s_suppkey, s_name,
        |         CAST(row_number() OVER (ORDER BY skey DESC, s_suppkey) AS INT) AS rk
        |  FROM (
        |    SELECT s_suppkey, s_name,
        |           pow(CAST(((s_suppkey % 1000000007) * 2654435761) % 1000000007 + 1 AS DOUBLE) / 1000000008.0,
        |               1.0 / (abs(s_acctbal) + 1.0)) AS skey
        |    FROM supplier))
        |WHERE rk <= 3 ORDER BY rk""".stripMargin,
    "q_similarity_prefix" ->
      """SELECT substring(p_type, 1, 8) AS prefix, count(*) AS cnt,
        |       count(DISTINCT p_type) AS n_types
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
