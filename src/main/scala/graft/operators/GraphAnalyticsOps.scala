package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Graph analytics over relationally-derived graphs — the process-mining
  * and co-occurrence shapes a telemetry + catalog corpus supports:
  *
  *  - `q_event_transitions`: the per-user ordered event stream collapsed
  *    to the Markov transition matrix (edge counts + row-normalized
  *    probabilities) — the "what happens after X" primitive.
  *  - `q_pagerank`: damped PageRank over that weighted transition graph
  *    ([[GraphOps.pageRank]], fixed 8 iterations) — steady-state
  *    attention per event type.
  *  - `q_triangle_count`: exact triangle count + global clustering
  *    coefficient of the part co-occurrence graph (parts sharing an
  *    order), via degree-ordered edge orientation.
  *
  * Scale shapes (100 TB):
  *  - Transitions: ONE exchange keys events by user; the lag window is
  *    partition-local, and the output is vocabulary² (event types), so
  *    the reduce side is tiny regardless of corpus size. A mega-user
  *    serializes only its own lag window (the q_flow_control note).
  *  - PageRank: the graph build is the transition aggregation above; the
  *    iteration cost is per-round one shuffle join on the AGGREGATED
  *    graph (vocabulary-sized here; [[GraphOps.pageRank]] itself scales
  *    to billion-edge graphs — per-round cost is O(edges) shuffled by
  *    vertex with map-side combine, hot-dst-absorbing).
  *  - Triangles: the classic quadratic hazard is a hub part appearing in
  *    everything; degree-ORDERED orientation turns the undirected graph
  *    into a DAG where every vertex's out-degree is O(sqrt(edges))
  *    [Chiba–Nishizeki bound], capping the enumeration space at
  *    sum C(out_deg, 2) = O(edges^1.5) worst-case instead of the hub's
  *    C(deg, 2). The shipped implementation is the edge-iterator inside
  *    that bound: size-GATED broadcast of the out-adjacency arrays
  *    (shuffle-join fallback above the entry budget), one codegen'd
  *    intersection per oriented edge, no wedge stream ever materialized
  *    (see [[triangleStats]]). The per-order pair explode is capped at
  *    [[CooccurItemCap]] items per order (truncation-flagged), so a
  *    mega-order cannot go quadratic; at receipt-sized orders the cap
  *    never engages.
  */
object GraphAnalyticsOps {
  private type Q = (SparkSession, String) => DataFrame

  private val Iters = 8
  private val Damping = 0.85

  /** (prev, nxt, n) transition counts from the per-user event stream,
    * ordered by (µs timestamp, event_id) — µs so Spark and the oracle
    * rank ties identically whatever the fixture's parquet unit (the
    * q_event_funnel discipline). Memoized: q_event_transitions and
    * q_pagerank both consume it. */
  private def transitions(s: SparkSession, d: String): DataFrame =
    graft.SharedPlans.shared(s, s"evt_transitions|$d") {
      val w = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts div 1000").as("t"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type").as("nxt"))
        .agg(count(lit(1)).as("n"))
    }

  private val qEventTransitions: Q = (s, d) => {
    transitions(s, d)
      .select(col("prev").as("prev_type"), col("nxt").as("next_type"), col("n"),
        round(col("n") / sum(col("n")).over(Window.partitionBy("prev")), 6).as("p"))
      .orderBy("prev_type", "next_type")
  }

  private val qPageRank: Q = (s, d) => {
    val ranks = GraphOps.pageRank(s,
      transitions(s, d).select(col("prev"), col("nxt"), col("n")),
      iters = Iters, damping = Damping)
    ranks.select(col("v").as("event_type"), round(col("r"), 6).as("rank"))
      .orderBy("event_type")
  }

  /** The weighted co-occurrence edge table (u < v, w = shared orders) —
    * memoized because q_triangle_count (distinct edges = the keys) and
    * q_part_rank (weights) both consume it, and it is the SMALL stable
    * artifact (|E| rows) rather than the per-order pair stream (~4× more
    * rows at this fixture's order size).
    *
    * Build shape: ONE exchange keys lineitem by order — the dense_rank
    * cap window, the collect_set, and the groupBy(o) all share that
    * partitioning; pairs are then a map-side array expression over the
    * sorted distinct item set (collect_set + sort_array, so u < v by
    * construction — no self-join, which would shuffle the lineitem table
    * twice and re-match per order) followed by the groupBy(u, v) count.
    * Per-order work is C(min(items, [[CooccurItemCap]]), 2): the cap is
    * applied by dense_rank BEFORE the set is collected (the
    * q_session_paths first-8 discipline), so a pathological mega-order
    * contributes at most cap rows to the aggregate and C(cap, 2) pairs —
    * never a jumbo array, never a quadratic explode. Receipt-sized
    * orders (TPC-H max 7 items) never hit it, so the capped plan is
    * bit-identical to the uncapped oracle at every fixture SF;
    * [[cooccurTruncatedOrders]] is the probe that proves when it bites. */
  private def cooccurEdges(s: SparkSession, d: String): DataFrame =
    graft.SharedPlans.shared(s, s"cooccur_edges|$d") {
      cooccurEdgesFrom(Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("pk")))
    }

  /** Per-order distinct-item cap before the pair expansion. 256 caps a
    * mega-order at C(256,2) ≈ 33k pairs — bounded map-side work — while
    * sitting ~40× above any receipt-shaped order. */
  private[graft] val CooccurItemCap = 256

  /** Weighted co-occurrence edges from an (o, pk) item table, the
    * per-order item set capped at `cap` by dense_rank (ties in the pk
    * order are impossible: ranks ARE the distinct pks), truncation
    * observable via [[cooccurTruncatedOrders]]. */
  private[graft] def cooccurEdgesFrom(items: DataFrame,
      cap: Int = CooccurItemCap): DataFrame = {
    val w = Window.partitionBy("o").orderBy("pk")
    items
      .withColumn("dr", dense_rank().over(w))
      .filter(col("dr") <= cap)
      .groupBy("o").agg(sort_array(collect_set(col("pk"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)),
          |    y -> struct(x AS u, y AS v))))""".stripMargin)).as("p"))
      .groupBy(col("p.u").as("u"), col("p.v").as("v"))
      .agg(count(lit(1)).as("w"))
  }

  /** Number of orders whose distinct item set was truncated by `cap` —
    * the honesty flag for the capped edge build (spec + instrument). */
  private[graft] def cooccurTruncatedOrders(items: DataFrame,
      cap: Int = CooccurItemCap): Long =
    items.groupBy("o").agg(countDistinct(col("pk")).as("nd"))
      .filter(col("nd") > cap).count()

  private val PartRankIters = 5

  /** PageRank over the weighted part co-occurrence graph (weight = shared
    * orders, symmetrized) — the catalog-importance rank, and the
    * DISTRIBUTED exercise of [[GraphOps.pageRank]]: thousands of vertices
    * and ~10⁵–10⁶ edges per round through the vertex-keyed shuffle join,
    * vs q_pagerank's vocabulary-sized graph. */
  private val qPartRank: Q = (s, d) => {
    val w = cooccurEdges(s, d)
    val edges = w.select(col("u").as("src"), col("v").as("dst"), col("w"))
      .unionByName(w.select(col("v").as("src"), col("u").as("dst"), col("w")))
    GraphOps.pageRank(s, edges, iters = PartRankIters, damping = Damping)
      .select(col("v").as("p_partkey"), round(col("r"), 8).as("rank"))
      .orderBy("p_partkey")
  }

  /** Degree-ordered orientation of an undirected distinct (u, v) edge
    * list: each edge directed low→high in the (deg, id) total order, the
    * head's degree carried so downstream can rank heads in the same
    * order. Returns (a, b, db) with the degree frame alongside; both are
    * PERSISTED and the caller owns the release. */
  private[graft] def orientEdges(edges: DataFrame): (DataFrame, DataFrame) = {
    val Seq(uC, vC) = edges.columns.toSeq.take(2)
    val e = edges.select(col(uC).as("u"), col(vC).as("v"))
    val deg = graft.Caching.persist(
      e.select(col("u").as("t")).unionByName(e.select(col("v").as("t")))
        .groupBy("t").agg(count(lit(1)).as("deg")))
    val ed = e
      .join(deg.select(col("t").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("t").as("v"), col("deg").as("dv")), "v")
    val lt = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val o = graft.Caching.persist(ed.select(
      when(lt, col("u")).otherwise(col("v")).as("a"),
      when(lt, col("v")).otherwise(col("u")).as("b"),
      when(lt, col("dv")).otherwise(col("du")).as("db")))
    (o, deg)
  }

  /** Candidate count of the wedge join — Σ C(out_deg, 2) over the
    * oriented graph, i.e. the rows the triangle join enumerates. The
    * scaling instrument's probe: must grow ~linearly for a constant-
    * degree co-occurrence graph, and is O(edges^1.5) worst-case by the
    * orientation bound regardless of hubs. */
  private[graft] def wedgeCandidates(s: SparkSession, d: String): Long = {
    val (o, deg) = orientEdges(cooccurEdges(s, d).select(col("u"), col("v")))
    try o.groupBy("a").agg(count(lit(1)).as("od"))
      .agg(coalesce(sum(expr("od * (od - 1) div 2")), lit(0L)))
      .collect()(0).getLong(0)
    finally { o.unpersist(); deg.unpersist() }
  }

  /** Broadcast budget for the triangle adjacency table, in ENTRIES
    * (vertices + edges — the table is V array rows whose sizes sum to E).
    * At ~16 bytes/entry the default keeps the payload ~128 MB, well under
    * Spark's 8 GB broadcast hard limit with headroom for task overhead. */
  private[graft] val TriangleBroadcastEntryLimit = 8L * 1000 * 1000

  /** Exact (n_vertices, n_edges, n_wedges, n_triangles, clustering) for an
    * undirected DISTINCT edge list with two columns read as (u, v), u ≠ v,
    * one row per unordered pair. `broadcastEntryLimit` gates the adjacency
    * broadcast (specs force the shuffle path with 0). */
  private[graft] def triangleStats(edges: DataFrame,
      broadcastEntryLimit: Long = TriangleBroadcastEntryLimit): DataFrame = {
    val Seq(uC, vC) = edges.columns.toSeq.take(2)
    val e = graft.Caching.persist(
      edges.select(col(uC).as("u"), col(vC).as("v")))
    val (o, deg) = orientEdges(e)
    // EDGE-ITERATOR formulation: triangles = Σ over oriented edges (a,b)
    // of |N⁺(a) ∩ N⁺(b)|. Orientation makes the count exact-once: the
    // triangle p≺q≺r is seen only at its base edge (p,q) — r sits in
    // both out-sets there, while at (p,r) and (q,r) the third vertex
    // precedes r and cannot be in N⁺(r). Against the wedge-join
    // alternative (enumerate Σ C(out_deg,2) wedge ROWS, then close),
    // this never materializes the wedge stream at all: the out-adjacency
    // table is V rows (arrays, Σ sizes = E), broadcast to both sides of
    // the edge scan WHEN IT FITS, and the intersections run inside one
    // codegen'd projection — work Σ(d⁺(a)+d⁺(b)) hash ops, zero wide
    // intermediate (20.3s → ~2s at sf0.1). The broadcast hint is GATED
    // on the collected (V, E) counts — both cheap aggregates over the
    // already-persisted deg/e frames (the qNgramJaccard gate pattern):
    // above the entry budget the hint is dropped and the two adjacency
    // attaches fall through to the planner as co-partitioned shuffle
    // joins on a and b — E rows shuffled twice, still no wedge
    // materialization; the orientation bound (out-deg = O(√E)) caps
    // per-row array size either way, so a billion-edge graph never
    // forces gigabytes through the driver.
    val nV = deg.count()
    val nE = e.count()
    val adjHint: DataFrame => DataFrame =
      if (nV + nE <= broadcastEntryLimit) df => broadcast(df) else identity
    // persisted (r17 optimization round, guide §5): the out-adjacency
    // table feeds BOTH sides of the triangle join, and each broadcast
    // BUILD otherwise re-runs the full collect_list aggregation over the
    // oriented edge cache (measured: the second pass was ~10% of the
    // query). V rows whose array sizes sum to E — exactly the size the
    // broadcast gate already budgets. Released with the caller's other
    // frames via clearCache.
    val adj = graft.Caching.persist(
      o.groupBy(col("a")).agg(collect_list(col("b")).as("nb")))
    val tri = o
      .join(adjHint(adj.select(col("a"), col("nb").as("na"))), Seq("a"))
      .join(adjHint(adj.select(col("a").as("b"), col("nb").as("nbb"))),
        Seq("b"), "left")
      .select(when(col("nbb").isNull, lit(0))
        .otherwise(size(array_intersect(col("na"), col("nbb")))).as("c"))
      .agg(sum(col("c")).as("n_triangles"))
    val stats = deg.agg(count(lit(1)).as("n_vertices"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    val ne = e.agg(count(lit(1)).as("n_edges"))
    stats.crossJoin(broadcast(ne)).crossJoin(broadcast(tri))
      .select(col("n_vertices"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)
          .as("clustering"))
  }

  private val qTriangleCount: Q = (s, d) =>
    triangleStats(cooccurEdges(s, d).select(col("u"), col("v")))

  val queries: Map[String, Q] = Map(
    "q_event_transitions" -> qEventTransitions,
    "q_pagerank" -> qPageRank,
    "q_part_rank" -> qPartRank,
    "q_triangle_count" -> qTriangleCount,
  )

  /** The PageRank oracles replay the exact iteration schedule as chained
    * CTEs (standard SQL cannot aggregate over a recursive reference, so
    * the k rounds are unrolled — the q_bpe_train discipline). Numeric
    * literals are CAST to DOUBLE before entering the arithmetic: bare
    * SQL literals evaluate in DuckDB DECIMAL arithmetic, which differs
    * from Spark's doubles by ~1 ulp pre-rounding (e.g. DECIMAL
    * 1 - 0.85 = 0.15 exactly vs double 0.15000000000000002); the cast
    * makes both engines derive the same doubles, so parity does not
    * lean on round(6/8) absorbing the representation gap.
    *
    * `graphCtes` must define `tr(src, dst, w DOUBLE)`; `finalSelect`
    * reads the converged `r{iters}(v, r)`. */
  private def pagerankOracle(
      graphCtes: String, iters: Int, damping: Double, finalSelect: String): String = {
    val sb = new StringBuilder
    sb.append(graphCtes)
    sb.append(
      """,
        |nodes AS MATERIALIZED (SELECT DISTINCT src AS v FROM tr UNION SELECT DISTINCT dst FROM tr),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |ow AS MATERIALIZED (SELECT src, sum(w) AS wout FROM tr GROUP BY 1),
        |p AS MATERIALIZED (SELECT tr.src, tr.dst, tr.w / ow.wout AS p
        |      FROM tr JOIN ow ON tr.src = ow.src),
        |r0 AS MATERIALIZED (SELECT v, 1.0 / (SELECT n FROM nn) AS r FROM nodes)""".stripMargin)
    // c_k is referenced twice (total mass + per-vertex attach) and each
    // r_k feeds the next round: without MATERIALIZED, DuckDB 1.0 inlines
    // every reference, re-expanding the whole chain per round — the same
    // plan blowup the Spark side bounds with its checkpoint dial, here
    // cut with the CTE hint
    // DANGLING MASS follows GraphOps.pageRank's active form (the r17 A/B
    // dial): the direct dangling-rank sum over r_{k-1}, or conservation
    // (dm = 1 − Σ contributions). The oracle must use the SAME formula
    // as the engine or their doubles drift by the fp difference between
    // the two summation shapes.
    val direct = GraphOps.PageRankDanglingFromRanks
    for (k <- 1 to iters) {
      val tk = if (direct)
        s"""t$k AS (SELECT coalesce(sum(r), 0) AS dm FROM r${k - 1}
           |       WHERE v NOT IN (SELECT src FROM ow)),""".stripMargin
      else
        s"t$k AS (SELECT coalesce(sum(m), 0) AS tm FROM c$k),"
      val dmExpr = if (direct) s"(SELECT dm FROM t$k)"
      else s"(CAST(1 AS DOUBLE) - (SELECT tm FROM t$k))"
      sb.append(s""",
        |c$k AS MATERIALIZED (SELECT p.dst AS v, sum(r${k - 1}.r * p.p) AS m
        |       FROM p JOIN r${k - 1} ON p.src = r${k - 1}.v GROUP BY 1),
        |$tk
        |r$k AS MATERIALIZED (SELECT nodes.v,
        |         (CAST(1 AS DOUBLE) - CAST($damping AS DOUBLE)) / (SELECT n FROM nn)
        |         + CAST($damping AS DOUBLE) * (coalesce(c$k.m, 0) + $dmExpr / (SELECT n FROM nn)) AS r
        |       FROM nodes LEFT JOIN c$k ON nodes.v = c$k.v)""".stripMargin)
    }
    sb.append(s"""
      |$finalSelect""".stripMargin)
    sb.toString
  }

  val oracles: Map[String, String] = Map(
    "q_event_transitions" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events),
        |lagd AS (SELECT event_type AS nxt,
        |                lag(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev
        |         FROM ev),
        |tr AS (SELECT prev, nxt, count(*) AS n
        |       FROM lagd WHERE prev IS NOT NULL GROUP BY 1, 2)
        |SELECT prev AS prev_type, nxt AS next_type, n,
        |       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev), 6) AS p
        |FROM tr ORDER BY prev_type, next_type""".stripMargin,
    "q_pagerank" -> pagerankOracle(
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events),
        |lagd AS (SELECT event_type AS nxt,
        |                lag(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev
        |         FROM ev),
        |tr AS MATERIALIZED (SELECT prev AS src, nxt AS dst, CAST(count(*) AS DOUBLE) AS w
        |       FROM lagd WHERE prev IS NOT NULL GROUP BY 1, 2)""".stripMargin,
      Iters, Damping,
      s"SELECT v AS event_type, round(r, 6) AS rank FROM r$Iters ORDER BY event_type"),
    "q_part_rank" -> pagerankOracle(
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS pk FROM lineitem),
        |pairs AS MATERIALIZED (SELECT x.pk AS u, y.pk AS v, CAST(count(*) AS DOUBLE) AS w
        |          FROM li x JOIN li y ON x.o = y.o AND x.pk < y.pk GROUP BY 1, 2),
        |tr AS MATERIALIZED (SELECT u AS src, v AS dst, w FROM pairs
        |       UNION ALL SELECT v, u, w FROM pairs)""".stripMargin,
      PartRankIters, Damping,
      s"SELECT v AS p_partkey, round(r, 8) AS rank FROM r$PartRankIters ORDER BY p_partkey"),
    // li/e/deg/o all MATERIALIZED: `o` is referenced three times by the
    // triangle join — inlined, each reference would re-run the whole
    // lineitem self-join chain (DuckDB 1.0 inlines CTEs by default)
    "q_triangle_count" ->
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS pk FROM lineitem),
        |e AS MATERIALIZED (SELECT DISTINCT x.pk AS u, y.pk AS v
        |      FROM li x JOIN li y ON x.o = y.o AND x.pk < y.pk),
        |deg AS MATERIALIZED (SELECT t, count(*) AS deg
        |        FROM (SELECT u AS t FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
        |ed AS (SELECT e.u, e.v, du.deg AS du, dv.deg AS dv
        |       FROM e JOIN deg du ON e.u = du.t JOIN deg dv ON e.v = dv.t),
        |o AS MATERIALIZED (SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS a,
        |             CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS b,
        |             CASE WHEN du < dv OR (du = dv AND u < v) THEN dv ELSE du END AS db
        |      FROM ed),
        |tri AS (SELECT count(*) AS t FROM o e1
        |        JOIN o e2 ON e1.a = e2.a
        |                 AND (e1.db < e2.db OR (e1.db = e2.db AND e1.b < e2.b))
        |        JOIN o e3 ON e3.a = e1.b AND e3.b = e2.b),
        |stats AS (SELECT count(*) AS nv, CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS w FROM deg),
        |ne AS (SELECT count(*) AS n FROM e)
        |SELECT stats.nv AS n_vertices, ne.n AS n_edges, stats.w AS n_wedges,
        |       tri.t AS n_triangles,
        |       round(CAST(3.0 AS DOUBLE) * tri.t / stats.w, 6) AS clustering
        |FROM stats, ne, tri""".stripMargin,
  )
}
