package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{GraphAnalyticsOps, GraphOps}

/** PageRank against an independent driver-side replay of the same
  * schedule; triangle stats against hand-countable graphs (the degree
  * orientation must count each triangle exactly once, hub or not). */
class GraphAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  test("pageRank matches a driver-side replay incl. dangling mass") {
    import spark.implicits._
    // 1 -> 2, 1 -> 3 (2x), 2 -> 3; 3 is DANGLING (no out-edges)
    val edges = Seq((1L, 2L, 1.0), (1L, 3L, 2.0), (2L, 3L, 1.0))
    val got = GraphOps.pageRank(spark, edges.toDF("src", "dst", "w"),
        iters = 8, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // independent replay: dense driver arithmetic over the same rounds
    val nodes = Seq(1L, 2L, 3L)
    val n = nodes.size.toDouble
    val outW = Map(1L -> 3.0, 2L -> 1.0)
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 8) {
      val dm = nodes.filterNot(outW.contains).map(r).sum
      val in = Map(
        2L -> r(1L) * (1.0 / 3.0),
        3L -> (r(1L) * (2.0 / 3.0) + r(2L) * 1.0))
      r = nodes.map(v =>
        v -> ((1.0 - 0.85) / n + 0.85 * (in.getOrElse(v, 0.0) + dm / n))).toMap
    }
    nodes.foreach(v => assert(math.abs(got(v) - r(v)) < 1e-9, s"vertex $v"))
    assert(math.abs(got.values.sum - 1.0) < 1e-9) // mass conserved
    spark.catalog.clearCache()
  }

  test("pageRank matches the driver replay on randomized weighted digraphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 5 + rnd.nextInt(8)
      val edges = (for {
        u <- 0L until n.toLong
        v <- 0L until n.toLong
        if u != v && rnd.nextDouble() < 0.3
      } yield (u, v, (1 + rnd.nextInt(3)).toDouble)).toSeq
      if (edges.nonEmpty) {
        val got = GraphOps.pageRank(spark, edges.toDF("src", "dst", "w"),
            iters = 6, damping = 0.85)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
        val nn = nodes.size.toDouble
        val outW = edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._3).sum }
        var r = nodes.map(_ -> 1.0 / nn).toMap
        for (_ <- 1 to 6) {
          val dm = nodes.filterNot(outW.contains).map(r).sum
          val in = edges.groupBy(_._2).map { case (v, es) =>
            v -> es.map(e => r(e._1) * e._3 / outW(e._1)).sum }
          r = nodes.map(v =>
            v -> ((1.0 - 0.85) / nn + 0.85 * (in.getOrElse(v, 0.0) + dm / nn))).toMap
        }
        nodes.foreach(v => assert(math.abs(got(v) - r(v)) < 1e-9,
          s"vertex $v of graph with ${edges.length} edges"))
        assert(math.abs(got.values.sum - 1.0) < 1e-9)
      }
    }
    spark.catalog.clearCache()
  }

  test("triangleStats counts K4, a hub star, and a mixed graph exactly") {
    import spark.implicits._
    def stats(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
      val r = GraphAnalyticsOps.triangleStats(edges.toDF("u", "v")).collect()(0)
      spark.catalog.clearCache()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // K4: 4 triangles, 6 edges, wedges = 4 * C(3,2) = 12
    assert(stats(Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L)))
      === ((4L, 6L, 12L, 4L)))
    // star: hub 0 with 5 leaves — 0 triangles, wedges = C(5,2) = 10
    assert(stats(Seq((0L,1L),(0L,2L),(0L,3L),(0L,4L),(0L,5L)))
      === ((6L, 5L, 10L, 0L)))
    // hub + one closing edge: exactly 1 triangle regardless of hub degree
    assert(stats(Seq((0L,1L),(0L,2L),(0L,3L),(0L,4L),(0L,5L),(1L,2L)))._4 === 1L)
  }

  test("triangleStats forced-shuffle path (broadcast gate closed) is result-identical") {
    import spark.implicits._
    // entry limit 0 drops the broadcast hint: the adjacency attaches must
    // go through the planner's shuffle joins and still count exactly
    def stats(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
      val r = GraphAnalyticsOps.triangleStats(edges.toDF("u", "v"),
        broadcastEntryLimit = 0L).collect()(0)
      spark.catalog.clearCache()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    assert(stats(Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L)))
      === ((4L, 6L, 12L, 4L)))
    assert(stats(Seq((0L,1L),(0L,2L),(0L,3L),(0L,4L),(0L,5L)))
      === ((6L, 5L, 10L, 0L)))
    assert(stats(Seq((0L,1L),(0L,2L),(0L,3L),(0L,4L),(0L,5L),(1L,2L)))._4 === 1L)
  }

  test("cooccurEdges caps a planted mega-order and flags the truncation") {
    import spark.implicits._
    // order 1: 20 distinct items (mega); order 2: a receipt-sized 3
    val items = ((1 to 20).map(i => (1L, i.toLong)) ++
      Seq((2L, 100L), (2L, 101L), (2L, 102L), (2L, 100L))).toDF("o", "pk")
    val capped = GraphAnalyticsOps.cooccurEdgesFrom(items, cap = 8)
    // mega-order contributes C(8,2)=28 pairs among its 8 LOWEST pks;
    // order 2 contributes C(3,2)=3 — dupes collapsed by the distinct set
    assert(capped.count() === 31L)
    val maxPk = capped.agg(max(greatest(col("u"), col("v")))).collect()(0).getLong(0)
    assert(maxPk === 102L) // order 2 intact
    assert(capped.filter(col("u") <= 20 && col("v") > 8).count() === 0L)
    assert(GraphAnalyticsOps.cooccurTruncatedOrders(items, cap = 8) === 1L)
    // default cap is inert on the same input
    assert(GraphAnalyticsOps.cooccurEdgesFrom(items).count() === (190L + 3L))
    assert(GraphAnalyticsOps.cooccurTruncatedOrders(items) === 0L)
    spark.catalog.clearCache()
  }

  test("transition probabilities row-normalize to 1 per prev type") {
    val out = GraphAnalyticsOps.queries("q_event_transitions")(spark, TestSpark.sf0001)
    val sums = out.groupBy("prev_type").agg(sum("p").as("sp"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sums.nonEmpty)
    sums.values.foreach(v => assert(math.abs(v - 1.0) < 1e-4))
    spark.catalog.clearCache()
  }

  test("wedge candidates bound triangles and the q_part_rank masses sum to 1") {
    val sf = TestSpark.sf0001
    val wedges = GraphAnalyticsOps.wedgeCandidates(spark, sf)
    val tri = GraphAnalyticsOps.queries("q_triangle_count")(spark, sf)
      .collect()(0).getLong(3)
    assert(wedges >= tri) // every triangle closes exactly one oriented wedge
    val ranks = GraphAnalyticsOps.queries("q_part_rank")(spark, sf)
      .collect().map(_.getDouble(1))
    assert(ranks.nonEmpty)
    assert(math.abs(ranks.sum - 1.0) < 1e-3)
    spark.catalog.clearCache()
  }

  test("q_pagerank ranks sum to 1 over the event-type graph") {
    val out = GraphAnalyticsOps.queries("q_pagerank")(spark, TestSpark.sf0001)
    val rows = out.collect()
    assert(rows.length >= 2)
    assert(math.abs(rows.map(_.getDouble(1)).sum - 1.0) < 1e-4)
    spark.catalog.clearCache()
  }
}
