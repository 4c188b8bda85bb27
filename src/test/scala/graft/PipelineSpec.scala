package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants of the pipeline-shaping family that the hash-vs-oracle gate
  * doesn't express directly. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("q_dedup_cluster: members+reps cover exactly the pair graph, reps are minima") {
    val pairs = operators.DedupOps.nearDupPairs(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = SparkEntry.queries("q_dedup_cluster")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every vertex of the pair graph is in exactly one cluster
    val verts = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(clusters.map(_._2).sum == verts.size)
    // each rep is a member of its own cluster (label minimum): id_span is
    // the sum of (member - rep), so 0 <= id_span and cluster_size >= 2
    assert(clusters.forall { case (_, size, span) => size >= 2 && span > 0 })
    // transitivity: union-find over the pairs gives identical cluster count
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val want = verts.groupBy(find).map { case (_, vs) => (vs.min, vs.size) }.toSet
    assert(clusters.map(c => (c._1, c._2.toInt)).toSet == want)
  }

  test("q_stratified_sample: kept counts follow the per-lang hash rule exactly") {
    val out = SparkEntry.queries("q_stratified_sample")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    for ((lang, (nDocs, nKept)) <- out) {
      val ds = docs.filter(_._2 == lang)
      val rate = if (lang == "en") 5 else 20
      val kept = ds.count { case (id, _) =>
        ((id % 1000000007L) * 2654435761L) % 1000000007L % 100 < rate }
      assert(ds.size.toLong == nDocs && kept.toLong == nKept, lang)
    }
  }

  test("q_group_sample: exactly 3 per language, stable under re-run") {
    val a = SparkEntry.queries("q_group_sample")(spark, sf).collect()
    val b = SparkEntry.queries("q_group_sample")(spark, sf).collect()
    assert(a.sameElements(b))
    assert(a.groupBy(_.getString(0)).forall(_._2.length == 3))
  }

  test("q_quality_filter: reason bitmask partitions all docs") {
    val total = Tables.documents(spark, sf).count()
    val out = SparkEntry.queries("q_quality_filter")(spark, sf).collect()
    assert(out.map(_.getLong(2)).sum == total)
    assert(out.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= 7))
  }

  test("q_scd_merge: islands are maximal and intervals tile each user's timeline") {
    val hist = SparkEntry.queries("q_scd_merge")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5)))
      .groupBy(_._1)
    val nEvents = Tables.events(spark, sf).count()
    assert(hist.values.flatten.map(_._6).sum == nEvents)
    for ((_, rows) <- hist) {
      val ordered = rows.sortBy(_._2)
      // versions are 1..n dense
      assert(ordered.map(_._2).toSeq == (1 to ordered.length))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          // maximal islands: consecutive versions change the attribute...
          assert(a._3 != b._3)
          // ...and tile the timeline: each interval closes where the next opens
          assert(a._5.contains(b._4))
        case _ =>
      }
      // only the last version is open-ended
      assert(ordered.last._5.isEmpty)
    }
  }

  test("q_interval_join: one row per error event, self-pairs impossible") {
    val errs = Tables.events(spark, sf)
      .filter(col("event_type") === "error").count()
    val out = SparkEntry.queries("q_interval_join")(spark, sf)
    assert(out.count() == errs)
    assert(out.filter(col("n_nearby") < 0).isEmpty)
  }
  test("seq_pack: offsets are gapless running sums; windows cover each doc") {
    val rows = SparkEntry.queries("q_seq_pack")(spark, sf)
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(0), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))) // (lang, shard, id, ...)
    // per packing stream, ordered by doc_id: each doc starts exactly where
    // the previous one ended — no gaps, no overlaps in the packed layout
    rows.groupBy(r => (r._1, r._2)).foreach { case ((src, shard), rs) =>
      val sorted = rs.sortBy(_._3)
      sorted.foldLeft(0L) { case (expected, (_, _, id, nTok, off, ws, we)) =>
        assert(off === expected, s"gap at doc $id in ($src,$shard)")
        assert(ws === off / graft.operators.PipelineOps.PackWindow)
        assert(we === (off + nTok - 1) / graft.operators.PipelineOps.PackWindow)
        assert(we >= ws)
        off + nTok
      }
    }
    // boundary-straddling docs must exist or the window math is untested
    assert(rows.exists(r => r._7 > r._6), "no doc straddles a window boundary")
  }

  test("interval join bucket decomposition is exact for pre-1970 epochs") {
    import spark.implicits._
    // The truncating-div bucketing is argued sign-correct by monotonicity
    // (scaladoc at the bucket math); this pins it on epochs that straddle
    // zero — the exact case a floor-vs-truncate divergence would corrupt.
    val W = 600000000L // ±10 min in µs, the query's window
    val errors = Seq( // (event_id, user_id, ep µs)
      (1L, 10L, -1900000000L), (2L, 10L, -600000000L), (3L, 10L, -1L),
      (4L, 20L, 0L), (5L, 20L, 700000000L), (6L, 30L, -5000000000L))
    val purchases = Seq(
      (100L, 10L, -2500000000L), (101L, 10L, -1300000000L),
      (102L, 10L, -650000000L), (103L, 10L, -100000000L),
      (104L, 20L, 50000000L), (105L, 20L, 1300000000L), (106L, 30L, 0L))
    val rows =
      errors.map { case (id, u, ep) => (id, u, "error", ep * 1000L) } ++
        purchases.map { case (id, u, ep) => (id, u, "purchase", ep * 1000L) }
    val dir = java.nio.file.Files.createTempDirectory("graft-negiv").toString
    rows.toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_interval_join")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = errors.map { case (id, u, ep) =>
      id -> purchases.count { case (_, pu, pep) =>
        pu == u && math.abs(pep - ep) <= W
      }.toLong
    }.toMap
    assert(got == want, s"got $got want $want")
    // the fixture must actually exercise matches across zero
    assert(want.values.sum > 0 && want.values.exists(_ == 0L))
  }
}
