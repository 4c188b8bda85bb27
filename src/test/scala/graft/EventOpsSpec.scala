package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{EventOps, LinkOps}

/** Robust-outlier semantics (median/MAD must shrug off the outlier it
  * flags — the property mean/stddev scoring lacks) and the entity-
  * resolution composition over the fixtures. */
class EventOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("robustOutliers flags an injected extreme and nothing else") {
    import spark.implicits._
    // 20 values in a tight band + one wild spike; with the spike INSIDE
    // the sample, median/MAD barely move, so only the spike crosses 3.5
    val base = (1L to 20L).map(i => (i, "a", 10.0 + (i % 5) * 0.1))
    val ev = (base :+ ((99L, "a", 500.0))).toDF("event_id", "event_type", "value")
    val out = EventOps.robustOutliers(ev).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(99L))
    assert(out(0).getDouble(3) > 100) // the spike's robust z is enormous
  }

  test("robustOutliers drops degenerate types (MAD = 0) instead of emitting Infinity") {
    import spark.implicits._
    // type "c": >=50% identical values -> MAD 0; a constant type plus a
    // deviant row must yield NO rows (not an Infinity score), while a
    // healthy type alongside still flags its spike
    val const = (1L to 10L).map(i => (i, "c", 42.0)) :+ ((11L, "c", 99.0))
    val healthy = (20L to 40L).map(i => (i, "h", 10.0 + (i % 5) * 0.1)) :+ ((99L, "h", 500.0))
    val ev = (const ++ healthy).toDF("event_id", "event_type", "value")
    val out = EventOps.robustOutliers(ev).collect()
    assert(out.map(_.getString(1)).forall(_ == "h"))
    assert(out.map(_.getLong(0)).toSeq === Seq(99L))
    assert(out.forall(r => !r.getDouble(3).isInfinite))
  }

  test("mean/stddev z-scoring would mask what MAD catches (masking demo)") {
    import spark.implicits._
    // three co-located spikes inflate the stddev enough that a classic
    // 3.5-sigma cut misses all of them; the MAD cut does not
    val base = (1L to 20L).map(i => (i, "a", 10.0 + (i % 5) * 0.1))
    val ev = (base ++ Seq((97L, "a", 300.0), (98L, "a", 305.0), (99L, "a", 310.0)))
      .toDF("event_id", "event_type", "value")
    val flagged = EventOps.robustOutliers(ev).collect().map(_.getLong(0)).toSet
    assert(flagged === Set(97L, 98L, 99L))
    val stats = ev.agg(avg("value").as("m"), stddev_pop("value").as("s")).collect()(0)
    val (m, sd) = (stats.getDouble(0), stats.getDouble(1))
    // classic z of the spikes stays under 3.5 — masked
    assert(math.abs(310.0 - m) / sd < 3.5)
  }

  test("q_rolling_distinct window semantics on the live fixture") {
    val sf = TestSpark.sf0001
    val rows = EventOps.queries("q_rolling_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    // every HLL estimate inside the 5% gate, rolling >= daily distinct
    assert(rows.forall(_.getBoolean(2)), "an HLL estimate missed the 5% gate")
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct().groupBy("day").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (day, n7) = (r.getLong(0), r.getLong(1))
      assert(n7 >= daily(day), s"day $day rolling < daily")
      val unionBound = (day - 6 to day).flatMap(daily.get).sum
      assert(n7 <= unionBound, s"day $day rolling exceeds the union bound")
    }
    // the window genuinely accumulates: some day's trailing reach must
    // exceed its single-day distinct (users arrive on different days)
    assert(rows.exists(r => r.getLong(1) > daily(r.getLong(0))))
    spark.catalog.clearCache()
  }

  test("q_session_paths path counts total the q_window_session session count") {
    val sf = TestSpark.sf0001
    val paths = EventOps.queries("q_session_paths")(spark, sf).collect()
    val total = operators.CoreOps.queries("q_window_session")(spark, sf)
      .agg(sum("n_sessions")).collect()(0).getLong(0)
    val pathSum = paths.map(_.getLong(1)).sum
    // below the top-50 cut every session appears in exactly one path row
    if (paths.length < 50) assert(pathSum === total)
    else assert(pathSum <= total)
    spark.catalog.clearCache()
  }

  test("q_entity_resolution maps every distinct name once, canonical wins by multiplicity") {
    val sf = TestSpark.sf0001
    val out = LinkOps.queries("q_entity_resolution")(spark, sf).collect()
    val names = Tables.part(spark, sf).select("p_name").distinct().count()
    assert(out.length.toLong === names)            // total mapping, no dupes
    val byCanon = out.groupBy(_.getString(1))
    byCanon.foreach { case (canon, rows) =>
      val members = rows.map(r => (r.getString(0), r.getLong(3)))
      val canonMult = members.collectFirst { case (n, m) if n == canon => m }
      assert(canonMult.nonEmpty, s"canonical $canon must be a member of its own cluster")
      // canonical has the max multiplicity; among the tied-max names it
      // is the lexicographically smallest (the stated election order)
      val maxMult = members.map(_._2).max
      assert(canonMult.get === maxMult)
      assert(canon === members.filter(_._2 == maxMult).map(_._1).min)
    }
    spark.catalog.clearCache()
  }
}
