package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.VectorIndex

/** The ARTIFACT-RESIDENT recall ground truth (r15 verdict #1): exact
  * top-[[VectorIndex.GtDepth]] lists computed once at publish, then
  * maintained INCREMENTALLY per merge — the stored lists must equal a
  * from-scratch brute recompute over the artifact's own corpus after
  * every merge shape, including the two "drain" cases where the
  * incremental prefix argument breaks (a replaced id was a stored
  * neighbor; a probe query's own vector was replaced). The payoff under
  * test: [[VectorIndex.recallAudit]] and the armed maintain gate read
  * the store instead of re-scanning the corpus every ingest cycle. */
class GtStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  private def allEmb =
    Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))

  /** From-scratch exact ground truth over the artifact's live corpus —
    * the recompute the stored lists must equal bit-for-bit. */
  private def bruteRecompute(dir: String): Set[(Long, Long, Int)] = {
    graft.functions.GraftFunctions.register(spark)
    val gtq = VectorIndex.loadGtq(spark, dir)
      .select(col("query_id"), col("embedding").as("qe"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    VectorIndex.loadCells(spark, dir).select("vec_id", "embedding")
      .join(broadcast(gtq), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr("cosine_sim(qe, embedding)").as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= VectorIndex.GtDepth)
      .select("query_id", "neighbor_id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def storedGt(dir: String): Set[(Long, Long, Int)] =
    VectorIndex.loadGt(spark, dir).select("query_id", "neighbor_id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def negated(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      expr("transform(embedding, x -> -x)").as("embedding"))

  test("stored gt equals the brute recompute across a merge sequence, " +
      "including neighbor-removal and query-replacement drains") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-gt-store").toString
    val probe = allEmb.filter(col("vec_id") < 5)
    VectorIndex.publishFrom(spark, allEmb.filter(col("vec_id") < 60), dir,
      gtProbe = Some(probe))
    assert(VectorIndex.hasGt(spark, dir))
    val gt0 = storedGt(dir)
    assert(gt0 == bruteRecompute(dir), "publish-time gt != brute")
    // every query holds the full depth (corpus 60 > GtDepth + 1)
    assert(gt0.groupBy(_._1).forall(_._2.size == VectorIndex.GtDepth))

    // 1. pure-insert merge: the incremental clean path (no replaced ids)
    VectorIndex.mergePublish(spark, dir,
      allEmb.filter(col("vec_id") >= 60 && col("vec_id") < 80))
    assert(storedGt(dir) == bruteRecompute(dir),
      "incremental gt after a pure-insert merge != brute recompute")

    // 2. neighbor-removal drain: replace a stored NEIGHBOR's vector with
    // a negated one (worst match for every query) — its old rows must
    // leave the lists and the evicted depth tail must be recovered
    val victim = VectorIndex.loadGt(spark, dir)
      .filter(col("query_id") =!= col("neighbor_id"))
      .filter(col("neighbor_id") >= 5) // keep probe queries intact here
      .select("neighbor_id").limit(1).collect()(0).getLong(0)
    VectorIndex.mergePublish(spark, dir,
      negated(allEmb.filter(col("vec_id") === victim)))
    val gt2 = storedGt(dir)
    assert(gt2 == bruteRecompute(dir),
      "gt after a stored-neighbor replacement != brute recompute")
    assert(gt2.groupBy(_._1).forall(_._2.size == VectorIndex.GtDepth),
      "a drained query was not refilled to full depth")

    // 3. query-replacement drain: replace a probe query's OWN vector —
    // gtq must refresh latest-wins and that query's list must rescore
    VectorIndex.mergePublish(spark, dir,
      negated(allEmb.filter(col("vec_id") === 2)))
    assert(storedGt(dir) == bruteRecompute(dir),
      "gt after replacing a probe query's own vector != brute recompute")
    val gtqRow = VectorIndex.loadGtq(spark, dir)
      .filter(col("query_id") === 2)
      .select(expr("embedding[0]")).collect()(0).getFloat(0)
    val orig = allEmb.filter(col("vec_id") === 2)
      .select(expr("embedding[0]")).collect()(0).getFloat(0)
    assert(gtqRow == -orig, "gtq did not take the replaced query vector")

    // 4. the full-rewrite merge path (layout change can't be forced at
    // this count, but a LEGACY-shaped fallback rides mergeFullRewrite
    // via a big batch; here: exercise a mixed batch instead — inserts +
    // a replaced neighbor in one merge)
    val victim2 = VectorIndex.loadGt(spark, dir)
      .filter(col("neighbor_id") >= 5)
      .select("neighbor_id").limit(1).collect()(0).getLong(0)
    VectorIndex.mergePublish(spark, dir,
      allEmb.filter(col("vec_id") >= 80 && col("vec_id") < 90)
        .unionByName(negated(allEmb.filter(col("vec_id") === victim2))))
    assert(storedGt(dir) == bruteRecompute(dir),
      "gt after a mixed insert+replace merge != brute recompute")
    spark.catalog.clearCache()
  }

  test("recallAudit reads the stored gt (tamper pin) and falls back " +
      "for foreign query sets or k beyond the stored depth") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-gt-audit").toString
    val probe = allEmb.filter(col("vec_id") < 5)
    VectorIndex.publishFrom(spark, allEmb.filter(col("vec_id") < 60), dir,
      gtProbe = Some(probe), pq = true)
    val q = probe.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    assert(VectorIndex.storedGtUsable(spark, dir, q, 5))
    assert(!VectorIndex.storedGtUsable(spark, dir, q,
      VectorIndex.GtDepth + 1), "k beyond the stored depth must fall back")
    assert(!VectorIndex.storedGtUsable(spark, dir,
      allEmb.filter(col("vec_id") < 6)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe")), 5),
      "a superset query set must fall back")
    assert(!VectorIndex.storedGtUsable(spark, dir,
      allEmb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe")), 5),
      "a subset query set must fall back")
    // r16 ADVICE: same ids with DIFFERENT embeddings (a re-embedded
    // corpus) must fall back — auditing approximate legs against a
    // stale exact baseline would be a silent wrong-audit
    assert(!VectorIndex.storedGtUsable(spark, dir,
      probe.select(col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => -x).as("qe")), 5),
      "re-embedded queries (same ids) must fall back")

    // with the store intact, stored-path output == live-brute output
    // (same artifact, gt is exact at publish)
    def auditRows() = VectorIndex
      .recallAudit(spark, dir, probe, k = 5, nprobe = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val viaStore = auditRows()

    // TAMPER PIN: drop one query's rows from the stored gt — the audit's
    // denominator must follow the STORE (20 = 4 x 5 brute rows), proving
    // the baseline was read, not recomputed
    val v = graft.sources.StorageOps.currentVersion(spark, dir).get
    val gtPath = s"$dir/$v/gt"
    val kept = VectorIndex.loadGt(spark, dir)
      .filter(col("query_id") =!= 0).collect()
    val fs = new org.apache.hadoop.fs.Path(gtPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(gtPath), true)
    import spark.implicits._
    kept.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.toDF("query_id", "neighbor_id", "sim", "rk")
      .coalesce(1).write.parquet(gtPath)
    val tampered = auditRows()
    assert(viaStore.forall(_._3 == 25L), s"pre-tamper n_brute != 25: $viaStore")
    assert(tampered.forall(_._3 == 20L),
      s"audit did not read the stored baseline after the tamper: $tampered")
    spark.catalog.clearCache()
  }

  test("per-variant probe arming: an unarmed variant below the floor " +
      "does not retrain; arming it does (r15 verdict #4)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-gt-variants").toString
    val probe = allEmb.filter(col("vec_id") < 10)
    VectorIndex.publishFrom(spark, allEmb, dir, pq = true,
      gtProbe = Some(probe))
    val audit = VectorIndex
      .recallAudit(spark, dir, probe, k = 5, nprobe = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    info(s"fixture recall@5 per variant: $audit")
    val best = audit.maxBy(_._2)
    val worst = audit.minBy(_._2)
    assert(worst._2 < best._2,
      s"fixture gives no recall spread to test variant arming: $audit")
    val floor = (worst._2 + best._2) / 2
    // armed on the BEST variant only: the worst one sagging below the
    // floor is nobody's search path — no retrain
    val (_, r1) = VectorIndex.maintain(spark, dir,
      allEmb.filter(col("vec_id") < 0),
      recallProbe = Some(VectorIndex.RecallProbe(probe, floor,
        variants = Set(best._1))))
    assert(!r1, s"probe armed on ${best._1} retrained for ${worst._1}'s sag")
    // armed on the worst variant: the same floor trips the retrain
    val (_, r2) = VectorIndex.maintain(spark, dir,
      allEmb.filter(col("vec_id") < 0),
      recallProbe = Some(VectorIndex.RecallProbe(probe, floor,
        variants = Set(worst._1))))
    assert(r2, s"probe armed on ${worst._1} did not trip at floor $floor")
    // a typo'd / unpublished variant fails loudly, not silently-pass
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.maintain(spark, dir, allEmb.filter(col("vec_id") < 0),
        recallProbe = Some(VectorIndex.RecallProbe(probe, 0.5,
          variants = Set("no_such_path"))))
    }
    assert(ex.getMessage.contains("armed variants"), ex.getMessage)
    spark.catalog.clearCache()
  }

  test("an unreachable floor is surfaced after the retrain: throw under " +
      "failUnrecovered, warn-and-return otherwise (r15 ADVICE)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-gt-unrecovered").toString
    val probe = allEmb.filter(col("vec_id") < 5)
    VectorIndex.publishFrom(spark, allEmb.filter(col("vec_id") < 60), dir,
      gtProbe = Some(probe))
    val ex = intercept[IllegalStateException] {
      VectorIndex.maintain(spark, dir, allEmb.filter(col("vec_id") < 0),
        recallProbe = Some(VectorIndex.RecallProbe(probe, floor = 1.01,
          failUnrecovered = true)))
    }
    assert(ex.getMessage.contains("not restored"), ex.getMessage)
    // default policy: the rebuild still runs and maintain RETURNS — the
    // unrecovered floor is logged, not fatal
    val (_, rebuilt) = VectorIndex.maintain(spark, dir,
      allEmb.filter(col("vec_id") < 0),
      recallProbe = Some(VectorIndex.RecallProbe(probe, floor = 1.01)))
    assert(rebuilt)
    // the rebuild re-derived the gt pair (still exact, still present)
    assert(VectorIndex.hasGt(spark, dir))
    assert(storedGt(dir) == bruteRecompute(dir),
      "post-rebuild gt != brute recompute")
    spark.catalog.clearCache()
  }
}
