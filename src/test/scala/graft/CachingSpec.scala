package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.storage.StorageLevel

/** Storage-level independence of the persist-heavy operators
  * (SCALING.md "persist at 100 TB" row): forcing every reused-subplan
  * cache to DISK_ONLY — the everything-evicted-from-memory path — must
  * not change any result. Combined with recompute-stable lineage (r4
  * salt fix), this pins that cache pressure at scale costs latency only,
  * never correctness. */
class CachingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  // operators whose plans run through Caching.persist: MinHash banding
  // (DedupOps), dedup clustering (GraphOps iterative path is exercised in
  // GraphOpsSpec; here the fixture takes the driver union-find branch),
  // global ranking (RankOps), IDF scoring (PipelineOps), IVF (VectorOps)
  // ... plus the SharedPlans-memoized codec families (r8): the memo keys
  // include the cache level, so the DISK_ONLY pass must REBUILD the
  // payload/hash frames under that level rather than reuse a
  // MEMORY_AND_DISK entry
  private val probes =
    Seq("q_text_minhash", "q_dedup_cluster", "q_roundrobin_slice",
      "q_text_boilerplate", "q_ann_ivf", "q_image_dhash",
      "q_audio_fingerprint")

  private def run(name: String): Seq[String] = {
    val rows = SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
    spark.catalog.clearCache()
    rows
  }

  test("forcing caches to DISK_ONLY changes no operator result") {
    val baseline = probes.map(n => n -> run(n)).toMap
    spark.conf.set(Caching.ConfKey, "DISK_ONLY")
    try probes.foreach { n =>
      assert(run(n) === baseline(n), s"$n diverged under DISK_ONLY caching")
    } finally spark.conf.unset(Caching.ConfKey)
  }

  test("cache level default is MEMORY_AND_DISK; NONE disables persistence") {
    assert(Caching.level(spark) === StorageLevel.MEMORY_AND_DISK)
    spark.conf.set(Caching.ConfKey, "NONE")
    try {
      assert(Caching.level(spark) === StorageLevel.NONE)
      import spark.implicits._
      val df = Caching.persist(Seq(1, 2, 3).toDF("x"))
      assert(df.storageLevel === StorageLevel.NONE, "NONE must skip persist")
      assert(df.count() === 3)
    } finally spark.conf.unset(Caching.ConfKey)
  }

  test("SharedPlans.clearFrames drops the frame memo (bench rep isolation) " +
      "but keeps the once-memo") {
    import spark.implicits._
    var builds = 0
    def access() = SharedPlans.shared(spark, "caching-spec-clear") {
      builds += 1; Seq(1, 2, 3).toDF("x")
    }
    val a = access(); val b = access()
    assert(builds == 1 && (a eq b), "memo must serve the same frame")
    assert(a.storageLevel != StorageLevel.NONE)
    var onceBuilds = 0
    assert(SharedPlans.once(spark, "caching-spec-once") { onceBuilds += 1; 7 } == 7)
    SharedPlans.clearFrames(spark)
    assert(a.storageLevel == StorageLevel.NONE,
      "clearFrames must unpersist the dropped frame")
    val c = access()
    assert(builds == 2 && !(a eq c),
      "a post-clear access must rebuild from scratch")
    assert(c.count() == 3)
    // the once-memo (published-artifact dirs) survives the clear
    assert(SharedPlans.once(spark, "caching-spec-once") { onceBuilds += 1; 8 } == 7)
    assert(onceBuilds == 1)
    spark.catalog.clearCache()
  }
}
