package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** One policy point for every reused-subplan persist() in the engine
  * (SCALING.md "persist at 100 TB" row).
  *
  * Level semantics at scale: the cached frames here are REUSED SUBPLANS
  * (shingle tables, doc-hash arrays, rank buckets) whose loss mid-query
  * forces recomputation of an expensive stage. `MEMORY_AND_DISK` —
  * explicit, not Spark's implicit default — makes eviction a spill, not a
  * recompute: at 100 TB an executor under memory pressure writes the
  * partition to local disk instead of dropping it. Every cached subplan
  * is also RECOMPUTE-STABLE (deterministic lineage — the r4 salt fix
  * closed the one SPARK-23207-class hazard), so even total cache loss
  * changes nothing but latency; [[graft.CachingSpec]] proves the
  * level-independence by running the persist-heavy operators with the
  * level forced to DISK_ONLY (the everything-evicted-from-memory path)
  * and comparing results.
  *
  * The level is a session conf (`spark.graft.cacheLevel`) so a deployment
  * can dial it (e.g. `MEMORY_AND_DISK_SER` where executor memory is the
  * bottleneck, `NONE` to disable caching entirely) without code changes.
  */
object Caching {
  val ConfKey = "spark.graft.cacheLevel"

  def level(s: SparkSession): StorageLevel =
    s.conf.get(ConfKey, "MEMORY_AND_DISK") match {
      case "NONE" => StorageLevel.NONE
      case other  => StorageLevel.fromString(other)
    }

  /** persist() `df` at the session-configured level ([[ConfKey]]);
    * StorageLevel.NONE skips caching entirely (persist(NONE) would throw). */
  def persist(df: DataFrame): DataFrame = {
    val lvl = level(df.sparkSession)
    if (lvl == StorageLevel.NONE) df else df.persist(lvl)
  }
}
