package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Cross-query shared-subplan memo — one registry for result frames that
  * several registered queries derive from the same deterministic
  * computation (ANN result sets for q_ann_recall vs the standalone ANN
  * queries; the connected-component label frame behind
  * q_dedup_cluster / q_dedup_keep_best / q_split_leakage). Every caller
  * receives the SAME persisted DataFrame per (key, cache level), so
  * whichever query materializes first warms the rest — within one action
  * and across queries in a session.
  *
  * Safety properties the memo relies on (and why it is correct to share):
  *   - every memoized build is DETERMINISTIC per (dir) — portable-hash
  *     schedules, no rand(), recompute-stable lineage — so handing a
  *     later query the earlier query's frame cannot change results;
  *   - keys include the [[Caching]] level, so CachingSpec's DISK_ONLY
  *     pass rebuilds under that level instead of reusing a
  *     MEMORY_AND_DISK plan;
  *   - sessions are WEAK keys: a stopped session's entries become
  *     collectable instead of pinning dead plans;
  *   - an external `clearCache()` only unpersists — the re-arm below
  *     re-persists on next use, costing latency, never correctness.
  */
object SharedPlans {
  private val memo = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[String, DataFrame]]()

  /** The memoized, persisted frame for `key` (cache-level scoped). */
  def shared(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val m = memo.synchronized {
      memo.computeIfAbsent(s,
        _ => scala.collection.concurrent.TrieMap.empty[String, DataFrame])
    }
    val lvl = Caching.level(s)
    val df = m.getOrElseUpdate(s"$key@$lvl", Caching.persist(build))
    if (df.storageLevel == StorageLevel.NONE && lvl != StorageLevel.NONE)
      df.persist(lvl) // re-arm after an external clearCache
    df
  }

  /** Forget every memoized FRAME for `s`, unpersisting each. The
    * [[once]] memo survives on purpose: it holds published-artifact
    * dirs whose files outlive any cache clear, and re-publishing per
    * access would change the publish-once/probe-many semantics the
    * artifact-backed queries document. The bench calls this between
    * timed reps — with the block cache also cleared, dropping the memo
    * guarantees a rep rebuilds its shared subplans from scratch instead
    * of inheriting whatever a sibling query materialized, so reps are
    * iid and recorded spreads measure noise, not cache state.
    * Correctness-neutral: every builder is deterministic (the [[shared]]
    * contract), so the next access just rebuilds. */
  def clearFrames(s: SparkSession): Unit =
    memo.synchronized { Option(memo.remove(s)) }
      .foreach(_.values.foreach(df => scala.util.Try(df.unpersist())))

  private val valMemo = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[String, Any]]()

  /** Session-scoped once-memo for plain values produced by deterministic
    * side-effecting setup — e.g. the published VectorIndex dir the
    * artifact-backed ANN queries share: publish once per session, probe
    * many (the production economics; the on-disk artifact outlives
    * clearCache by construction, so unlike [[shared]] there is no cache
    * level or re-arm). Determinism contract as above: the build must be
    * a pure function of (session, key) and the fixture dirs. */
  def once[T](s: SparkSession, key: String)(build: => T): T = {
    val m = valMemo.synchronized {
      valMemo.computeIfAbsent(s,
        _ => scala.collection.concurrent.TrieMap.empty[String, Any])
    }
    // build runs under the map lock: TrieMap.getOrElseUpdate may invoke
    // a racing builder twice and discard one result, which is fine for
    // shared()'s idempotent persists but NOT for these side-effecting
    // publishes (two racing writeVersion calls pick the same v<n> and
    // one dies on errorifexists). Publishes are rare and session-scoped;
    // serializing them is the correct trade.
    m.synchronized {
      m.getOrElseUpdate(key, build).asInstanceOf[T]
    }
  }
}
