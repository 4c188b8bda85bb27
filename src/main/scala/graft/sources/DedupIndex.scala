package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The published near-dup index — the static side NearDupStream's
  * scaladoc promises ("republished as compacted parquet on each corpus
  * rebuild"), as real artifacts rather than prose:
  *
  *   <dir>/docs/   (doc_id, hs, n, truncated)  — per-doc shingle-hash sets
  *   <dir>/bands/  (band, minhash, doc_id)     — the MinHash band index
  *
  * Both datasets commit atomically through the Spark committer (task temp
  * dirs → rename → `_SUCCESS`), so a reader that checks [[isPublished]]
  * never observes a half-written publish — the same reader-side wait
  * contract StorageOps.isCommitted carries for the data sink
  * (the reference's `_SUCCEED` marker, ShuffleDataExecutor.java:119-138).
  *
  * Size at 100 TB: `docs` is one row per corpus doc (hash arrays,
  * token-capped); `bands` is 32 rows per doc of three int64s — both a
  * small multiple of a doc-id listing, far under the corpus itself, and
  * both partition-friendly (bands bucket naturally by (band, minhash) for
  * the stream join; docs by doc_id for the verify join). A rebuild is one
  * batch job; consumers swap directories on the `_SUCCESS` flip.
  *
  * PUBLISHED-KEY CONTRACT — the `minhash` column is a HASH, not an
  * arithmetic encoding: MinHashSig packs a band's r minima as
  * `((m1·P + m2)·P + m3)…`, which WRAPS int64 from r = 3 on
  * (MinHashSig.scala band-packing scaladoc). Key equality is therefore a
  * ~2^-64-collision-grade signal that the band's minima collided, not a
  * certainty — every consumer (in-repo: the stream join, cross-dedup,
  * the batch self-join) must exact-verify candidate pairs against
  * `docs.hs`, and an external consumer of this artifact must NOT treat
  * equal keys as proven r-minima collisions. */
object DedupIndex {

  /** Build and publish both index datasets for the corpus at `corpusDir`.
    * Overwrites any previous publish at `indexDir` (the republish cycle).
    * Returns (docRows, bandRows). */
  def publish(s: SparkSession, corpusDir: String, indexDir: String): (Long, Long) =
    publishFrom(s, graft.Tables.documents(s, corpusDir), indexDir)

  /** [[publish]] over an arbitrary documents-shaped frame (doc_id, text) —
    * the entry the merge-equivalence spec and partial-corpus publishes
    * use. */
  def publishFrom(s: SparkSession, corpus: DataFrame, indexDir: String): (Long, Long) = {
    graft.functions.GraftFunctions.register(s)
    val docs = graft.Caching.persist(
      graft.operators.DedupOps.docHashesOf(s, corpus))
    try {
      docs.write.mode("overwrite").parquet(s"$indexDir/docs")
      graft.streaming.NearDupStream.bandIndex(s, docs)
        .write.mode("overwrite").parquet(s"$indexDir/bands")
      (s.read.parquet(s"$indexDir/docs").count(),
        s.read.parquet(s"$indexDir/bands").count())
    } finally docs.unpersist()
  }

  /** Incremental index maintenance — the lifecycle step between full
    * rebuilds: merge an ACCEPTED batch of documents (doc_id, text; the
    * docs cross-dedup admitted) into a published index and publish the
    * result as a NEW index directory. Consumers swap directories on the
    * `_SUCCESS` flip exactly as the rebuild contract above describes —
    * writing beside, never into, the live index is what makes the swap
    * atomic on any store (and is why `newIndexDir != indexDir` is
    * enforced: an in-place overwrite would race its own readers).
    *
    * Re-submitted ids take LATEST-WINS: the old index's rows for ids
    * present in the batch are dropped before the union, so a re-ingested
    * (edited) document replaces its hash set and band keys.
    *
    * Incrementality: shingling/hashing/banding run over the BATCH only —
    * the existing corpus contributes its already-computed `docs` and
    * `bands` rows through a broadcast-able anti-join + union, so a merge
    * costs O(batch) compute plus an O(index) copy, never a corpus
    * re-shingle. (At 100 TB the copy is the small index artifact, not the
    * corpus; partitioning `bands` by band would turn the copy into a
    * partition-level append for the unreplaced majority.)
    * Returns (docRows, bandRows) of the merged publish. */
  def mergePublish(s: SparkSession, indexDir: String, newDocs: DataFrame,
      newIndexDir: String): (Long, Long) = {
    require(isPublished(s, indexDir), s"no published index at $indexDir")
    // canonical paths: getAbsolutePath would let a symlinked or
    // dot-segment spelling of the live dir slip past the guard
    require(new java.io.File(newIndexDir).getCanonicalPath !=
      new java.io.File(indexDir).getCanonicalPath,
      "merge must publish beside the live index, not into it")
    graft.functions.GraftFunctions.register(s)
    val batch = graft.Caching.persist(
      graft.operators.DedupOps.docHashesOf(s, newDocs))
    try {
      val batchIds = batch.select(col("doc_id"))
      loadDocs(s, indexDir).join(batchIds, Seq("doc_id"), "left_anti")
        .unionByName(batch)
        .write.mode("overwrite").parquet(s"$newIndexDir/docs")
      loadBands(s, indexDir).join(batchIds, Seq("doc_id"), "left_anti")
        .unionByName(graft.streaming.NearDupStream.bandIndex(s, batch)
          .select(col("band"), col("minhash"), col("doc_id")))
        .write.mode("overwrite").parquet(s"$newIndexDir/bands")
      (s.read.parquet(s"$newIndexDir/docs").count(),
        s.read.parquet(s"$newIndexDir/bands").count())
    } finally batch.unpersist()
  }

  /** True iff BOTH datasets committed — the reader-side gate. */
  def isPublished(s: SparkSession, indexDir: String): Boolean =
    StorageOps.isCommitted(s, s"$indexDir/docs") &&
      StorageOps.isCommitted(s, s"$indexDir/bands")

  def loadDocs(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(s"$indexDir/docs")

  def loadBands(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(s"$indexDir/bands")
}
