package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The published near-dup index — the static side NearDupStream's
  * scaladoc promises ("republished as compacted parquet on each corpus
  * rebuild"), as real artifacts rather than prose:
  *
  *   <dir>/docs/   (doc_id, hs, n, truncated)  — per-doc shingle-hash sets
  *   <dir>/bands/  (band, minhash, doc_id)     — the MinHash band index
  *   <dir>/meta/   (ndocs, parts)              — corpus count + the bands
  *                                               layout modulus
  *
  * PARTITIONED BANDS LAYOUT (the VectorIndex convention): `bands` lands
  * hive-partitioned by `dpart = xxhash64(band, minhash) mod parts`,
  * repartitioned BY that column so each partition directory holds ONE
  * file; `parts` derives from the corpus size at publish
  * ([[layoutPartsFor]]) and is recorded in `meta`. The partition column
  * is a pure function of the band join key, so a small probe batch can
  * derive its partition-value set and read only those partitions
  * ([[prunedBands]] — the read cut behind
  * DedupOps.crossDedupBestFromIndex), while `parts` stays layout-only:
  * a republish may change it without invalidating any key.
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

  /** Hash-partition count for a publish's `bands` layout, derived from
    * the corpus doc count: floor 64, one more partition per ~250k docs
    * (32 band rows each — ~8M skinny rows, ~200 MB per file), capped at
    * 64k directories. Layout-only — NOT part of the published-key
    * contract; a republish at a different count changes no key. */
  private[graft] def layoutPartsFor(nDocs: Long): Int =
    math.max(64L, math.min(1L << 16, nDocs / (250L * 1000) + 1)).toInt

  private def dpartOf(band: org.apache.spark.sql.Column,
      minhash: org.apache.spark.sql.Column, nParts: Int) =
    pmod(xxhash64(band, minhash), lit(nParts.toLong))

  /** The bands layout modulus recorded at publish. */
  def loadParts(s: SparkSession, indexDir: String): Int =
    s.read.parquet(s"$indexDir/meta").collect()(0).getAs[Int]("parts")

  /** Write `bands` (band, minhash, doc_id) under the partitioned layout
    * plus the `meta` record — the shared tail of [[publishFrom]] and
    * [[mergePublish]]. `meta` commits LAST so [[isPublished]] implies a
    * complete bands layout. */
  private def writeBandsAndMeta(s: SparkSession, bands: DataFrame,
      indexDir: String, nDocs: Long): Unit = {
    import s.implicits._
    val parts = layoutPartsFor(nDocs)
    bands.select("band", "minhash", "doc_id")
      .withColumn("dpart", dpartOf(col("band"), col("minhash"), parts))
      .repartition(parts, col("dpart"))
      .write.partitionBy("dpart")
      .mode("overwrite").parquet(s"$indexDir/bands")
    Seq((nDocs, parts)).toDF("ndocs", "parts")
      .write.mode("overwrite").parquet(s"$indexDir/meta")
  }

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
      writeBandsAndMeta(s, graft.streaming.NearDupStream.bandIndex(s, docs),
        indexDir, docs.count())
      (s.read.parquet(s"$indexDir/docs").count(),
        loadBands(s, indexDir).count())
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
      val mergedBands = loadBands(s, indexDir)
        .join(batchIds, Seq("doc_id"), "left_anti")
        .unionByName(graft.streaming.NearDupStream.bandIndex(s, batch)
          .select(col("band"), col("minhash"), col("doc_id")))
      // parts is layout-only: re-derived at the merged doc count
      writeBandsAndMeta(s, mergedBands, newIndexDir,
        s.read.parquet(s"$newIndexDir/docs").count())
      (s.read.parquet(s"$newIndexDir/docs").count(),
        loadBands(s, newIndexDir).count())
    } finally batch.unpersist()
  }

  /** True iff ALL datasets committed (meta writes last, so it doubles as
    * the publish's overall marker) — the reader-side gate. */
  def isPublished(s: SparkSession, indexDir: String): Boolean =
    StorageOps.isCommitted(s, s"$indexDir/docs") &&
      StorageOps.isCommitted(s, s"$indexDir/bands") &&
      StorageOps.isCommitted(s, s"$indexDir/meta")

  def loadDocs(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(s"$indexDir/docs")

  /** The band table WITHOUT the layout's partition column — the
    * reader-facing schema is (band, minhash, doc_id) exactly; `dpart` is
    * derivable from (band, minhash) whenever a consumer wants the pruned
    * scan ([[prunedBands]] reads [[loadBandsRaw]] and drops it after the
    * filter). */
  def loadBands(s: SparkSession, indexDir: String): DataFrame =
    loadBandsRaw(s, indexDir).select("band", "minhash", "doc_id")

  private def loadBandsRaw(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(s"$indexDir/bands")

  /** The band table pruned to the partitions a probe batch's band keys
    * touch: derives the batch's `dpart` value set at the published
    * layout modulus (a distinct-collect bounded by `parts`, never the
    * batch size) and plants a static `isin` the scan turns into a
    * PartitionFilter — skipped when every partition is touched, which is
    * when pruning could not have helped. A (band, minhash) bucket lives
    * entirely inside one partition (the column is a pure key function),
    * so per-bucket width statistics computed over the pruned scan are
    * exact. `batchBands`: (band, bv) — minhash under its join alias. */
  private[graft] def prunedBands(s: SparkSession, indexDir: String,
      batchBands: DataFrame): DataFrame = {
    val nParts = loadParts(s, indexDir)
    val parts = batchBands
      .select(dpartOf(col("band"), col("bv"), nParts).as("dpart"))
      .distinct().collect().map(_.getLong(0))
    val raw = loadBandsRaw(s, indexDir)
    val pruned =
      if (parts.length < nParts) {
        val lits: Seq[Any] = raw.schema("dpart").dataType match {
          case org.apache.spark.sql.types.IntegerType => parts.toSeq.map(_.toInt)
          case _ => parts.toSeq
        }
        raw.filter(col("dpart").isin(lits: _*))
      } else raw
    pruned.select("band", "minhash", "doc_id")
  }
}
