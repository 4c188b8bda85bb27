package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Published LEXICAL index artifact — the posting-list form of the BM25
  * retrieval family (operators/RetrievalOps.scala), persisted the way the
  * vector/dedup/fingerprint families persist their search structures
  * (reference analog: the partition-file layout + `_SUCCEED` publish
  * contract of PartitionShuffleFileManager.java — datasets land whole,
  * meta commits last, consumers read only committed layouts).
  *
  * Layout under `indexDir/`:
  *   - `postings` (term, doc_id, tf, dl) partitioned by
  *     `tpart = pmod(xxhash64(term), parts)` — dl is DENORMALIZED into
  *     the posting row (the classic inverted-file design): a probe then
  *     never joins the corpus-sized doc table, it reads query-term
  *     partitions only;
  *   - `terms` (term, df) partitioned by `tpart` — df per term, pruned
  *     by the same partition values as the postings it describes;
  *   - `docs` (doc_id, dl) partitioned by
  *     `dpart = pmod(xxhash64(doc_id), parts)` — bookkeeping/health side
  *     (not read by the probe): the dataset a future partition-level
  *     merge re-derives replaced doc lengths from, exactly like
  *     DedupIndex's doc store;
  *   - `meta` (ndocs, sumdl, parts) — committed LAST, so meta presence
  *     implies complete layouts. `sumdl` is the EXACT integer token
  *     total: avgdl = sumdl/ndocs reproduces the inline twin's
  *     `avg(dl)` bit-for-bit (sums of integer-valued doubles are exact),
  *     so artifact probes and inline scoring can never disagree on the
  *     length normalization.
  *
  * Scale shape: the probe reads ONLY the partitions holding the query's
  * terms ([[StorageOps.prunedByVals]], the shared static-pruning filter)
  * — per-query artifact IO is O(posting lists touched), never O(corpus);
  * the (n_docs, avgdl) scalars come from one meta row. Scoring reuses the
  * inline operator's contribution expression and ranking verbatim
  * (RetrievalOps.bm25Contrib / bm25TopkFrom — ONE definition), so the
  * probe is oracle-identical to the inline twin by construction.
  *
  * Lifecycle scope, stated: publish + crash-safe versioned republish
  * ([[publishVersioned]] — fresh v-dir + atomic pointer flip, so a
  * crashed refresh never tears a live reader) + partition-pruned probe
  * + in-gate stats. The one deferred piece is the siblings'
  * PARTITION-LEVEL merge (incremental ingest): it applies to this
  * layout unchanged — postings partition by a pure term-hash function
  * like the dedup bands, df maintenance is an additive term-keyed
  * merge — and waits until the retrieval family needs it.
  */
object LexIndex {

  /** Same layout-parts schedule as the sibling indexes (DedupIndex). */
  private def layoutPartsFor(nDocs: Long): Int =
    math.max(64L, math.min(1L << 16, nDocs / (250L * 1000) + 1)).toInt

  private def tpartOf(term: org.apache.spark.sql.Column, nParts: Int) =
    pmod(xxhash64(term), lit(nParts.toLong))

  private def dpartOf(docId: org.apache.spark.sql.Column, nParts: Int) =
    pmod(xxhash64(docId), lit(nParts.toLong))

  def isPublished(s: SparkSession, indexDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/meta")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Build and publish the index for the corpus at `corpusDir`. Returns
    * the meta totals (ndocs, sumdl).
    *
    * CRASH-SAFETY, stated: meta-commits-last makes the FIRST publish
    * torn-safe (no meta → unpublished), but an IN-PLACE republish
    * overwrites datasets while the previous meta still exists — a crash
    * mid-republish leaves a stale meta over partial datasets. A refresh
    * cycle must therefore publish through [[publishVersioned]] (fresh
    * version dir + atomic pointer flip, the sibling families' versioned
    * root) or to a fresh directory it swaps itself; plain [[publish]]
    * into a live path is for first publishes and throwaway session
    * artifacts only. */
  def publish(s: SparkSession, corpusDir: String,
      indexDir: String): (Long, Long) =
    publishFrom(s, graft.Tables.documents(s, corpusDir), indexDir)

  /** [[publish]] over an arbitrary documents-shaped frame (doc_id, text). */
  def publishFrom(s: SparkSession, corpus: DataFrame,
      indexDir: String): (Long, Long) = {
    val toks = corpus.select(col("doc_id"),
      graft.operators.TextRules.tokens(col("text")).as("toks"))
    // persisted: feeds dl, the postings and the doc-length totals
    val dl = graft.Caching.persist(
      toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl")))
    try {
      val totals = dl.agg(count(lit(1)).as("n"), sum("dl").as("s")).collect()(0)
      val (nDocs, sumDl) = (totals.getLong(0), totals.getLong(1))
      val parts = layoutPartsFor(nDocs)
      val tf = toks
        .select(col("doc_id"), explode(col("toks")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      tf.join(dl, "doc_id")
        .select(col("term"), col("doc_id"), col("tf"), col("dl"))
        .withColumn("tpart", tpartOf(col("term"), parts))
        .repartition(parts, col("tpart"))
        .write.partitionBy("tpart")
        .mode("overwrite").parquet(s"$indexDir/postings")
      // df re-aggregates from the WRITTEN postings, not the live tf
      // subplan: the stored pair can then never disagree
      s.read.parquet(s"$indexDir/postings")
        .groupBy("term").agg(count(lit(1)).as("df"))
        .withColumn("tpart", tpartOf(col("term"), parts))
        .repartition(parts, col("tpart"))
        .write.partitionBy("tpart")
        .mode("overwrite").parquet(s"$indexDir/terms")
      dl.withColumn("dpart", dpartOf(col("doc_id"), parts))
        .repartition(parts, col("dpart"))
        .write.partitionBy("dpart")
        .mode("overwrite").parquet(s"$indexDir/docs")
      import s.implicits._
      Seq((nDocs, sumDl, parts)).toDF("ndocs", "sumdl", "parts")
        .write.mode("overwrite").parquet(s"$indexDir/meta")
      (nDocs, sumDl)
    } finally dl.unpersist()
  }

  /** Crash-safe refresh publish: a fresh immutable `v<n>` directory
    * under `root` + the atomic `_current` pointer flip
    * ([[StorageOps.flipPointer]]) — a crashed republish leaves a
    * dangling version dir and the pointer (hence every reader) on the
    * previous complete artifact. Returns the published version dir;
    * resolve the live one with [[currentDir]], retire old versions with
    * [[StorageOps.pruneVersions]]. */
  def publishVersioned(s: SparkSession, corpus: DataFrame,
      root: String): String = {
    val v = StorageOps.nextVersion(s, root)
    val dir = s"$root/v$v"
    publishFrom(s, corpus, dir)
    StorageOps.flipPointer(s, root, s"v$v")
    dir
  }

  /** The live version dir under a [[publishVersioned]] root. */
  def currentDir(s: SparkSession, root: String): String =
    root + "/" + StorageOps.currentVersion(s, root).getOrElse(
      throw new IllegalStateException(s"no published lex index at $root"))

  /** All three meta scalars in ONE 1-row parquet read. */
  def loadMeta(s: SparkSession, indexDir: String): (Long, Long, Int) = {
    val m = s.read.parquet(s"$indexDir/meta").collect()(0)
    (m.getAs[Long]("ndocs"), m.getAs[Long]("sumdl"), m.getAs[Int]("parts"))
  }

  def loadParts(s: SparkSession, indexDir: String): Int = loadMeta(s, indexDir)._3

  def loadNDocs(s: SparkSession, indexDir: String): Long = loadMeta(s, indexDir)._1

  def loadSumDl(s: SparkSession, indexDir: String): Long = loadMeta(s, indexDir)._2

  private[graft] def loadPostingsRaw(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(s"$indexDir/postings")

  private[graft] def loadTermsRaw(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(s"$indexDir/terms")

  def loadDocs(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(s"$indexDir/docs").select("doc_id", "dl")

  /** BM25 top-k against the published artifact for a driver-known query
    * set. Query text normalizes through [[graft.operators.RetrievalOps
    * .queryTokens]] — the driver-side mirror of the tokenizer the index
    * was built with (lowercase \W+ split, empties dropped, DUPLICATES
    * dropped: a repeated query term must not double-count its
    * contribution) — so an uppercase or punctuated query matches the
    * stored lowercase terms instead of silently scoring zero. Result is
    * column-for-column identical to the inline q_bm25_topk scoring of
    * the same corpus: one contribution expression, one ranking, one
    * exact avgdl. */
  def searchBm25(s: SparkSession, indexDir: String,
      queries: Seq[(Int, String)], topK: Int): DataFrame = {
    import s.implicits._
    val qt = queries.flatMap { case (id, text) =>
      graft.operators.RetrievalOps.queryTokens(text).map(id -> _)
    }
    searchBm25Terms(s, indexDir, qt.toDF("query_id", "term"),
      qt.map(_._2).distinct, topK)
  }

  /** The probe core over an arbitrary (query_id, term) frame whose
    * DISTINCT term strings are driver-known (`terms` — the probe
    * contract: query sets are literal or budget-bounded, so this is a
    * query-term-bounded list, never corpus data; it drives the
    * partition pruning). The query_id column's TYPE flows through to
    * the output untouched, so a stream keying queries by a long
    * corpus id needs no driver-side id conversion
    * ([[graft.streaming.RetrievalStream]]). Callers must pass terms
    * already normalized to the index's token domain. */
  def searchBm25Terms(s: SparkSession, indexDir: String, qterms: DataFrame,
      terms: Seq[String], topK: Int): DataFrame = {
    import s.implicits._
    val (nDocs, sumDl, parts) = loadMeta(s, indexDir)
    // one tiny local job: the terms' partition values (term-bounded)
    val tparts = terms.toDF("term")
      .select(tpartOf(col("term"), parts).as("tpart"))
      .distinct().collect().map(_.getLong(0))
    val post = StorageOps.prunedByVals(
        loadPostingsRaw(s, indexDir), "tpart", tparts, parts)
      .select(col("term"), col("doc_id"),
        col("tf").cast("double").as("tf"), col("dl").cast("double").as("dl"))
    val dfT = StorageOps.prunedByVals(
        loadTermsRaw(s, indexDir), "tpart", tparts, parts)
      .select(col("term"), col("df").cast("double").as("df"))
    val scored = post.join(broadcast(qterms), Seq("term"))
      .join(dfT, "term")
      .withColumn("n_docs", lit(nDocs.toDouble))
      .withColumn("avgdl", lit(sumDl.toDouble / nDocs))
      .withColumn("contrib", graft.operators.RetrievalOps.bm25Contrib)
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("contrib")), 4).as("score"))
    graft.operators.RetrievalOps.bm25TopkFrom(scored, topK)
  }
}
