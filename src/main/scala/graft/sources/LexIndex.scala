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
  * Lifecycle scope, stated: publish + probe (+ stats). The sibling
  * families' versioned-root machinery (pointer-flip publish,
  * partition-level merge, torn-version recovery) applies to this layout
  * unchanged — postings partition by a pure key function like the dedup
  * bands — and is deliberately not duplicated here until the retrieval
  * family needs incremental ingest.
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

  /** Build and publish the index for the corpus at `corpusDir` (the
    * republish cycle overwrites). Returns (postingRows, termRows). */
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
      (s.read.parquet(s"$indexDir/postings").count(),
        s.read.parquet(s"$indexDir/terms").count())
    } finally dl.unpersist()
  }

  def loadParts(s: SparkSession, indexDir: String): Int =
    s.read.parquet(s"$indexDir/meta").collect()(0).getAs[Int]("parts")

  def loadNDocs(s: SparkSession, indexDir: String): Long =
    s.read.parquet(s"$indexDir/meta").collect()(0).getAs[Long]("ndocs")

  def loadSumDl(s: SparkSession, indexDir: String): Long =
    s.read.parquet(s"$indexDir/meta").collect()(0).getAs[Long]("sumdl")

  private[graft] def loadPostingsRaw(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(s"$indexDir/postings")

  private[graft] def loadTermsRaw(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(s"$indexDir/terms")

  def loadDocs(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(s"$indexDir/docs").select("doc_id", "dl")

  /** BM25 top-k against the published artifact for a driver-known query
    * set (the probe contract — queries are literal or budget-bounded, so
    * the partition-value derivation below collects a query-term-bounded
    * set, never corpus data). Result is column-for-column identical to
    * the inline q_bm25_topk scoring of the same corpus: one contribution
    * expression, one ranking, one exact avgdl. */
  def searchBm25(s: SparkSession, indexDir: String,
      queries: Seq[(Int, String)], topK: Int): DataFrame = {
    import s.implicits._
    val qt = queries.flatMap { case (id, text) => text.split(" ").map(id -> _) }
    val qterms = qt.toDF("query_id", "term")
    val parts = loadParts(s, indexDir)
    // tiny job: the query terms' partition values (bounded by the
    // driver-known query-term count)
    val tparts = qterms.select(tpartOf(col("term"), parts).as("tpart"))
      .distinct().collect().map(_.getLong(0))
    val meta = s.read.parquet(s"$indexDir/meta").collect()(0)
    val (nDocs, sumDl) =
      (meta.getAs[Long]("ndocs"), meta.getAs[Long]("sumdl"))
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
