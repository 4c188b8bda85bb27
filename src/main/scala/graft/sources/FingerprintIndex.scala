package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The published FINGERPRINT index — the multimodal dedup streams'
  * static side ([[graft.streaming.AudioDedupStream]] /
  * [[graft.streaming.VideoDedupStream]] /
  * [[graft.streaming.ImageDedupStream]]) as a real partitioned artifact
  * instead of a caller-held DataFrame, completing the index family:
  * text (DedupIndex), vectors (VectorIndex), and now the fingerprint
  * group tables the codec pipelines publish on each corpus rebuild.
  *
  * Two dataset shapes, one layout discipline (versioned immutable dirs
  * + `_current` pointer, hive-partitioned by a pure key function, one
  * file per partition — the VectorIndex convention):
  *
  *   EXACT-equality probes (audio/video fingerprints):
  *     <dir>/v<n>/groups/  (fp, n, rep)  partitioned by
  *                         fpart = xxhash64(fp) mod parts
  *   BANDED hamming-<=3 probes (image dHash):
  *     <dir>/v<n>/bands/   (band, bv, dhash, n, rep)  — the 4x16-bit
  *                         band explosion of each DISTINCT signature,
  *                         partitioned by ipart = xxhash64(band, bv)
  *                         mod parts (a probe derives the same 4 keys
  *                         per arrival, so banding AND pruning use one
  *                         derivation)
  *   plus <dir>/v<n>/meta/ (ngroups, parts) and <dir>/_current.
  *
  * A small probe batch derives its partition-value set (bounded by
  * `parts`, never the batch size) and reads ONLY those partitions —
  * the same static-isin PartitionFilter cut both sibling indexes carry,
  * pinned in PlanShapeSpec. At 100 TB the group table is one row per
  * DISTINCT fingerprint (far under the corpus); a republish is one
  * batch job and readers swap on the pointer flip.
  */
object FingerprintIndex {

  /** Layout modulus from the distinct-fingerprint count: floor 64, one
    * more partition per ~4M skinny rows, capped at 64k dirs. */
  private[graft] def layoutPartsFor(nGroups: Long): Int =
    math.max(64L, math.min(1L << 16, nGroups / (4L * 1000 * 1000) + 1)).toInt

  private def fpartOf(fp: Column, nParts: Int) =
    pmod(xxhash64(fp), lit(nParts.toLong))
  private def ipartOf(band: Column, bv: Column, nParts: Int) =
    pmod(xxhash64(band, bv), lit(nParts.toLong))

  /** The 4x16-bit band explosion of a 64-bit signature column — the
    * SAME split [[graft.streaming.ImageDedupStream]] probes with
    * (pigeonhole-exact for hamming <= 3). */
  private[graft] def bandsExpr(c: String) =
    s"""transform(sequence(0, 3),
       |          j -> struct(j AS band,
       |                      shiftrightunsigned($c, j * 16) & 65535 AS bv))"""
      .stripMargin

  private def ver(s: SparkSession, dir: String): String =
    StorageOps.currentVersion(s, dir).getOrElse(throw new IllegalStateException(
      s"no published fingerprint index at $dir"))

  def isPublished(s: SparkSession, dir: String): Boolean =
    StorageOps.currentVersion(s, dir).exists { v =>
      StorageOps.isCommitted(s, s"$dir/$v/meta") &&
        (StorageOps.isCommitted(s, s"$dir/$v/groups") ||
          StorageOps.isCommitted(s, s"$dir/$v/bands"))
    }

  /** The active version's (ngroups, parts) in ONE meta read — health
    * surfaces want both plus the drift flag, and the per-field helpers
    * below would each re-read the 1-row parquet (5 driver jobs where one
    * suffices). */
  def loadCounts(s: SparkSession, dir: String): (Long, Int) = {
    val r = s.read.parquet(s"$dir/${ver(s, dir)}/meta").collect()(0)
    (r.getAs[Long]("ngroups"), r.getAs[Int]("parts"))
  }

  /** The active version's layout modulus (q_dedup_index_stats-style
    * health reads want it alongside [[loadNGroups]]). */
  def loadParts(s: SparkSession, dir: String): Int =
    loadCounts(s, dir)._2

  /** The active version's recorded distinct-fingerprint count. */
  def loadNGroups(s: SparkSession, dir: String): Long =
    loadCounts(s, dir)._1

  /** The foreachBatch batchId recorded by the last applied merge — the
    * replay guard's memory. None for a publish (no batch) or an artifact
    * written before the `last_batch` column existed. */
  def lastAppliedBatch(s: SparkSession, dir: String): Option[Long] = {
    val df = s.read.parquet(s"$dir/${ver(s, dir)}/meta")
    if (!df.schema.fieldNames.contains("last_batch")) None
    else Option(df.collect()(0).getAs[Long]("last_batch")).filter(_ >= 0)
  }

  /** The replay-guard decision on a submitted batchId vs the recorded
    * last applied one. foreachBatch batchIds are MONOTONIC, so only two
    * stale shapes exist and they mean different things:
    *
    *   - `== last`: Spark's standard crash-replay of the last
    *     uncommitted trigger — the merge already landed, so the
    *     re-submission is a silent NO-OP (returns true);
    *   - `< last`: an out-of-order re-submission no foreachBatch ever
    *     produces — the caller is confused (a manual retry of an OLDER
    *     batch), and silently applying it would double-count while
    *     silently dropping it could LOSE a batch that was never applied.
    *     Rejected loudly.
    *
    * A fresh (`> last`) or unguarded (None) submission returns false and
    * the merge proceeds. */
  private def replayedBatch(s: SparkSession, dir: String,
      batchId: Option[Long]): Boolean =
    (batchId, lastAppliedBatch(s, dir)) match {
      case (Some(b), Some(last)) if b == last => true
      case (Some(b), Some(last)) if b < last =>
        throw new IllegalArgumentException(
          s"out-of-order batchId $b: the index at $dir already applied " +
            s"batch $last — foreachBatch ids are monotonic, so an older " +
            "re-submission is a caller bug (it was either already merged, " +
            "or skipping it lost data). After a DELIBERATE streaming " +
            "checkpoint reset (ids restart at 0), run " +
            "clearLastAppliedBatch once before restarting the stream")
      case _ => false
    }

  /** CHECKPOINT-RESET RECOVERY (r15 ADVICE): clear the recorded
    * last-applied batchId by publishing the ACTIVE version's data
    * verbatim (file-level hard copies, no decode, no shuffle) under a
    * fresh meta with `last_batch` unset. The replay guard rejects any
    * batchId older than the recorded one — correct for true
    * out-of-order re-submissions, but a DELIBERATE streaming
    * checkpoint reset restarts foreachBatch ids at 0, which would
    * hard-fail every merge until ids climb past the old record. This
    * helper is the sanctioned escape: run it once, after the reset and
    * BEFORE the stream restarts, instead of rebuilding the index from
    * the corpus. The operator owns not double-applying data across the
    * reset (exactly the at-most-once contract an unguarded caller has).
    * Returns false (no new version) when no batchId was recorded. */
  def clearLastAppliedBatch(s: SparkSession, dir: String): Boolean = {
    require(isPublished(s, dir), s"no published fingerprint index at $dir")
    if (lastAppliedBatch(s, dir).isEmpty) return false
    val prev = s"$dir/${ver(s, dir)}"
    val (nGroups, parts) = loadCounts(s, dir)
    val v = s"v${StorageOps.nextVersion(s, dir)}"
    for ((ds, pc) <- Seq("groups" -> "fpart", "bands" -> "ipart"))
      if (StorageOps.isCommitted(s, s"$prev/$ds")) {
        StorageOps.copyCleanParts(s, s"$prev/$ds", s"$dir/$v/$ds", pc,
          Set.empty)
        val marker = new org.apache.hadoop.fs.Path(s"$dir/$v/$ds/_SUCCESS")
        marker.getFileSystem(s.sparkContext.hadoopConfiguration)
          .create(marker, true).close()
      }
    writeMeta(s, s"$dir/$v", nGroups, parts)
    StorageOps.flipPointer(s, dir, v)
    true
  }

  /** True when the distinct-fingerprint count has drifted off the
    * published layout modulus — the signal that the next merge pays the
    * O(index) full rewrite ([[MergeStats.fullRewrite]]), surfaced so an
    * operator can schedule it deliberately (off-peak) instead of
    * discovering it inside an ingest. The DedupIndex.needsRebuild twin;
    * read by q_fingerprint_index_stats. */
  def needsRebuild(s: SparkSession, dir: String): Boolean = {
    val (nGroups, parts) = loadCounts(s, dir)
    needsRebuildFor(nGroups, parts)
  }

  /** The drift predicate on already-read counts — health queries compute
    * it off their single meta read. */
  private[graft] def needsRebuildFor(nGroups: Long, parts: Int): Boolean =
    parts <= 0 || parts != layoutPartsFor(nGroups)

  private def writeMeta(s: SparkSession, vdir: String, nGroups: Long,
      parts: Int, lastBatch: Long = -1L): Unit = {
    import s.implicits._
    Seq((nGroups, parts, lastBatch)).toDF("ngroups", "parts", "last_batch")
      .write.mode("errorifexists").parquet(s"$vdir/meta")
  }

  /** Publish an exact-equality group table (fp, n, rep — extra columns
    * ignored) as the next version. Returns the published group count.
    * `lastBatch` records the foreachBatch batchId when the publish is a
    * merge fallback inside a batch-driven ingest (see [[mergeGroups]]'s
    * replay guard); a plain corpus publish leaves it unset. */
  def publishGroups(s: SparkSession, groups: DataFrame, dir: String,
      lastBatch: Long = -1L): Long = {
    val g = graft.Caching.persist(groups.select("fp", "n", "rep"))
    try {
      val nGroups = g.count()
      val parts = layoutPartsFor(nGroups)
      val v = s"v${StorageOps.nextVersion(s, dir)}"
      g.withColumn("fpart", fpartOf(col("fp"), parts))
        .repartition(parts, col("fpart"))
        .write.partitionBy("fpart")
        .mode("errorifexists").parquet(s"$dir/$v/groups")
      writeMeta(s, s"$dir/$v", nGroups, parts, lastBatch)
      StorageOps.flipPointer(s, dir, v)
      nGroups
    } finally g.unpersist()
  }

  /** Publish a banded signature table from (dhash, n, rep) rows — the
    * image shape: 4 band rows per distinct signature, partitioned by the
    * band key. Returns the published (distinct-signature) count. */
  def publishBandedSigs(s: SparkSession, sigs: DataFrame,
      dir: String, lastBatch: Long = -1L): Long = {
    val g = graft.Caching.persist(sigs.select("dhash", "n", "rep"))
    try {
      val nGroups = g.count()
      val parts = layoutPartsFor(nGroups)
      val v = s"v${StorageOps.nextVersion(s, dir)}"
      g.select(col("dhash"), col("n"), col("rep"),
          explode(expr(bandsExpr("dhash"))).as("b"))
        .select(col("b.band").as("band"), col("b.bv").as("bv"),
          col("dhash"), col("n"), col("rep"))
        .withColumn("ipart", ipartOf(col("band"), col("bv"), parts))
        .repartition(parts, col("ipart"))
        .write.partitionBy("ipart")
        .mode("errorifexists").parquet(s"$dir/$v/bands")
      writeMeta(s, s"$dir/$v", nGroups, parts, lastBatch)
      StorageOps.flipPointer(s, dir, v)
      nGroups
    } finally g.unpersist()
  }

  /** What a [[mergeGroups]]/[[mergeBandedSigs]] actually wrote: partition
    * directories REWRITTEN (they hold batch fingerprints) vs hard-copied
    * verbatim; `fullRewrite` marks the O(index) fallback (layout modulus
    * moved at the merged group count). */
  final case class MergeStats(parts: Int, dirtyParts: Int, copiedParts: Int,
      fullRewrite: Boolean)

  /** Incremental ingest for the exact-equality shape — merge a batch of
    * ARRIVALS (doc_id, fp) into the published group table as the next
    * version: per fingerprint `n` grows by the batch count and `rep`
    * keeps the minimum doc id (the groupBy the batch pipeline publishes,
    * applied incrementally). PARTITION-LEVEL like both sibling indexes:
    * `fpart` is a pure function of fp, so only the partitions holding
    * batch fingerprints change — they rewrite from a PRUNED scan of the
    * live groups full-outer-merged with the batch aggregates; the clean
    * majority hard-copies byte-identically. A layout-modulus change at
    * the merged count falls back to the full rewrite. Merge == rebuild
    * is exact (counts are associative, min is order-free) — spec-pinned
    * against a from-scratch publish of the union. Contract: arrivals are
    * NEW corpus members (the dedup-stream admission shape — exact
    * re-ingests were already routed by the probe); this index keeps
    * group aggregates, not memberships, so a re-submitted doc_id would
    * count twice.
    *
    * REPLAY GUARD: a foreachBatch caller passes the trigger's `batchId`;
    * it is recorded in the published meta, and a merge re-submitting the
    * SAME batchId (Spark's standard crash-replay of the last
    * uncommitted trigger) is a NO-OP returning the live count — without
    * it, a crashed trigger that re-runs maintain would double-count
    * every group the batch touched, permanently and undetectably
    * (unlike DedupIndex's latest-wins merge, group counts are not
    * idempotent). A batchId OLDER than the recorded one is REJECTED, not
    * no-op'd ([[replayedBatch]] — foreachBatch ids are monotonic, so an
    * out-of-order re-submission is a caller bug either way). Callers
    * outside foreachBatch may omit it and own at-most-once submission
    * themselves.
    *
    * An EMPTY arrivals batch returns the live counts WITHOUT publishing:
    * the merged table would be byte-identical, so writing a version for
    * it would only accumulate pointless O(index) clean-copies past the
    * prune budget (every maintain gate keys off dirtyParts == 0 meaning
    * "nothing written" — this early-return makes that implication
    * exact). */
  def mergeGroups(s: SparkSession, dir: String,
      arrivals: DataFrame, batchId: Option[Long] = None): (Long, MergeStats) = {
    require(isPublished(s, dir), s"no published fingerprint index at $dir")
    if (replayedBatch(s, dir, batchId))
      return (loadNGroups(s, dir),
        MergeStats(loadParts(s, dir), 0, 0, fullRewrite = false))
    val prev = s"$dir/${ver(s, dir)}"
    val parts = loadParts(s, dir)
    val b = graft.Caching.persist(arrivals
      .groupBy("fp").agg(count(lit(1)).as("bn"), min("doc_id").as("brep")))
    try {
      val dirtyFp: Array[Long] = b
        .select(fpartOf(col("fp"), parts).as("p"))
        .distinct().collect().map(_.getLong(0))
      if (dirtyFp.isEmpty)
        return (loadNGroups(s, dir),
          MergeStats(parts, 0, 0, fullRewrite = false))
      // merged group count: old + batch fps that are NEW (absent from the
      // dirty partitions' stored groups — a bounded pruned read)
      val oldN = s.read.parquet(s"$prev/meta").collect()(0)
        .getAs[Long]("ngroups")
      val stored = StorageOps.prunedByVals(loadGroupsRaw(s, dir), "fpart",
        dirtyFp, parts)
      val newFps = b.join(stored.select("fp"), Seq("fp"), "left_anti").count()
      val n2 = oldN + newFps
      if (layoutPartsFor(n2) != parts) {
        // O(index) fallback: merged table rewritten at the new modulus
        val merged = loadGroups(s, dir)
          .join(b, Seq("fp"), "full_outer")
          .select(col("fp"),
            (coalesce(col("n"), lit(0L)) + coalesce(col("bn"), lit(0L)))
              .as("n"),
            least(col("rep"), col("brep")).as("rep"))
        publishGroups(s, merged, dir, batchId.getOrElse(-1L))
        val p2 = loadParts(s, dir)
        return (n2, MergeStats(p2, p2, 0, fullRewrite = true))
      }
      val dirtyRows = stored.select("fp", "n", "rep")
        .join(b, Seq("fp"), "full_outer")
        .select(col("fp"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("bn"), lit(0L)))
            .as("n"),
          least(col("rep"), col("brep")).as("rep"))
        .withColumn("fpart", fpartOf(col("fp"), parts))
      val v = s"v${StorageOps.nextVersion(s, dir)}"
      dirtyRows.repartition(math.max(1, dirtyFp.length), col("fpart"))
        .write.partitionBy("fpart")
        .mode("errorifexists").parquet(s"$dir/$v/groups")
      val copied = StorageOps.copyCleanParts(s, s"$prev/groups",
        s"$dir/$v/groups", "fpart", dirtyFp.toSet)
      writeMeta(s, s"$dir/$v", n2, parts, batchId.getOrElse(-1L))
      StorageOps.flipPointer(s, dir, v)
      (n2, MergeStats(parts, dirtyFp.length, copied, fullRewrite = false))
    } finally b.unpersist()
  }

  /** Incremental ingest for the banded shape — merge arrivals
    * (doc_id, dhash) into the published banded table: an affected
    * signature's FOUR band rows (all pure functions of the dhash)
    * refresh together, so the dirty `ipart` set derives from the batch's
    * distinct signatures alone; clean partitions hard-copy. Fallback,
    * merge == rebuild contract, the `batchId` REPLAY GUARD (equal
    * replays no-op, older re-submissions reject), and the empty-batch
    * no-publish early-return as [[mergeGroups]]. */
  def mergeBandedSigs(s: SparkSession, dir: String,
      arrivals: DataFrame, batchId: Option[Long] = None): (Long, MergeStats) = {
    require(isPublished(s, dir), s"no published fingerprint index at $dir")
    if (replayedBatch(s, dir, batchId))
      return (loadNGroups(s, dir),
        MergeStats(loadParts(s, dir), 0, 0, fullRewrite = false))
    val prev = s"$dir/${ver(s, dir)}"
    val parts = loadParts(s, dir)
    val b = graft.Caching.persist(arrivals
      .groupBy("dhash").agg(count(lit(1)).as("bn"), min("doc_id").as("brep")))
    try {
      val dirtyIp: Array[Long] = b
        .select(col("dhash"), explode(expr(bandsExpr("dhash"))).as("k"))
        .select(ipartOf(col("k.band"), col("k.bv"), parts).as("p"))
        .distinct().collect().map(_.getLong(0))
      if (dirtyIp.isEmpty)
        return (loadNGroups(s, dir),
          MergeStats(parts, 0, 0, fullRewrite = false))
      val oldN = s.read.parquet(s"$prev/meta").collect()(0)
        .getAs[Long]("ngroups")
      val stored = StorageOps.prunedByVals(loadBandsRaw(s, dir), "ipart",
        dirtyIp, parts)
      // a signature's 4 band rows live in the dirty partitions by
      // construction, so the distinct-dhash read here is complete
      val newSigs = b.join(stored.select("dhash").distinct(),
        Seq("dhash"), "left_anti").count()
      val n2 = oldN + newSigs
      if (layoutPartsFor(n2) != parts) {
        val merged = loadBands(s, dir)
          .select("dhash", "n", "rep").distinct()
          .join(b, Seq("dhash"), "full_outer")
          .select(col("dhash"),
            (coalesce(col("n"), lit(0L)) + coalesce(col("bn"), lit(0L)))
              .as("n"),
            least(col("rep"), col("brep")).as("rep"))
        publishBandedSigs(s, merged, dir, batchId.getOrElse(-1L))
        val p2 = loadParts(s, dir)
        return (n2, MergeStats(p2, p2, 0, fullRewrite = true))
      }
      // refreshed rows for the BATCH signatures only (all 4 band rows —
      // their keys define the dirty set, so every refreshed row lands in
      // a dirty partition by construction); a bystander signature that
      // merely shares a dirty partition keeps its stored rows verbatim
      // through `untouched` (its clean-partition rows hard-copy), so no
      // row is written twice. least() skips nulls, so a brand-new
      // signature takes the batch rep and an updated one the minimum.
      val affected = b.join(
          stored.select("dhash", "n", "rep").distinct(),
          Seq("dhash"), "left_outer")
        .select(col("dhash"),
          (coalesce(col("n"), lit(0L)) + col("bn")).as("n"),
          least(col("rep"), col("brep")).as("rep"))
      val refreshed = affected
        .select(col("dhash"), col("n"), col("rep"),
          explode(expr(bandsExpr("dhash"))).as("k"))
        .select(col("k.band").as("band"), col("k.bv").as("bv"),
          col("dhash"), col("n"), col("rep"))
        .withColumn("ipart", ipartOf(col("band"), col("bv"), parts))
      val untouched = stored
        .join(b.select("dhash"), Seq("dhash"), "left_anti")
        .select(col("band"), col("bv"), col("dhash"), col("n"), col("rep"))
        .withColumn("ipart", ipartOf(col("band"), col("bv"), parts))
      val v = s"v${StorageOps.nextVersion(s, dir)}"
      refreshed.unionByName(untouched)
        .repartition(math.max(1, dirtyIp.length), col("ipart"))
        .write.partitionBy("ipart")
        .mode("errorifexists").parquet(s"$dir/$v/bands")
      val copied = StorageOps.copyCleanParts(s, s"$prev/bands",
        s"$dir/$v/bands", "ipart", dirtyIp.toSet)
      writeMeta(s, s"$dir/$v", n2, parts, batchId.getOrElse(-1L))
      StorageOps.flipPointer(s, dir, v)
      (n2, MergeStats(parts, dirtyIp.length, copied, fullRewrite = false))
    } finally b.unpersist()
  }

  /** Drop all non-active versions beyond the newest `keep` —
    * [[StorageOps.pruneVersions]] applied to this layout. */
  def pruneVersions(s: SparkSession, dir: String, keep: Int): Seq[String] =
    StorageOps.pruneVersions(s, dir, keep)

  /** Small-file compaction hook in the [[maintain]] cycle — the
    * [[DedupIndex.compactIfFragmented]]/VectorIndex twin, completing the
    * family's lifecycle symmetry: if the active version's partitioned
    * dataset holds more than one data file in any partition directory,
    * republish it compacted (same rows, same recorded count and
    * `last_batch`, the canonical one-file-per-partition layout) as the
    * next version and flip. This library's writers keep the invariant by
    * construction (dirty writes repartition BY the partition column,
    * clean partitions hard-copy single files); the hook covers
    * foreign/legacy artifacts. COST, stated: proving a version healthy
    * lists every partition directory (up to the 64k layout cap — the
    * same per-maintain price the sibling indexes pay). On an object
    * store where per-trigger LIST calls matter, run this hook on its
    * own hygiene cadence instead of inside every [[maintain]];
    * maintain already skips it when a replayed batch wrote nothing.
    * Returns whether a compaction version was published. */
  def compactIfFragmented(s: SparkSession, dir: String): Boolean = {
    val v = ver(s, dir)
    val banded = StorageOps.isCommitted(s, s"$dir/$v/bands")
    val ds = if (banded) "bands" else "groups"
    if (!fragmented(s, s"$dir/$v/$ds")) return false
    val lastBatch = lastAppliedBatch(s, dir).getOrElse(-1L)
    if (banded)
      publishBandedSigs(s,
        loadBands(s, dir).select("dhash", "n", "rep").distinct(),
        dir, lastBatch)
    else publishGroups(s, loadGroups(s, dir), dir, lastBatch)
    true
  }

  /** True iff any partition directory of the dataset holds more than one
    * data file (one FS listing, no data read). */
  private def fragmented(s: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      st.isDirectory && st.getPath.getName.contains("=") &&
        fs.listStatus(st.getPath).count(f => f.isFile &&
          !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith(".")) > 1
    }
  }

  /** One production ingest cycle — the family's maintain shape
    * ([[VectorIndex.maintain]]/[[DedupIndex.maintain]]) on the
    * fingerprint artifact: merge the arrivals in (partition-level; a
    * modulus drift takes the full rewrite inside the merge, which IS
    * this index's rebuild — nothing retrains), run the
    * [[compactIfFragmented]] hygiene hook, then prune non-active
    * versions to `keep`. `banded` selects the image shape
    * ([[mergeBandedSigs]] over (doc_id, dhash)) vs the exact shape
    * ([[mergeGroups]] over (doc_id, fp)). Returns the merged group
    * count and the [[MergeStats]].
    *
    * A foreachBatch ingest pipeline MUST pass its trigger's `batchId`:
    * foreachBatch's standard failure mode is batch replay, and this
    * index's group counts are not idempotent under re-merge — the
    * recorded batchId turns a replayed trigger into a no-op (see
    * [[mergeGroups]]'s replay-guard contract). */
  def maintain(s: SparkSession, dir: String, arrivals: DataFrame,
      banded: Boolean = false, keep: Int = 2,
      batchId: Option[Long] = None): (Long, MergeStats) = {
    val out =
      if (banded) mergeBandedSigs(s, dir, arrivals, batchId)
      else mergeGroups(s, dir, arrivals, batchId)
    // a replay no-op or an empty batch wrote nothing (the merges
    // early-return before publishing in both cases, so dirtyParts == 0
    // really means no new version exists): skip the compaction probe's
    // per-partition listing and the prune listing entirely
    val (_, st) = out
    if (st.dirtyParts > 0 || st.fullRewrite) {
      compactIfFragmented(s, dir)
      pruneVersions(s, dir, keep)
    }
    out
  }

  /** The active group table, reader-facing schema (fp, n, rep). */
  def loadGroups(s: SparkSession, dir: String): DataFrame =
    loadGroupsRaw(s, dir).select("fp", "n", "rep")

  private def loadGroupsRaw(s: SparkSession, dir: String): DataFrame =
    graft.Chaos.gate(s, s.read.parquet(s"$dir/${ver(s, dir)}/groups"))

  /** The active banded signature table (band, bv, dhash, n, rep). */
  def loadBands(s: SparkSession, dir: String): DataFrame =
    loadBandsRaw(s, dir).select("band", "bv", "dhash", "n", "rep")

  private def loadBandsRaw(s: SparkSession, dir: String): DataFrame =
    graft.Chaos.gate(s, s.read.parquet(s"$dir/${ver(s, dir)}/bands"))

  /** The group table pruned to the partitions a probe's fingerprint set
    * touches: derives `fpart` values from `fps` (one fp column; the
    * distinct-collect is bounded by the layout modulus) and plants the
    * static isin — [[StorageOps.prunedByVals]], the shared filter. */
  def prunedGroups(s: SparkSession, dir: String, fps: DataFrame): DataFrame = {
    val nParts = loadParts(s, dir)
    val parts = fps
      .select(fpartOf(col(fps.columns.head), nParts).as("p"))
      .distinct().collect().map(_.getLong(0))
    StorageOps.prunedByVals(loadGroupsRaw(s, dir), "fpart", parts, nParts)
      .select("fp", "n", "rep")
  }

  /** The banded table pruned to the partitions a probe's band-key set
    * touches. `keys`: (band, bv) rows. */
  def prunedBands(s: SparkSession, dir: String, keys: DataFrame): DataFrame = {
    val nParts = loadParts(s, dir)
    val parts = keys
      .select(ipartOf(col("band"), col("bv"), nParts).as("p"))
      .distinct().collect().map(_.getLong(0))
    StorageOps.prunedByVals(loadBandsRaw(s, dir), "ipart", parts, nParts)
      .select("band", "bv", "dhash", "n", "rep")
  }
}
