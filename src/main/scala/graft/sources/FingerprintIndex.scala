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

  /** The publish-default band family: contiguous 4×16-bit chunks. */
  val BandFamily = 1

  /** The PRECISION-ESCALATION ladder for the banded (dHash) shape:
    * family f ≥ 2 permutes bit positions by π(k) = k·m_f mod 64 (m_f
    * odd ⇒ π bijective ⇒ still a partition into four disjoint 16-bit
    * bands, so the pigeonhole guarantee — hamming ≤ 3 collides in ≥ 1
    * band — holds at EVERY family). What changes is which bits share a
    * band: dHash bits are spatially contiguous gradients, so images
    * with constant regions (borders, letterboxing, flat sky) agree on
    * RUNS of adjacent bits and flood a contiguous chunk's bucket with
    * pairs that are nowhere near hamming ≤ 3 overall — the precision
    * collapse the in-gate probe measures. A scatter family spreads any
    * 16 agreeing contiguous bits ~4 per band, leaving every band ~12
    * independent bits, and the flood's buckets disperse. One multiplier
    * per rung so repeated escalations keep moving the partition. */
  private val ScatterMults = Map(2 -> 21, 3 -> 13, 4 -> 37, 5 -> 45)

  /** Family `fam`'s bit-permutation multiplier — exposed so the
    * escalated health query's DuckDB oracle can interpolate the SAME
    * constant its band replay needs ([[graft.operators.MultiModalOps]];
    * the two derivations must never fork). */
  private[graft] def scatterMult(fam: Int): Int =
    ScatterMults.getOrElse(fam, throw new IllegalArgumentException(
      s"no scatter family $fam (valid: 2..$MaxFamily)"))

  /** Deepest supported band family ([[ScatterMults]] rungs + the
    * contiguous family 1). */
  val MaxFamily = 5

  /** The 4-band explosion of a 64-bit signature column at band family
    * `fam` — the SAME split [[graft.streaming.ImageDedupStream]] probes
    * with (pigeonhole-exact for hamming <= 3 at every family). Family 1
    * keeps the contiguous shift-mask fast path; scatter families pay a
    * 64-step fold per signature — probe batches and publishes, never a
    * per-row hot loop. */
  private[graft] def bandsExpr(c: String, fam: Int = BandFamily): String =
    if (fam == BandFamily)
      s"""transform(sequence(0, 3),
         |          j -> struct(j AS band,
         |                      shiftrightunsigned($c, j * 16) & 65535 AS bv))"""
        .stripMargin
    else {
      val m = ScatterMults.getOrElse(fam, throw new IllegalArgumentException(
        s"band family must be in [1, $MaxFamily], got $fam"))
      s"""transform(sequence(0, 3),
         |  j -> struct(j AS band,
         |    aggregate(filter(sequence(0, 63),
         |                     k -> ((k * $m) % 64) DIV 16 = j),
         |              CAST(0 AS BIGINT),
         |              (acc, k) -> acc + shiftleft(
         |                shiftrightunsigned($c, k) & 1,
         |                ((k * $m) % 64) % 16)) AS bv))""".stripMargin
    }

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
    val fam = loadBandFamily(s, dir)
    val v = s"v${StorageOps.nextVersion(s, dir)}"
    for ((ds, pc) <- Seq("groups" -> "fpart", "bands" -> "ipart"))
      if (StorageOps.isCommitted(s, s"$prev/$ds")) {
        StorageOps.copyCleanParts(s, s"$prev/$ds", s"$dir/$v/$ds", pc,
          Set.empty)
        val marker = new org.apache.hadoop.fs.Path(s"$dir/$v/$ds/_SUCCESS")
        marker.getFileSystem(s.sparkContext.hadoopConfiguration)
          .create(marker, true).close()
      }
    // last_batch intentionally unset; the band family copies verbatim
    writeMeta(s, s"$dir/$v", nGroups, parts, fam = fam)
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
      parts: Int, lastBatch: Long = -1L,
      fam: Int = BandFamily): Unit = {
    import s.implicits._
    Seq((nGroups, parts, lastBatch, fam))
      .toDF("ngroups", "parts", "last_batch", "bandfam")
      .write.mode("errorifexists").parquet(s"$vdir/meta")
  }

  /** The active version's recorded band family; 1 for any artifact
    * written before the field existed (all of those are contiguous-
    * banded) and for the exact-equality (groups) shape, which has no
    * banding. Readers of the banded shape MUST derive their probe keys
    * at this family ([[bandsExpr]]) — family-mismatched keys silently
    * match nothing. */
  def loadBandFamily(s: SparkSession, dir: String): Int = {
    val df = s.read.parquet(s"$dir/${ver(s, dir)}/meta")
    if (!df.schema.fieldNames.contains("bandfam")) BandFamily
    else df.collect()(0).getAs[Int]("bandfam")
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
    * band key, derived at band family `fam` (default: contiguous; a
    * precision escalation republishes at the next scatter rung).
    * Returns the published (distinct-signature) count. */
  def publishBandedSigs(s: SparkSession, sigs: DataFrame,
      dir: String, lastBatch: Long = -1L,
      fam: Int = BandFamily): Long = {
    val g = graft.Caching.persist(sigs.select("dhash", "n", "rep"))
    try {
      val nGroups = g.count()
      val parts = layoutPartsFor(nGroups)
      val v = s"v${StorageOps.nextVersion(s, dir)}"
      g.select(col("dhash"), col("n"), col("rep"),
          explode(expr(bandsExpr("dhash", fam))).as("b"))
        .select(col("b.band").as("band"), col("b.bv").as("bv"),
          col("dhash"), col("n"), col("rep"))
        .withColumn("ipart", ipartOf(col("band"), col("bv"), parts))
        .repartition(parts, col("ipart"))
        .write.partitionBy("ipart")
        .mode("errorifexists").parquet(s"$dir/$v/bands")
      writeMeta(s, s"$dir/$v", nGroups, parts, lastBatch, fam)
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
    // every band derivation in this merge runs at the ARTIFACT's
    // recorded family — a batch banded at the publish default against
    // an escalated artifact would land its rows in partitions no probe
    // at the recorded family ever reads
    val fam = loadBandFamily(s, dir)
    val b = graft.Caching.persist(arrivals
      .groupBy("dhash").agg(count(lit(1)).as("bn"), min("doc_id").as("brep")))
    try {
      val dirtyIp: Array[Long] = b
        .select(col("dhash"), explode(expr(bandsExpr("dhash", fam))).as("k"))
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
        publishBandedSigs(s, merged, dir, batchId.getOrElse(-1L), fam)
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
          explode(expr(bandsExpr("dhash", fam))).as("k"))
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
      writeMeta(s, s"$dir/$v", n2, parts, batchId.getOrElse(-1L), fam)
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
        dir, lastBatch, loadBandFamily(s, dir))
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
      batchId: Option[Long] = None,
      precisionProbe: Option[PrecisionProbe] = None): (Long, MergeStats) = {
    require(precisionProbe.isEmpty || banded,
      "precision probe armed on the exact-equality (groups) shape: " +
        "exact probes verify by definition (precision is identically " +
        "1), so there is nothing to gate — arm it on banded ingests")
    val out =
      if (banded) mergeBandedSigs(s, dir, arrivals, batchId)
      else mergeGroups(s, dir, arrivals, batchId)
    // a replay no-op or an empty batch wrote nothing (the merges
    // early-return before publishing in both cases, so dirtyParts == 0
    // really means no new version exists): skip the compaction probe's
    // per-partition listing, the prune listing, AND the precision gate
    // (nothing changed, so no reading moved) entirely
    val (_, st) = out
    if (st.dirtyParts > 0 || st.fullRewrite) {
      // PRECISION GATE (r16 verdict #2, the [[DedupIndex.maintain]] /
      // VectorIndex recall-gate shape): measure the merged artifact's
      // banded-candidate precision from its own stored bands; a floor
      // trip republishes at the next SCATTER family ([[ScatterMults]] —
      // hamming≤3 recall pinned by pigeonhole at every family) and
      // re-probes once, surfacing per caller policy if still below.
      precisionProbe.foreach { p =>
        if (probePrecision(s, dir).below(p.floor)) {
          val next = escalateBandFamily(s, dir)
          val after = probePrecision(s, dir)
          if (after.below(p.floor)) {
            val msg = s"precision floor ${p.floor} not restored by the " +
              s"band-family escalation at $dir: family $next measures " +
              s"${after.precision.getOrElse(Double.NaN)} over " +
              s"${after.candidates} probe candidates — escalate again " +
              "next cycle, widen the fingerprint, or lower the floor"
            if (p.failUnrecovered) throw new IllegalStateException(msg)
            else log.warn(msg)
          }
        }
      }
      compactIfFragmented(s, dir)
      pruneVersions(s, dir, keep)
    }
    out
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Banded-candidate PRECISION of the active version, measured from
    * the stored band table itself (keys are stored AT the artifact's
    * family, so the read is family-agnostic): a deterministic
    * signature sample (phash over the rep doc id, ~500 sigs however
    * large the index) joins the band table on its own keys; candidates
    * are distinct foreign signatures sharing a band; verification is
    * the production hamming ≤ 3 gate. The same statistic
    * q_fingerprint_index_stats publishes into the correctness gate —
    * this entry is the engine-side read the maintain gate acts on.
    * The aggregates are computed EAGERLY so the candidate frame's
    * persist releases before returning (r16 ADVICE). */
  def probePrecision(s: SparkSession, dir: String): ProbeStats = {
    val ng = loadNGroups(s, dir)
    val probeMod = math.max(1L, ng / 500)
    val bands = loadBands(s, dir)
    val probe = bands.filter(graft.Tables.phash(col("rep")) % probeMod === 0)
    val cand = graft.Caching.persist(
      probe.alias("p").join(bands.alias("c"),
          col("p.band") === col("c.band") && col("p.bv") === col("c.bv") &&
            col("p.dhash") =!= col("c.dhash"))
        .select(col("p.dhash").as("pd"), col("c.dhash").as("cd"))
        .distinct())
    try {
      val probeSigs = probe.select(countDistinct("dhash"))
        .collect()(0).getLong(0)
      val r = cand.agg(
        count(lit(1)).as("c"),
        coalesce(sum(expr("CAST(bit_count(pd ^ cd) <= 3 AS BIGINT)")),
          lit(0L)).as("v")).collect()(0)
      ProbeStats(probeSigs, r.getLong(0), r.getLong(1))
    } finally cand.unpersist()
  }

  /** The PRECISION-FLOOR ACTUATOR: republish the active version's
    * signature table re-banded at the next scatter family — same
    * (dhash, n, rep) rows (recovered by the distinct fold), same
    * recorded last_batch, bands re-derived at π(k) = k·m mod 64. The
    * hamming ≤ 3 guarantee is pigeonhole over ANY partition of the 64
    * bits into four disjoint 16-bit bands, so escalation never pays
    * recall. Exact-equality artifacts refuse (no banding); an
    * exhausted ladder fails loudly. Returns the new family. */
  def escalateBandFamily(s: SparkSession, dir: String): Int = {
    require(isPublished(s, dir), s"no published fingerprint index at $dir")
    require(StorageOps.isCommitted(s, s"$dir/${ver(s, dir)}/bands"),
      s"cannot escalate the exact-equality (groups) shape at $dir: " +
        "it has no banding")
    val fam = loadBandFamily(s, dir)
    val next = fam + 1
    require(next <= MaxFamily,
      s"band-family ladder exhausted at $dir: family $fam is the last " +
        "scatter rung — a still-tripped precision floor now needs a " +
        "wider fingerprint or a lower floor")
    publishBandedSigs(s,
      loadBands(s, dir).select("dhash", "n", "rep").distinct(),
      dir, lastAppliedBatch(s, dir).getOrElse(-1L), next)
    next
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
