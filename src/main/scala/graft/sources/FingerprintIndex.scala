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

  private def loadParts(s: SparkSession, dir: String): Int =
    s.read.parquet(s"$dir/${ver(s, dir)}/meta")
      .collect()(0).getAs[Int]("parts")

  private def writeMeta(s: SparkSession, vdir: String, nGroups: Long,
      parts: Int): Unit = {
    import s.implicits._
    Seq((nGroups, parts)).toDF("ngroups", "parts")
      .write.mode("errorifexists").parquet(s"$vdir/meta")
  }

  /** Publish an exact-equality group table (fp, n, rep — extra columns
    * ignored) as the next version. Returns the published group count. */
  def publishGroups(s: SparkSession, groups: DataFrame, dir: String): Long = {
    val g = graft.Caching.persist(groups.select("fp", "n", "rep"))
    try {
      val nGroups = g.count()
      val parts = layoutPartsFor(nGroups)
      val v = s"v${StorageOps.nextVersion(s, dir)}"
      g.withColumn("fpart", fpartOf(col("fp"), parts))
        .repartition(parts, col("fpart"))
        .write.partitionBy("fpart")
        .mode("errorifexists").parquet(s"$dir/$v/groups")
      writeMeta(s, s"$dir/$v", nGroups, parts)
      StorageOps.flipPointer(s, dir, v)
      nGroups
    } finally g.unpersist()
  }

  /** Publish a banded signature table from (dhash, n, rep) rows — the
    * image shape: 4 band rows per distinct signature, partitioned by the
    * band key. Returns the published (distinct-signature) count. */
  def publishBandedSigs(s: SparkSession, sigs: DataFrame,
      dir: String): Long = {
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
      writeMeta(s, s"$dir/$v", nGroups, parts)
      StorageOps.flipPointer(s, dir, v)
      nGroups
    } finally g.unpersist()
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
