package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage layer mirroring the reference's data-plane file lifecycle:
  *
  *  - partitioned sink with atomic commit: the reference appends per
  *    partition to `.dat` files and renames to `_final` on finalize
  *    (ShufflePartitionUnsafeWriter.java:204-225), with a driver-written
  *    `_SUCCEED` marker (Ors2SparkListener.scala:66-92). Spark's file
  *    committer provides exactly these semantics (task temp dirs →
  *    commit rename → `_SUCCESS` marker), so the sink is a thin,
  *    correctly-configured write.
  *  - retention cleanup: the master deletes app dirs older than the
  *    retention window (ShuffleDataDirClear.java:1-96, 8h default).
  *
  * Scale notes: `partitionBy` creates one directory per key — suitable for
  * low-cardinality partition keys (date, tenant); high-cardinality keys
  * must bucket instead. Cleanup lists only the top-level dirs (one FS call
  * per app dir, as the reference does); actual deletes fan out server-side
  * on HDFS-like stores.
  */
object StorageOps {

  /** Write a DataFrame as a partitioned parquet dataset with atomic commit
    * + `_SUCCESS` marker (the reference's finalize + `_SUCCEED`). */
  def writePartitioned(df: DataFrame, outDir: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(outDir)

  /** True iff the dataset at `dir` was committed (marker present) —
    * the reader-side wait condition (ShuffleDataExecutor.java:119-138). */
  def isCommitted(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Small-file compaction: rewrite the parquet dataset at `dir` so data
    * files approach `targetBytes` each — the table-layout counterpart of
    * the problem the reference engine solves at the shuffle layer (many
    * tiny per-map blocks merged into partition-grouped sequential files;
    * that design goal is the whole point of its worker data plane).
    * Sizing uses the dataset's actual on-disk bytes from an FS listing —
    * no data scan; then ONE round-robin repartition and an atomic-commit
    * rewrite via a temp dir + rename (reading and overwriting the same
    * path in one job would clobber its own input). The temp-dir swap
    * mirrors the reference's finalize-rename; a production lake would
    * flip a manifest/view instead for readers-during-compaction.
    * Returns (dataFilesBefore, dataFilesAfter). */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new Path(dir)
    val fs: FileSystem = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles = fs.listStatus(p)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val before = dataFiles
    val totalBytes = before.map(_.getLen).sum
    val parts = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val tmp = new Path(dir + "__compact_tmp")
    spark.read.parquet(dir).repartition(parts)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(p, true)
    fs.rename(tmp, p)
    (before.length, dataFiles.length)
  }

  /** Range-sorted layout writer: range-partition on `key` then sort
    * within each partition, so every output file covers a DISJOINT key
    * range. This is the table-layout lever for range-predicated scans at
    * 100 TB: parquet footers carry per-file (and per-row-group) min/max
    * for the sort key, and a `key BETWEEN a AND b` scan prunes every
    * file whose range misses — the same read-amplification cut the
    * reference engineers by grouping partition data into sequential
    * files (its workers exist to make one reducer's reads contiguous;
    * a sorted lake layout makes one RANGE's reads contiguous).
    * Deterministic caveat stated: repartitionByRange samples to pick
    * bounds, so file BOUNDARIES may vary run to run — the disjointness
    * contract (what pruning relies on) holds regardless and is what
    * StorageAndAggSpec pins. */
  def writeRangeSorted(df: DataFrame, outDir: String, key: String,
      partitions: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(partitions, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(outDir)
  }

  /** Delete child dirs of `root` whose mtime is older than retentionMs
    * (ShuffleDataDirClear.java semantics); returns the deleted paths. */
  def cleanExpired(spark: SparkSession, root: String,
      retentionMs: Long, nowMs: Long): Seq[String] = {
    val rootPath = new Path(root)
    val fs: FileSystem =
      rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return Seq.empty
    val expired = fs.listStatus(rootPath)
      .filter(_.isDirectory) // contract: child DIRS only (manifests survive)
      .filter(st => nowMs - st.getModificationTime > retentionMs)
    // report only what was actually deleted (delete can fail/race)
    expired.filter(st => fs.delete(st.getPath, true))
      .map(_.getPath.toString).toSeq
  }
}
