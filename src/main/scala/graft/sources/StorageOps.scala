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
