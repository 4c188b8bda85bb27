package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobContext, OutputCommitter, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.output.{PathOutputCommitter, PathOutputCommitterFactory}
import org.apache.spark.sql.execution.datasources.SQLHadoopMapReduceCommitProtocol

/** Scheme-routed commit protocol — the piece that makes
  * [[StorageOps.objectStoreCommitterConf]]'s factory key LOAD-BEARING.
  *
  * Spark's default SQL commit protocol always goes through the Hadoop
  * `FileOutputCommitter` family, whose task/job commit is RENAME — cheap
  * and atomic on POSIX/HDFS, copy+delete (O(bytes), non-atomic) on object
  * stores. The reference hides exactly this dispatch behind one FS
  * interface (`FileSystem.java:30-128`: `file`/`hdfs`/`cfs`/`alluxio`
  * resolved per scheme) and its whole data plane is commit-by-rename
  * (`ShufflePartitionUnsafeWriter.java:204-225`). This protocol is the
  * object-store-safe twin: for destination schemes that have a committer
  * factory registered under Hadoop's standard
  * `mapreduce.outputcommitter.factory.scheme.<scheme>` key, commits route
  * through that factory's [[PathOutputCommitter]] (for `s3a://` that is
  * the S3A "magic" committer — multipart uploads materialized at job
  * commit, zero renames); for every other scheme it falls through to
  * Spark's stock behavior, byte-for-byte. This mirrors what
  * `spark-hadoop-cloud`'s `PathOutputCommitProtocol` does, without
  * requiring that module on the classpath.
  *
  * Write-path note: for a non-`FileOutputCommitter` committer, Spark's
  * `newTaskTempFile` resolves work files DIRECTLY under the destination
  * path — i.e. task output is a PUT to its final key and the committer
  * controls visibility — which is precisely the object-store write
  * discipline (magic committer: invisible in-flight multipart; direct
  * committer: last-writer-wins PUT).
  */
class SchemeRoutedCommitProtocol(jobId: String, dest: String,
    dynamicPartitionOverwrite: Boolean)
  extends SQLHadoopMapReduceCommitProtocol(jobId, dest, dynamicPartitionOverwrite) {

  override def setupCommitter(context: TaskAttemptContext): OutputCommitter = {
    val out = new Path(dest)
    val scheme = Option(out.toUri.getScheme).getOrElse("file")
    val factoryKey =
      PathOutputCommitterFactory.COMMITTER_FACTORY_SCHEME + "." + scheme
    if (context.getConfiguration.get(factoryKey) != null)
      // honors mapreduce.outputcommitter.factory.scheme.<scheme>
      PathOutputCommitterFactory.createCommitter(out, context)
    else super.setupCommitter(context)
  }
}

/** Rename-free "direct PUT" committer: tasks write their files straight
  * to the final destination keys; task commit is a no-op; job commit
  * writes the `_SUCCESS` marker. No rename is ever issued — the shape of
  * committing on a store where every object is immutable-once-PUT.
  *
  * Honest scope note: without the store-native in-flight-upload trick
  * (S3A magic committer), two speculative attempts of one task PUT the
  * same key — last-writer-wins, safe only when speculation is off and
  * tasks are deterministic (both true for this engine's pipelines and
  * for publish-then-flip datasets, whose visibility is controlled by the
  * `_current` pointer, not by the committer at all). Production S3A
  * clusters should register `S3ACommitterFactory` instead; this committer
  * exists so the scheme-routing and versioned-publish paths RUN end-to-end
  * on any store — including rename-forbidding test stores.
  */
class DirectPutCommitter(out: Path, context: TaskAttemptContext)
  extends PathOutputCommitter(out, context) {

  override def getOutputPath: Path = out
  // work path == output path: task files are born at their final keys
  override def getWorkPath: Path = out

  override def setupJob(jobContext: JobContext): Unit = {
    val fs = out.getFileSystem(jobContext.getConfiguration)
    fs.mkdirs(out)
  }

  override def setupTask(taskContext: TaskAttemptContext): Unit = ()
  override def needsTaskCommit(taskContext: TaskAttemptContext): Boolean = false
  override def commitTask(taskContext: TaskAttemptContext): Unit = ()
  override def abortTask(taskContext: TaskAttemptContext): Unit = ()

  override def commitJob(jobContext: JobContext): Unit = {
    val conf = jobContext.getConfiguration
    if (conf.getBoolean("mapreduce.fileoutputcommitter.marksuccessfuljobs", true)) {
      val fs = out.getFileSystem(conf)
      fs.create(new Path(out, "_SUCCESS"), true).close() // single PUT
    }
  }

  override def abortJob(jobContext: JobContext,
      state: org.apache.hadoop.mapreduce.JobStatus.State): Unit = ()
}

/** Factory registered under
  * `mapreduce.outputcommitter.factory.scheme.<scheme>` to route that
  * scheme's commits through [[DirectPutCommitter]]. */
class DirectPutCommitterFactory extends PathOutputCommitterFactory {
  override def createOutputCommitter(outputPath: Path,
      context: TaskAttemptContext): PathOutputCommitter =
    new DirectPutCommitter(outputPath, context)
}
