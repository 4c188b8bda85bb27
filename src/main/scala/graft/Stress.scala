package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Write/read throughput stress harness — the engine's counterpart of the
  * reference's stress mains (ShuffleWriteStressTest.scala:85-105 prints
  * `speed MB/s` for threads × blockSize × totalSize; FsReadStressTest
  * likewise). Here the unit of work is the real sink/scan path: generate
  * rows → shuffled partitioned parquet write → full scan + aggregate.
  *
  * Usage: runMain graft.Stress [rows] [partitions] [outDir]
  * Prints one JSON line: {"write_mb_s":…, "read_mb_s":…, "rows":…, "bytes":…}
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 2000000L
    val parts = if (args.length > 1) args(1).toInt else 32
    val out = if (args.length > 2) args(2)
      else Files.createTempDirectory("graft-stress").toString + "/data"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // synthetic records ≈ the reference's random blocks: key + 100B payload
    val df = spark.range(rows).select(
      col("id"),
      pmod(Tables.phash(col("id")), lit(parts)).as("bucket"),
      sha2(col("id").cast("string"), 256).as("payload"))

    val t0 = System.nanoTime()
    df.repartition(parts, col("bucket"))
      .write.mode("overwrite").parquet(out)
    val writeSec = (System.nanoTime() - t0) / 1e9

    val bytes = {
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(new org.apache.hadoop.fs.Path(out)).getLength
    }

    val t1 = System.nanoTime()
    val n = spark.read.parquet(out)
      .agg(count(lit(1)), max(length(col("payload")))).head().getLong(0)
    val readSec = (System.nanoTime() - t1) / 1e9
    require(n == rows, s"read back $n of $rows rows")

    val mb = bytes / 1e6
    println(f"""{"write_mb_s":${mb / writeSec}%.1f,"read_mb_s":${mb / readSec}%.1f,"rows":$rows,"bytes":$bytes}""")
    spark.stop()
  }
}
