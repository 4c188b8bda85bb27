package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all specs (creation costs ~10 s). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // maxFailures = 2: plain local[4] fails the job on the FIRST task
      // failure, which would turn ChaosSpec's injected first-attempt
      // errors into job aborts instead of retries; harmless elsewhere
      // (no other spec fails tasks)
      .master("local[4, 2]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
}
