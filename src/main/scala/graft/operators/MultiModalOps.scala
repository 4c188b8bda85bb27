package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (builder prompt): treat media as opaque
  * `binary` payloads with typed metadata, processed by a partition-local
  * decode/feature-extract stage.
  *
  * The decode step is a STUB — no image/audio codecs exist in this
  * container — replaced by a deterministic fake (dimensions/frame counts
  * derived from the byte stream, mean byte value as the "feature"). The
  * Spark-side plumbing is real: a typed `Dataset[(Long, Array[Byte])]`,
  * a `mapPartitions` decode stage (one codec init per partition, the shape
  * a JNI/FFI decoder needs), and a schema'd metadata result.
  *
  * Scale notes (100 TB of media): the binary column rides parquet; the
  * decode stage is embarrassingly parallel with NO shuffle — partition
  * sizing is governed by `spark.sql.files.maxPartitionBytes` so each task
  * holds only its batch of blobs. Frame-sampling/resize compose as further
  * mapPartitions stages over the same typed Dataset.
  */
object MultiModalOps {
  private type Q = (SparkSession, String) => DataFrame

  private val qMultimodalMeta: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // Real pipeline: init the codec once per partition here.
        it.map { case (id, bytes) =>
          // STUB decode: deterministic fake metadata in place of a codec.
          val n = bytes.length.toLong
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
          val width = 64L + n % 512L
          val height = 64L + (n / 7L) % 512L
          val frames = 1L + n % 16L
          val meanByte = if (n == 0) 0.0 else sum.toDouble / n
          (id, n, width, height, frames, meanByte)
        }
      }
      .toDF("doc_id", "n_bytes", "width", "height", "n_frames", "mean_byte")
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_multimodal_meta" -> qMultimodalMeta,
  )

  val oracles: Map[String, String] = Map(
    // documents are pure ASCII (verified), so per-char codepoints == bytes.
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |       CAST(strlen(text) AS BIGINT) AS n_bytes,
        |       CAST(64 + strlen(text) % 512 AS BIGINT) AS width,
        |       CAST(64 + (strlen(text) // 7) % 512 AS BIGINT) AS height,
        |       CAST(1 + strlen(text) % 16 AS BIGINT) AS n_frames,
        |       coalesce((SELECT sum(ord(c)) FROM unnest(string_split(text, '')) u(c))
        |         / CAST(nullif(strlen(text), 0) AS DOUBLE), 0.0) AS mean_byte
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
