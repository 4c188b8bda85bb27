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

  /** Frame-sampling stage: treat the payload as n_frames equal slices,
    * keep every 4th frame, emit one row per sampled frame with its offset,
    * length and byte-sum "feature" (the decode is the same deterministic
    * stub; the flatMap-over-partitions plumbing — one input blob fanning
    * out to per-frame rows — is the real shape of a video pipeline). */
  private val qMultimodalFrames: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val n = bytes.length.toLong
          val nFrames = 1L + n % 16L
          val frameLen = n / nFrames
          (0L until nFrames by 4L).map { f =>
            val off = f * frameLen
            var sum = 0L
            var i = off
            while (i < off + frameLen) { sum += (bytes(i.toInt) & 0xff); i += 1 }
            (id, f, off, frameLen, sum)
          }
        }
      }
      .toDF("doc_id", "frame_idx", "frame_off", "frame_len", "frame_sum")
      .orderBy("doc_id", "frame_idx")
  }

  val queries: Map[String, Q] = Map(
    "q_multimodal_meta" -> qMultimodalMeta,
    "q_multimodal_frames" -> qMultimodalFrames,
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
    "q_multimodal_frames" ->
      """WITH d AS (
        |  SELECT doc_id, text, strlen(text) AS n,
        |         1 + strlen(text) % 16 AS nf
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, text, n, nf, n // nf AS flen,
        |         unnest(range(0, nf, 4)) AS frame_idx
        |  FROM d)
        |SELECT doc_id, frame_idx, frame_idx * flen AS frame_off,
        |       flen AS frame_len,
        |       CAST(coalesce((SELECT sum(ord(c)) FROM
        |                 unnest(string_split(substring(text,
        |                   CAST(frame_idx * flen + 1 AS INT),
        |                   CAST(flen AS INT)), '')) u(c)), 0) AS BIGINT) AS frame_sum
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
