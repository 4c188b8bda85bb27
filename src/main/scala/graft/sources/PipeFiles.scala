package graft.sources

import java.io.{DataOutputStream, EOFException, IOException}
import java.util.zip.CRC32

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** The reference's NATIVE partition-file ("pipe") format, bit-level:
  *
  *   - every record starts with a 32-byte big-endian index
  *     `{mapId:int, attemptId:long, seqId:int, offset:long, length:long}`
  *     (ShuffleIndex.java:32-37,96-102 — Netty `ByteBuf`/`DataOutputStream`
  *     byte order are both big-endian);
  *   - a DATA record (`seqId >= 0`) is followed immediately by `length`
  *     payload bytes, `offset` = file position of the payload start
  *     (ShufflePartitionUnsafeWriter.java:99-123);
  *   - a CHECKSUM record carries `seqId == -1` (Constants.java:22) and NO
  *     payload: the CRC32 ledger value rides in the `length` slot with
  *     `offset = 0` (ShufflePartitionUnsafeWriter.java:130-140, read back
  *     at PartitionPipeReader.java:171-177 as `mapChecksum.put(mapId,
  *     index.getLength())`);
  *   - the per-(partition, map) ledger value is the SUM of per-block CRC32s
  *     — order-independent accumulation (Ors2BlockManager.scala:127-136:
  *     `checksums(p) += getCRC32Checksum(data)`) — which is why the verify
  *     query can recompute it as `sum(crc32(payload))`;
  *   - an in-progress file is `<name>.dat`; finalize RENAMES it to
  *     `<name>.dat_final` (Constants.java:37-39,
  *     ShufflePartitionUnsafeWriter.java:204-225), and readers must ignore
  *     un-finalized files — a crashed writer leaves a torn `.dat` that is
  *     invisible, never a half-read;
  *   - the driver publishes a `_SUCCEED` marker after all writers finalize
  *     (ShuffleFileUtils.java:47-54, Ors2SparkListener.scala:66-92).
  *
  * Directory layout here is the reference's partition-directory shape
  * (ShuffleFileUtils.java:29-45) with the app/attempt prefix elided:
  * `root/<partitionId>/shuffle_<writer>_<partitionId>.dat_final` — the
  * partition id IS the directory name, which is what makes partition
  * pruning a pure file-listing operation for [[PipeDataSource]].
  *
  * Scale notes (100 TB): [[write]] is one hash exchange keyed by
  * `partition_id` (every reduce partition's blocks co-located, the
  * reference's own grouping invariant) followed by a single streaming pass
  * per task — per-task state is one open file plus one CRC accumulator and
  * one seen-seq set per CURRENT map (bounded by a map's block count, reset
  * at every map boundary thanks to the sort). Nothing driver-side but the
  * `_SUCCEED` marker.
  */
object PipeFiles {

  /** ShuffleIndex.NUM_BYTES (ShuffleIndex.java:32). */
  val IndexNumBytes: Int = 32

  /** Constants.CHECK_SUM_SEQID (Constants.java:22). */
  val ChecksumSeqId: Int = -1

  val DataSuffix = ".dat"
  val FinalSuffix = ".dat_final" // Constants.java:37
  val SucceedMarker = "_SUCCEED" // ShuffleFileUtils.java:47-54

  /** Hard sanity bound on a single block: the reference caps blocks at
    * ~1 MB (Ors2Config.scala:79-84); 1 GiB here is pure corruption
    * detection, not a format limit. */
  val MaxBlockBytes: Long = 1L << 30

  /** Relational surface of one pipe record. DATA rows carry
    * (length, payload, checksum = NULL); CHECKSUM rows carry
    * (checksum, length = 0, payload = NULL) — the raw format's
    * length-slot overload is unfolded into honest columns. */
  val schema: StructType = StructType(Seq(
    StructField("partition_id", IntegerType, nullable = false),
    StructField("map_id", IntegerType, nullable = false),
    StructField("attempt_id", LongType, nullable = false),
    StructField("seq_id", IntegerType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("checksum", LongType, nullable = true),
    StructField("payload", BinaryType, nullable = true)))

  /** Columns a caller of [[write]] provides; the table's write contract
    * is its full read [[schema]] ("write what you read" — DSv2 resolves
    * output columns by name against the table schema), so [[write]]
    * derives the rest: `length` from the payload, `checksum` NULL (the
    * ledger records are the WRITER's to compute — callers cannot forge
    * them; fault injection is [[corruptLedger]]'s explicit byte patch). */
  val writeColumns: Seq[String] = Seq(
    "partition_id", "map_id", "attempt_id", "seq_id", "payload")

  /** Java-serializable Hadoop `Configuration` carrier for shipping the
    * session's FS settings to executor-side readers/writers (Spark's own
    * equivalent is `private[spark]`). */
  final class SerializableHadoopConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false); value.readFields(in)
    }
  }

  /** CRC32 of one block (ChecksumUtils.java:24-28). */
  def crc32Of(bytes: Array[Byte]): Long = {
    val c = new CRC32
    c.update(bytes, 0, bytes.length)
    c.getValue
  }

  /** Write `df` as finalized pipe files under `root`, replacing any
    * previous tree — a thin wrapper over the DSv2 write path
    * (`df.write.format("graft-pipe").mode("overwrite")`): the connector's
    * required distribution/ordering inserts the one exchange keyed by
    * `partition_id` plus the task-local sort, tasks stream `.dat` files,
    * task COMMIT finalizes them to `.dat_final`, job commit publishes
    * `_SUCCEED`.
    *
    * Ledger semantics mirror the reference client: the stored checksum
    * per (partition, map) is the sum of CRC32s over the map's LOGICAL
    * block set — its latest attempt, each seq counted once — because the
    * client accumulates at block-build time (Ors2BlockManager.scala:
    * 127-136): a network-level resend or a superseded attempt re-WRITES
    * bytes into the file but never re-enters the source ledger. The
    * written files still physically contain every row they are given
    * (retry + resend duplicates included) — producing exactly the raw
    * stream the read-side latest-attempt/dedup/verify operators exist to
    * clean (PartitionPipeReader.java:150-170,
    * ShufflePartitionReader.java:378-393).
    *
    * Expects [[writeColumns]]. `overwrite = false` appends a new wave of
    * files to an existing tree (file names carry the query id + task id,
    * so waves never collide — the multi-writer layout the reference's
    * per-worker files produce). */
  def write(df: DataFrame, root: String, overwrite: Boolean = true): Unit =
    df.select(writeColumns.map(col) :+
        org.apache.spark.sql.functions.length(col("payload")).cast("long")
          .as("length") :+
        org.apache.spark.sql.functions.lit(null).cast("long").as("checksum"): _*)
      .write.format("graft.sources.PipeDataSource")
      .mode(if (overwrite) "overwrite" else "append").save(root)

  /** Explicit fault injection for specs/fixtures: add `delta` to the
    * STORED ledger value of (pid, mid) by patching the checksum record's
    * length-slot bytes in place — the writer itself always writes honest
    * ledgers, so a detectable corruption is what it is in production:
    * an on-disk event after the fact. Returns the number of patched
    * records (one per file holding blocks of that map). */
  def corruptLedger(conf: Configuration, root: String, pid: Int, mid: Int,
      delta: Long): Int = {
    val dir = new Path(s"$root/$pid")
    val f = dir.getFileSystem(conf)
    if (!f.exists(dir)) return 0
    var patched = 0
    f.listStatus(dir).filter(st => st.isFile &&
        st.getPath.getName.endsWith(FinalSuffix)).foreach { st =>
      val bytes = new Array[Byte](st.getLen.toInt)
      val in = f.open(st.getPath)
      try in.readFully(bytes) finally in.close()
      val buf = java.nio.ByteBuffer.wrap(bytes) // big-endian
      var pos = 0
      var dirty = false
      while (pos + IndexNumBytes <= bytes.length) {
        val mapId = buf.getInt(pos)
        val seqId = buf.getInt(pos + 12)
        val lengthSlot = buf.getLong(pos + 24)
        if (seqId == ChecksumSeqId) {
          if (mapId == mid) {
            buf.putLong(pos + 24, lengthSlot + delta)
            dirty = true; patched += 1
          }
          pos += IndexNumBytes
        } else pos += IndexNumBytes + lengthSlot.toInt
      }
      if (dirty) {
        val out = f.create(st.getPath, true)
        try out.write(bytes) finally out.close()
      }
    }
    patched
  }

  /** Parse `name.dat_final` → partition id from its parent directory name;
    * None for non-pipe entries (markers, torn `.dat` files). */
  private[sources] def finalFilePartition(p: Path): Option[Int] =
    if (!p.getName.endsWith(FinalSuffix)) None
    else scala.util.Try(p.getParent.getName.toInt).toOption

  /** One parsed record handed to the row assembler. For checksum records
    * `payload == null` and `checksum` holds the ledger value. */
  private[sources] final case class PipeRecord(
      mapId: Int, attemptId: Long, seqId: Int, length: Long,
      checksum: Long, payload: Array[Byte])

  /** Streaming parser over one finalized pipe file. `wantPayload = false`
    * SEEKS past every payload instead of reading it — the IO face of
    * column pruning. Distinguishes clean EOF (stream ends exactly at a
    * record boundary) from a torn/corrupt frame (ends inside an index or
    * a payload), which raises IOException — finalized files are
    * immutable-complete by the rename contract, so any mid-record end is
    * corruption, never in-progress data. */
  private[sources] final class PipeFileParser(
      in: FSDataInputStream, path: String, wantPayload: Boolean) {

    /** Payload IO counters, exported as scan SQL metrics
      * ([[PipeDataSource]]): read = bytes decoded, skipped = bytes
      * seeked past under column pruning. */
    var payloadBytesRead: Long = 0L
    var payloadBytesSkipped: Long = 0L

    /** Next record, or null at clean EOF. */
    def next(): PipeRecord = {
      val first = in.read()
      if (first < 0) return null // clean EOF at a record boundary
      val rest = new Array[Byte](IndexNumBytes - 1)
      try in.readFully(rest)
      catch { case _: EOFException =>
        throw new IOException(s"torn pipe index in $path")
      }
      val buf = java.nio.ByteBuffer.allocate(IndexNumBytes) // big-endian
      buf.put(first.toByte).put(rest).flip()
      val mapId = buf.getInt
      val attemptId = buf.getLong
      val seqId = buf.getInt
      buf.getLong // offset — sequential readers ignore it, as the reference's does
      val lengthSlot = buf.getLong
      if (seqId == ChecksumSeqId)
        return PipeRecord(mapId, attemptId, seqId, 0L, lengthSlot, null)
      if (lengthSlot < 0 || lengthSlot > MaxBlockBytes)
        throw new IOException(
          s"corrupt pipe frame in $path: block length $lengthSlot")
      val len = lengthSlot.toInt
      if (wantPayload) {
        val payload = new Array[Byte](len)
        try in.readFully(payload)
        catch { case _: EOFException =>
          throw new IOException(s"torn pipe payload in $path")
        }
        payloadBytesRead += len
        PipeRecord(mapId, attemptId, seqId, lengthSlot, -1L, payload)
      } else {
        val end = in.getPos + len
        in.seek(end)
        if (in.getPos != end)
          throw new IOException(s"torn pipe payload in $path")
        payloadBytesSkipped += len
        PipeRecord(mapId, attemptId, seqId, lengthSlot, -1L, null)
      }
    }
  }
}

/** Executor-side pipe writer for one task's slice: rows PUSHED in
  * (partition, map, attempt, seq) order — partition changes cut files,
  * map changes flush ledger records. Every file stays a torn `.dat`
  * until [[commit]] renames the whole batch to `.dat_final` — the DSv2
  * task-commit adaptation of the reference's finalize
  * (ShufflePartitionUnsafeWriter.java:204-225): Spark's commit
  * coordinator admits ONE attempt per partition, so a speculative or
  * failed attempt [[abort]]s and deletes its torn files and no duplicate
  * finalized file can ever appear (rename-at-close would finalize a
  * multi-partition task's early files before the task survived). */
private[sources] final class PipeTaskFileWriter(
    root: String, conf: Configuration, nameTag: String) {
  import PipeFiles._

  private var out: DataOutputStream = _
  private var written: Long = 0L

  private var curPid = Int.MinValue
  private var curMap = Int.MinValue
  private val seenPids = scala.collection.mutable.HashSet.empty[Int]
  // ledger state for the CURRENT map: latest attempt seen, CRC sum over
  // that attempt's distinct seqs, the seqs already counted, the delta
  private var ledgerAttempt = Long.MinValue
  private var ledgerSum = 0L
  private val ledgerSeqs = scala.collection.mutable.HashSet.empty[Int]
  private val pendingLedgers =
    scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
  // (torn, final) pairs awaiting task commit
  private val pendingRenames =
    scala.collection.mutable.ArrayBuffer.empty[(Path, Path)]

  def write(pid: Int, mid: Int, attempt: Long, seq: Int,
      payload: Array[Byte]): Unit = {
    if (pid != curPid) {
      require(seenPids.add(pid),
        s"pipe write input not clustered: partition $pid seen twice")
      closeFile(); openFile(pid); curPid = pid
    }
    if (mid != curMap) { flushMapLedger(); curMap = mid }
    // source-side ledger: a HIGHER attempt supersedes the map's
    // accumulation; a duplicate (attempt, seq) never re-enters it
    if (attempt > ledgerAttempt) {
      ledgerAttempt = attempt; ledgerSum = 0L; ledgerSeqs.clear()
    }
    if (attempt == ledgerAttempt && ledgerSeqs.add(seq))
      ledgerSum += crc32Of(payload)
    writeIndex(mid, attempt, seq, written + IndexNumBytes, payload.length.toLong)
    out.write(payload)
    written += payload.length
  }

  /** Close streams (all files remain torn `.dat`). */
  def closeAll(): Unit = closeFile()

  /** Finalize every file written by this task; returns the final paths. */
  def commit(): Seq[String] = {
    closeFile()
    val done = pendingRenames.map { case (tmp, fin) =>
      val f = tmp.getFileSystem(conf)
      if (!f.rename(tmp, fin))
        throw new IOException(s"finalize rename failed: $tmp")
      fin.toString
    }.toSeq
    pendingRenames.clear()
    done
  }

  /** Drop this attempt: close and delete every torn file it wrote. */
  def abort(): Unit = {
    if (out != null) { scala.util.Try(out.close()); out = null }
    pendingRenames.foreach { case (tmp, _) =>
      scala.util.Try(tmp.getFileSystem(conf).delete(tmp, false))
    }
    pendingRenames.clear()
  }

  private def writeIndex(mapId: Int, attemptId: Long, seqId: Int,
      offset: Long, lengthSlot: Long): Unit = {
    out.writeInt(mapId); out.writeLong(attemptId); out.writeInt(seqId)
    out.writeLong(offset); out.writeLong(lengthSlot)
    written += IndexNumBytes
  }

  private def flushMapLedger(): Unit = {
    if (curMap != Int.MinValue)
      pendingLedgers += ((curMap, ledgerAttempt, ledgerSum))
    ledgerAttempt = Long.MinValue; ledgerSum = 0L; ledgerSeqs.clear()
  }

  private def openFile(pid: Int): Unit = {
    val dir = new Path(s"$root/$pid")
    val f = dir.getFileSystem(conf)
    f.mkdirs(dir)
    val tmp = new Path(dir, s"shuffle_${nameTag}_$pid$DataSuffix")
    pendingRenames += ((tmp, new Path(dir, s"shuffle_${nameTag}_$pid$FinalSuffix")))
    out = new DataOutputStream(new java.io.BufferedOutputStream(
      f.create(tmp, true), 1 << 16))
    written = 0L
    curMap = Int.MinValue
  }

  private def closeFile(): Unit = {
    if (out == null) return
    flushMapLedger()
    // checksum records trail the data, one per map
    // (ShufflePartitionUnsafeWriter.java:125-140: offset slot 0, ledger
    // value in the length slot)
    pendingLedgers.foreach { case (mid, attempt, sum) =>
      writeIndex(mid, attempt, ChecksumSeqId, 0L, sum)
    }
    pendingLedgers.clear()
    out.close(); out = null
  }
}
