package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Video-column plumbing over REAL MP4 (ISO-BMFF) containers — the last
  * multimodal leg, upgraded from "declared platform limit" to the honest
  * JDK maximum: the JDK ships no video CODEC, but the CONTAINER format is
  * pure public byte layout (ISO/IEC 14496-12), so this module writes and
  * parses genuine MP4 boxes and performs real DEMUX work:
  *
  *  - a generator stage renders a valid [ftyp][mdat][moov] file per
  *    document — mvhd/tkhd/mdhd timing, a 'vide' handler, and a full
  *    sample table (stsd/stts/stsc/stsz/stco) whose chunk offset and
  *    per-sample sizes index the real mdat payload;
  *  - the parse stage walks the box tree from the actual bytes (no
  *    format knowledge outside the container spec) and the demux stage
  *    extracts each sample's byte range via stco + cumulative stsz —
  *    exactly what a production demuxer does before handing frames to a
  *    decoder.
  *
  * The sample PAYLOAD is an opaque deterministic byte formula (fourcc
  * 'grft' in stsd): the bytes→pixels step is the one thing the JDK
  * cannot do, and it remains the documented JNI/FFI seam — a real codec
  * slots in exactly where the per-sample byte slices come out. Per the
  * multimodal brief, the decode is the stub; the schema, partitioning,
  * container parsing and batch shape are real and oracle-checked.
  *
  * Scale notes (100 TB of video): encode, parse and demux are
  * embarrassingly parallel map-side stages with ZERO shuffle — the blob
  * never leaves its partition, per-task memory is one batch of payloads
  * (`spark.sql.files.maxPartitionBytes`), and only the per-sample stat
  * rows (a few int64s each) flow downstream. Real deployments read the
  * moov box alone for metadata queries (byte-range reads of the parquet
  * binary column would need only the tail); the demux query is the
  * frame-extraction shape feeding any vision encoder.
  */
object VideoOps {
  private type Q = (SparkSession, String) => DataFrame

  // ---- fixture geometry (mirrored by the oracles) ---------------------
  private[graft] val Timescale = 1000L // movie+media ticks/sec => durations in ms
  private[graft] def nSamples(id: Long): Int = (4 + Math.floorMod(id, 12L)).toInt
  private[graft] def sampleDur(id: Long): Int = (40 + Math.floorMod(id, 5L) * 10).toInt
  private[graft] def vidWidth(id: Long): Int = 16 * (1 + Math.floorMod(id, 8L)).toInt
  private[graft] def vidHeight(id: Long): Int = 16 * (1 + Math.floorMod(id / 3, 8L)).toInt
  private[graft] def sampleSize(id: Long, f: Int): Int =
    (32 + Math.floorMod(id * 7 + f.toLong * 13, 32L)).toInt
  private[graft] def sampleByte(id: Long, f: Int, k: Int): Int =
    Math.floorMod(id * 31 + f.toLong * 17 + k.toLong * 11, 256L).toInt
  private[graft] def sampleBytes(id: Long, f: Int): Array[Byte] =
    Array.tabulate(sampleSize(id, f))(k => sampleByte(id, f, k).toByte)

  // ---- box writer -----------------------------------------------------
  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new Array[Byte](parts.map(_.length).sum)
    var o = 0
    parts.foreach { p => System.arraycopy(p, 0, out, o, p.length); o += p.length }
    out
  }
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = cat(payload: _*)
    cat(be32(8L + body.length), fourcc(typ), body)
  }
  /** FullBox payload prefix: version byte + 24-bit flags. */
  private def vf(version: Int, flags: Int): Array[Byte] = be32(
    ((version & 0xff).toLong << 24) | (flags & 0xffffff))

  private val UnityMatrix = cat(
    be32(0x00010000L), be32(0), be32(0),
    be32(0), be32(0x00010000L), be32(0),
    be32(0), be32(0), be32(0x40000000L))

  /** Render one document's fixture video as a genuine MP4 byte stream:
    * [ftyp][mdat][moov], moov's stco pointing back into the real mdat.
    * Layout puts mdat BEFORE moov so the chunk offset is independent of
    * the moov size (the classic non-faststart layout). */
  private[graft] def encodeMp4(id: Long): Array[Byte] =
    encodeMp4From(nSamples(id), sampleDur(id), vidWidth(id), vidHeight(id),
      f => sampleBytes(id, f))

  /** The writer, parameterized by geometry and a per-sample byte source —
    * shared by the per-doc fixture above and the content-keyed dedup
    * fixture ([[fpSampleBytes]]). */
  private[graft] def encodeMp4From(n: Int, durPerSample: Int, width: Int,
      height: Int, sample: Int => Array[Byte]): Array[Byte] = {
    val dur = n.toLong * durPerSample
    val sBytes = (0 until n).map(sample)
    val payload = cat(sBytes: _*)
    val ftyp = box("ftyp", fourcc("isom"), be32(0x200), fourcc("isom"), fourcc("iso2"))
    val mdat = box("mdat", payload)
    val chunkOffset = ftyp.length.toLong + 8 // first payload byte of mdat
    val mvhd = box("mvhd", vf(0, 0), be32(0), be32(0), be32(Timescale),
      be32(dur), be32(0x00010000L), be16(0x0100), be16(0),
      new Array[Byte](8), UnityMatrix, new Array[Byte](24), be32(2))
    val tkhd = box("tkhd", vf(0, 7), be32(0), be32(0), be32(1), be32(0),
      be32(dur), new Array[Byte](8), be16(0), be16(0), be16(0), be16(0),
      UnityMatrix, be32(width.toLong << 16), be32(height.toLong << 16))
    val mdhd = box("mdhd", vf(0, 0), be32(0), be32(0), be32(Timescale),
      be32(dur), be16(0x55c4) /* 'und' */, be16(0))
    val hdlr = box("hdlr", vf(0, 0), be32(0), fourcc("vide"),
      new Array[Byte](12), fourcc("GraftVideo"), Array(0.toByte))
    // VisualSampleEntry with the opaque 'grft' sample format: the codec
    // config a real encoder would add is exactly the FFI seam
    val compressor = {
      val name = fourcc("graft")
      cat(Array(name.length.toByte), name, new Array[Byte](31 - name.length))
    }
    val sampleEntry = box("grft", new Array[Byte](6), be16(1),
      be16(0), be16(0), new Array[Byte](12),
      be16(width), be16(height),
      be32(0x00480000L), be32(0x00480000L), be32(0), be16(1),
      compressor, be16(0x0018), be16(0xffff))
    val stsd = box("stsd", vf(0, 0), be32(1), sampleEntry)
    val stts = box("stts", vf(0, 0), be32(1), be32(n), be32(durPerSample))
    val stsc = box("stsc", vf(0, 0), be32(1), be32(1), be32(n), be32(1))
    val stsz = box("stsz", vf(0, 0), be32(0), be32(n),
      cat(sBytes.map(sb => be32(sb.length)): _*))
    val stco = box("stco", vf(0, 0), be32(1), be32(chunkOffset))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val vmhd = box("vmhd", vf(0, 1), new Array[Byte](8))
    val dinf = box("dinf", box("dref", vf(0, 0), be32(1), box("url ", vf(0, 1))))
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    cat(ftyp, mdat, moov)
  }

  // ---- box parser -----------------------------------------------------
  private def rd32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def typAt(b: Array[Byte], o: Int): String =
    new String(b, o + 4, 4, "US-ASCII")

  /** Child boxes of the byte range [from, to): (type, payloadStart,
    * payloadEnd). Size-0 ("to end of file") and 64-bit sizes are not
    * emitted by the writer and rejected loudly rather than misparsed. */
  private[graft] def boxes(b: Array[Byte], from: Int, to: Int): List[(String, Int, Int)] = {
    var o = from
    val out = List.newBuilder[(String, Int, Int)]
    while (o < to) {
      val sz = rd32(b, o)
      require(sz >= 8 && o + sz <= to, s"malformed box at $o (size $sz)")
      out += ((typAt(b, o), o + 8, o + sz.toInt))
      o += sz.toInt
    }
    out.result()
  }

  private def child(b: Array[Byte], range: (String, Int, Int), typ: String): (String, Int, Int) =
    boxes(b, range._2, range._3).find(_._1 == typ)
      .getOrElse(throw new IllegalArgumentException(s"no $typ under ${range._1}"))

  /** Parsed container metadata, all read from the actual boxes. */
  private[graft] def parseMeta(b: Array[Byte])
      : (String, Long, Long, Long, Long, Long, String, String) = {
    val top = boxes(b, 0, b.length)
    val ftyp = top.find(_._1 == "ftyp").get
    val brand = new String(b, ftyp._2, 4, "US-ASCII")
    val moov = top.find(_._1 == "moov").get
    val mvhd = child(b, moov, "mvhd")
    val timescale = rd32(b, mvhd._2 + 12)
    val duration = rd32(b, mvhd._2 + 16)
    val trak = child(b, moov, "trak")
    val tkhd = child(b, trak, "tkhd")
    val w = rd32(b, tkhd._3 - 8) >> 16
    val h = rd32(b, tkhd._3 - 4) >> 16
    val mdia = child(b, trak, "mdia")
    val hdlr = child(b, mdia, "hdlr")
    val handler = new String(b, hdlr._2 + 8, 4, "US-ASCII")
    val stbl = child(b, child(b, mdia, "minf"), "stbl")
    val stsd = child(b, stbl, "stsd")
    val codec = typAt(b, stsd._2 + 8)
    val stsz = child(b, stbl, "stsz")
    val nSamp = rd32(b, stsz._2 + 8)
    (brand, timescale, duration, w, h, nSamp, handler, codec)
  }

  /** Demux: per-sample byte slices located via stco + cumulative stsz —
    * the real chunk-offset walk. Returns (sampleIdx, bytes). */
  private[graft] def demux(b: Array[Byte]): Seq[(Int, Array[Byte])] = {
    val top = boxes(b, 0, b.length)
    val moov = top.find(_._1 == "moov").get
    val stbl = child(b, child(b, child(b, child(b, moov, "trak"), "mdia"), "minf"), "stbl")
    val stsz = child(b, stbl, "stsz")
    val uniform = rd32(b, stsz._2 + 4)
    val n = rd32(b, stsz._2 + 8).toInt
    val sizes = (0 until n).map(i =>
      if (uniform != 0) uniform else rd32(b, stsz._2 + 12 + 4 * i))
    val stco = child(b, stbl, "stco")
    require(rd32(b, stco._2 + 4) == 1, "fixture writes a single chunk")
    var off = rd32(b, stco._2 + 8).toInt
    sizes.zipWithIndex.map { case (sz, i) =>
      val slice = java.util.Arrays.copyOfRange(b, off, off + sz.toInt)
      off += sz.toInt
      (i, slice)
    }
  }

  /** Generator stage: one real MP4 payload per document — zero shuffle,
    * memoized across the family ([[graft.SharedPlans]], the
    * pngPayloads/wavPayloads economics). */
  private[graft] def mp4Payloads(s: SparkSession, d: String): DataFrame =
    graft.SharedPlans.shared(s, s"mp4_payloads|$d") {
      import s.implicits._
      Tables.spread(s, Tables.documents(s, d).select(col("doc_id")))
        .as[Long]
        .mapPartitions(it => it.map(id => (id, encodeMp4(id))))
        .toDF("doc_id", "payload")
    }

  /** Container metadata from the parsed boxes — brand, movie timing,
    * track geometry, handler and sample format, sample count. */
  private val qVideoMeta: Q = (s, d) => {
    import s.implicits._
    mp4Payloads(s, d)
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) =>
        val (brand, ts, dur, w, h, n, handler, codec) = parseMeta(bytes)
        (id, brand, ts, dur, n, w, h, handler, codec)
      })
      .toDF("doc_id", "brand", "timescale", "duration_ms", "n_samples",
        "width", "height", "handler", "codec")
      .orderBy("doc_id")
  }

  /** Frame extraction: demux every 2nd sample's byte range and emit its
    * exact byte statistics — the feature-extraction shape with the
    * bytes→pixels step left at the FFI seam. */
  private val qVideoDemux: Q = (s, d) => {
    import s.implicits._
    mp4Payloads(s, d)
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) =>
        val samples = demux(bytes)
        val n = samples.length.toLong
        samples.collect { case (f, sl) if f % 2 == 0 =>
          var sum = 0L
          var k = 0
          while (k < sl.length) { sum += sl(k) & 0xff; k += 1 }
          (id, f.toLong, n, sl.length.toLong, sum,
            (sl.head & 0xff).toLong, (sl.last & 0xff).toLong)
        }
      })
      .toDF("doc_id", "sample_idx", "n_samples", "size_bytes", "byte_sum",
        "first_byte", "last_byte")
      .orderBy("doc_id", "sample_idx")
  }

  // ---- perceptual fingerprint dedup (the audio-family pattern) --------

  /** Dedup fixture: container content depends only on the CONTENT key
    * cid = doc_id % 48, so ~1/48 of the corpus shares each video
    * byte-for-byte — dup groups exist at every SF (the audio fpCid
    * trick). Distinct sample count per cid so fingerprints separate. */
  private[graft] def fpCid(id: Long): Long = Math.floorMod(id, 48L)
  private[graft] def fpN(cid: Long): Int = (4 + Math.floorMod(cid, 12L)).toInt
  private[graft] def fpSize(cid: Long, f: Int): Int =
    (32 + Math.floorMod(cid * 7 + f.toLong * 13, 32L)).toInt
  private[graft] def fpByte(cid: Long, f: Int, k: Int): Int =
    Math.floorMod(cid * 29 + f.toLong * 17 + k.toLong * 11, 256L).toInt
  private[graft] def fpSampleBytes(cid: Long, f: Int): Array[Byte] =
    Array.tabulate(fpSize(cid, f))(k => fpByte(cid, f, k).toByte)
  private[graft] def encodeFpMp4(cid: Long): Array[Byte] =
    encodeMp4From(fpN(cid), 40, 16, 16, f => fpSampleBytes(cid, f))

  /** Sign-of-delta fingerprint over the DEMUXED per-sample byte sums —
    * the codec-free video fingerprint (scene-energy deltas from payload
    * bytes): bit f is set iff sample f+1 carries a larger byte sum than
    * sample f. ≤ 14 samples → the packed BIGINT never nears the sign
    * bit. Runs on the real demux output, so it exercises the container
    * walk end-to-end. */
  private[graft] def fingerprint(samples: Seq[(Int, Array[Byte])]): (Long, Long) = {
    val sums = samples.sortBy(_._1).map { case (_, sl) =>
      var s = 0L; var k = 0
      while (k < sl.length) { s += sl(k) & 0xff; k += 1 }
      s
    }
    var fp = 0L
    for (f <- 0 until sums.length - 1)
      if (sums(f + 1) > sums(f)) fp |= 1L << f
    (fp, sums.length.toLong)
  }

  /** Per-doc fingerprint frame (doc_id, fp, n_samples) — encode the
    * content-keyed MP4, demux it through the REAL container walk,
    * fingerprint the sample sums. Memoized: the dedup query traverses it
    * directly and via [[fingerprintIndex]]. */
  private[graft] def fpFrame(s: SparkSession, d: String): DataFrame =
    graft.SharedPlans.shared(s, s"mp4_fp_frame|$d") {
      import s.implicits._
      Tables.spread(s, Tables.documents(s, d).select(col("doc_id")))
        .as[Long]
        .mapPartitions(it => it.map { id =>
          val (fp, n) = fingerprint(demux(encodeFpMp4(fpCid(id))))
          (id, fp, n)
        })
        .toDF("doc_id", "fp", "n_samples")
    }

  /** The published fingerprint index (fp, n, rep) — the static side the
    * dedup stream probes ([[graft.streaming.VideoDedupStream]]). */
  private[graft] def fingerprintIndex(s: SparkSession, d: String): DataFrame =
    fpFrame(s, d).groupBy("fp")
      .agg(count(lit(1)).as("n"), min("doc_id").as("rep"))

  /** Video-level exact dup groups by demuxed fingerprint — the video
    * twin of q_audio_fingerprint / q_image_dhash: members of groups of
    * ≥ 2, with group size and min-doc representative. */
  private val qVideoFingerprint: Q = (s, d) => {
    val groups = fingerprintIndex(s, d)
      .filter(col("n") >= 2)
      .select(col("fp"), col("n").as("group_size"), col("rep").as("rep_id"))
    fpFrame(s, d).join(groups, "fp")
      .select(col("doc_id"), col("fp"), col("n_samples"),
        col("group_size"), col("rep_id"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_video_meta" -> qVideoMeta,
    "q_video_demux" -> qVideoDemux,
    "q_video_fingerprint" -> qVideoFingerprint,
  )

  val oracles: Map[String, String] = Map(
    // every parsed field is a pure formula of doc_id — the container
    // roundtrip is lossless by the box spec, spec-pinned byte-exactly
    "q_video_meta" ->
      """SELECT doc_id, 'isom' AS brand, CAST(1000 AS BIGINT) AS timescale,
        |       CAST((4 + doc_id % 12) * (40 + (doc_id % 5) * 10) AS BIGINT)
        |         AS duration_ms,
        |       CAST(4 + doc_id % 12 AS BIGINT) AS n_samples,
        |       CAST(16 * (1 + doc_id % 8) AS BIGINT) AS width,
        |       CAST(16 * (1 + (doc_id // 3) % 8) AS BIGINT) AS height,
        |       'vide' AS handler, 'grft' AS codec
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_video_demux" ->
      """WITH p AS (SELECT doc_id, 4 + doc_id % 12 AS n FROM documents),
        |sidx AS (SELECT doc_id, n, unnest(range(0, n)) AS f FROM p),
        |samp AS (SELECT doc_id, n, f, 32 + (doc_id * 7 + f * 13) % 32 AS sz
        |         FROM sidx WHERE f % 2 = 0),
        |bytes AS (SELECT doc_id, n, f, sz, k.k
        |          FROM samp, (SELECT unnest(range(0, 64)) AS k) k
        |          WHERE k.k < sz),
        |sums AS (SELECT doc_id, n, f, sz,
        |                sum((doc_id * 31 + f * 17 + k * 11) % 256) AS bsum
        |         FROM bytes GROUP BY 1, 2, 3, 4)
        |SELECT doc_id, CAST(f AS BIGINT) AS sample_idx,
        |       CAST(n AS BIGINT) AS n_samples,
        |       CAST(sz AS BIGINT) AS size_bytes,
        |       CAST(bsum AS BIGINT) AS byte_sum,
        |       CAST((doc_id * 31 + f * 17) % 256 AS BIGINT) AS first_byte,
        |       CAST((doc_id * 31 + f * 17 + (sz - 1) * 11) % 256 AS BIGINT)
        |         AS last_byte
        |FROM sums ORDER BY doc_id, sample_idx""".stripMargin,
    // replays the content-keyed generator + sum-delta fingerprint per
    // cid, then fans out to docs — the q_audio_fingerprint oracle shape
    "q_video_fingerprint" ->
      """WITH dd AS (SELECT doc_id, doc_id % 48 AS cid FROM documents),
        |c AS (SELECT DISTINCT cid FROM dd),
        |p AS (SELECT cid, 4 + cid % 12 AS n FROM c),
        |sidx AS (SELECT cid, n, unnest(range(0, n)) AS f FROM p),
        |szs AS (SELECT cid, n, f, 32 + (cid * 7 + f * 13) % 32 AS sz
        |        FROM sidx),
        |bytes AS (SELECT cid, n, f, k.k
        |          FROM szs, (SELECT unnest(range(0, 64)) AS k) k
        |          WHERE k.k < sz),
        |e AS (SELECT cid, n, f,
        |             sum((cid * 29 + f * 17 + k * 11) % 256) AS en
        |      FROM bytes GROUP BY 1, 2, 3),
        |fp AS (
        |  SELECT a.cid, a.n,
        |         CAST(coalesce(sum(CASE WHEN b.en > a.en
        |                  THEN (CAST(1 AS BIGINT) << a.f) ELSE 0 END), 0)
        |              AS BIGINT) AS fp
        |  FROM e a JOIN e b ON a.cid = b.cid AND b.f = a.f + 1
        |  GROUP BY a.cid, a.n),
        |docs AS (SELECT dd.doc_id, fp.fp, fp.n FROM dd JOIN fp USING (cid)),
        |grp AS (SELECT fp, CAST(count(*) AS BIGINT) AS group_size,
        |               min(doc_id) AS rep_id
        |        FROM docs GROUP BY fp HAVING count(*) >= 2)
        |SELECT docs.doc_id, docs.fp, CAST(docs.n AS BIGINT) AS n_samples,
        |       grp.group_size, grp.rep_id
        |FROM docs JOIN grp USING (fp) ORDER BY docs.doc_id""".stripMargin,
  )
}
