package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query against
  * SPARK_GRAFT_SF_DIR, prints the JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...},
  * mirrors it in full to BENCH_LOCAL.json, then prints a short
  * {"metric":"bench_summary",...} line LAST so a tail-window stdout
  * capture always retains the headline numbers.
  *
  * Queries are forced through the noop sink so the full physical plan
  * executes (a bare count() would let Catalyst prune projections and skip
  * most of the work being measured). One warmup query amortizes JVM/codegen
  * startup so per-query numbers reflect steady state.
  *
  * Measurement integrity (r3 recorded a 21x phantom on q_sort_global, r4 a
  * 3.6x phantom on q_ngram_jaccard — both transient host contention, not
  * code):
  *   - per-query min across TWO FULL PASSES of the suite, not min of two
  *     back-to-back reps: back-to-back reps sit inside the same contention
  *     window, so a transient hits both and survives the min. Interleaved
  *     passes put the whole suite (~40s+) between a query's two reps.
  *   - outlier re-measure: any query whose post-pass reading still exceeds
  *     2x its prior-round recording (latest BENCH_r*.json in cwd, or
  *     SPARK_GRAFT_PRIOR_BENCH) gets up to two extra timed reps before the
  *     artifact is written — a real regression survives re-measurement, a
  *     contention artifact does not.
  *   - iid reps (r12): between reps BOTH the block cache and the
  *     SharedPlans frame memo are cleared, and the artifact-backed
  *     queries' one-per-session index publishes are pre-paid in warmup —
  *     so no rep inherits a sibling's materialized subplan and no first
  *     rep pays a setup cost later reps skip. Recorded spreads measure
  *     noise, not cache state.
  *   - adjudicable record (r14): every query gets at least TWO
  *     interleaved reps — including the observability set, whose r13
  *     single-rep policy put one un-voted contention spike straight
  *     into the headline — and the output line carries a LIKE-FOR-LIKE
  *     companion (`lfl` = this round's sum over the queries present in
  *     the prior record, beside `lfl_prior`), so host inflation and
  *     registry growth separate without forensic reconstruction.
  *   - split headline (r15): `value` sums PIPELINE queries only; the
  *     observability set (health/recall audits) sums into its own
  *     `observability` key — the audits' cost grows with every audit
  *     added and their timings feed no regression decision, so they no
  *     longer move the number adjudications read. Both priors name
  *     their source file+mtime (`prior_src`/`lfl_src`), and the lfl
  *     baseline prefers the prior ROUND's BENCH_r*.json over a
  *     same-round BENCH_LOCAL refresh ([[selectLflPrior]]).
  */
object Bench {
  /** Extract the per-query seconds map from a prior BENCH artifact.
    * Two shapes exist in the wild: this object's own single-line output
    * (a "queries" object), and the round driver's wrapper, which embeds a
    * possibly-TRUNCATED, string-ESCAPED fragment of that line under
    * "tail" (BENCH_r04.json shape). Query keys all start with q_, so a
    * whole-text scan for "q_*":number pairs handles both — allowing an
    * escaping backslash before the closing quote, and dropping a
    * fragment's first pair if the cut fell mid-name (it simply won't
    * match). No JSON lib needed.
    *
    * The number pattern is a real float regex (sign, optional fraction,
    * optional signed exponent): Scala serializes sub-millisecond Doubles
    * as e.g. "5.0E-4", and a charset like [0-9.eE+] would match "5.0E"
    * and throw in toDouble. One malformed pair must not discard the rest
    * of the map (it would silently disable the re-measure pass), so each
    * conversion is individually guarded. */
  private[graft] def parsePriorQueries(json: String): Map[String, Double] = {
    val pair = """"(q_\w+)\\?"\s*:\s*(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)""".r
    pair.findAllMatchIn(json)
      .flatMap(p => scala.util.Try(p.group(1) -> p.group(2).toDouble).toOption)
      .toMap
  }

  /** An artifact written within this window of "now" is presumed to belong
    * to the CURRENT round (a same-round re-run: the driver retried, or a
    * local iteration loop) and is skipped as a re-measure baseline — the 2x
    * outlier threshold must compare against the PRIOR round's steady-state
    * recording, not a minutes-old reading taken under the same host load.
    * Rounds are hours apart, so 30 min cleanly separates the two cases. */
  private[graft] val SameRoundWindowMs: Long = 30L * 60 * 1000

  /** Pick the RE-MEASURE prior artifact from candidate files. Preference
    * order:
    *   1. BENCH_LOCAL.json — this program's own full-line record of the
    *      latest completed run (never tail-truncated, all queries present);
    *   2. the highest-numbered BENCH_r*.json (driver wrapper, tail window).
    * Any candidate modified within [[SameRoundWindowMs]] of `nowMs` is
    * skipped entirely (see above). Pure function of (files, nowMs) so the
    * spec can exercise the same-round skip with controlled mtimes. */
  private[graft] def selectPrior(files: Seq[java.io.File], nowMs: Long): Option[java.io.File] = {
    val aged = files.filter(f => nowMs - f.lastModified() >= SameRoundWindowMs)
    val local = aged.find(_.getName == "BENCH_LOCAL.json")
    local.orElse(highestDriver(aged))
  }

  private def highestDriver(aged: Seq[java.io.File]): Option[java.io.File] = {
    val rx = """BENCH_r(\d+)\.json""".r
    aged.flatMap(f => f.getName match {
      case rx(n) => Some((n.toInt, f))
      case _ => None
    }).sortBy(-_._1).headOption.map(_._2)
  }

  /** Pick the LIKE-FOR-LIKE companion's baseline. r14-r16 keyed this off
    * the driver's BENCH_r*.json to guarantee a cross-round ratio — but
    * that wrapper stores only a ~2 kB stdout TAIL, so lfl covered just
    * the alphabetically-last ~65 queries and whole-family regressions
    * (r16's multimodal question) fell outside the adjudicable set. The
    * committed BENCH_LOCAL.json carries the FULL per-query map of the
    * prior round's final refresh, so it is now PREFERRED (r16 verdict
    * #3: lfl_n 65 → full registry); the driver wrapper stays as the
    * fallback for a checkout without a committed local record. Cross-
    * round validity is preserved by the same aged-file filter (a
    * same-round refresh inside [[SameRoundWindowMs]] is skipped — the
    * r14 failure mode) plus the committed record's repo discipline:
    * BENCH_LOCAL.json is only ever committed as the round's final
    * sf0.1 record, and `lfl_src` names file@mtime so the reader can
    * verify which baseline answered. */
  private[graft] def selectLflPrior(files: Seq[java.io.File], nowMs: Long): Option[java.io.File] = {
    val aged = files.filter(f => nowMs - f.lastModified() >= SameRoundWindowMs)
    aged.find(_.getName == "BENCH_LOCAL.json").orElse(highestDriver(aged))
  }

  /** Sub-this-many-seconds queries get a third timed rep: their run-to-run
    * noise (±40% has been recorded at sf0.1) is the thing round-over-round
    * adjudication keeps fighting, and a third rep costs little exactly
    * because they are fast. Mid-range queries keep two reps; the SLOWEST
    * [[SlowTailCount]] get a third rep too (below). */
  private[graft] val MedianRepCutoff = 2.0

  /** The slowest this-many queries also get a third rep: the slow tail
    * carries the widest recorded 1-rep spreads (up to 3.2× round-over-
    * round on the codec/index families — q_multimodal_frames read
    * [2.33, 7.40]s in one round) and those are exactly the rows
    * regression adjudications are made on, so the median-of-3 robustness
    * the fast queries already have is worth the ~tens of seconds of
    * extra wall here. Queries between the cutoff and the tail keep two
    * reps — mid-range signal-to-noise has stayed adequate. */
  private[graft] val SlowTailCount = 10

  /** Headline seconds from a query's valid rep list: lower median once 3+
    * reps exist (robust to one contention hit in EITHER direction — min
    * would hide a real regression that a lucky rep dodged), min of 2
    * otherwise (the pre-r9 semantics). Empty → failure sentinel. */
  private[graft] def headline(reps: Seq[Double]): Double = {
    val v = reps.filter(_ >= 0).sorted
    if (v.isEmpty) -1.0
    else if (v.length >= 3) v((v.length - 1) / 2)
    else v.head
  }

  /** The baseline's provenance string for the output line —
    * "<name>@<mtime ISO-8601 UTC>": which FILE a ratio keys off, so the
    * r14 ambiguity (lfl_prior silently bound to the same round's own
    * BENCH_LOCAL refresh) reads directly off the record instead of
    * needing mtime forensics. */
  private def srcOf(f: java.io.File): String =
    f.getName + "@" + java.time.Instant.ofEpochMilli(f.lastModified())
      .toString.takeWhile(_ != '.').stripSuffix("Z") + "Z"

  /** A prior artifact resolved to (per-query seconds, provenance).
    * SPARK_GRAFT_PRIOR_BENCH if set (explicit pin, no same-round
    * filtering, pins BOTH priors), else `select` over the working
    * directory. */
  private def loadPrior(select: (Seq[java.io.File], Long) => Option[java.io.File])
      : (Map[String, Double], Option[String]) = {
    val explicit = sys.env.get("SPARK_GRAFT_PRIOR_BENCH")
      .map(new java.io.File(_)).filter(_.isFile)
    val latest = explicit.orElse {
      val cands = Option(new java.io.File(".").listFiles())
        .getOrElse(Array.empty[java.io.File]).toSeq
      select(cands, System.currentTimeMillis())
    }
    latest match {
      case None => (Map.empty, None)
      case Some(f) =>
        val m =
          try parsePriorQueries(
            new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
          catch { case _: Throwable => Map.empty[String, Double] }
        (m, if (m.isEmpty) None else Some(srcOf(f)))
    }
  }

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
    // query alphabetically pays its compilation. The artifact-backed
    // queries warm too, for a different reason: their SharedPlans.once
    // publish runs once per session, so without a warmup run the FIRST
    // timed rep pays publish+probe while later reps probe only — the
    // non-iid first-rep outlier behind r11's recorded [2.46, 5.66]
    // q_cross_dedup_idx spread. Pre-paying the publish here makes every
    // timed rep measure the same thing: the probe. The CODEC families
    // (image/audio/video) warm for a third reason: their first run pays
    // ImageIO / headless / codec class-loading and JIT that no clearCache
    // can reintroduce — the cold-codec first rep behind r12's [0.94,
    // 2.81] q_image_dhash spread. A warmup failure is LOGGED, not
    // swallowed: a silently-reverted pre-pay would put the publish cost
    // back into the first timed rep — exactly the non-iid outlier this
    // warmup exists to eliminate — with nothing in the output to explain
    // the recorded spread.
    for (w <- Seq("q_repartition_count", "q_text_minhash", "q_ann_ivf",
        "q_ann_ivf_idx", "q_ann_lsh_idx", "q_ann_ivfpq_res_idx",
        "q_cross_dedup_idx",
        "q_embed_cross_dedup_idx", "q_fingerprint_index_stats",
        // the escalated-artifact stats queries publish AND escalate
        // once per session — pre-pay both so timed reps measure the
        // health read, not the rung walk
        "q_dedup_index_escalated_stats", "q_fingerprint_index_escalated_stats",
        // q_pipe_scan's SharedPlans.once publish writes the native pipe
        // tree once per session — pre-pay it like the other artifacts
        "q_pipe_scan",
        "q_image_dhash", "q_audio_fingerprint", "q_video_fingerprint"))
      try run(w) catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $w FAILED: ${e.getMessage}")
      }
    spark.catalog.clearCache()
    SharedPlans.clearFrames(spark)

    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      val elapsed =
        try { run(name); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          // a failed query must not masquerade as a fast one
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
        }
      // reps must be iid: clear both the block cache AND the SharedPlans
      // frame memo, so no rep inherits a sibling query's materialized
      // subplan (the warm/cold conflation behind r11's [0.89, 4.83]
      // q_image_dhash spread band). The once-memo survives — published
      // artifacts live on disk and their publish cost is paid in warmup.
      spark.catalog.clearCache()
      SharedPlans.clearFrames(spark)
      elapsed
    }

    val names0 = SparkEntry.queries.keys.toSeq.sorted
    // Local-iteration knob: SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the
    // timed set — the targeted quiet-host A/B instrument (e.g. the
    // multimodal-family host-inflation adjudication). The round driver
    // never sets it, so round records always cover the full registry.
    // A restricted run must NOT become the next run's prior baseline: it
    // writes its record to BENCH_PARTIAL.json instead of
    // BENCH_LOCAL.json (which selectPrior prefers — a partial prior
    // would silently disable the 2x re-measure pass for every query
    // outside the subset AND clobber the committed sf0.1 record).
    // Unknown names fail loudly — a typo'd A/B that silently times
    // nothing would read as "the query got fast".
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { keep =>
      val unknown = keep -- names0.toSet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not in the registry: ${unknown.mkString(", ")}")
    }
    val names = only match {
      case Some(keep) => names0.filter(keep)
      case None => names0
    }
    val recordFile =
      if (only.isDefined) "BENCH_PARTIAL.json" else "BENCH_LOCAL.json"
    // two interleaved passes over the whole suite, then a third rep for
    // the sub-cutoff queries (median-of-3: a single contention hit can no
    // longer move the recorded number in either direction).
    // OBSERVABILITY queries get MIN-OF-2 but never a third rep: they are
    // correctness-gated health/recall floors, not pipeline stages, so
    // their timings deserve no median-of-3 budget — but r13 proved ONE
    // rep is not adjudicable either (q_ann_recall's single un-voted
    // 21.4 s rep on a spiking host added 15 s to the headline with no
    // plan change behind it). Two interleaved reps give every recorded
    // number at least one vote against a transient; coverage is
    // unchanged — Verify still oracle-checks them every round.
    val observability = SparkEntry.ObservabilityQueries
    val pass1 = names.map(n => n -> timeOnce(n)).toMap
    val pass2 = names.map { n =>
      n -> (if (pass1(n) < 0) pass1(n) else timeOnce(n))
    }.toMap
    val reps = scala.collection.mutable.Map[String, List[Double]]()
    names.foreach { n =>
      reps(n) =
        if (pass1(n) < 0 || pass2(n) < 0) Nil
        else List(pass1(n), pass2(n))
    }
    names.foreach { n =>
      val r = reps(n)
      if (r.nonEmpty && !observability(n) && r.min < MedianRepCutoff) {
        val t = timeOnce(n)
        if (t >= 0) reps(n) = r :+ t
      }
    }
    // the slow tail gets the same median-of-3 robustness (see
    // SlowTailCount): third-rep the slowest still-2-rep queries.
    // Observability queries stay at min-of-2 here too — they'd otherwise
    // monopolize the fixed SlowTailCount budget (the recall pair IS the
    // slow tail) and displace real pipeline queries from the median-of-3
    // robustness regressions are adjudicated on.
    names.filter(n => reps(n).length == 2 && !observability(n))
      .sortBy(n => -reps(n).min).take(SlowTailCount)
      .foreach { n =>
        val t = timeOnce(n)
        if (t >= 0) reps(n) = reps(n) :+ t
      }

    val (prior, priorSrc) = loadPrior(selectPrior)
    val results = names.map { n =>
      var best = headline(reps(n))
      prior.get(n).filter(_ > 0).foreach { p =>
        var extra = 0
        while (best >= 0 && best > 2.0 * p && extra < 2) {
          System.err.println(
            f"[bench] $n re-measure ${extra + 1}: $best%.2fs > 2x prior $p%.2fs")
          val t = timeOnce(n)
          // min-based here ON PURPOSE (unlike the median headline): the
          // loop only runs when the reading already exceeds 2x the prior
          // round, i.e. the hypothesis under test is "contention
          // phantom" — one clean rep refutes it. Folding the rep into
          // the median instead would require BOTH extra reps clean
          // inside the extra<2 budget, letting the r3/r4-style
          // double-phantom survive into the artifact.
          if (t >= 0) { reps(n) = reps(n) :+ t; best = math.min(best, t) }
          extra += 1
        }
      }
      n -> best
    }
    // 4-decimal seconds (0.1 ms resolution — far below run-to-run noise):
    // the round driver's wrapper stores a WINDOW of this line and has
    // truncated the tail of every artifact so far; full-precision Doubles
    // (up to 17 digits each) roughly double the line length for nothing.
    // Locale.ROOT: a comma decimal separator would corrupt the JSON.
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.4f", v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    // -1.0 failure sentinels must not deflate the headline total. The
    // OBSERVABILITY rows (health/recall audits — correctness-gated
    // values, timings no regression decision reads) are summed into
    // their own ledger key instead of the headline (r14 verdict #4):
    // `value` now moves only with PIPELINE plans, so a new audit query
    // can never read as a perf regression; the per-query map still
    // carries every row.
    val total = results.collect {
      case (k, v) if v >= 0 && !observability(k) => v }.sum
    val obsTotal = results.collect {
      case (k, v) if v >= 0 && observability(k) => v }.sum
    // LIKE-FOR-LIKE companion: the headline total moves with BOTH plan
    // changes and registry growth, so round-over-round adjudication kept
    // needing forensic reconstruction (r13). `lfl` sums only the queries
    // present in the PRIOR ROUND's record, next to the prior's sum over
    // the same keys — host inflation reads directly off lfl/lfl_prior
    // while new queries' cost reads off (total - lfl). The lfl baseline
    // PREFERS the driver's BENCH_r*.json over BENCH_LOCAL ([[
    // selectLflPrior]]) and names its source in `lfl_src`, so the ratio
    // is provably cross-round. Empty prior (first round, or a same-round
    // re-run inside the skip window) → omitted.
    val (lflBase, lflSrc) = loadPrior(selectLflPrior)
    val lflPairs = results.filter { case (k, v) =>
      v >= 0 && lflBase.get(k).exists(_ > 0) }
    val lflKeys = lflPairs.map(_._1)
    val lfl = lflPairs.map(_._2).sum
    val lflPrior = lflKeys.map(lflBase).sum
    val lflJson = if (lflKeys.isEmpty) ""
      else s""","lfl":${num(lfl)},"lfl_prior":${num(lflPrior)},"lfl_n":${lflKeys.size}""" +
        lflSrc.fold("")(src => s""","lfl_src":"$src"""")
    val srcJson = priorSrc.fold("")(src => s""","prior_src":"$src"""")
    val line = s"""{"metric":"total","value":${num(total)},"unit":"sec","observability":${num(obsTotal)}$lflJson$srcJson,"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // The round driver stores only a TAIL window of stdout (~2 kB), so the
    // head of the big line — the total plus the alphabetically-first
    // queries — is exactly what truncates. Two defenses:
    //   1. the FULL line is written to BENCH_LOCAL.json in the working
    //      directory (the repo), so every per-query time is always
    //      readable regardless of what the stdout capture kept;
    //   2. a SHORT summary line prints LAST — last bytes survive a tail
    //      window — carrying the total, the query count, and the five
    //      slowest queries (the ones a reviewer triages first).
    // BENCH_LOCAL.json additionally carries per-query [min, max] spread —
    // the reviewer's variance context — kept OFF the stdout line so the
    // driver's tail window stays dense with headline numbers
    val spread = names.filter(n => reps(n).nonEmpty)
      .map(n => "\"" + n + "\":[" + num(reps(n).min) + "," + num(reps(n).max) + "]")
      .mkString("{", ",", "}")
    val localLine = line.stripSuffix("}") + s""","spread":$spread}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(recordFile),
      (localLine + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] $recordFile write failed: ${e.getMessage}")
    }
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(5)
      .map { case (k, v) => "\"" + k + "\":" + num(v) }.mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    println(s"""{"metric":"bench_summary","total":${num(total)},"observability":${num(obsTotal)},"n":${results.size},"failed":$failed$lflJson,"slowest":$slowest,"sf":"$sfDir"}""")
    spark.stop()
  }
}
