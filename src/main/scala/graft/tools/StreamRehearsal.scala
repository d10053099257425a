package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
import org.apache.spark.sql.streaming.StreamingQuery

/** Scale-rehearsal point for the STREAMING family (VERDICT r11
  * prescription #1): the batch surface has six audited 10×/100×
  * artifacts; this gives the heavyweight streaming chains the same
  * treatment. The 10× document/embedding corpus (the ScaleRehearsal
  * slice discipline: two verbatim copies so cross-copy dup density grows
  * with the corpus, the rest perturbed) is replayed in BOUNDED
  * micro-batches through a file-source stream — `waves` equal shards of
  * the corpus, one wave of parquet files dropped into the source
  * directory per `processAllAvailable()` round, so every wave is one
  * data micro-batch (plus Spark's watermark-advance no-data batches).
  *
  * Per wave, per operator, it records: wall-clock, input rows, the
  * state-store rows/bytes from the `stateOperators` progress metrics,
  * and the SAME flip/broadcast audit the batch rehearsals run
  * ([[PlanWalk]]) on the micro-batch's `IncrementalExecution`
  * executedPlan. Why per-batch plans matter: stream-static joins
  * RE-PLAN the static side every micro-batch — a frame planned as a
  * broadcast at spec scale can stay a data-scaled broadcast at 10×, and
  * nothing before this tool gated that. (A trailing no-data batch
  * re-plans the identical logical plan — streaming planning is
  * non-adaptive, the static side's strategy depends only on its own
  * stats — so auditing the wave's last execution cannot hide a
  * structural killer from its data batch.)
  *
  * Operators rehearsed (the heavyweight chains):
  *   - curation_admission — the COMPOSED quality→decontaminate→DSIR→
  *     budget chain; state must stay O(#sources) FLAT across waves
  *   - qsketch_ingest    — windowed quantile-sketch state; watermark
  *     eviction must hold state at O(open windows × sources), FLAT
  *   - sem_ingest_dedup  — stream-static admission against the stored
  *     keeper table; ZERO state, per-batch join plan audited
  *   - phash_neardup     — probe-bucket membership state; grows LINEARLY
  *     with distinct corpus by design (≤ 49 rows/doc, gated), the
  *     documented pre-watermark-eviction contract
  *   - bloom_decontaminate — the r12 fixed-size-literal gate; ZERO state,
  *     narrow projection
  *   - lm_quality_admission (tier 2) — the ONLY stream-static join in
  *     the family whose static side is CORPUS-SCALED (the stored bigram
  *     model, ~5M rows at 10×): static planning must keep it off the
  *     broadcast class; per-doc groups close in-batch, zero carried state
  *   - eval_contamination (tier 2) — stream-static join against the
  *     benchmark window-hash set; zero carried state
  *   - cms_ingest (tier 2) — the d·w windowed sketch grid; state FLAT at
  *     O(cells × open windows) regardless of vocabulary or stream length
  *   - activity_admission (tier 2) — the watched-set monitor over a 10×
  *     events slice replayed in EVENT-TIME order (waves = time octiles);
  *     watch set bounded by configuration (its deployment contract),
  *     state stationary under a stationary feed
  *
  * Gates (exit 1): any cartesian/unbounded-BNLJ flip in any wave's plan;
  * any unmeasured broadcast; any broadcast failing the two-arm
  * rows-or-bytes bound (the r12 curation gate's rule); bounded-state
  * operators drifting past their contract bound; stateless operators
  * reporting state; the curation gates not all engaging (a pass-all
  * chain proves nothing).
  *
  * Usage: runMain graft.tools.StreamRehearsal [srcSfDir] [workDir] [outJson]
  * Env: SPARK_GRAFT_STREAM_COPIES (default 10),
  *      SPARK_GRAFT_STREAM_WAVES (default 8).
  * Writes one JSON line to stdout AND to outJson (default BENCH_stream.json).
  */
object StreamRehearsal {

  private val T0 = 1700000000000000L // µs epoch base (the spec family's)
  private val WaveUs = 600000000L    // 10 min of event time per wave

  // same two-arm rule as ScaleRehearsal's curation gate: a broadcast is
  // fine iff its CONTENT is row-bounded (literal/offset/artifact frames;
  // dataSize is page-allocated and lies about small frames) or its
  // measured bytes are small. The row cap is sized to the largest
  // LEGITIMATE static artifact here — the semantic-dedup keeper table,
  // ≤ the base-corpus keeper count (≤ 45k at 10×; a stream-side frame
  // can never appear under a broadcast: the stream is always the probe
  // side of a stream-static join).
  private val BcastRowCap = 65536L
  private val BcastByteCap = 32L << 20

  final case class WaveStat(wave: Int, inputRows: Long, wallSec: Double,
      stateRows: Long, stateBytes: Long, batches: Int,
      killers: Seq[String], bcasts: Seq[PlanWalk.Bcast]) {
    def json: String =
      s"""{"wave":$wave,"input_rows":$inputRows,"wall_sec":$wallSec,""" +
        s""""state_rows":$stateRows,"state_bytes":$stateBytes,""" +
        s""""batches":$batches,""" +
        s""""broadcasts":[${bcasts.map(_.json).mkString(",")}]}"""
  }

  private def deleteRec(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }

  /** Drop one wave's parquet part-files into the live source directory
    * (prefixed so names never collide across waves) — the bounded
    * micro-batch: the file source picks up exactly these files in its
    * next trigger. */
  private def copyWave(waveDir: String, feedDir: String, w: Int): Unit = {
    import scala.jdk.CollectionConverters._
    val src = java.nio.file.Paths.get(waveDir)
    java.nio.file.Files.list(src).iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("part-") && !n.endsWith(".crc")
      }
      .foreach { p =>
        java.nio.file.Files.copy(p,
          java.nio.file.Paths.get(feedDir, s"w${w}_${p.getFileName}"))
      }
  }

  /** Replay the waves through one operator: per wave, copy files, drain,
    * snapshot progress + state metrics, audit the last execution's plan.
    * Output goes to a memory sink (bounded here: verdict/pair/window rows,
    * never the corpus) so emitted-row counts are checkable. */
  private def runOp(spark: SparkSession, name: String,
      waveDirs: Seq[String], workDir: String)
      (mk: DataFrame => DataFrame): (Seq[WaveStat], Long) = {
    val feedDir = s"$workDir/feed_$name"
    deleteRec(java.nio.file.Paths.get(feedDir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(feedDir))
    val schema = spark.read.parquet(waveDirs.head).schema
    val stream = spark.readStream.schema(schema).parquet(feedDir)
    val q: StreamingQuery = mk(stream).writeStream
      .format("memory").queryName(s"sr_$name").outputMode("append").start()
    val stats = waveDirs.zipWithIndex.map { case (wd, w) =>
      val nBefore = q.recentProgress.length
      val t0 = System.nanoTime()
      copyWave(wd, feedDir, w)
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      val progs = q.recentProgress.drop(nBefore)
      val inputRows = progs.map(_.numInputRows).sum
      // state snapshot at wave end: the last progress carrying state
      // operators (a trailing no-data batch reports post-eviction state,
      // which is exactly the steady-state number the gate wants)
      val so = progs.reverse.map(_.stateOperators).find(_.nonEmpty)
      val (sRows, sBytes) = so
        .map(s => (s.map(_.numRowsTotal).sum, s.map(_.memoryUsedBytes).sum))
        .getOrElse((0L, 0L))
      val exec = q.asInstanceOf[StreamingQueryWrapper].streamingQuery.lastExecution
      val nodes = PlanWalk.walk(exec.executedPlan)
      WaveStat(w, inputRows, wall, sRows, sBytes, progs.length,
        PlanWalk.planKillers(nodes), PlanWalk.broadcasts(nodes))
    }
    val outRows = spark.table(s"sr_$name").count()
    q.stop()
    (stats, outRows)
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse("/tmp/graft_stream")
    val outJson = args.lift(2).getOrElse("BENCH_stream.json")
    val copies = sys.env.getOrElse("SPARK_GRAFT_STREAM_COPIES", "10").toInt
    val waves = sys.env.getOrElse("SPARK_GRAFT_STREAM_WAVES", "8").toInt
    val spark = Tables.session("graft-stream-rehearsal")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(workDir))

    def sliceIsCurrent(metaPath: String, fingerprint: String): Boolean = {
      val f = java.nio.file.Paths.get(metaPath)
      java.nio.file.Files.exists(f) &&
        java.nio.file.Files.readString(f).trim == fingerprint
    }
    def commitSlice(metaPath: String, fingerprint: String): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(metaPath), fingerprint)

    // ---- 10× corpora, pre-sharded into waves -------------------------
    // Event time is WAVE-ALIGNED: wave w's documents live in
    // [T0 + w·10min, T0 + (w+1)·10min), so each arriving wave advances
    // the watermark past the previous wave's windows — closed windows
    // must EVICT, which is the flat-state claim under test. (A stream
    // whose event time never advances would trivially hold state flat at
    // one window and prove nothing.)
    val D_OFF = 10000000L
    val docsFp = s"src=$src copies=$copies waves=$waves v3"
    val docsMeta = s"$workDir/docs_meta.txt"
    if (!sliceIsCurrent(docsMeta, docsFp)) {
      val base = Tables.documents(spark, src)
      val scaled = (0 until copies).map { i =>
        val d = base.withColumn("doc_id", col("doc_id") + lit(i * D_OFF))
        if (i <= 1) d
        else d.withColumn("text",
          concat(col("text"), lit(s" uniq$i "), (col("doc_id") % 97).cast("string")))
      }.reduce(_ unionByName _)
        .withColumn("n_chars", length(col("text")).cast("long"))
        // hash-assigned waves: doc_id % waves correlates with the
        // corpus's source assignment (both are id-residue classes), which
        // made each wave carry only gcd-many sources — every wave must
        // mix ALL sources for the per-source state/budget readout to mean
        // anything
        .withColumn("wave", pmod(hash(col("doc_id")), lit(waves)).cast("int"))
        .withColumn("ts_us", lit(T0) + col("wave").cast("long") * lit(WaveUs) +
          pmod(hash(col("doc_id")), lit(WaveUs.toInt)).cast("long"))
      scaled.repartition(32).write.mode("overwrite")
        .parquet(s"$workDir/documents.parquet")
      val full = spark.read.parquet(s"$workDir/documents.parquet")
      (0 until waves).foreach { w =>
        full.filter(col("wave") === w).drop("wave")
          .repartition(4).write.mode("overwrite").parquet(s"$workDir/docs_waves/w$w")
      }
      commitSlice(docsMeta, docsFp)
    }
    val docsSlice = spark.read.parquet(s"$workDir/documents.parquet").drop("wave")
    val nDocs = docsSlice.count()
    val nSources = docsSlice.select("source").distinct().count()
    val docWaveDirs = (0 until waves).map(w => s"$workDir/docs_waves/w$w")

    val embFp = s"src=$src copies=$copies waves=$waves v2"
    val embMeta = s"$workDir/emb_meta.txt"
    if (!sliceIsCurrent(embMeta, embFp)) {
      val emb = Tables.embeddings(spark, src)
      (0 until copies).map { i =>
        emb.withColumn("vec_id", col("vec_id") + lit(i * D_OFF))
      }.reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite")
        .parquet(s"$workDir/embeddings.parquet")
      // the crawl-increment shape (d14): base = all but the last copy
      // (its keepers are the stored artifact), the stream = the last
      // copy's vectors, wave-sharded
      val inc = spark.read.parquet(s"$workDir/embeddings.parquet")
        .filter(col("vec_id") >= (copies - 1).toLong * D_OFF)
        .withColumn("wave", pmod(hash(col("vec_id")), lit(waves)).cast("int"))
      (0 until waves).foreach { w =>
        inc.filter(col("wave") === w).drop("wave")
          .repartition(2).write.mode("overwrite").parquet(s"$workDir/emb_waves/w$w")
      }
      commitSlice(embMeta, embFp)
    }
    val embSlice = spark.read.parquet(s"$workDir/embeddings.parquet")
    val baseMax = (copies - 1).toLong * D_OFF
    val embWaveDirs = (0 until waves).map(w => s"$workDir/emb_waves/w$w")

    // Which chains to replay (default: all nine). The 100× point runs
    // with phash_neardup EXCLUDED and documented at its 10× point: a
    // near-dup PAIR stream's output is quadratic in duplicate
    // multiplicity (the slice's verbatim copies collide by design —
    // 9.5M pairs at 10× would be ~100× that at 100×), which is exactly
    // why the batch dedup family reports clusters/keepers at scale, not
    // pairs; the stream form documents the same contract.
    val allOps = Seq("curation_admission", "qsketch_ingest",
      "sem_ingest_dedup", "phash_neardup", "bloom_decontaminate",
      // tier 2 (r12): the stream-static joins against CORPUS-SCALED
      // model tables (lm), the benchmark window set (eval), the
      // windowed CMS grid, and the watched-set activity monitor
      "lm_quality_admission", "eval_contamination", "cms_ingest",
      "activity_admission")
    val opsSel: Set[String] = sys.env.get("SPARK_GRAFT_STREAM_OPS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(allOps.toSet)
    require(opsSel.subsetOf(allOps.toSet), s"unknown ops: ${opsSel -- allOps}")

    // ---- the deployed batch artifacts the streams run against --------
    // (trained on the PIPELINE INPUT corpus — the full slice — matching
    // the batch chain's decontaminateAgainst/benchmarkShingleHashes
    // semantics)
    val benchHashes = graft.data.TextOps.benchmarkShingleHashes(docsSlice)
    val weights = graft.data.TextOps.dsirBucketWeightArray(docsSlice)
    val bloomBits = graft.data.TextOps.benchBloomBits(docsSlice)
    // The budget must ENGAGE (a pass-all run proves nothing), so derive
    // it from the measured pre-gate pressure instead of guessing: the
    // stream's quality/contamination/DSIR gates are spec-equal to the
    // batch x16/x12/x50 frames, so the per-source gated token totals ARE
    // the admission pressure. Budget = half the MINIMUM source's
    // pressure ⇒ every source exhausts it mid-stream, and the first
    // gated doc per source always admits, so neither direction can go
    // vacuous. (The DSIR RESAMPLING gate is intentionally sparse — it
    // keeps ~2^-u of docs — so a hand-picked "∝ corpus" constant sits
    // above the real pressure and silently de-fangs the budget leg,
    // which is exactly what the first r12 runs showed.)
    val (gatedMin, gatedMax) =
      if (!opsSel("curation_admission")) (-1L, -1L)
      else {
        val r = docsSlice
          .join(graft.data.TextOps.filterFlags(docsSlice)
            .select(col("doc_id"), col("keep")), "doc_id")
          .join(graft.data.TextOps.importanceResample(docsSlice)
            .select(col("doc_id"), col("accept")), "doc_id")
          .join(graft.data.TextOps.decontaminate(docsSlice)
            .select(col("doc_id"), col("is_contaminated")), "doc_id")
          .join(graft.data.TextOps.tokenCount(docsSlice)
            .select("doc_id", "bpe_tokens"), "doc_id")
          .filter(col("keep") && col("accept") && !col("is_contaminated"))
          .groupBy("source").agg(sum("bpe_tokens").as("t"))
          .agg(min("t").as("mn"), max("t").as("mx")).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
    val budget = math.max(1L, gatedMin / 2)
    // keepers go THROUGH parquet (the deployment shape the scaladoc
    // documents: "the static side is the stored keeper parquet re-read
    // per micro-batch") — also required here: the in-session frame rides
    // on SharedFrames localCheckpoints, which clear() drops while the
    // stream would still re-plan it every batch
    val (cent, keepers) =
      if (!opsSel("sem_ingest_dedup")) (Nil, null)
      else {
        val k = graft.data.VectorOps.autoCells(
          embSlice.filter(col("vec_id") < baseMax))
        val c = graft.data.VectorOps.convergedCentroids(
          embSlice.filter(col("vec_id") < baseMax), k = k, maxIter = 8)
        val keepersPath = s"$workDir/keepers.parquet"
        graft.data.VectorOps.semBaseKeepers(
          embSlice, baseMaxId = baseMax, k = k, maxIter = 8)
          .write.mode("overwrite").parquet(keepersPath)
        (c, spark.read.parquet(keepersPath))
      }
    // ---- tier-2 batch artifacts (through parquet: the deployment shape
    // AND a SharedFrames-safety requirement — the in-session model
    // frames ride on localCheckpoints that clear() drops while a stream
    // re-plans its static side every batch) ----------------------------
    // lm: the stored bigram model is CORPUS-SCALED (~5M rows at 10×) —
    // this is the one stream-static join in the family whose static side
    // grows with the corpus, which is exactly why it belongs in the
    // rehearsal: static planning must keep it a shuffle-side join (or a
    // measured broadcast below cap), never a forced corpus broadcast.
    val (lmBi, lmUni, lmThr) =
      if (!opsSel("lm_quality_admission")) (null, null, 0.0)
      else {
        val (bi, uniB) = graft.data.TextOps.bigramLmModel(docsSlice)
        bi.write.mode("overwrite").parquet(s"$workDir/lm_bi.parquet")
        uniB.write.mode("overwrite").parquet(s"$workDir/lm_uni.parquet")
        // threshold at the corpus median ⇒ the admission gate provably
        // engages in BOTH directions (the budget-derivation lesson)
        val thr = graft.data.TextOps.bigramSurprisal(docsSlice)
          .select(expr(
            "percentile_approx(bits_q / n_bigrams / 1048576e0, 0.5)"))
          .collect()(0).getDouble(0)
        (spark.read.parquet(s"$workDir/lm_bi.parquet"),
          spark.read.parquet(s"$workDir/lm_uni.parquet"), thr)
      }
    val benchWins =
      if (!opsSel("eval_contamination")) null
      else {
        graft.data.TextOps.evalBenchmarkWindows(docsSlice)
          .write.mode("overwrite").parquet(s"$workDir/bench_windows.parquet")
        spark.read.parquet(s"$workDir/bench_windows.parquet")
      }
    // activity: a 10× events slice replayed in EVENT-TIME order (waves =
    // time octiles — an admission monitor consumes an ordered feed), the
    // watch set BOUNDED by configuration (30 watched users), which is
    // the operator's documented deployment contract: the monitor scores
    // arrivals against a stored watch list, never corpus × corpus.
    val (evtWaveDirs, qprof, evtT0, evtSpan, actThr, actWin) =
      if (!opsSel("activity_admission"))
        (Seq.empty[String], null, 0L, 1L, 0L, "1 minute")
      else {
        val U_OFF = 1000000L // multiple of 5: shifted ids keep the %5 rule
        val evtFp = s"src=$src copies=$copies waves=$waves v1"
        val evtMeta = s"$workDir/evt_meta.txt"
        if (!sliceIsCurrent(evtMeta, evtFp)) {
          val base = Tables.events(spark, src).select("user_id", "ts_us")
          (0 until copies).map { i =>
            base.withColumn("user_id", col("user_id") + lit(i * U_OFF))
          }.reduce(_ unionByName _)
            .repartition(32).write.mode("overwrite")
            .parquet(s"$workDir/evt_events.parquet")
          commitSlice(evtMeta, evtFp)
        }
        val ev = spark.read.parquet(s"$workDir/evt_events.parquet")
        val mm = ev.agg(min("ts_us"), max("ts_us")).collect()(0)
        val (t0e, t1e) = (mm.getLong(0), mm.getLong(1))
        val spanUs = t1e - t0e + 1
        val wavesFp = s"$evtFp t0=$t0e"
        val wavesMeta = s"$workDir/evt_waves_meta.txt"
        if (!sliceIsCurrent(wavesMeta, wavesFp)) {
          val withWave = ev.withColumn("wave", least(
            floor((col("ts_us") - lit(t0e)) * waves / lit(spanUs)),
            lit(waves - 1)).cast("int"))
          (0 until waves).foreach { w =>
            withWave.filter(col("wave") === w).drop("wave")
              .repartition(4).write.mode("overwrite")
              .parquet(s"$workDir/evt_waves/w$w")
          }
          commitSlice(wavesMeta, wavesFp)
        }
        // the q32 sparse profile of the WATCHED users only (ids ≡ 0
        // mod 500 — ~3 per copy), stored as the deployment artifact
        val sparse = ev
          .withColumn("bucket",
            expr(s"((ts_us - ${t0e}L) * 64) div ${spanUs}L"))
          .groupBy("user_id", "bucket").agg(count(lit(1)).as("n"))
        sparse.filter(col("user_id") % 5 === 0 && col("user_id") % 500 === 0)
          .select(col("user_id").as("q_user"), col("bucket"),
            col("n").as("q_n"))
          .write.mode("overwrite").parquet(s"$workDir/qprof.parquet")
        val qp = spark.read.parquet(s"$workDir/qprof.parquet")
        // window = span/32 (≥ 4 windows per wave, so closed windows must
        // evict within the run), expressed in minutes for the duration
        val winMin = math.max(1L, spanUs / 32 / 60000000L)
        // flag threshold at the median PER-WINDOW dot — the exact
        // quantity the stream emits (a full-span median sits ~32× above
        // every windowed dot and silently un-engages the flag, which is
        // what the first r12 tier-2 run showed) ⇒ both verdicts occur
        val thr = ev
          .withColumn("bucket",
            expr(s"((ts_us - ${t0e}L) * 64) div ${spanUs}L"))
          .withColumn("w", expr(s"ts_us div ${winMin * 60000000L}L"))
          .join(qp, "bucket")
          .filter(col("user_id") =!= col("q_user"))
          .groupBy("w", "user_id", "q_user").agg(sum("q_n").as("dot"))
          .select(expr("percentile_approx(dot, 0.5)")).collect()(0).getLong(0)
        (0 until waves).map(w => s"$workDir/evt_waves/w$w").toSeq match {
          case dirs => (dirs, qp, t0e, spanUs, thr, s"$winMin minutes")
        }
      }
    graft.data.SharedFrames.clear()

    // ---- replay every selected operator -------------------------------
    val results = Seq.newBuilder[(String, Seq[WaveStat], Long)]
    def rehearse(name: String, dirs: Seq[String])
        (mk: DataFrame => DataFrame): Option[Seq[WaveStat]] =
      if (!opsSel(name)) None
      else {
        val (stats, outRows) = runOp(spark, name, dirs, workDir)(mk)
        results += ((name, stats, outRows))
        Some(stats)
      }

    val curStats = rehearse("curation_admission", docWaveDirs)(df =>
      graft.streaming.StreamingAnalytics.curationAdmissionStream(
        df, benchHashes, weights, budgetTokens = budget).toDF())
    val qsStats = rehearse("qsketch_ingest", docWaveDirs)(df =>
      graft.streaming.StreamingAnalytics.qsketchIngestStream(
        df, k = 64, windowLength = "1 minute", watermarkDelay = "2 minutes"))
    val semStats = rehearse("sem_ingest_dedup", embWaveDirs)(df =>
      graft.streaming.StreamingAnalytics.semIngestDedup(df, cent, keepers))
    val phStats = rehearse("phash_neardup", docWaveDirs)(df =>
      graft.streaming.StreamingAnalytics.phashNearDupStream(
        df.select("doc_id", "text")).toDF())
    val blStats = rehearse("bloom_decontaminate", docWaveDirs)(df =>
      graft.streaming.StreamingAnalytics.bloomDecontaminationStream(df, bloomBits))
    val lmStats = rehearse("lm_quality_admission", docWaveDirs)(df =>
      graft.streaming.StreamingAnalytics.lmQualityAdmissionStream(
        df.select("doc_id", "text"), lmBi, lmUni,
        oovBits = 99L << 20, maxBitsPerBigram = lmThr).toDF())
    val evStats = rehearse("eval_contamination", docWaveDirs)(df =>
      graft.streaming.StreamingAnalytics.evalContaminationStream(
        // the benchmark docs are the GATE side, not the feed — the batch
        // audit's domain (x39 reports training docs only)
        df.filter(col("doc_id") >= 10).select("doc_id", "text"),
        benchWins).toDF())
    val cmsStats = rehearse("cms_ingest", docWaveDirs)(df =>
      graft.streaming.StreamingAnalytics.cmsIngestStream(
        df, windowLength = "1 minute", watermarkDelay = "2 minutes"))
    val actStats = rehearse("activity_admission", evtWaveDirs)(df =>
      graft.streaming.StreamingAnalytics.activityAdmissionStream(
        df, qprof, t0Us = evtT0, spanUs = evtSpan,
        dotThreshold = actThr, windowLength = actWin,
        watermarkDelay = actWin))

    // ---- gates --------------------------------------------------------
    val fails = Seq.newBuilder[String]
    val all = results.result()
    all.foreach { case (op, stats, _) =>
      stats.foreach { s =>
        s.killers.foreach(x => fails += s"$op:w${s.wave}:$x")
        s.bcasts.filter(_.bytes == -1L)
          .foreach(_ => fails += s"$op:w${s.wave}:unmeasured_broadcast")
        s.bcasts.filterNot(PlanWalk.bounded(_, BcastRowCap, BcastByteCap))
          .foreach(b => fails += s"$op:w${s.wave}:broadcast_unbounded(" +
            s"rows=${b.rows},bytes=${b.bytes},content=${b.contentBytes}," +
            s"frame=${b.frame})")
      }
    }
    // bounded-state contracts: FLAT across waves, not merely small at the
    // end — a leak that doubles per wave would still look bounded on the
    // last wave of a short rehearsal
    def flat(op: String, stats: Seq[WaveStat], bound: Long): Unit = {
      val mx = stats.map(_.stateRows).max
      if (mx > bound) fails += s"$op:state_rows_unbounded($mx > $bound)"
    }
    curStats.foreach(flat("curation_admission", _, bound = nSources * 2))
    // qsketch: open windows ≤ wave span/window + watermark horizon + the
    // boundary window; ×2 slack for the hash spread of ts within a wave
    val winPerWave = WaveUs / 60000000L
    qsStats.foreach(flat("qsketch_ingest", _,
      bound = (winPerWave + 3) * nSources * 2))
    // cms: the sketch grid is d·w cells per open window — the whole point
    // of CMS is that this never grows with vocabulary or stream length
    cmsStats.foreach(flat("cms_ingest", _,
      bound = (winPerWave + 3) * 4 * 64 * 2))
    // activity: state = (open windows × active users × matched WATCHED
    // users) — bounded by the watermark horizon and the configured watch
    // set, so across a stationary feed it must be stationary: the worst
    // late-half wave may not exceed 2× the worst early-half wave
    actStats.foreach { st =>
      val (early, late) = st.map(_.stateRows).splitAt(st.size / 2)
      if (late.max > early.max * 2)
        fails += s"activity_admission:state_drift(${early.max} -> ${late.max})"
    }
    // stateless contracts (lm/eval groups close within their own batch:
    // a document is one input row, nothing is carried)
    Seq(("sem_ingest_dedup", semStats), ("bloom_decontaminate", blStats),
      ("lm_quality_admission", lmStats), ("eval_contamination", evStats))
      .foreach { case (op, stOpt) =>
        stOpt.foreach { st =>
          val mx = st.map(_.stateRows).max
          if (mx != 0L) fails += s"$op:unexpected_state($mx rows)"
        }
      }
    // phash: membership state grows with the DISTINCT corpus by design
    // (pre-watermark-eviction contract) — gate the growth is ≤ its exact
    // construction bound, 49 probe rows per arriving doc
    var cum = 0L
    phStats.getOrElse(Nil).foreach { s =>
      cum += s.inputRows
      if (s.stateRows > 49L * cum)
        fails += s"phash_neardup:w${s.wave}:state_superlinear(${s.stateRows} > ${49L * cum})"
    }
    // every wave of every op must actually have ingested its shard
    all.foreach { case (op, stats, _) =>
      stats.filter(_.inputRows == 0L)
        .foreach(s => fails += s"$op:w${s.wave}:empty_wave")
    }
    // the composed curation chain's gates must all ENGAGE at this scale
    if (curStats.isDefined) {
      val verdicts = spark.table("sr_curation_admission")
      def n(c: org.apache.spark.sql.Column): Long = verdicts.filter(c).count()
      if (n(col("admitted")) == 0L) fails += "curation:nothing_admitted"
      if (n(!col("keep_quality")) == 0L) fails += "curation:quality_vacuous"
      if (n(col("is_contaminated")) == 0L) fails += "curation:decontamination_vacuous"
      if (n(col("keep_quality") && !col("is_contaminated") &&
          !col("dsir_admitted")) == 0L) fails += "curation:dsir_vacuous"
      if (n(col("keep_quality") && !col("is_contaminated") &&
          col("dsir_admitted") && !col("admitted")) == 0L)
        fails += "curation:budget_vacuous"
      if (verdicts.count() != nDocs) fails += "curation:verdict_count_mismatch"
    }
    // tier-2 engagement: every gate must fire in BOTH directions — a
    // monitor that only ever says yes (or no) at this scale proves nothing
    if (lmStats.isDefined) {
      val lm = spark.table("sr_lm_quality_admission")
      if (lm.filter(col("admitted")).count() == 0L ||
          lm.filter(!col("admitted")).count() == 0L)
        fails += "lm:admission_vacuous"
    }
    if (evStats.isDefined) {
      val ev = spark.table("sr_eval_contamination")
      if (ev.filter(col("n_hit_windows") > 0).count() == 0L ||
          ev.filter(col("n_hit_windows") === 0).count() == 0L)
        fails += "eval:contamination_vacuous"
    }
    if (actStats.isDefined) {
      val act = spark.table("sr_activity_admission")
      if (act.filter(col("flagged")).count() == 0L ||
          act.filter(!col("flagged")).count() == 0L)
        fails += "activity:flag_vacuous"
    }

    val failList = fails.result()
    val total = all.flatMap(_._2.map(_.wallSec)).sum
    val json =
      s"""{"metric":"stream_rehearsal","value":$total,"unit":"sec",""" +
        s""""copies":$copies,"waves":$waves,"n_docs":$nDocs,""" +
        s""""n_sources":$nSources,"n_base_vecs":${embSlice.filter(col("vec_id") < baseMax).count()},""" +
        s""""budget_tokens":$budget,"gated_tokens_min_source":$gatedMin,""" +
        s""""gated_tokens_max_source":$gatedMax,"src":"$src",""" +
        s""""bcast_row_cap":$BcastRowCap,"bcast_byte_cap":$BcastByteCap,""" +
        s""""ops":${
          all.map { case (op, stats, outRows) =>
            "\"" + op + "\":{\"out_rows\":" + outRows +
              ",\"wall_sec\":" + stats.map(_.wallSec).sum +
              ",\"state_rows_last\":" + stats.last.stateRows +
              ",\"state_bytes_max\":" + stats.map(_.stateBytes).max +
              ",\"waves\":[" + stats.map(_.json).mkString(",") + "]}"
          }.mkString("{", ",", "}")},""" +
        s""""gate_fails":[${failList.map("\"" + _ + "\"").mkString(",")}]}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
    spark.stop()
    if (failList.nonEmpty) {
      System.err.println(s"[stream] GATE FAILURES: ${failList.mkString(", ")}")
      sys.exit(1)
    }
  }
}
