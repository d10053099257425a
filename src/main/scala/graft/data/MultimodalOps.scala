package graft.data

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads with typed metadata,
  * processed in executor-side batches via mapPartitions (the Scala analog
  * of mapInPandas for decode / feature-extract / resize stages).
  *
  * The decode step is STUBBED with a deterministic byte-level feature
  * extractor (this container has no image/audio codecs); everything
  * around it — binary column, schema, partition-batch iteration, typed
  * output — is the real Spark shape a production decoder would drop into.
  */
object MultimodalOps {

  /** Bytes whose counts form the fake "feature vector". */
  val FeatureBytes: Seq[Char] = Seq('a', 'e', 's', 't', ' ', 'r', 'o', 'n')

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long,
      f_a: Long, f_e: Long, f_s: Long, f_t: Long,
      f_sp: Long, f_r: Long, f_o: Long, f_n: Long)

  /** documents → binary payload column (stand-in for image/audio bytes). */
  def asBinary(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  final case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Long, f_e: Long)
  final case class Resized(doc_id: Long, n_in: Long, n_out: Long, checksum: Long)

  /** m3 — "resize": downsample the binary payload by `stride` (the
    * image-resize shape — a real resizer would interpolate pixels; the
    * stub keeps every stride-th byte). Narrow per-partition transform;
    * output carries the downsampled length and a byte-sum checksum the
    * oracle recomputes. */
  def resize(documents: DataFrame, stride: Int = 4): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val media: Dataset[MediaRow] = asBinary(documents).as[MediaRow]
    media.mapPartitions { rows =>
      rows.map { r =>
        var i = 0
        var n = 0L
        var sum = 0L
        while (i < r.payload.length) {
          n += 1
          sum += r.payload(i) & 0xff
          i += stride
        }
        Resized(r.doc_id, r.payload.length.toLong, n, sum)
      }
    }.toDF()
  }

  /** m2 — frame sampling: chunk the binary payload into fixed-size frames
    * and keep every `stride`-th one (the video-frame-sampling shape: a real
    * decoder would demux to frames here; the stub chunks raw bytes). Narrow
    * per-partition transform, no shuffle; each frame carries a cheap
    * feature (count of byte 'e') the oracle can recompute. */
  def sampleFrames(documents: DataFrame, frameBytes: Int = 64, stride: Int = 2): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val media: Dataset[MediaRow] = asBinary(documents).as[MediaRow]
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val nFrames = (r.payload.length + frameBytes - 1) / frameBytes
        (0 until nFrames).iterator.filter(_ % stride == 0).map { i =>
          val from = i * frameBytes
          val until = math.min(from + frameBytes, r.payload.length)
          var fe = 0L
          var j = from
          while (j < until) { if (r.payload(j) == 'e'.toByte) fe += 1; j += 1 }
          Frame(r.doc_id, i, (until - from).toLong, fe)
        }
      }
    }.toDF()
  }

  /** m1 — batch feature extraction over binary payloads. The per-partition
    * loop is where a real decoder (JNI codec, ONNX session, …) would be
    * initialized once per partition and fed row batches. */
  def extractFeatures(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val media: Dataset[MediaRow] = asBinary(documents).as[MediaRow]
    media.mapPartitions { rows =>
      // per-partition init of the (stubbed) decoder happens here
      rows.map { r =>
        val counts = new Array[Long](FeatureBytes.length)
        var i = 0
        while (i < r.payload.length) {
          val b = r.payload(i).toChar
          var j = 0
          while (j < FeatureBytes.length) {
            if (b == FeatureBytes(j)) counts(j) += 1
            j += 1
          }
          i += 1
        }
        MediaFeatures(r.doc_id, r.payload.length.toLong,
          counts(0), counts(1), counts(2), counts(3),
          counts(4), counts(5), counts(6), counts(7))
      }
    }.toDF()
  }

  /** m4 — multimodal sequence packing: each document costs its text
    * tokens (x3's BPE bound) PLUS the patch tokens its media payload
    * decodes to (ViT-style one token per 64-byte patch of the stand-in
    * payload, i.e. ceil(n_chars/64)), and documents pack greedily in
    * doc_id order into fixed token-budget training sequences — the
    * batch-shaping pass of a multimodal trainer, where text and vision
    * tokens share one context window.
    *
    * Same two-phase global prefix sum as x15 (per-partition cumsum, then
    * broadcast partition offsets) — never a single-partition window over
    * the data, so the packing scales with partitions. */
  def packMultimodal(documents: DataFrame, budget: Long = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val costs = documents.select(col("doc_id"),
      expr("""aggregate(transform(split(text, ' '),
           w -> CAST(floor((length(w) + 3) / 4.0) AS BIGINT)),
         CAST(0 AS BIGINT), (acc, x) -> acc + x)""").as("txt_tokens"),
      expr("(n_chars + 63) DIV 64").as("img_tokens"))
      .withColumn("cost", col("txt_tokens") + col("img_tokens"))
    val local = costs
      .repartitionByRange(col("doc_id"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lcum", sum("cost")
        .over(Window.partitionBy("__pid").orderBy("doc_id")))
      .persist() // un-materialized range shuffles can resample bounds per branch
    val offsets = local.groupBy("__pid").agg(sum("cost").as("__pt"))
      .withColumn("__off", coalesce(
        sum("__pt").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn("cum_before", col("__lcum") + col("__off") - col("cost"))
      .select(col("doc_id"), col("txt_tokens"), col("img_tokens"), col("cost"),
        expr(s"cum_before DIV $budget").as("batch_id"),
        expr(s"cum_before % $budget").as("batch_offset"))
  }

  /** m5 — media payload dedup: the storage-level dedup a multimodal
    * pipeline runs BEFORE any decode — byte-identical assets (mirrored
    * uploads, re-crawled images) and shared byte regions are found on the
    * raw payload, so the expensive decode/feature stages run once per
    * distinct asset. Two granularities, both over the binary column:
    *   - EXACT: md5 over the full payload groups byte-identical assets
    *     (`n_copies`, `is_exact_dup`);
    *   - CHUNK: fixed-`chunkBytes` aligned chunk fingerprints; a chunk
    *     hash appearing in ≥2 distinct docs is shared, and each doc
    *     reports its shared-chunk fraction — the rsync/CDC-chunking
    *     dedup shape (production uses content-defined boundaries, e.g.
    *     FastCDC, so insertions don't shift every chunk — only the
    *     boundary rule changes; a perceptual hash for decoded media
    *     would drop into the m1 mapPartitions idiom instead).
    *
    * Scale: one keyed agg on the payload hash, one on the chunk hash, a
    * hash join back per doc — no pairwise work anywhere; the shared-chunk
    * set grows with the corpus so it carries no broadcast hint (AQE
    * promotes if measured small). All hashing is codegen'd builtin md5
    * over binary slices (the oracle mirrors it over ASCII text — byte ==
    * char there). */
  def mediaDedup(documents: DataFrame, chunkBytes: Int = 64): DataFrame = {
    val m = asBinary(documents)
      .withColumn("payload_md5", md5(col("payload")))
      .persist() // feeds the group count, the chunk explode, and the output
    val grp = m.groupBy("payload_md5").agg(count(lit(1)).as("n_copies"))
    val chunks = m.filter(length(col("payload")) > 0)
      .withColumn("i", explode(expr(
        s"sequence(0, CAST(ceil(length(payload) / $chunkBytes.0) AS INT) - 1)")))
      .select(col("doc_id"),
        expr(s"md5(substring(payload, i * $chunkBytes + 1, $chunkBytes))").as("ch"))
    val shared = chunks.groupBy("ch")
      .agg(countDistinct("doc_id").as("d"))
      .filter(col("d") >= 2).select("ch")
    val per = chunks.join(shared.withColumn("is_shared", lit(true)), Seq("ch"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("is_shared"), 1L).otherwise(0L)).as("n_shared"))
    // UNORDERED output by contract (see TextOps.shardExport) — the
    // registry wrapper orders by doc_id for the driver's hash gate only
    m.join(grp, "payload_md5")
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"), col("payload_md5"), col("n_copies"),
        (col("n_copies") >= 2).as("is_exact_dup"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        expr("CASE WHEN coalesce(n_chunks, 0) = 0 THEN 0e0 " +
          "ELSE CAST(n_shared AS DOUBLE) / n_chunks END").as("shared_frac"))
  }

  /** m7 — CONTENT-DEFINED chunking dedup, the real version of the
    * boundary upgrade [[mediaDedup]]'s scaladoc promises: m5's aligned
    * 64-byte chunks lose ALL sharing after a single leading insertion
    * (every boundary shifts), while content-defined boundaries move WITH
    * the content — the LBFS/rsync/Manber anchoring idea: cut wherever
    * the rolling hash of a small window hits 0 mod `divisor`, so a chunk
    * boundary depends only on the bytes near it, never on absolute
    * offsets. Expected chunk length is `divisor` units; chunk identity is
    * the md5 of the chunk's content; chunks seen in ≥ 2 assets are
    * shared. The insertion-robustness m5 lacks is spec-proven
    * (`CdcChunkingSpec`): a prefix-shifted copy keeps most CDC chunks
    * while keeping ZERO aligned interior chunks.
    *
    * Grid: the windowed hash rolls over the payload's token stream
    * (md5-derived 52-bit token hashes folded to 2^20 so the 3-term
    * polynomial stays in exact BIGINT range — same portability discipline
    * as hex13Num), standing in for the byte stream the way m1/m6's
    * grids do. Scale: every window/lag partitions by doc_id (bounded by
    * asset length, never global); the chunk rollup is one keyed agg;
    * the shared-chunk table is a hash join on the chunk id — m5's plan
    * shape with moving boundaries. */
  def cdcChunks(documents: DataFrame, divisor: Int = 8): DataFrame = {
    val M = 1L << 20
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val toks = documents
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "w")))
      .withColumn("pos", col("pos0") + 1)
      .withColumn("th", expr(s"(${TextOps.hex13NumSpark("md5(w)")}) % $M"))
    val withB = toks
      .withColumn("t1", lag("th", 1).over(byDoc))
      .withColumn("t2", lag("th", 2).over(byDoc))
      .withColumn("b", when(col("t2").isNotNull &&
        (col("t2") * 961 + col("t1") * 31 + col("th")) % divisor === 0, 1L)
        .otherwise(0L))
      .withColumn("chunk_idx", coalesce(
        sum("b").over(byDoc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val chunks = withB.groupBy("doc_id", "chunk_idx")
      .agg(expr(
        "md5(array_join(transform(array_sort(collect_list(struct(pos, w))), s -> s.w), ' '))")
        .as("ch"))
      .persist() // shared-chunk table and per-doc rollup both read it
    val shared = chunks.groupBy("ch")
      .agg(countDistinct("doc_id").as("d"))
      .filter(col("d") >= 2).select("ch")
    chunks.join(shared.withColumn("is_shared", lit(true)), Seq("ch"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("is_shared"), 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_frac",
        expr("CAST(n_shared AS DOUBLE) / n_chunks"))
  }

  /** m6 — perceptual-hash near-duplicate detection, the media-asset form
    * of d7: a 48-bit AVERAGE HASH (aHash — the classic perceptual-hash
    * baseline: bit b set iff region b's mean intensity exceeds the
    * global mean) per asset, then near-dup pairs at hamming ≤ 1 via
    * d7's bit-flip probe join — 49 probe rows per asset, ONE hash join,
    * no pairwise scan at any corpus size. m5 catches byte-identical and
    * chunk-shared assets; this catches re-encodes whose bytes all
    * differ but whose intensity STRUCTURE survives, which is what
    * perceptual hashes exist for.
    *
    * In production the intensity grid comes from the decoded image
    * (resize per m3, then block means / DCT); this container has no
    * codec, so the deterministic stand-in grid is the payload's
    * token-length sequence (the same environmental-stub discipline as
    * m1's char-class features) — everything downstream of decode (the
    * hash algebra, the probe expansion, the join shape) is the real,
    * oracle-tested artifact.
    *
    * Exactness: block-vs-global mean compares as cross-multiplied exact
    * BIGINTs (block_sum·n > total·block_len — no division anywhere);
    * 48 bits keeps every bit weight positive in both engines'
    * 64-bit signed space. */
  /** The 48-bit aHash as a narrow projection over `documents` — shared
    * verbatim by the batch detector and the streaming monitor
    * ([[graft.streaming.StreamingAnalytics]].phashNearDupStream), so
    * their hashes are identical by construction. */
  def withPhash(documents: DataFrame): DataFrame = documents
    .withColumn("lens", expr(
      "transform(split(text, ' '), w -> CAST(length(w) AS BIGINT))"))
    .withColumn("n", expr("CAST(size(lens) AS BIGINT)"))
    .withColumn("tot", expr(
      "aggregate(lens, CAST(0 AS BIGINT), (a, x) -> a + x)"))
    .withColumn("blk", expr("(n + 47) div 48"))
    .withColumn("phash", expr(
      """aggregate(sequence(0, 47), CAST(0 AS BIGINT), (acc, b) -> acc +
           CASE WHEN aggregate(slice(lens, CAST(b * blk + 1 AS INT), CAST(blk AS INT)),
                               CAST(0 AS BIGINT), (a, x) -> a + x) * n
                     > tot * CAST(size(slice(lens, CAST(b * blk + 1 AS INT), CAST(blk AS INT))) AS BIGINT)
                THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END)"""))
    .select("doc_id", "phash")

  /** Near-dup KEEPER assignment — m6's scale-safe report form (VERDICT
    * r12 #2): one row per asset, `keeper` = the least doc_id within
    * hamming ≤ 1 of the asset among ids ≤ its own (itself when no
    * earlier neighbor exists). The pair report ([[phashNearDup]]) is
    * quadratic in duplicate multiplicity — a corpus with thousand-copy
    * assets emits millions of pair rows; the keeper view is LINEAR in
    * assets no matter how hot the duplicate groups get, which is the
    * form the batch dedup family (d6/x24) already reports at scale.
    *
    * Multiplicity-collapsed plan: collapse to DISTINCT phash groups
    * first (groupBy phash → group min), run the 49-probe join on the
    * GROUP table (its size is the distinct-hash count, not the corpus),
    * take each group's neighborhood minimum, then one hash join back
    * onto the assets. A doc's keeper is its group's neighborhood min
    * when that min is an earlier id, else itself — no member-level pair
    * is ever materialized. The streaming twin
    * ([[graft.streaming.StreamingAnalytics.phashKeeperStream]]) computes
    * the same view incrementally and is spec-pinned equal to this on
    * id-ordered replays. */
  def phashKeepers(documents: DataFrame): DataFrame = {
    val sigs = withPhash(documents)
      .persist() // group side and assignment side share the hashing scan
    val groups = sigs.groupBy("phash").agg(min("doc_id").as("g_min"))
      .persist() // probe side and raw side share the group collapse
    val probes = groups
      .withColumn("j", explode(sequence(lit(0), lit(48))))
      .withColumn("probe", expr(
        "CASE WHEN j = 48 THEN phash ELSE CAST(phash ^ shiftleft(CAST(1 AS BIGINT), j) AS BIGINT) END"))
      .select(col("phash").as("ph_a"), col("probe"))
    val raw = groups.select(col("phash").as("ph_b"), col("g_min").as("min_b"))
    // neighborhood minimum per group: every hamming ≤ 1 group pair meets
    // on a probe (identity probe covers self, flip probes the ham-1
    // neighbors, both directions), so min(min_b) over the join IS the
    // min doc_id across the group's whole ≤1-ball
    val cand = probes.join(raw, col("probe") === col("ph_b"))
      .groupBy(col("ph_a").as("phash")).agg(min("min_b").as("cand"))
    sigs.join(cand, Seq("phash")) // inner: the identity probe guarantees a row
      .select(col("doc_id"),
        when(col("cand") < col("doc_id"), col("cand"))
          .otherwise(col("doc_id")).as("keeper"),
        (col("cand") < col("doc_id")).as("is_dup"))
  }

  def phashNearDup(documents: DataFrame): DataFrame = {
    val sigs = withPhash(documents)
      .persist() // probe side and raw side share the hashing scan
    val probes = sigs
      .withColumn("j", explode(sequence(lit(0), lit(48))))
      .withColumn("probe", expr(
        "CASE WHEN j = 48 THEN phash ELSE CAST(phash ^ shiftleft(CAST(1 AS BIGINT), j) AS BIGINT) END"))
      .select(col("doc_id").as("doc_a"), col("phash").as("ph_a"), col("probe"))
    val raw = sigs.select(col("doc_id").as("doc_b"), col("phash").as("ph_b"))
    probes.join(raw, col("probe") === col("ph_b") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("ph_a"), col("ph_b"),
        expr("CAST(bit_count(ph_a ^ ph_b) AS INT)").as("hamming"))
  }
}
