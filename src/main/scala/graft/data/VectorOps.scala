package graft.data

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Exactness discipline: floats are quantized to integers
  * (floor(x * 2^20)) so dot products and norms are EXACT integer sums —
  * order-independent, overflow-safe (|q| ≲ 2^21, 64-dim dot ≲ 2^48), and
  * bit-identical between Spark and the DuckDB oracle. The final cosine is
  * then one IEEE division/sqrt over identical integers, so ranking ties
  * break identically everywhere.
  *
  * Scale: brute force is O(Q·N) — the verification baseline. The scale
  * paths are [[annIvf]] (coarse partition pruning: only the query's cell
  * is scanned — with a cluster assignment column this is partition
  * pruning at the parquet level) and [[annLsh]] (random-hyperplane
  * buckets: one shuffle by bucket key, candidates drop by ~2^bits).
  */
object VectorOps {

  /** Target vectors per coarse cell for the scan-linear ANN family
    * (s6/s8/s9/s10): cells this size keep a probe's candidate scan
    * constant as the corpus grows (nProbe·target candidates per query,
    * regardless of n). 2000 floors [[autoCells]] to `kMin` at both oracle
    * gate scales (500 and 2000 vectors). */
  val AnnCellTarget = 2000L

  /** Target vectors per k-means cluster for the pair-quadratic semantic
    * dedup (d12): per-cluster pair work is O(target²), so holding the
    * cluster size constant holds TOTAL pair work linear in n — the
    * SemDeDup paper's k ∝ n discipline (it runs k ≈ n/10⁴; 500 keeps the
    * gate-scale k at 4 and reproduces the 100× rehearsal's proven
    * k = 4·copies configuration). */
  val SemDedupClusterTarget = 500L

  /** Rank-block width for [[semDedup]]'s prefix pair join: a cluster's
    * scan order splits into blocks this wide and pairs join on
    * (cluster, earlier-block), so a c-member cluster's O(c²) pair
    * generation spreads over ~c/width tasks instead of one (the join
    * previously keyed only on c_id — with k join keys total, one cluster
    * was one task). Max per-task earlier-side is `width` rows; ≥ the
    * gate-scale cluster size so block ids are all 0 there and the plan
    * degenerates to the unblocked join. */
  val semDedupBlockWidth = 512L

  /** Queries per ADC batch for the PQ scans (s7/s9): a batch's codeword
    * distance table is batch·nProbe·m·nCodes rows (~34 KB/query at the
    * s9 defaults), so 256 bounds every realized ADC broadcast under
    * ~10 MB no matter how large the query set grows — the invariant the
    * 100× rehearsal measured failing at corpus-scaled Q (134 MB). */
  val AdcQueryBatchSize = 256L

  /** Memoized corpus count — one control-plane job per (session, input
    * plan), shared by [[autoCells]] and [[queryBatchCount]] across every
    * query in a session (same [[SharedFrames.memoValue]] discipline as
    * the trained centroids). */
  def corpusCount(embeddings: DataFrame): Long =
    SharedFrames.memoValue(embeddings, "vector-corpus-count")(embeddings.count())

  /** Auto-derived coarse-cell/cluster count: k = max(kMin, n / target).
    * The trained-index family defaults to THIS instead of a fixed k, so
    * cell sizes stay constant as the corpus grows — the fixed-k=4 default
    * was a measured 100×-scale failure (a 50k-vector cell turns every
    * probe into a half-corpus scan). Floors to `kMin` (= the oracle's k)
    * at both gate scales, so the DuckDB oracles keep their static k=4. */
  def autoCells(embeddings: DataFrame, kMin: Int = 4,
      targetCellSize: Long = AnnCellTarget): Int =
    math.max(kMin.toLong, corpusCount(embeddings) / targetCellSize).toInt

  /** Number of query batches so each batch holds ≤ [[AdcQueryBatchSize]]
    * queries. Q is estimated as n/everyNth (exact for dense ids; an
    * estimate only re-balances batches, never changes results — batch
    * membership is a pure partition of the query ids). */
  def queryBatchCount(embeddings: DataFrame, everyNth: Int,
      batchSize: Long = AdcQueryBatchSize): Int =
    math.max(1L,
      (corpusCount(embeddings) / everyNth + batchSize - 1) / batchSize).toInt

  /** Quantized vectors + exact squared norm (norm via the native codegen'd
    * [[graft.functions.LongDotProduct]] of the vector with itself).
    *
    * Session-memoized: the quantization chain is interpreted HOF lambdas
    * (the one place codegen can't follow) and EVERY s-op consumes it —
    * formerly each op `.persist()`ed its own copy per invocation with no
    * release, accumulating session-lifetime cache entries (r8 ADVICE's
    * lingering-persist class). One [[SharedFrames.memo]] entry per
    * (session, input plan) pays the chain once and frees the per-op
    * persists entirely; at 100 TB the analogue is writing the quantized
    * columns once (see [[SharedFrames]]' bucketed-write note). */
  def quantized(embeddings: DataFrame): DataFrame =
    SharedFrames.memoPersisted(embeddings, "vector-quantized") {
      embeddings
        .withColumn("qv", expr("transform(embedding, x -> CAST(floor(x * 1048576e0) AS BIGINT))"))
        .withColumn("nn", expr("graft_dot_long(qv, qv)"))
        .select("vec_id", "label", "qv", "nn")
    }

  /** Pair dot product — native expression, generated into whole-stage
    * codegen (the HOF aggregate/zip_with form runs interpreted and
    * allocates per pair; this is THE hot loop of brute-force ANN). */
  private val dotExpr = "graft_dot_long(q_qv, qv)"
  private val cosExpr =
    "CAST(dot AS DOUBLE) / sqrt(CAST(q_nn AS DOUBLE) * CAST(nn AS DOUBLE))"

  private def queriesOf(qv: DataFrame, everyNth: Int): DataFrame =
    qv.filter(col("vec_id") % everyNth === 0)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("qv").as("q_qv"), col("nn").as("q_nn"))

  private def rankTopK(pairs: DataFrame, k: Int): DataFrame =
    pairs
      .withColumn("dot", expr(dotExpr))
      .withColumn("cos", expr(cosExpr))
      .withColumn("rnk", row_number()
        .over(Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id")))
        .cast("int"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        col("dot"), col("cos"))

  /** s1 — brute-force top-k cosine (baseline; exact). */
  def annBrute(embeddings: DataFrame, everyNth: Int = 50, k: Int = 5): DataFrame = {
    val v = quantized(embeddings)
    val q = queriesOf(v, everyNth)
    rankTopK(q.join(v, col("vec_id") =!= col("query_id")), k)
  }

  /** s2 — IVF-style: the label column is the coarse cell assignment; only
    * the query's cell is scanned. */
  def annIvf(embeddings: DataFrame, everyNth: Int = 50, k: Int = 3): DataFrame = {
    val v = quantized(embeddings)
    val q = queriesOf(v, everyNth)
    rankTopK(
      q.join(v, col("q_label") === col("label") && col("vec_id") =!= col("query_id")), k)
  }

  /** Random-hyperplane signs, derived from MD5 parity so the oracle can
    * reproduce them: sign(b, d) ∈ {-1, +1}. Computed at PLAN TIME on the
    * driver (bits × dims values — constants), so the per-vector bucket
    * needs no explode, no join and no shuffle at all. */
  def hyperplaneSign(b: Long, d: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$b:$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (hex.charAt(0).toInt % 2) * 2 - 1
  }

  /** LSH bucket expression: bit b set iff the signed projection is
    * positive (exact integer sum). The hyperplanes are literal arrays, the
    * projections are native codegen'd dot products — the whole bucketing
    * is a narrow projection over the scan. Bit b of an n-bit bucket equals
    * bit b of any wider bucket (same per-bit hyperplanes), so a k-bit
    * bucket is the k low bits of the 8-bit one. */
  def bucketExpr(bits: Int): String =
    (0 until bits).map { b =>
      val sgns = (1 to 64).map(d => hyperplaneSign(b, d)).mkString(", ")
      s"CASE WHEN graft_dot_long(qv, CAST(array($sgns) AS ARRAY<BIGINT>)) > 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")

  def lshBuckets(spark: SparkSession, v: DataFrame, bits: Int = 8): DataFrame =
    v.select(col("vec_id"), expr(bucketExpr(bits)).as("bucket"))

  /** s3 — LSH-bucketed ANN: candidates share the bucket; top-k within. */
  def annLsh(spark: SparkSession, embeddings: DataFrame, everyNth: Int = 50, k: Int = 3): DataFrame = {
    val v = quantized(embeddings)
    val buckets = lshBuckets(spark, v)
    val vb = v.join(buckets, "vec_id")
    val q = vb.filter(col("vec_id") % everyNth === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("nn").as("q_nn"), col("bucket").as("q_bucket"))
    rankTopK(
      q.join(vb, col("q_bucket") === col("bucket") && col("vec_id") =!= col("query_id")), k)
      .join(buckets.withColumnRenamed("vec_id", "query_id"), "query_id")
      .select("query_id", "neighbor_id", "rnk", "dot", "cos", "bucket")
  }

  /** s5 — int8-quantized ANN with exact rerank: the
    * memory-bandwidth-bound shape of large-scale vector search. Each
    * vector is symmetrically scalar-quantized to int8 against its own
    * max-abs (8× smaller than float64 / 4× smaller than float32 — at
    * 100 TB of embeddings the scan cost IS the search cost, so byte
    * width is throughput), the candidate scan ranks by the int8 cosine
    * (per-vector scales cancel in cosine up to quantization error), and
    * only the k winners are re-scored exactly — the standard
    * coarse-scan + rerank pattern (IVF-SQ8 in FAISS terms).
    *
    * Exactness: the quantization chain is floor(x / mx · 127 + 0.5) in
    * IEEE doubles over identical inputs, int8 dots/norms are exact
    * BIGINT sums via the native codegen'd dot, and the rerank reuses the
    * 2^20 quantization — every output column hash-matches the oracle. */
  def annInt8(embeddings: DataFrame, everyNth: Int = 50, k: Int = 5): DataFrame = {
    // session memo: the quantization chain is interpreted HOF lambdas (the
    // one place codegen can't follow); without sharing, the q8 frame is
    // recomputed for the query side, the candidate side, and under the
    // broadcast — and a bare per-invocation persist lingered unreleased
    // for the session (r8 ADVICE)
    val v8 = SharedFrames.memoPersisted(embeddings, "int8-quantized") {
      embeddings
        .withColumn("mx", expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"))
        // a zero-magnitude embedding has no direction: x/mx would emit NULL
        // q8 entries that silently sink to the bottom of the ranking. Fail
        // loudly instead (the oracle SQL carries the same guard).
        .withColumn("mx", when(col("mx") <= 0d,
          raise_error(lit("annInt8: zero-magnitude embedding cannot be quantized; " +
            "filter zero vectors upstream")).cast("double"))
          .otherwise(col("mx")))
        .withColumn("q8", expr(
          "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / mx * 127e0 + 0.5e0) AS BIGINT))"))
        .withColumn("nn8", expr("graft_dot_long(q8, q8)"))
        .select("vec_id", "q8", "nn8")
    }
    val q = v8.filter(col("vec_id") % everyNth === 0)
      .select(col("vec_id").as("query_id"), col("q8").as("q_q8"), col("nn8").as("q_nn8"))
    val top = q.join(v8, col("vec_id") =!= col("query_id"))
      .withColumn("dot8", expr("graft_dot_long(q_q8, q8)"))
      .withColumn("cos8",
        expr("CAST(dot8 AS DOUBLE) / sqrt(CAST(q_nn8 AS DOUBLE) * CAST(nn8 AS DOUBLE))"))
      .withColumn("rnk", row_number()
        .over(Window.partitionBy("query_id").orderBy(col("cos8").desc, col("vec_id")))
        .cast("int"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        col("dot8"), col("cos8"))
    // exact rerank of the Q·k winners only — the winners frame scales
    // with the QUERY set, so it is AQE-sized, not force-broadcast (the
    // 100× vector rehearsal measured Q-scaled frames at 100+ MB)
    val exact = quantized(embeddings) // session-memoized checkpoint scan
    val withQ = top
      .join(exact.select(col("vec_id").as("query_id"),
        col("qv").as("q_qv"), col("nn").as("q_nn")), "query_id")
    withQ
      .join(exact.select(col("vec_id").as("neighbor_id"), col("qv"), col("nn")),
        "neighbor_id")
      .withColumn("cos_exact", expr(
        "CAST(graft_dot_long(q_qv, qv) AS DOUBLE) / sqrt(CAST(q_nn AS DOUBLE) * CAST(nn AS DOUBLE))"))
      .select("query_id", "neighbor_id", "rnk", "dot8", "cos8", "cos_exact")
  }

  /** Exact-integer nearest-centroid assignment against a broadcast k-row
    * centroid frame (c_id, c_qv, c_nn): dist² = |x|² − 2x·c + |c|², all
    * BIGINT, argmin via `min_by` keyed on struct(dist2, c_id) so ties
    * break to the smallest c_id — the same total order the oracle's
    * `row_number ... ORDER BY dist2, c_id` induces, but as a
    * map-side-combinable hash aggregation: the k candidate rows per
    * vector collapse to one before the shuffle (~k× less shuffle volume)
    * and no sort runs anywhere in the assignment stage. */
  /** s7 — product quantization with asymmetric-distance (ADC) scan: the
    * IVF-PQ shape of billion-scale vector search. The 64 dims split into
    * m=8 subspaces of 8; per subspace each sub-vector is encoded as the
    * nearest of 16 codewords (codebook = the first 16 vectors'
    * sub-vectors — the same deterministic-sample rule as the k-means
    * seeds), compressing every vector to 8 small codes. A query scans
    * candidates by ADC — its EXACT sub-vectors against each candidate's
    * CODEWORDS, via one precomputed (query × subspace × codeword)
    * distance table summed over subspaces — inside its label cell (the
    * IVF coarse stage, as s2), and the adcTopK best are re-scored
    * exactly (s5's rerank).
    *
    * Every distance is an exact BIGINT sum on the 2^20 grid (sub-norms
    * ≤ 2^45, ADC sums ≤ 2^49), so encoding, ADC ranks, and the final
    * cosine hash-match the oracle bit-for-bit.
    *
    * Scale: the codebook (m·16 rows) and per-query distance tables
    * (Q·m·16 rows) broadcast; encoding is a broadcast join reduced by a
    * map-side-combinable min_by (no window, no sort); the ADC scan
    * shuffles one (query, candidate, subspace) partial into a keyed sum.
    * At 100 TB the codes are a write-time column ~32× narrower than the
    * raw vectors — the whole point of PQ: the scan reads codes, never
    * floats. */
  def annPq(embeddings: DataFrame, nCodes: Int = 16, m: Int = 8,
      subDim: Int = 8, everyNth: Int = 50, adcTopK: Int = 10,
      k: Int = 5, queryBatches: Int = 0): DataFrame = {
    // queryBatches ≤ 0 auto-sizes from the corpus so every per-batch ADC
    // table stays bounded (the FAISS search loop); 1 at both gate scales,
    // so the oracle plan is unchanged there
    val nb = if (queryBatches > 0) queryBatches
             else queryBatchCount(embeddings, everyNth)
    val v = quantized(embeddings) // session-memoized checkpoint scan
    // one row per (vector, subspace): the sliced sub-vector + exact norm —
    // feeds the codebook, the encoding, and the query tables (session
    // memo, not a lingering per-invocation persist: r8 ADVICE)
    val subs = SharedFrames.memoPersisted(embeddings, s"pq-subs:$m:$subDim") {
      v.withColumn("s", explode(sequence(lit(0), lit(m - 1))))
        .withColumn("sub", expr(s"slice(qv, s * $subDim + 1, $subDim)"))
        .withColumn("sub_nn", expr("graft_dot_long(sub, sub)"))
        .select("vec_id", "label", "s", "sub", "sub_nn")
    }
    val cb = subs.filter(col("vec_id") < nCodes)
      .select(col("vec_id").as("c_id"), col("s").as("c_s"),
        col("sub").as("c_sub"), col("sub_nn").as("c_nn"))
    val codesRaw = subs.join(broadcast(cb), col("s") === col("c_s"))
      .withColumn("dist2", expr("sub_nn - 2 * graft_dot_long(sub, c_sub) + c_nn"))
      .groupBy("vec_id", "label", "s")
      .agg(expr("min_by(c_id, struct(dist2, c_id))").as("code"))
    // the corpus-scaled codes frame is scanned once per batch
    val codes = if (nb > 1)
      SharedFrames.memoPersisted(embeddings, s"pq-codes:$nCodes:$m:$subDim")(codesRaw)
    else codesRaw
    // per-query ADC table: exact query sub-vector vs every codeword
    val qd = subs.filter(col("vec_id") % everyNth === 0)
      .join(broadcast(cb), col("s") === col("c_s"))
      .withColumn("qdist2", expr("sub_nn - 2 * graft_dot_long(sub, c_sub) + c_nn"))
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("s").as("q_s"), col("c_id").as("qcode"), col("qdist2"))
    // the PER-BATCH ADC distance table broadcasts BY DESIGN (the classic
    // ADC trick: every scanner holds the query×codeword tables) — and the
    // batch loop ENFORCES its bound in code: each batch carries
    // ≤ [[AdcQueryBatchSize]] queries, so the broadcast is ≤ batch·m·nCodes
    // rows no matter how large the corpus-scaled query set grows (the
    // unbatched form was the 100× rehearsal's measured 134 MB failure).
    // Un-hinting instead measurably degrades the 10× plan ~7×. The per-
    // query window ranks are batch-independent (each query's rows live in
    // exactly one batch), so the union is byte-identical to the unbatched
    // result.
    val cand = (0 until nb).map { b =>
      val qdB = if (nb == 1) qd
        else qd.filter(expr(s"(query_id div $everyNth) % $nb") === b)
      codes.join(broadcast(qdB),
          col("s") === col("q_s") && col("code") === col("qcode") &&
            col("label") === col("q_label") && col("vec_id") =!= col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(sum("qdist2").as("adc_d2"))
        .withColumn("crn", row_number().over(
          Window.partitionBy("query_id").orderBy(col("adc_d2"), col("vec_id"))))
        .filter(col("crn") <= adcTopK)
        .select("query_id", "vec_id", "adc_d2")
    }.reduce(_ unionByName _)
    val qfull = v.filter(col("vec_id") % everyNth === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("nn").as("q_nn"))
    cand.join(v.select("vec_id", "qv", "nn"), "vec_id")
      .join(qfull, "query_id") // Q-scaled: AQE-sized, not force-broadcast
      .withColumn("dot", expr(dotExpr))
      .withColumn("cos", expr(cosExpr))
      .withColumn("rnk", row_number()
        .over(Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id")))
        .cast("int"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        col("adc_d2"), col("dot"), col("cos"))
  }

  /** s9 — full IVF-PQ (Jégou et al. 2011; FAISS `IVFPQ`): a trained
    * coarse quantizer prunes the scan to `nProbe` cells (s8's multiprobe),
    * and candidates are compared by product-quantized RESIDUALS — each
    * vector is stored as m codes of its offset FROM its cell centroid,
    * not of the raw vector (s7 encodes raw vectors inside given label
    * cells). Residual encoding is what makes PQ workable under a coarse
    * stage: residuals concentrate near 0, so one shared codebook covers
    * every cell. The query builds one ADC table per PROBED cell (its
    * residual differs per cell), scans codes in those cells only, and
    * exactly re-scores the `adcTopK` shortlist.
    *
    * Exactness: residuals are integer differences on the 2^20 grid
    * (entries ≤ 2^22), sub-space dots/norms are exact BIGINT via the
    * native codegen'd dot (ADC sums ≤ 2^50), so encoding, ADC ranks and
    * the reranked cosines hash-match the oracle bit-for-bit.
    *
    * Scale: this is the memory layout of billion-scale search — per
    * vector only (cell, m codes): cell is a write-time partition column
    * ([[writeCellPartitioned]]) so probing is partition pruning, and the
    * code scan reads m bytes/vector, never floats. Broadcast frames are
    * all bounded: k centroids, m·nCodes codebook rows,
    * Q·nProbe·m·nCodes ADC-table rows, Q rerank queries. The encode step
    * is a broadcast join + map-side-combinable min_by (no window/sort
    * over the corpus). */
  def annIvfPq(embeddings: DataFrame, k: Int = 0, nCodes: Int = 16,
      m: Int = 8, subDim: Int = 8, everyNth: Int = 50, nProbe: Int = 2,
      adcTopK: Int = 10, topK: Int = 5, queryBatches: Int = 0): DataFrame = {
    // k ≤ 0 auto-sizes the coarse cells from the corpus (k = n/target,
    // [[autoCells]]) — floors to the oracle's k=4 at gate scale; a fixed
    // k was the 100× rehearsal's measured failure (50k-vector cells)
    val kk = if (k > 0) k else autoCells(embeddings)
    val nb = if (queryBatches > 0) queryBatches
             else queryBatchCount(embeddings, everyNth)
    val v = quantized(embeddings) // session-memoized checkpoint scan
    val cent = v.filter(col("vec_id") < kk)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"), col("nn").as("c_nn"))
    // residual vs the OWN cell's centroid, sliced into m subspaces —
    // feeds the codebook and the encoding (session memo, not a lingering
    // per-invocation persist: r8 ADVICE)
    val subs = SharedFrames.memoPersisted(embeddings, s"ivfpq-subs:$kk:$m:$subDim") {
      assignToCentroids(v, cent)
        .join(broadcast(cent), "c_id")
        .withColumn("rv", expr("zip_with(qv, c_qv, (a, b) -> a - b)"))
        .withColumn("s", explode(sequence(lit(0), lit(m - 1))))
        .withColumn("sub", expr(s"slice(rv, s * $subDim + 1, $subDim)"))
        .withColumn("sub_nn", expr("graft_dot_long(sub, sub)"))
        .select(col("vec_id"), col("c_id").as("cell"), col("s"), col("sub"), col("sub_nn"))
    }
    val cb = subs.filter(col("vec_id") < nCodes)
      .select(col("vec_id").as("code_id"), col("s").as("c_s"),
        col("sub").as("c_sub"), col("sub_nn").as("cb_nn"))
    val codesRaw = subs.join(broadcast(cb), col("s") === col("c_s"))
      .withColumn("dist2", expr("sub_nn - 2 * graft_dot_long(sub, c_sub) + cb_nn"))
      .groupBy("vec_id", "cell", "s")
      .agg(expr("min_by(code_id, struct(dist2, code_id))").as("code"))
    // the corpus-scaled codes frame is scanned once per query batch
    val codes = if (nb > 1)
      SharedFrames.memoPersisted(embeddings, s"ivfpq-codes:$kk:$nCodes:$m:$subDim")(codesRaw)
    else codesRaw
    // query probes its nProbe nearest cells; its residual differs per cell
    val probes = v.filter(col("vec_id") % everyNth === 0)
      .crossJoin(broadcast(cent))
      .withColumn("dist2", expr("nn - 2 * graft_dot_long(qv, c_qv) + c_nn"))
      .withColumn("prn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("dist2"), col("c_id"))))
      .filter(col("prn") <= nProbe)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("c_id").as("cell"), col("c_qv"))
    // per-(query, probed cell) ADC table: exact query residual vs codewords
    val qd = probes
      .withColumn("q_rv", expr("zip_with(q_qv, c_qv, (a, b) -> a - b)"))
      .withColumn("s", explode(sequence(lit(0), lit(m - 1))))
      .withColumn("q_sub", expr(s"slice(q_rv, s * $subDim + 1, $subDim)"))
      .withColumn("q_sub_nn", expr("graft_dot_long(q_sub, q_sub)"))
      .join(broadcast(cb), col("s") === col("c_s"))
      .withColumn("qdist2",
        expr("q_sub_nn - 2 * graft_dot_long(q_sub, c_sub) + cb_nn"))
      .select(col("query_id"), col("cell").as("q_cell"), col("s").as("q_s"),
        col("code_id").as("qcode"), col("qdist2"))
    // the PER-BATCH ADC distance table broadcasts BY DESIGN (the classic
    // ADC trick) — and the batch loop ENFORCES the bound the r7 scaladoc
    // only documented: each batch holds ≤ [[AdcQueryBatchSize]] queries,
    // so every realized broadcast is ≤ batch·nProbe·m·nCodes rows however
    // large the corpus-scaled query set grows. The unbatched form was the
    // 100× rehearsal's measured 134 MB broadcast; un-hinting instead
    // degraded the 10× run 6→42 s. Per-query windows make each batch's
    // shortlist independent, so the union is byte-identical to unbatched.
    val cand = (0 until nb).map { b =>
      val qdB = if (nb == 1) qd
        else qd.filter(expr(s"(query_id div $everyNth) % $nb") === b)
      codes.join(broadcast(qdB),
          col("cell") === col("q_cell") && col("s") === col("q_s") &&
            col("code") === col("qcode") && col("vec_id") =!= col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(sum("qdist2").as("adc_d2"), min("cell").as("cell"))
        .withColumn("crn", row_number().over(
          Window.partitionBy("query_id").orderBy(col("adc_d2"), col("vec_id"))))
        .filter(col("crn") <= adcTopK)
        .select("query_id", "vec_id", "adc_d2", "cell")
    }.reduce(_ unionByName _)
    val qfull = v.filter(col("vec_id") % everyNth === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("nn").as("q_nn"))
    cand.join(v.select("vec_id", "qv", "nn"), "vec_id")
      .join(qfull, "query_id") // Q-scaled: AQE-sized, not force-broadcast
      .withColumn("dot", expr(dotExpr))
      .withColumn("cos", expr(cosExpr))
      .withColumn("rnk", row_number()
        .over(Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id")))
        .cast("int"))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        col("adc_d2"), col("dot"), col("cos"), col("cell"))
  }

  private def assignToCentroids(v: DataFrame, cent: DataFrame): DataFrame =
    v.crossJoin(broadcast(cent))
      .withColumn("dist2", expr("nn - 2 * graft_dot_long(qv, c_qv) + c_nn"))
      .groupBy("vec_id")
      .agg(expr("min_by(struct(label, qv, nn, c_id), struct(dist2, c_id))").as("s"))
      .select(col("vec_id"), col("s.label").as("label"), col("s.qv").as("qv"),
        col("s.nn").as("nn"), col("s.c_id").as("c_id"))

  /** The first-kk-vectors seed centroid frame (O(kk) rows). */
  private def seedCentroids(v: DataFrame, kk: Int): DataFrame =
    v.filter(col("vec_id") < kk)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"), col("nn").as("c_nn"))

  /** Corpus assigned to the seed-centroid cells — the shared input of the
    * untrained-IVF family (s6 both sides, s14/s15/s16 candidate side).
    * Session-memoized per (input, kk): formerly each op persisted its own
    * copy per invocation with no release (r8 ADVICE's lingering-persist
    * class); one memo entry pays the assignment once and every consumer
    * reads the checkpointed frame. */
  private def cellAssigned(embeddings: DataFrame, kk: Int): DataFrame =
    SharedFrames.memoPersisted(embeddings, s"ivf-assigned:$kk") {
      val v = quantized(embeddings)
      assignToCentroids(v, seedCentroids(v, kk)).withColumnRenamed("c_id", "cell")
    }

  /** s6 — IVF over a TRAINED coarse index: cluster assignment comes from
    * k-means centroids (s4's assignment step — exact integer argmin
    * against broadcast centroids), not a given label column; the query
    * then probes only its own cell (nProbe = 1). This is the full IVF
    * lifecycle — train → assign → prune — where s2 starts from
    * pre-existing cells; at 100 TB the assignment is a write-time column
    * so search-time pruning is partition pruning at the scan. */
  def annIvfTrained(embeddings: DataFrame, k: Int = 0, everyNth: Int = 50,
      topK: Int = 3): DataFrame = {
    val kk = if (k > 0) k else autoCells(embeddings) // cells sized, not counted
    // both sides of the cell-pruned search read the memoized assignment
    val assigned = cellAssigned(embeddings, kk)
    val q = assigned.filter(col("vec_id") % everyNth === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("nn").as("q_nn"), col("cell").as("q_cell"))
    rankTopK(
        q.join(assigned, col("q_cell") === col("cell") && col("vec_id") =!= col("query_id")),
        topK)
      .join(q.select(col("query_id"), col("q_cell").as("cell")), "query_id") // Q-scaled: AQE-sized
      .select("query_id", "neighbor_id", "rnk", "dot", "cos", "cell")
  }

  /** s8 — multi-probe IVF: each query scans its `nProbe` NEAREST cells
    * instead of only its own — the standard recall knob of IVF search
    * (nProbe=1 is s6; nProbe=#cells degenerates to s1's brute force).
    * A vector straddling a cell boundary is found by the second probe
    * even when quantization put it in the "wrong" cell.
    *
    * Scale: the probe list is O(#queries × nProbe) (a window over the
    * query×centroid cross — both k-bounded); candidates are one hash
    * join on the cell key, and each (query, neighbor) pair appears at
    * most once because cells PARTITION the vectors. Over a
    * [[writeCellPartitioned]] layout the cell list becomes a static
    * `cell IN (...)` partition filter, so probe cost is nProbe/#cells
    * of the scan. */
  def annIvfMultiprobe(embeddings: DataFrame, k: Int = 0, everyNth: Int = 50,
      nProbe: Int = 2, topK: Int = 3): DataFrame = {
    // k ≤ 0 auto-sizes cells to [[AnnCellTarget]] vectors: a probe scans
    // nProbe·target candidates per query REGARDLESS of corpus size — the
    // fixed k=4 default was s8's measured 416 s failure at 100× (50k-
    // vector cells turned every probe into a half-corpus scan)
    val kk = if (k > 0) k else autoCells(embeddings)
    val v = quantized(embeddings)
    val cent = v.filter(col("vec_id") < kk)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"), col("nn").as("c_nn"))
    val assigned = assignToCentroids(v, cent)
      .withColumnRenamed("c_id", "cell")
    val probes = v.filter(col("vec_id") % everyNth === 0)
      .crossJoin(broadcast(cent))
      .withColumn("dist2", expr("nn - 2 * graft_dot_long(qv, c_qv) + c_nn"))
      .withColumn("prn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("dist2"), col("c_id"))))
      .filter(col("prn") <= nProbe)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("nn").as("q_nn"), col("c_id").as("cell"))
    probes.join(assigned, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("dot", expr(dotExpr))
      .withColumn("cos", expr(cosExpr))
      .withColumn("rnk", row_number()
        .over(Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id")))
        .cast("int"))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        col("dot"), col("cos"), col("cell"))
  }

  /** s14 — metadata-filtered ANN (the FAISS `IDSelector` / filtered-
    * search shape every production vector store exposes): each query
    * retrieves only candidates whose document metadata satisfies a
    * PER-QUERY constraint — here "same language as the query", the
    * retrieve-in-my-language rule of multilingual RAG/hard-negative
    * mining — on top of the trained multi-probe IVF chain (s8).
    *
    * The constraint joins INTO the candidate join key: candidates hash
    * on (cell, lang) instead of (cell), so filtering NARROWS the shuffle
    * and the per-query scan instead of post-filtering a wider result —
    * the pre-filter strategy. The known filtered-search hazard is its
    * recall cliff: a selective predicate can leave a probed cell nearly
    * empty, and the recovery knob is `nProbe` widening (spec-pinned:
    * full probes + the filter ≡ brute force over the filtered corpus).
    * At 100 TB over a [[writeCellPartitioned]] layout, (cell, lang) is a
    * two-level partition directory and the probe prunes BOTH levels
    * statically. Metadata arrives by an AQE-sized `vec_id = doc_id` hash
    * join (embeddings derive from documents, so the join is total at the
    * gates; orphaned vectors drop with the inner join — a filtered
    * search over vectors without metadata has no defined answer). */
  def annIvfFiltered(embeddings: DataFrame, documents: DataFrame,
      k: Int = 0, everyNth: Int = 50, nProbe: Int = 2, topK: Int = 3): DataFrame = {
    val kk = if (k > 0) k else autoCells(embeddings)
    val v = quantized(embeddings) // session-memoized checkpoint scan
    val cent = seedCentroids(v, kk)
    val meta = documents.select(col("doc_id").as("vec_id"), col("lang"))
    val assigned = cellAssigned(embeddings, kk).join(meta, "vec_id")
    val probes = v.filter(col("vec_id") % everyNth === 0)
      .crossJoin(broadcast(cent))
      .withColumn("dist2", expr("nn - 2 * graft_dot_long(qv, c_qv) + c_nn"))
      .withColumn("prn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("dist2"), col("c_id"))))
      .filter(col("prn") <= nProbe)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("nn").as("q_nn"), col("c_id").as("cell"))
      .join(meta.select(col("vec_id").as("query_id"), col("lang").as("q_lang")),
        "query_id")
    probes.join(assigned,
        probes("cell") === assigned("cell") && col("q_lang") === col("lang") &&
          col("vec_id") =!= col("query_id"))
      .withColumn("dot", expr(dotExpr))
      .withColumn("cos", expr(cosExpr))
      .withColumn("rnk", row_number()
        .over(Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id")))
        .cast("int"))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("q_lang"), col("vec_id").as("neighbor_id"),
        col("rnk"), col("dot"), col("cos"), assigned("cell"))
  }

  /** s15 — hard-negative mining for contrastive/retriever training (the
    * ANN-mined negatives of ANCE, Xiong et al. 2020, and DPR's BM25/ANN
    * negatives, Karpukhin et al. 2020): for each anchor, the top-k MOST
    * similar vectors that live OUTSIDE the anchor's own semantic cluster
    * — similar enough to be hard, cross-cluster so they are unlikely
    * unlabeled positives (the cluster-exclusion denoising proxy;
    * RocketQA filters the same false-negative hazard with a scorer).
    *
    * Shape: s8's trained multi-probe chain with the probe WINDOW SHIFTED
    * one rank — probes are the anchor's nProbe nearest cells EXCLUDING
    * rank 1, which is exactly its assignment cell (assignment and probe
    * ranking share the (dist2, c_id) order), so no candidate self-join
    * filter is needed at all: the anchor cannot meet itself. Candidate
    * cost is nProbe·cellTarget per anchor regardless of corpus size
    * (auto-k), the mined set is O(#anchors · topK), and over a
    * [[writeCellPartitioned]] layout the shifted probe list is the same
    * static `cell IN (...)` partition filter — mining cost equals search
    * cost. */
  def hardNegatives(embeddings: DataFrame, k: Int = 0, everyNth: Int = 50,
      nProbe: Int = 2, topK: Int = 3): DataFrame = {
    val kk = if (k > 0) k else autoCells(embeddings)
    val v = quantized(embeddings) // session-memoized checkpoint scan
    val cent = seedCentroids(v, kk)
    val assigned = cellAssigned(embeddings, kk)
    val ranked = v.filter(col("vec_id") % everyNth === 0)
      .crossJoin(broadcast(cent))
      .withColumn("dist2", expr("nn - 2 * graft_dot_long(qv, c_qv) + c_nn"))
      .withColumn("prn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("dist2"), col("c_id"))))
    val probes = ranked.filter(col("prn") > 1 && col("prn") <= nProbe + 1)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("nn").as("q_nn"), col("c_id").as("cell"))
    val anchorCell = ranked.filter(col("prn") === 1)
      .select(col("vec_id").as("query_id"), col("c_id").as("q_cell"))
    probes.join(assigned, "cell")
      .withColumn("dot", expr(dotExpr))
      .withColumn("cos", expr(cosExpr))
      .withColumn("rnk", row_number()
        .over(Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id")))
        .cast("int"))
      .filter(col("rnk") <= topK)
      // anchor-cell join is O(#anchors): AQE-sized, not hinted
      .join(anchorCell, "query_id")
      .select(col("query_id"), col("q_cell"), col("vec_id").as("neighbor_id"),
        col("rnk"), col("dot"), col("cos"), col("cell"))
  }

  /** s16 — range (radius) search, FAISS `range_search`: every candidate
    * with cosine ≥ `minCos`, not a fixed top-k — the primitive behind
    * duplicate-pair generation, recall-oriented retrieval, and "find
    * everything this similar" audits, where the answer SIZE is a
    * data property, not a parameter. Runs on the trained multi-probe
    * chain (s8's probes); with no rank to compute there is NO window
    * operator anywhere — the plan is probe-join → narrow filter, which
    * at 100 TB makes range search CHEAPER per candidate than top-k
    * (top-k pays a per-query shuffle for the rank; this streams). The
    * flip side is unbounded output on a degenerate threshold — callers
    * own τ; the registry default keeps per-query result sets small at
    * the gates while leaving both populated-and-empty query regimes. */
  def annRange(embeddings: DataFrame, k: Int = 0, everyNth: Int = 50,
      nProbe: Int = 2, minCos: Double = 0.4): DataFrame = {
    val kk = if (k > 0) k else autoCells(embeddings)
    val v = quantized(embeddings) // session-memoized checkpoint scan
    val cent = seedCentroids(v, kk)
    val assigned = cellAssigned(embeddings, kk)
    val probes = v.filter(col("vec_id") % everyNth === 0)
      .crossJoin(broadcast(cent))
      .withColumn("dist2", expr("nn - 2 * graft_dot_long(qv, c_qv) + c_nn"))
      .withColumn("prn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("dist2"), col("c_id"))))
      .filter(col("prn") <= nProbe)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("nn").as("q_nn"), col("c_id").as("cell"))
    probes.join(assigned, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("dot", expr(dotExpr))
      .withColumn("cos", expr(cosExpr))
      .filter(col("cos") >= minCos)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("dot"), col("cos"), col("cell"))
  }

  /** Half-space cell count for [[annImi]]: the inverted multi-index
    * spans kHalf² product cells, so kHalf = ceil(sqrt(n/target)) holds
    * ~[[AnnCellTarget]] vectors per NON-EMPTY cell as the corpus grows
    * while training only 2·kHalf half-space centroids (the IMI trick:
    * quadratically many cells from linearly many centroids). Floors to 2
    * (4 cells) at both gate corpora, pinned in the static oracle SQL. */
  def imiHalfCells(embeddings: DataFrame, kMin: Int = 2,
      targetCellSize: Long = AnnCellTarget): Int =
    math.max(kMin.toLong,
      math.ceil(math.sqrt(corpusCount(embeddings).toDouble / targetCellSize)).toLong).toInt

  /** s11 — inverted multi-index (IMI) ANN (Babenko & Lempitsky, CVPR
    * 2012; FAISS `IndexIVF` with an `MultiIndexQuantizer` coarse stage):
    * the vector splits into two halves, each half gets its OWN coarse
    * quantizer of kHalf centroids, and a vector's cell is the PAIR of its
    * half-space assignments — kHalf² cells from 2·kHalf centroids. This
    * is the billion-scale coarse stage: to hold cell sizes constant a
    * flat IVF must train k ∝ n centroids (and pay k distance evaluations
    * per assignment), while IMI trains O(√n) per half and pays 2√k — the
    * codebook stays control-plane-sized at any corpus.
    *
    * The query ranks candidate cells by the multi-sequence rule — sum of
    * its half-distances (da + db, ties (a_id, b_id)) over the kHalf²
    * product — and scans the `nProbe` best cells; candidates rank by
    * exact cosine (the rerank is exact because the coarse stage only
    * PRUNES, [[annIvfPq]] adds the compressed-code scan on top).
    *
    * Exactness: half-norms and half-dots are exact BIGINT on the 2^20
    * grid via the native codegen'd dot over `slice`d halves, so cell
    * assignments, probe order, and cosines hash-match the oracle.
    *
    * Scale: two kHalf-row broadcast argmins (map-side-combinable min_by,
    * no window over the corpus) assign the cells; the probe list is a
    * per-query window over the k² product of two k-bounded frames; the
    * candidate scan is one hash join on the (cell_a, cell_b) key. Cells
    * PARTITION the vectors and a query's probe list is distinct, so each
    * (query, neighbor) pair appears at most once — the s8 argument. At
    * write time (cell_a, cell_b) is a two-level partition directory and
    * probing is static pruning, as [[writeCellPartitioned]]. */
  def annImi(embeddings: DataFrame, kHalf: Int = 0, everyNth: Int = 50,
      nProbe: Int = 2, topK: Int = 3, dims: Int = 64): DataFrame = {
    val half = dims / 2
    val kk = if (kHalf > 0) kHalf else imiHalfCells(embeddings)
    // centroids, both assignments, queries, and the scan read the halves
    // frame (session memo, not a lingering per-invocation persist)
    val v = SharedFrames.memoPersisted(embeddings, s"imi-halves:$half") {
      quantized(embeddings)
        .withColumn("qa", expr(s"slice(qv, 1, $half)"))
        .withColumn("qb", expr(s"slice(qv, ${half + 1}, $half)"))
        .withColumn("na", expr("graft_dot_long(qa, qa)"))
        .withColumn("nb", expr("graft_dot_long(qb, qb)"))
    }
    val centA = v.filter(col("vec_id") < kk)
      .select(col("vec_id").as("a_id"), col("qa").as("ca"), col("na").as("cna"))
    val centB = v.filter(col("vec_id") < kk)
      .select(col("vec_id").as("b_id"), col("qb").as("cb"), col("nb").as("cnb"))
    val aAssign = v.select("vec_id", "qa", "na").crossJoin(broadcast(centA))
      .withColumn("da", expr("na - 2 * graft_dot_long(qa, ca) + cna"))
      .groupBy("vec_id")
      .agg(expr("min_by(a_id, struct(da, a_id))").as("cell_a"))
    val bAssign = v.select("vec_id", "qb", "nb").crossJoin(broadcast(centB))
      .withColumn("db", expr("nb - 2 * graft_dot_long(qb, cb) + cnb"))
      .groupBy("vec_id")
      .agg(expr("min_by(b_id, struct(db, b_id))").as("cell_b"))
    val assigned = v.select("vec_id", "qv", "nn")
      .join(aAssign, "vec_id").join(bAssign, "vec_id")
    val q = v.filter(col("vec_id") % everyNth === 0)
      .select(col("vec_id").as("query_id"), col("qa").as("q_qa"),
        col("qb").as("q_qb"), col("na").as("q_na"), col("nb").as("q_nb"),
        col("qv").as("q_qv"), col("nn").as("q_nn"))
    val qa = q.select("query_id", "q_qa", "q_na").crossJoin(broadcast(centA))
      .withColumn("da", expr("q_na - 2 * graft_dot_long(q_qa, ca) + cna"))
      .select("query_id", "a_id", "da")
    val qb = q.select("query_id", "q_qb", "q_nb").crossJoin(broadcast(centB))
      .withColumn("db", expr("q_nb - 2 * graft_dot_long(q_qb, cb) + cnb"))
      .select("query_id", "b_id", "db")
    // multi-sequence probe order: best nProbe of the kHalf² product by
    // summed half-distance — both sides are kHalf-bounded per query
    val probes = qa.join(qb, "query_id")
      .withColumn("prn", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("da") + col("db"), col("a_id"), col("b_id"))))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("a_id").as("cell_a"), col("b_id").as("cell_b"))
    probes
      .join(assigned, Seq("cell_a", "cell_b"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(q.select("query_id", "q_qv", "q_nn"), "query_id")
      .withColumn("dot", expr(dotExpr))
      .withColumn("cos", expr(cosExpr))
      .withColumn("rnk", row_number()
        .over(Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id")))
        .cast("int"))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        col("dot"), col("cos"), col("cell_a"), col("cell_b"))
  }

  /** s12 — ANN recall monitor: recall@k of the approximate index against
    * the exact brute-force ground truth over the SAME query set — the
    * index-quality measurement every ANN deployment runs before trusting
    * a config (FAISS publishes exactly this curve per index type), and
    * the companion to s10's drift monitor: s10 says the data moved, s12
    * says what that did to answer quality. Measured here for the IMI
    * index at its default probe budget; the same join works for any of
    * s2/s3/s6/s8/s9 since they share the output contract.
    *
    * Scale: ground truth is O(Q·N) by definition — at 100 TB this runs
    * on a SAMPLED query set (everyNth is that knob) against a corpus
    * slice, which is how production recall audits work; the approximate
    * side and the per-query join are k-bounded. Exactness: both sides
    * rank by the same IEEE cosine over exact integers, and the hit count
    * is a BIGINT sum, so every column hash-matches the oracle. */
  def annRecall(embeddings: DataFrame, everyNth: Int = 50, topK: Int = 3,
      nProbe: Int = 2): DataFrame = {
    val gt = annBrute(embeddings, everyNth, topK)
      .select(col("query_id"), col("neighbor_id"))
    val ap = annImi(embeddings, everyNth = everyNth, nProbe = nProbe, topK = topK)
      .select(col("query_id").as("a_q"), col("neighbor_id").as("a_n"))
    gt.join(ap,
        col("query_id") === col("a_q") && col("neighbor_id") === col("a_n"), "left")
      .groupBy("query_id")
      .agg(sum(when(col("a_n").isNotNull, 1L).otherwise(0L)).as("n_hits"))
      .withColumn("recall", expr(s"CAST(n_hits AS DOUBLE) / $topK"))
  }

  /** s13 — PQ codebook health audit: per (subspace, codeword) occupancy
    * and quantization error for the raw-vector product quantizer s7
    * scans with — the codebook-quality check FAISS runs after training
    * (imbalance factor, dead codewords): a code that captures a large
    * share of one subspace's assignments makes ADC uninformative there,
    * and a DEAD code (zero assignments) wastes a codepoint — both are
    * retrain signals, completing the index-lifecycle monitors (s10 data
    * drift, s12 answer recall, s13 codebook fitness).
    *
    * Exactness: assignments are s7's exact-integer argmin, occupancy and
    * error sums are BIGINT, share/mean_d2 one IEEE division each over
    * identical integers — every column hash-matches the oracle (which
    * reuses s7's encode CTE chain verbatim). Dead codes survive via a
    * LEFT join from the full m×nCodes codebook grid.
    *
    * Scale: encode is the s7 broadcast-join + map-side-combinable min_by
    * (no window/sort over the corpus); the rollup shuffles m·nCodes
    * partial rows per map task, and the grid/total joins are O(m·nCodes)
    * broadcasts. Output is m·nCodes rows regardless of corpus size. */
  def pqHealth(embeddings: DataFrame, nCodes: Int = 16, m: Int = 8,
      subDim: Int = 8): DataFrame = {
    val v = quantized(embeddings)
    // feeds the codebook and the encode scan (session memo, not a
    // lingering per-invocation persist)
    val subs = SharedFrames.memoPersisted(embeddings, s"pqhealth-subs:$m:$subDim") {
      v.withColumn("s", explode(sequence(lit(0), lit(m - 1))))
        .withColumn("sub", expr(s"slice(qv, s * $subDim + 1, $subDim)"))
        .withColumn("sub_nn", expr("graft_dot_long(sub, sub)"))
        .select("vec_id", "s", "sub", "sub_nn")
    }
    val cb = subs.filter(col("vec_id") < nCodes)
      .select(col("vec_id").as("c_id"), col("s").as("c_s"),
        col("sub").as("c_sub"), col("sub_nn").as("c_nn"))
    val assigned = subs.join(broadcast(cb), col("s") === col("c_s"))
      .withColumn("dist2", expr("sub_nn - 2 * graft_dot_long(sub, c_sub) + c_nn"))
      .groupBy("vec_id", "s")
      .agg(expr("min_by(struct(c_id, dist2), struct(dist2, c_id))").as("a"))
      .select(col("s"), col("a.c_id").as("code"), col("a.dist2").as("dist2"))
    val occ = assigned.groupBy("s", "code")
      .agg(count(lit(1)).as("n_assigned"), sum("dist2").as("sum_d2"))
    val totals = occ.groupBy("s").agg(sum("n_assigned").as("n_total"))
    cb.select(col("c_s").as("s"), col("c_id").as("code"))
      .join(occ, Seq("s", "code"), "left")
      .join(broadcast(totals), Seq("s"))
      .withColumn("n_assigned", coalesce(col("n_assigned"), lit(0L)))
      .withColumn("sum_d2", coalesce(col("sum_d2"), lit(0L)))
      .withColumn("share", expr("CAST(n_assigned AS DOUBLE) / n_total"))
      .withColumn("mean_d2", expr(
        "CASE WHEN n_assigned = 0 THEN 0e0 ELSE CAST(sum_d2 AS DOUBLE) / n_assigned END"))
      .withColumn("dead", col("n_assigned") === 0L)
      .select("s", "code", "n_assigned", "sum_d2", "share", "mean_d2", "dead")
  }

  /** s4 — one distributed k-means step (assign + update) over quantized
    * embeddings: the distance argmin uses exact integer algebra
    * (|x|² − 2x·c + |c|², native codegen'd dot products against a
    * broadcast k-row centroid frame), and the new centroids are per-dim
    * means of exact BIGINT sums — two IEEE divisions at the very end, so
    * the DOUBLE means are bit-stable against the oracle.
    *
    * Scale: one broadcast of k centroids (never a shuffle of the vectors
    * for assignment), then one hash aggregation keyed (cluster, dim) with
    * map-side partials. An iterating driver loop over this step is the
    * standard distributed Lloyd's algorithm (MLlib KMeans has the same
    * per-iteration shape) — [[kmeansConverged]] is that loop. Seed
    * centroids are the first k vectors for determinism (k-means++ would
    * sample). */
  def kmeansStep(embeddings: DataFrame, k: Int = 4): DataFrame = {
    val v = quantized(embeddings)
    val cent = v.filter(col("vec_id") < k)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"), col("nn").as("c_nn"))
    val assigned = assignToCentroids(v, cent).select("vec_id", "c_id", "qv")
    assigned.select(col("c_id"), posexplode(col("qv")).as(Seq("d", "q")))
      .groupBy("c_id", "d").agg(sum("q").as("s"), count(lit(1)).as("n"))
      .select(col("c_id"), col("d").cast("int").as("d"), col("n"),
        expr("CAST(s AS DOUBLE) / n / 1048576.0").as("mean"))
  }

  /** s4b — Lloyd's algorithm iterated to convergence on the 2^20 integer
    * grid. Each round assigns (broadcast centroids, exact BIGINT argmin
    * via [[assignToCentroids]] — map-side combinable, no window/sort) and
    * updates: new centroid dim = round-half-up(Σqv_d / n), computed as ONE
    * IEEE floor(s/n + 0.5) over exact integers, then snapped back to the
    * grid — so centroids stay BIGINT vectors and every subsequent round
    * is again exact integer algebra.
    *
    * Convergence is the EXACT fixpoint (new grid centroids == old), not an
    * epsilon: once assignments repeat, sums repeat, grid centroids repeat,
    * and every later round is the identity. That is what makes this
    * oracle-checkable — DuckDB unconditionally unrolls `maxIter` rounds
    * and lands on the same fixpoint the early-exit loop found.
    *
    * Scale: the driver holds only the k×dims centroid table (the same
    * control-plane collect MLlib's KMeans does every round); the data-side
    * work per round is one broadcast join + two hash aggregations, never a
    * shuffle of the vectors by anything but their own id, never a sort.
    * Empty clusters keep their previous centroid (n = 0). */
  def kmeansConverged(embeddings: DataFrame, k: Int = 4, maxIter: Int = 24,
      dims: Int = 64): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    convergedCentroids(embeddings, k, maxIter).flatMap { case (cId, qv, n) =>
      qv.zipWithIndex.map { case (cq, d) =>
        (cId, d, n, cq, cq.toDouble / 1048576.0)
      }
    }.toDF("c_id", "d", "n", "cq", "mean")
  }

  /** The driver-side Lloyd's fixpoint loop behind [[kmeansConverged]] (s4b)
    * and [[semDedup]] (d12): returns (c_id, grid centroid, cluster size).
    * Only the k×dims centroid table ever reaches the driver — the same
    * control-plane collect MLlib's KMeans performs every round. */
  def convergedCentroids(embeddings: DataFrame, k: Int,
      maxIter: Int): Seq[(Long, Seq[Long], Long)] =
    // session-shared pay-once artifact (k×dims values): s4b and d12 both
    // train on the same input, and bench reps after the warmup measure the
    // steady-state query, not a re-run of the Lloyd's loop
    SharedFrames.memoValue(embeddings, s"kmeans-centroids k=$k iter=$maxIter") {
      convergedCentroidsUncached(embeddings, k, maxIter)
    }

  private def convergedCentroidsUncached(embeddings: DataFrame, k: Int,
      maxIter: Int): Seq[(Long, Seq[Long], Long)] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val v = quantized(embeddings) // session-memoized checkpoint scan
    try {
      val seed: Seq[(Long, Seq[Long])] = v.filter(col("vec_id") < k)
        .select(col("vec_id"), col("qv")).as[(Long, Seq[Long])]
        .collect().sortBy(_._1).toSeq
      var cent = seed
      var ns = Map.empty[Long, Long]
      var it = 0
      var converged = false
      while (it < maxIter && !converged) {
        val cdf = cent.toDF("c_id", "c_qv")
          .withColumn("c_nn", expr("graft_dot_long(c_qv, c_qv)"))
        val upd = assignToCentroids(v, cdf)
          .select(col("c_id"), posexplode(col("qv")).as(Seq("d", "q")))
          .groupBy("c_id", "d").agg(sum("q").as("s"), count(lit(1)).as("n"))
          .withColumn("cq", expr("CAST(floor(CAST(s AS DOUBLE) / n + 0.5e0) AS BIGINT)"))
          .select(col("c_id"), col("d"), col("n"), col("cq"))
          .as[(Long, Int, Long, Long)].collect()
        val byC = upd.groupBy(_._1)
        val next = cent.map { case (cId, oldQv) =>
          byC.get(cId) match {
            case Some(rows) => cId -> rows.sortBy(_._2).map(_._4).toSeq
            case None       => cId -> oldQv // empty cluster keeps its centroid
          }
        }
        ns = cent.map { case (cId, _) =>
          cId -> byC.get(cId).map(_.head._3).getOrElse(0L)
        }.toMap
        converged = next == cent
        cent = next
        it += 1
      }
      cent.map { case (cId, qv) => (cId, qv, ns(cId)) }
    } finally v.unpersist()
  }

  /** The IVF layout at 100 TB: the cell assignment becomes a WRITE-TIME
    * partition column, so search-time cell pruning is partition pruning at
    * the parquet scan — the probe never opens a file outside its cell's
    * directory. s2/s6 compute the same pruning as a join predicate over an
    * in-memory assignment; this is the storage-layout form the scaladoc of
    * [[annIvfTrained]] promises ("at 100 TB the assignment is a write-time
    * column"), made concrete: train (first-k centroids, as s6), assign
    * (exact integer argmin against broadcast centroids), write
    * `partitionBy(cell)`.
    *
    * Partition-count sizing at scale mirrors [[graft.data.Bucketing]]:
    * #cells ≈ corpus / target-partition-bytes, bounded by the directory
    * fan-out the store tolerates; a probe with nProbe cells reads
    * nProbe/#cells of the data — the scan cost drops linearly with the
    * cell count instead of rescanning the corpus per query. */
  def writeCellPartitioned(embeddings: DataFrame, path: String, k: Int = 4): Unit = {
    val v = quantized(embeddings)
    val cent = v.filter(col("vec_id") < k)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"), col("nn").as("c_nn"))
    assignToCentroids(v, cent)
      .withColumnRenamed("c_id", "cell")
      .write.mode("overwrite").partitionBy("cell").parquet(path)
  }

  /** Probe the cells of a [[writeCellPartitioned]] layout with an explicit
    * query vector: the literal `cell IN (...)` predicate is a static
    * partition filter, so BOTH scans' file lists are the probed cell
    * directories only (asserted by `IvfLayoutSpec`; re-measured at 10× by
    * `tools.ScaleRehearsal`).
    *
    * Contract: `cells` must contain the query's own cell — true for every
    * nProbe ≥ 1 probe list, whose first element IS the query's nearest
    * cell. The query-row fetch goes through the same cell filter; without
    * it the lookup scans every cell directory, which the 10× rehearsal
    * flagged as an unpruned full-layout read (ivf:probe_unpruned). */
  def probeCell(spark: SparkSession, path: String, cells: Seq[Long],
      queryId: Long, topK: Int = 3): DataFrame = {
    val assigned = spark.read.parquet(path)
      .filter(col("cell").isInCollection(cells))
    val q = assigned.filter(col("vec_id") === queryId)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("nn").as("q_nn"))
    rankTopK(q.join(assigned, col("vec_id") =!= col("query_id")), topK)
  }

  /** Two-level filtered-search layout — the storage form of
    * [[annIvfFiltered]]'s scale claim that "(cell, lang) is a two-level
    * partition directory and the probe prunes BOTH levels statically":
    * vectors write under `cell=<coarse cell>/lang=<metadata>/`, so a
    * filtered probe is parquet partition pruning on the probe list AND
    * the constraint value — the metadata filter costs file listing, not
    * scan bandwidth. Directory fan-out is #cells × #langs; at 100 TB the
    * second level holds low-cardinality constraint columns only
    * (language, license, modality — the columns filtered searches
    * actually constrain on), exactly like Hive partition design. */
  def writeCellLangPartitioned(embeddings: DataFrame, documents: DataFrame,
      path: String, k: Int = 4): Unit = {
    val v = quantized(embeddings)
    val cent = v.filter(col("vec_id") < k)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"), col("nn").as("c_nn"))
    assignToCentroids(v, cent)
      .withColumnRenamed("c_id", "cell")
      .join(documents.select(col("doc_id").as("vec_id"), col("lang")), "vec_id")
      .write.mode("overwrite").partitionBy("cell", "lang").parquet(path)
  }

  /** Probe a [[writeCellLangPartitioned]] layout: `cell IN (...)` and
    * `lang = <constraint>` are BOTH static partition filters, so the scan
    * opens only the probed cells' constraint-language subdirectories
    * (`FilteredLayoutSpec` asserts the two-level pruning and
    * answer-equality with the in-memory [[annIvfFiltered]] chain).
    * `cells` must contain the query's own cell and `lang` the query's
    * own language — true by construction for a same-language filtered
    * probe list. */
  def probeCellLang(spark: SparkSession, path: String, cells: Seq[Long],
      lang: String, queryId: Long, topK: Int = 3): DataFrame = {
    val assigned = spark.read.parquet(path)
      .filter(col("cell").isInCollection(cells) && col("lang") === lang)
    val q = assigned.filter(col("vec_id") === queryId)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("nn").as("q_nn"))
    rankTopK(q.join(assigned, col("vec_id") =!= col("query_id")), topK)
  }

  /** The converged k-means centroids as an O(k) plan-time literal frame
    * (c_id, c_qv, c_nn) — the trained counterpart of [[seedCentroids]],
    * entering plans the way every trained artifact here does: as a
    * LocalRelation, never a join against the corpus. */
  private def trainedCentroidFrame(embeddings: DataFrame, kk: Int,
      maxIter: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    convergedCentroids(embeddings, kk, maxIter)
      .map { case (cId, qv, _) => (cId, qv) }.toDF("c_id", "c_qv")
      .withColumn("c_nn", expr("graft_dot_long(c_qv, c_qv)"))
  }

  /** Corpus assigned to the CONVERGED centroids — one broadcast-argmin
    * pass, the write-time column of a retrained [[writeCellPartitioned]]
    * layout. `trainOn` picks the training corpus (default: the corpus
    * itself = a full retrain; pass the BASE slice for d14's
    * increment-invariance discipline, where an ingest migrates under the
    * shipped centroids and retraining is a separate decision s17
    * informs). */
  def trainedAssignment(embeddings: DataFrame, k: Int = 0,
      maxIter: Int = 24, trainOn: Option[DataFrame] = None): DataFrame = {
    val t = trainOn.getOrElse(embeddings)
    val kk = if (k > 0) k else autoCells(t)
    assignToCentroids(quantized(embeddings),
        trainedCentroidFrame(t, kk, maxIter))
      .withColumnRenamed("c_id", "cell")
  }

  /** s17 — the RETRAIN decision report, closing the index lifecycle that
    * s10 (centroid drift), s12 (recall) and s13 (codebook health) only
    * monitor: re-train the coarse centroids on the current corpus
    * (base + ingest, [[convergedCentroids]]), re-assign, and report per
    * cell what a migration would move — old/new populations, movers in
    * and out, and whether the cell's files need rewriting at all. This is
    * the reference's full-refresh-through-the-same-path discipline (a
    * refresh re-enters the normal pipeline rather than a side channel;
    * `replication_handler/components/low_level_binlog_stream_reader_wrapper.py:118-124`)
    * applied to the vector index: the retrained layout ships through the
    * SAME assign→partition write as the original.
    *
    * Scale: two broadcast-argmin corpus passes (seed + trained centroids,
    * both O(k) literals), ONE keyed (cell_old, cell_new) count — an O(k²)
    * transition frame — and a tiny rollup. No pairwise work anywhere;
    * [[migrateCellLayout]] consumes the same diff to rewrite only the
    * `needs_rewrite` cells. */
  def ivfRetrainReport(embeddings: DataFrame, k: Int = 0,
      maxIter: Int = 24): DataFrame = {
    val kk = if (k > 0) k else autoCells(embeddings)
    val v = quantized(embeddings)
    val oldA = assignToCentroids(v, seedCentroids(v, kk))
      .select(col("vec_id"), col("c_id").as("cell_old"))
    val newA = trainedAssignment(embeddings, kk, maxIter)
      .select(col("vec_id"), col("cell").as("cell_new"))
    val trans = oldA.join(newA, "vec_id")
      .groupBy("cell_old", "cell_new").agg(count(lit(1)).as("c"))
    val o = trans.groupBy(col("cell_old").as("cell")).agg(
      sum("c").as("n_old"),
      sum(when(col("cell_new") =!= col("cell_old"), col("c"))
        .otherwise(lit(0L))).as("moved_out"))
    val n = trans.groupBy(col("cell_new").as("cell")).agg(
      sum("c").as("n_new"),
      sum(when(col("cell_new") =!= col("cell_old"), col("c"))
        .otherwise(lit(0L))).as("moved_in"))
    o.join(n, Seq("cell"), "full")
      .select(col("cell"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("moved_in"), lit(0L)).as("moved_in"),
        coalesce(col("moved_out"), lit(0L)).as("moved_out"),
        (coalesce(col("moved_in"), lit(0L)) > 0 ||
          coalesce(col("moved_out"), lit(0L)) > 0).as("needs_rewrite"))
  }

  /** [[writeCellPartitioned]] with TRAINED centroids — the layout a
    * retrain ships. Same partition directory contract; only the
    * assignment column's provenance differs. */
  def writeCellPartitionedTrained(embeddings: DataFrame, path: String,
      k: Int = 0, maxIter: Int = 24, trainOn: Option[DataFrame] = None): Unit =
    trainedAssignment(embeddings, k, maxIter, trainOn)
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Incrementally migrate a [[writeCellPartitioned]]-shaped layout at
    * `path` to the RETRAINED assignment of `embeddings`: only cells whose
    * membership changed are rewritten (dynamic partition overwrite of the
    * changed-cell slice), cells emptied by the retrain are deleted, and
    * untouched cell directories are left byte-identical — at 100 TB the
    * difference between an overnight full rewrite and a bounded
    * incremental one. New vectors absent from the old layout and dropped
    * vectors absent from the corpus both mark their cells changed, so the
    * same path migrates pure ingest, pure retirement, and retrain drift.
    *
    * The changed-cell list is a control-plane collect bounded by the cell
    * count (O(k), the same class as the centroid collect). Returns
    * (rewritten cells, deleted cells, total cells in the new layout) —
    * IvfMigrationSpec pins migrated ≡ full re-write with strictly fewer
    * cell directories touched. */
  def migrateCellLayout(embeddings: DataFrame, path: String, k: Int = 0,
      maxIter: Int = 24, trainOn: Option[DataFrame] = None):
      (Seq[Long], Seq[Long], Long) = {
    val spark = embeddings.sparkSession
    val newA = trainedAssignment(embeddings, k, maxIter, trainOn)
    // one materialization: the diff and the rewrite slice both read it.
    // SharedFrames' contract is that the tag encodes every non-input
    // parameter — trainOn is a FRAME, so its identity is its canonicalized
    // plan's semanticHash, not a mere isDefined bit (r9 ADVICE: two
    // migrations over the same embeddings with different training corpora
    // must never share an assignment)
    val trainTag = trainOn
      .map(t => t.queryExecution.analyzed.canonicalized.semanticHash().toString)
      .getOrElse("self")
    val newM = SharedFrames.memoPersisted(embeddings,
      s"ivf-migrate-assign:$k:$maxIter:$trainTag")(newA)
    val oldA = spark.read.parquet(path)
      .select(col("vec_id"), col("cell").as("cell_old"))
    val changedCells = newM.select(col("vec_id"), col("cell").as("cell_new"))
      .join(oldA, Seq("vec_id"), "full")
      .filter(col("cell_old").isNull || col("cell_new").isNull ||
        col("cell_old") =!= col("cell_new"))
      .select(explode(array(col("cell_old"), col("cell_new"))).as("cell"))
      .filter(col("cell").isNotNull)
      .distinct().collect().map(_.getLong(0)).sorted.toSeq
    val newCells = newM.select("cell").distinct()
      .collect().map(_.getLong(0)).toSet
    val (rewrite, empty) = changedCells.partition(newCells.contains)
    if (rewrite.nonEmpty)
      newM.filter(col("cell").isInCollection(rewrite))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell").parquet(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    empty.foreach { c =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/cell=$c"), true)
    }
    (rewrite, empty, newCells.size.toLong)
  }

  /** Compact a [[writeCellPartitioned]] layout's small files — the
    * MAINTAIN leg of the index lifecycle: continuous ingest
    * ([[graft.streaming.StreamingAnalytics.cellIngestStream]]) appends
    * one file set per micro-batch per touched cell, so a cell's OPEN
    * cost grows with batch count rather than data size — the classic
    * parquet small-files problem, and at 100 TB the difference between
    * a probe opening 4 files and 4,000. Rewrites ONLY cells whose file
    * count exceeds `maxFilesPerCell` (one coalesced file per compacted
    * cell, dynamic partition overwrite), leaving compliant cell
    * directories byte-identical — the same touched-set discipline as
    * [[migrateCellLayout]].
    *
    * The compacted slice is materialized (localCheckpoint) before the
    * overwrite because Spark refuses a write that reads its own input
    * path; a deployment compacting truly huge cells batches the cell
    * list per pass (the caller picks how many — the returned counts are
    * the signal) or stages to a side directory with one rename, the
    * wire sink's discipline. The per-cell file listing is a
    * control-plane O(#cells) FS walk, the migrateCellLayout collect
    * class. Returns (compacted cells, files before, files after). */
  def compactCellLayout(spark: SparkSession, path: String,
      maxFilesPerCell: Int = 4): (Seq[Long], Long, Long) = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(p).count { f =>
        val n = f.getPath.getName
        f.isFile && !n.startsWith("_") && !n.startsWith(".")
      }.toLong
    def cellCounts(): Seq[(Long, Long)] =
      fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
        .map(s => (s.getPath.getName.stripPrefix("cell=").toLong,
          dataFiles(s.getPath)))
    val before = cellCounts()
    val toCompact = before.filter(_._2 > maxFilesPerCell).map(_._1).sorted
    if (toCompact.nonEmpty) {
      val slice = spark.read.parquet(path)
        .filter(col("cell").isInCollection(toCompact))
        .localCheckpoint(true)
      try slice
        .repartition(toCompact.size, col("cell"))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell").parquet(path)
      finally slice.queryExecution.analyzed.foreach {
        // checkpoint blocks are invisible to DataFrame.unpersist (the
        // SharedFrames.clear lesson) — release the RDD directly
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ => ()
      }
    }
    val after = cellCounts()
    (toCompact, before.map(_._2).sum, after.map(_._2).sum)
  }

  /** The shipped coarse-centroid literals of a [[writeCellPartitioned]]
    * layout — (c_id, quantized vector), the O(k) control-plane artifact a
    * continuous ingester carries (same collect class as
    * [[convergedCentroids]]). Seed discipline: the first `k` vectors'
    * quantized forms, exactly what [[writeCellPartitioned]] assigns
    * against. */
  def seedCentroidLiterals(embeddings: DataFrame, k: Int = 4): Seq[(Long, Seq[Long])] =
    quantized(embeddings).filter(col("vec_id") < k)
      .select("vec_id", "qv")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toSeq

  /** One micro-batch of the streaming cell-layout ingest
    * ([[graft.streaming.StreamingAnalytics.cellIngestStream]]): quantize
    * the arriving raw vectors, assign them to the SHIPPED centroid
    * literals with the same exact-integer argmin every batch writer uses,
    * and append the rows into the layout's cell directories (dynamic
    * partition append — only the touched cells gain files; existing
    * directories are never rewritten). Quantization is inlined rather
    * than [[quantized]]: that helper memoizes per input plan, and a
    * micro-batch is a fresh plan every trigger — memoizing it would grow
    * session state per batch.
    *
    * Idempotence: foreachBatch retries re-deliver a batch, so each
    * appended batch commits a `_ingest_<batchId>` marker LAST and a
    * re-delivered batchId short-circuits before writing. A crash between
    * the append and the marker re-appends that one batch (the standard
    * at-least-once residue); deployments needing exactly-once layer the
    * wire sink's staged-rename or dedup on vec_id at read, which the
    * layout's readers tolerate (probes rank by (distance, vec_id)). */
  private[graft] def ingestCellBatch(batch: DataFrame, path: String,
      centroids: Seq[(Long, Seq[Long])], batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$path/_ingest_$batchId")
    if (fs.exists(marker)) return
    val cent = centroids.toDF("c_id", "c_qv")
      .withColumn("c_nn", expr("graft_dot_long(c_qv, c_qv)"))
    val v = batch
      .withColumn("qv", expr("transform(embedding, x -> CAST(floor(x * 1048576e0) AS BIGINT))"))
      .withColumn("nn", expr("graft_dot_long(qv, qv)"))
      .select("vec_id", "label", "qv", "nn")
    assignToCentroids(v, cent)
      .withColumnRenamed("c_id", "cell")
      .write.mode(SaveMode.Append).partitionBy("cell").parquet(path)
    fs.create(marker, true).close()
  }

  /** The s7/s13 codebook (the first nCodes vectors' sub-vectors)
    * collected as driver-side literals for the streaming monitor
    * ([[graft.streaming.StreamingAnalytics.pqIngestMonitor]]) — an
    * O(m·nCodes) control-plane collect, same class as
    * [[convergedCentroids]]. */
  def pqCodebookLiterals(embeddings: DataFrame, nCodes: Int = 16,
      m: Int = 8, subDim: Int = 8): Seq[(Int, Long, Seq[Long])] =
    quantized(embeddings).filter(col("vec_id") < nCodes)
      .withColumn("s", explode(sequence(lit(0), lit(m - 1))))
      .withColumn("sub", expr(s"slice(qv, s * $subDim + 1, $subDim)"))
      .select("s", "vec_id", "sub")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toSeq)).toSeq

  /** Write-time PQ codes layout — the storage half of s7's scale claim
    * that at 100 TB "the scan reads codes, never floats": one row per
    * vector, (vec_id, codes) with the m sub-space codeword ids in
    * sub-space order, partitioned by the vector's coarse cell. An ADC
    * probe against this layout is (a) parquet partition pruning to the
    * probed cells and (b) a scan whose ReadSchema is two narrow columns
    * — ~32× less bandwidth than the raw vectors (PqLayoutSpec asserts
    * the partition filter, the narrow ReadSchema, AND answer-equality
    * with the in-memory s7 chain). Encoding is s7's exact-integer argmin
    * (broadcast codebook + map-side-combinable min_by), then one keyed
    * collect_list bounded at m rows per vector. */
  def writePqCodes(embeddings: DataFrame, path: String, nCodes: Int = 16,
      m: Int = 8, subDim: Int = 8): Unit = {
    val v = quantized(embeddings)
    val subs = v
      .withColumn("s", explode(sequence(lit(0), lit(m - 1))))
      .withColumn("sub", expr(s"slice(qv, s * $subDim + 1, $subDim)"))
      .withColumn("sub_nn", expr("graft_dot_long(sub, sub)"))
      .select("vec_id", "label", "s", "sub", "sub_nn")
    val cb = subs.filter(col("vec_id") < nCodes)
      .select(col("vec_id").as("c_id"), col("s").as("c_s"),
        col("sub").as("c_sub"), col("sub_nn").as("c_nn"))
    subs.join(broadcast(cb), col("s") === col("c_s"))
      .withColumn("dist2", expr("sub_nn - 2 * graft_dot_long(sub, c_sub) + c_nn"))
      .groupBy("vec_id", "label", "s")
      .agg(expr("min_by(c_id, struct(dist2, c_id))").as("code"))
      .groupBy("vec_id", "label")
      .agg(expr("transform(array_sort(collect_list(struct(s, code))), x -> x.code)")
        .as("codes"))
      .withColumnRenamed("label", "cell")
      .write.mode("overwrite").partitionBy("cell").parquet(path)
  }

  /** ADC-probe a [[writePqCodes]] layout for one query: the query's cell
    * filter is a static partition predicate, the codes scan reads only
    * (vec_id, codes), the per-query codeword distance table is an
    * O(m·nCodes) broadcast, and only the adcTopK shortlist touches raw
    * vectors for the exact rerank — the deployment read path of the PQ
    * index. Returns exactly what [[annPq]] returns for the same query
    * (PqLayoutSpec pins the equivalence). */
  def probePqAdc(spark: SparkSession, path: String, embeddings: DataFrame,
      queryId: Long, nCodes: Int = 16, m: Int = 8, subDim: Int = 8,
      adcTopK: Int = 10, topK: Int = 5): DataFrame = {
    val v = quantized(embeddings)
    // query metadata: a 1-row control-plane lookup (cell + raw vector)
    val qLabel = v.filter(col("vec_id") === queryId)
      .select("label").collect()(0).getAs[Number](0).longValue()
    // feeds the codebook AND the query distance table — O((1+nCodes)·m)
    // rows, so memo entries stay control-plane tiny per probed query
    val qsubs = SharedFrames.memoPersisted(embeddings, s"pq-probe-subs:$queryId:$nCodes:$m:$subDim") {
      v.filter(col("vec_id") === queryId || col("vec_id") < nCodes)
        .withColumn("s", explode(sequence(lit(0), lit(m - 1))))
        .withColumn("sub", expr(s"slice(qv, s * $subDim + 1, $subDim)"))
        .withColumn("sub_nn", expr("graft_dot_long(sub, sub)"))
        .select("vec_id", "s", "sub", "sub_nn")
    }
    val cb = qsubs.filter(col("vec_id") < nCodes)
      .select(col("vec_id").as("c_id"), col("s").as("c_s"),
        col("sub").as("c_sub"), col("sub_nn").as("c_nn"))
    val qd = qsubs.filter(col("vec_id") === queryId)
      .join(broadcast(cb), col("s") === col("c_s"))
      .withColumn("qdist2", expr("sub_nn - 2 * graft_dot_long(sub, c_sub) + c_nn"))
      .select(col("c_s").as("q_s"), col("c_id").as("qcode"), col("qdist2"))
    val codes = spark.read.parquet(path)
      .filter(col("cell") === qLabel && col("vec_id") =!= queryId)
      .selectExpr("vec_id", "posexplode(codes) AS (s, code)")
    val cand = codes
      .join(broadcast(qd), col("s") === col("q_s") && col("code") === col("qcode"))
      .groupBy("vec_id").agg(sum("qdist2").as("adc_d2"))
      .withColumn("query_id", lit(queryId))
      .withColumn("crn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc_d2"), col("vec_id"))))
      .filter(col("crn") <= adcTopK)
      .select("query_id", "vec_id", "adc_d2")
    val qfull = v.filter(col("vec_id") === queryId)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("nn").as("q_nn"))
    cand.join(v.select("vec_id", "qv", "nn"), "vec_id")
      .join(broadcast(qfull), "query_id")
      .withColumn("dot", expr(dotExpr))
      .withColumn("cos", expr(cosExpr))
      .withColumn("rnk", row_number()
        .over(Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id")))
        .cast("int"))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        col("adc_d2"), col("dot"), col("cos"))
      .orderBy("rnk")
  }

  /** Scored candidate pairs within a (label, LSH-bucket) cell — the ONE
    * definition of the near-dup candidate set, shared by [[dedupEmbedding]]
    * (rank-1 per vector, `ordered = false`) and [[nearPairs]] (each pair
    * once, `ordered = true`), so a change to the cell geometry (bits,
    * bucket function) cannot desynchronize the two consumers. Output
    * carries (query_id, vec_id, dot, cos). */
  private def cellScoredPairs(embeddings: DataFrame, bits: Int,
      ordered: Boolean): DataFrame = {
    val vb = quantized(embeddings)
      .withColumn("bucket", expr(bucketExpr(bits))) // narrow, no join
    val a = vb.select(col("vec_id").as("query_id"), col("label").as("q_label"),
      col("qv").as("q_qv"), col("nn").as("q_nn"), col("bucket").as("q_bucket"))
    val pairPred =
      if (ordered) col("query_id") < col("vec_id")
      else col("vec_id") =!= col("query_id")
    a.join(vb,
        col("q_label") === col("label") && col("q_bucket") === col("bucket") && pairPred)
      .withColumn("dot", expr(dotExpr))
      .withColumn("cos", expr(cosExpr))
  }

  /** All vector pairs over the cosine threshold, candidates bounded by
    * the (label, LSH-bucket) cell exactly as [[dedupEmbedding]] — the
    * thresholded (not rank-1) form, for signal-fusion consumers. */
  def nearPairs(embeddings: DataFrame, threshold: Double = 0.95,
      bits: Int = 4): DataFrame =
    cellScoredPairs(embeddings, bits, ordered = true)
      .filter(col("cos") >= threshold)
      .select(col("query_id").as("vec_a"), col("vec_id").as("vec_b"),
        col("dot"), col("cos"))

  /** d5 — embedding near-dup: nearest candidate per vector, flagged as dup
    * over a cosine threshold. Candidates must share the label cell AND the
    * low-`bits` LSH bucket, so a dense label cell subdivides into 2^bits
    * hash cells instead of going quadratic — the per-cell pair count is
    * ~(n/2^bits)² per label rather than n². True near-dups (cos → 1) land
    * in the same bucket with probability (1 - θ/π)^bits ≈ 1, so recall on
    * actual duplicates is preserved; at larger corpus sizes raise `bits`
    * to hold the cell size constant (bits ≈ log2(n_label / target_cell)).
    * Vectors with no candidate in their (label, bucket) cell emit a null
    * neighbor and is_dup=false. */
  def dedupEmbedding(embeddings: DataFrame, threshold: Double = 0.95,
      bits: Int = 4): DataFrame = {
    val best = cellScoredPairs(embeddings, bits, ordered = false)
      .withColumn("rnk", row_number()
        .over(Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rnk") === 1)
      .select(col("query_id").as("vec_id"), col("vec_id").as("nn_id"), col("cos"))
    quantized(embeddings).select("vec_id").join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("nn_id"), col("cos"),
        coalesce(col("cos") >= threshold, lit(false)).as("is_dup"))
  }

  /** s10 — IVF index drift monitor: the MONITOR step of the index
    * lifecycle (train → assign → write → probe → monitor → retrain).
    * Vectors after `baseMaxId` are the post-training ingest; both
    * populations assign to the BASE-trained centroids, and each cell
    * reports its base/new occupancy shares and mean quantization error.
    * New data piling into few cells (large `share_shift`) or quantizing
    * much worse (`mean_d2_new` ≫ `mean_d2_base`) is the retrain signal —
    * FAISS-style indexes degrade exactly this way under distribution
    * shift, and at 100 TB retraining is expensive enough that you want
    * the measurement, not a guess.
    *
    * Shape: one broadcast-centroid argmin (no shuffle of the vectors),
    * one k-row keyed aggregation, one scalar-total attach. Sums of
    * integer-grid distances stay exact BIGINT; means/shares are terminal
    * IEEE divisions, so every column hash-matches the oracle. */
  def ivfDrift(embeddings: DataFrame, k: Int = 0,
      baseMaxId: Long = 250): DataFrame = {
    // auto-k capped at baseMaxId: the monitor's premise is centroids
    // trained on the BASE population, so the seed ids must all be base ids
    val kk = if (k > 0) k
             else math.min(autoCells(embeddings).toLong, math.max(baseMaxId, 1L)).toInt
    val v = quantized(embeddings)
    val cent = v.filter(col("vec_id") < kk) // kk ≤ baseMaxId: trained on base
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"), col("nn").as("c_nn"))
    val d = v.crossJoin(broadcast(cent))
      .withColumn("dist2", expr("nn - 2 * graft_dot_long(qv, c_qv) + c_nn"))
      .groupBy("vec_id")
      .agg(expr("min_by(struct(c_id, dist2), struct(dist2, c_id))").as("s"))
      .select(col("vec_id"), col("s.c_id").as("cell"), col("s.dist2").as("d2"))
      .withColumn("is_new", col("vec_id") >= baseMaxId)
    val per = d.groupBy("cell").agg(
      sum(when(!col("is_new"), 1L).otherwise(0L)).as("n_base"),
      sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"),
      sum(when(!col("is_new"), col("d2"))).as("s_base"),
      sum(when(col("is_new"), col("d2"))).as("s_new"))
    val tot = d.agg(
      sum(when(!col("is_new"), 1L).otherwise(0L)).as("t_base"),
      sum(when(col("is_new"), 1L).otherwise(0L)).as("t_new"))
    per.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_base"), col("n_new"),
        expr("CAST(n_base AS DOUBLE) / t_base").as("frac_base"),
        expr("CAST(n_new AS DOUBLE) / t_new").as("frac_new"),
        expr("CASE WHEN n_base = 0 THEN NULL ELSE CAST(s_base AS DOUBLE) / n_base END")
          .as("mean_d2_base"),
        expr("CASE WHEN n_new = 0 THEN NULL ELSE CAST(s_new AS DOUBLE) / n_new END")
          .as("mean_d2_new"),
        expr("CAST(n_new AS DOUBLE) / t_new - CAST(n_base AS DOUBLE) / t_base")
          .as("share_shift"))
  }

  /** d12 — SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embeddings, then within each
    * cluster keep a document only if no document before it in the
    * cluster's scan order is ε-similar. The scan order is the paper's —
    * descending cosine to the cluster centroid (most-central first, ties
    * by vec_id) — realized prefix-style: doc i is dropped iff SOME doc
    * earlier in the order is ≥ ε cosine-similar to it. This differs from
    * d5 (LSH-cell nearest-neighbor flagging): d12 partitions the corpus by
    * LEARNED semantic cells and makes a keep/drop decision, the curation
    * step that removes semantically redundant (not just near-identical)
    * training data.
    *
    * Deviation from the paper for SIMILARITY CHAINS: a document is
    * dropped if ANY earlier-ranked cluster-mate is ε-similar — including
    * mates that were themselves dropped. For a chain A~B, B~C, A≁C this
    * drops BOTH B and C, where the paper's keep-one-per-duplicate-group
    * greedy (compare only against previously KEPT mates) would keep C.
    * The prefix form is deliberately chosen because it is a JOIN —
    * expressible as one distributed pass and an unrolled SQL oracle —
    * while the greedy keep-set is a sequential recurrence along the scan
    * order (each verdict depends on all previous verdicts). It is the
    * more aggressive of the two (never keeps a doc the paper would drop),
    * which for curation errs toward deduplication.
    *
    * Scale: pair generation is confined to a cluster, and k defaults to
    * n/[[SemDedupClusterTarget]] ([[autoCells]] — the paper's k ∝ n,
    * proven at the 100× rehearsal point: 51 s at k=4·copies vs 416 s
    * fixed-k), holding per-cluster candidate counts — and therefore total
    * pair work — linear in n. Within a cluster the prefix pair join is
    * BLOCKED: ranks group into width-[[semDedupBlockWidth]] blocks and
    * the join keys on (cluster, earlier-block), so one cluster's O(c²)
    * pairs spread over ~c/width tasks instead of landing on a single
    * c_id-keyed task (the r7 skew finding); each task's earlier side is
    * ≤ width rows. Nothing sorts or windows globally (the rank window
    * partitions by cluster). Only the k×dims centroid table is
    * collected/broadcast (bounded, same class as s4/s6). Exactness:
    * centroids live on the 2^20 integer grid ([[convergedCentroids]]),
    * dots/norms are exact BIGINT via the native codegen'd
    * [[graft.functions.LongDotProduct]], and both cosines are single IEEE
    * double expressions over those integers — so every column
    * hash-matches the unrolled DuckDB oracle. */
  def semDedup(embeddings: DataFrame, k: Int = 0, maxIter: Int = 24,
      eps: Double = 0.35, blockWidth: Long = semDedupBlockWidth): DataFrame = {
    val kk = if (k > 0) k
             else autoCells(embeddings, targetCellSize = SemDedupClusterTarget)
    val spark = embeddings.sparkSession
    import spark.implicits._
    val v = quantized(embeddings)
    val cdf = convergedCentroids(embeddings, kk, maxIter)
      .map { case (cId, qv, _) => (cId, qv) }.toDF("c_id", "c_qv")
      .withColumn("c_nn", expr("graft_dot_long(c_qv, c_qv)"))
    val ranked = assignToCentroids(v, cdf)
      .join(broadcast(cdf), "c_id") // k rows: re-attach the centroid vector
      .withColumn("cent_cos", expr(
        "CAST(graft_dot_long(qv, c_qv) AS DOUBLE) / sqrt(CAST(nn AS DOUBLE) * CAST(c_nn AS DOUBLE))"))
      .withColumn("r", row_number()
        .over(Window.partitionBy("c_id").orderBy(col("cent_cos").desc, col("vec_id")))
        .cast("long"))
      .select("vec_id", "c_id", "qv", "nn", "cent_cos", "r")
    // blocked prefix join: each row explodes over the earlier BLOCKS it
    // must compare against (0..own block), and the earlier side carries
    // its own block id — so the equi-join keys on (cluster, block) and a
    // cluster's pairs hash across ~c/width reducers. The pair SET is
    // identical to the plain e_r < r prefix join (every earlier row lives
    // in exactly one block ≤ the row's own), so results are byte-equal;
    // at gate scale (cluster ≤ width) every block id is 0 and the join
    // degenerates to the unblocked one.
    val w = blockWidth
    val earlier = ranked.select(col("c_id").as("e_cid"), col("vec_id").as("e_id"),
      col("qv").as("e_qv"), col("nn").as("e_nn"), col("r").as("e_r"),
      expr(s"(r - 1) div $w").as("e_blk"))
    val dropped = ranked
      .withColumn("jb", explode(sequence(lit(0L), expr(s"(r - 1) div $w"))))
      .join(earlier,
        col("e_cid") === col("c_id") && col("e_blk") === col("jb") &&
          col("e_r") < col("r"))
      .withColumn("pcos", expr(
        "CAST(graft_dot_long(qv, e_qv) AS DOUBLE) / sqrt(CAST(nn AS DOUBLE) * CAST(e_nn AS DOUBLE))"))
      .filter(col("pcos") >= eps)
      .select(col("vec_id")).distinct().withColumn("is_dropped", lit(true))
    ranked.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("c_id"), col("cent_cos"),
        col("is_dropped").isNull.as("keep"))
  }

  /** The base-trained centroid frame shared by the d14 family:
    * [[convergedCentroids]] over the base slice only (memoized — later
    * callers pay nothing). */
  private def semBaseCdf(embeddings: DataFrame, baseMaxId: Long,
      k: Int, maxIter: Int): DataFrame = {
    val base = embeddings.filter(col("vec_id") < baseMaxId)
    val kk = if (k > 0) k
             else autoCells(base, targetCellSize = SemDedupClusterTarget)
    val spark = embeddings.sparkSession
    import spark.implicits._
    convergedCentroids(base, kk, maxIter)
      .map { case (cId, qv, _) => (cId, qv) }.toDF("c_id", "c_qv")
      .withColumn("c_nn", expr("graft_dot_long(c_qv, c_qv)"))
  }

  /** d12's rank stage against an explicit centroid frame: assignment,
    * cosine to centroid, scan-order rank within the cluster. */
  private def semRankedOf(sub: DataFrame, cdf: DataFrame): DataFrame = sub
    .transform(assignToCentroids(_, cdf))
    .join(broadcast(cdf), "c_id")
    .withColumn("cent_cos", expr(
      "CAST(graft_dot_long(qv, c_qv) AS DOUBLE) / sqrt(CAST(nn AS DOUBLE) * CAST(c_nn AS DOUBLE))"))
    .withColumn("r", row_number()
      .over(Window.partitionBy("c_id").orderBy(col("cent_cos").desc, col("vec_id")))
      .cast("long"))
    .select("vec_id", "c_id", "qv", "nn", "cent_cos", "r")

  /** d12's blocked prefix-drop verdicts over a ranked frame (see
    * [[semDedup]] for the blocking rationale). */
  private def semPrefixDropped(ranked: DataFrame, eps: Double, w: Long): DataFrame = {
    val earlier = ranked.select(col("c_id").as("e_cid"), col("vec_id").as("e_id"),
      col("qv").as("e_qv"), col("nn").as("e_nn"), col("r").as("e_r"),
      expr(s"(r - 1) div $w").as("e_blk"))
    ranked
      .withColumn("jb", explode(sequence(lit(0L), expr(s"(r - 1) div $w"))))
      .join(earlier,
        col("e_cid") === col("c_id") && col("e_blk") === col("jb") &&
          col("e_r") < col("r"))
      .withColumn("pcos", expr(
        "CAST(graft_dot_long(qv, e_qv) AS DOUBLE) / sqrt(CAST(nn AS DOUBLE) * CAST(e_nn AS DOUBLE))"))
      .filter(col("pcos") >= eps)
      .select(col("vec_id")).distinct().withColumn("is_dropped", lit(true))
  }

  /** The d14 base keeper artifact: the base slice's surviving vectors
    * with their cluster and per-cluster kept-rank block — the stored
    * index table an increment (and the streaming admission check,
    * [[graft.streaming.StreamingAnalytics]].semIngestDedup) reads.
    * Session-shared via the same pay-once mechanism as the d3 pair set
    * (SharedFrames): the first consumer pays the base replay, later
    * consumers read the checkpointed table — exactly the storage
    * semantics of an operating pipeline, where this is a parquet read,
    * not a recompute. Columns: b_cid, b_qv, b_nn, b_blk. */
  def semBaseKeepers(embeddings: DataFrame, baseMaxId: Long = 250,
      k: Int = 0, maxIter: Int = 24, eps: Double = 0.35,
      blockWidth: Long = semDedupBlockWidth): DataFrame = {
    val cdf = semBaseCdf(embeddings, baseMaxId, k, maxIter)
    val v = quantized(embeddings)
    val w = blockWidth
    SharedFrames.memoReleasing(embeddings,
        s"d14_base_keepers:$baseMaxId:$k:$maxIter:$eps:$w") {
      val baseRanked = semRankedOf(v.filter(col("vec_id") < baseMaxId), cdf).persist()
      val kp = baseRanked
        .join(semPrefixDropped(baseRanked, eps, w), Seq("vec_id"), "left")
        .filter(col("is_dropped").isNull)
        .withColumn("kr", row_number()
          .over(Window.partitionBy("c_id").orderBy(col("r"))).cast("long"))
        .select(col("c_id").as("b_cid"), col("qv").as("b_qv"),
          col("nn").as("b_nn"), expr(s"(kr - 1) div $w").as("b_blk"))
      (kp, () => { baseRanked.unpersist(); () })
    }
  }

  /** d14 — INCREMENTAL SemDeDup, the crawl-increment form of d12 the way
    * d11 is the increment form of d3: the BASE corpus (vec_id <
    * `baseMaxId`) has already been semantically deduplicated and only
    * its KEPT members survive as the stored index artifact (dropped base
    * vectors are gone — an increment can never be compared against
    * them); the NEW batch assigns to the BASE-trained centroids (no
    * retraining — s10 is the monitor that says when to), and a new
    * vector is dropped iff it is ε-similar to a kept base cluster-mate
    * (`dup_of_base`, the cross verdict d11 calls `is_cross`) or to an
    * earlier new vector in d12's scan order (cent_cos descending, ties
    * by vec_id — the within-increment prefix rule, same
    * earlier-regardless-of-verdict semantics as d12's documented chain
    * deviation).
    *
    * Scale: the increment never revisits base×base (that work was paid
    * when the base shipped); new-vs-base pairs are cluster-confined and
    * key on (cluster, base-keeper block), new-vs-new is d12's blocked
    * prefix join over the new rows only — so an increment costs
    * O(|new| · cluster-width), not O(|corpus|²). Here the base verdicts
    * are recomputed by the same discipline (this container stores no
    * artifacts between runs); at 100 TB they are a read of the stored
    * keeper table. Centroids train on the BASE frame only, so the
    * increment's answer is invariant to everything that arrived after
    * the index shipped. */
  def semDedupIncremental(embeddings: DataFrame, baseMaxId: Long = 250,
      k: Int = 0, maxIter: Int = 24, eps: Double = 0.35,
      blockWidth: Long = semDedupBlockWidth): DataFrame = {
    val cdf = semBaseCdf(embeddings, baseMaxId, k, maxIter)
    val v = quantized(embeddings)
    val w = blockWidth
    val keepers = semBaseKeepers(embeddings, baseMaxId, k, maxIter, eps, w)
    val newRanked0 = semRankedOf(v.filter(col("vec_id") >= baseMaxId), cdf)
    val keeperBlocks = keepers.groupBy("b_cid")
      .agg(max("b_blk").as("max_blk")) // O(k) rows: AQE-sized, never hinted
    // session memo, not a lingering per-invocation persist (r8 ADVICE)
    val newRanked = SharedFrames.memoPersisted(embeddings,
      s"d14_new_ranked:$baseMaxId:$k:$maxIter")(newRanked0)
    val dupOfBase = newRanked
      .join(keeperBlocks, col("c_id") === col("b_cid"))
      .withColumn("jb", explode(sequence(lit(0L), col("max_blk"))))
      .drop("b_cid")
      .join(keepers, col("b_cid") === col("c_id") && col("b_blk") === col("jb"))
      .withColumn("pcos", expr(
        "CAST(graft_dot_long(qv, b_qv) AS DOUBLE) / sqrt(CAST(nn AS DOUBLE) * CAST(b_nn AS DOUBLE))"))
      .filter(col("pcos") >= eps)
      .select(col("vec_id")).distinct().withColumn("dup_base", lit(true))
    val newDropped = semPrefixDropped(newRanked, eps, w)
      .withColumnRenamed("is_dropped", "dup_new")
    newRanked
      .join(dupOfBase, Seq("vec_id"), "left")
      .join(newDropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("c_id"), col("cent_cos"),
        (col("dup_base").isNull && col("dup_new").isNull).as("keep"),
        col("dup_base").isNotNull.as("dup_of_base"))
  }
}
