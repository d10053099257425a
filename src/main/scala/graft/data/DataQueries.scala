package graft.data

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Oracle-checked queries for the large-scale data-pipeline operators:
  * text analysis (x*), deduplication (d*), similarity search (s*),
  * multimodal plumbing (m*).
  */
object DataQueries {

  private def docs(fn: DataFrame => DataFrame): (SparkSession, String) => DataFrame =
    (spark, sfDir) => fn(Tables.documents(spark, sfDir))
  private def embs(fn: DataFrame => DataFrame): (SparkSession, String) => DataFrame =
    (spark, sfDir) => fn(Tables.embeddings(spark, sfDir))

  /** The production-API frames, UNORDERED by contract (r8 rule, extended
    * repo-wide in r14): a terminal global orderBy would be the single
    * most expensive node of these otherwise-narrow plans at 100 TB, so
    * no production API carries one — [[gateSort]] re-adds the
    * deterministic order HERE, only for the driver's hash gate.
    * PlanSpec pins the invariant over this whole map. */
  val unsorted: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_lang_id" -> docs(TextOps.langId),
    "x2_quality_score" -> docs(TextOps.qualityScore),
    "x3_token_count" -> docs(TextOps.tokenCount),
    "x4_fingerprint" -> docs(TextOps.fingerprint),
    "x5_top_terms" -> docs(TextOps.topTerms(_)),
    "x6_vocab_bigrams" -> docs(TextOps.vocabBigrams(_)),
    "d1_dedup_exact" -> docs(TextOps.dedupExact),
    "d2_dedup_ngram_jaccard" -> docs(TextOps.dedupNgramJaccard(_)),
    "d3_dedup_minhash_lsh" -> docs(TextOps.lshDupPairs(_)),
    "d4_dedup_simhash" -> docs(TextOps.simhash),
    "d5_dedup_embedding" -> embs(VectorOps.dedupEmbedding(_)),
    "d6_dedup_clusters" -> docs(TextOps.dedupClusters(_)),
    "d7_simhash_near" -> docs(TextOps.simhashNear),
    "d8_dedup_agreement" -> ((spark, sfDir) => TextOps.dedupAgreement(
      Tables.documents(spark, sfDir), Tables.embeddings(spark, sfDir))),
    "d9_dedup_savings" -> docs(TextOps.dedupSavings),
    "d10_minhash_calibration" -> docs(TextOps.minhashCalibration(_)),
    "d11_dedup_incremental" -> docs(TextOps.dedupIncremental(_)),
    "d12_semdedup" -> embs(VectorOps.semDedup(_)),
    "d14_semdedup_incremental" -> embs(VectorOps.semDedupIncremental(_)),
    "d13_pagerank_neardup" -> docs(TextOps.pageRankNearDup(_)),
    "d15_exact_blocks" -> docs(TextOps.dedupExactBlocks(_)),
    "x7_repetition" -> docs(TextOps.repetition),
    "x8_length_quantiles" -> docs(TextOps.lengthQuantiles),
    "x9_distinct_kmv" -> docs(TextOps.distinctEstimate(_)),
    "x10_distinct_by_lang" -> docs(TextOps.distinctByLang),
    "x11_sample_stratified" -> docs(TextOps.sampleStratified),
    "x12_decontaminate" -> docs(TextOps.decontaminate(_)),
    "x52_bloom_decontaminate" -> docs(TextOps.decontaminateBloom(_)),
    "x53_cluster_split" -> docs(TextOps.clusterSplit(_)),
    "x13_langid_confusion" -> docs(TextOps.langIdConfusion),
    "x14_source_mix" -> docs(TextOps.sourceMix),
    "x15_pack_sequences" -> docs(TextOps.packSequences(_)),
    "x18_curation_funnel" -> docs(TextOps.curationFunnel),
    "x19_novelty" -> docs(TextOps.noveltyScore),
    "x20_chunk_sliding" -> docs(TextOps.chunkSliding(_)),
    "x21_split_leakage" -> docs(TextOps.splitLeakage),
    "x16_filter_audit" -> docs(TextOps.filterAudit),
    "x17_mixture_temperature" -> docs(TextOps.mixtureTemperature(_)),
    "x22_boilerplate_lines" -> docs(TextOps.boilerplateLines(_)),
    "x23_pii_redact" -> docs(TextOps.piiRedact),
    "x24_cluster_reps" -> docs(TextOps.clusterRepresentatives),
    "x25_unigram_surprisal" -> docs(TextOps.unigramSurprisal),
    "x48_bigram_surprisal" -> docs(TextOps.bigramSurprisal),
    "x26_bpe_merges" -> docs(TextOps.bpeMerges(_)),
    "x28_dsir_importance" -> docs(TextOps.dsirImportance(_)),
    "x50_importance_resample" -> docs(TextOps.importanceResample(_)),
    "x29_bm25_topk" -> docs(TextOps.bm25TopK(_)),
    "x30_source_drift" -> docs(TextOps.sourceDrift),
    "x31_bpe_encode" -> docs(TextOps.bpeEncode(_)),
    "x32_span_scrub" -> docs(TextOps.spanScrub(_)),
    "x33_perplexity_buckets" -> docs(TextOps.perplexityBuckets),
    "x27_duplicated_spans" -> docs(TextOps.duplicatedSpans(_)),
    "x34_shard_export" -> docs(TextOps.shardExport(_)),
    "x35_budget_cap" -> docs(TextOps.budgetCap(_)),
    "s5_ann_int8" -> embs(VectorOps.annInt8(_)),
    "s6_ann_ivf_trained" -> embs(VectorOps.annIvfTrained(_)),
    "s1_ann_brute" -> embs(VectorOps.annBrute(_)),
    "s2_ann_ivf" -> embs(VectorOps.annIvf(_)),
    "s3_ann_lsh" -> ((spark, sfDir) =>
      VectorOps.annLsh(spark, Tables.embeddings(spark, sfDir))),
    "s4_kmeans_step" -> embs(VectorOps.kmeansStep(_)),
    "s4b_kmeans_converged" -> embs(VectorOps.kmeansConverged(_)),
    "s7_ann_pq" -> embs(VectorOps.annPq(_)),
    "s8_ann_ivf_multiprobe" -> embs(VectorOps.annIvfMultiprobe(_)),
    "s9_ann_ivfpq" -> embs(VectorOps.annIvfPq(_)),
    "s10_ivf_drift" -> embs(VectorOps.ivfDrift(_)),
    "s11_ann_imi" -> embs(VectorOps.annImi(_)),
    "s12_ann_recall" -> embs(VectorOps.annRecall(_)),
    "s13_pq_health" -> embs(VectorOps.pqHealth(_)),
    "s14_ann_filtered" -> ((spark, sfDir) => VectorOps.annIvfFiltered(
      Tables.embeddings(spark, sfDir), Tables.documents(spark, sfDir))),
    "s15_hard_negatives" -> embs(VectorOps.hardNegatives(_)),
    "s16_ann_range" -> embs(VectorOps.annRange(_)),
    "s17_ivf_retrain" -> embs(VectorOps.ivfRetrainReport(_)),
    "x41_mixture_expand" ->
      docs(TextOps.mixtureExpand(_)),
    "x42_cross_source_dups" -> docs(TextOps.crossSourceDups),
    "x43_dedup_mixture" -> docs(TextOps.dedupMixture),
    "x44_shard_manifest" -> docs(TextOps.shardManifest(_)),
    "x45_filter_agreement" -> docs(TextOps.filterAgreement),
    "x47_cms_audit" -> docs(TextOps.cmsAudit(_)),
    "x49_quantile_sketch" -> docs(TextOps.quantileSketchAudit(_)),
    "x36_phrase_search" -> docs(TextOps.phraseSearch(_)),
    "x39_eval_span_contamination" ->
      docs(TextOps.evalSpanContamination(_)),
    "x46_eval_span_scrub" -> docs(TextOps.evalSpanScrub(_)),
    "x40_tokenizer_fertility" -> docs(TextOps.tokenizerFertility(_)),
    "x37_perceptron_filter" -> docs(TextOps.perceptronFilter(_)),
    "x38_data_card" -> docs(TextOps.dataCard),
    "x51_data_card_quantiles" -> docs(TextOps.dataCardQuantiles(_)),
    "m1_multimodal_features" -> docs(MultimodalOps.extractFeatures),
    "m2_frame_sample" -> docs(MultimodalOps.sampleFrames(_)),
    "m3_resize" -> docs(MultimodalOps.resize(_)),
    "m4_pack_multimodal" -> docs(MultimodalOps.packMultimodal(_)),
    "m5_media_dedup" -> docs(MultimodalOps.mediaDedup(_)),
    "m6_phash_neardup" -> docs(MultimodalOps.phashNearDup),
    "m7_cdc_chunks" -> docs(MultimodalOps.cdcChunks(_)),
    "m8_phash_keepers" -> docs(MultimodalOps.phashKeepers)
  )

  /** Deterministic gate sort per query — the columns each API's terminal
    * orderBy carried before r14 moved them registry-side. Queries absent
    * here never had one (single-row outputs, or limit-ordered top-N like
    * x6/s4b whose order is part of the semantics and stays API-side). */
  val gateSort: Map[String, Seq[String]] = Map(
    "x5_top_terms" -> Seq("doc_id", "rnk"),
    "x7_repetition" -> Seq("doc_id"),
    "x8_length_quantiles" -> Seq("lang_pred"),
    "x10_distinct_by_lang" -> Seq("lang_pred"),
    "x11_sample_stratified" -> Seq("doc_id"),
    "x12_decontaminate" -> Seq("doc_id"),
    "x13_langid_confusion" -> Seq("lang", "lang_pred"),
    "x14_source_mix" -> Seq("source", "lang"),
    "x15_pack_sequences" -> Seq("doc_id"),
    "x16_filter_audit" -> Seq("doc_id"),
    "x17_mixture_temperature" -> Seq("source"),
    "x18_curation_funnel" -> Seq("stage"),
    "x19_novelty" -> Seq("doc_id"),
    "x20_chunk_sliding" -> Seq("doc_id", "chunk_idx"),
    "x21_split_leakage" -> Seq("doc_a", "doc_b"),
    "x22_boilerplate_lines" -> Seq("doc_id"),
    "x23_pii_redact" -> Seq("doc_id"),
    "x24_cluster_reps" -> Seq("cluster_id"),
    "x25_unigram_surprisal" -> Seq("doc_id"),
    "x26_bpe_merges" -> Seq("round"),
    "x27_duplicated_spans" -> Seq("doc_id"),
    "x28_dsir_importance" -> Seq("doc_id"),
    "x29_bm25_topk" -> Seq("rnk"),
    "x30_source_drift" -> Seq("source"),
    "x31_bpe_encode" -> Seq("doc_id"),
    "x32_span_scrub" -> Seq("doc_id"),
    "x33_perplexity_buckets" -> Seq("bucket"),
    "x34_shard_export" -> Seq("shard", "pos"),
    "x35_budget_cap" -> Seq("doc_id"),
    "x36_phrase_search" -> Seq("phrase", "doc_id"),
    "x37_perceptron_filter" -> Seq("doc_id"),
    "x38_data_card" -> Seq("source"),
    "x39_eval_span_contamination" -> Seq("doc_id"),
    "x40_tokenizer_fertility" -> Seq("source", "lang_pred"),
    "x41_mixture_expand" -> Seq("doc_id", "epoch"),
    "x42_cross_source_dups" -> Seq("src_a", "src_b"),
    "x43_dedup_mixture" -> Seq("source"),
    "x44_shard_manifest" -> Seq("shard"),
    "x45_filter_agreement" -> Seq("source"),
    "x46_eval_span_scrub" -> Seq("doc_id"),
    "x47_cms_audit" -> Seq("rnk"),
    "x48_bigram_surprisal" -> Seq("doc_id"),
    "x49_quantile_sketch" -> Seq("source"),
    "x50_importance_resample" -> Seq("doc_id"),
    "x51_data_card_quantiles" -> Seq("source"),
    "x52_bloom_decontaminate" -> Seq("doc_id"),
    "x53_cluster_split" -> Seq("doc_id"),
    "d1_dedup_exact" -> Seq("keeper"),
    "d2_dedup_ngram_jaccard" -> Seq("doc_a", "doc_b"),
    "d4_dedup_simhash" -> Seq("doc_id"),
    "d5_dedup_embedding" -> Seq("vec_id"),
    "d6_dedup_clusters" -> Seq("doc_id"),
    "d7_simhash_near" -> Seq("doc_a", "doc_b"),
    "d8_dedup_agreement" -> Seq("doc_a", "doc_b"),
    "d9_dedup_savings" -> Seq("cluster_id"),
    "d10_minhash_calibration" -> Seq("doc_a", "doc_b"),
    "d11_dedup_incremental" -> Seq("doc_a", "doc_b"),
    "d12_semdedup" -> Seq("vec_id"),
    "d13_pagerank_neardup" -> Seq("doc_id"),
    "d14_semdedup_incremental" -> Seq("vec_id"),
    "d15_exact_blocks" -> Seq("doc_id"),
    "s1_ann_brute" -> Seq("query_id", "rnk"),
    "s2_ann_ivf" -> Seq("query_id", "rnk"),
    "s3_ann_lsh" -> Seq("query_id", "rnk"),
    "s4_kmeans_step" -> Seq("c_id", "d"),
    "s5_ann_int8" -> Seq("query_id", "rnk"),
    "s6_ann_ivf_trained" -> Seq("query_id", "rnk"),
    "s7_ann_pq" -> Seq("query_id", "rnk"),
    "s8_ann_ivf_multiprobe" -> Seq("query_id", "rnk"),
    "s9_ann_ivfpq" -> Seq("query_id", "rnk"),
    "s10_ivf_drift" -> Seq("cell"),
    "s11_ann_imi" -> Seq("query_id", "rnk"),
    "s12_ann_recall" -> Seq("query_id"),
    "s13_pq_health" -> Seq("s", "code"),
    "s14_ann_filtered" -> Seq("query_id", "rnk"),
    "s15_hard_negatives" -> Seq("query_id", "rnk"),
    "s16_ann_range" -> Seq("query_id", "neighbor_id"),
    "s17_ivf_retrain" -> Seq("cell"),
    "m1_multimodal_features" -> Seq("doc_id"),
    "m2_frame_sample" -> Seq("doc_id", "frame_idx"),
    "m3_resize" -> Seq("doc_id"),
    "m4_pack_multimodal" -> Seq("doc_id"),
    "m5_media_dedup" -> Seq("doc_id"),
    "m6_phash_neardup" -> Seq("doc_a", "doc_b"),
    "m7_cdc_chunks" -> Seq("doc_id"),
    "m8_phash_keepers" -> Seq("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    unsorted.map { case (name, build) =>
      name -> { (spark: SparkSession, sfDir: String) =>
        val df = build(spark, sfDir)
        gateSort.get(name).fold(df)(cs => df.orderBy(cs.head, cs.tail: _*))
      }
    }

  // ---- DuckDB oracle --------------------------------------------------

  /** DuckDB mirror of [[graft.functions.RollingSpanHashes]]: per window a
    * power-weighted HUGEINT sum of the 48-bit token hashes mod 2^48 —
    * congruent to the Spark side's O(1)-per-window rolling form. `thCol`
    * is the per-doc token-hash list; the base powers are plan-time
    * literals. */
  private def spanHashExpr(thCol: String, iCol: String, span: Int): String = {
    val mask = (1L << 48) - 1
    var p = 1L
    val pows = new Array[Long](span)
    for (j <- (span - 1) to 0 by -1) { pows(j) = p; p = (p * 8191L) & mask }
    s"""CAST(CAST(list_sum(list_transform(generate_series(1, $span),
          j -> CAST($thCol[$iCol + j - 1] AS HUGEINT) * (${pows.mkString("[", ", ", "]")})[j]))
        % 281474976710656 AS BIGINT) AS BIGINT)"""
  }

  /** The per-doc 48-bit token-hash list (md5 computed once per token). */
  private def spanTokenHashes(wsCol: String): String =
    s"list_transform(list_transform($wsCol, w -> md5(w)), m -> ${TextOps.hex12NumFragment("m")})"

  /** Splice the rolling-span-hash fragments into an oracle body (the
    * bodies stay plain literals; the fragments carry Scala-computed base
    * powers). */
  private def spanHashPatch(sql: String): String =
    sql.replace("__TH__", spanTokenHashes("ws"))
      .replace("__H16__", spanHashExpr("th", "i", 16))
      .replace("__H4__", spanHashExpr("th", "i", 4))

  private def cnt(w: String): String =
    s"len(list_filter(string_split(text, ' '), x -> x = '$w'))"
  private def cntSum(ws: Seq[String]): String = ws.map(cnt).mkString(" + ")

  /** Shingle/jaccard/minhash CTE chain over `documents`. */
  private val docProlog = s"""
WITH wordsx AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), sh0 AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM wordsx
), shingles AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh FROM sh0
), sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM shingles GROUP BY 1
), prs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS common
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), jacp AS (
  SELECT p.doc_a, p.doc_b, p.common, sa.n_sh AS sa, sb.n_sh AS sb,
         CAST(p.common AS DOUBLE) / (sa.n_sh + sb.n_sh - p.common) AS jac
  FROM prs p JOIN sizes sa ON p.doc_a = sa.doc_id JOIN sizes sb ON p.doc_b = sb.doc_id
), mh AS (
  SELECT doc_id, i, min(md5(CAST(i AS STRING) || ':' || sh)) AS mh
  FROM (SELECT doc_id, sh, unnest(generate_series(1, 12)) AS i FROM shingles) q
  GROUP BY doc_id, i
), bands AS (
  SELECT doc_id, CAST(floor((i - 1) / 3.0) AS INT) AS band,
         md5(string_agg(mh, '|' ORDER BY i)) AS sig
  FROM mh GROUP BY doc_id, band
), lsh_cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
), shdf AS (
  SELECT sh, CAST(count(*) AS BIGINT) AS df FROM shingles GROUP BY sh
), rare AS (
  SELECT s.doc_id, s.sh FROM shingles s JOIN shdf f ON s.sh = f.sh WHERE f.df <= 20
), rsizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM rare GROUP BY 1
), rprs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS common
  FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), rjacp AS (
  SELECT p.doc_a, p.doc_b, p.common, sa.n_sh AS sa, sb.n_sh AS sb,
         CAST(p.common AS DOUBLE) / (sa.n_sh + sb.n_sh - p.common) AS jac
  FROM rprs p JOIN rsizes sa ON p.doc_a = sa.doc_id JOIN rsizes sb ON p.doc_b = sb.doc_id
), tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), sbits AS (
  SELECT doc_id, j, sum((ascii(substring(md5(w), j + 1, 1)) % 2) * 2 - 1) AS s
  FROM (SELECT doc_id, w, unnest(generate_series(0, 15)) AS j FROM tok) q
  GROUP BY doc_id, j
), simh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
  FROM sbits GROUP BY doc_id
)
"""

  /** Quantized-vector CTE chain over `embeddings` (see VectorOps for the
    * exactness rationale). */
  private val vecProlog = s"""
WITH qe AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(floor(x * 1048576e0) AS BIGINT)) AS qv
  FROM embeddings
), qn AS (
  SELECT vec_id, label, qv,
         CAST(list_sum(list_transform(generate_series(1, len(qv)), d -> qv[d] * qv[d])) AS BIGINT) AS nn
  FROM qe
), signs AS (
  SELECT b, d,
    (ascii(substring(md5(CAST(b AS STRING) || ':' || CAST(d AS STRING)), 1, 1)) % 2) * 2 - 1 AS sgn
  FROM (SELECT unnest(generate_series(0, 7)) AS b) tb,
       (SELECT unnest(generate_series(1, 64)) AS d) td
), vexp AS (
  SELECT vec_id, unnest(generate_series(1, len(qv))) AS d, qv FROM qn
), vexp2 AS (
  SELECT vec_id, d, qv[d] AS qx FROM vexp
), vbits AS (
  SELECT v.vec_id, s.b, sum(v.qx * s.sgn) AS s
  FROM vexp2 v JOIN signs s ON v.d = s.d GROUP BY 1, 2
), buckets AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
  FROM vbits GROUP BY 1
)
"""

  private def pairDot(a: String, b: String): String =
    s"CAST(list_sum(list_transform(generate_series(1, len($a.qv)), d -> $a.qv[d] * $b.qv[d])) AS BIGINT)"

  /** One unrolled Lloyd's round on the 2^20 integer grid (see
    * [[VectorOps.kmeansConverged]]): assignment is the exact-integer
    * argmin against the previous round's centroids `k${i-1}`, the update
    * snaps per-dim means back to the grid with ONE IEEE floor(s/n + 0.5),
    * and an empty cluster keeps its previous centroid. Because the Spark
    * side stops at the exact fixpoint and every post-fixpoint round is the
    * identity, unconditionally unrolling `maxIter` rounds here lands on
    * the same table. */
  private def kmeansRoundSql(i: Int, dims: Int, src: String = "qn"): String = s"""
, a$i AS MATERIALIZED (
  SELECT vec_id, qv, c_id FROM (
    SELECT v.vec_id, v.qv, c.c_id,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             v.nn - 2 * ${pairDot("v", "c")}
               + CAST(list_sum(list_transform(generate_series(1, $dims), d -> c.qv[d] * c.qv[d])) AS BIGINT),
             c.c_id) AS rn
    FROM $src v, k${i - 1} c) q WHERE rn = 1
), u$i AS (
  SELECT c_id, CAST(count(*) AS BIGINT) AS n, list(qv) AS vs FROM a$i GROUP BY c_id
), k$i AS MATERIALIZED (
  SELECT p.c_id,
         CASE WHEN u.n IS NULL THEN p.qv
              ELSE list_transform(generate_series(1, $dims), d ->
                CAST(floor(CAST(list_sum(list_transform(u.vs, m -> m[d])) AS DOUBLE) / u.n + 0.5e0) AS BIGINT))
         END AS qv,
         CAST(coalesce(u.n, 0) AS BIGINT) AS n
  FROM k${i - 1} p LEFT JOIN u$i u ON p.c_id = u.c_id
)"""

  /** s9's oracle: IVF-PQ re-expressed as CTEs — coarse assignment (argmin
    * against the first-k centroids), integer residuals per cell, shared
    * residual codebook from the first `nCodes` vectors, per-(query, probed
    * cell) ADC tables, code-match scan confined to probed cells, exact
    * rerank of the ADC shortlist. */
  private def annIvfPqSql(k: Int, nCodes: Int, m: Int, subDim: Int,
      everyNth: Int, nProbe: Int, adcTopK: Int, topK: Int, dims: Int): String = {
    def subDot(a: String, b: String): String =
      s"CAST(list_sum(list_transform(generate_series(1, $subDim), j -> $a.sub[j] * $b.c_sub[j])) AS BIGINT)"
    vecProlog + s"""
, cent AS (
  SELECT vec_id AS c_id, qv AS c_qv, nn AS c_nn FROM qn WHERE vec_id < $k
), asg AS MATERIALIZED (
  SELECT vec_id, qv, nn, cell FROM (
    SELECT v.vec_id, v.qv, v.nn, c.c_id AS cell,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             v.nn - 2 * CAST(list_sum(list_transform(generate_series(1, $dims), d -> v.qv[d] * c.c_qv[d])) AS BIGINT) + c.c_nn,
             c.c_id) AS rn
    FROM qn v, cent c) q WHERE rn = 1
), subn AS MATERIALIZED (
  SELECT vec_id, cell, s,
         list_transform(generate_series(1, $subDim), j -> rv[s * $subDim + j]) AS sub,
         CAST(list_sum(list_transform(generate_series(1, $subDim), j -> rv[s * $subDim + j] * rv[s * $subDim + j])) AS BIGINT) AS sub_nn
  FROM (
    SELECT a.vec_id, a.cell,
           list_transform(generate_series(1, $dims), d -> a.qv[d] - c.c_qv[d]) AS rv,
           unnest(generate_series(0, ${m - 1})) AS s
    FROM asg a JOIN cent c ON a.cell = c.c_id) q
), cb AS (
  SELECT vec_id AS code_id, s AS c_s, sub AS c_sub, sub_nn AS cb_nn
  FROM subn WHERE vec_id < $nCodes
), codes AS MATERIALIZED (
  SELECT vec_id, cell, s, code FROM (
    SELECT v.vec_id, v.cell, v.s, c.code_id AS code,
           row_number() OVER (PARTITION BY v.vec_id, v.s ORDER BY
             v.sub_nn - 2 * ${subDot("v", "c")} + c.cb_nn, c.code_id) AS rn
    FROM subn v JOIN cb c ON v.s = c.c_s) q WHERE rn = 1
), probes AS MATERIALIZED (
  SELECT query_id, q_qv, cell, c_qv FROM (
    SELECT v.vec_id AS query_id, v.qv AS q_qv, c.c_id AS cell, c.c_qv,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             v.nn - 2 * CAST(list_sum(list_transform(generate_series(1, $dims), d -> v.qv[d] * c.c_qv[d])) AS BIGINT) + c.c_nn,
             c.c_id) AS prn
    FROM qn v, cent c WHERE v.vec_id % $everyNth = 0) q WHERE prn <= $nProbe
), qsubn AS (
  SELECT query_id, cell, s,
         list_transform(generate_series(1, $subDim), j -> rv[s * $subDim + j]) AS sub,
         CAST(list_sum(list_transform(generate_series(1, $subDim), j -> rv[s * $subDim + j] * rv[s * $subDim + j])) AS BIGINT) AS sub_nn
  FROM (
    SELECT query_id, cell,
           list_transform(generate_series(1, $dims), d -> q_qv[d] - c_qv[d]) AS rv,
           unnest(generate_series(0, ${m - 1})) AS s
    FROM probes) q
), qd AS MATERIALIZED (
  SELECT q.query_id, q.cell AS q_cell, q.s AS q_s, c.code_id AS qcode,
         q.sub_nn - 2 * ${subDot("q", "c")} + c.cb_nn AS qdist2
  FROM qsubn q JOIN cb c ON q.s = c.c_s
), adc AS MATERIALIZED (
  SELECT d.query_id, v.vec_id, CAST(sum(d.qdist2) AS BIGINT) AS adc_d2,
         min(v.cell) AS cell
  FROM codes v JOIN qd d
    ON v.cell = d.q_cell AND v.s = d.q_s AND v.code = d.qcode
   AND v.vec_id <> d.query_id
  GROUP BY 1, 2
), cand AS (
  SELECT query_id, vec_id, adc_d2, cell FROM (
    SELECT query_id, vec_id, adc_d2, cell,
           row_number() OVER (PARTITION BY query_id ORDER BY adc_d2, vec_id) AS crn
    FROM adc) q WHERE crn <= $adcTopK
), rer AS (
  SELECT c.query_id, c.vec_id, c.adc_d2, c.cell,
         CAST(list_sum(list_transform(generate_series(1, $dims), d -> qq.qv[d] * nv.qv[d])) AS BIGINT) AS dot,
         CAST(CAST(list_sum(list_transform(generate_series(1, $dims), d -> qq.qv[d] * nv.qv[d])) AS BIGINT) AS DOUBLE)
           / sqrt(CAST(qq.nn AS DOUBLE) * CAST(nv.nn AS DOUBLE)) AS cos
  FROM cand c JOIN qn qq ON c.query_id = qq.vec_id JOIN qn nv ON c.vec_id = nv.vec_id
)
SELECT query_id, neighbor_id, rnk, adc_d2, dot, cos, cell FROM (
  SELECT query_id, vec_id AS neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rnk,
         adc_d2, dot, cos, cell
  FROM rer) q
WHERE rnk <= $topK
ORDER BY query_id, rnk"""
  }

  /** d13's oracle: d7's probe-pair edge set symmetrized, then `iters`
    * unrolled power-iteration rounds in exact integer arithmetic (DuckDB
    * `//` mirrors Spark's `DIV` on the positive operands here). */
  private def pageRankSql(iters: Int): String = {
    val q = 1L << 30
    val roundsSql = (1 to iters).map { i => s"""
, pc$i AS (
  SELECT e.dst, CAST(sum((85 * r.r) // (100 * d.deg)) AS BIGINT) AS m
  FROM edg e JOIN degd d ON e.src = d.src JOIN pr${i - 1} r ON e.src = r.doc_id
  GROUP BY 1
), pr$i AS MATERIALIZED (
  SELECT n.doc_id, (SELECT base FROM cnst) + coalesce(c.m, 0) AS r
  FROM nodesd n LEFT JOIN pc$i c ON n.doc_id = c.dst
)"""
    }.mkString
    docProlog + s"""
, sprobes AS (
  SELECT doc_id AS doc_a, simhash AS sig_a,
         CASE WHEN j = 16 THEN simhash
              ELSE xor(simhash, (CAST(1 AS BIGINT) << j)) END AS probe
  FROM (SELECT doc_id, simhash, unnest(generate_series(0, 16)) AS j FROM simh) q
), spairs AS (
  SELECT p.doc_a, s.doc_id AS doc_b
  FROM sprobes p JOIN simh s ON p.probe = s.simhash AND p.doc_a < s.doc_id
), edg AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM spairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM spairs
), degd AS (
  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edg GROUP BY 1
), nodesd AS (
  SELECT doc_id FROM documents
), cnst AS (
  SELECT CAST(CAST($q AS BIGINT) // count(*) AS BIGINT) AS init,
         CAST((15 * CAST($q AS BIGINT)) // (100 * count(*)) AS BIGINT) AS base
  FROM documents
), pr0 AS (
  SELECT doc_id, (SELECT init FROM cnst) AS r FROM nodesd
)$roundsSql
SELECT r.doc_id, CAST(coalesce(d.deg, 0) AS BIGINT) AS deg,
       CAST(r.r AS BIGINT) AS rank_q,
       CAST(r.r AS DOUBLE) / $q AS rank
FROM pr$iters r LEFT JOIN degd d ON r.doc_id = d.src
ORDER BY r.doc_id"""
  }

  /** s10's oracle: one argmin assignment against the base-trained
    * centroids, then per-cell base/new occupancy + mean quantization
    * error as plain aggregation. */
  /** Exact half-space dot over qv index range [lo, hi] — the IMI oracle's
    * primitive (mirrors graft_dot_long over `slice`d halves). */
  private def halfDot(a: String, b: String, lo: Int, hi: Int): String =
    s"CAST(list_sum(list_transform(generate_series($lo, $hi), d -> $a.qv[d] * $b.qv[d])) AS BIGINT)"

  /** s11's oracle: the IMI chain unrolled — per-half centroid argmin
    * (rn = 1 over exact integer half-distances, ties by centroid id),
    * multi-sequence probe ranking by summed half-distance over the
    * kHalf² product, candidate scan joined on the (cell_a, cell_b) pair,
    * exact-cosine top-k. kHalf is the gate-scale floor of the Spark
    * side's [[VectorOps.imiHalfCells]] (= 2 at both gate corpora). */
  private def annImiSql(kHalf: Int, everyNth: Int, nProbe: Int,
      topK: Int, dims: Int): String =
    vecProlog + annImiBody(kHalf, everyNth, nProbe, dims) + s"""
SELECT query_id, neighbor_id, rnk, dot, cos, cell_a, cell_b FROM r11
WHERE rnk <= $topK ORDER BY query_id, rnk"""

  /** The IMI chain's CTE body (through `r11`), shared by s11's oracle and
    * s12's recall oracle. */
  private def annImiBody(kHalf: Int, everyNth: Int, nProbe: Int,
      dims: Int): String = {
    val half = dims / 2
    s"""
, h11 AS (
  SELECT v.vec_id, v.qv, v.nn,
         ${halfDot("v", "v", 1, half)} AS na,
         ${halfDot("v", "v", half + 1, dims)} AS nb
  FROM qn v
), ca11 AS (
  SELECT vec_id AS a_id, qv, na FROM h11 WHERE vec_id < $kHalf
), cb11 AS (
  SELECT vec_id AS b_id, qv, nb FROM h11 WHERE vec_id < $kHalf
), aa11 AS (
  SELECT vec_id, a_id FROM (
    SELECT v.vec_id, c.a_id, row_number() OVER (PARTITION BY v.vec_id ORDER BY
      v.na - 2 * ${halfDot("v", "c", 1, half)} + c.na, c.a_id) AS rn
    FROM h11 v, ca11 c) x WHERE rn = 1
), ab11 AS (
  SELECT vec_id, b_id FROM (
    SELECT v.vec_id, c.b_id, row_number() OVER (PARTITION BY v.vec_id ORDER BY
      v.nb - 2 * ${halfDot("v", "c", half + 1, dims)} + c.nb, c.b_id) AS rn
    FROM h11 v, cb11 c) x WHERE rn = 1
), asg11 AS (
  SELECT h.vec_id, h.qv, h.nn, a.a_id AS cell_a, b.b_id AS cell_b
  FROM h11 h JOIN aa11 a ON h.vec_id = a.vec_id
             JOIN ab11 b ON h.vec_id = b.vec_id
), qa11 AS (
  SELECT v.vec_id AS query_id, c.a_id,
         v.na - 2 * ${halfDot("v", "c", 1, half)} + c.na AS da
  FROM h11 v, ca11 c WHERE v.vec_id % $everyNth = 0
), qb11 AS (
  SELECT v.vec_id AS query_id, c.b_id,
         v.nb - 2 * ${halfDot("v", "c", half + 1, dims)} + c.nb AS db
  FROM h11 v, cb11 c WHERE v.vec_id % $everyNth = 0
), pr11 AS (
  SELECT query_id, a_id, b_id FROM (
    SELECT qa.query_id, qa.a_id, qb.b_id,
      row_number() OVER (PARTITION BY qa.query_id
        ORDER BY qa.da + qb.db, qa.a_id, qb.b_id) AS prn
    FROM qa11 qa JOIN qb11 qb ON qa.query_id = qb.query_id) x
  WHERE prn <= $nProbe
), cand11 AS (
  SELECT p.query_id, b.vec_id AS neighbor_id, p.a_id AS cell_a, p.b_id AS cell_b,
         ${pairDot("q", "b")} AS dot, q.nn AS qnn, b.nn AS bnn
  FROM pr11 p
  JOIN asg11 b ON b.cell_a = p.a_id AND b.cell_b = p.b_id AND b.vec_id <> p.query_id
  JOIN h11 q ON q.vec_id = p.query_id
), s11c AS (
  SELECT query_id, neighbor_id, cell_a, cell_b, dot,
         CAST(dot AS DOUBLE) / sqrt(CAST(qnn AS DOUBLE) * CAST(bnn AS DOUBLE)) AS cos
  FROM cand11
), r11 AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rnk
  FROM s11c
)"""
  }

  /** s12's oracle: the IMI chain (r11) against the brute-force ground
    * truth over the same query set — per-query hit count and recall@k. */
  private def annRecallSql(kHalf: Int, everyNth: Int, nProbe: Int,
      topK: Int, dims: Int): String =
    vecProlog + annImiBody(kHalf, everyNth, nProbe, dims) + s"""
, gt AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      CAST(row_number() OVER (PARTITION BY a.vec_id ORDER BY
        CAST(${pairDot("a", "b")} AS DOUBLE)
          / sqrt(CAST(a.nn AS DOUBLE) * CAST(b.nn AS DOUBLE)) DESC,
        b.vec_id) AS INT) AS rnk
    FROM qn a JOIN qn b ON a.vec_id % $everyNth = 0 AND b.vec_id <> a.vec_id) x
  WHERE rnk <= $topK
), ap AS (
  SELECT query_id, neighbor_id FROM r11 WHERE rnk <= $topK
)
SELECT g.query_id,
  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
    / $topK AS recall
FROM gt g LEFT JOIN ap a
  ON g.query_id = a.query_id AND g.neighbor_id = a.neighbor_id
GROUP BY 1 ORDER BY 1"""

  private def ivfDriftSql(k: Int, baseMaxId: Long, dims: Int): String =
    vecProlog + s"""
, cent AS (
  SELECT vec_id AS c_id, qv AS c_qv, nn AS c_nn FROM qn WHERE vec_id < $k
), asg AS MATERIALIZED (
  SELECT vec_id, cell, d2, vec_id >= $baseMaxId AS is_new FROM (
    SELECT v.vec_id, c.c_id AS cell,
           v.nn - 2 * CAST(list_sum(list_transform(generate_series(1, $dims), d -> v.qv[d] * c.c_qv[d])) AS BIGINT) + c.c_nn AS d2,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             v.nn - 2 * CAST(list_sum(list_transform(generate_series(1, $dims), d -> v.qv[d] * c.c_qv[d])) AS BIGINT) + c.c_nn,
             c.c_id) AS rn
    FROM qn v, cent c) q WHERE rn = 1
), per AS (
  SELECT cell,
         CAST(sum(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
         CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
         CAST(sum(CASE WHEN NOT is_new THEN d2 END) AS BIGINT) AS s_base,
         CAST(sum(CASE WHEN is_new THEN d2 END) AS BIGINT) AS s_new
  FROM asg GROUP BY 1
), tot AS (
  SELECT CAST(sum(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS BIGINT) AS t_base,
         CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS t_new
  FROM asg
)
SELECT p.cell, p.n_base, p.n_new,
       CAST(p.n_base AS DOUBLE) / t.t_base AS frac_base,
       CAST(p.n_new AS DOUBLE) / t.t_new AS frac_new,
       CASE WHEN p.n_base = 0 THEN NULL ELSE CAST(p.s_base AS DOUBLE) / p.n_base END AS mean_d2_base,
       CASE WHEN p.n_new = 0 THEN NULL ELSE CAST(p.s_new AS DOUBLE) / p.n_new END AS mean_d2_new,
       CAST(p.n_new AS DOUBLE) / t.t_new - CAST(p.n_base AS DOUBLE) / t.t_base AS share_shift
FROM per p, tot t ORDER BY p.cell"""

  /** x37's oracle: the batch perceptron unrolled — per round, margins
    * under w(i-1) and a per-bucket update summed over the misclassified
    * set; all-integer, so every round (and the final margins) is exact. */
  private def perceptronSql(buckets: Int, rounds: Int): String = {
    val roundsSql = (1 to rounds).map { i => s"""
, m$i AS (
  SELECT f.doc_id, f.y, CAST(sum(f.x * w.w) AS BIGINT) AS m
  FROM fx f JOIN w${i - 1} w USING (bucket) GROUP BY 1, 2
), mis$i AS MATERIALIZED (
  SELECT doc_id FROM m$i WHERE y * m <= 0
), w$i AS MATERIALIZED (
  SELECT w.bucket, CAST(w.w + coalesce(u.d, 0) AS BIGINT) AS w
  FROM w${i - 1} w LEFT JOIN (
    SELECT f.bucket,
           CAST(floor(1024e0 * sum(f.y * f.x)
                      / ((SELECT count(*) FROM mis$i) * ${i.toLong * i})) AS BIGINT) AS d
    FROM fx f JOIN mis$i m ON f.doc_id = m.doc_id GROUP BY 1) u ON w.bucket = u.bucket
)"""
    }.mkString
    s"""
WITH basef AS (
  SELECT doc_id, text, n_words, n_distinct, n_stop,
    CASE WHEN NOT (n_words < 20 OR n_words > 88 OR n_stop = 0
                   OR n_distinct * 100 < n_words * 35)
         THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y
  FROM (SELECT doc_id, text,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
          CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
          CAST(${cntSum(TextOps.StopwordsEn)} AS BIGINT) AS n_stop
        FROM documents) q
), based AS (
  SELECT doc_id, text, y FROM basef
), feats AS (
  SELECT w.doc_id, b.y,
    ${TextOps.hex13NumFragment("md5(w.ws[w.i] || ' ' || w.ws[w.i+1])")} % $buckets AS bucket
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) q0) w
  JOIN based b ON w.doc_id = b.doc_id
  UNION ALL
  SELECT doc_id, y, CAST($buckets AS BIGINT) AS bucket FROM based
), fx AS MATERIALIZED (
  SELECT doc_id, y, bucket, CAST(count(*) AS BIGINT) AS x FROM feats GROUP BY 1, 2, 3
  UNION ALL
  SELECT doc_id, y, CAST(${buckets + 1} AS BIGINT) AS bucket,
         CAST(CASE WHEN n_words < 20 THEN 1 ELSE 0 END AS BIGINT) AS x FROM basef
  UNION ALL
  SELECT doc_id, y, CAST(${buckets + 2} AS BIGINT) AS bucket,
         CAST(CASE WHEN n_words > 88 THEN 1 ELSE 0 END AS BIGINT) AS x FROM basef
  UNION ALL
  SELECT doc_id, y, CAST(${buckets + 3} AS BIGINT) AS bucket,
         CAST(CASE WHEN n_stop = 0 THEN 1 ELSE 0 END AS BIGINT) AS x FROM basef
  UNION ALL
  SELECT doc_id, y, CAST(${buckets + 4} AS BIGINT) AS bucket,
         CAST(CASE WHEN n_distinct * 100 < n_words * 35 THEN 1 ELSE 0 END AS BIGINT) AS x FROM basef
), w0 AS (
  SELECT CAST(unnest(generate_series(0, ${buckets + 4})) AS BIGINT) AS bucket,
         CAST(0 AS BIGINT) AS w
)$roundsSql
SELECT f.doc_id, f.y, CAST(sum(f.x * w.w) AS BIGINT) AS margin,
       CAST(sum(f.x * w.w) AS BIGINT) > 0 AS pred,
       (CAST(sum(f.x * w.w) AS BIGINT) > 0) = (f.y > 0) AS correct
FROM fx f JOIN w$rounds w USING (bucket)
GROUP BY f.doc_id, f.y
ORDER BY f.doc_id"""
  }

  /** x36's oracle: the same positional-posting construction in SQL — the
    * (phrase, term, offset) slot table comes from the SAME Scala constant
    * as the Spark side, so the two cannot drift. */
  private def phraseSearchSql(phrases: Seq[String]): String = {
    val slotRows = phrases.flatMap { p =>
      val ts = p.split(' ')
      ts.zipWithIndex.map { case (t, o) => s"('$p', '$t', $o, ${ts.length})" }
    }.mkString(", ")
    s"""
WITH tokp AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t
), tok AS (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos, ws[pos] AS w FROM tokp
), ph(phrase, term, os, plen) AS (VALUES $slotRows
), hits AS (
  SELECT phrase, doc_id, start FROM (
    SELECT p.phrase, t.doc_id, t.pos - p.os AS start,
           count(*) AS hit, any_value(p.plen) AS plen
    FROM tok t JOIN ph p ON t.w = p.term
    GROUP BY 1, 2, 3) q
  WHERE hit = plen
)
SELECT phrase, doc_id, CAST(count(*) AS BIGINT) AS n_hits,
       CAST(min(start) AS BIGINT) AS first_pos
FROM hits GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  /** d12's oracle: the unrolled k-means chain of [[kmeansConvergedSql]],
    * then the SemDeDup prefix rule as plain SQL — rank within cluster by
    * cosine to the centroid, drop a vector iff any earlier-ranked
    * cluster-mate is ≥ ε cosine-similar. The output assignment `af` is a
    * FINAL extra argmin against `k$maxIter` (not round $maxIter's own
    * `a$maxIter`, which was assigned against `k${maxIter - 1}`): the Spark
    * side re-assigns against the finished centroids, and the two only
    * coincide once the fixpoint is reached — true at sf0.01, NOT at sf0.1
    * within the configured rounds. */
  private def semDedupSql(k: Int, maxIter: Int, dims: Int, eps: Double): String =
    vecProlog + s"""
, k0 AS MATERIALIZED (
  SELECT vec_id AS c_id, qv, CAST(0 AS BIGINT) AS n FROM qn WHERE vec_id < $k
)""" +
      (1 to maxIter).map(kmeansRoundSql(_, dims)).mkString + s"""
, af AS MATERIALIZED (
  SELECT vec_id, qv, c_id FROM (
    SELECT v.vec_id, v.qv, c.c_id,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             v.nn - 2 * ${pairDot("v", "c")}
               + CAST(list_sum(list_transform(generate_series(1, $dims), d -> c.qv[d] * c.qv[d])) AS BIGINT),
             c.c_id) AS rn
    FROM qn v, k$maxIter c) q WHERE rn = 1
), cn AS (
  SELECT c_id, qv AS c_qv,
         CAST(list_sum(list_transform(generate_series(1, $dims), d -> qv[d] * qv[d])) AS BIGINT) AS c_nn
  FROM k$maxIter
), scored AS (
  SELECT a.vec_id, a.c_id, a.qv, v.nn,
         CAST(CAST(list_sum(list_transform(generate_series(1, $dims), d -> a.qv[d] * c.c_qv[d])) AS BIGINT) AS DOUBLE)
           / sqrt(CAST(v.nn AS DOUBLE) * CAST(c.c_nn AS DOUBLE)) AS cent_cos
  FROM af a JOIN qn v ON a.vec_id = v.vec_id JOIN cn c ON a.c_id = c.c_id
), ranked AS MATERIALIZED (
  SELECT vec_id, c_id, qv, nn, cent_cos,
         row_number() OVER (PARTITION BY c_id ORDER BY cent_cos DESC, vec_id) AS r
  FROM scored
), dropped AS (
  SELECT DISTINCT a.vec_id
  FROM ranked a JOIN ranked b ON a.c_id = b.c_id AND b.r < a.r
  WHERE CAST(${pairDot("a", "b")} AS DOUBLE)
          / sqrt(CAST(a.nn AS DOUBLE) * CAST(b.nn AS DOUBLE)) >= CAST($eps AS DOUBLE)
)
SELECT r.vec_id, r.c_id, r.cent_cos, d.vec_id IS NULL AS keep
FROM ranked r LEFT JOIN dropped d ON r.vec_id = d.vec_id
ORDER BY r.vec_id"""

  /** d14's oracle: kmeans rounds run over the BASE slice only, base
    * verdicts replay d12's prefix rule, and the new batch is judged
    * against kept base cluster-mates plus its own within-increment
    * prefix — mirrors [[graft.data.VectorOps.semDedupIncremental]]. */
  private def semDedupIncrementalSql(k: Int, maxIter: Int, dims: Int,
      eps: Double, baseMaxId: Long): String =
    vecProlog + s"""
, qnb AS MATERIALIZED (
  SELECT * FROM qn WHERE vec_id < $baseMaxId
), k0 AS MATERIALIZED (
  SELECT vec_id AS c_id, qv, CAST(0 AS BIGINT) AS n FROM qnb WHERE vec_id < $k
)""" +
      (1 to maxIter).map(kmeansRoundSql(_, dims, "qnb")).mkString + s"""
, cn AS (
  SELECT c_id, qv AS c_qv,
         CAST(list_sum(list_transform(generate_series(1, $dims), d -> qv[d] * qv[d])) AS BIGINT) AS c_nn
  FROM k$maxIter
), afb AS MATERIALIZED (
  SELECT vec_id, qv, c_id FROM (
    SELECT v.vec_id, v.qv, c.c_id,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             v.nn - 2 * ${pairDot("v", "c")}
               + CAST(list_sum(list_transform(generate_series(1, $dims), d -> c.qv[d] * c.qv[d])) AS BIGINT),
             c.c_id) AS rn
    FROM qnb v, k$maxIter c) q WHERE rn = 1
), rb AS MATERIALIZED (
  SELECT vec_id, c_id, qv, nn, cent_cos,
         row_number() OVER (PARTITION BY c_id ORDER BY cent_cos DESC, vec_id) AS r
  FROM (
    SELECT a.vec_id, a.c_id, a.qv, v.nn,
           CAST(CAST(list_sum(list_transform(generate_series(1, $dims), d -> a.qv[d] * c.c_qv[d])) AS BIGINT) AS DOUBLE)
             / sqrt(CAST(v.nn AS DOUBLE) * CAST(c.c_nn AS DOUBLE)) AS cent_cos
    FROM afb a JOIN qnb v ON a.vec_id = v.vec_id JOIN cn c ON a.c_id = c.c_id) q
), db AS (
  SELECT DISTINCT a.vec_id
  FROM rb a JOIN rb b ON a.c_id = b.c_id AND b.r < a.r
  WHERE CAST(${pairDot("a", "b")} AS DOUBLE)
          / sqrt(CAST(a.nn AS DOUBLE) * CAST(b.nn AS DOUBLE)) >= CAST($eps AS DOUBLE)
), kb AS MATERIALIZED (
  SELECT r.vec_id, r.c_id, r.qv, r.nn FROM rb r
  LEFT JOIN db d ON r.vec_id = d.vec_id WHERE d.vec_id IS NULL
), qnn AS MATERIALIZED (
  SELECT * FROM qn WHERE vec_id >= $baseMaxId
), afn AS MATERIALIZED (
  SELECT vec_id, qv, c_id FROM (
    SELECT v.vec_id, v.qv, c.c_id,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             v.nn - 2 * ${pairDot("v", "c")}
               + CAST(list_sum(list_transform(generate_series(1, $dims), d -> c.qv[d] * c.qv[d])) AS BIGINT),
             c.c_id) AS rn
    FROM qnn v, k$maxIter c) q WHERE rn = 1
), rnw AS MATERIALIZED (
  SELECT vec_id, c_id, qv, nn, cent_cos,
         row_number() OVER (PARTITION BY c_id ORDER BY cent_cos DESC, vec_id) AS r
  FROM (
    SELECT a.vec_id, a.c_id, a.qv, v.nn,
           CAST(CAST(list_sum(list_transform(generate_series(1, $dims), d -> a.qv[d] * c.c_qv[d])) AS BIGINT) AS DOUBLE)
             / sqrt(CAST(v.nn AS DOUBLE) * CAST(c.c_nn AS DOUBLE)) AS cent_cos
    FROM afn a JOIN qnn v ON a.vec_id = v.vec_id JOIN cn c ON a.c_id = c.c_id) q
), dupb AS (
  SELECT DISTINCT n.vec_id
  FROM rnw n JOIN kb b ON n.c_id = b.c_id
  WHERE CAST(${pairDot("n", "b")} AS DOUBLE)
          / sqrt(CAST(n.nn AS DOUBLE) * CAST(b.nn AS DOUBLE)) >= CAST($eps AS DOUBLE)
), dn AS (
  SELECT DISTINCT a.vec_id
  FROM rnw a JOIN rnw b ON a.c_id = b.c_id AND b.r < a.r
  WHERE CAST(${pairDot("a", "b")} AS DOUBLE)
          / sqrt(CAST(a.nn AS DOUBLE) * CAST(b.nn AS DOUBLE)) >= CAST($eps AS DOUBLE)
)
SELECT n.vec_id, n.c_id, n.cent_cos,
       (d1.vec_id IS NULL AND d2.vec_id IS NULL) AS keep,
       d1.vec_id IS NOT NULL AS dup_of_base
FROM rnw n LEFT JOIN dupb d1 ON n.vec_id = d1.vec_id
           LEFT JOIN dn d2 ON n.vec_id = d2.vec_id
ORDER BY n.vec_id"""

  private def kmeansConvergedSql(k: Int, maxIter: Int, dims: Int): String =
    vecProlog + s"""
, k0 AS MATERIALIZED (
  SELECT vec_id AS c_id, qv, CAST(0 AS BIGINT) AS n FROM qn WHERE vec_id < $k
)""" +
      (1 to maxIter).map(kmeansRoundSql(_, dims)).mkString + s"""
SELECT c_id, CAST(d - 1 AS INT) AS d, n, qv[d] AS cq,
       CAST(qv[d] AS DOUBLE) / 1048576.0 AS mean
FROM (SELECT c_id, n, qv, unnest(generate_series(1, $dims)) AS d FROM k$maxIter) q
ORDER BY c_id, d"""

  /** s17's oracle: the unrolled k-means chain, then BOTH assignments —
    * seed (k0's first-k centroids, what the shipped layout used) and
    * trained (k$maxIter) — rolled up into the per-cell migration report.
    * Mirrors [[VectorOps.ivfRetrainReport]]; the argmin tiebreak
    * (dist2, c_id) matches assignToCentroids'. */
  private def ivfRetrainSql(k: Int, maxIter: Int, dims: Int): String =
    vecProlog + s"""
, k0 AS MATERIALIZED (
  SELECT vec_id AS c_id, qv, CAST(0 AS BIGINT) AS n FROM qn WHERE vec_id < $k
)""" +
      (1 to maxIter).map(kmeansRoundSql(_, dims)).mkString + s"""
, a_old AS (
  SELECT vec_id, c_id AS cell_old FROM (
    SELECT v.vec_id, c.c_id,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             v.nn - 2 * ${pairDot("v", "c")}
               + CAST(list_sum(list_transform(generate_series(1, $dims), d -> c.qv[d] * c.qv[d])) AS BIGINT),
             c.c_id) AS rn
    FROM qn v, k0 c) q WHERE rn = 1
), a_new AS (
  SELECT vec_id, c_id AS cell_new FROM (
    SELECT v.vec_id, c.c_id,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             v.nn - 2 * ${pairDot("v", "c")}
               + CAST(list_sum(list_transform(generate_series(1, $dims), d -> c.qv[d] * c.qv[d])) AS BIGINT),
             c.c_id) AS rn
    FROM qn v, k$maxIter c) q WHERE rn = 1
), tr AS (
  SELECT o.cell_old, n.cell_new, CAST(count(*) AS BIGINT) AS c
  FROM a_old o JOIN a_new n USING (vec_id) GROUP BY 1, 2
), oa AS (
  SELECT cell_old AS cell, CAST(sum(c) AS BIGINT) AS n_old,
         CAST(sum(CASE WHEN cell_new <> cell_old THEN c ELSE 0 END) AS BIGINT) AS moved_out
  FROM tr GROUP BY 1
), na AS (
  SELECT cell_new AS cell, CAST(sum(c) AS BIGINT) AS n_new,
         CAST(sum(CASE WHEN cell_new <> cell_old THEN c ELSE 0 END) AS BIGINT) AS moved_in
  FROM tr GROUP BY 1
)
SELECT coalesce(oa.cell, na.cell) AS cell,
       CAST(coalesce(oa.n_old, 0) AS BIGINT) AS n_old,
       CAST(coalesce(na.n_new, 0) AS BIGINT) AS n_new,
       CAST(coalesce(na.moved_in, 0) AS BIGINT) AS moved_in,
       CAST(coalesce(oa.moved_out, 0) AS BIGINT) AS moved_out,
       (coalesce(na.moved_in, 0) > 0 OR coalesce(oa.moved_out, 0) > 0) AS needs_rewrite
FROM oa FULL JOIN na ON oa.cell = na.cell
ORDER BY 1"""

  /** One unrolled BPE merge round (see [[TextOps.bpeMerges]]): weighted
    * pair counts over vocab v${k-1}, argmax by (count DESC, pair ASC),
    * then greedy left-to-right merge application as a per-word recursive
    * fold — the CTE mirror of the Spark side's `aggregate` HOF (a string
    * replace would disagree on shared-delimiter runs like `a a a a`).
    * Words not containing the pair skip the recursion and pass through
    * unchanged — via LEFT JOIN ON TRUE, so an EMPTY round table (pair
    * mass exhausted before the configured rounds) passes the whole vocab
    * through, matching the Spark loop's empty-argmax no-op. */
  private def bpeRoundSql(k: Int): String = s"""
, p$k AS (
  SELECT ss[i] AS pa, ss[i+1] AS pb, CAST(sum(cnt) AS BIGINT) AS c
  FROM (SELECT cnt, ss, unnest(generate_series(1, len(ss) - 1)) AS i FROM v${k - 1}) q
  GROUP BY 1, 2
), t$k AS MATERIALIZED (
  SELECT pa, pb, pa || pb AS merged, c FROM p$k ORDER BY c DESC, pa, pb LIMIT 1
), f$k(rid, i, acc, ss) AS (
  SELECT v.rid, 1, [v.ss[1]], v.ss
  FROM v${k - 1} v, t$k t
  WHERE len(list_filter(generate_series(1, len(v.ss) - 1),
          j -> v.ss[j] = t.pa AND v.ss[j+1] = t.pb)) > 0
  UNION ALL
  SELECT f.rid, f.i + 1,
    CASE WHEN f.acc[-1] = t.pa AND f.ss[f.i + 1] = t.pb
         THEN list_append(f.acc[1:len(f.acc) - 1], t.merged)
         ELSE list_append(f.acc, f.ss[f.i + 1]) END,
    f.ss
  FROM f$k f, t$k t WHERE f.i < len(f.ss)
), v$k AS MATERIALIZED (
  SELECT f.rid, v.cnt, f.acc AS ss
  FROM (SELECT rid, acc, row_number() OVER (PARTITION BY rid ORDER BY i DESC) AS rn
        FROM f$k) f
  JOIN v${k - 1} v ON f.rid = v.rid
  WHERE f.rn = 1
  UNION ALL
  SELECT v.rid, v.cnt, v.ss
  FROM v${k - 1} v LEFT JOIN t$k t ON TRUE
  WHERE t.pa IS NULL
     OR len(list_filter(generate_series(1, len(v.ss) - 1),
          j -> v.ss[j] = t.pa AND v.ss[j+1] = t.pb)) = 0
)"""

  private def bpeProlog(rounds: Int): String = """
WITH RECURSIVE v0 AS MATERIALIZED (
  SELECT w AS rid, CAST(count(*) AS BIGINT) AS cnt,
         list_transform(generate_series(1, length(w)), i -> substring(w, i, 1)) AS ss
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
  GROUP BY w
)""" + (1 to rounds).map(bpeRoundSql).mkString

  private def bpeMergesSql(rounds: Int): String = bpeProlog(rounds) + s"""
SELECT round, pa, pb, merged, cnt FROM (
${(1 to rounds).map(k =>
      s"  SELECT CAST($k AS INT) AS round, pa, pb, merged, c AS cnt FROM t$k")
      .mkString("\n  UNION ALL\n")}
) u ORDER BY round"""

  /** Encode under the trained tokenizer: a word's token count is the
    * length of its final merged symbol sequence (v`rounds`). */
  private def bpeEncodeSql(rounds: Int): String = bpeProlog(rounds) + s"""
, encx AS (SELECT rid, len(ss) AS n_sym FROM v$rounds)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(length(t.w)) AS BIGINT) AS n_chars,
  CAST(sum(e.n_sym) AS BIGINT) AS n_tokens,
  CASE WHEN sum(e.n_sym) = 0 THEN 0e0
       ELSE CAST(sum(length(t.w)) AS DOUBLE) / sum(e.n_sym) END AS chars_per_token
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
JOIN encx e ON t.w = e.rid
GROUP BY 1 ORDER BY 1"""

  /** x40's oracle: x31's per-doc encoding rolled up per (source,
    * predicted language) with 1-row totals for the share columns. */
  private def tokenizerFertilitySql(rounds: Int): String = bpeProlog(rounds) + s"""
, encx AS (SELECT rid, len(ss) AS n_sym FROM v$rounds)
, perdoc AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
    CAST(sum(length(t.w)) AS BIGINT) AS n_chars,
    CAST(sum(e.n_sym) AS BIGINT) AS n_tokens
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
  JOIN encx e ON t.w = e.rid
  GROUP BY 1
), xl40 AS (
  SELECT doc_id, ${TextOps.LangCase} AS lang_pred
  FROM (SELECT doc_id,
          CAST(${cntSum(TextOps.StopwordsEn)} AS BIGINT) AS en_n,
          CAST(${cntSum(TextOps.StopwordsDe)} AS BIGINT) AS de_n,
          CAST(${cntSum(TextOps.StopwordsEs)} AS BIGINT) AS es_n
        FROM documents) q
), per40 AS (
  SELECT d.source, l.lang_pred,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(p.n_words) AS BIGINT) AS n_words,
    CAST(sum(p.n_chars) AS BIGINT) AS n_chars,
    CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens
  FROM perdoc p
  JOIN documents d ON p.doc_id = d.doc_id
  JOIN xl40 l ON p.doc_id = l.doc_id
  GROUP BY 1, 2
), tot40 AS (
  SELECT CAST(sum(n_chars) AS BIGINT) AS t_chars,
         CAST(sum(n_tokens) AS BIGINT) AS t_tokens
  FROM per40
)
SELECT source, lang_pred, n_docs, n_words, n_chars, n_tokens,
  CASE WHEN n_tokens = 0 THEN 0e0
       ELSE CAST(n_chars AS DOUBLE) / n_tokens END AS fertility,
  CAST(n_chars AS DOUBLE) / t_chars AS char_share,
  CAST(n_tokens AS DOUBLE) / t_tokens AS token_share
FROM per40, tot40 ORDER BY source, lang_pred"""

  private def topK(where: String, k: Int, extraCols: String = ""): String = s"""
, pairsx AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         ${pairDot("a", "b")} AS dot, a.nn AS na, b.nn AS nb
  FROM qn a JOIN qn b ON $where
), scored AS (
  SELECT query_id, neighbor_id, dot,
         CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cos
  FROM pairsx
), ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, rnk, dot, cos$extraCols FROM ranked
WHERE rnk <= $k ORDER BY query_id, rnk"""

  val oracle: Map[String, String] = Map(
    "x1_lang_id" -> s"""
      SELECT doc_id, ${TextOps.LangCase} AS lang_pred, en_n, de_n, es_n
      FROM (SELECT doc_id,
              CAST(${cntSum(TextOps.StopwordsEn)} AS BIGINT) AS en_n,
              CAST(${cntSum(TextOps.StopwordsDe)} AS BIGINT) AS de_n,
              CAST(${cntSum(TextOps.StopwordsEs)} AS BIGINT) AS es_n
            FROM documents) q""",
    "x2_quality_score" -> s"""
      SELECT doc_id, n_words, n_stop,
        CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words AS avg_word_len,
        CAST(n_stop AS DOUBLE) / n_words AS stop_ratio,
        ${TextOps.QualityExpr} AS quality_score
      FROM (SELECT doc_id, n_chars,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
              CAST(${cntSum(TextOps.StopwordsEn)} AS BIGINT) AS n_stop
            FROM documents) q""",
    "x3_token_count" -> """
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        CAST(list_sum(list_transform(string_split(text, ' '),
          w -> CAST(floor((length(w) + 3) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_tokens
      FROM documents""",
    "x4_fingerprint" -> """
      SELECT doc_id, md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS fp
      FROM documents""",
    "d1_dedup_exact" -> """
      SELECT md5(text) AS fp, min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS n_dups
      FROM documents GROUP BY 1 ORDER BY keeper""",
    // "lines" are fixed 8-word segments (corpus has no newlines); df >= 2
    // marks a line boilerplate, cleaned text is the kept lines in order
    "x22_boilerplate_lines" -> """
      WITH wordsx AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      linesx AS (
        SELECT doc_id, i AS idx, array_to_string(ws[i*8+1 : i*8+8], ' ') AS line
        FROM (SELECT doc_id, ws,
                unnest(generate_series(0, CAST(ceil(len(ws) / 8.0) AS INT) - 1)) AS i
              FROM wordsx) q
      ), boiler AS (
        SELECT line FROM (
          SELECT line, count(DISTINCT doc_id) AS df FROM linesx GROUP BY 1) b
        WHERE df >= 2
      )
      SELECT l.doc_id,
        CAST(count(*) AS BIGINT) AS n_lines,
        CAST(count(b.line) AS BIGINT) AS n_boiler,
        CAST(count(*) - count(b.line) AS DOUBLE) / count(*) AS kept_frac,
        md5(coalesce(string_agg(CASE WHEN b.line IS NULL THEN l.line END,
          ' ' ORDER BY l.idx), '')) AS clean_md5
      FROM linesx l LEFT JOIN boiler b ON l.line = b.line
      GROUP BY 1 ORDER BY 1""",
    // seeded shuffle-shard export: the oracle computes the in-shard rank
    // with one global window — the semantics the Spark side's two-phase
    // (partition-local rank + offset join) prefix sum must reproduce
    // exactly, permutation and all
    "x34_shard_export" -> s"""
      WITH sk AS (
        SELECT doc_id,
               ${TextOps.hex13NumFragment("md5('graft:' || CAST(doc_id AS STRING))")} AS skey
        FROM documents
      ), shx AS (
        SELECT doc_id, skey, skey % 8 AS shard FROM sk
      )
      SELECT doc_id, skey, shard,
             CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id) - 1 AS BIGINT) AS pos
      FROM shx ORDER BY shard, pos""",
    // the manifest rolls the x34 export up per shard with an
    // order-sensitive positional checksum over 2^20-folded fingerprints
    "x44_shard_manifest" -> s"""
      WITH sk AS (
        SELECT doc_id,
               ${TextOps.hex13NumFragment("md5('graft:' || CAST(doc_id AS STRING))")} AS skey
        FROM documents
      ), shx AS (
        SELECT doc_id, skey, skey % 8 AS shard FROM sk
      ), px AS (
        SELECT doc_id, shard,
               CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id) - 1 AS BIGINT) AS pos
        FROM shx
      ), tk AS (
        SELECT doc_id,
               CAST(list_sum(list_transform(string_split(text, ' '),
                 w -> CAST(floor((length(w) + 3) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_tokens,
               (${TextOps.hex13NumFragment("md5(text)")}) % 1048576 AS fp20
        FROM documents
      )
      SELECT p.shard, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(max(p.pos) AS BIGINT) AS max_pos,
             CAST(sum(t.bpe_tokens) AS BIGINT) AS n_tokens,
             CAST(sum((t.fp20 + 1) * ((p.pos % 1048576) + 1)) AS BIGINT) AS checksum
      FROM px p JOIN tk t ON p.doc_id = t.doc_id
      GROUP BY p.shard ORDER BY p.shard""",
    // per-source budget enforcement in the seeded order; the oracle's
    // exclusive window cumsum states what the Spark side's per-source
    // two-phase prefix sum must equal
    "x35_budget_cap" -> s"""
      WITH tkx AS (
        SELECT d.doc_id, d.source,
               CAST(list_sum(list_transform(string_split(d.text, ' '),
                 w -> CAST(floor((length(w) + 3) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_tokens,
               ${TextOps.hex13NumFragment("md5('graft:' || CAST(d.doc_id AS STRING))")} AS skey
        FROM documents d
      ), cum AS (
        SELECT doc_id, source, bpe_tokens, skey,
               CAST(coalesce(sum(bpe_tokens) OVER (PARTITION BY source
                 ORDER BY skey, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        FROM tkx
      )
      SELECT doc_id, source, bpe_tokens, skey, cum_before,
             cum_before < 4000 AS keep
      FROM cum ORDER BY doc_id""",
    // 16-word stride-1 windows; a window in >=2 distinct docs is a
    // duplicated span; per-doc instance counts + fraction
    "x27_duplicated_spans" -> spanHashPatch("""
      WITH wordsx AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      ), thx AS (
        SELECT doc_id, ws, __TH__ AS th FROM wordsx
      ), wins AS (
        SELECT doc_id, __H16__ AS h
        FROM (SELECT doc_id, th, unnest(generate_series(1, len(ws) - 15)) AS i
              FROM thx WHERE len(ws) >= 16) q
      ), dup AS (
        SELECT h FROM (
          SELECT h, count(DISTINCT doc_id) AS docs FROM wins GROUP BY 1) b
        WHERE docs >= 2
      ), per_doc AS (
        SELECT w.doc_id,
          CAST(count(*) AS BIGINT) AS n_windows,
          CAST(sum(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        FROM wins w LEFT JOIN dup d ON w.h = d.h
        GROUP BY 1
      )
      SELECT doc.doc_id,
        coalesce(p.n_windows, 0) AS n_windows,
        coalesce(p.n_dup, 0) AS n_dup,
        CASE WHEN coalesce(p.n_windows, 0) = 0 THEN 0e0
             ELSE CAST(p.n_dup AS DOUBLE) / p.n_windows END AS dup_frac
      FROM documents doc LEFT JOIN per_doc p ON doc.doc_id = p.doc_id
      ORDER BY doc.doc_id"""),
    // x39 mirrors TextOps.evalSpanContamination: 4-word windows, benchmark
    // = docs 0-9, coverage = distinct (doc, pos) under every hit window
    "x39_eval_span_contamination" -> spanHashPatch("""
      WITH wordsc AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      ), thc AS (
        SELECT doc_id, ws, __TH__ AS th FROM wordsc
      ), winsc AS (
        SELECT doc_id, i, __H4__ AS h
        FROM (SELECT doc_id, th, unnest(generate_series(1, len(ws) - 3)) AS i
              FROM thc WHERE len(ws) >= 4) q
      ), benchc AS (
        SELECT DISTINCT h FROM winsc WHERE doc_id < 10
      ), hitsc AS (
        SELECT w.doc_id, w.i, w.h FROM winsc w JOIN benchc b ON w.h = b.h
        WHERE w.doc_id >= 10
      ), cov AS (
        SELECT DISTINCT doc_id, i + d AS pos
        FROM hitsc, (SELECT unnest(generate_series(0, 3)) AS d) t
      ), contam AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contam_tokens
        FROM cov GROUP BY 1
      ), winhits AS (
        SELECT doc_id, CAST(count(DISTINCT h) AS BIGINT) AS n_hit_windows
        FROM hitsc GROUP BY 1
      )
      SELECT d.doc_id,
        CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        coalesce(c.n_contam_tokens, CAST(0 AS BIGINT)) AS n_contam_tokens,
        coalesce(w.n_hit_windows, CAST(0 AS BIGINT)) AS n_hit_windows,
        CAST(coalesce(c.n_contam_tokens, 0) AS DOUBLE)
          / len(string_split(d.text, ' ')) AS contam_frac
      FROM documents d
      LEFT JOIN contam c ON d.doc_id = c.doc_id
      LEFT JOIN winhits w ON d.doc_id = w.doc_id
      WHERE d.doc_id >= 10 ORDER BY d.doc_id"""),
    // x46: x32's surgery with x39's benchmark coverage set
    "x46_eval_span_scrub" -> spanHashPatch("""
      WITH wsx6 AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      ), tok6 AS (
        SELECT doc_id, i - 1 AS pos, ws[i] AS w
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
              FROM wsx6 WHERE doc_id >= 10) q
      ), th6 AS (
        SELECT doc_id, ws, __TH__ AS th FROM wsx6
      ), win6 AS (
        SELECT doc_id, i, __H4__ AS h
        FROM (SELECT doc_id, th, unnest(generate_series(1, len(ws) - 3)) AS i
              FROM th6 WHERE len(ws) >= 4) q
      ), bench6 AS (
        SELECT DISTINCT h FROM win6 WHERE doc_id < 10
      ), cov6 AS (
        SELECT DISTINCT doc_id, pos FROM (
          SELECT w.doc_id, unnest(generate_series(w.i - 1, w.i + 2)) AS pos
          FROM win6 w JOIN bench6 b ON w.h = b.h WHERE w.doc_id >= 10) q
      ), marked6 AS (
        SELECT t.doc_id, t.pos, t.w, c.pos IS NOT NULL AS is_cov
        FROM tok6 t LEFT JOIN cov6 c ON t.doc_id = c.doc_id AND t.pos = c.pos
      ), agg6 AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN is_cov THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
          md5(coalesce(string_agg(CASE WHEN NOT is_cov THEN w END, ' ' ORDER BY pos),
            '')) AS clean_md5
        FROM marked6 GROUP BY 1
      )
      SELECT doc_id, n_tokens, n_removed,
        CAST(n_tokens - n_removed AS DOUBLE) / n_tokens AS kept_frac, clean_md5
      FROM agg6 ORDER BY doc_id"""),
    // x47: the CMS build (4×64 cells over exact term counts) + the
    // min-over-rows probe for the top-20 exact terms
    "x47_cms_audit" -> s"""
      WITH tc AS (
        SELECT term, CAST(count(*) AS BIGINT) AS exact
        FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents) q
        GROUP BY 1
      ), hx AS (
        SELECT term, exact, j,
               (${TextOps.hex13NumFragment("md5(CAST(j AS STRING) || ':' || term)")}) % 64 AS cell
        FROM tc, (SELECT unnest(generate_series(0, 3)) AS j) tj
      ), cms AS (
        SELECT j, cell, CAST(sum(exact) AS BIGINT) AS c FROM hx GROUP BY 1, 2
      ), topx AS (
        SELECT term, exact,
               CAST(row_number() OVER (ORDER BY exact DESC, term) AS INT) AS rnk
        FROM tc ORDER BY exact DESC, term LIMIT 20
      ), est AS (
        SELECT t.rnk, t.term, t.exact, CAST(min(c.c) AS BIGINT) AS cms_est
        FROM topx t
        JOIN hx h ON t.term = h.term
        JOIN cms c ON h.j = c.j AND h.cell = c.cell
        GROUP BY 1, 2, 3
      )
      SELECT rnk, term, exact, cms_est, cms_est - exact AS overestimate
      FROM est ORDER BY rnk""",
    // x49: the bottom-k sample sketch replayed as an order statistic of
    // the same md5 (rows with the 16 smallest hashes per source), exact
    // quantiles from the histogram's cumulative counts, signed rank error
    // of each estimate at its target rank ceil(q·n)
    "x49_quantile_sketch" -> s"""
      WITH h AS (
        SELECT source, n_chars AS v,
               (${TextOps.hex13NumFragment("md5(CAST(doc_id AS STRING) || ':qs')")}) AS hv
        FROM documents
      ), samp AS (
        SELECT source, v FROM (
          SELECT source, v,
                 row_number() OVER (PARTITION BY source ORDER BY hv, v) AS rn
          FROM h) q WHERE rn <= 16
      ), sk AS (
        SELECT source, list(v ORDER BY v) AS sample,
               CAST(count(*) AS BIGINT) AS k_actual
        FROM samp GROUP BY source
      ), nd AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM h GROUP BY source
      ), est AS (
        SELECT source, k_actual,
          sample[CAST(floor((k_actual + 1) / 2.0) AS INT)] AS p50_est,
          sample[CAST(floor((9 * k_actual + 9) / 10.0) AS INT)] AS p90_est,
          sample[CAST(floor((99 * k_actual + 99) / 100.0) AS INT)] AS p99_est
        FROM sk
      ), hist AS (
        SELECT source, v, CAST(count(*) AS BIGINT) AS c FROM h GROUP BY 1, 2
      ), cum AS (
        SELECT source, v,
               CAST(sum(c) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cum,
               CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n
        FROM hist
      ), ex AS (
        SELECT source,
          min(CASE WHEN cum >= CAST(floor((n + 1) / 2.0) AS BIGINT) THEN v END) AS p50_exact,
          min(CASE WHEN cum >= CAST(floor((9 * n + 9) / 10.0) AS BIGINT) THEN v END) AS p90_exact,
          min(CASE WHEN cum >= CAST(floor((99 * n + 99) / 100.0) AS BIGINT) THEN v END) AS p99_exact
        FROM cum GROUP BY source
      )
      SELECT e.source, nd.n_docs, e.k_actual,
        e.p50_est, ex.p50_exact,
        CAST(c50.cum - floor((nd.n_docs + 1) / 2.0) AS BIGINT) AS p50_rank_err,
        e.p90_est, ex.p90_exact,
        CAST(c90.cum - floor((9 * nd.n_docs + 9) / 10.0) AS BIGINT) AS p90_rank_err,
        e.p99_est, ex.p99_exact,
        CAST(c99.cum - floor((99 * nd.n_docs + 99) / 100.0) AS BIGINT) AS p99_rank_err
      FROM est e
      JOIN ex ON e.source = ex.source
      JOIN nd ON e.source = nd.source
      JOIN cum c50 ON c50.source = e.source AND c50.v = e.p50_est
      JOIN cum c90 ON c90.source = e.source AND c90.v = e.p90_est
      JOIN cum c99 ON c99.source = e.source AND c99.v = e.p99_est
      ORDER BY e.source""",
    // per-token surprisal quantized once per vocab entry, per-doc exact
    // integer sum (unigram-LM bits: the CCNet-style quality ranking)
    "x25_unigram_surprisal" -> """
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
      ), vocab AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1
      ), tot AS (
        SELECT CAST(sum(c) AS BIGINT) AS t_total FROM vocab
      ), bits AS (
        SELECT w, CAST(floor(log2(CAST(t_total AS DOUBLE) / c) * 1048576e0) AS BIGINT) AS b
        FROM vocab, tot
      )
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(b.b) AS BIGINT) AS bits_q,
             CAST(sum(b.b) AS DOUBLE) / count(*) / 1048576e0 AS bits_per_token
      FROM tok t JOIN bits b ON t.w = b.w
      GROUP BY 1 ORDER BY 1""",
    // x48: interpolated bigram surprisal — the quantization fragment is
    // the SAME Scala constant the Spark side compiles, so the IEEE chain
    // cannot drift between engines
    "x48_bigram_surprisal" -> s"""
      WITH wsx8 AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      ), big8 AS (
        SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
              FROM wsx8 WHERE len(ws) >= 2) q
      ), bcnt8 AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bi FROM big8 GROUP BY 1, 2
      ), ctx8 AS (
        SELECT w1, CAST(sum(c_bi) AS BIGINT) AS c_ctx FROM bcnt8 GROUP BY 1
      ), uni8 AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c_uni
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) q
        GROUP BY 1
      ), tot8 AS (
        SELECT CAST(sum(c_uni) AS BIGINT) AS t_total FROM uni8
      ), model8 AS (
        SELECT b.w1, b.w2, ${TextOps.BigramBitsExpr} AS b
        FROM bcnt8 b JOIN ctx8 USING (w1) JOIN uni8 u ON b.w2 = u.w, tot8
      )
      SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(m.b) AS BIGINT) AS bits_q,
             CAST(sum(m.b) AS DOUBLE) / count(*) / 1048576e0 AS bits_per_bigram
      FROM big8 g JOIN model8 m ON g.w1 = m.w1 AND g.w2 = m.w2
      GROUP BY 1 ORDER BY 1""",
    "x26_bpe_merges" -> bpeMergesSql(8),
    "x31_bpe_encode" -> bpeEncodeSql(8),
    "x40_tokenizer_fertility" -> tokenizerFertilitySql(8),
    // CCNet tertiles over x25's bits/token: coarse 1/64-bit histogram
    // selection (no global sort), thresholds broadcast back
    "x33_perplexity_buckets" -> """
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
      ), vocab AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1
      ), tot AS (
        SELECT CAST(sum(c) AS BIGINT) AS t_total FROM vocab
      ), bits AS (
        SELECT w, CAST(floor(log2(CAST(t_total AS DOUBLE) / c) * 1048576e0) AS BIGINT) AS b
        FROM vocab, tot
      ), perdoc AS (
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(b.b) AS BIGINT) AS bits_q,
               CAST(sum(b.b) AS BIGINT) // count(*) // 1024 AS btq
        FROM tok t JOIN bits b ON t.w = b.w GROUP BY 1
      ), hist AS (
        SELECT btq, CAST(count(*) AS BIGINT) AS c FROM perdoc GROUP BY 1
      ), cum AS (
        SELECT btq, c,
          CAST(sum(c) OVER (ORDER BY btq
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
          CAST((SELECT count(*) FROM perdoc) AS BIGINT) AS n
        FROM hist
      ), thr AS (
        SELECT min(CASE WHEN cum >= CAST(ceil(n / 3e0) AS BIGINT) THEN btq END) AS t1,
               min(CASE WHEN cum >= CAST(ceil(2e0 * n / 3e0) AS BIGINT) THEN btq END) AS t2
        FROM cum
      ), bucketed AS (
        SELECT p.*, CASE WHEN p.btq <= t.t1 THEN '1_head'
                         WHEN p.btq <= t.t2 THEN '2_middle'
                         ELSE '3_tail' END AS bucket
        FROM perdoc p, thr t
      )
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        CAST(CAST(sum(bits_q) AS BIGINT) AS DOUBLE) / CAST(sum(n_tokens) AS BIGINT) / 1048576e0
          AS avg_bits_per_token
      FROM bucketed GROUP BY bucket ORDER BY bucket""",
    // duplicated-span removal: tokens covered by any >=2-doc 16-word
    // window are dropped; cleaned doc reassembled in order (x27's scrub)
    "x32_span_scrub" -> spanHashPatch("""
      WITH wsx2 AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      ), tok2 AS (
        SELECT doc_id, i - 1 AS pos, ws[i] AS w
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM wsx2) q
      ), th2 AS (
        SELECT doc_id, ws, __TH__ AS th FROM wsx2
      ), win2 AS (
        SELECT doc_id, i, __H16__ AS h
        FROM (SELECT doc_id, th, unnest(generate_series(1, len(ws) - 15)) AS i
              FROM th2 WHERE len(ws) >= 16) q
      ), dup2 AS (
        SELECT h FROM (
          SELECT h, count(DISTINCT doc_id) AS docs FROM win2 GROUP BY 1) b
        WHERE docs >= 2
      ), cov2 AS (
        SELECT DISTINCT doc_id, pos FROM (
          SELECT w.doc_id, unnest(generate_series(w.i - 1, w.i + 14)) AS pos
          FROM win2 w JOIN dup2 d ON w.h = d.h) q
      ), marked2 AS (
        SELECT t.doc_id, t.pos, t.w, c.pos IS NOT NULL AS is_cov
        FROM tok2 t LEFT JOIN cov2 c ON t.doc_id = c.doc_id AND t.pos = c.pos
      ), agg2 AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN is_cov THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
          md5(coalesce(string_agg(CASE WHEN NOT is_cov THEN w END, ' ' ORDER BY pos),
            '')) AS clean_md5
        FROM marked2 GROUP BY 1
      )
      SELECT doc_id, n_tokens, n_removed,
        CAST(n_tokens - n_removed AS DOUBLE) / n_tokens AS kept_frac, clean_md5
      FROM agg2 ORDER BY doc_id"""),
    // per-source unigram KL drift: each (source, word) contribution
    // quantized to the 2^20 grid, exact BIGINT per-source sum
    "x30_source_drift" -> """
      WITH swd AS (
        SELECT source, w, CAST(count(*) AS BIGINT) AS c_sw
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents) q
        GROUP BY 1, 2
      ), corpusd AS (
        SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w FROM swd GROUP BY 1
      ), totalsd AS (
        SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s FROM swd GROUP BY 1
      ), totd AS (
        SELECT CAST(sum(c_sw) AS BIGINT) AS n_tot FROM swd
      ), termsd AS (
        SELECT s.source, t.n_s,
          CAST(floor(CAST(s.c_sw AS DOUBLE) / t.n_s
           * log2((CAST(s.c_sw AS DOUBLE) / t.n_s) / (CAST(c.c_w AS DOUBLE) / g.n_tot))
           * 1048576e0) AS BIGINT) AS term_q
        FROM swd s
        JOIN corpusd c ON s.w = c.w
        JOIN totalsd t ON s.source = t.source, totd g
      )
      SELECT source, max(n_s) AS n_tokens, CAST(count(*) AS BIGINT) AS n_vocab,
        CAST(sum(term_q) AS BIGINT) AS kl_q,
        CAST(CAST(sum(term_q) AS BIGINT) AS DOUBLE) / 1048576e0 AS kl_bits
      FROM termsd GROUP BY source ORDER BY source""",
    // BM25 retrieval: idf quantized once per term, each posting's
    // contribution quantized to the 2^20 grid, exact BIGINT per-doc sum
    "x29_bm25_topk" -> """
      WITH lensb AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        FROM documents
      ), statsb AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
        FROM lensb
      ), tfb AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) q
        WHERE w IN ('spark', 'shuffle', 'hash', 'merge')
        GROUP BY 1, 2
      ), idfb AS (
        SELECT w,
          CAST(floor(ln(1e0 + (CAST(n_docs - df AS DOUBLE) + 0.5e0) / (CAST(df AS DOUBLE) + 0.5e0))
           * 1048576e0) AS BIGINT) AS idf_q
        FROM (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tfb GROUP BY 1) d, statsb
      ), postsb AS (
        SELECT t.doc_id,
          CAST(floor(CAST(i.idf_q AS DOUBLE) * (CAST(t.tf AS DOUBLE) * 2.2e0)
           / (CAST(t.tf AS DOUBLE) + 1.2e0 * (0.25e0 + 0.75e0 * CAST(l.dl AS DOUBLE)
              / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))) AS BIGINT) AS contrib_q
        FROM tfb t
        JOIN lensb l ON t.doc_id = l.doc_id
        JOIN idfb i ON t.w = i.w, statsb s
      ), scoredb AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
               CAST(sum(contrib_q) AS BIGINT) AS score_q
        FROM postsb GROUP BY 1
      )
      SELECT CAST(row_number() OVER (ORDER BY score_q DESC, doc_id) AS INT) AS rnk,
        doc_id, n_terms, score_q, CAST(score_q AS DOUBLE) / 1048576e0 AS score
      FROM scoredb ORDER BY score_q DESC, doc_id LIMIT 10""",
    // DSIR importance: per-bucket add-1 log-ratio weight quantized once,
    // per-doc exact BIGINT sum over bigram instances (see TextOps scaladoc)
    "x28_dsir_importance" -> s"""
      WITH flagsd AS (
        SELECT doc_id,
          NOT (n_words < 20 OR n_words > 88 OR n_stop = 0
               OR n_distinct * 100 < n_words * 35) AS is_target
        FROM (SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
                CAST(${cntSum(TextOps.StopwordsEn)} AS BIGINT) AS n_stop
              FROM documents) q
      ), bgd AS (
        SELECT w.doc_id, f.is_target,
          ${TextOps.hex13NumFragment("md5(w.ws[w.i] || ' ' || w.ws[w.i+1])")} % 256 AS bucket
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
              FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) q0) w
        JOIN flagsd f ON w.doc_id = f.doc_id
      ), wtsd AS (
        SELECT bucket,
          CAST(floor(log2(CAST(t_b + 1 AS DOUBLE) / (a_b + 1)) * 1048576e0) AS BIGINT) AS w_q
        FROM (SELECT bucket, CAST(count(*) AS BIGINT) AS a_b,
                CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS t_b
              FROM bgd GROUP BY 1) q
      ), perdoc AS (
        SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(w.w_q) AS BIGINT) AS score_q
        FROM bgd b JOIN wtsd w USING (bucket) GROUP BY 1
      )
      SELECT d.doc_id,
        CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        CAST(coalesce(p.score_q, 0) AS BIGINT) AS score_q,
        CASE WHEN coalesce(p.n_bigrams, 0) = 0 THEN 0e0
             ELSE CAST(p.score_q AS DOUBLE) / p.n_bigrams / 1048576e0 END AS importance
      FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
      ORDER BY d.doc_id""",
    // x50: x28's chain plus the seeded acceptance variate — u_q and the
    // acceptance cross-multiply are exact BIGINT on the same 2^20 grid
    "x50_importance_resample" -> s"""
      WITH flagsd AS (
        SELECT doc_id,
          NOT (n_words < 20 OR n_words > 88 OR n_stop = 0
               OR n_distinct * 100 < n_words * 35) AS is_target
        FROM (SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
                CAST(${cntSum(TextOps.StopwordsEn)} AS BIGINT) AS n_stop
              FROM documents) q
      ), bgd AS (
        SELECT w.doc_id, f.is_target,
          ${TextOps.hex13NumFragment("md5(w.ws[w.i] || ' ' || w.ws[w.i+1])")} % 256 AS bucket
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
              FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) q0) w
        JOIN flagsd f ON w.doc_id = f.doc_id
      ), wtsd AS (
        SELECT bucket,
          CAST(floor(log2(CAST(t_b + 1 AS DOUBLE) / (a_b + 1)) * 1048576e0) AS BIGINT) AS w_q
        FROM (SELECT bucket, CAST(count(*) AS BIGINT) AS a_b,
                CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS t_b
              FROM bgd GROUP BY 1) q
      ), perdoc AS (
        SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(w.w_q) AS BIGINT) AS score_q
        FROM bgd b JOIN wtsd w USING (bucket) GROUP BY 1
      ), drawn AS (
        SELECT d.doc_id,
          CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
          CAST(coalesce(p.score_q, 0) AS BIGINT) AS score_q,
          CAST(floor(log2((CAST(${TextOps.hex13NumFragment(
            "md5('graft:rs:' || CAST(d.doc_id AS VARCHAR))")} AS DOUBLE) + 1e0)
              / 4503599627370496e0) * 1048576e0) AS BIGINT) AS u_q
        FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
      )
      SELECT doc_id, n_bigrams, score_q, u_q,
        (n_bigrams > 0 AND u_q * n_bigrams <= score_q) AS accept
      FROM drawn ORDER BY doc_id""",
    "x23_pii_redact" -> s"""
      WITH wire AS (
        SELECT doc_id, ${TextOps.PiiWireExpr} AS wire_text FROM documents
      ), red AS (
        SELECT doc_id,
          CAST(len(regexp_extract_all(wire_text, '${TextOps.PiiEmailRe}')) AS BIGINT) AS n_email,
          CAST(len(regexp_extract_all(wire_text, '${TextOps.PiiPhoneRe}')) AS BIGINT) AS n_phone,
          CAST(len(regexp_extract_all(wire_text, '${TextOps.PiiIpRe}')) AS BIGINT) AS n_ip,
          regexp_replace(regexp_replace(regexp_replace(wire_text,
            '${TextOps.PiiEmailRe}', '<EMAIL>', 'g'),
            '${TextOps.PiiPhoneRe}', '<PHONE>', 'g'),
            '${TextOps.PiiIpRe}', '<IP>', 'g') AS redacted
        FROM wire
      )
      SELECT doc_id, n_email, n_phone, n_ip,
        (n_email + n_phone + n_ip > 0) AS has_pii, md5(redacted) AS red_md5
      FROM red ORDER BY doc_id""",
    "d2_dedup_ngram_jaccard" -> (docProlog + """
      SELECT doc_a, doc_b, common, sa, sb, jac FROM rjacp
      WHERE jac >= 0.5 ORDER BY doc_a, doc_b"""),
    "d3_dedup_minhash_lsh" -> (docProlog + """
      SELECT c.doc_a, c.doc_b, j.jac
      FROM lsh_cands c JOIN jacp j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
      WHERE j.jac >= 0.5 ORDER BY c.doc_a, c.doc_b"""),
    // incremental: d3's pair set restricted to pairs whose LARGER member
    // is new (doc_id >= 250) — base×base pairs settled in previous
    // increments never reappear; is_cross marks new-duplicates-of-base
    "d11_dedup_incremental" -> (docProlog + """
      SELECT c.doc_a, c.doc_b, j.jac, c.doc_a < 250 AS is_cross
      FROM lsh_cands c JOIN jacp j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
      WHERE j.jac >= 0.5 AND c.doc_b >= 250 ORDER BY c.doc_a, c.doc_b"""),
    // transitive closure of the dup-pair graph; WITH RECURSIVE is needed
    // for the walk CTE, so the shared prologue's WITH is upgraded
    "d6_dedup_clusters" -> (docProlog.replaceFirst("WITH", "WITH RECURSIVE") + """
      , e0 AS (
        SELECT c.doc_a AS a, c.doc_b AS b
        FROM lsh_cands c JOIN jacp j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
        WHERE j.jac >= 0.5
      ), e AS (
        SELECT a, b FROM e0 UNION SELECT b, a FROM e0
      ), walk(n, m) AS (
        SELECT a, b FROM e
        UNION
        SELECT w.n, e.b FROM walk w JOIN e ON w.m = e.a
      ), comp AS (
        SELECT n AS doc_id, least(n, min(m)) AS cluster_id FROM walk GROUP BY n
      ), lab AS (
        SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
      ), csizes AS (
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size FROM lab GROUP BY 1
      )
      SELECT l.doc_id, l.cluster_id, s.cluster_size
      FROM lab l JOIN csizes s ON l.cluster_id = s.cluster_id
      ORDER BY l.doc_id"""),
    // d6's transitive-closure chain + the salted cluster-id hash split:
    // the split column depends ONLY on cluster_id, so both members of any
    // dup pair land in the same split by construction
    "x53_cluster_split" -> (docProlog.replaceFirst("WITH", "WITH RECURSIVE") + s"""
      , e0 AS (
        SELECT c.doc_a AS a, c.doc_b AS b
        FROM lsh_cands c JOIN jacp j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
        WHERE j.jac >= 0.5
      ), e AS (
        SELECT a, b FROM e0 UNION SELECT b, a FROM e0
      ), walk(n, m) AS (
        SELECT a, b FROM e
        UNION
        SELECT w.n, e.b FROM walk w JOIN e ON w.m = e.a
      ), comp AS (
        SELECT n AS doc_id, least(n, min(m)) AS cluster_id FROM walk GROUP BY n
      ), lab AS (
        SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
      ), csizes AS (
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size FROM lab GROUP BY 1
      ), sp AS (
        SELECT l.doc_id, l.cluster_id, s.cluster_size,
               md5('graft:csplit:' || CAST(l.cluster_id AS VARCHAR)) AS h
        FROM lab l JOIN csizes s ON l.cluster_id = s.cluster_id
      )
      SELECT doc_id, cluster_id, cluster_size,
        ${TextOps.hex13NumFragment("h")} % 100 AS bucket,
        CASE WHEN ${TextOps.hex13NumFragment("h")} % 100 < 80 THEN 'train'
             WHEN ${TextOps.hex13NumFragment("h")} % 100 < 90 THEN 'val'
             ELSE 'test' END AS split
      FROM sp ORDER BY doc_id"""),
    // block-position multiset semantics: blocks are position-keyed, NOT
    // deduped per doc — a passage repeated inside one document is a
    // duplicate exactly as a cross-document copy is
    "d15_exact_blocks" -> """
      WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      ), blk AS (
        SELECT doc_id,
               md5(array_to_string(ws[(b*16+1):(b*16+16)], ' ')) AS bh
        FROM (SELECT doc_id, ws,
                unnest(generate_series(0, len(ws) // 16 - 1)) AS b FROM w) q
      ), bdf AS (
        SELECT bh, CAST(count(*) AS BIGINT) AS df FROM blk GROUP BY 1
      )
      SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
        CAST(sum(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_blocks,
        CAST(sum(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac,
        CAST(sum(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) >= 0.25
          AS is_flagged
      FROM blk b JOIN bdf f ON b.bh = f.bh
      GROUP BY b.doc_id ORDER BY b.doc_id""",
    // d6's transitive-closure chain + the x2 quality projection: each
    // cluster keeps its highest-quality member (ties to smaller doc_id)
    "x24_cluster_reps" -> (docProlog.replaceFirst("WITH", "WITH RECURSIVE") + s"""
      , e0 AS (
        SELECT c.doc_a AS a, c.doc_b AS b
        FROM lsh_cands c JOIN jacp j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
        WHERE j.jac >= 0.5
      ), e AS (
        SELECT a, b FROM e0 UNION SELECT b, a FROM e0
      ), walk(n, m) AS (
        SELECT a, b FROM e
        UNION
        SELECT w.n, e.b FROM walk w JOIN e ON w.m = e.a
      ), comp AS (
        SELECT n AS doc_id, least(n, min(m)) AS cluster_id FROM walk GROUP BY n
      ), lab AS (
        SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
      ), csizes AS (
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size FROM lab GROUP BY 1
      ), qual AS (
        SELECT doc_id, ${TextOps.QualityExpr} AS quality_score
        FROM (SELECT doc_id, n_chars,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                CAST(${cntSum(TextOps.StopwordsEn)} AS BIGINT) AS n_stop
              FROM documents) q
      ), rankedq AS (
        SELECT l.cluster_id, l.doc_id, q.quality_score,
               row_number() OVER (PARTITION BY l.cluster_id
                 ORDER BY q.quality_score DESC, l.doc_id) AS rn
        FROM lab l JOIN qual q ON l.doc_id = q.doc_id
      )
      SELECT r.cluster_id, c.cluster_size, r.doc_id AS rep_doc,
             r.quality_score AS rep_quality, c.cluster_size - 1 AS n_dropped
      FROM rankedq r JOIN csizes c ON r.cluster_id = c.cluster_id
      WHERE rn = 1 ORDER BY r.cluster_id"""),
    // same recursive transitive-closure chain as d6, rolled up to the
    // per-cluster savings report
    "d9_dedup_savings" -> (docProlog.replaceFirst("WITH", "WITH RECURSIVE") + """
      , e0 AS (
        SELECT c.doc_a AS a, c.doc_b AS b
        FROM lsh_cands c JOIN jacp j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
        WHERE j.jac >= 0.5
      ), e AS (
        SELECT a, b FROM e0 UNION SELECT b, a FROM e0
      ), walk(n, m) AS (
        SELECT a, b FROM e
        UNION
        SELECT w.n, e.b FROM walk w JOIN e ON w.m = e.a
      ), comp AS (
        SELECT n AS doc_id, least(n, min(m)) AS cluster_id FROM walk GROUP BY n
      ), lab AS (
        SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
      ), csizes AS (
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size FROM lab GROUP BY 1
      ), sized AS (
        SELECT doc_id, n_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        FROM documents
      )
      SELECT l.cluster_id, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN l.doc_id <> l.cluster_id THEN s.n_chars ELSE 0 END) AS BIGINT) AS chars_saved,
        CAST(sum(CASE WHEN l.doc_id <> l.cluster_id THEN s.n_words ELSE 0 END) AS BIGINT) AS words_saved
      FROM lab l
      JOIN csizes cs ON l.cluster_id = cs.cluster_id
      JOIN sized s ON l.doc_id = s.doc_id
      WHERE cs.cluster_size > 1
      GROUP BY l.cluster_id ORDER BY l.cluster_id"""),
    // signature-estimated vs exact jaccard per LSH candidate pair — the
    // docProlog's mh/lsh_cands/jacp CTEs carry everything needed
    "d10_minhash_calibration" -> (docProlog + """
      , calib AS (
        SELECT c.doc_a, c.doc_b,
          CAST(sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS BIGINT) AS est_matches
        FROM lsh_cands c
        JOIN mh ma ON ma.doc_id = c.doc_a
        JOIN mh mb ON mb.doc_id = c.doc_b AND mb.i = ma.i
        GROUP BY 1, 2
      )
      SELECT e.doc_a, e.doc_b, e.est_matches,
        CAST(e.est_matches AS DOUBLE) / 12 AS jac_est,
        j.common, j.sa, j.sb, j.jac AS jac_exact,
        CAST(e.est_matches AS DOUBLE) / 12 - j.jac AS err
      FROM calib e JOIN jacp j ON e.doc_a = j.doc_a AND e.doc_b = j.doc_b
      ORDER BY e.doc_a, e.doc_b"""),
    "d4_dedup_simhash" -> (docProlog + """
      SELECT doc_id, simhash, CAST(count(*) OVER (PARTITION BY simhash) AS BIGINT) AS n_same
      FROM simh ORDER BY doc_id"""),
    "d5_dedup_embedding" -> (vecProlog + s"""
, dvb AS (
  SELECT q.*, bk.bucket % 16 AS dbucket
  FROM qn q JOIN buckets bk ON q.vec_id = bk.vec_id
), dpairs AS (
  SELECT a.vec_id, b.vec_id AS nn_id, ${pairDot("a", "b")} AS dot, a.nn AS na, b.nn AS nb
  FROM dvb a JOIN dvb b
    ON a.label = b.label AND a.dbucket = b.dbucket AND b.vec_id <> a.vec_id
), dscored AS (
  SELECT vec_id, nn_id,
         CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cos
  FROM dpairs
), dranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, nn_id) AS r FROM dscored
)
SELECT q.vec_id, d.nn_id, d.cos, coalesce(d.cos >= 0.95, false) AS is_dup
FROM qn q LEFT JOIN (SELECT * FROM dranked WHERE r = 1) d ON q.vec_id = d.vec_id
ORDER BY q.vec_id"""),
    "x20_chunk_sliding" -> """
      WITH ws0 AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      ), ch AS (
        SELECT doc_id, ws, unnest(generate_series(0,
          CASE WHEN len(ws) <= 64 THEN 0 ELSE (len(ws) - 64 + 47) // 48 END)) AS i
        FROM ws0
      )
      SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        CAST(i * 48 AS BIGINT) AS start_tok,
        CAST(len(list_slice(ws, i * 48 + 1, i * 48 + 64)) AS BIGINT) AS n_tok,
        md5(array_to_string(list_slice(ws, i * 48 + 1, i * 48 + 64), ' ')) AS chunk_fp
      FROM ch ORDER BY doc_id, chunk_idx""",
    "x21_split_leakage" -> (docProlog + s"""
      , xsplit AS (
        SELECT doc_id,
          CASE WHEN hv * 20 < CAST(4503599627370496 AS BIGINT) THEN 'val'
               WHEN hv * 10 < CAST(4503599627370496 AS BIGINT) THEN 'test'
               ELSE 'train' END AS split
        FROM (SELECT doc_id,
                ${TextOps.hex13NumFragment("md5('split:' || CAST(doc_id AS STRING))")} AS hv
              FROM documents) q
      )
      SELECT c.doc_a, c.doc_b, j.jac, sa.split AS split_a, sb.split AS split_b,
             sa.split <> sb.split AS is_leak
      FROM lsh_cands c
      JOIN jacp j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
      JOIN xsplit sa ON c.doc_a = sa.doc_id
      JOIN xsplit sb ON c.doc_b = sb.doc_id
      WHERE j.jac >= 0.5
      ORDER BY c.doc_a, c.doc_b"""),
    "x19_novelty" -> (docProlog + """
      , xfirst AS (
        SELECT sh, min(doc_id) AS first_doc FROM shingles GROUP BY sh
      )
      SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_sh,
             CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
             CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS novelty_frac
      FROM shingles s JOIN xfirst f USING (sh)
      GROUP BY s.doc_id ORDER BY s.doc_id"""),
    "x18_curation_funnel" -> (docProlog + s"""
, f16 AS (
  SELECT doc_id,
    NOT (n_words < 20 OR n_words > 88 OR n_stop = 0
         OR n_distinct * 100 < n_words * 35) AS p1
  FROM (SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
          CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
          CAST(${cntSum(TextOps.StopwordsEn)} AS BIGINT) AS n_stop
        FROM documents) q
), fkeep AS (
  SELECT min(d.doc_id) AS doc_id
  FROM documents d JOIN f16 f ON d.doc_id = f.doc_id
  WHERE f.p1 GROUP BY md5(d.text)
), flose AS (
  SELECT DISTINCT j.doc_b AS doc_id
  FROM lsh_cands c JOIN jacp j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
  WHERE j.jac >= 0.5
), fl AS (
  SELECT doc_id, ${TextOps.LangCase} AS lang_pred,
         md5(CAST(doc_id AS STRING)) AS h
  FROM (SELECT doc_id,
          CAST(${cntSum(TextOps.StopwordsEn)} AS BIGINT) AS en_n,
          CAST(${cntSum(TextOps.StopwordsDe)} AS BIGINT) AS de_n,
          CAST(${cntSum(TextOps.StopwordsEs)} AS BIGINT) AS es_n
        FROM documents) q
), fs AS (
  SELECT doc_id FROM (
    SELECT doc_id, lang_pred, ${TextOps.hex13NumFragment("h")} AS hv FROM fl) q
  WHERE (lang_pred = 'en' AND hv * 10 < CAST(4503599627370496 AS BIGINT))
     OR (lang_pred <> 'en' AND hv * 2 < CAST(4503599627370496 AS BIGINT))
), fagg AS (
  SELECT CAST(count(*) AS BIGINT) AS n0,
    CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN p2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
    CAST(sum(CASE WHEN p3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
    CAST(sum(CASE WHEN p4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
  FROM (
    SELECT f.doc_id, f.p1,
      f.p1 AND (k.doc_id IS NOT NULL) AS p2,
      f.p1 AND (k.doc_id IS NOT NULL) AND (l.doc_id IS NULL) AS p3,
      f.p1 AND (k.doc_id IS NOT NULL) AND (l.doc_id IS NULL)
           AND (s.doc_id IS NOT NULL) AS p4
    FROM f16 f
    LEFT JOIN fkeep k ON f.doc_id = k.doc_id
    LEFT JOIN flose l ON f.doc_id = l.doc_id
    LEFT JOIN fs s ON f.doc_id = s.doc_id) q
)
SELECT * FROM (
  SELECT '0_corpus' AS stage, n0 AS n_docs, CAST(0 AS BIGINT) AS n_removed FROM fagg
  UNION ALL SELECT '1_quality', n1, n0 - n1 FROM fagg
  UNION ALL SELECT '2_exact_dedup', n2, n1 - n2 FROM fagg
  UNION ALL SELECT '3_near_dedup', n3, n2 - n3 FROM fagg
  UNION ALL SELECT '4_sampled', n4, n3 - n4 FROM fagg) u
ORDER BY stage"""),
    // text BPE bound + ViT-style patch tokens share one budget; same
    // m5 mirrors MultimodalOps.mediaDedup over the UTF-8 payload: the
    // corpus is pure ASCII (checked), so char-based substr == byte chunks
    "m5_media_dedup" -> """
      WITH m AS (
        SELECT doc_id, text, md5(text) AS payload_md5,
               octet_length(CAST(text AS BLOB)) AS nb
        FROM documents
      ), grp AS (
        SELECT payload_md5, CAST(count(*) AS BIGINT) AS n_copies
        FROM m GROUP BY 1
      ), chs AS (
        SELECT doc_id, md5(substr(text, i * 64 + 1, 64)) AS ch
        FROM (SELECT doc_id, text,
                unnest(generate_series(0, CAST(ceil(nb / 64.0) AS INT) - 1)) AS i
              FROM m WHERE nb > 0) q
      ), shared AS (
        SELECT ch FROM (
          SELECT ch, count(DISTINCT doc_id) AS d FROM chs GROUP BY 1) x
        WHERE d >= 2
      ), per AS (
        SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
          CAST(sum(CASE WHEN s.ch IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
        FROM chs c LEFT JOIN shared s ON c.ch = s.ch GROUP BY 1
      )
      SELECT m.doc_id, m.payload_md5, g.n_copies,
        g.n_copies >= 2 AS is_exact_dup,
        coalesce(p.n_chunks, CAST(0 AS BIGINT)) AS n_chunks,
        coalesce(p.n_shared, CAST(0 AS BIGINT)) AS n_shared,
        CASE WHEN coalesce(p.n_chunks, 0) = 0 THEN 0e0
             ELSE CAST(p.n_shared AS DOUBLE) / p.n_chunks END AS shared_frac
      FROM m JOIN grp g ON m.payload_md5 = g.payload_md5
      LEFT JOIN per p ON m.doc_id = p.doc_id
      ORDER BY m.doc_id""",
    // 48-bit aHash (block-mean vs global-mean, cross-multiplied exact
    // ints) + d7-style bit-flip probe join at hamming <= 1
    "m6_phash_neardup" -> """
      WITH lw AS (
        SELECT doc_id,
               list_transform(string_split(text, ' '),
                 w -> CAST(length(w) AS BIGINT)) AS lens
        FROM documents
      ), st AS (
        SELECT doc_id, lens, CAST(len(lens) AS BIGINT) AS n,
               CAST(coalesce(list_sum(lens), 0) AS BIGINT) AS tot,
               CAST((len(lens) + 47) // 48 AS BIGINT) AS blk
        FROM lw
      ), ph AS (
        SELECT doc_id,
          CAST(list_sum(list_transform(generate_series(0, 47), b ->
            CASE WHEN CAST(coalesce(list_sum(list_transform(
                        generate_series(b * blk + 1, least((b + 1) * blk, n)),
                        i -> lens[CAST(i AS INT)])), 0) AS BIGINT) * n
                      > tot * greatest(least((b + 1) * blk, n) - b * blk, 0)
                 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
                 ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS phash
        FROM st
      ), pr AS (
        SELECT doc_id AS doc_a, phash AS ph_a,
               CASE WHEN j = 48 THEN phash
                    ELSE xor(phash, CAST(1 AS BIGINT) << CAST(j AS INT)) END AS probe
        FROM ph, (SELECT unnest(generate_series(0, 48)) AS j) tj
      )
      SELECT p.doc_a, r.doc_id AS doc_b, p.ph_a, r.phash AS ph_b,
             CAST(bit_count(xor(p.ph_a, r.phash)) AS INT) AS hamming
      FROM pr p JOIN ph r ON p.probe = r.phash AND p.doc_a < r.doc_id
      ORDER BY doc_a, doc_b""",
    // m6's scale-safe keeper view: keeper = least doc_id within
    // hamming <= 1 among ids <= own (self when no earlier neighbor).
    // The oracle states the semantics directly as the all-pairs left
    // join; the Spark side computes it multiplicity-collapsed over
    // distinct phash groups — same view by construction.
    "m8_phash_keepers" -> """
      WITH lw AS (
        SELECT doc_id,
               list_transform(string_split(text, ' '),
                 w -> CAST(length(w) AS BIGINT)) AS lens
        FROM documents
      ), st AS (
        SELECT doc_id, lens, CAST(len(lens) AS BIGINT) AS n,
               CAST(coalesce(list_sum(lens), 0) AS BIGINT) AS tot,
               CAST((len(lens) + 47) // 48 AS BIGINT) AS blk
        FROM lw
      ), ph AS (
        SELECT doc_id,
          CAST(list_sum(list_transform(generate_series(0, 47), b ->
            CASE WHEN CAST(coalesce(list_sum(list_transform(
                        generate_series(b * blk + 1, least((b + 1) * blk, n)),
                        i -> lens[CAST(i AS INT)])), 0) AS BIGINT) * n
                      > tot * greatest(least((b + 1) * blk, n) - b * blk, 0)
                 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
                 ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS phash
        FROM st
      )
      SELECT d.doc_id,
             coalesce(min(a.doc_id), d.doc_id) AS keeper,
             min(a.doc_id) IS NOT NULL AS is_dup
      FROM ph d LEFT JOIN ph a
        ON a.doc_id < d.doc_id AND bit_count(xor(a.phash, d.phash)) <= 1
      GROUP BY d.doc_id
      ORDER BY d.doc_id""",
    // content-defined chunking: boundary where the 3-token rolling hash
    // hits 0 mod 8; chunk identity = md5 of the chunk text
    "m7_cdc_chunks" -> s"""
      WITH tk AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      ), tok AS (
        SELECT doc_id, i AS pos, toks[CAST(i AS INT)] AS w
        FROM (SELECT doc_id, toks,
                unnest(generate_series(1, len(toks))) AS i FROM tk) q
      ), thx AS (
        SELECT doc_id, pos, w,
               (${graft.data.TextOps.hex13NumFragment("md5(w)")}) % 1048576 AS th
        FROM tok
      ), wb AS (
        SELECT doc_id, pos, w, th,
               lag(th, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
               lag(th, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
        FROM thx
      ), bf AS (
        SELECT doc_id, pos, w,
               CASE WHEN t2 IS NOT NULL AND (t2 * 961 + t1 * 31 + th) % 8 = 0
                    THEN 1 ELSE 0 END AS b
        FROM wb
      ), ci AS (
        SELECT doc_id, pos, w,
               CAST(coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS chunk_idx
        FROM bf
      ), chx AS (
        SELECT doc_id, chunk_idx, md5(string_agg(w, ' ' ORDER BY pos)) AS ch
        FROM ci GROUP BY doc_id, chunk_idx
      ), shx AS (
        SELECT ch FROM (
          SELECT ch, count(DISTINCT doc_id) AS d FROM chx GROUP BY 1) x
        WHERE d >= 2
      )
      SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(CASE WHEN s.ch IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
             CAST(sum(CASE WHEN s.ch IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS shared_frac
      FROM chx c LEFT JOIN shx s ON c.ch = s.ch
      GROUP BY c.doc_id ORDER BY c.doc_id""",
    // two-phase prefix-sum packing as x15
    "m4_pack_multimodal" -> """
      WITH costs AS (
        SELECT doc_id,
          CAST(list_sum(list_transform(string_split(text, ' '),
            w -> CAST(floor((length(w) + 3) / 4.0) AS BIGINT))) AS BIGINT) AS txt_tokens,
          (n_chars + 63) // 64 AS img_tokens
        FROM documents
      ), cums AS (
        SELECT doc_id, txt_tokens, img_tokens,
          txt_tokens + img_tokens AS cost,
          CAST(coalesce(sum(txt_tokens + img_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        FROM costs
      )
      SELECT doc_id, txt_tokens, img_tokens, cost,
        cum_before // 1024 AS batch_id,
        cum_before % 1024 AS batch_offset
      FROM cums ORDER BY doc_id""",
    "x15_pack_sequences" -> """
      WITH toks AS (
        SELECT doc_id,
          CAST(list_sum(list_transform(string_split(text, ' '),
            w -> CAST(floor((length(w) + 3) / 4.0) AS BIGINT))) AS BIGINT) AS n_tokens
        FROM documents
      ), cums AS (
        SELECT doc_id, n_tokens,
          CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        FROM toks
      )
      SELECT doc_id, n_tokens,
        cum_before // 512 AS seq_id,
        cum_before % 512 AS seq_offset,
        (cum_before + greatest(n_tokens, 1) - 1) // 512 - cum_before // 512 + 1 AS n_seqs_spanned
      FROM cums ORDER BY doc_id""",
    "x16_filter_audit" -> s"""
      SELECT doc_id, n_words, n_distinct, n_stop,
        n_words < 20 AS r_too_short,
        n_words > 88 AS r_too_long,
        n_stop = 0 AS r_no_stopwords,
        n_distinct * 100 < n_words * 35 AS r_repetitive,
        NOT (n_words < 20 OR n_words > 88 OR n_stop = 0
             OR n_distinct * 100 < n_words * 35) AS keep
      FROM (SELECT doc_id,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
              CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
              CAST(${cntSum(TextOps.StopwordsEn)} AS BIGINT) AS n_stop
            FROM documents) q
      ORDER BY doc_id""",
    "x17_mixture_temperature" -> """
      WITH toks AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(list_sum(list_transform(string_split(text, ' '),
            w -> CAST(floor((length(w) + 3) / 4.0) AS BIGINT)))) AS BIGINT) AS tokens
        FROM documents GROUP BY source
      ), wts AS (
        SELECT *, CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS w
        FROM toks
      ), tot AS (SELECT CAST(sum(w) AS BIGINT) AS w_total FROM wts)
      SELECT source, n_docs, tokens, w,
        CAST(w AS DOUBLE) / w_total AS p,
        CAST(w AS DOUBLE) / w_total * 10000000 / tokens AS epochs
      FROM wts, tot ORDER BY source""",
    // PQ-ADC: encode (vector, subspace) to nearest-of-16 codewords, scan
    // by the query's precomputed codeword-distance table inside the label
    // cell, exact-rerank the ADC top-10 (all-integer until the cosine)
    "s7_ann_pq" -> (vecProlog + """
, subsp AS (SELECT unnest(generate_series(0, 7)) AS s)
, vsubn AS (
  SELECT vec_id, label, s, sub,
         CAST(list_sum(list_transform(generate_series(1, 8),
           j -> sub[j] * sub[j])) AS BIGINT) AS sub_nn
  FROM (SELECT vec_id, label, s, qv[s*8+1 : s*8+8] AS sub FROM qn, subsp) q0
), cbx AS (
  SELECT vec_id AS c_id, s AS c_s, sub AS c_sub, sub_nn AS c_nn
  FROM vsubn WHERE vec_id < 16
), encd AS (
  SELECT v.vec_id, v.label, v.s, c.c_id,
         v.sub_nn - 2 * CAST(list_sum(list_transform(generate_series(1, 8),
           j -> v.sub[j] * c.c_sub[j])) AS BIGINT) + c.c_nn AS dist2
  FROM vsubn v JOIN cbx c ON v.s = c.c_s
), codesx AS (
  SELECT vec_id, label, s, c_id AS code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist2, c_id) AS rn
    FROM encd) q WHERE rn = 1
), qdx AS (
  SELECT vec_id AS query_id, label AS q_label, s, c_id AS code, dist2 AS qdist2
  FROM encd WHERE vec_id % 50 = 0
), adc AS (
  SELECT q.query_id, c.vec_id, CAST(sum(q.qdist2) AS BIGINT) AS adc_d2
  FROM codesx c JOIN qdx q
    ON c.s = q.s AND c.code = q.code AND c.label = q.q_label
       AND c.vec_id <> q.query_id
  GROUP BY 1, 2
), cand AS (
  SELECT query_id, vec_id, adc_d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_d2, vec_id) AS crn
    FROM adc) q WHERE crn <= 10
), rr AS (
  SELECT c.query_id, c.vec_id AS neighbor_id, c.adc_d2,
         CAST(list_sum(list_transform(generate_series(1, len(qq.qv)),
           d -> qq.qv[d] * nb.qv[d])) AS BIGINT) AS dot,
         qq.nn AS qnn, nb.nn AS nnn
  FROM cand c JOIN qn qq ON qq.vec_id = c.query_id
              JOIN qn nb ON nb.vec_id = c.vec_id
), scored7 AS (
  SELECT query_id, neighbor_id, adc_d2, dot,
         CAST(dot AS DOUBLE) / sqrt(CAST(qnn AS DOUBLE) * CAST(nnn AS DOUBLE)) AS cos
  FROM rr
), ranked7 AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rnk
  FROM scored7
)
SELECT query_id, neighbor_id, rnk, adc_d2, dot, cos FROM ranked7
WHERE rnk <= 5 ORDER BY query_id, rnk"""),
    "s6_ann_ivf_trained" -> (vecProlog + s"""
, c6 AS (
  SELECT vec_id AS c_id, qv, nn AS c_nn FROM qn WHERE vec_id < 4
), a6p AS (
  SELECT v.vec_id, v.qv, v.nn, c.c_id,
         v.nn - 2 * ${pairDot("v", "c")} + c.c_nn AS dist2
  FROM qn v, c6 c
), a6 AS (
  SELECT vec_id, qv, nn, c_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist2, c_id) AS rn
    FROM a6p) q WHERE rn = 1
), p6 AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.cell,
         ${pairDot("a", "b")} AS dot, a.nn AS na, b.nn AS nb
  FROM a6 a JOIN a6 b
    ON a.vec_id % 50 = 0 AND a.cell = b.cell AND b.vec_id <> a.vec_id
), s6 AS (
  SELECT query_id, neighbor_id, cell, dot,
         CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cos
  FROM p6
), r6 AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rnk
  FROM s6
)
SELECT query_id, neighbor_id, rnk, dot, cos, cell FROM r6
WHERE rnk <= 3 ORDER BY query_id, rnk"""),
    // multi-probe IVF: data-side assignment is rn=1 (each vector lives in
    // exactly one cell); the QUERY side keeps its nProbe nearest cells, so
    // candidates span several cells but each (query, neighbor) pair occurs
    // once — mirrors VectorOps.annIvfMultiprobe exactly (same integer
    // algebra, same (dist2, c_id) probe order, same (cos DESC, vec_id)
    // rank ties)
    "s8_ann_ivf_multiprobe" -> (vecProlog + s"""
, c8m AS (
  SELECT vec_id AS c_id, qv, nn AS c_nn FROM qn WHERE vec_id < 4
), a8mp AS (
  SELECT v.vec_id, v.qv, v.nn, c.c_id,
         v.nn - 2 * ${pairDot("v", "c")} + c.c_nn AS dist2,
         row_number() OVER (PARTITION BY v.vec_id ORDER BY
           v.nn - 2 * ${pairDot("v", "c")} + c.c_nn, c.c_id) AS rn
  FROM qn v, c8m c
), a8m AS (
  SELECT vec_id, qv, nn, c_id AS cell FROM a8mp WHERE rn = 1
), q8m AS (
  SELECT vec_id AS query_id, qv, nn, c_id AS cell
  FROM a8mp WHERE vec_id % 50 = 0 AND rn <= 2
), p8m AS (
  SELECT q.query_id, b.vec_id AS neighbor_id, b.cell,
         ${pairDot("q", "b")} AS dot, q.nn AS na, b.nn AS nb
  FROM q8m q JOIN a8m b
    ON q.cell = b.cell AND b.vec_id <> q.query_id
), s8m AS (
  SELECT query_id, neighbor_id, cell, dot,
         CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cos
  FROM p8m
), r8m AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rnk
  FROM s8m
)
SELECT query_id, neighbor_id, rnk, dot, cos, cell FROM r8m
WHERE rnk <= 3 ORDER BY query_id, rnk"""),
    // filtered ANN: the s8 multiprobe chain with a PER-QUERY metadata
    // constraint — candidates must share the query's document language
    // (vec_id = doc_id metadata join); same integer algebra, same probe
    // and rank tie orders as s8
    "s14_ann_filtered" -> (vecProlog + s"""
, c14 AS (
  SELECT vec_id AS c_id, qv, nn AS c_nn FROM qn WHERE vec_id < 4
), a14p AS (
  SELECT v.vec_id, v.qv, v.nn, c.c_id,
         row_number() OVER (PARTITION BY v.vec_id ORDER BY
           v.nn - 2 * ${pairDot("v", "c")} + c.c_nn, c.c_id) AS rn
  FROM qn v, c14 c
), a14 AS (
  SELECT p.vec_id, p.qv, p.nn, p.c_id AS cell, d.lang
  FROM a14p p JOIN documents d ON p.vec_id = d.doc_id WHERE p.rn = 1
), q14 AS (
  SELECT p.vec_id AS query_id, p.qv, p.nn, p.c_id AS cell, d.lang AS q_lang
  FROM a14p p JOIN documents d ON p.vec_id = d.doc_id
  WHERE p.vec_id % 50 = 0 AND p.rn <= 2
), p14 AS (
  SELECT q.query_id, q.q_lang, b.vec_id AS neighbor_id, b.cell,
         ${pairDot("q", "b")} AS dot, q.nn AS na, b.nn AS nb
  FROM q14 q JOIN a14 b
    ON q.cell = b.cell AND q.q_lang = b.lang AND b.vec_id <> q.query_id
), s14 AS (
  SELECT query_id, q_lang, neighbor_id, cell, dot,
         CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cos
  FROM p14
), r14 AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rnk
  FROM s14
)
SELECT query_id, q_lang, neighbor_id, rnk, dot, cos, cell FROM r14
WHERE rnk <= 3 ORDER BY query_id, rnk"""),
    // hard negatives: the s8 chain with the probe window SHIFTED one rank
    // (rn 2..3) — rank 1 IS the anchor's assignment cell, so candidates
    // are exactly the out-of-cluster vectors and the anchor can never
    // meet itself
    "s15_hard_negatives" -> (vecProlog + s"""
, c15 AS (
  SELECT vec_id AS c_id, qv, nn AS c_nn FROM qn WHERE vec_id < 4
), a15p AS (
  SELECT v.vec_id, v.qv, v.nn, c.c_id,
         row_number() OVER (PARTITION BY v.vec_id ORDER BY
           v.nn - 2 * ${pairDot("v", "c")} + c.c_nn, c.c_id) AS rn
  FROM qn v, c15 c
), a15 AS (
  SELECT vec_id, qv, nn, c_id AS cell FROM a15p WHERE rn = 1
), q15 AS (
  SELECT vec_id AS query_id, qv, nn, c_id AS cell
  FROM a15p WHERE vec_id % 50 = 0 AND rn BETWEEN 2 AND 3
), qc15 AS (
  SELECT vec_id AS query_id, c_id AS q_cell FROM a15p
  WHERE vec_id % 50 = 0 AND rn = 1
), p15 AS (
  SELECT q.query_id, b.vec_id AS neighbor_id, b.cell,
         ${pairDot("q", "b")} AS dot, q.nn AS na, b.nn AS nb
  FROM q15 q JOIN a15 b ON q.cell = b.cell
), s15 AS (
  SELECT query_id, neighbor_id, cell, dot,
         CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cos
  FROM p15
), r15 AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rnk
  FROM s15
)
SELECT r.query_id, qc.q_cell, r.neighbor_id, r.rnk, r.dot, r.cos, r.cell
FROM r15 r JOIN qc15 qc ON r.query_id = qc.query_id
WHERE r.rnk <= 3 ORDER BY r.query_id, r.rnk"""),
    // range search: the s8 probe chain with a cosine threshold instead
    // of a rank — no window anywhere
    "s16_ann_range" -> (vecProlog + s"""
, c16 AS (
  SELECT vec_id AS c_id, qv, nn AS c_nn FROM qn WHERE vec_id < 4
), a16p AS (
  SELECT v.vec_id, v.qv, v.nn, c.c_id,
         row_number() OVER (PARTITION BY v.vec_id ORDER BY
           v.nn - 2 * ${pairDot("v", "c")} + c.c_nn, c.c_id) AS rn
  FROM qn v, c16 c
), a16 AS (
  SELECT vec_id, qv, nn, c_id AS cell FROM a16p WHERE rn = 1
), q16 AS (
  SELECT vec_id AS query_id, qv, nn, c_id AS cell
  FROM a16p WHERE vec_id % 50 = 0 AND rn <= 2
), p16 AS (
  SELECT q.query_id, b.vec_id AS neighbor_id, b.cell,
         ${pairDot("q", "b")} AS dot, q.nn AS na, b.nn AS nb
  FROM q16 q JOIN a16 b ON q.cell = b.cell AND b.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, dot,
       CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cos,
       cell
FROM p16
WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) >= CAST(0.4 AS DOUBLE)
ORDER BY query_id, neighbor_id"""),
    "s5_ann_int8" -> (vecProlog + s"""
, e8r AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx0
  FROM embeddings
), e8 AS (
  SELECT vec_id, embedding,
         CASE WHEN mx0 <= 0 THEN CAST(error('annInt8: zero-magnitude embedding') AS DOUBLE)
              ELSE mx0 END AS mx
  FROM e8r
), v8 AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) / mx * 127e0 + 0.5e0) AS BIGINT)) AS q8
  FROM e8
), n8 AS (
  SELECT vec_id, q8,
         CAST(list_sum(list_transform(generate_series(1, len(q8)), d -> q8[d] * q8[d])) AS BIGINT) AS nn8
  FROM v8
), p8 AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(generate_series(1, len(a.q8)), d -> a.q8[d] * b.q8[d])) AS BIGINT) AS dot8,
         a.nn8 AS na, b.nn8 AS nb
  FROM n8 a JOIN n8 b ON a.vec_id % 50 = 0 AND b.vec_id <> a.vec_id
), s8 AS (
  SELECT query_id, neighbor_id, dot8,
         CAST(dot8 AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cos8
  FROM p8
), r8 AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos8 DESC, neighbor_id) AS INT) AS rnk
  FROM s8
)
SELECT t.query_id, t.neighbor_id, t.rnk, t.dot8, t.cos8,
       CAST(${pairDot("qa", "qb")} AS DOUBLE)
         / sqrt(CAST(qa.nn AS DOUBLE) * CAST(qb.nn AS DOUBLE)) AS cos_exact
FROM r8 t
JOIN qn qa ON t.query_id = qa.vec_id
JOIN qn qb ON t.neighbor_id = qb.vec_id
WHERE t.rnk <= 5 ORDER BY t.query_id, t.rnk"""),
    "s1_ann_brute" -> (vecProlog +
      topK("a.vec_id % 50 = 0 AND b.vec_id <> a.vec_id", 5)),
    "s2_ann_ivf" -> (vecProlog +
      topK("a.vec_id % 50 = 0 AND a.label = b.label AND b.vec_id <> a.vec_id", 3)),
    "s3_ann_lsh" -> (vecProlog + s"""
, qnb AS (SELECT q.*, bk.bucket FROM qn q JOIN buckets bk ON q.vec_id = bk.vec_id)
, pairsx AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.bucket,
         ${pairDot("a", "b")} AS dot, a.nn AS na, b.nn AS nb
  FROM qnb a JOIN qnb b
    ON a.vec_id % 50 = 0 AND a.bucket = b.bucket AND b.vec_id <> a.vec_id
), scored AS (
  SELECT query_id, neighbor_id, bucket, dot,
         CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cos
  FROM pairsx
), ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, rnk, dot, cos, bucket FROM ranked
WHERE rnk <= 3 ORDER BY query_id, rnk"""),
    "d7_simhash_near" -> (docProlog + """
      , sprobes AS (
        SELECT doc_id AS doc_a, simhash AS sig_a,
               CASE WHEN j = 16 THEN simhash
                    ELSE xor(simhash, (CAST(1 AS BIGINT) << j)) END AS probe
        FROM (SELECT doc_id, simhash, unnest(generate_series(0, 16)) AS j FROM simh) q
      )
      SELECT p.doc_a, s.doc_id AS doc_b, p.sig_a, s.simhash AS sig_b,
             CAST(bit_count(xor(p.sig_a, s.simhash)) AS INT) AS hamming
      FROM sprobes p JOIN simh s ON p.probe = s.simhash AND p.doc_a < s.doc_id
      ORDER BY doc_a, doc_b"""),
    // lexical + semantic near-dup signals full-outer joined by pair; the
    // shared WITH chain carries both prologues (doc CTEs, then vec CTEs)
    "d8_dedup_agreement" -> (docProlog + vecProlog.replaceFirst("WITH", ",") + s"""
, d8e AS (
  SELECT q.*, bk.bucket % 16 AS dbucket
  FROM qn q JOIN buckets bk ON q.vec_id = bk.vec_id
), d8p AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
         ${pairDot("a", "b")} AS dot, a.nn AS na, b.nn AS nb
  FROM d8e a JOIN d8e b
    ON a.label = b.label AND a.dbucket = b.dbucket AND a.vec_id < b.vec_id
), d8s AS (
  SELECT doc_a, doc_b,
         CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cos
  FROM d8p
), d8emb AS (
  SELECT * FROM d8s WHERE cos >= 0.35
), d8text AS (
  SELECT c.doc_a, c.doc_b, j.jac
  FROM lsh_cands c JOIN jacp j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
  WHERE j.jac >= 0.5
)
SELECT coalesce(t.doc_a, e.doc_a) AS doc_a, coalesce(t.doc_b, e.doc_b) AS doc_b,
       t.jac, e.cos,
       t.jac IS NOT NULL AS in_text, e.cos IS NOT NULL AS in_embedding
FROM d8text t FULL OUTER JOIN d8emb e
  ON t.doc_a = e.doc_a AND t.doc_b = e.doc_b
ORDER BY doc_a, doc_b"""),
    "x7_repetition" -> (docProlog + """
      , wcnt AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
      ), wdoc AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
               CAST(count(*) AS BIGINT) AS n_distinct_words,
               CAST(max(c) AS BIGINT) AS top_word_n
        FROM wcnt GROUP BY 1
      ), tcnt AS (
        SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS t FROM sh0) q
        GROUP BY 1, 2
      ), tdoc AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tris,
               CAST(count(*) AS BIGINT) AS n_distinct_tris
        FROM tcnt GROUP BY 1
      )
      SELECT w.doc_id, w.n_words, w.n_distinct_words, w.top_word_n,
        CAST(w.n_words - w.n_distinct_words AS DOUBLE) / w.n_words AS dup_word_frac,
        CAST(w.top_word_n AS DOUBLE) / w.n_words AS top_word_frac,
        CAST(t.n_tris - t.n_distinct_tris AS DOUBLE) / t.n_tris AS dup_trigram_frac
      FROM wdoc w LEFT JOIN tdoc t ON w.doc_id = t.doc_id
      ORDER BY w.doc_id"""),
    "x8_length_quantiles" -> s"""
      WITH lens AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               ${TextOps.LangCase} AS lang_pred
        FROM (SELECT doc_id, text,
                CAST(${cntSum(TextOps.StopwordsEn)} AS BIGINT) AS en_n,
                CAST(${cntSum(TextOps.StopwordsDe)} AS BIGINT) AS de_n,
                CAST(${cntSum(TextOps.StopwordsEs)} AS BIGINT) AS es_n
              FROM documents) q
      ), hist AS (
        SELECT lang_pred, n_words, CAST(count(*) AS BIGINT) AS c
        FROM lens GROUP BY 1, 2
      ), cum AS (
        SELECT lang_pred, n_words, c,
          CAST(sum(c) OVER (PARTITION BY lang_pred ORDER BY n_words
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
          CAST(sum(c) OVER (PARTITION BY lang_pred) AS BIGINT) AS n
        FROM hist
      ), p50 AS (
        SELECT lang_pred, min(n_words) AS p50_words FROM cum
        WHERE cum >= CAST(floor((n + 1) / 2.0) AS BIGINT) GROUP BY 1
      ), p90 AS (
        SELECT lang_pred, min(n_words) AS p90_words FROM cum
        WHERE cum >= CAST(floor((9 * n + 9) / 10.0) AS BIGINT) GROUP BY 1
      ), nd AS (
        SELECT lang_pred, max(n) AS n_docs FROM cum GROUP BY 1
      )
      SELECT p50.lang_pred, nd.n_docs, p50.p50_words, p90.p90_words
      FROM p50 JOIN p90 USING (lang_pred) JOIN nd USING (lang_pred)
      ORDER BY lang_pred""",
    "x9_distinct_kmv" -> (docProlog + s"""
      , xhashes AS (
        SELECT DISTINCT md5(sh) AS h FROM shingles
      ), xkmin AS (
        SELECT h FROM xhashes ORDER BY h LIMIT 64
      ), xkth AS (
        SELECT max(h) AS kth_hex, CAST(count(*) AS BIGINT) AS k_actual FROM xkmin
      ), xex AS (
        SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM xhashes
      )
      SELECT k_actual, kth_hex, ${TextOps.hex13NumFragment("kth_hex")} AS kth_num,
             exact_distinct,
             CAST(k_actual - 1 AS DOUBLE) * CAST(4503599627370496 AS DOUBLE) / kth_num AS est_distinct
      FROM xkth, xex"""),
    "x10_distinct_by_lang" -> (docProlog + s"""
      , xlang AS (
        SELECT doc_id, ${TextOps.LangCase} AS lang_pred
        FROM (SELECT doc_id,
                CAST(${cntSum(TextOps.StopwordsEn)} AS BIGINT) AS en_n,
                CAST(${cntSum(TextOps.StopwordsDe)} AS BIGINT) AS de_n,
                CAST(${cntSum(TextOps.StopwordsEs)} AS BIGINT) AS es_n
              FROM documents) q
      ), lhashes AS (
        SELECT DISTINCT l.lang_pred, md5(s.sh) AS h
        FROM shingles s JOIN xlang l USING (doc_id)
      ), lranked AS (
        SELECT lang_pred, h,
               row_number() OVER (PARTITION BY lang_pred ORDER BY h) AS rn
        FROM lhashes
      ), lkth AS (
        SELECT lang_pred, CAST(count(*) AS INT) AS k_actual, max(h) AS kth_hex
        FROM lranked WHERE rn <= 64 GROUP BY 1
      )
      SELECT lang_pred, k_actual, kth_hex,
             ${TextOps.hex13NumFragment("kth_hex")} AS kth_num,
             CAST(k_actual - 1 AS DOUBLE) * CAST(4503599627370496 AS DOUBLE) / kth_num AS est_distinct
      FROM lkth ORDER BY lang_pred"""),
    "x11_sample_stratified" -> s"""
      WITH slang AS (
        SELECT doc_id, ${TextOps.LangCase} AS lang_pred,
               md5(CAST(doc_id AS STRING)) AS h
        FROM (SELECT doc_id,
                CAST(${cntSum(TextOps.StopwordsEn)} AS BIGINT) AS en_n,
                CAST(${cntSum(TextOps.StopwordsDe)} AS BIGINT) AS de_n,
                CAST(${cntSum(TextOps.StopwordsEs)} AS BIGINT) AS es_n
              FROM documents) q
      ), shv AS (
        SELECT doc_id, lang_pred, ${TextOps.hex13NumFragment("h")} AS hv FROM slang
      )
      SELECT doc_id, lang_pred FROM shv
      WHERE (lang_pred = 'en' AND hv * 10 < CAST(4503599627370496 AS BIGINT))
         OR (lang_pred <> 'en' AND hv * 2 < CAST(4503599627370496 AS BIGINT))
      ORDER BY doc_id""",
    "x12_decontaminate" -> (docProlog + """
      , dbench AS (
        SELECT DISTINCT sh FROM shingles WHERE doc_id < 10
      ), drest AS (
        SELECT doc_id, sh FROM shingles WHERE doc_id >= 10
      ), dover AS (
        SELECT r.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
        FROM drest r JOIN dbench b ON r.sh = b.sh GROUP BY 1
      ), dsz AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM drest GROUP BY 1
      )
      SELECT s.doc_id, s.n_sh, CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
             CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / s.n_sh AS overlap_frac,
             coalesce(o.n_overlap, 0) > 0 AS is_contaminated
      FROM dsz s LEFT JOIN dover o ON s.doc_id = o.doc_id
      ORDER BY s.doc_id"""),
    // x52: the Bloom filter replayed bit-for-bit — positions are
    // hex13(md5(j ':' sh)) mod m in both engines; the bench side is the
    // distinct position set, a shingle bloom-hits iff all kHash of its
    // positions are set, and the exact x12 verdict rides along so
    // false_positive is oracle-checked too
    "x52_bloom_decontaminate" -> (docProlog + s"""
      , bpos AS (
        SELECT doc_id, sh, j,
               (${TextOps.hex13NumFragment("md5(CAST(j AS STRING) || ':' || sh)")}) % 4096 AS p
        FROM (SELECT doc_id, sh, unnest(generate_series(0, 2)) AS j FROM shingles) q
      ), bbits AS (
        SELECT DISTINCT p AS bp FROM bpos WHERE doc_id < 10
      ), bsh AS (
        SELECT r.doc_id, r.sh,
               CAST(sum(CASE WHEN b.bp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_set
        FROM bpos r LEFT JOIN bbits b ON r.p = b.bp
        WHERE r.doc_id >= 10 GROUP BY 1, 2
      ), bdoc AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh,
               CAST(sum(CASE WHEN n_set = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits
        FROM bsh GROUP BY 1
      ), xbench AS (
        SELECT DISTINCT sh FROM shingles WHERE doc_id < 10
      ), xover AS (
        SELECT r.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
        FROM shingles r JOIN xbench b ON r.sh = b.sh
        WHERE r.doc_id >= 10 GROUP BY 1
      )
      SELECT d.doc_id, d.n_sh, d.n_bloom_hits,
             d.n_bloom_hits > 0 AS bloom_contaminated,
             coalesce(o.n_overlap, 0) > 0 AS exact_contaminated,
             (d.n_bloom_hits > 0 AND NOT coalesce(o.n_overlap, 0) > 0) AS false_positive
      FROM bdoc d LEFT JOIN xover o USING (doc_id)
      ORDER BY d.doc_id"""),
    "x13_langid_confusion" -> s"""
      SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n,
             lang = lang_pred AS is_correct
      FROM (SELECT lang, ${TextOps.LangCase} AS lang_pred
            FROM (SELECT lang,
                    CAST(${cntSum(TextOps.StopwordsEn)} AS BIGINT) AS en_n,
                    CAST(${cntSum(TextOps.StopwordsDe)} AS BIGINT) AS de_n,
                    CAST(${cntSum(TextOps.StopwordsEs)} AS BIGINT) AS es_n
                  FROM documents) q) p
      GROUP BY lang, lang_pred ORDER BY lang, lang_pred""",
    "x14_source_mix" -> """
      SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_words
      FROM documents GROUP BY source, lang ORDER BY source, lang""",
    "s4_kmeans_step" -> (vecProlog + s"""
      , kcent AS (
        SELECT vec_id AS c_id, qv, nn AS c_nn FROM qn WHERE vec_id < 4
      ), kpairs AS (
        SELECT v.vec_id, v.qv AS vqv, c.c_id,
               v.nn - 2 * ${pairDot("v", "c")} + c.c_nn AS dist2
        FROM qn v, kcent c
      ), kassigned AS (
        SELECT vec_id, vqv, c_id FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist2, c_id) AS rn
          FROM kpairs) q WHERE rn = 1
      ), kdims AS (
        SELECT c_id, CAST(d - 1 AS INT) AS d, vqv[d] AS q
        FROM (SELECT c_id, vqv, unnest(generate_series(1, len(vqv))) AS d FROM kassigned) q2
      )
      SELECT c_id, d, CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) / count(*) / 1048576.0 AS mean
      FROM kdims GROUP BY 1, 2 ORDER BY 1, 2"""),
    // maxIter matches kmeansConverged's default; measured convergence is
    // round 14 (sf0.001) / 18 (sf0.01), so the cap only binds at scales
    // where BOTH sides cap identically
    "s4b_kmeans_converged" -> kmeansConvergedSql(k = 4, maxIter = 24, dims = 64),
    "s17_ivf_retrain" -> ivfRetrainSql(k = 4, maxIter = 24, dims = 64),
    // k = 4 below is the GATE-SCALE FLOOR of the Spark side's auto-derived
    // cell count (VectorOps.autoCells: max(4, n/target) = 4 at both 500-
    // and 2000-vector gate corpora), pinned so the static SQL stays
    // equivalent while the trained-index defaults scale k ∝ n past the gate
    "d12_semdedup" -> semDedupSql(k = 4, maxIter = 24, dims = 64, eps = 0.35),
    // base slice is the SAME 250 vectors at both gate SFs, so the
    // base-trained fixpoint (and with it the whole increment chain) is
    // SF-invariant on the training side; k = 4 pins autoCells' floor on
    // the 250-vector base
    "d14_semdedup_incremental" -> semDedupIncrementalSql(
      k = 4, maxIter = 24, dims = 64, eps = 0.35, baseMaxId = 250),
    "d13_pagerank_neardup" -> pageRankSql(iters = 10),
    "s9_ann_ivfpq" -> annIvfPqSql(k = 4, nCodes = 16, m = 8, subDim = 8,
      everyNth = 50, nProbe = 2, adcTopK = 10, topK = 5, dims = 64),
    "s10_ivf_drift" -> ivfDriftSql(k = 4, baseMaxId = 250, dims = 64),
    "s11_ann_imi" -> annImiSql(kHalf = 2, everyNth = 50, nProbe = 2,
      topK = 3, dims = 64),
    "s12_ann_recall" -> annRecallSql(kHalf = 2, everyNth = 50, nProbe = 2,
      topK = 3, dims = 64),
    // s13: s7's encode chain (subspace slice → nearest-of-16 codeword),
    // rolled up per (subspace, code) with the full codebook grid LEFT-
    // joined back so dead codewords surface as zero rows
    "s13_pq_health" -> (vecProlog + """
, subsp AS (SELECT unnest(generate_series(0, 7)) AS s)
, vsubn AS (
  SELECT vec_id, s, sub,
         CAST(list_sum(list_transform(generate_series(1, 8),
           j -> sub[j] * sub[j])) AS BIGINT) AS sub_nn
  FROM (SELECT vec_id, s, qv[s*8+1 : s*8+8] AS sub FROM qn, subsp) q0
), cbx AS (
  SELECT vec_id AS c_id, s AS c_s, sub AS c_sub, sub_nn AS c_nn
  FROM vsubn WHERE vec_id < 16
), encd AS (
  SELECT v.vec_id, v.s, c.c_id,
         v.sub_nn - 2 * CAST(list_sum(list_transform(generate_series(1, 8),
           j -> v.sub[j] * c.c_sub[j])) AS BIGINT) + c.c_nn AS dist2
  FROM vsubn v JOIN cbx c ON v.s = c.c_s
), codesd AS (
  SELECT s, c_id AS code, dist2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist2, c_id) AS rn
    FROM encd) q WHERE rn = 1
), occ AS (
  SELECT s, code, CAST(count(*) AS BIGINT) AS n_assigned,
         CAST(sum(dist2) AS BIGINT) AS sum_d2
  FROM codesd GROUP BY 1, 2
), totx AS (SELECT s, CAST(sum(n_assigned) AS BIGINT) AS n_total FROM occ GROUP BY 1)
SELECT g.s, g.code,
  CAST(coalesce(o.n_assigned, 0) AS BIGINT) AS n_assigned,
  CAST(coalesce(o.sum_d2, 0) AS BIGINT) AS sum_d2,
  CAST(coalesce(o.n_assigned, 0) AS DOUBLE) / t.n_total AS share,
  CASE WHEN coalesce(o.n_assigned, 0) = 0 THEN 0e0
       ELSE CAST(o.sum_d2 AS DOUBLE) / o.n_assigned END AS mean_d2,
  coalesce(o.n_assigned, 0) = 0 AS dead
FROM (SELECT c_s AS s, c_id AS code FROM cbx) g
LEFT JOIN occ o ON g.s = o.s AND g.code = o.code
JOIN totx t ON g.s = t.s
ORDER BY g.s, g.code"""),
    // x41: x17's integer mixture weights → per-source integer token
    // target (9/4 × the corpus) → full epochs by integer division, the
    // remainder filled greedily in the x35 seeded order
    "x41_mixture_expand" -> s"""
      WITH tkx AS (
        SELECT d.doc_id, d.source,
               CAST(list_sum(list_transform(string_split(d.text, ' '),
                 w -> CAST(floor((length(w) + 3) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_tokens,
               ${TextOps.hex13NumFragment("md5('graft:' || CAST(d.doc_id AS STRING))")} AS skey
        FROM documents d
      ), srcx AS (
        SELECT source, CAST(sum(bpe_tokens) AS BIGINT) AS tokens_s,
               CAST(floor(sqrt(CAST(sum(bpe_tokens) AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS w
        FROM tkx GROUP BY source
      ), totx AS (
        SELECT CAST(sum(w) AS BIGINT) AS w_total,
               CAST(sum(tokens_s) AS BIGINT) AS t_all
        FROM srcx
      ), planx AS (
        -- w·T exceeds 2^63 near ~2.6e10 total tokens (w ~ 1000·sqrt(t_s)),
        -- so the product runs in HUGEINT exactly like the Spark side's
        -- DECIMAL(38,0) chain; target_s <= 9/4·T collapses back to BIGINT
        SELECT source,
               CAST((CAST(w AS HUGEINT) * CAST(t_all * 9 // 4 AS HUGEINT)
                     // CAST(w_total AS HUGEINT)) // tokens_s AS BIGINT) AS full_ep,
               CAST((CAST(w AS HUGEINT) * CAST(t_all * 9 // 4 AS HUGEINT)
                     // CAST(w_total AS HUGEINT)) % tokens_s AS BIGINT) AS rem_s
        FROM srcx, totx
      ), fullx AS (
        SELECT doc_id, source,
               unnest(generate_series(0, full_ep - 1)) AS epoch, bpe_tokens
        FROM tkx JOIN planx USING (source)
      ), cum AS (
        SELECT doc_id, source, bpe_tokens,
               CAST(coalesce(sum(bpe_tokens) OVER (PARTITION BY source
                 ORDER BY skey, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        FROM tkx
      )
      SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch, bpe_tokens FROM fullx
      UNION ALL
      SELECT c.doc_id, c.source, p.full_ep AS epoch, c.bpe_tokens
      FROM cum c JOIN planx p USING (source)
      WHERE c.cum_before < p.rem_s
      ORDER BY doc_id, epoch""",
    // x43: d6's recursive closure elects one keeper per cluster (min
    // doc_id); the x17 weight formula runs over raw and kept tokens side
    // by side — all integer-quantized, so the doubles agree bitwise
    "x43_dedup_mixture" -> (docProlog.replaceFirst("WITH", "WITH RECURSIVE") + """
      , e0 AS (
        SELECT c.doc_a AS a, c.doc_b AS b
        FROM lsh_cands c JOIN jacp j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
        WHERE j.jac >= 0.5
      ), e AS (
        SELECT a, b FROM e0 UNION SELECT b, a FROM e0
      ), walk(n, m) AS (
        SELECT a, b FROM e
        UNION
        SELECT w.n, e.b FROM walk w JOIN e ON w.m = e.a
      ), comp AS (
        SELECT n AS doc_id, least(n, min(m)) AS cluster_id FROM walk GROUP BY n
      ), lab AS (
        SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
      ), keep AS (
        SELECT CAST(min(doc_id) AS BIGINT) AS doc_id FROM lab GROUP BY cluster_id
      ), tk AS (
        SELECT d.doc_id, d.source,
               CAST(list_sum(list_transform(string_split(d.text, ' '),
                 w -> CAST(floor((length(w) + 3) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_tokens
        FROM documents d
      ), rawx AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_raw,
               CAST(sum(bpe_tokens) AS BIGINT) AS tokens_raw
        FROM tk GROUP BY source
      ), keptx AS (
        SELECT t.source, CAST(count(*) AS BIGINT) AS n_kept,
               CAST(sum(t.bpe_tokens) AS BIGINT) AS tokens_kept
        FROM tk t JOIN keep k ON t.doc_id = k.doc_id GROUP BY t.source
      ), jx AS (
        SELECT r.source, r.n_raw, r.tokens_raw,
               CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
               CAST(coalesce(k.tokens_kept, 0) AS BIGINT) AS tokens_kept
        FROM rawx r LEFT JOIN keptx k ON r.source = k.source
      ), wx AS (
        SELECT *,
               CAST(floor(sqrt(CAST(tokens_raw AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS w_raw,
               CAST(floor(sqrt(CAST(tokens_kept AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS w_kept
        FROM jx
      ), totx AS (
        SELECT CAST(sum(w_raw) AS BIGINT) AS wt_raw,
               CAST(sum(w_kept) AS BIGINT) AS wt_kept
        FROM wx
      )
      SELECT source, n_raw, tokens_raw, n_kept, tokens_kept,
        CAST(tokens_raw - tokens_kept AS DOUBLE) / tokens_raw AS dup_frac,
        CAST(w_raw AS DOUBLE) / wt_raw AS p_raw,
        CAST(w_kept AS DOUBLE) / wt_kept AS p_kept,
        CAST(w_kept AS DOUBLE) / wt_kept - CAST(w_raw AS DOUBLE) / wt_raw AS p_shift
      FROM wx, totx ORDER BY source"""),
    // x42: d3's verified pair set labeled with both ends' sources,
    // rolled up per canonical (source, source) cell
    "x42_cross_source_dups" -> (docProlog + """
      , dup AS (
        SELECT c.doc_a, c.doc_b
        FROM lsh_cands c JOIN jacp j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
        WHERE j.jac >= 0.5
      ), labx AS (
        SELECT p.doc_a, p.doc_b,
               least(da.source, db.source) AS src_a,
               greatest(da.source, db.source) AS src_b
        FROM dup p JOIN documents da ON p.doc_a = da.doc_id
                   JOIN documents db ON p.doc_b = db.doc_id
      ), px AS (
        SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs
        FROM labx GROUP BY 1, 2
      ), ex AS (
        SELECT src_a, src_b, doc_a AS d FROM labx
        UNION ALL
        SELECT src_a, src_b, doc_b AS d FROM labx
      ), dx AS (
        SELECT src_a, src_b, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
        FROM ex GROUP BY 1, 2
      )
      SELECT p.src_a, p.src_b, p.n_pairs, dd.n_docs,
             p.src_a <> p.src_b AS is_cross
      FROM px p JOIN dx dd USING (src_a, src_b)
      ORDER BY src_a, src_b"""),
    "x36_phrase_search" -> phraseSearchSql(TextOps.PhraseQueries),
    "x37_perceptron_filter" -> perceptronSql(buckets = 64, rounds = 16),
    // x45 wraps the full unrolled x37 chain as a subquery and rolls the
    // joint rule/model verdicts up per source
    "x45_filter_agreement" -> s"""
      SELECT d.source, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN p.y > 0 AND p.pred THEN 1 ELSE 0 END) AS BIGINT) AS n_both_keep,
        CAST(sum(CASE WHEN p.y > 0 AND NOT p.pred THEN 1 ELSE 0 END) AS BIGINT) AS n_rule_only,
        CAST(sum(CASE WHEN p.y < 0 AND p.pred THEN 1 ELSE 0 END) AS BIGINT) AS n_model_only,
        CAST(sum(CASE WHEN p.y < 0 AND NOT p.pred THEN 1 ELSE 0 END) AS BIGINT) AS n_both_drop,
        CAST(sum(CASE WHEN (p.y > 0) = p.pred THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS agree_frac
      FROM (${perceptronSql(buckets = 64, rounds = 16)}) p
      JOIN documents d ON p.doc_id = d.doc_id
      GROUP BY d.source ORDER BY d.source""",
    "x38_data_card" -> s"""
      WITH pd AS (
        SELECT doc_id, source, lang, n_words,
          NOT (n_words < 20 OR n_words > 88 OR n_stop = 0
               OR n_distinct * 100 < n_words * 35) AS keep,
          fp
        FROM (SELECT doc_id, source, lang,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
                CAST(${cntSum(TextOps.StopwordsEn)} AS BIGINT) AS n_stop,
                md5(text) AS fp
              FROM documents) q
      ), fpc AS (
        SELECT fp, CAST(count(*) AS BIGINT) AS fp_n FROM pd GROUP BY 1
      ), flagged AS (
        SELECT p.*, c.fp_n >= 2 AS is_dup FROM pd p JOIN fpc c USING (fp)
      ), by_source AS (
        SELECT source,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_words) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
        FROM flagged GROUP BY 1
      ), lang_mode AS (
        SELECT source, lang AS top_lang, ln AS top_lang_n FROM (
          SELECT source, lang, CAST(count(*) AS BIGINT) AS ln,
                 row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, lang) AS rn
          FROM flagged GROUP BY source, lang) q WHERE rn = 1
      )
      SELECT b.source, b.n_docs, b.n_tokens,
        CAST(b.n_tokens AS DOUBLE) / b.n_docs AS mean_tokens,
        b.n_kept, CAST(b.n_kept AS DOUBLE) / b.n_docs AS keep_rate,
        b.n_dup_docs, CAST(b.n_dup_docs AS DOUBLE) / b.n_docs AS dup_rate,
        m.top_lang, CAST(m.top_lang_n AS DOUBLE) / b.n_docs AS top_lang_share
      FROM by_source b JOIN lang_mode m USING (source)
      ORDER BY b.source""",
    // x51: x38's card plus the per-source length percentiles, replaying
    // the bottom-k sketch as an order statistic of the same md5 (the 64
    // smallest hashes per source — x49's replay discipline at the
    // consumer's k)
    "x51_data_card_quantiles" -> s"""
      WITH pd AS (
        SELECT doc_id, source, lang, n_words,
          NOT (n_words < 20 OR n_words > 88 OR n_stop = 0
               OR n_distinct * 100 < n_words * 35) AS keep,
          fp
        FROM (SELECT doc_id, source, lang,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
                CAST(${cntSum(TextOps.StopwordsEn)} AS BIGINT) AS n_stop,
                md5(text) AS fp
              FROM documents) q
      ), fpc AS (
        SELECT fp, CAST(count(*) AS BIGINT) AS fp_n FROM pd GROUP BY 1
      ), flagged AS (
        SELECT p.*, c.fp_n >= 2 AS is_dup FROM pd p JOIN fpc c USING (fp)
      ), by_source AS (
        SELECT source,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_words) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
        FROM flagged GROUP BY 1
      ), lang_mode AS (
        SELECT source, lang AS top_lang, ln AS top_lang_n FROM (
          SELECT source, lang, CAST(count(*) AS BIGINT) AS ln,
                 row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, lang) AS rn
          FROM flagged GROUP BY source, lang) q WHERE rn = 1
      ), h AS (
        SELECT source, n_chars AS v,
               (${TextOps.hex13NumFragment("md5(CAST(doc_id AS STRING) || ':qs')")}) AS hv
        FROM documents
      ), samp AS (
        SELECT source, v FROM (
          SELECT source, v,
                 row_number() OVER (PARTITION BY source ORDER BY hv, v) AS rn
          FROM h) q WHERE rn <= 64
      ), sk AS (
        SELECT source, list(v ORDER BY v) AS sample,
               CAST(count(*) AS BIGINT) AS k_actual
        FROM samp GROUP BY source
      ), est AS (
        SELECT source, k_actual,
          sample[CAST(floor((k_actual + 1) / 2.0) AS INT)] AS p50_chars_est,
          sample[CAST(floor((9 * k_actual + 9) / 10.0) AS INT)] AS p90_chars_est,
          sample[CAST(floor((99 * k_actual + 99) / 100.0) AS INT)] AS p99_chars_est
        FROM sk
      )
      SELECT b.source, b.n_docs, b.n_tokens,
        CAST(b.n_tokens AS DOUBLE) / b.n_docs AS mean_tokens,
        b.n_kept, CAST(b.n_kept AS DOUBLE) / b.n_docs AS keep_rate,
        b.n_dup_docs, CAST(b.n_dup_docs AS DOUBLE) / b.n_docs AS dup_rate,
        m.top_lang, CAST(m.top_lang_n AS DOUBLE) / b.n_docs AS top_lang_share,
        e.k_actual, e.p50_chars_est, e.p90_chars_est, e.p99_chars_est
      FROM by_source b
      JOIN lang_mode m USING (source)
      JOIN est e ON e.source = b.source
      ORDER BY b.source""",
    "m1_multimodal_features" -> {
      val fcols = MultimodalOps.FeatureBytes.zip(
        Seq("f_a", "f_e", "f_s", "f_t", "f_sp", "f_r", "f_o", "f_n")).map {
        case (ch, name) =>
          val lit = if (ch == ' ') "' '" else s"'$ch'"
          s"CAST(length(text) - length(replace(text, $lit, '')) AS BIGINT) AS $name"
      }.mkString(",\n        ")
      s"""
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
        $fcols
      FROM documents ORDER BY doc_id"""
    },
    "m2_frame_sample" -> """
      WITH f AS (
        SELECT doc_id, i AS frame_idx, substring(text, i * 64 + 1, 64) AS frame
        FROM documents,
             unnest(generate_series(0, CAST(floor((length(text) - 1) / 64) AS INT))) AS t(i)
        WHERE i % 2 = 0
      )
      SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        CAST(length(frame) AS BIGINT) AS n_bytes,
        CAST(length(frame) - length(replace(frame, 'e', '')) AS BIGINT) AS f_e
      FROM f ORDER BY doc_id, frame_idx""",
    "x5_top_terms" -> """
      WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      ), tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM words GROUP BY 1, 2
      ), df AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
      ), ranked AS (
        SELECT t.doc_id, t.term, t.tf, d.df,
          CAST(row_number() OVER (PARTITION BY t.doc_id
            ORDER BY t.tf DESC, d.df ASC, t.term ASC) AS INT) AS rnk
        FROM tf t JOIN df d USING (term)
      )
      SELECT doc_id, rnk, term, tf, df FROM ranked WHERE rnk <= 3
      ORDER BY doc_id, rnk""",
    "x6_vocab_bigrams" -> """
      WITH ws AS (
        SELECT string_split(text, ' ') AS w FROM documents
      ), bg AS (
        SELECT w[i] || ' ' || w[i+1] AS bigram
        FROM ws, unnest(generate_series(1, len(w) - 1)) AS t(i)
      )
      SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM bg
      GROUP BY bigram ORDER BY n DESC, bigram LIMIT 100""",
    "m3_resize" -> """
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_in,
        CAST(len(generate_series(1, length(text), 4)) AS BIGINT) AS n_out,
        CAST(list_sum(list_transform(generate_series(1, length(text), 4),
          i -> ascii(substring(text, i, 1)))) AS BIGINT) AS checksum
      FROM documents ORDER BY doc_id"""
  )
}
