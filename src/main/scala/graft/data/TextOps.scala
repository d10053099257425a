package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language-ID, quality scoring, token counting, document fingerprinting.
  *
  * All scalar logic is arithmetic/string-exact so the DuckDB oracle can
  * replicate results bit-for-bit: counts are integers, ratios are single
  * IEEE divisions of identical integers, and hashes are MD5 (identical hex
  * in Spark and DuckDB).
  *
  * Scale: every operator is a narrow projection or a hash aggregation keyed
  * by doc — no global sorts, no skew-prone joins; at 100 TB these pipeline
  * over the scan with whole-stage codegen.
  */
object TextOps {

  val StopwordsEn = Seq("the", "a", "of", "to")
  val StopwordsDe = Seq("der", "die", "und")
  val StopwordsEs = Seq("el", "la", "que")

  /** Portable token-count expression: occurrences of `w` in the
    * space-tokenized text. */
  /** Whole-word occurrence count. size(split) − size(array_remove) and
    * not a filter(...) lambda (r14): higher-order functions drop out of
    * whole-stage codegen and force the WHOLE projection interpreted,
    * while split/array_remove/size stay codegen'd — and subexpression
    * elimination then evaluates split(text) once per row however many
    * stopwords the sum spans. Same value, so the oracle (which keeps its
    * own list_filter text) is unaffected. */
  private def cnt(w: String): String =
    s"(size(split(text, ' ')) - size(array_remove(split(text, ' '), '$w')))"
  private def cntSum(ws: Seq[String]): String = ws.map(cnt).mkString(" + ")

  /** Argmax with deterministic tie-break (en > de > es), shared with the
    * oracle via identical CASE text over the count columns. */
  val LangCase: String =
    """CASE WHEN en_n = 0 AND de_n = 0 AND es_n = 0 THEN 'unknown'
       WHEN en_n >= de_n AND en_n >= es_n THEN 'en'
       WHEN de_n >= es_n THEN 'de' ELSE 'es' END"""

  /** x1 — language ID by stopword-count heuristic. */
  def langId(documents: DataFrame): DataFrame =
    documents
      .withColumn("en_n", expr(cntSum(StopwordsEn)).cast("long"))
      .withColumn("de_n", expr(cntSum(StopwordsDe)).cast("long"))
      .withColumn("es_n", expr(cntSum(StopwordsEs)).cast("long"))
      .withColumn("lang_pred", expr(LangCase))
      .select("doc_id", "lang_pred", "en_n", "de_n", "es_n")

  /** Session-shared langId frame (SharedFrames pay-once discipline, the
    * r3 pattern that took d9 5.26 s → 0.35 s): x8/x10/x11/x13 all re-pay
    * the stopword-count scan otherwise — in a full bench pass that is 4+
    * identical corpus scans, and the r7 bench measured the re-payers
    * regressing together under cache contention. First consumer
    * materializes; every later one reads the checkpoint. At 100 TB this
    * is a written lang-tagged projection (the [[Bucketing]] argument). */
  private def langIdShared(documents: DataFrame): DataFrame =
    SharedFrames.memo(documents, "langid")(langId(documents))

  /** Session-shared distinct-shingle frame: feeds x9/x10/x12 and the
    * d2/d3/d10/d11 dedup builders — the single most re-paid projection in
    * the registry (shingling re-tokenizes the whole corpus each time).
    * Same discipline as [[langIdShared]]. */
  private def shinglesShared(documents: DataFrame): DataFrame =
    SharedFrames.memo(documents, "shingles")(shingles(documents))

  /** Quality-score formula over integer inputs; identical text on both
    * sides so the doubles agree bitwise. */
  val QualityExpr: String =
    """(CASE WHEN n_words >= 20 AND n_words <= 80 THEN 1.0 ELSE 0.5 END)
       * (1.0 - abs(CAST(n_stop AS DOUBLE) / n_words - 0.1))"""

  /** x2 — quality scoring: length band, stopword ratio, average word
    * length. */
  def qualityScore(documents: DataFrame): DataFrame =
    documents
      .withColumn("n_words", expr("size(split(text, ' '))").cast("long"))
      .withColumn("n_stop", expr(cntSum(StopwordsEn)).cast("long"))
      .withColumn("avg_word_len",
        expr("CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words"))
      .withColumn("stop_ratio", expr("CAST(n_stop AS DOUBLE) / n_words"))
      .withColumn("quality_score", expr(QualityExpr))
      .select("doc_id", "n_words", "n_stop", "avg_word_len", "stop_ratio", "quality_score")

  /** x3 — token counting: whitespace tokens and a BPE-ish bound of
    * ceil(len/4) per word. */
  def tokenCount(documents: DataFrame): DataFrame =
    documents
      .withColumn("ws_tokens", expr("size(split(text, ' '))").cast("long"))
      .withColumn("bpe_tokens", expr(
        """aggregate(transform(split(text, ' '),
             w -> CAST(floor((length(w) + 3) / 4.0) AS BIGINT)),
           CAST(0 AS BIGINT), (acc, x) -> acc + x)"""))
      .select("doc_id", "ws_tokens", "bpe_tokens")

  /** x4 — order-insensitive document fingerprint: MD5 over the sorted token
    * multiset (the rolling-hash use case: cheap identity for shuffles and
    * caches). */
  def fingerprint(documents: DataFrame): DataFrame =
    documents
      .withColumn("fp", expr("md5(array_join(array_sort(split(text, ' ')), ' '))"))
      .select("doc_id", "fp")

  /** x7 — repetition-ratio quality signals (the Gopher-report style
    * repetition filters: duplicate-token fraction, most-frequent-token
    * fraction, duplicate-trigram fraction). All counts are integers, the
    * fractions one IEEE division each, so the oracle matches bitwise.
    *
    * Scale: explode → (doc, token) hash aggregation → per-doc rollup; the
    * shuffles are keyed by (doc, token) with map-side partials, never
    * wider than the tokenized corpus. */
  def repetition(documents: DataFrame): DataFrame = {
    // r14: words and trigrams ride ONE generator over one corpus scan —
    // index i ≤ n emits word i, index i > n emits trigram i − n (only
    // generated when n ≥ 3, since the bound is max(n, 2n−2); `grp`
    // disambiguates a word that equals a trigram string). The previous
    // two-branch form scanned+exploded the corpus twice, paid two
    // (doc, token) exchanges and joined the halves back; this pays one
    // exchange per level and no join. Null semantics preserved: a
    // trigram-less doc has no grp=1 rows, so the all-null conditional
    // sums keep dup_trigram_frac NULL exactly like the old left join.
    val toks = documents
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n", size(col("ws")))
      // sequence(1, 0) would DESCEND (DuckDB's generate_series is empty),
      // so the bound never drops below n ≥ 1
      .withColumn("i", explode(sequence(lit(1), greatest(col("n"), col("n") * 2 - 2))))
      .select(col("doc_id"), (col("i") > col("n")).as("grp"),
        when(col("i") <= col("n"), element_at(col("ws"), col("i")))
          .otherwise(concat_ws(" ", element_at(col("ws"), col("i") - col("n")),
            element_at(col("ws"), col("i") - col("n") + 1),
            element_at(col("ws"), col("i") - col("n") + 2))).as("tok"))
    toks.groupBy("doc_id", "grp", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(when(!col("grp"), col("c"))).as("n_words"),
        count(when(!col("grp"), lit(1))).as("n_distinct_words"),
        max(when(!col("grp"), col("c"))).as("top_word_n"),
        sum(when(col("grp"), col("c"))).as("n_tris"),
        count(when(col("grp"), lit(1))).as("n_distinct_tris"))
      .select(col("doc_id"), col("n_words"), col("n_distinct_words"), col("top_word_n"),
        expr("CAST(n_words - n_distinct_words AS DOUBLE) / n_words").as("dup_word_frac"),
        expr("CAST(top_word_n AS DOUBLE) / n_words").as("top_word_frac"),
        expr("CAST(n_tris - n_distinct_tris AS DOUBLE) / n_tris").as("dup_trigram_frac"))
  }

  /** x8 — exact per-language length quantiles WITHOUT a global sort: the
    * corpus first shrinks to a (language, length) histogram (one keyed
    * aggregation), then the quantile is selected as the smallest length
    * whose cumulative count reaches ceil(q·n) — windows run over the tiny
    * histogram, never over documents. Thresholds use the integer identity
    * ceil(q·n) = floor((q·n + denom-1)/denom) computed in doubles below
    * 2^53, so both engines agree exactly. */
  def lengthQuantiles(documents: DataFrame): DataFrame = {
    val lang = langIdShared(documents).select("doc_id", "lang_pred")
    val lengths = documents
      .select(col("doc_id"), expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_words"))
      .join(lang, "doc_id")
    val hist = lengths.groupBy("lang_pred", "n_words").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("lang_pred").orderBy("n_words")
    val cum = hist
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(Window.partitionBy("lang_pred")))
    def pick(thresholdExpr: String, name: String) =
      cum.filter(expr(s"cum >= $thresholdExpr"))
        .groupBy("lang_pred").agg(min("n_words").as(name))
    pick("CAST(floor((n + 1) / 2.0) AS BIGINT)", "p50_words")
      .join(pick("CAST(floor((9 * n + 9) / 10.0) AS BIGINT)", "p90_words"), "lang_pred")
      .join(cum.groupBy("lang_pred").agg(max("n").as("n_docs")), "lang_pred")
      .select("lang_pred", "n_docs", "p50_words", "p90_words")
  }

  /** Big-endian numeric value of the first 13 hex chars (52 bits) of the
    * column `col`, as a portable SQL fragment (instr/substring arithmetic
    * — no engine-specific hex-parse function). */
  /** Engine-portable positional expansion of the first 13 hex chars
    * (52 bits) — works verbatim in BOTH Spark and DuckDB, so the oracle
    * bodies splice THIS form ([[hex13NumFragment]]). */
  private def hex13NumPortable(col: String): String = {
    val terms = (1 to 13).map { i =>
      val w = 1L << (4 * (13 - i))
      s"(instr('0123456789abcdef', substring($col, $i, 1)) - 1) * CAST($w AS BIGINT)"
    }
    s"CAST(${terms.mkString(" + ")} AS BIGINT)"
  }

  /** Spark-side form of the same 52-bit value: ONE conv() instead of 13
    * instr+substring chains (r14 — the probe/bucket paths evaluate this
    * per shingle or per word, so the 13-term form was ~27 string ops per
    * row where one base conversion suffices). Value-identical to
    * [[hex13NumPortable]]: conv(hex, 16, 10) is the same positional
    * expansion, and 13 hex digits (2^52) fit a BIGINT exactly. DuckDB
    * has no conv(), so the oracle keeps the portable text. */
  private def hex13Num(col: String): String =
    s"CAST(conv(substring($col, 1, 13), 16, 10) AS BIGINT)"

  /** x9 — distinct-token estimation by a KMV (k-minimum-values) sketch,
    * the mergeable-sketch shape a 100 TB pipeline uses where exact
    * distinct is too wide: keep the k smallest hash values; the kth
    * smallest, read as a fraction of the hash space, estimates the
    * distinct count as (k-1)/fraction.
    *
    * Scale: the k-smallest selection compiles to TakeOrderedAndProject —
    * per-partition top-k then a driver merge of k·#partitions rows, no
    * global sort shuffle (the exact count here exists only to report the
    * sketch's error). Determinism: md5 hex order statistics are identical
    * everywhere, and the estimator is (k-1)·2^52 / kth52 — an exact
    * integer product below 2^58 in an IEEE division — so even the DOUBLE
    * estimate hash-matches the oracle. */
  def distinctEstimate(documents: DataFrame, k: Int = 64): DataFrame = {
    // sketch the trigram vocabulary (the token vocabulary of the synthetic
    // corpus is a few dozen words — below k, where KMV degenerates to the
    // exact count and demonstrates nothing)
    val hashes = shinglesShared(documents)
      .select(md5(col("sh")).as("h")).distinct()
    val kth = hashes.orderBy("h").limit(k)
      .agg(max("h").as("kth_hex"), count(lit(1)).as("k_actual"))
    val exact = hashes.agg(count(lit(1)).as("exact_distinct"))
    kth.crossJoin(exact)
      .withColumn("kth_num", expr(hex13Num("kth_hex")))
      .withColumn("est_distinct",
        expr("CAST(k_actual - 1 AS DOUBLE) * CAST(4503599627370496 AS DOUBLE) / kth_num"))
      .select("k_actual", "kth_hex", "kth_num", "exact_distinct", "est_distinct")
  }

  /** The same fragment, exposed for the oracle (identical text in both
    * dialects — instr and substring behave the same in Spark and DuckDB). */
  def hex13NumFragment(col: String): String = hex13NumPortable(col)

  /** The Spark-only fast form, for consumers outside this object whose
    * expression runs in Spark (never spliced into DuckDB SQL). */
  def hex13NumSpark(col: String): String = hex13Num(col)

  /** Every seeded operator splices its seed into SQL expression text
    * (`md5(concat('<seed>:...', ...))`), so a seed containing a quote
    * would break parsing — or, worse, rewrite the expression (ADVICE
    * r11). Seeds are configuration, not data: restrict them to
    * `[A-Za-z0-9_-]+`, which is inert inside a single-quoted SQL
    * literal in both engines. Returns the seed so call sites can
    * validate inline. */
  private[graft] def validateSeed(seed: String): String = {
    require(seed.nonEmpty && seed.forall(c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_' || c == '-'),
      s"seed must match [A-Za-z0-9_-]+ (it is spliced into SQL text): '$seed'")
    seed
  }

  /** The x16 stopword-count fragment, exposed for consumers that must
    * reproduce the quality rule outside this object (the streaming
    * admission chain) — one text, no drift. */
  def stopwordCountFragment: String = cntSum(StopwordsEn)

  /** 48-bit variant (12 hex chars) — the per-token hash of the rolling
    * span-window hash ([[graft.functions.RollingSpanHashes.tokenHash]]):
    * the oracle applies it to md5(token) and power-weights per window. */
  def hex12NumFragment(col: String): String = {
    val terms = (1 to 12).map { i =>
      val w = 1L << (4 * (12 - i))
      s"(instr('0123456789abcdef', substring($col, $i, 1)) - 1) * CAST($w AS BIGINT)"
    }
    s"CAST(${terms.mkString(" + ")} AS BIGINT)"
  }

  /** x10 — PER-GROUP distinct estimation via the mergeable KMV aggregator
    * (`graft_kmv`, a typed Aggregator with map-side partial buffers): one
    * hash shuffle carrying ≤k hashes per (group, partition) instead of
    * every value — the shape that makes per-group cardinality viable at
    * 100 TB. Same estimator arithmetic as [[distinctEstimate]], so the
    * DOUBLE estimate is bit-stable against the oracle's sorted-selection
    * recomputation. */
  def distinctByLang(documents: DataFrame): DataFrame = {
    val lang = langIdShared(documents).select("doc_id", "lang_pred")
    val hashes = shinglesShared(documents).join(lang, "doc_id")
      .select(col("lang_pred"), md5(col("sh")).as("h"))
    hashes.groupBy("lang_pred").agg(expr("graft_kmv(h)").as("sk"))
      .select(col("lang_pred"),
        col("sk.k_actual").cast("int").as("k_actual"),
        col("sk.kth_hex").as("kth_hex"))
      .withColumn("kth_num", expr(hex13Num("kth_hex")))
      .withColumn("est_distinct",
        expr("CAST(k_actual - 1 AS DOUBLE) * CAST(4503599627370496 AS DOUBLE) / kth_num"))
  }

  /** x11 — deterministic stratified sampling: keep a per-language rate by
    * comparing the doc's md5 hash (as a 52-bit integer) against the rate
    * in EXACT integer arithmetic (hv·denominator < 2^52·numerator — no
    * float thresholds, no RNG). A hash-threshold sample is reproducible
    * across runs, engines, and repartitionings — unlike per-partition
    * `sample()` RNG — and a finer threshold on the SAME hash always
    * selects a subset of a coarser one (nested samples; independent
    * stages would need a salted hash each). Narrow filter — pipelines
    * over the scan. Strata: en keeps 1/10, everything else 1/2. */
  def sampleStratified(documents: DataFrame): DataFrame = {
    val lang = langIdShared(documents).select("doc_id", "lang_pred")
    lang
      .withColumn("h", md5(expr("CAST(doc_id AS STRING)")))
      .withColumn("hv", expr(hex13Num("h")))
      .filter(expr(
        """(lang_pred = 'en' AND hv * 10 < CAST(4503599627370496 AS BIGINT))
           OR (lang_pred <> 'en' AND hv * 2 < CAST(4503599627370496 AS BIGINT))"""))
      .select("doc_id", "lang_pred")
  }

  /** x12 — decontamination: flag training documents whose shingles overlap
    * an evaluation-benchmark shingle set (here: the shingles of docs 0-9
    * as the stand-in benchmark). The benchmark side is tiny and broadcast;
    * each training doc gets its exact overlap count and fraction — the
    * n-gram-overlap decontamination check every LLM data pipeline runs
    * before training. One broadcast hash join + one keyed aggregation. */
  def decontaminate(documents: DataFrame, benchMaxId: Long = 10): DataFrame =
    decontaminateAgainst(documents, documents, benchMaxId)

  /** x12's generalized form: the benchmark shingle set derives from
    * `benchSource` while the reports cover `training`'s documents. The
    * composed curation chain passes the PIPELINE INPUT corpus as
    * `benchSource` and the surviving frame as `training` — deriving the
    * benchmark from the already-filtered survivors (the pre-r12 chain)
    * silently un-benches any benchmark doc an upstream gate dropped, so
    * training docs contaminated with it pass undetected, and the batch
    * chain diverges from its streaming twin
    * ([[graft.streaming.StreamingAnalytics.curationAdmissionStream]]),
    * whose literal gate is built from the full corpus. Cost: identical —
    * the shingle scan memoizes on the INPUT corpus (shared with every
    * other stage); restricting reports to survivors is one doc_id-keyed
    * semi join. */
  def decontaminateAgainst(training: DataFrame, benchSource: DataFrame,
      benchMaxId: Long = 10): DataFrame = {
    val sh = shinglesShared(benchSource)
    // persist: feeds the benchmark side, the overlap join, and the sizes
    // aggregation — without it the explode+distinct shingle pipeline (the
    // dominant scan cost) runs three times
    val hashed = sh.select(col("doc_id"), xxhash64(col("sh")).as("h")).persist()
    val bench = hashed.filter(col("doc_id") < benchMaxId)
      .select(col("h").as("bh")).distinct()
    val restAll = hashed.filter(col("doc_id") >= benchMaxId)
    val rest = if (training eq benchSource) restAll
      else restAll.join(training.select("doc_id"), Seq("doc_id"), "left_semi")
    // r14: ONE left join + ONE keyed aggregation. bench is distinct, so
    // the left join preserves rest's row count exactly (≤1 match per
    // hash) — n_sh = rows, n_overlap = matched rows, from the same pass.
    // The previous two-agg + join-back shape paid a second doc_id
    // exchange and a join for numbers available in one aggregation.
    rest.join(broadcast(bench), col("h") === col("bh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("bh").isNotNull, 1L).otherwise(0L)).as("n_overlap"))
      .select(col("doc_id"), col("n_sh"), col("n_overlap"),
        expr("CAST(n_overlap AS DOUBLE) / n_sh").as("overlap_frac"),
        (col("n_overlap") > 0).as("is_contaminated"))
  }

  /** x52 — Bloom-filter decontamination calibration (VERDICT r11 #3):
    * the scale path past x12's exact benchmark join and past the
    * streaming chain's plan-time hash-list literal. A real eval suite
    * (MMLU + GSM8K + HumanEval + ...) is 10⁵–10⁶ distinct shingles: the
    * exact hash-list literal bloats every streaming plan and its per-row
    * array scan is O(|bench|), while a Bloom filter holds the gate at a
    * FIXED m bits regardless of benchmark size — per-shingle probe cost
    * O(kHash), a measured false-positive rate in exchange, and NO false
    * negatives by construction (a member's positions are all set), which
    * is the direction decontamination must never err in.
    *
    * Positions are portable — pos_j(sh) = hex13(md5(j ':' sh)) mod m,
    * the same md5 discipline as every other sketch — so the oracle
    * replays the filter bit-for-bit. This audit is x47's
    * calibration-before-trust pattern: per training doc, the Bloom
    * verdict NEXT TO the exact x12 verdict; `false_positive` rows are
    * exactly what the (m, kHash) choice over-drops on the gate corpus
    * (expected FPR per shingle ≈ (1 − e^(−kn/m))^k). Per DOCUMENT the
    * FPR compounds over its ~n_sh probes — 1 − (1 − fpr)^n_sh — so a
    * deployment sizes m for the DOC-level target: the audit default
    * m = 4096 deliberately undersizes at the gate corpus so
    * false-positive rows EXIST to calibrate on (x49's k = 16 argument);
    * the synthetic 10⁵-shingle spec point runs m = 2²³ for a sub-1%
    * doc-level rate.
    *
    * Shape: bench bits = one distinct agg of O(|bench|·kHash) positions
    * (≤ m rows — control-plane at ANY benchmark size, broadcast);
    * training probe = one broadcast join of per-(doc, shingle, j)
    * positions against the bit set + two keyed aggs. No pairwise scan,
    * no window. */
  def decontaminateBloom(documents: DataFrame, benchMaxId: Long = 10,
      mBits: Int = 4096, kHash: Int = 3): DataFrame = {
    // per-shingle probe positions as kHash COLUMNS, not exploded rows
    // (r14): the kHash probes of one shingle never needed to leave their
    // row, so probing them as columns against the (reused) broadcast bit
    // set removes the ×kHash row fan-out AND the per-(doc, shingle)
    // re-aggregation exchange the exploded form paid — the only
    // remaining shuffles are the ≤ m-row bit-set distinct and the
    // per-doc rollup. Bit positions are unchanged (same md5 discipline),
    // so the oracle replay is bit-for-bit identical.
    def posJ(j: Int): org.apache.spark.sql.Column = expr(
      s"(${hex13Num(s"md5(concat('$j', ':', sh))")}) % $mBits")
    val sh = shinglesShared(documents)
    val bits = sh.filter(col("doc_id") < benchMaxId)
      .select(explode(array((0 until kHash).map(posJ): _*)).as("bp"))
      .distinct()
    val bcBits = broadcast(bits)
    // a shingle bloom-hits iff ALL kHash of its positions are set: kHash
    // left probes against the SAME broadcast build (ReuseExchange — the
    // build side is identical, so it is shipped once)
    val probed = (0 until kHash).foldLeft(
      sh.filter(col("doc_id") >= benchMaxId)
        .select((col("doc_id") +: (0 until kHash).map(j => posJ(j).as(s"p$j"))): _*)) {
      case (df, j) =>
        df.join(bcBits.select(col("bp").as(s"bp$j")), col(s"p$j") === col(s"bp$j"), "left")
    }
    val allSet = (0 until kHash).map(j => col(s"bp$j").isNotNull).reduce(_ && _)
    val perDoc = probed.groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(allSet, 1L).otherwise(0L)).as("n_bloom_hits"))
    perDoc
      .join(decontaminate(documents, benchMaxId)
        .select(col("doc_id"), col("is_contaminated").as("exact_contaminated")),
        "doc_id")
      .select(col("doc_id"), col("n_sh"), col("n_bloom_hits"),
        (col("n_bloom_hits") > 0).as("bloom_contaminated"),
        col("exact_contaminated"),
        (col("n_bloom_hits") > 0 && !col("exact_contaminated")).as("false_positive"))
  }

  /** The benchmark side of [[decontaminateBloom]] as a driver-side
    * BITMASK (mBits/64 longs) — the plan-time literal the streaming gate
    * ships ([[graft.streaming.StreamingAnalytics.bloomDecontaminationStream]])
    * instead of the shingle-hash list. Control-plane bounded at ANY
    * benchmark size: the collect is ≤ min(|bench|·kHash, mBits) distinct
    * positions and the literal is mBits/64 longs — a 2²⁰-bit filter is
    * 16 K longs (128 KB) whether the benchmark has 10² or 10⁶ shingles,
    * which is the whole point. */
  def benchBloomBits(documents: DataFrame, benchMaxId: Long = 10,
      mBits: Int = 4096, kHash: Int = 3): Seq[Long] = {
    require(mBits % 64 == 0, s"mBits must be a multiple of 64: $mBits")
    val positions = shinglesShared(documents)
      .filter(col("doc_id") < benchMaxId)
      .withColumn("j", explode(sequence(lit(0), lit(kHash - 1))))
      .select(expr(
        s"(${hex13Num("md5(concat(CAST(j AS STRING), ':', sh))")}) % $mBits")
        .as("p"))
      .distinct().collect().map(_.getLong(0))
    bloomBitsOf(positions, mBits)
  }

  /** Fold set bit positions into the mBits/64-long bitmask (word i holds
    * bits [64i, 64i+64), LSB-first). Exposed for the synthetic-benchmark
    * spec, which builds a 10⁵-shingle filter without a corpus. */
  def bloomBitsOf(positions: Seq[Long], mBits: Int): Seq[Long] = {
    val words = new Array[Long](mBits / 64)
    positions.foreach { p =>
      require(p >= 0 && p < mBits, s"bit position out of range: $p")
      words(p.toInt / 64) |= 1L << (p.toInt % 64)
    }
    words.toSeq
  }

  /** x13 — language-ID evaluation: confusion counts of the predictor
    * against the corpus's ground-truth `lang` column — the eval harness a
    * pipeline runs before trusting a classifier for filtering. One keyed
    * aggregation over the prediction projection. */
  def langIdConfusion(documents: DataFrame): DataFrame =
    langIdShared(documents)
      .join(documents.select("doc_id", "lang"), "doc_id")
      .groupBy("lang", "lang_pred")
      .agg(count(lit(1)).as("n"))
      .withColumn("is_correct", col("lang") === col("lang_pred"))

  /** x14 — dataset mixture report: per (source, lang) document counts and
    * exact size totals — the data-card / mixture-weights table every
    * training run publishes. Pure integer aggregates (no double means, so
    * no ordering sensitivity); one hash aggregation with map-side
    * partials. */
  def sourceMix(documents: DataFrame): DataFrame =
    documents
      .withColumn("n_words", expr("CAST(size(split(text, ' ')) AS BIGINT)"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        sum("n_words").as("total_words"))

  /** x15 — training-sequence packing: concatenate the corpus in doc_id
    * order and chunk it into fixed token-budget sequences (the
    * concat-then-chunk packing every LLM pretraining pipeline runs).
    * Each document reports the sequence it starts in, its offset there,
    * and how many sequences it spans.
    *
    * The global exclusive prefix sum of token counts is computed in two
    * phases — range-repartition by doc_id, cumsum locally in parallel,
    * then add per-partition totals' offsets from a #partitions-row frame
    * broadcast back — never a single-partition window over the corpus.
    * All arithmetic is integer (BIGINT cumsum, DIV/% binning), so the
    * oracle's window-cumsum formulation matches exactly. */
  def packSequences(documents: DataFrame, budget: Long = 512): DataFrame = {
    val toks = tokenCount(documents).select(col("doc_id"), col("bpe_tokens"))
    val local = toks
      .repartitionByRange(col("doc_id"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lcum", sum("bpe_tokens")
        .over(Window.partitionBy("__pid").orderBy("doc_id")))
      .persist() // un-materialized range shuffles can resample bounds per branch
    val offsets = local.groupBy("__pid").agg(sum("bpe_tokens").as("__pt"))
      .withColumn("__off", coalesce(
        sum("__pt").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn("cum_before", col("__lcum") + col("__off") - col("bpe_tokens"))
      .select(col("doc_id"), col("bpe_tokens").as("n_tokens"),
        expr(s"cum_before DIV $budget").as("seq_id"),
        expr(s"cum_before % $budget").as("seq_offset"),
        // greatest(n_tokens, 1): a zero-token doc spans its start sequence.
        // Also keeps the dividend non-negative — Spark's DIV truncates
        // toward zero while DuckDB's // floors, so a negative dividend
        // (cum_before=0, n_tokens=0 → -1) would diverge between engines
        expr(s"(cum_before + greatest(n_tokens, 1) - 1) DIV $budget - cum_before DIV $budget + 1")
          .as("n_seqs_spanned"))
  }

  /** x34 — deterministic seeded shuffle + shard assignment: the training
    * EXPORT step every LLM pipeline ends with. Each document draws a
    * reproducible pseudo-random key from md5(seed ':' doc_id) (13 hex
    * digits → exact 52-bit BIGINT, the x11/x21 trick), its shard is
    * key % nShards, and its in-shard position is the EXACT rank of
    * (key, doc_id) within the shard. Same seed → the same permutation
    * bit-for-bit on any cluster size; a new seed reshuffles; a
    * downstream trainer reads shard s in pos order and sees a stable
    * pseudo-random document order with no coordination.
    *
    * The rank is x15's two-phase prefix sum, generalized per shard:
    * range-repartition by (shard, key), rank locally in parallel, then
    * add per-(partition, shard) count offsets from a
    * #partitions×#shards-row frame broadcast back — never a global
    * window over the corpus. */
  def shardExport(documents: DataFrame, nShards: Int = 8, seed: String = "graft"): DataFrame = {
    validateSeed(seed)
    val keyed = documents.select(col("doc_id"))
      .withColumn("skey", expr(hex13Num(s"md5(concat('$seed:', CAST(doc_id AS STRING)))")))
      .withColumn("shard", expr(s"skey % $nShards"))
    val local = keyed
      .repartitionByRange(col("shard"), col("skey"), col("doc_id"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrank", row_number()
        .over(Window.partitionBy("__pid", "shard").orderBy("skey", "doc_id"))
        .cast("long"))
      .persist() // un-materialized range shuffles can resample bounds per branch
    val offsets = local.groupBy("__pid", "shard").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum("__n").over(Window.partitionBy("shard").orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "shard", "__off")
    // UNORDERED output by contract: (shard, pos) fully determines the
    // export order, and the production path writes shard-partitioned
    // files sorted within shard — a global sort here would be the single
    // most expensive node of an otherwise-narrow plan at 100 TB. The
    // registry wrapper orders for the driver's hash gate only.
    local.join(broadcast(offsets), Seq("__pid", "shard"))
      .select(col("doc_id"), col("skey"), col("shard"),
        (col("__lrank") + col("__off") - 1).as("pos"))
  }

  /** x44 — shard MANIFEST over the x34 export: the integrity index a
    * shard-reader verifies before training (WebDataset's tar index /
    * Mosaic StreamingDataset's index.json ship exactly this): per shard,
    * the member count, the max in-shard position (contiguity check:
    * `max_pos == n_docs - 1`), the token total (the number a data-loader
    * budgets epochs with), and an ORDER-SENSITIVE integrity checksum —
    * `Σ (fp+1)·(pos+1)` over 2^20-folded doc fingerprints, which changes
    * if any member is missing, substituted, or re-ordered, yet
    * aggregates map-side-combinably with O(1) state per shard (a
    * concat-then-md5 checksum would collect the whole shard per group;
    * at 100 TB the fold widens to a mod-2^61 grid to keep the exact-sum
    * headroom, same plan). Output is O(#shards) rows at any corpus
    * size. */
  def shardManifest(documents: DataFrame, nShards: Int = 8,
      seed: String = "graft"): DataFrame =
    manifestOf(shardExport(documents, nShards, seed), documents)

  /** The x44 rollup over an ALREADY-ASSIGNED (doc_id, shard, pos) frame —
    * shared by [[shardManifest]] (which derives the assignment itself)
    * and by export read-back verification
    * ([[CurationPipeline.verifyExport]]), where the assignment comes from
    * the WRITTEN shard files: recomputing the order-sensitive checksum
    * from what a trainer would actually read is what catches a
    * substituted or re-ordered shard member that a row count cannot. */
  def manifestOf(assignment: DataFrame, documents: DataFrame): DataFrame = {
    val toks = documents
      .withColumn("bpe_tokens", expr(
        """aggregate(transform(split(text, ' '),
             w -> CAST(floor((length(w) + 3) / 4.0) AS BIGINT)),
           CAST(0 AS BIGINT), (acc, x) -> acc + x)"""))
      .withColumn("fp20", expr(s"(${hex13Num("md5(text)")}) % 1048576"))
      .select("doc_id", "bpe_tokens", "fp20")
    assignment.select("doc_id", "shard", "pos").join(toks, "doc_id")
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        max("pos").as("max_pos"),
        sum("bpe_tokens").as("n_tokens"),
        sum(expr("(fp20 + 1) * ((pos % 1048576) + 1)")).as("checksum"))
  }

  /** x35 — per-source token-budget cap: APPLY the mixture budgets x17
    * computes. Within each source, documents are taken in the x34 seeded
    * hash order until the source's token budget is exhausted: a document
    * is kept iff the cumulative token count of everything BEFORE it
    * (seeded order, same source) is under the budget — so the kept set is
    * deterministic, seed-reproducible, independent of physical layout,
    * and every source lands within one document of its cap. The exclusive
    * cumulative sum is the x15 two-phase prefix sum keyed per source,
    * never a global window. */
  def budgetCap(documents: DataFrame, budgetTokens: Long = 4000L,
      seed: String = "graft"): DataFrame = {
    validateSeed(seed)
    val keyed = documents.select(col("doc_id"), col("source"))
      .join(tokenCount(documents).select("doc_id", "bpe_tokens"), "doc_id")
      .withColumn("skey", expr(hex13Num(s"md5(concat('$seed:', CAST(doc_id AS STRING)))")))
    val local = keyed
      .repartitionByRange(col("source"), col("skey"), col("doc_id"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lcum", sum("bpe_tokens")
        .over(Window.partitionBy("__pid", "source").orderBy("skey", "doc_id")))
      .persist() // un-materialized range shuffles can resample bounds per branch
    val offsets = local.groupBy("__pid", "source").agg(sum("bpe_tokens").as("__pt"))
      .withColumn("__off", coalesce(
        sum("__pt").over(Window.partitionBy("source").orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "source", "__off")
    // UNORDERED output by contract (see shardExport) — the registry
    // wrapper orders by doc_id for the driver's hash gate only
    local.join(broadcast(offsets), Seq("__pid", "source"))
      .withColumn("cum_before", col("__lcum") + col("__off") - col("bpe_tokens"))
      .select(col("doc_id"), col("source"), col("bpe_tokens"), col("skey"),
        col("cum_before"), (col("cum_before") < budgetTokens).as("keep"))
  }

  /** x41 — mixture MATERIALIZATION: turn x17's temperature plan into the
    * actual (document, epoch) repetition rows a trainer consumes — the
    * "repeat small sources" step of data-constrained training
    * (Muennighoff et al. 2023: up-sampling IS re-epoching). x17 reports
    * per-source epochs; x35 caps ONE pass; this op emits every pass:
    * per source, target tokens = w_s·T ÷ w_total (the same integer
    * milli-quantized sqrt weights as x17, T = `num`/`den` × the corpus
    * total, all BIGINT so the plan is order-independent), every document
    * appears in floor(target/tokens_s) full epochs, and the final
    * PARTIAL epoch is filled by x35's seeded greedy prefix rule with the
    * remainder budget — deterministic, seed-reproducible, within one
    * document of the target per source.
    *
    * All arithmetic is exact: the w_s·T product runs in DECIMAL(38,0)
    * because it exceeds 2^63 already near ~2.6·10^10 total tokens
    * (w ≈ 1000·√tokens_s, so w·T grows as T^1.5) — far below any real
    * corpus. The decimal chain is exact to 38 digits (w·T ≤ ~10^24 at a
    * 10^18-token corpus) and collapses back to BIGINT at target_s, which
    * is ≤ 9/4·T and fits; the only doubles are x17's already-quantized
    * weights. The plan frame is O(#sources), so decimal costs nothing.
    *
    * Scale: the per-source plan is an O(#sources) broadcast; full epochs
    * are a narrow explode (output ∝ target tokens, the rows a trainer
    * reads anyway); the partial epoch reuses the x15/x35 two-phase
    * prefix sum — range-partition, rank locally, add broadcast per-
    * partition offsets — never a global window. UNORDERED output by
    * contract (see shardExport); the registry wrapper orders for the
    * hash gate only. */
  def mixtureExpand(documents: DataFrame, num: Long = 9, den: Long = 4,
      seed: String = "graft"): DataFrame = {
    validateSeed(seed)
    val keyed = documents.select(col("doc_id"), col("source"))
      .join(tokenCount(documents).select("doc_id", "bpe_tokens"), "doc_id")
      .withColumn("skey", expr(hex13Num(s"md5(concat('$seed:', CAST(doc_id AS STRING)))")))
    val perSource = keyed.groupBy("source")
      .agg(sum("bpe_tokens").as("tokens_s"))
      .withColumn("w", expr(
        "CAST(floor(sqrt(CAST(tokens_s AS DOUBLE)) * 1000 + 0.5) AS BIGINT)"))
    val tot = perSource.agg(sum("w").as("w_total"), sum("tokens_s").as("t_all"))
    val plan = perSource.crossJoin(broadcast(tot))
      .withColumn("target_s", expr(
        s"""CAST((CAST(w AS DECIMAL(38,0)) * CAST(t_all * $num DIV $den AS DECIMAL(38,0)))
                 DIV CAST(w_total AS DECIMAL(38,0)) AS BIGINT)"""))
      .withColumn("full_ep", expr("target_s DIV tokens_s"))
      .withColumn("rem_s", expr("target_s % tokens_s"))
      .select("source", "full_ep", "rem_s")
    val withPlan = keyed.join(broadcast(plan), Seq("source"))
      .persist() // feeds the full-epoch explode AND the partial-epoch prefix
    val full = withPlan
      // CASE guard: Spark's sequence(0, -1) DESCENDS where DuckDB's
      // generate_series(0, -1) is empty — a zero-full-epoch source must
      // yield no rows, not a bogus descending pair
      .withColumn("epoch", explode(expr(
        """CASE WHEN full_ep > 0 THEN sequence(CAST(0 AS BIGINT), full_ep - 1)
           ELSE CAST(array() AS ARRAY<BIGINT>) END""")))
      .select("doc_id", "source", "epoch", "bpe_tokens")
    val local = withPlan
      .repartitionByRange(col("source"), col("skey"), col("doc_id"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lcum", sum("bpe_tokens")
        .over(Window.partitionBy("__pid", "source").orderBy("skey", "doc_id")))
      .persist() // un-materialized range shuffles can resample bounds per branch
    val offsets = local.groupBy("__pid", "source").agg(sum("bpe_tokens").as("__pt"))
      .withColumn("__off", coalesce(
        sum("__pt").over(Window.partitionBy("source").orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "source", "__off")
    val partial = local.join(broadcast(offsets), Seq("__pid", "source"))
      .withColumn("cum_before", col("__lcum") + col("__off") - col("bpe_tokens"))
      .filter(col("cum_before") < col("rem_s"))
      .select(col("doc_id"), col("source"), col("full_ep").as("epoch"),
        col("bpe_tokens"))
    full.unionByName(partial)
  }

  /** x16 — composite quality filter with an audit trail: every heuristic
    * is a named boolean column, so rejected documents are attributable to
    * specific rules (the filter-transparency requirement of a curated
    * training set — aggregate rule counts are the data-card "% removed
    * by rule X" table). Thresholds sit at the corpus's observed tails.
    *
    * Entirely per-row narrow expressions — the type-token ratio test is
    * cross-multiplied integers (n_distinct·100 < n_words·35), no doubles
    * anywhere — so the filter pipelines over the scan with no shuffle at
    * all. */
  /** x16's per-rule flags WITHOUT the gate sort — the form a streaming
    * consumer (no sort allowed) or a join consumer (sort wasted) uses;
    * [[filterAudit]] is this plus the registry's ORDER BY. */
  def filterFlags(documents: DataFrame): DataFrame =
    documents
      .withColumn("n_words", expr("CAST(size(split(text, ' ')) AS BIGINT)"))
      .withColumn("n_distinct", expr("CAST(size(array_distinct(split(text, ' '))) AS BIGINT)"))
      .withColumn("n_stop", expr(cntSum(StopwordsEn)).cast("long"))
      .withColumn("r_too_short", col("n_words") < 20)
      .withColumn("r_too_long", col("n_words") > 88)
      .withColumn("r_no_stopwords", col("n_stop") === 0)
      .withColumn("r_repetitive", expr("n_distinct * 100 < n_words * 35"))
      .withColumn("keep",
        !(col("r_too_short") || col("r_too_long") ||
          col("r_no_stopwords") || col("r_repetitive")))
      .select("doc_id", "n_words", "n_distinct", "n_stop",
        "r_too_short", "r_too_long", "r_no_stopwords", "r_repetitive", "keep")

  def filterAudit(documents: DataFrame): DataFrame =
    filterFlags(documents)

  /** x17 — temperature-reweighted mixture: per-source sampling
    * probabilities p_i ∝ tokens_i^(1/2) (temperature α = 0.5, the
    * multilingual-rebalancing exponent) and the implied epochs over each
    * source for a fixed training-token target. Upweights small sources,
    * downweights dominant ones.
    *
    * Order-independence: summing the irrational sqrt weights in floats
    * would make the total depend on aggregation order (different between
    * engines AND between runs at different parallelism). The weights are
    * therefore quantized to integer milli-units first — the sum is exact
    * BIGINT, and p/epochs are division chains over identical integers. */
  def mixtureTemperature(documents: DataFrame, targetTokens: Long = 10000000L): DataFrame = {
    // token counts computed inline on the source projection — one narrow
    // scan into the per-source aggregation (routing through tokenCount
    // would project `source` away and force a second scan plus a
    // full-cardinality join just to re-attach it)
    val perSource = documents
      .withColumn("bpe_tokens", expr(
        """aggregate(transform(split(text, ' '),
             w -> CAST(floor((length(w) + 3) / 4.0) AS BIGINT)),
           CAST(0 AS BIGINT), (acc, x) -> acc + x)"""))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("bpe_tokens").as("tokens"))
      .withColumn("w", expr("CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1000 + 0.5) AS BIGINT)"))
    val total = perSource.agg(sum("w").as("w_total"))
    perSource.crossJoin(broadcast(total))
      .withColumn("p", expr("CAST(w AS DOUBLE) / w_total"))
      .withColumn("epochs", expr(s"CAST(w AS DOUBLE) / w_total * $targetTokens / tokens"))
      .select("source", "n_docs", "tokens", "w", "p", "epochs")
  }

  /** x18 — the end-to-end curation funnel: quality filter → exact dedup →
    * near-dup removal → stratified sample, reported as per-stage
    * in/out/removed counts (the "data funnel" table of a training-set
    * data card). Composes the pipeline's own operators:
    *
    *  1. keep = the x16 audit rules;
    *  2. exact dedup keeps min doc_id per md5(text) (d1 keepers);
    *  3. near-dup removal drops every surviving doc that appears as the
    *     LARGER id of a d3 dup pair — the deterministic keep-first form
    *     (pair-greedy, not transitive closure: a doc survives unless some
    *     smaller doc directly duplicates it; d6 computes full clusters);
    *  4. the x11 per-language hash-threshold sample.
    *
    * Shape: every milestone is a per-doc boolean built from hash joins
    * against (tiny) keeper/loser/sample sets, then ONE aggregation emits
    * the whole funnel — not a driver loop of five counts re-running the
    * dedup chain per stage. */
  def curationFunnel(documents: DataFrame): DataFrame = {
    val audit = filterAudit(documents).select(col("doc_id"), col("keep").as("p1"))
    // exact-dedup keepers among the quality survivors
    val keepers = documents
      .join(audit.filter(col("p1")).select("doc_id"), "doc_id")
      .withColumn("fp", md5(col("text")))
      .groupBy("fp").agg(min("doc_id").as("doc_id"))
      .select(col("doc_id"), lit(true).as("is_keeper"))
    val dupLosers = lshDupPairs(documents)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("is_loser", lit(true))
    val sampled = sampleStratified(documents)
      .select(col("doc_id"), lit(true).as("is_sampled"))
    val flags = audit
      .join(keepers, Seq("doc_id"), "left")
      .join(dupLosers, Seq("doc_id"), "left")
      .join(sampled, Seq("doc_id"), "left")
      .withColumn("p2", col("p1") && coalesce(col("is_keeper"), lit(false)))
      .withColumn("p3", col("p2") && !coalesce(col("is_loser"), lit(false)))
      .withColumn("p4", col("p3") && coalesce(col("is_sampled"), lit(false)))
    flags.agg(
        count(lit(1)).as("n0"),
        sum(col("p1").cast("long")).as("n1"),
        sum(col("p2").cast("long")).as("n2"),
        sum(col("p3").cast("long")).as("n3"),
        sum(col("p4").cast("long")).as("n4"))
      .selectExpr("""stack(5,
        '0_corpus',      n0, CAST(0 AS BIGINT),
        '1_quality',     n1, n0 - n1,
        '2_exact_dedup', n2, n1 - n2,
        '3_near_dedup',  n3, n2 - n3,
        '4_sampled',     n4, n3 - n4) AS (stage, n_docs, n_removed)""")
  }

  /** x19 — n-gram novelty: the fraction of a document's shingles whose
    * FIRST corpus occurrence (smallest doc_id) is this document — the
    * redundancy/novelty signal curriculum-ordering and dedup-priority
    * passes rank by. Low novelty ⇒ mostly re-treads earlier documents.
    *
    * Shape: the first-occurrence table is one hash aggregation keyed by
    * shingle (min doc_id, map-side combinable), joined back to the
    * per-doc shingle sets by shingle hash — no pairwise comparison of
    * documents anywhere, so it scales like d1, not like d2. */
  def noveltyScore(documents: DataFrame): DataFrame = {
    val sh = shinglesShared(documents)
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
      .persist() // feeds first-occurrence agg AND the join side
    val first = sh.groupBy("h").agg(min("doc_id").as("first_doc"))
    sh.join(first, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_frac", expr("CAST(n_novel AS DOUBLE) / n_sh"))
  }

  /** x20 — sliding-window chunking: split each document into overlapping
    * token windows (`size` tokens every `stride`) — the chunker feeding
    * RAG indexes and fixed-context pretraining. Emits per chunk its
    * 0-based start, actual length (tail chunks are short), and an MD5
    * identity for downstream chunk-level dedup.
    *
    * Pure per-row explode + array slicing — narrow, codegen'd, no
    * shuffle; output size is a fixed ~size/stride multiple of the
    * corpus. */
  def chunkSliding(documents: DataFrame, size: Int = 64, stride: Int = 48): DataFrame =
    documents
      .withColumn("ws", split(col("text"), " "))
      // chunk count = 1 + ceil((n - size) / stride) for n > size, else 1:
      // a chunk starts only while it still contributes unseen tokens — the
      // naive (n-1) DIV stride bound emits a final chunk that is a strict
      // suffix of its predecessor whenever n % stride <= size - stride
      // (distinct fp, pure duplicate content downstream)
      .withColumn("i", explode(expr(
        s"sequence(0, CASE WHEN size(ws) <= $size THEN 0 ELSE (size(ws) - $size + $stride - 1) DIV $stride END)")))
      .select(col("doc_id"), col("i").cast("int").as("chunk_idx"),
        (col("i") * stride).cast("long").as("start_tok"),
        expr(s"CAST(size(slice(ws, i * $stride + 1, $size)) AS BIGINT)").as("n_tok"),
        expr(s"md5(array_join(slice(ws, i * $stride + 1, $size), ' '))").as("chunk_fp"))
      // UNORDERED output by contract (see shardExport) — the registry
      // wrapper orders by (doc_id, chunk_idx) for the driver's hash gate

  /** x21 — split assignment + leakage audit: deterministic
    * train/val/test assignment by salted hash (5% val, 5% test — the
    * salt makes it independent of x11's sampling hash; unsalted reuse
    * would correlate the two selections), then every near-dup pair
    * labeled with both sides' splits and a leak flag. A near-dup pair
    * straddling train and an eval split is exactly how eval contamination
    * enters a training run — this is the audit that catches it before
    * the split ships. Same candidate-bounded pair set as d3; the split
    * columns are two broadcast-sized hash joins. */
  def splitLeakage(documents: DataFrame): DataFrame = {
    val splits = documents.select(col("doc_id"))
      .withColumn("h", md5(concat(lit("split:"), col("doc_id").cast("string"))))
      .withColumn("hv", expr(hex13Num("h")))
      .withColumn("split",
        when(expr("hv * 20 < CAST(4503599627370496 AS BIGINT)"), "val")
          .when(expr("hv * 10 < CAST(4503599627370496 AS BIGINT)"), "test")
          .otherwise("train"))
      .select("doc_id", "split")
      .persist() // joined twice (doc_a and doc_b sides)
    lshDupPairs(documents).select("doc_a", "doc_b", "jac")
      .join(splits.toDF("doc_a", "split_a"), "doc_a")
      .join(splits.toDF("doc_b", "split_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("jac"),
        col("split_a"), col("split_b"),
        (col("split_a") =!= col("split_b")).as("is_leak"))
  }

  // -------------------------------------------------------------------
  // Deduplication family
  // -------------------------------------------------------------------

  /** d1 — exact dedup: hash-groupBy on md5(text). One shuffle keyed by the
    * hash — the canonical 100 TB-safe shape (no pairwise anything). */
  def dedupExact(documents: DataFrame): DataFrame =
    documents
      .withColumn("fp", md5(col("text")))
      .groupBy("fp")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_dups"))
      .select("fp", "keeper", "n_dups")

  /** d15 — block-level exact-substring dedup: the ExactSubstr idea (Lee et
    * al., "Deduplicating Training Data Makes Language Models Better")
    * re-expressed at block granularity so it runs as hash shuffles instead
    * of a corpus-wide suffix array. Each document is cut into
    * NON-OVERLAPPING `blockWords`-word blocks (full blocks only — a
    * trailing fragment carries partial-match noise, not signal); a block is
    * duplicated iff its md5 occurs more than once in the corpus — ANY
    * document, ANY position, so a passage repeated inside one document
    * counts exactly as a cross-document copy does — and each document
    * reports its duplicated-block fraction. This catches copied PASSAGES
    * inside otherwise-distinct documents, the case whole-doc hashing (d1)
    * scores 0 and whole-doc jaccard (d2) dilutes below threshold.
    *
    * Scale: one shuffle keyed by block hash (the df count), one hash join
    * back on that key, one keyed per-doc groupBy — no pairwise work, no
    * suffix array, state capped at #blocks = tokens/blockWords regardless
    * of duplicate structure. md5, not xxhash64, so the oracle's text-level
    * grouping and ours agree bit-for-bit across engines. */
  def dedupExactBlocks(documents: DataFrame, blockWords: Int = 16,
      flagFrac: Double = 0.25): DataFrame = {
    val blk = documents
      .withColumn("ws", split(col("text"), " "))
      // Spark's sequence(0, -1) DESCENDS (see shingles); sub-block docs
      // must be dropped before the generator, mirroring DuckDB's empty
      // generate_series(0, -1)
      .filter(size(col("ws")) >= blockWords)
      .withColumn("b",
        explode(expr(s"sequence(0, size(ws) DIV $blockWords - 1)")))
      .select(col("doc_id"),
        md5(array_join(
          slice(col("ws"), col("b") * blockWords + 1, lit(blockWords)),
          " ")).as("bh"))
    val dfc = blk.groupBy("bh").agg(count(lit(1)).as("df"))
    blk.join(dfc, "bh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_dup_blocks"))
      .withColumn("dup_frac", expr("CAST(n_dup_blocks AS DOUBLE) / n_blocks"))
      .withColumn("is_flagged", col("dup_frac") >= flagFrac)
      .select("doc_id", "n_blocks", "n_dup_blocks", "dup_frac", "is_flagged")
  }

  /** Distinct word-3gram shingles per doc. Generator + element_at instead
    * of a transform(...) lambda: higher-order functions drop out of
    * whole-stage codegen (interpreted eval per row), while explode +
    * ElementAt stay fully codegen'd. */
  def shingles(documents: DataFrame): DataFrame =
    documents
      .withColumn("ws", split(col("text"), " "))
      // docs under 3 words yield no trigrams: DuckDB's generate_series(1, n<=0)
      // is empty but Spark's sequence(1, 0) DESCENDS and would index element 0
      .filter(size(col("ws")) >= 3)
      .withColumn("i", explode(sequence(lit(1), size(col("ws")) - 2)))
      .select(col("doc_id"),
        concat_ws(" ", element_at(col("ws"), col("i")),
          element_at(col("ws"), col("i") + 1),
          element_at(col("ws"), col("i") + 2)).as("sh"))
      .distinct()

  /** All candidate pairs sharing ≥1 non-hub shingle, with exact jaccard
    * over the hub-filtered shingle universe.
    *
    * Scale: a shingle with document frequency f contributes f² rows to the
    * self-join, so one corpus-frequent ("hub") shingle makes the join
    * quadratic — and a shingle shared by hundreds of documents carries no
    * dedup signal anyway. Hubs (df > maxDf) are therefore removed from the
    * universe up front, stopword-style, and the jaccard is exact over the
    * REMAINING shingle sets — per-key join fan-out is bounded at maxDf².
    * (Verifying candidates against the unfiltered sets instead sounds
    * purer but costs a second pass over the shingle frame joined through
    * the candidate set — measured 6× slower at sf0.1 for identical dup
    * output, because near-threshold candidates vastly outnumber dups.)
    * Recall cost: a pair is missed only if every common shingle is a hub;
    * at jac ≥ 0.5 that means a near-duplicate made entirely of
    * corpus-frequent trigrams — threshold-bounded, and the oracle applies
    * the identical filter. */
  def jaccardPairs(documents: DataFrame, maxDf: Long = 20): DataFrame = {
    val sh = shinglesShared(documents)
    // self-join on the 8-byte shingle hash, not the 20-30-char string: the
    // shuffle ships (doc_id, hash) pairs only
    val hashed = sh.select(col("doc_id"), xxhash64(col("sh")).as("h"))
    // persist: feeds sizes + both sides of the self-join
    val rare = hashed.join(
        hashed.groupBy("h").agg(count(lit(1)).as("df")).filter(col("df") <= maxDf), "h")
      .select("doc_id", "h")
      .persist()
    val sizes = rare.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val common = rare.as("a").join(rare.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "sa"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "sb"), "doc_b")
      .withColumn("jac", expr("CAST(common AS DOUBLE) / (sa + sb - common)"))
  }

  /** d2 — n-gram jaccard dedup: pairs over threshold. */
  def dedupNgramJaccard(documents: DataFrame, threshold: Double = 0.5): DataFrame =
    jaccardPairs(documents)
      .filter(col("jac") >= threshold)
      .select("doc_a", "doc_b", "common", "sa", "sb", "jac")

  /** MinHash signatures: h_i(doc) = min over shingles of md5(i ':' sh) for
    * i in 1..12 — the "permutation" is the keyed MD5, portable across
    * engines because minimum-of-hex-strings is byte order in both.
    *
    * All 12 minima are aggregated in ONE groupBy pass (12 min columns), so
    * the shuffle carries #docs × 12 hex strings after map-side partial
    * aggregation — not #shingles × 12 exploded rows. */
  def minhashOf(shingleDf: DataFrame, numHashes: Int = 12): DataFrame = {
    val mins = (1 to numHashes).map(i =>
      min(expr(s"md5(concat('$i:', sh))")).as(s"h$i"))
    shingleDf.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** LSH band keys: 4 bands x 3 rows, hashed straight from the wide
    * signature columns (no collect_list, no second shuffle); docs sharing
    * any band key are candidates. */
  def lshBands(mh: DataFrame, rowsPerBand: Int = 3, numHashes: Int = 12): DataFrame = {
    val sigs = (0 until numHashes / rowsPerBand).map { b =>
      val cols = (1 to rowsPerBand).map(r => s"h${b * rowsPerBand + r}").mkString(", ")
      expr(s"md5(concat_ws('|', $cols))")
    }
    mh.select(col("doc_id"), posexplode(array(sigs: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "sig")
  }

  /** d3 — MinHash+LSH dedup: banded candidates, then exact jaccard computed
    * for the CANDIDATE PAIRS ONLY — this is the whole point of LSH at
    * scale: the quadratic verification work shrinks to the (tiny) band-
    * collision set, and every stage is a hash shuffle on a key (shingle,
    * band sig, pair), never an all-pairs product. */
  def dedupMinhashLsh(documents: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sh = shinglesShared(documents)
    // both sides of the candidate self-join read bands; persist so the
    // 12-hash minhash aggregation runs once, not twice
    val bands = lshBands(minhashOf(sh)).persist()
    val cands = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    // verify candidates only: intersect the two shingle sets per pair.
    // The candidate-pair and common-count frames scale with the CORPUS
    // (band collisions ~ O(N)), so they carry NO broadcast hint — a forced
    // broadcast would OOM the driver at 100 TB. Plain hash joins; AQE
    // broadcasts at runtime when a frame is genuinely small. The big
    // shingle frame is only ever hash-joined, never self-producted.
    val shA = sh.select(col("doc_id").as("doc_a"), xxhash64(col("sh")).as("h"))
    val shB = sh.select(col("doc_id").as("doc_b2"), xxhash64(col("sh")).as("h_b"))
    val common = shA
      .join(cands, "doc_a")
      .join(shB, col("doc_b") === col("doc_b2") && col("h") === col("h_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("common"))
    common.join(sizes.toDF("doc_a", "sa"), "doc_a")
      .join(sizes.toDF("doc_b", "sb"), "doc_b")
      .withColumn("jac", expr("CAST(common AS DOUBLE) / (sa + sb - common)"))
      .filter(col("jac") >= threshold)
      .select("doc_a", "doc_b", "jac")
  }

  /** d11 — incremental (new-vs-base) MinHash dedup: the crawl-increment
    * shape. Documents below `baseMaxId` are the EXISTING corpus; documents
    * at/above it are the NEW batch. Band-collision candidates are pruned
    * to pairs whose larger member is new BEFORE any verification — since
    * doc_b is the pair maximum, one predicate drops every base×base pair,
    * which previous increments already settled. Per-increment verification
    * work is O(collisions involving new docs), not O(corpus²) and not even
    * O(collisions(corpus)).
    *
    * At 100 TB the base side's signatures/bands are PRECOMPUTED and stored
    * (they are deterministic functions of the text, exactly what
    * [[minhashOf]]/[[lshBands]] emit), so an increment shingles only the
    * new batch and hash-joins its bands against the stored band table;
    * this method recomputes both sides from one frame because the
    * testdata ships as one table, with the same plan shape from the
    * candidate join on. `is_cross` distinguishes new-duplicates-of-base
    * (drop the new doc) from new-internal duplicates (keep one). */
  def dedupIncremental(documents: DataFrame, baseMaxId: Long = 250,
      threshold: Double = 0.5): DataFrame = {
    val sh = shinglesShared(documents)
    val bands = lshBands(minhashOf(sh)).persist()
    val cands = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .filter(col("doc_b") >= baseMaxId)
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val shA = sh.select(col("doc_id").as("doc_a"), xxhash64(col("sh")).as("h"))
    val shB = sh.select(col("doc_id").as("doc_b2"), xxhash64(col("sh")).as("h_b"))
    val common = shA
      .join(cands, "doc_a")
      .join(shB, col("doc_b") === col("doc_b2") && col("h") === col("h_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("common"))
    common.join(sizes.toDF("doc_a", "sa"), "doc_a")
      .join(sizes.toDF("doc_b", "sb"), "doc_b")
      .withColumn("jac", expr("CAST(common AS DOUBLE) / (sa + sb - common)"))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jac"),
        (col("doc_a") < baseMaxId).as("is_cross"))
  }

  /** d10 — MinHash calibration audit: for every LSH candidate pair,
    * the signature-estimated jaccard (matching minima / 12) against the
    * exact shingle-set jaccard — the measurement that justifies (or
    * indicts) the signature width and band/row split before anyone
    * trusts d3's candidate set at 100 TB. E[est] = jac, σ ≈
    * √(jac(1−jac)/12); pairs with |err| ≫ σ flag collision-prone
    * content shapes.
    *
    * Same scale discipline as d3: estimates come from the wide 12-column
    * signature frame (one keyed agg, no explode), exact jaccard is
    * candidate-only verification — the quadratic work never exceeds the
    * band-collision set.
    *
    * Scale: every pair-scaled frame here (candidates, per-pair common
    * counts, estimates) grows with the corpus, so NONE of them carries a
    * broadcast hint — plain hash joins on the pair key, AQE broadcasts at
    * runtime only when a frame is genuinely small. Calibration is a
    * DIAGNOSTIC, not a pipeline stage: at 100 TB run it on a sampled
    * candidate subset via `sampleOneIn > 1` (deterministic pair-hash
    * sampling — E[est]=jac holds on any unbiased subset, so a few million
    * pairs bound the error estimate regardless of corpus size). */
  def minhashCalibration(documents: DataFrame, sampleOneIn: Int = 1): DataFrame = {
    val sh = shinglesShared(documents)
    val mh = minhashOf(sh).persist() // feeds bands AND both estimate sides
    val bands = lshBands(mh).persist()
    val allCands = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    // deterministic pair-hash sampling commutes with distinct: filtering
    // BEFORE the dedup exchange means it only carries kept pairs
    val sampled = if (sampleOneIn <= 1) allCands
      else allCands.filter(
        pmod(xxhash64(col("doc_a"), col("doc_b")), lit(sampleOneIn)) === 0)
    val estExpr = (1 to 12)
      .map(i => when(col(s"a.h$i") === col(s"b.h$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    // est_matches is pair-determined, so it rides the candidate spine:
    // attach it right after the dedup and let the verification join-chain
    // carry it (one extra BIGINT per pair row) to the output — the old
    // pair-keyed est⋈common re-join and its exchanges disappear.
    val cands = sampled.distinct()
      .join(mh.as("a"), col("doc_a") === col("a.doc_id"))
      .join(mh.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"), estExpr.as("est_matches"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val shA = sh.select(col("doc_id").as("doc_a"), xxhash64(col("sh")).as("h"))
    val shB = sh.select(col("doc_id").as("doc_b2"), xxhash64(col("sh")).as("h_b"))
    val common = shA
      .join(cands, "doc_a")
      .join(shB, col("doc_b") === col("doc_b2") && col("h") === col("h_b"))
      .groupBy("doc_a", "doc_b", "est_matches") // est is a pair function
      .agg(count(lit(1)).as("common"))
    common.join(sizes.toDF("doc_a", "sa"), "doc_a")
      .join(sizes.toDF("doc_b", "sb"), "doc_b")
      .withColumn("jac_exact", expr("CAST(common AS DOUBLE) / (sa + sb - common)"))
      .withColumn("jac_est", expr("CAST(est_matches AS DOUBLE) / 12"))
      .withColumn("err", expr("CAST(est_matches AS DOUBLE) / 12 - jac_exact"))
      .select("doc_a", "doc_b", "est_matches", "jac_est",
        "common", "sa", "sb", "jac_exact", "err")
  }

  /** The minhash dup-pair frame as a pay-once shared artifact: d3 emits
    * it, and d6 (via the cluster labels), d8, x18 and x21 all consume it —
    * [[SharedFrames]] materializes it on first touch so one session never
    * runs the shingle→minhash→band→verify pipeline twice over the same
    * input. */
  def lshDupPairs(documents: DataFrame, threshold: Double = 0.5): DataFrame =
    SharedFrames.memo(documents, s"lsh-dup-pairs@$threshold")(
      dedupMinhashLsh(documents, threshold))

  /** x42 — the inter-source duplication matrix: per (source, source)
    * pair, how many near-duplicate pairs span them and how many distinct
    * documents they touch — the provenance report a data card publishes
    * (which feeds mirror which: a high cross-source cell means one crawl
    * re-ingests another's content; the diagonal is within-source
    * duplication). Pairs come from the memoized d3 artifact
    * ([[lshDupPairs]]), so the shingle→minhash→band pipeline is never
    * re-run; source attachment is two doc_id-keyed hash joins (pair-set
    * sized, AQE-planned), and the rollup is ≤ #sources² groups — the
    * output is catalog-sized at any corpus scale. `is_cross` separates
    * mirror-contamination cells from self-duplication. */
  def crossSourceDups(documents: DataFrame): DataFrame = {
    val src = documents.select(col("doc_id"), col("source"))
    val lab = lshDupPairs(documents).select("doc_a", "doc_b")
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .withColumn("src_a", least(col("sa"), col("sb")))
      .withColumn("src_b", greatest(col("sa"), col("sb")))
      .persist() // feeds the pair count AND the distinct-doc rollup
    val pairCounts = lab.groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_pairs"))
    val docCounts = lab
      .select(col("src_a"), col("src_b"),
        explode(array(col("doc_a"), col("doc_b"))).as("d"))
      .groupBy("src_a", "src_b")
      .agg(countDistinct("d").as("n_docs"))
    pairCounts.join(docCounts, Seq("src_a", "src_b"))
      .withColumn("is_cross", col("src_a") =!= col("src_b"))
      .select("src_a", "src_b", "n_pairs", "n_docs", "is_cross")
  }

  /** x43 — dedup-adjusted mixture weights: x17's temperature formula
    * computed on the POST-dedup corpus (one keeper per d6 cluster, the
    * min-doc_id rule d1/x18 use) next to the raw-corpus weights — the
    * "dedup before you weight" report: a source inflated by internal or
    * mirrored duplicates gets a large raw weight that collapses once
    * near-dups are removed, and `p_kept − p_raw` is exactly the mixture
    * correction dedup buys. All integer-quantized weights (the x17
    * discipline), so every double is a division/difference of identical
    * exact integers.
    *
    * Shape: tokens are computed in ONE corpus scan shared by the raw and
    * kept aggregates (persisted); keepers come from the memoized cluster
    * labels (the band pipeline never re-runs); the rollups are
    * O(#sources), the totals two 1-row broadcasts. A source whose every
    * document lost its cluster election keeps a row (LEFT join,
    * zero-coalesced) — dup_frac 1.0 is the report's loudest signal. */
  def dedupMixture(documents: DataFrame): DataFrame = {
    val toks = documents
      .withColumn("bpe_tokens", expr(
        """aggregate(transform(split(text, ' '),
             w -> CAST(floor((length(w) + 3) / 4.0) AS BIGINT)),
           CAST(0 AS BIGINT), (acc, x) -> acc + x)"""))
      .select("doc_id", "source", "bpe_tokens")
      .persist() // raw AND kept aggregates share the tokenizing scan
    val keepers = clusterLabels(documents)
      .groupBy("cluster_id").agg(min("doc_id").as("doc_id"))
    val raw = toks.groupBy("source")
      .agg(count(lit(1)).as("n_raw"), sum("bpe_tokens").as("tokens_raw"))
    val kept = toks.join(keepers.select("doc_id"), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("bpe_tokens").as("tokens_kept"))
    val joined = raw.join(kept, Seq("source"), "left")
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .withColumn("tokens_kept", coalesce(col("tokens_kept"), lit(0L)))
      .withColumn("w_raw", expr(
        "CAST(floor(sqrt(CAST(tokens_raw AS DOUBLE)) * 1000 + 0.5) AS BIGINT)"))
      .withColumn("w_kept", expr(
        "CAST(floor(sqrt(CAST(tokens_kept AS DOUBLE)) * 1000 + 0.5) AS BIGINT)"))
    val tot = joined.agg(sum("w_raw").as("wt_raw"), sum("w_kept").as("wt_kept"))
    joined.crossJoin(broadcast(tot))
      .withColumn("dup_frac", expr(
        "CAST(tokens_raw - tokens_kept AS DOUBLE) / tokens_raw"))
      .withColumn("p_raw", expr("CAST(w_raw AS DOUBLE) / wt_raw"))
      .withColumn("p_kept", expr("CAST(w_kept AS DOUBLE) / wt_kept"))
      .withColumn("p_shift", expr(
        "CAST(w_kept AS DOUBLE) / wt_kept - CAST(w_raw AS DOUBLE) / wt_raw"))
      .select("source", "n_raw", "tokens_raw", "n_kept", "tokens_kept",
        "dup_frac", "p_raw", "p_kept", "p_shift")
  }

  /** d6's cluster labels as a pay-once shared artifact (d9 re-consumes
    * them): connected components over [[lshDupPairs]], UNordered — the
    * oracle-facing [[dedupClusters]] adds the deterministic sort. */
  def clusterLabels(documents: DataFrame, threshold: Double = 0.5,
      maxIters: Int = 25): DataFrame =
    SharedFrames.memo(documents, s"dedup-clusters@$threshold/$maxIters") {
      val pairs = lshDupPairs(documents, threshold).select("doc_a", "doc_b")
      val edges = pairs
        .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        .toDF("src", "dst")
      val labels = ConnectedComponents.minLabel(
        documents.select(col("doc_id").as("id")), edges, maxIters)
        .select(col("id").as("doc_id"), col("component").as("cluster_id"))
      val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      labels.join(sizes, "cluster_id")
        .select("doc_id", "cluster_id", "cluster_size")
    }

  /** d6 — dedup cluster assignment: connected components over the minhash
    * dup-pair graph ([[ConnectedComponents.minLabel]] — min-label
    * propagation with pointer jumping, O(log n) rounds on any component
    * shape), each document labeled with the smallest doc_id in its
    * component (the cluster representative a keep-one-per-cluster pass
    * retains) plus the cluster size. */
  def dedupClusters(documents: DataFrame, threshold: Double = 0.5,
      maxIters: Int = 25): DataFrame =
    clusterLabels(documents, threshold, maxIters)

  /** x53 — leakage-safe train/val/test split: every document is assigned
    * its split by the salted hash of its near-dup CLUSTER id (the d6
    * component label), not its own id, so a near-duplicate pair can never
    * straddle splits — the structural FIX for the contamination x21 audits
    * (x21 measures how often a naive per-doc hash split leaks; this split
    * makes that count zero by construction). 80/10/10 via the hash's
    * residue mod 100 — deterministic, reproducible, and stable under
    * re-runs and NON-BRIDGING corpus append (an existing cluster's
    * assignment depends only on the cluster id = min member, so appended
    * docs that don't connect existing clusters change nothing). An
    * appended document that BRIDGES two previously-separate clusters
    * merges them: the merged component takes the smaller of the two min
    * members as its id, so the side whose min was larger is reassigned
    * AS A UNIT to the surviving cluster's split — near-dups still never
    * straddle, but that side's split label can move (spec-pinned:
    * the x53 bridging-append case in SplitBlocksSpec).
    *
    * Scale: the component labels are the memoized d6 artifact (pay-once);
    * the split itself is a per-row hash — no additional shuffle at all.
    * The salt is namespaced ('csplit') so the assignment is independent of
    * x11's sampling hash and x21's naive-split hash. */
  def clusterSplit(documents: DataFrame, seed: String = "graft"): DataFrame = {
    validateSeed(seed)
    clusterLabels(documents)
      .withColumn("h",
        md5(concat(lit(s"$seed:csplit:"), col("cluster_id").cast("string"))))
      .withColumn("bucket", expr(s"${hex13Num("h")} % 100"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
      .select("doc_id", "cluster_id", "cluster_size", "bucket", "split")
  }

  /** d4 — SimHash: 16-bit signature from MD5-hex-digit parity weighted by
    * token frequency; identical signature = dup bucket.
    *
    * Computed entirely per-row (nested higher-order functions), so the
    * signature stage needs NO shuffle at all — at 100 TB it pipelines over
    * the scan; the only shuffle is the final bucket count. The integer
    * sums are order-independent, so this matches the oracle's explode/
    * group-by formulation bit-for-bit. */
  /** x5 — top-k salient terms per document, ranked by (tf DESC, df ASC):
    * the tf-idf ordering expressed in exact integers — a float idf would
    * differ in final ulps across engines and break the oracle hash.
    * Two hash shuffles (doc-term counts, term document-frequencies); the
    * df side joins back by term (hash join, AQE-broadcast when small). */
  def topTerms(documents: DataFrame, k: Int = 3): DataFrame = {
    val words = documents.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
    val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(df, "term")
      .withColumn("rnk", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("tf").desc, col("df").asc, col("term").asc)).cast("int"))
      .filter(col("rnk") <= k)
      .select("doc_id", "rnk", "term", "tf", "df")
  }

  /** x47 — Count-Min sketch heavy-hitter audit, d10's
    * calibration-before-trust pattern applied to frequency sketching:
    * build the d×w CMS over the corpus token stream (d=4 md5-derived
    * row hashes, w=64 counters — the O(d·w) state that replaces an
    * O(|vocab|) exact count at 100 TB), then for the top-k exact terms
    * report the sketch estimate next to the exact count and the signed
    * overestimate. CMS guarantees estimate ≥ exact (each cell
    * upper-bounds every term hashing into it), which the spec pins; the
    * measured overestimate is the evidence that sizes (d, w) before
    * anyone trusts the sketch alone.
    *
    * Shape: term counts are ONE map-side-combinable keyed agg; the
    * sketch is a second keyed agg over (row, cell) — 256 cells
    * regardless of vocabulary — and the probe joins each audited term's
    * d cells back against that tiny frame (AQE-sized, never hinted).
    * Every counter is an exact BIGINT and the row hashes are the
    * portable hex13(md5) fold, so the audit hash-matches the oracle. */
  def cmsAudit(documents: DataFrame, depth: Int = 4, width: Int = 64,
      topK: Int = 20): DataFrame = {
    val counts = documents
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("exact"))
      .persist() // sketch build and audited-term probe share it
    val hashed = counts
      .withColumn("j", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("cell", expr(
        s"(${hex13Num("md5(concat(CAST(j AS STRING), ':', term))")}) % $width"))
    val cms = hashed.groupBy("j", "cell").agg(sum("exact").as("c"))
    // TakeOrdered top-k (x6's idiom), then rank within the k-row frame —
    // never a global window over the vocabulary
    val top = counts.orderBy(col("exact").desc, col("term")).limit(topK)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("exact").desc, col("term"))).cast("int"))
    top.withColumn("j", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("cell", expr(
        s"(${hex13Num("md5(concat(CAST(j AS STRING), ':', term))")}) % $width"))
      .join(cms, Seq("j", "cell"))
      .groupBy("term", "exact", "rnk")
      .agg(min("c").as("cms_est"))
      .withColumn("overestimate", col("cms_est") - col("exact"))
      .select("rnk", "term", "exact", "cms_est", "overestimate")
  }

  /** x49 — mergeable quantile sketch audit, x47's calibration-before-
    * trust pattern applied to rank statistics: per source, the
    * `graft_qsketch` bottom-k sample of the n_chars distribution next to
    * the EXACT x8-style histogram-selected quantiles and the signed rank
    * error of each estimate — the evidence that sizes k before a data
    * card trusts the sketch alone.
    *
    * Why the sketch exists: KMV covers distinct (x9/x10), CMS covers
    * frequency (x47); exact quantiles (x8/x33) need a BOUNDED value
    * range to histogram-select. Per-source length/score distributions at
    * 100 TB have neither bounded range nor sortable volume — the
    * mergeable sample sketch's ≤k-per-(group, partition) shuffle is the
    * answer there ([[graft.functions.QuantileSketch]]; DKW gives rank
    * error ε at k ≈ ln(2/δ)/(2ε²) independent of group size — the audit
    * k here is 16 so sampling ENGAGES on the gate corpus; a deployment
    * sizes k ≈ 16384 for ε ≈ 1.5%).
    *
    * Shape: the sketch is ONE map-side-combinable keyed agg (≤k values
    * per group per partition cross the shuffle); the exact side shrinks
    * to a (source, n_chars) histogram first, windows run over the
    * histogram, never over documents; rank(est) is a join of the 20-row
    * estimate frame back against the histogram's cumulative counts.
    * Everything is exact BIGINT on the portable hex13(md5) hash, so the
    * audit hash-matches the oracle. */
  def quantileSketchAudit(documents: DataFrame, k: Int = 16): DataFrame = {
    val h = documents.select(col("source"), col("n_chars").as("v"),
      expr(hex13Num("md5(concat(CAST(doc_id AS STRING), ':qs'))")).as("hv"))
    val sk = h.groupBy("source")
      .agg(expr(s"graft_qsketch(hv, v, $k)").as("sample"),
        count(lit(1)).as("n_docs"))
      .withColumn("k_actual", size(col("sample")).cast("long"))
    // rank ceil(q·k_actual) in the value-sorted sample = the q-quantile
    // estimate; ceil via x8's integer identity (doubles below 2^53)
    val est = sk
      .withColumn("p50_est", expr(
        "element_at(sample, CAST(floor((k_actual + 1) / 2.0) AS INT))"))
      .withColumn("p90_est", expr(
        "element_at(sample, CAST(floor((9 * k_actual + 9) / 10.0) AS INT))"))
      .withColumn("p99_est", expr(
        "element_at(sample, CAST(floor((99 * k_actual + 99) / 100.0) AS INT))"))
      .drop("sample")
    val hist = h.groupBy("source", "v").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("source").orderBy("v")
    val cum = hist
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(Window.partitionBy("source")))
    def exact(thresholdExpr: String, name: String) =
      cum.filter(expr(s"cum >= $thresholdExpr"))
        .groupBy("source").agg(min("v").as(name))
    val ex = exact("CAST(floor((n + 1) / 2.0) AS BIGINT)", "p50_exact")
      .join(exact("CAST(floor((9 * n + 9) / 10.0) AS BIGINT)", "p90_exact"), "source")
      .join(exact("CAST(floor((99 * n + 99) / 100.0) AS BIGINT)", "p99_exact"), "source")
    // every estimate is a real group value, so its rank is the histogram's
    // cumulative count AT that value — three joins of the 20-row frame
    def rank(estCol: String, errCol: String, mul: Int, den: Int)(df: DataFrame) =
      df.join(cum.select(col("source"), col("v").as(estCol),
          col("cum").as(s"__r_$estCol")), Seq("source", estCol))
        .withColumn(errCol, expr(
          s"CAST(__r_$estCol - floor(($mul * n_docs + $den - 1) / $den.0) AS BIGINT)"))
        .drop(s"__r_$estCol")
    val audited = rank("p99_est", "p99_rank_err", 99, 100)(
      rank("p90_est", "p90_rank_err", 9, 10)(
        rank("p50_est", "p50_rank_err", 1, 2)(est.join(ex, "source"))))
    audited.select("source", "n_docs", "k_actual",
        "p50_est", "p50_exact", "p50_rank_err",
        "p90_est", "p90_exact", "p90_rank_err",
        "p99_est", "p99_exact", "p99_rank_err")
  }

  /** x6 — corpus bigram vocabulary, top-N by frequency: the vocabulary-
    * building pass of a BPE-ish tokenizer pipeline. One hash shuffle on
    * the bigram (map-side combined), then a top-N sort of the tiny
    * aggregate. */
  def vocabBigrams(documents: DataFrame, topN: Int = 100): DataFrame =
    documents
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 2) // same guard as shingles, for bigrams
      .withColumn("i", explode(sequence(lit(1), size(col("ws")) - 1)))
      .select(concat_ws(" ", element_at(col("ws"), col("i")),
        element_at(col("ws"), col("i") + 1)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(topN)

  /** d8 — dedup-signal agreement: the lexical (MinHash-LSH jaccard) and
    * semantic (embedding cosine) near-dup detectors over the same corpus,
    * full-outer joined by pair — the audit a curation pipeline runs
    * before trusting either signal alone (lexical misses paraphrases,
    * semantic misses template boilerplate; disagreement rows are exactly
    * the cases to sample and inspect). Both inputs are already
    * candidate-bounded (band collisions / (label, LSH-bucket) cells), so
    * the agreement join is tiny-by-tiny. */
  def dedupAgreement(documents: DataFrame, embeddings: DataFrame,
      jacThreshold: Double = 0.5,
      // the synthetic embeddings carry no true semantic dups (max NN
      // cosine ≈ 0.41), so the demo threshold sits at the top tail; a
      // real corpus would use ~0.95 as d5 does
      cosThreshold: Double = 0.35): DataFrame = {
    val textPairs = lshDupPairs(documents, jacThreshold)
      .select(col("doc_a"), col("doc_b"), col("jac"))
    val embPairs = VectorOps.nearPairs(embeddings, cosThreshold)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"), col("cos"))
    textPairs.join(embPairs, Seq("doc_a", "doc_b"), "full_outer")
      .select(col("doc_a"), col("doc_b"), col("jac"), col("cos"),
        col("jac").isNotNull.as("in_text"),
        col("cos").isNotNull.as("in_embedding"))
  }

  /** d9 — dedup savings report: per near-dup cluster (d6's connected
    * components), the kept representative, how many documents drop, and
    * the bytes and tokens reclaimed — the "dedup saved X%" line of a
    * data card, computed from the engine's own cluster assignment.
    * Single-doc clusters are excluded (nothing saved). One hash join of
    * the labels to per-doc sizes + one keyed aggregation. */
  def dedupSavings(documents: DataFrame): DataFrame = {
    val sized = documents.select(col("doc_id"), col("n_chars"),
      expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_words"))
    dedupClusters(documents)
      .filter(col("cluster_size") > 1)
      .join(sized, "doc_id")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") =!= col("cluster_id"), col("n_chars"))
          .otherwise(0L)).as("chars_saved"),
        sum(when(col("doc_id") =!= col("cluster_id"), col("n_words"))
          .otherwise(0L)).as("words_saved"))
  }

  /** 16-bit SimHash signature per document.
    * Explode/groupBy instead of nested aggregate(...) lambdas: the
    * higher-order-function form runs interpreted (outside whole-stage
    * codegen) and re-hashes every word per bit position; this form does
    * one codegen'd md5 per word occurrence and 16 map-side-combinable
    * sum aggregates, so the shuffle carries #docs × 16 ints. */
  def simhashSigs(documents: DataFrame): DataFrame = {
    val words = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("m", md5(col("w")))
    val sumCols = (0 until 16).map(j =>
      sum(expr(s"(ascii(substring(m, ${j + 1}, 1)) % 2) * 2 - 1")).as(s"s$j"))
    val bitsExpr = (0 until 16)
      .map(j => s"CASE WHEN s$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")
    words.groupBy("doc_id").agg(sumCols.head, sumCols.tail: _*)
      .withColumn("simhash", expr(bitsExpr))
      .select("doc_id", "simhash")
  }

  /** d4 — SimHash exact-signature buckets. */
  def simhash(documents: DataFrame): DataFrame =
    simhashSigs(documents)
      .withColumn("n_same",
        count(lit(1)).over(Window.partitionBy("simhash")).cast("long"))
      .select("doc_id", "simhash", "n_same")

  /** d7 — SimHash NEAR-dup: pairs at hamming distance ≤ 1, found by
    * bit-flip probing instead of any pairwise comparison. Each signature
    * emits 17 probes (itself + its 16 one-bit flips); a probe of doc A
    * equal to the raw signature of doc B means ham(A,B) ∈ {0, 1}, and each
    * qualifying pair matches on exactly one probe, so the join output IS
    * the pair set — no dedup pass. Scale: the probe side is a constant
    * 17× row multiplication feeding one hash join on the signature key;
    * generalizing to distance k costs C(16,≤k) probes, never a cartesian. */
  def simhashNear(documents: DataFrame): DataFrame = {
    val sigs = simhashSigs(documents).persist()
    val probes = sigs
      .withColumn("j", explode(sequence(lit(0), lit(16))))
      .withColumn("probe", expr(
        "CASE WHEN j = 16 THEN simhash ELSE CAST(simhash ^ shiftleft(CAST(1 AS BIGINT), j) AS BIGINT) END"))
      .select(col("doc_id").as("doc_a"), col("simhash").as("sig_a"), col("probe"))
    val raw = sigs.select(col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    probes.join(raw, col("probe") === col("sig_b") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"),
        expr("CAST(bit_count(sig_a ^ sig_b) AS INT)").as("hamming"))
  }

  /** d13 — PageRank over the near-dup graph (nodes = documents, edges =
    * d7's hamming≤1 SimHash pairs, symmetrized): the authority score for
    * picking CANONICAL representatives inside duplicate neighborhoods —
    * the doc most linked-to by near-copies is the one to keep (x24 picks
    * by quality; this is the graph-centrality alternative), and the rank
    * distribution is a corpus-health signal (heavy tails = template
    * farms).
    *
    * Power iteration in exact integer arithmetic on a 2^30 grid: each
    * round, node u sends floor(85·r(u) / (100·deg(u))) along every edge
    * (the d=0.85 damping as exact rational floor-division — `DIV` here,
    * `//` in the oracle, identical on positive operands) and every node
    * restarts from floor(15·2^30 / (100·N)); dangling mass retires to
    * the teleport term (the standard simplified variant, stated). All
    * BIGINT, so ranks hash-match the round-unrolled oracle exactly.
    *
    * Scale: the Pregel shape — per round ONE hash join of the rank frame
    * onto the edge list plus ONE keyed sum, lineage truncated per round
    * (the [[ConnectedComponents]] discipline); ranks never visit the
    * driver (unlike the k-bounded centroid loops), and nothing sorts or
    * windows globally. */
  def pageRankNearDup(documents: DataFrame, iters: Int = 10): DataFrame =
    // session-shared pay-once artifact (SharedFrames discipline): the
    // 10-round chain + signature build land in the first consumer /
    // bench warmup; later calls read the checkpoint. The releasing
    // variant frees the edge/node persists and the terminal round's
    // checkpoint the moment the memoized result is self-contained — in
    // r7 they lingered for the session on every invocation.
    SharedFrames.memoReleasing(documents, s"pagerank-neardup iters=$iters") {
      pageRankNearDupChain(documents, iters)
    }

  /** The un-memoized chain, reachable for the 10× scale rehearsal (the
    * memoized form executes as a checkpoint scan, so the rehearsal's plan
    * audit must walk THIS). Returns the LAZY terminal frame (rounds
    * 1..iters are eagerly checkpointed, each freeing its predecessor's
    * blocks as soon as it materializes) plus a release thunk the caller
    * runs once the terminal frame is executed/checkpointed — it frees the
    * edge and node persists and the last round's checkpoint. */
  private[graft] def pageRankNearDupChain(documents: DataFrame,
      iters: Int): (DataFrame, () => Unit) = {
    val Q = 1L << 30
    val pairs = simhashNear(documents).select("doc_a", "doc_b")
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = documents.select("doc_id").persist()
    val n = nodes.count()
    val init = Q / n
    val base = (15L * Q) / (100L * n)
    var r = nodes.withColumn("r", lit(init))
    var prevCkpt: DataFrame = null
    for (_ <- 1 to iters) {
      val contrib = edges.join(deg, "src")
        .join(r.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst"), expr("(85L * r) DIV (100L * deg)").as("c"))
        .groupBy("dst").agg(sum("c").as("in_mass"))
      val next = nodes.join(contrib.withColumnRenamed("dst", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(base) + coalesce(col("in_mass"), lit(0L))).as("r"))
        .localCheckpoint(true)
      // the eager checkpoint above materialized from the previous round's
      // blocks; they are dead weight from here on — free them in-loop so
      // peak footprint is 2 rank tables, not `iters` of them
      if (prevCkpt != null) prevCkpt.unpersist()
      prevCkpt = next
      r = next
    }
    val out = r.join(deg.withColumnRenamed("src", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("deg"), lit(0L)).as("deg"),
        col("r").as("rank_q"),
        expr(s"CAST(r AS DOUBLE) / ${Q}e0").as("rank"))
    val lastCkpt = prevCkpt
    (out, () => {
      edges.unpersist(); nodes.unpersist()
      if (lastCkpt != null) lastCkpt.unpersist()
    })
  }

  /** x22 — C4-style boilerplate-line removal (the "discard any line seen
    * in N+ documents" rule of the C4/RefinedWeb cleaning recipes,
    * applied corpus-wide): count each line's document frequency, drop
    * lines at df ≥ minDf, and reassemble each document from its kept
    * lines in original order. This corpus has no newline structure, so a
    * "line" is a fixed [[lineWords]]-word segment; on real data the
    * splitter is `split(text, '\n')` and nothing else changes.
    *
    * Scale: line-df is ONE hash aggregation keyed by line. The
    * boilerplate set (df ≥ minDf) is NOT force-broadcast: at the default
    * minDf = 2 it is exactly the duplicated-line set, which grows with
    * the corpus on real web data (the same argument [[duplicatedSpanScrub]]
    * makes for dup spans) — so the join back is a plain hash join on the
    * line and AQE promotes it to broadcast only when the set measures
    * genuinely small at runtime (e.g. production C4-style high-df
    * thresholds). Reassembly state is bounded by document length, never
    * corpus size. */
  def boilerplateLines(documents: DataFrame, lineWords: Int = 8,
      minDf: Int = 2): DataFrame = {
    val lines = documents
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, CAST(ceil(size(ws) / $lineWords.0) AS INT) - 1),
            i -> array_join(slice(ws, i * $lineWords + 1, $lineWords), ' '))"""))
        .as(Seq("idx", "line")))
      .persist()
    val boiler = lines.groupBy("line")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df") >= minDf)
      .select("line")
    // persist above: the exploded-lines frame feeds both the df agg and
    // the join; released with the session (same contract as decontaminate)
    lines.join(boiler.withColumn("is_boiler", lit(true)),
        Seq("line"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("is_boiler"), 1L).otherwise(0L)).as("n_boiler"),
        // kept lines in original order; md5('') when everything was dropped
        md5(array_join(transform(
          array_sort(collect_list(when(col("is_boiler").isNull,
            struct(col("idx"), col("line"))))),
          x => x.getField("line")), " ")).as("clean_md5"))
      .withColumn("kept_frac",
        expr("CAST(n_lines - n_boiler AS DOUBLE) / n_lines"))
      .select("doc_id", "n_lines", "n_boiler", "kept_frac", "clean_md5")
  }

  /** Deterministic PII injection: the corpus is synthetic word-salad with
    * no emails/phones/IPs, so (exactly like the CDC type matrix derives
    * MySQL-typed columns arithmetically) each document's wire text gets a
    * doc_id-derived PII suffix — none / one type / all three — and the
    * redactor is exercised against known ground truth. Valid verbatim in
    * Spark SQL and DuckDB. */
  val PiiWireExpr: String =
    """text || CASE CAST(doc_id % 5 AS INT)
       WHEN 0 THEN ' contact user' || CAST(doc_id AS STRING) || '@mail.example.com now'
       WHEN 1 THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') || ' today'
       WHEN 2 THEN ' host 10.' || CAST(doc_id % 256 AS STRING) || '.0.' || CAST((doc_id * 7) % 256 AS STRING) || ' up'
       WHEN 3 THEN ' reach admin@example.org or 10.1.2.3 via 650-555-0199'
       ELSE '' END"""

  val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiPhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val PiiIpRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** x23 — PII scan + redaction: per-type match counts and the text with
    * emails/phones/IPv4s replaced by placeholder tags — the scrubbing
    * pass every training-data pipeline runs before tokenization. The
    * patterns are RE2-safe (no lookaround), so Spark's Java regex and the
    * oracle's RE2 agree. Pure narrow projection: counts and replacement
    * are per-row, codegen'd, zero shuffle at any scale. Redaction order
    * (email, then phone, then IP) is part of the contract — placeholder
    * text must never re-match a later pattern. */
  def piiRedact(documents: DataFrame): DataFrame =
    documents
      .withColumn("wire_text", expr(PiiWireExpr))
      .withColumn("n_email", regexp_count(col("wire_text"), lit(PiiEmailRe)).cast("long"))
      .withColumn("n_phone", regexp_count(col("wire_text"), lit(PiiPhoneRe)).cast("long"))
      .withColumn("n_ip", regexp_count(col("wire_text"), lit(PiiIpRe)).cast("long"))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(col("wire_text"), PiiEmailRe, "<EMAIL>"),
            PiiPhoneRe, "<PHONE>"),
          PiiIpRe, "<IP>"))
      .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ip"),
        (col("n_email") + col("n_phone") + col("n_ip") > 0).as("has_pii"),
        md5(col("redacted")).as("red_md5"))

  /** The (doc_id, start, window-hash) frame shared by x27's detection and
    * x32's scrub — a SharedFrames pay-once artifact, like the d3 dup-pair
    * frame: one bench session computes the stride-1 window hashes once.
    *
    * The hash is the native ROLLING polynomial
    * ([[graft.functions.RollingSpanHashes]], r9): one O(n_words) pass per
    * document emits every window hash at ANY span length — the
    * md5-of-joined-window form cost O(n_words · spanWords) and was the
    * promised-but-deferred 100 TB fix. Same narrow no-shuffle plan shape;
    * `h` is a 48-bit BIGINT now instead of an md5 hex string (smaller
    * shuffle keys for every downstream join, too). */
  private def spanWindows(documents: DataFrame, spanWords: Int): DataFrame =
    SharedFrames.memoPersisted(documents, s"span-windows-$spanWords") {
      documents
        .withColumn("ws", split(col("text"), " "))
        .filter(size(col("ws")) >= spanWords)
        .select(col("doc_id"),
          posexplode(expr(s"graft_span_hashes(ws, $spanWords)")).as(Seq("i0", "h")))
        .select(col("doc_id"), (col("i0") + 1).as("i"), col("h"))
    }

  /** Window hashes appearing in ≥2 distinct docs — the dup table both
    * consumers join against (hash join on h; this table scales with the
    * corpus, so it is never broadcast). */
  private def spanDupSet(documents: DataFrame, spanWords: Int): DataFrame =
    SharedFrames.memoPersisted(documents, s"span-dup-$spanWords") {
      spanWindows(documents, spanWords)
        .groupBy("h").agg(countDistinct("doc_id").as("docs"))
        .filter(col("docs") >= 2).select("h")
    }

  /** x27 — duplicated-span detection: the exact-substring dedup signal
    * (the "dedup at 50-token granularity" result of the training-data
    * dedup literature), approximated at fixed `spanWords`-word windows
    * with stride 1. A window occurring in ≥2 DISTINCT documents is a
    * duplicated span; each document reports its window count, how many
    * of its window instances are duplicated, and the duplicated
    * fraction — the signal that catches partial overlap (shared
    * paragraphs, quoted passages) that whole-document dedup (d1) and
    * line-level removal (x22) both miss.
    *
    * Scale: ~n_words window rows per document feed ONE keyed hash agg on
    * the window hash (map-side partials), and the per-doc rollup joins
    * back on that key — all hash-partitioned, nothing pairwise. The hash
    * IS the rolling (Rabin-Karp) polynomial since r9
    * ([[graft.functions.RollingSpanHashes]]): each window costs O(1)
    * regardless of `spanWords`, so arbitrary span lengths price the same.
    * Documents shorter than a window report zero windows (left join). */
  def duplicatedSpans(documents: DataFrame, spanWords: Int = 16): DataFrame = {
    val wins = spanWindows(documents, spanWords)
    val dup = spanDupSet(documents, spanWords).withColumn("is_dup", lit(true))
    val perDoc = wins.join(dup, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"))
    documents.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("dup_frac", expr(
        "CASE WHEN n_windows = 0 THEN 0e0 ELSE CAST(n_dup AS DOUBLE) / n_windows END"))
  }

  /** x32 — duplicated-span REMOVAL: the completion of x27's detection
    * (as x22's reassembly is to its line-df detection): every token
    * covered by any ≥2-doc duplicated 16-word window is dropped and the
    * cleaned document reassembled in order — the exact-substring dedup
    * scrub of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", at window granularity.
    *
    * Scale: the duplicated-window table grows with the corpus, so it is
    * a HASH join on the window hash (never broadcast — unlike x22's
    * boilerplate head, dup spans are not a small head); coverage
    * positions explode 16× per dup instance, dedupe on (doc_id, pos),
    * and mark tokens via one co-keyed left join. Reassembly is the x22
    * collect-in-order idiom, bounded per doc by document length. */
  def spanScrub(documents: DataFrame, spanWords: Int = 16): DataFrame = {
    val toks = documents
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "w")))
    val wins = spanWindows(documents, spanWords)
    val dup = spanDupSet(documents, spanWords)
    // 0-based token positions covered by a duplicated window instance
    val covered = wins.join(dup, "h")
      .select(col("doc_id"),
        explode(sequence(col("i") - 1, col("i") + (spanWords - 2))).as("pos"))
      .distinct()
    toks.join(covered.withColumn("is_cov", lit(true)), Seq("doc_id", "pos"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("is_cov"), 1L).otherwise(0L)).as("n_removed"),
        // kept tokens in original order; md5('') when everything dropped
        md5(array_join(transform(
          array_sort(collect_list(when(col("is_cov").isNull,
            struct(col("pos"), col("w"))))),
          x => x.getField("w")), " ")).as("clean_md5"))
      .withColumn("kept_frac",
        expr("CAST(n_tokens - n_removed AS DOUBLE) / n_tokens"))
      // UNORDERED output by contract (see shardExport) — the registry
      // wrapper orders by doc_id for the driver's hash gate only
      .select("doc_id", "n_tokens", "n_removed", "kept_frac", "clean_md5")
  }

  /** x39 — span-level eval decontamination: the n-gram-overlap rule of
    * the published LM decontamination recipes (GPT-3 ran 13-gram overlap
    * against its eval sets; Llama-era pipelines the same shape), reported
    * at WINDOW granularity. Documents below `benchMaxId` stand in for the
    * held-out benchmark; a training document's `spanWords`-word window
    * matching ANY benchmark window is a contaminated span. x12 flags
    * whole documents by shingle-set overlap — this reports WHERE the
    * contamination sits: contaminated token positions (overlapping hit
    * windows unioned per position, the x32 coverage trick), per document
    * the covered-token count/fraction and the distinct matching windows —
    * the report that drives span-level scrubbing instead of whole-doc
    * dropping. `spanWords` defaults to 4 on this short-doc synthetic
    * corpus (13 on real web text; only the parameter changes).
    *
    * Scale: windows come from the memoized [[spanWindows]] frame (shared
    * with x27/x32); the benchmark window set is eval-suite-sized —
    * corpus-INDEPENDENT, the one frame here that is legitimately small —
    * but carries no hint: AQE measures and broadcasts it at runtime. The
    * hit join is one hash join on the window hash, coverage is a keyed
    * distinct + agg per doc, nothing pairwise, nothing global. */
  /** The stored benchmark window-hash artifact x39 and its streaming form
    * ([[graft.streaming.StreamingAnalytics.evalContaminationStream]]) both
    * join against: distinct `spanWords`-word window hashes of the
    * benchmark stand-in (docs below `benchMaxId`). At deployment this is
    * a published table rebuilt when the eval suite changes. */
  def evalBenchmarkWindows(documents: DataFrame, spanWords: Int = 4,
      benchMaxId: Long = 10): DataFrame =
    spanWindows(documents, spanWords)
      .filter(col("doc_id") < benchMaxId).select("h").distinct()

  def evalSpanContamination(documents: DataFrame, spanWords: Int = 4,
      benchMaxId: Long = 10): DataFrame = {
    val wins = spanWindows(documents, spanWords)
    val bench = evalBenchmarkWindows(documents, spanWords, benchMaxId)
    val hits = wins.filter(col("doc_id") >= benchMaxId).join(bench, "h")
    val covered = hits.select(col("doc_id"),
        explode(sequence(col("i"), col("i") + (spanWords - 1))).as("pos"))
      .distinct()
    val toks = documents.filter(col("doc_id") >= benchMaxId)
      .select(col("doc_id"), expr("size(split(text, ' '))").cast("long").as("n_tokens"))
    val contam = covered.groupBy("doc_id").agg(count(lit(1)).as("n_contam_tokens"))
    val winHits = hits.groupBy("doc_id").agg(countDistinct("h").as("n_hit_windows"))
    // UNORDERED output by contract (see shardExport) — the registry
    // wrapper orders by doc_id for the driver's hash gate only
    toks.join(contam, Seq("doc_id"), "left").join(winHits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_contam_tokens"), lit(0L)).as("n_contam_tokens"),
        coalesce(col("n_hit_windows"), lit(0L)).as("n_hit_windows"),
        expr("CAST(coalesce(n_contam_tokens, 0) AS DOUBLE) / n_tokens").as("contam_frac"))
  }

  /** x46 — eval-span SCRUB: the ACTION x39's contamination report
    * drives, completing the report→surgery symmetry x27→x32 set (drop
    * only the overlapping spans, keep the document): every training-doc
    * token covered by a window that also appears in the benchmark set is
    * removed and the cleaned document reassembled in original order —
    * the span-level alternative to x12's whole-doc drop, which is what
    * published pipelines actually ship when a long document merely
    * quotes an eval item. Plan shape is x32's surgery with x39's
    * coverage set: the window frames are the SAME memoized artifacts
    * both reports use (never recomputed), coverage is one hash join +
    * explode + distinct, and the reassembly is per-doc bounded. */
  def evalSpanScrub(documents: DataFrame, spanWords: Int = 4,
      benchMaxId: Long = 10): DataFrame = {
    val toks = documents.filter(col("doc_id") >= benchMaxId)
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "w")))
    val wins = spanWindows(documents, spanWords)
    val bench = evalBenchmarkWindows(documents, spanWords, benchMaxId)
    val covered = wins.filter(col("doc_id") >= benchMaxId).join(bench, "h")
      .select(col("doc_id"),
        explode(sequence(col("i") - 1, col("i") + (spanWords - 2))).as("pos"))
      .distinct()
    toks.join(covered.withColumn("is_cov", lit(true)), Seq("doc_id", "pos"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("is_cov"), 1L).otherwise(0L)).as("n_removed"),
        md5(array_join(transform(
          array_sort(collect_list(when(col("is_cov").isNull,
            struct(col("pos"), col("w"))))),
          x => x.getField("w")), " ")).as("clean_md5"))
      .withColumn("kept_frac",
        expr("CAST(n_tokens - n_removed AS DOUBLE) / n_tokens"))
      // UNORDERED output by contract (see shardExport) — the registry
      // wrapper orders by doc_id for the driver's hash gate only
      .select("doc_id", "n_tokens", "n_removed", "kept_frac", "clean_md5")
  }

  /** x25 — unigram-LM surprisal scoring (the CCNet-style "how unusual is
    * this document under a corpus LM" quality signal, with the LM reduced
    * to unigrams so it is exactly checkable): per-token surprisal is
    * -log2 p(w) = log2(T / c(w)) bits against the corpus's own token
    * distribution, quantized once per DISTINCT token to the 2^20 integer
    * grid; a document's score is the exact BIGINT sum of its tokens'
    * quantized surprisals. High bits/token = rare vocabulary (novel or
    * noise), low = boilerplate-heavy — the ranking CCNet's perplexity
    * buckets use.
    *
    * Exactness: floor(log2(double(T)/c)·2^20) is one division + one log2
    * + one multiply + one floor over identical integers in both engines,
    * computed once per vocab entry; the per-doc aggregation is then an
    * order-independent integer sum, never a float accumulation.
    *
    * SHARED-LIBM ASSUMPTION (applies to every 2^20-grid quantization that
    * feeds log2/ln through floor — x25 here, and x28/x29/x30/x33): libm's
    * log is faithfully- but not correctly-rounded (≤1 ulp), so a log
    * result landing EXACTLY on a grid boundary could in principle floor
    * to adjacent cells in two engines using different libms. Both engines
    * here (JVM StrictMath-backed Math.log and DuckDB) agree on this box
    * and at sf0.1; the grid is 2^20 so a boundary hit needs the log's
    * 52-bit mantissa to end in 32 zero bits — ~2^-32 per distinct vocab
    * entry. If a future engine/libm pairing ever trips this, quantize
    * through a correctly-rounded log (or compare with one-cell
    * tolerance); the house rule's integer SUM stays exact either way.
    *
    * Scale: vocab build is one keyed hash agg (scales like d1); the
    * token→bits join is a hash join on the token (AQE-broadcast when the
    * vocab head is small); the per-doc sum combines map-side. T reaches
    * the plan via one broadcast single-row frame, not a collected
    * constant baked into the query. */
  def unigramSurprisal(documents: DataFrame): DataFrame =
    // session memo (r14): x25 and x33 both consume this per-doc frame —
    // the langId/shingles pay-once discipline; at 100 TB this is a
    // written model-scored projection. memoReleasing: the inner tf
    // persist is freed the moment the memoized result is self-contained
    // (consumers are sort/aggregate shaped, so checkpoint stats-unknown
    // sizing is harmless here).
    SharedFrames.memoReleasing(documents, "unigram-surprisal") {
      // r14: aggregate the token stream to per-(doc, word) tf FIRST —
      // the vocab model table then joins back against per-doc DISTINCT
      // words (b·tf reassociates exactly in BIGINT), so the w-keyed join
      // moves ~2× fewer rows than the raw token stream and the (doc, w)
      // exchange map-side-combines repeats. Value-identical:
      // Σ_tokens b(w) = Σ_(w) tf·b(w).
      val tf = documents.select(col("doc_id"),
          explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        .persist() // feeds the vocab aggregation AND the scoring join
      val vocab = tf.groupBy("w").agg(sum("tf").as("c"))
      val tot = vocab.agg(sum("c").as("t_total"))
      val bits = vocab.crossJoin(broadcast(tot))
        .withColumn("b", expr(
          "CAST(floor(log2(CAST(t_total AS DOUBLE) / c) * 1048576e0) AS BIGINT)"))
        .select("w", "b")
      val perDoc = tf.join(bits, "w")
        .groupBy("doc_id")
        .agg(sum("tf").as("n_tokens"), expr("sum(tf * b)").as("bits_q"))
        .withColumn("bits_per_token",
          expr("CAST(bits_q AS DOUBLE) / n_tokens / 1048576e0"))
        .select("doc_id", "n_tokens", "bits_q", "bits_per_token")
      (perDoc, () => { tf.unpersist(); () })
    }

  /** x48 — interpolated BIGRAM-LM surprisal: one model order past x25's
    * unigram score, the next rung toward CCNet's KenLM perplexity filter
    * while staying exactly checkable. Per bigram position,
    * p(w2 | w1) = (3·p_bi + p_uni)/4 — Jelinek-Mercer interpolation with
    * a rational λ = 3/4, so the unigram backoff covers contexts the
    * corpus barely saw (the reason raw-bigram surprisal is unusable as a
    * quality score). The surprisal -log2 p is quantized ONCE per
    * DISTINCT bigram to the 2^20 grid (x25's discipline — the per-doc
    * aggregation is then an order-independent BIGINT sum; the shared-
    * libm log2 assumption documented at x25 applies).
    *
    * Scale: the bigram model table grows ~linearly with the corpus
    * (Heaps' law on bigrams), so it joins back by HASH on (w1, w2) —
    * never broadcast; context counts derive from the bigram frame
    * (never a second scan), the unigram side is x25's one keyed agg.
    * Docs with <2 tokens have no bigram positions and emit no row —
    * score them with x25. */
  /** The per-document adjacent-bigram stream (narrow explode). */
  private[graft] def bigramStream(documents: DataFrame): DataFrame =
    documents
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 2)
      .withColumn("i", explode(sequence(lit(1), size(col("ws")) - 1)))
      .select(col("doc_id"), expr("ws[i - 1]").as("w1"), expr("ws[i]").as("w2"))

  /** x48's trained LM as stored artifacts: the (w1, w2, b) quantized
    * interpolated-surprisal table plus the (w2, b_uni) unigram-BACKOFF
    * table — b_uni is the c_bi = 0 limit of the same interpolation
    * (p = p_uni/4), which is what a bigram UNSEEN in training costs a
    * streaming document ([[graft.streaming.StreamingAnalytics.lmQualityAdmissionStream]]).
    * Session-memoized like every trained artifact. */
  private[graft] def bigramLmModel(documents: DataFrame): (DataFrame, DataFrame) = {
    val bcnt = bigramStream(documents).groupBy("w1", "w2")
      .agg(count(lit(1)).as("c_bi"))
    val ctx = bcnt.groupBy("w1").agg(sum("c_bi").as("c_ctx"))
    val uni = documents.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_uni"))
    val tot = uni.agg(sum("c_uni").as("t_total"))
    val bi = SharedFrames.memoPersisted(documents, "x48-bigram-model") {
      bcnt.join(ctx, "w1")
        .join(uni.select(col("w").as("w2"), col("c_uni")), "w2")
        .crossJoin(broadcast(tot))
        .withColumn("b", expr(BigramBitsExpr))
        .select("w1", "w2", "b")
    }
    val uniBackoff = SharedFrames.memoPersisted(documents, "x48-unigram-backoff") {
      uni.crossJoin(broadcast(tot))
        .withColumn("b_uni", expr(
          "CAST(floor(log2(4e0 * t_total / c_uni) * 1048576e0) AS BIGINT)"))
        .select(col("w").as("w2"), col("b_uni"))
    }
    (bi, uniBackoff)
  }

  def bigramSurprisal(documents: DataFrame): DataFrame = {
    val big = bigramStream(documents)
    val (model, _) = bigramLmModel(documents)
    big.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("b").as("bits_q"))
      .withColumn("bits_per_bigram",
        expr("CAST(bits_q AS DOUBLE) / n_bigrams / 1048576e0"))
      .select("doc_id", "n_bigrams", "bits_q", "bits_per_bigram")
  }

  /** x48's quantized interpolated surprisal — ONE shared fragment spliced
    * into both engines so the double arithmetic cannot drift (both parse
    * `/` on integers as IEEE division; the casts are explicit where the
    * engines' implicit rules differ). */
  val BigramBitsExpr: String =
    "CAST(floor(log2(4e0 / (3e0 * c_bi / c_ctx + CAST(c_uni AS DOUBLE) / t_total)) " +
      "* 1048576e0) AS BIGINT)"

  /** x33 — CCNet-style perplexity bucketing: split the corpus into
    * head/middle/tail tertiles by unigram-LM bits-per-token (x25's
    * signal) and report each bucket's size, token mass, and mean
    * bits/token — the standard "keep the head, downsample the tail"
    * curation split.
    *
    * Exact selection WITHOUT a global sort: per-doc bits-per-token is
    * coarsened to a 1/1024-bit integer grid (`bits_q DIV n_tokens DIV
    * 1024`), whose histogram is bounded by the bits/token RANGE (a few
    * thousand cells for any real corpus) regardless of corpus size — the
    * x8 histogram-selection pattern; the cumulative window runs over
    * that control-plane-sized frame only, and tertile thresholds
    * broadcast back. Ties share a cell, so buckets can be uneven —
    * deterministic in both engines by construction. */
  def perplexityBuckets(documents: DataFrame): DataFrame = {
    val perDoc = unigramSurprisal(documents)
      .withColumn("btq", expr("bits_q DIV n_tokens DIV 1024"))
      .persist() // feeds the histogram AND the bucket assignment
    val hist = perDoc.groupBy("btq").agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum", sum("c").over(
        Window.orderBy("btq").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(perDoc.agg(count(lit(1)).as("n"))))
    val thr = cum.agg(
      min(when(expr("cum >= CAST(ceil(n / 3e0) AS BIGINT)"), col("btq"))).as("t1"),
      min(when(expr("cum >= CAST(ceil(2e0 * n / 3e0) AS BIGINT)"), col("btq"))).as("t2"))
    perDoc.crossJoin(broadcast(thr))
      .withColumn("bucket", expr(
        "CASE WHEN btq <= t1 THEN '1_head' WHEN btq <= t2 THEN '2_middle' ELSE '3_tail' END"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("bits_q").as("bits_q"))
      .withColumn("avg_bits_per_token",
        expr("CAST(bits_q AS DOUBLE) / n_tokens / 1048576e0"))
      .select("bucket", "n_docs", "n_tokens", "avg_bits_per_token")
  }

  /** x24 — near-dup cluster representative selection: instead of d6's
    * keep-smallest-id rule, keep each cluster's HIGHEST-QUALITY member
    * (quality-aware dedup — the pass a curation pipeline actually runs,
    * so a polished original survives over its mangled mirror). Rep =
    * argmax quality_score, ties to the smaller doc_id; both engines
    * compute the score from identical integer inputs, so the doubles —
    * and the argmax — agree exactly.
    *
    * Scale: reuses the session-shared cluster labels ([[clusterLabels]],
    * pay-once), joins the per-doc quality projection, and reduces with a
    * map-side-combinable min_by — one keyed shuffle of one row per doc,
    * no window, no sort. */
  def clusterRepresentatives(documents: DataFrame): DataFrame = {
    val labels = clusterLabels(documents)
    val quality = qualityScore(documents).select("doc_id", "quality_score")
    labels.join(quality, "doc_id")
      .groupBy("cluster_id")
      .agg(
        max(col("cluster_size")).as("cluster_size"),
        min_by(col("doc_id"),
          struct(negate(col("quality_score")), col("doc_id"))).as("rep_doc"),
        min_by(col("quality_score"),
          struct(negate(col("quality_score")), col("doc_id"))).as("rep_quality"))
      .withColumn("n_dropped", col("cluster_size") - 1)
      .select("cluster_id", "cluster_size", "rep_doc", "rep_quality", "n_dropped")
  }

  /** x30 — per-source distribution drift: KL(P_source ‖ P_corpus) over
    * the unigram distribution, the dataset-monitoring number that flags
    * a source whose language shifted relative to the mixture (scraper
    * regressions, template floods) before it poisons a training run.
    *
    * Exactness: each (source, word) KL contribution
    * p·log2(p/q) — p, q single IEEE divisions of exact BIGINT counts —
    * is quantized to the 2^20 grid per term, and the per-source KL is
    * the exact BIGINT sum (a float Σ would be aggregation-order-
    * sensitive; contributions are signed, so ordering would matter).
    *
    * Plan shape: ONE keyed agg onto (source, word) — map-side
    * combinable, output is O(sources·vocab) — then corpus/word and
    * per-source totals derive from THAT frame (never a second corpus
    * scan) and join back AQE-sized: vocabulary grows with the corpus
    * (Heaps' law), so the code never forces a broadcast of it; only the
    * 1-row grand total keeps a hint. */
  def sourceDrift(documents: DataFrame): DataFrame = {
    val sw = documents
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
      .persist() // feeds the per-source totals AND the contribution pass
    // r14: the corpus-wide word count is a WINDOW over the (source, w)
    // frame, not an agg + join-back — the window's group is one row per
    // source that uses the word (≤ #sources rows, bounded at any corpus
    // size, so no hub hazard), and it removes a full exchange + hash
    // join of the vocabulary-scaled frame. n_tot re-aggregates the
    // O(#sources) totals frame instead of sw (one fewer pass over sw).
    val totals = sw.groupBy("source").agg(sum("c_sw").as("n_s"))
    val tot = totals.agg(sum("n_s").as("n_tot"))
    sw.withColumn("c_w", sum("c_sw").over(Window.partitionBy("w")))
      .join(totals, "source")
      .crossJoin(broadcast(tot))
      .withColumn("term_q", expr(
        """CAST(floor(CAST(c_sw AS DOUBLE) / n_s
           * log2((CAST(c_sw AS DOUBLE) / n_s) / (CAST(c_w AS DOUBLE) / n_tot))
           * 1048576e0) AS BIGINT)"""))
      .groupBy("source")
      .agg(max("n_s").as("n_tokens"),
        count(lit(1)).as("n_vocab"),
        sum("term_q").as("kl_q"))
      .withColumn("kl_bits", expr("CAST(kl_q AS DOUBLE) / 1048576e0"))
  }

  /** x29 — BM25 keyword retrieval: top-k documents for a fixed query-term
    * set (Robertson/Spärck Jones; the Lucene-practical idf form
    * ln(1 + (N - df + 0.5)/(df + 0.5)), k1 = 1.2, b = 0.75).
    *
    * Exactness: idf is quantized ONCE per term to the 2^20 grid; each
    * (doc, term) contribution idf_q · tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl))
    * is a fixed-shape IEEE expression over exact integers (tf, dl, N,
    * sum_dl) quantized per posting, and the per-doc score is the exact
    * BIGINT sum of those — order-independent where a float Σ over terms
    * would depend on aggregation order.
    *
    * Plan shape (r14): ONE corpus pass — the query-term set is a fixed,
    * enumerable list, so every per-term tf is a conditional sum riding
    * the same doc_id aggregation that counts dl (map-side combined; the
    * shuffle carries one narrow row per document). The old shape paid a
    * second full scan for dl, a (doc, term)-keyed posting aggregation,
    * and a doc-keyed join of the posting frame back against the length
    * frame — at 100 TB that join shuffles every document row anyway, so
    * the fused pass strictly dominates. df/idf and the corpus length
    * stats collapse to ONE 1-row bounded broadcast attach (O(terms)
    * columns); final top-k is a TakeOrdered over one row per matching
    * doc. Score identity: each term's quantized contribution is the
    * same fixed-shape IEEE expression as before and the per-doc score
    * is an exact BIGINT sum, so the fused form is value-identical. */
  def bm25TopK(documents: DataFrame,
      terms: Seq[String] = Seq("spark", "shuffle", "hash", "merge"),
      k: Int = 10): DataFrame = {
    // Column-API comparison, not interpolated SQL: a term containing a
    // quote must stay a literal, never concatenate into a parsed
    // predicate (only the INDEX is ever interpolated below)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("w") === lit(t), 1L).otherwise(0L)).as(s"tf_$i") }
    val aggs = count(lit(1)).as("dl") +: tfCols
    val perDoc = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .persist() // feeds the corpus stats AND the scoring pass
    val statAggs = Seq(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl")) ++
      terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val idfCols = terms.indices.map(i => expr(
      s"""CAST(floor(ln(1e0 + (CAST(n_docs - df_$i AS DOUBLE) + 0.5e0) / (CAST(df_$i AS DOUBLE) + 0.5e0))
         * 1048576e0) AS BIGINT)""").as(s"idf_$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
      .select(col("n_docs") +: col("sum_dl") +: idfCols: _*)
    val contrib = terms.indices.map(i => expr(
      s"""CASE WHEN tf_$i > 0 THEN
           CAST(floor(CAST(idf_$i AS DOUBLE) * (CAST(tf_$i AS DOUBLE) * 2.2e0)
           / (CAST(tf_$i AS DOUBLE) + 1.2e0 * (0.25e0 + 0.75e0 * CAST(dl AS DOUBLE)
              / (CAST(sum_dl AS DOUBLE) / n_docs)))) AS BIGINT)
         ELSE CAST(0 AS BIGINT) END""")).reduce(_ + _)
    val nTerms = terms.indices.map(i =>
      when(col(s"tf_$i") > 0, 1L).otherwise(0L)).reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .withColumn("n_terms", nTerms)
      .filter(col("n_terms") > 0)
      .withColumn("score_q", contrib)
      .withColumn("score", expr("CAST(score_q AS DOUBLE) / 1048576e0"))
      .orderBy(col("score_q").desc, col("doc_id"))
      .limit(k)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score_q").desc, col("doc_id"))).cast("int"))
      .select("rnk", "doc_id", "n_terms", "score_q", "score")
  }

  /** x28's hashed-bigram stream with per-doc target flags — shared by
    * the importance scorer (which persists it: two consumers) and the
    * standalone model builder (one pass, no persist). */
  private def dsirBigrams(documents: DataFrame, buckets: Int,
      persistBg: Boolean): DataFrame = {
    val flags = documents
      .withColumn("n_words", expr("CAST(size(split(text, ' ')) AS BIGINT)"))
      .withColumn("n_distinct", expr("CAST(size(array_distinct(split(text, ' '))) AS BIGINT)"))
      .withColumn("n_stop", expr(cntSum(StopwordsEn)).cast("long"))
      .withColumn("is_target", expr(
        "NOT (n_words < 20 OR n_words > 88 OR n_stop = 0 OR n_distinct * 100 < n_words * 35)"))
      .select("doc_id", "text", "is_target")
    val bg = flags
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), col("is_target"), explode(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))")).as("bgr"))
      .withColumn("h", md5(col("bgr")))
      .withColumn("bucket", expr(s"${hex13Num("h")} % $buckets"))
      .select("doc_id", "is_target", "bucket")
    if (persistBg) bg.persist() else bg
  }

  /** [[dsirBucketWeights]] as a DENSE driver-side array indexed by
    * bucket (absent bucket = 0, the add-1-smoothing limit) — the
    * plan-time-literal form a stateless streaming scorer ships instead
    * of a join. The collect is control-plane bounded: O(buckets). */
  def dsirBucketWeightArray(documents: DataFrame,
      buckets: Int = 256): Seq[Long] = {
    val m = dsirBucketWeights(documents, buckets).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    (0 until buckets).map(b => m.getOrElse(b, 0L))
  }

  /** The x12 benchmark side as a driver-side hash list — the plan-time
    * literal a stateless streaming decontaminator ships instead of the
    * broadcast join. Control-plane bounded: the benchmark set is fixed
    * configuration (10 docs' distinct shingles, a few hundred hashes). */
  def benchmarkShingleHashes(documents: DataFrame,
      benchMaxId: Long = 10): Seq[Long] =
    shinglesShared(documents)
      .filter(col("doc_id") < benchMaxId)
      .select(xxhash64(col("sh")).as("h")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted

  /** The O(buckets) DSIR model x28 trains internally, exposed as a
    * deployable artifact: (bucket, w_q) add-1-smoothed quantized log2
    * likelihood ratios. An absent bucket's smoothing limit is w_q = 0
    * (log2(1/1)) — a consumer joining by bucket coalesces to 0 and gets
    * EXACTLY the model semantics for buckets the corpus never hit. */
  def dsirBucketWeights(documents: DataFrame, buckets: Int = 256): DataFrame =
    dsirBigrams(documents, buckets, persistBg = false)
      .groupBy("bucket")
      .agg(count(lit(1)).as("a_b"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("t_b"))
      .withColumn("w_q", expr(
        "CAST(floor(log2(CAST(t_b + 1 AS DOUBLE) / (a_b + 1)) * 1048576e0) AS BIGINT)"))
      .select("bucket", "w_q")

  /** x28 — DSIR-style importance weighting: score every document by how
    * much its hashed n-gram features look like a TARGET distribution
    * relative to the raw corpus (Xie et al., "Data Selection for
    * Language Models via Importance Resampling"). Target here = the
    * documents passing the x16 quality rule, so the pipeline needs no
    * external corpus; features = word bigrams hashed into `buckets`
    * cells.
    *
    * Per bucket b: weight λ_b = log2((target_b + 1) / (all_b + 1)),
    * quantized ONCE per bucket to the 2^20 grid; per document: exact
    * BIGINT sum of its bigram instances' quantized weights (the
    * add-1-smoothed log-likelihood ratio, the resampling key).
    *
    * Plan shape: narrow bigram explode → ONE map-side-combinable agg
    * onto `buckets` keys (the bucket table is O(buckets), broadcast
    * back) → one keyed agg by doc_id. Scales exactly like x25: the
    * corpus is read once, nothing wider than a (doc_id)-keyed shuffle
    * ever materializes, and the model (the bucket-weight table) stays
    * control-plane-sized at any corpus size.
    */
  def dsirImportance(documents: DataFrame, buckets: Int = 256): DataFrame = {
    // feeds the bucket-count agg AND the per-doc scoring join
    val bg = dsirBigrams(documents, buckets, persistBg = true)
    val wts = bg.groupBy("bucket")
      .agg(count(lit(1)).as("a_b"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("t_b"))
      .withColumn("w_q", expr(
        "CAST(floor(log2(CAST(t_b + 1 AS DOUBLE) / (a_b + 1)) * 1048576e0) AS BIGINT)"))
      .select("bucket", "w_q")
    val perDoc = bg.join(broadcast(wts), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("w_q").as("score_q"))
    documents.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("score_q", coalesce(col("score_q"), lit(0L)))
      .withColumn("importance", expr(
        "CASE WHEN n_bigrams = 0 THEN 0e0 " +
          "ELSE CAST(score_q AS DOUBLE) / n_bigrams / 1048576e0 END"))
  }

  /** x50 — DSIR importance RESAMPLING: materializes the accepted subset
    * the x28 weights exist for (the DoReMi/DSIR pipeline step between
    * scoring and training). Each doc is accepted by a deterministic
    * Bernoulli with p = 2^m, where m = score_q / (n_bigrams · 2²⁰) is
    * x28's mean bigram log2 likelihood ratio (≤ 0 by construction, so
    * p ≤ 1 needs no clamp): draw u = (h+1)/2^52 from a seeded md5 order
    * statistic of the doc id, accept iff log2(u) ≤ m. Both sides live on
    * the shared 2²⁰ quantization grid (u_q = floor(log2(u)·2²⁰), the
    * x25/x28 discipline), so the test is ONE exact BIGINT cross-multiply
    * — u_q · n_bigrams ≤ score_q — identical in any engine and under any
    * re-run with the same seed: the sample is reproducible and
    * composable, unlike an RNG `sample()` (x11's argument, applied to
    * weighted acceptance). Plan shape: x28's chain (one bucket agg, one
    * broadcast model join-back, one per-doc agg) plus a narrow
    * projection — no new shuffle for the acceptance itself. Docs with no
    * bigrams reject (a curation pipeline routes them by length rules,
    * not by a score they cannot have). */
  def importanceResample(documents: DataFrame, seed: String = "graft"): DataFrame = {
    validateSeed(seed)
    dsirImportance(documents)
      .select("doc_id", "n_bigrams", "score_q")
      .withColumn("h", expr(
        hex13Num(s"md5(concat('$seed:rs:', CAST(doc_id AS STRING)))")))
      .withColumn("u_q", expr(
        "CAST(floor(log2((CAST(h AS DOUBLE) + 1e0) / 4503599627370496e0)" +
          " * 1048576e0) AS BIGINT)"))
      .withColumn("accept",
        col("n_bigrams") > 0 && col("u_q") * col("n_bigrams") <= col("score_q"))
      .select("doc_id", "n_bigrams", "score_q", "u_q", "accept")
  }

  /** x26 — distributed BPE tokenizer training: `rounds` greedy merges
    * over the corpus vocabulary. Per round: (1) weighted adjacent-pair
    * counts in ONE keyed agg over the VOCAB frame (pair occurrences ×
    * word frequency) — the corpus token stream is touched exactly once,
    * in the initial word count, so every later round is O(|vocab|·len),
    * never O(corpus); (2) the argmax pair by (count DESC, pair ASC)
    * collected to the driver — one control-plane row per round, the same
    * loop pattern as [[VectorOps.kmeansConverged]]; (3) merge application
    * as a per-word left-to-right greedy fold (`aggregate` HOF) — a fold,
    * NOT a string replace, because replace's non-overlapping scan resumes
    * AFTER each match and disagrees with greedy BPE on runs like
    * `a a a a` (shared-delimiter chains). The vocab frame is
    * localCheckpoint'ed per round so eight HOF plans never nest.
    *
    * Counts are exact BIGINTs, so the per-round argmax — and therefore
    * the whole merge table — is engine-exact. Output: one row per merge,
    * the table a trained BPE tokenizer ships.
    */
  def bpeMerges(documents: DataFrame, rounds: Int = 8): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val (merges, _) = bpeTrained(documents, rounds)
    merges.toDF("round", "pa", "pb", "merged", "cnt")
  }

  /** Session-memoized trained tokenizer (merge table + final vocab), the
    * SharedFrames pay-once pattern extended to a (driver Seq, frame)
    * pair: one bench session running both x26 and x31 trains ONCE. The
    * vocab stays checkpointed for the session (clear with
    * [[SharedFrames.clear]]-style test teardown if rotating inputs). */
  /** Holder mirroring [[SharedFrames]]'s Memoized: `putIfAbsent` elects
    * ONE winning holder per key and the lazy initializer trains exactly
    * once no matter how many threads race on first use — a bare
    * `TrieMap.getOrElseUpdate` can evaluate the thunk twice under
    * concurrent first use, double-paying BPE training and handing racing
    * callers different (equivalent) frames. */
  private final class BpeMemo(
      compute: () => (Seq[(Int, String, String, String, Long)], DataFrame)) {
    lazy val value: (Seq[(Int, String, String, String, Long)], DataFrame) =
      compute()
  }

  private val bpeCache = scala.collection.concurrent.TrieMap
    .empty[(Int, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int),
      BpeMemo]

  private def bpeTrained(documents: DataFrame,
      rounds: Int): (Seq[(Int, String, String, String, Long)], DataFrame) = {
    // keyed by the canonicalized plan ITSELF (structural equality), not its
    // 32-bit hashCode — a hash collision between two different documents
    // frames in one session would silently serve the wrong merge table
    val key = (System.identityHashCode(documents.sparkSession),
      documents.queryExecution.analyzed.canonicalized, rounds)
    val fresh = new BpeMemo(() => bpeTrain(documents, rounds))
    bpeCache.putIfAbsent(key, fresh).getOrElse(fresh).value
  }

  /** The x26 training loop, also exposing the final vocabulary state
    * (word → merged symbol sequence) for [[bpeEncode]]. The returned
    * vocab frame is localCheckpoint'ed; the caller owns the handle. */
  private def bpeTrain(documents: DataFrame,
      rounds: Int): (Seq[(Int, String, String, String, Long)], DataFrame) = {
    val spark = documents.sparkSession
    import spark.implicits._
    var vocab = documents
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      // sequence(1, 0) DESCENDS in Spark ([1, 0]) — guard the empty token
      .withColumn("ss", expr(
        "CASE WHEN length(w) = 0 THEN CAST(array() AS ARRAY<STRING>) " +
          "ELSE transform(sequence(1, length(w)), i -> substring(w, i, 1)) END"))
      .select("w", "cnt", "ss")
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    for (r <- 1 to rounds) {
      val top = vocab.filter(size(col("ss")) >= 2)
        .select(col("cnt"), expr(
          "explode(transform(sequence(1, size(ss) - 1), " +
            "i -> struct(element_at(ss, i) AS pa, element_at(ss, i + 1) AS pb)))").as("p"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("pa"), col("pb"))
        .limit(1).as[(String, String, Long)].collect()
      top.headOption.foreach { case (pa, pb, c) =>
        merges += ((r, pa, pb, pa + pb, c))
        val paL = lit(pa); val pbL = lit(pb); val mL = lit(pa + pb)
        val folded = aggregate(
          slice(col("ss"), lit(2), size(col("ss")) - 1),
          array(element_at(col("ss"), 1)),
          (acc, x) =>
            when(element_at(acc, -1) === paL && x === pbL,
              concat(slice(acc, lit(1), size(acc) - 1), array(mL)))
              .otherwise(concat(acc, array(x))))
        val prev = vocab
        vocab = vocab.withColumn("ss",
            when(size(col("ss")) >= 2, folded).otherwise(col("ss")))
          .localCheckpoint()
        prev.unpersist()
      }
    }
    (merges.result(), vocab)
  }

  /** x31 — BPE encoding under the x26-trained tokenizer: apply the merge
    * table back to the corpus and report per-document token counts — the
    * train→encode lifecycle completion (as s6 is to s4's k-means). A
    * word's token count is the length of its merged symbol sequence, so
    * encoding is ONE join of the (word → n_sym) model onto the exploded
    * token stream plus a doc-keyed agg — the corpus is never
    * re-tokenized per merge. The model is vocab-sized (grows with the
    * corpus, Heaps' law) so the join is AQE-sized, not force-broadcast;
    * at test SF AQE promotes it to a broadcast at runtime. Reports per
    * doc: words,
    * characters, tokens, and the chars/token compression the tokenizer
    * achieves — exact integers throughout.
    */
  def bpeEncode(documents: DataFrame, rounds: Int = 8): DataFrame = {
    val (_, vocab) = bpeTrained(documents, rounds)
    val sizes = vocab.select(col("w"),
      size(col("ss")).cast("long").as("n_sym"),
      length(col("w")).cast("long").as("n_chr"))
    val out = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .join(sizes, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("n_chr").as("n_chars"),
        sum("n_sym").as("n_tokens"))
      .withColumn("chars_per_token", expr(
        "CASE WHEN n_tokens = 0 THEN 0e0 ELSE CAST(n_chars AS DOUBLE) / n_tokens END"))
    // vocab stays checkpointed: the returned plan reads it (truncated
    // lineage — unpersisting before materialization would strand it)
    out
  }

  /** x40 — tokenizer-fit report per (source, predicted language):
    * fertility = characters per token under the CORPUS-TRAINED BPE
    * tokenizer (x26's merges, x31's per-doc encoding). A source or
    * language with high fertility pays more sequence length per
    * character — the tokenizer-fairness measurement of the multilingual
    * tokenization literature — and the fix is either tokenizer
    * retraining on a rebalanced sample or mixture reweighting (x17);
    * `token_share` vs `char_share` shows who actually consumes the
    * training budget, which char-level accounting hides.
    *
    * Scale: the per-doc encoding reuses the memoized trained vocab (one
    * broadcast-join per word type, x31's shape); this adds one keyed
    * rollup on (source, lang) — O(#sources × #langs) output — and a
    * 1-row totals attach. Exact BIGINT sums; the two shares and
    * fertility are terminal IEEE divisions. */
  def tokenizerFertility(documents: DataFrame, rounds: Int = 8): DataFrame = {
    val enc = bpeEncode(documents, rounds)
      .select("doc_id", "n_words", "n_chars", "n_tokens")
    val meta = langIdShared(documents).select("doc_id", "lang_pred")
      .join(documents.select("doc_id", "source"), "doc_id")
    val per = enc.join(meta, "doc_id")
      .groupBy("source", "lang_pred")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_words"),
        sum("n_chars").as("n_chars"), sum("n_tokens").as("n_tokens"))
    val tot = per.agg(sum("n_chars").as("t_chars"), sum("n_tokens").as("t_tokens"))
    per.crossJoin(broadcast(tot)) // 1-row totals: scalar-whitelisted attach
      .select(col("source"), col("lang_pred"), col("n_docs"), col("n_words"),
        col("n_chars"), col("n_tokens"),
        expr("CASE WHEN n_tokens = 0 THEN 0e0 " +
          "ELSE CAST(n_chars AS DOUBLE) / n_tokens END").as("fertility"),
        expr("CAST(n_chars AS DOUBLE) / t_chars").as("char_share"),
        expr("CAST(n_tokens AS DOUBLE) / t_tokens").as("token_share"))
  }

  /** x37 — distributed batch perceptron over hashed bigram features: the
    * fastText-class linear quality filter (the model-based selection step
    * of DataComp-LM-style pipelines), trained HERE, distributed, with
    * exact integer arithmetic. Labels come from x28's quality-target rule,
    * so x37 is the DISCRIMINATIVE counterpart of x28's generative DSIR
    * weights over the same feature space (hashed bigrams + bias).
    *
    * Training is the order-independent BATCH perceptron: per round, score
    * every document under the current integer weight vector (one
    * broadcast of O(buckets) weights + one doc-keyed agg), take ALL
    * misclassified docs (y·margin ≤ 0), and add Σ y·x per bucket — a
    * second keyed agg — to the weights. No per-row sequential updates, so
    * the result is partition-layout-independent and bit-reproducible; the
    * driver holds only the O(buckets) weight vector per round (the
    * k-means/BPE control-plane loop pattern), memoized session-wide like
    * the other trained artifacts. Margins, updates and weights are all
    * exact BIGINT, so the unrolled DuckDB oracle hash-matches every
    * column. Scale: the corpus is touched once to build the (doc, bucket,
    * count) frame; each round is two keyed aggs over it. */
  def perceptronFilter(documents: DataFrame, buckets: Int = 64,
      rounds: Int = 16): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val base = documents
      .withColumn("n_words", expr("CAST(size(split(text, ' ')) AS BIGINT)"))
      .withColumn("n_distinct", expr("CAST(size(array_distinct(split(text, ' '))) AS BIGINT)"))
      .withColumn("n_stop", expr(cntSum(StopwordsEn)).cast("long"))
      .withColumn("y", when(expr(
        "NOT (n_words < 20 OR n_words > 88 OR n_stop = 0 OR n_distinct * 100 < n_words * 35)"),
        1L).otherwise(-1L))
      .select("doc_id", "text", "y", "n_words", "n_distinct", "n_stop")
    val bg = base
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), col("y"), explode(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))")).as("bgr"))
      .withColumn("h", md5(col("bgr")))
      .select(col("doc_id"), col("y"), expr(s"${hex13Num("h")} % $buckets").as("bucket"))
    val bias = base.select(col("doc_id"), col("y"), lit(buckets.toLong).as("bucket"))
    // engineered slots (buckets B+1..B+4): 0/1 indicators of the four
    // rule clauses. With them the concept is linearly separable (w = big
    // negative per indicator + positive bias realizes the rule exactly),
    // so the perceptron convergence theorem applies and training
    // genuinely learns; raw counts or bigrams alone left the batch
    // updates oscillating between the all-positive and all-negative
    // states (observed at both SFs). The hashed bigrams stay in as noise
    // features the trainer must overcome — a bounded round count leaves
    // a few residual errors, which is the honest picture.
    val eng = base.select(col("doc_id"), col("y"),
      array(
        struct(lit(buckets + 1L).as("bucket"),
          when(col("n_words") < 20, 1L).otherwise(0L).as("x")),
        struct(lit(buckets + 2L).as("bucket"),
          when(col("n_words") > 88, 1L).otherwise(0L).as("x")),
        struct(lit(buckets + 3L).as("bucket"),
          when(col("n_stop") === 0, 1L).otherwise(0L).as("x")),
        struct(lit(buckets + 4L).as("bucket"),
          when(col("n_distinct") * 100 < col("n_words") * 35, 1L).otherwise(0L).as("x"))).as("fs"))
      .select(col("doc_id"), col("y"), explode(col("fs")).as("f"))
      .select(col("doc_id"), col("y"), col("f.bucket"), col("f.x"))
    val fx = bg.unionByName(bias)
      .groupBy("doc_id", "y", "bucket").agg(count(lit(1)).as("x"))
      .unionByName(eng)
      .persist() // scored once per round + once for the final margins
    def margins(w: Seq[Long]): DataFrame = {
      val wdf = w.zipWithIndex.map { case (v, b) => (b.toLong, v) }.toDF("bucket", "w")
      fx.join(broadcast(wdf), "bucket")
        .groupBy("doc_id", "y").agg(sum(expr("x * w")).as("margin"))
    }
    val w = SharedFrames.memoValue(documents, s"perceptron b=$buckets r=$rounds") {
      val wArr = Array.fill[Long](buckets + 5)(0L)
      for (r <- 1 to rounds) {
        val mis = margins(wArr.toSeq)
          .filter(col("y") * col("margin") <= 0).select("doc_id")
        // MEAN gradient over the misclassified set with a 1/r² decaying
        // step, on a 2^10 fixed-point grid: floor(2^10 · Σ y·x /
        // (|mis|·r²)) per bucket. The unit-step sum (Σ y·x) swings
        // weights by the misclassified MASS and training oscillates
        // between the all-positive and all-negative states; a constant
        // or 1/r mean step still cycles (all observed at both SFs). The
        // convergent-series 1/r² schedule settles — measured 86%
        // training accuracy with mixed predictions — while every update
        // stays layout-independent and exact: one IEEE multiply +
        // divide + floor over exact integers, the kmeans discipline.
        val upd = fx.join(mis, "doc_id")
          .groupBy("bucket").agg(sum(expr("y * x")).as("g"))
        val nMis = mis.count()
        if (nMis > 0) {
          upd.select(col("bucket"),
              expr(s"CAST(floor(1024e0 * g / ${nMis * r.toLong * r}L) AS BIGINT)").as("d"))
            .as[(Long, Long)].collect()
            .foreach { case (b, d) => wArr(b.toInt) += d }
        }
      }
      wArr.toSeq
    }
    margins(w)
      .select(col("doc_id"), col("y"), col("margin"),
        (col("margin") > 0).as("pred"),
        ((col("margin") > 0) === (col("y") > 0)).as("correct"))
  }

  /** x45 — rule-vs-model filter agreement, d8's signal-fusion audit
    * applied to QUALITY detectors: the joint verdict distribution of
    * x16's rule gate (x37's training label `y`) and x37's trained
    * linear classifier, rolled up per source — the check DataComp-LM
    * class pipelines run before swapping a heuristic filter for a
    * model-based one. The disagreement cells are the interesting docs:
    * `n_model_only` is what the model would rescue from the rules,
    * `n_rule_only` what it would newly drop; a source whose agreement
    * collapses is where the model generalized past (or against) the
    * rules. Costs one doc_id hash join and one O(#sources) rollup on
    * top of x37's memoized trained weights — the training loop is never
    * re-paid. */
  def filterAgreement(documents: DataFrame): DataFrame =
    perceptronFilter(documents)
      .join(documents.select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(when(col("y") > 0 && col("pred"), 1L).otherwise(0L)).as("n_both_keep"),
        sum(when(col("y") > 0 && !col("pred"), 1L).otherwise(0L)).as("n_rule_only"),
        sum(when(col("y") < 0 && col("pred"), 1L).otherwise(0L)).as("n_model_only"),
        sum(when(col("y") < 0 && !col("pred"), 1L).otherwise(0L)).as("n_both_drop"))
      .withColumn("agree_frac",
        expr("CAST(n_both_keep + n_both_drop AS DOUBLE) / n"))

  /** x38 — the per-source data card: the one-table summary a curated
    * release ships (and the dashboard a 100 TB ingest is steered by) —
    * per source: volume (docs, tokens), the x16 quality-gate keep rate,
    * the d1 exact-duplicate rate, and the dominant language with its
    * share. One corpus scan builds the per-doc frame; the duplicate flag
    * is a fingerprint-keyed agg joined back (d1's shape, never pairwise);
    * the language mode is an exact arg-min on (−count, lang) — no window
    * over data, all group keys control-plane sized (sources × langs). */
  def dataCard(documents: DataFrame): DataFrame = {
    val perDoc = documents
      .withColumn("n_words", expr("CAST(size(split(text, ' ')) AS BIGINT)"))
      .withColumn("n_distinct", expr("CAST(size(array_distinct(split(text, ' '))) AS BIGINT)"))
      .withColumn("n_stop", expr(cntSum(StopwordsEn)).cast("long"))
      .withColumn("keep", expr(
        "NOT (n_words < 20 OR n_words > 88 OR n_stop = 0 OR n_distinct * 100 < n_words * 35)"))
      .withColumn("fp", md5(col("text")))
      .select("doc_id", "source", "lang", "n_words", "keep", "fp")
      .persist() // feeds the dup-count agg AND the per-source rollup
    val fpCounts = perDoc.groupBy("fp").agg(count(lit(1)).as("fp_n"))
    val flagged = perDoc.join(fpCounts, "fp")
      .withColumn("is_dup", col("fp_n") >= 2)
    val bySource = flagged.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("n_words").as("n_tokens"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
      sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_docs"))
    val langMode = flagged.groupBy("source", "lang").agg(count(lit(1)).as("ln"))
      .groupBy("source").agg(expr("min_by(struct(lang, ln), struct(-ln, lang))").as("m"))
      .select(col("source"), col("m.lang").as("top_lang"), col("m.ln").as("top_lang_n"))
    bySource.join(langMode, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("CAST(n_tokens AS DOUBLE) / n_docs").as("mean_tokens"),
        col("n_kept"), expr("CAST(n_kept AS DOUBLE) / n_docs").as("keep_rate"),
        col("n_dup_docs"), expr("CAST(n_dup_docs AS DOUBLE) / n_docs").as("dup_rate"),
        col("top_lang"), expr("CAST(top_lang_n AS DOUBLE) / n_docs").as("top_lang_share"))
  }

  /** x51 — the data card's DISTRIBUTION columns (VERDICT r11 #4): per
    * source, p50/p90/p99 document length estimated from the mergeable
    * `graft_qsketch` bottom-k sample, next to x38's volume / keep-rate /
    * dup-rate / language columns — the percentile line a released data
    * card ships. x49 is the calibration audit that sizes k and measures
    * the sketch's rank error against the exact histogram; THIS op is the
    * consumer the sketch was built for: ONE map-side-combinable keyed agg
    * (≤k longs per (group, partition) cross the shuffle — no histogram,
    * no window, no sort over documents, the 100 TB data-card shape)
    * joined onto the x38 rollup. k = 64 here so sampling ENGAGES on the
    * gate corpus (sources carry ~25-250 docs at the test SFs); a
    * deployment sizes k ≈ 16384 for ε ≈ 1.5% (x49's documented point).
    * The sample is a pure order statistic of the per-doc md5 hash, so the
    * estimates are replayable in any engine — the oracle re-derives them
    * with a row_number window at the gate scale. */
  def dataCardQuantiles(documents: DataFrame, k: Int = 64): DataFrame = {
    val sk = documents
      .select(col("source"), col("n_chars").as("v"),
        expr(hex13Num("md5(concat(CAST(doc_id AS STRING), ':qs'))")).as("hv"))
      .groupBy("source")
      .agg(expr(s"graft_qsketch(hv, v, $k)").as("sample"))
      .withColumn("k_actual", size(col("sample")).cast("long"))
      .select(col("source"), col("k_actual"),
        expr("element_at(sample, CAST(floor((k_actual + 1) / 2.0) AS INT))")
          .as("p50_chars_est"),
        expr("element_at(sample, CAST(floor((9 * k_actual + 9) / 10.0) AS INT))")
          .as("p90_chars_est"),
        expr("element_at(sample, CAST(floor((99 * k_actual + 99) / 100.0) AS INT))")
          .as("p99_chars_est"))
    dataCard(documents).join(sk, "source")
  }

  /** x36's default phrase set: frequent bigram, two trigrams, and a
    * repeated-term phrase (the degenerate case a naive adjacency join
    * double-counts). */
  val PhraseQueries: Seq[String] =
    Seq("table hash", "slow hash batch", "row column sort", "table table")

  /** x36 — exact-phrase search over a positional inverted index: how many
    * times does each multi-word phrase occur in each document? The
    * corpus-scale `grep -c` behind contamination spot-checks ("is this
    * benchmark sentence in the training set?") and data inspection, where
    * x29 answers RANKED keyword queries.
    *
    * Shape: tokens explode once with their 1-based positions (the
    * positional posting list); an IN-filter on the query terms prunes the
    * stream BEFORE any shuffle (the x29 posting-list discipline — at
    * 100 TB this is the difference between shuffling the corpus and
    * shuffling the matched terms); one broadcast join attaches each
    * term's (phrase, offset) slots; one keyed aggregation on
    * (phrase, doc, pos − offset) counts matched slots, and a full match
    * is exactly `count = phrase length` — correct under repeated terms
    * ("table table"), where each offset slot is satisfied at most once.
    * A second keyed agg rolls occurrences up per (phrase, doc). Total
    * work: O(matched postings), no pairwise scan, no window. */
  def phraseSearch(documents: DataFrame,
      phrases: Seq[String] = PhraseQueries): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val slots = phrases.flatMap { p =>
      p.split(' ').zipWithIndex.map { case (t, o) => (p, t, o.toLong, p.split(' ').length.toLong) }
    }.toDF("phrase", "term", "os", "plen")
    val terms = phrases.flatMap(_.split(' ')).distinct
    val postings = documents
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "w")))
      .filter(col("w").isin(terms: _*)) // prunes before the shuffle
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("w"))
    postings.join(broadcast(slots), col("w") === col("term"))
      .groupBy(col("phrase"), col("doc_id"), (col("pos") - col("os")).as("start"))
      .agg(count(lit(1)).as("hit"), first("plen").as("plen"))
      .filter(col("hit") === col("plen"))
      .groupBy("phrase", "doc_id")
      .agg(count(lit(1)).as("n_hits"), min("start").as("first_pos"))
  }
}
