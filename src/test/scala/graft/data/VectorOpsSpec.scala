package graft.data

import graft.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guarantees of the k-means training loop that the DuckDB
  * oracle RELIES on but cannot itself express: the loop reaches an exact
  * fixpoint on the integer grid, so running more rounds than needed is
  * the identity — which is what lets the oracle unroll a fixed `maxIter`
  * unconditionally while the Spark side early-exits.
  */
class VectorOpsSpec extends AnyFunSuite {

  private lazy val spark = Tables.session("vector-ops-spec", "4")
  private val sfDir = "/root/testdata/sf0.001"

  test("kmeansConverged reaches an exact fixpoint: extra rounds are the identity") {
    val e = Tables.embeddings(spark, sfDir)
    // measured convergence on sf0.001 is round 14; 24 vs 28 rounds must
    // therefore be identical BECAUSE of the fixpoint, not because of a cap
    val a = VectorOps.kmeansConverged(e, k = 4, maxIter = 24).collect().toSeq
    val b = VectorOps.kmeansConverged(e, k = 4, maxIter = 28).collect().toSeq
    assert(a == b, "post-fixpoint rounds must not move the grid centroids")
  }

  test("kmeansConverged partitions every vector: cluster sizes sum to N") {
    val e = Tables.embeddings(spark, sfDir)
    val out = VectorOps.kmeansConverged(e, k = 4, maxIter = 24)
    val n = e.count()
    // n is replicated across the 64 dims of each centroid
    val sizes = out.select("c_id", "n").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.size == 4)
    assert(sizes.values.sum == n, s"cluster sizes $sizes must sum to $n")
  }

  test("semDedup covers every vector exactly once and keeps each cluster's most-central") {
    val e = Tables.embeddings(spark, sfDir)
    val out = VectorOps.semDedup(e).collect()
    assert(out.length == e.count(), "one verdict per vector")
    // the rank-1 (most-central) vector of each cluster has no earlier
    // cluster-mate, so it can never be dropped
    val byCluster = out.groupBy(_.getLong(1))
    byCluster.foreach { case (c, rows) =>
      val top = rows.maxBy(r => (r.getDouble(2), -r.getLong(0)))
      assert(top.getBoolean(3), s"cluster $c: most-central vector must be kept")
    }
  }

  test("annIvfPq degenerates to brute force when every cell is probed and the shortlist is unbounded") {
    // nProbe = k probes all cells and adcTopK ≥ N shortlists every
    // candidate, so the exact rerank must reproduce annBrute's top-k —
    // the recall-loss of IVF-PQ comes ONLY from pruning, never from the
    // rerank path
    val e = Tables.embeddings(spark, sfDir)
    val pq = VectorOps.annIvfPq(e, k = 4, nProbe = 4, adcTopK = 1000)
      .select("query_id", "neighbor_id", "rnk", "dot", "cos").collect().toSeq
    val brute = VectorOps.annBrute(e).collect().toSeq
    assert(pq == brute, "full-probe IVF-PQ must equal the brute-force baseline")
  }

  test("annImi degenerates to brute force when every product cell is probed") {
    // nProbe = kHalf² probes the whole multi-index, and the cells
    // PARTITION the corpus (one (a, b) pair per vector), so the exact
    // rerank must reproduce annBrute's top-k — IMI's recall loss comes
    // ONLY from probe pruning, never from the product-cell structure
    val e = Tables.embeddings(spark, sfDir)
    val imi = VectorOps.annImi(e, kHalf = 2, nProbe = 4, topK = 5)
      .select("query_id", "neighbor_id", "rnk", "dot", "cos").collect().toSeq
    val brute = VectorOps.annBrute(e).collect().toSeq
    assert(imi == brute, "full-probe IMI must equal the brute-force baseline")
    // and the default config genuinely prunes: fewer candidate rows reach
    // at least one query's top-k (not the vacuous all-cells scan)
    val pruned = VectorOps.annImi(e).collect().toSeq
    assert(pruned.nonEmpty && pruned != brute.map(r => r),
      "default nProbe must actually prune the scan")
  }

  test("annIvfFiltered: full probes degenerate to brute force over the same-lang corpus; the filter binds") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, sfDir)
    val d = Tables.documents(spark, sfDir)
    // full-probe filtered search must equal a brute-force ranking over
    // the query's same-language candidates — filtered recall loss comes
    // ONLY from probe pruning, never from the constraint plumbing
    val full = VectorOps.annIvfFiltered(e, d, k = 4, everyNth = 7, nProbe = 4)
      .select("query_id", "neighbor_id", "rnk").collect().toSeq
    val v = VectorOps.quantized(e)
      .join(d.select(col("doc_id").as("vec_id"), col("lang")), "vec_id")
    val q = v.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("nn").as("q_nn"), col("lang").as("q_lang"))
    val brute = q.join(v, col("q_lang") === col("lang") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr(
        "CAST(graft_dot_long(q_qv, qv) AS DOUBLE) / sqrt(CAST(q_nn AS DOUBLE) * CAST(nn AS DOUBLE))"))
      .withColumn("rnk", row_number()
        .over(Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))).cast("int"))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"))
      .orderBy("query_id", "rnk").collect().toSeq
    assert(full == brute, "full-probe filtered ANN must equal the filtered brute force")
    // the constraint binds: every neighbor shares its query's language
    val out = VectorOps.annIvfFiltered(e, d, everyNth = 7)
    val mism = out
      .join(d.select(col("doc_id").as("query_id"), col("lang").as("ql")), "query_id")
      .join(d.select(col("doc_id").as("neighbor_id"), col("lang").as("nl")), "neighbor_id")
      .filter(col("ql") =!= col("nl")).count()
    assert(mism == 0, "every retrieved neighbor must satisfy the query's language constraint")
    // and the default probe budget genuinely prunes vs the full probe
    assert(out.select("query_id", "neighbor_id", "rnk").collect().toSeq != full,
      "default nProbe must actually prune the filtered scan")
  }

  test("hardNegatives: every negative is out-of-cluster; full shifted probes equal out-of-cluster brute force") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, sfDir)
    // (1) the exclusion binds structurally: no mined negative shares the
    // anchor's assignment cell
    val out = VectorOps.hardNegatives(e, k = 4, everyNth = 7)
    assert(out.filter(col("q_cell") === col("cell")).count() == 0,
      "a hard negative must never come from the anchor's own cluster")
    assert(out.count() > 0, "the miner must produce negatives at this scale")
    // (2) probing ALL other cells (nProbe = k-1) degenerates to brute
    // force over the out-of-cluster candidate set — mining loss comes
    // ONLY from probe pruning
    val full = VectorOps.hardNegatives(e, k = 4, everyNth = 7, nProbe = 3)
      .select("query_id", "neighbor_id", "rnk").collect().toSeq
    val v = VectorOps.quantized(e)
    val cent = v.filter(col("vec_id") < 4)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"), col("nn").as("c_nn"))
    val asg = v.crossJoin(broadcast(cent))
      .withColumn("dist2", expr("nn - 2 * graft_dot_long(qv, c_qv) + c_nn"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("dist2"), col("c_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("qv"), col("nn"), col("c_id").as("cell"))
    val q = asg.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("nn").as("q_nn"), col("cell").as("q_cell"))
    val brute = q.join(asg, col("q_cell") =!= col("cell"))
      .withColumn("cos", expr(
        "CAST(graft_dot_long(q_qv, qv) AS DOUBLE) / sqrt(CAST(q_nn AS DOUBLE) * CAST(nn AS DOUBLE))"))
      .withColumn("rnk", row_number()
        .over(Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))).cast("int"))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"))
      .orderBy("query_id", "rnk").collect().toSeq
    assert(full == brute, "full shifted probes must equal out-of-cluster brute force")
  }

  test("semDedupIncremental verdicts match a brute-force re-derivation from d12's base run") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sfDir)
    val baseMax = 25L
    val out = VectorOps.semDedupIncremental(e, baseMaxId = baseMax, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(out.nonEmpty, "increment produced no verdicts")
    // independent base verdicts: the batch operator on the base frame
    // (same trainer, same k) — d14's base replay must agree with d12
    val baseKept = VectorOps.semDedup(e.filter(col("vec_id") < baseMax), k = 4)
      .filter(col("keep")).select("vec_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val qv = VectorOps.quantized(e).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](2).toArray, r.getLong(3))).toMap
    def cos(a: Long, b: Long): Double = {
      val (va, na) = qv(a); val (vb, nb) = qv(b)
      val dot = va.zip(vb).map { case (x, y) => x * y }.sum
      dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
    }
    val eps = 0.35
    // new-side scan order: (cent_cos desc, vec_id) within cluster
    val newByCluster = out.groupBy(_._2).map { case (c, rows) =>
      c -> rows.sortBy(r => (-r._3, r._1)).map(_._1)
    }
    for ((id, c, _, keep, dupBase) <- out) {
      val expectDupBase = baseKept.exists { case (bid, bc) => bc == c && cos(id, bid) >= eps }
      assert(dupBase == expectDupBase,
        s"vec $id: dup_of_base=$dupBase but brute force says $expectDupBase")
      val earlier = newByCluster(c).takeWhile(_ != id)
      val expectDupNew = earlier.exists(eid => cos(id, eid) >= eps)
      assert(keep == !(expectDupBase || expectDupNew),
        s"vec $id: keep=$keep but brute force says ${!(expectDupBase || expectDupNew)}")
    }
  }

  test("annRange agrees with the top-k probe chain and nests by threshold") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sfDir)
    val range = VectorOps.annRange(e, k = 4, everyNth = 7, minCos = 0.3)
    val rset = range.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rset.nonEmpty, "range search returned nothing at this threshold")
    // every s8 top-k hit over the SAME probes with cos >= tau is in range
    val topk = VectorOps.annIvfMultiprobe(e, k = 4, everyNth = 7)
      .filter(col("cos") >= 0.3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(topk.subsetOf(rset),
      s"top-k hits above the threshold missing from range: ${(topk -- rset).take(5)}")
    // thresholds nest: tighter tau is a subset
    val tight = VectorOps.annRange(e, k = 4, everyNth = 7, minCos = 0.5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.subsetOf(rset), "tighter threshold must be a subset")
    assert(tight.size < rset.size, "tightening must actually shrink the set here")
    // the scale claim: no window operator anywhere in the range plan
    val wins = range.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    // the only window is the probe-list ranking over the k-row centroid
    // cross — never over the candidate stream; assert by output size
    assert(wins.size == 1 && wins.head.output.exists(_.name == "prn"),
      s"range plan must carry only the k-bounded probe window, found ${wins.size}")
  }

  test("ADC query batching is result-invariant: s7/s9 batched == unbatched") {
    // the batch loop must be a pure partition of the query set — every
    // per-query window rank is batch-local, so any batch count yields the
    // byte-identical union (the r8 bounded-broadcast fix relies on this)
    val e = Tables.embeddings(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(VectorOps.annPq(e, queryBatches = 3)) ==
      rows(VectorOps.annPq(e, queryBatches = 1)),
      "s7: batched shortlists must union to the unbatched result")
    assert(rows(VectorOps.annIvfPq(e, queryBatches = 3)) ==
      rows(VectorOps.annIvfPq(e, queryBatches = 1)),
      "s9: batched shortlists must union to the unbatched result")
  }

  test("semDedup blocked prefix join is result-invariant in the block width") {
    // blocks only re-key the SHUFFLE of the prefix pair join; the pair set
    // (earlier-rank, same-cluster) is width-independent. width=2 forces
    // ~60 blocks per cluster at sf0.001 — the multi-block regime the
    // default width only reaches at scale
    val e = Tables.embeddings(spark, sfDir)
    val narrow = VectorOps.semDedup(e, blockWidth = 2L).collect().map(_.toString).sorted.toSeq
    val default = VectorOps.semDedup(e).collect().map(_.toString).sorted.toSeq
    assert(narrow == default, "block width must not change any verdict")
  }

  test("autoCells floors to the oracle k at gate scale and grows k ∝ n past it") {
    val e = Tables.embeddings(spark, sfDir) // 500 vectors
    assert(VectorOps.autoCells(e) == 4, "gate scale must keep the oracle's k=4")
    assert(VectorOps.autoCells(e, targetCellSize = VectorOps.SemDedupClusterTarget) == 4)
    // a 40k-vector corpus at the ANN target of 2000/cell trains 20 cells
    val big = e.sparkSession.range(0, 40000L).selectExpr(
      "id AS vec_id", "CAST(id % 7 AS INT) AS label",
      "transform(sequence(1, 64), d -> CAST(1.0 AS FLOAT)) AS embedding")
    assert(VectorOps.autoCells(big) == 20, "k must scale with the corpus")
  }

  test("semDedup epsilon sandwich: ε>1 keeps all; ε=-1 keeps exactly one per cluster") {
    val e = Tables.embeddings(spark, sfDir)
    val all = VectorOps.semDedup(e, eps = 1.1).collect()
    assert(all.forall(_.getBoolean(3)), "cosine never exceeds 1: nothing can drop")
    // with ε = -1 every pair is ε-similar, so only the scan-order head of
    // each cluster survives — the degenerate one-representative-per-cluster
    val one = VectorOps.semDedup(e, eps = -1.0).collect()
    val kept = one.filter(_.getBoolean(3)).map(_.getLong(1))
    assert(kept.length == kept.distinct.length, "at most one survivor per cluster")
    assert(kept.toSet == one.map(_.getLong(1)).toSet, "each cluster keeps its head")
  }

  test("pqHealth accounts for every vector in every subspace and covers the full grid") {
    val e = Tables.embeddings(spark, sfDir)
    val n = e.count()
    val rows = VectorOps.pqHealth(e).collect()
    // one row per (subspace, codeword) — dead codes included, never dropped
    assert(rows.length == 8 * 16, "full m x nCodes grid")
    rows.groupBy(_.getInt(0)).foreach { case (s, rs) =>
      assert(rs.map(_.getLong(2)).sum == n,
        s"subspace $s: occupancy must partition the corpus")
      // shares are n_assigned/n_total over the same integers → sum to 1
      assert(math.abs(rs.map(_.getDouble(4)).sum - 1.0) < 1e-9)
      // dead flag consistent with occupancy
      rs.foreach(r => assert(r.getBoolean(6) == (r.getLong(2) == 0L)))
    }
  }
}
