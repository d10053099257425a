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
}
