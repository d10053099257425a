package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation WITH pointer
  * jumping.
  *
  * Plain neighbor-min propagation needs O(diameter) rounds — fine for the
  * near-clique components LSH dedup produces, but a chain-shaped dup graph
  * (doc i duplicates doc i+1) makes the diameter the corpus size. Each
  * round here therefore also applies one pointer-jumping step,
  * L(x) ← min(L(x), L(L(x))): the label graph's chains halve every round,
  * so convergence is O(log n) rounds on ANY component shape (the classic
  * two-phase/"label propagation + path halving" distributed CC, the same
  * round structure GraphX and large-star/small-star use).
  *
  * Per round: two hash joins keyed on node id (neighbor min, then jump)
  * over one-row-per-node label frames; only per-round COUNTS reach the
  * driver, never data rows.
  */
object ConnectedComponents {

  /** @param nodes one column `id` (unique)
    * @param edges columns `src`, `dst` — DIRECTED as given; pass both
    *              orientations for an undirected graph
    * @return (id, component) where component = min node id reachable.
    *         The result is a persisted (or locally checkpointed) frame —
    *         the CALLER owns the handle and may `unpersist()` it once
    *         consumed; the loop's own intermediates are always released,
    *         including on the non-convergence throw path. */
  def minLabel(nodes: DataFrame, edges: DataFrame, maxIters: Int = 25): DataFrame = {
    val e = edges.persist()
    var labels = nodes.select(col("id"), col("id").as("component")).persist()
    var changed = 1L
    var prevChanged = Long.MaxValue
    var iter = 0
    try {
      while (changed > 0 && iter < maxIters) {
        // jump ADAPTIVELY: near-clique components (the LSH-dedup common
        // case) converge in 1-2 propagation rounds and must not pay the
        // extra self-join; a chain keeps `changed` high round over round
        // (shrinks by ~1/round), which is the signal to start halving
        // paths. Two real rounds of history are needed to tell them apart,
        // so a clique exits before a jump ever runs.
        val doJump = iter >= 2 && changed * 2 > prevChanged
        val nbMin = e.join(labels, e("dst") === labels("id"))
          .groupBy(col("src")).agg(min("component").as("nb_min"))
        val propagated = labels.join(nbMin, labels("id") === nbMin("src"), "left")
          .select(col("id"),
            least(col("component"), coalesce(col("nb_min"), col("component"))).as("component"))
        // pointer jump: follow the label's label (labels cover every node,
        // and components are node ids, so the self-join always resolves).
        // Jump rounds localCheckpoint instead of persist: the self-join
        // references `propagated` twice, so the LOGICAL plan doubles per
        // jump round — persist dedupes execution but not the plan, and the
        // exponential lineage OOMs the planner. No-jump rounds keep the
        // cheap lazy persist (measured ~2× faster end-to-end: the eager
        // checkpoint pays an extra full materialization per round).
        val next =
          if (!doJump) propagated.persist()
          else propagated.as("a")
            .join(propagated.select(col("id").as("pid"), col("component").as("pcomp")).as("b"),
              col("a.component") === col("pid"), "left")
            .select(col("a.id").as("id"),
              least(col("a.component"), coalesce(col("pcomp"), col("a.component"))).as("component"))
            .localCheckpoint(true)
        prevChanged = changed
        changed = next.join(labels.withColumnRenamed("component", "prev"), "id")
          .filter(col("component") =!= col("prev")).count()
        labels.unpersist()
        labels = next
        iter += 1
      }
      if (changed > 0) {
        labels.unpersist() // throw path must not leak the last label frame
        throw new IllegalStateException(
          s"connected components did not converge in $maxIters rounds " +
            s"($changed labels still moving) — with pointer jumping that needs a " +
            "component of diameter > 2^" + maxIters)
      }
      labels
    } finally e.unpersist() // released on BOTH paths (block-manager leak otherwise)
  }
}
