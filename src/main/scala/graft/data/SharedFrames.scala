package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import scala.collection.concurrent.TrieMap

/** Pay-once registry for expensive intermediates consumed by several
  * queries in one session: the minhash dup-pair frame feeds d3, d6 (via
  * the component labels), d8, x18 and x21, and the connected-components
  * cluster frame feeds d6 and d9 — without this, one full bench pass
  * re-runs the shingle→minhash→band→verify pipeline ~5× and the CC loop
  * twice from raw text.
  *
  * Keyed by (session identity, canonicalized input PLAN — structural
  * equality, not its 32-bit hashCode, so distinct inputs can never
  * collide — and tag) so the same table read at two scale factors, or two
  * thresholds, never collide. The computed frame is materialized on first
  * use and reused by every later consumer in the session; `clear()`
  * releases everything (tests, or a long-running daemon rotating inputs).
  *
  * At 100 TB this same pattern is an explicit bucketed parquet write (see
  * [[Bucketing]] — pay the shuffle once, read co-located forever); the
  * in-session persist is the local-mode analogue with identical query
  * semantics, which is why the oracle results are unchanged by it.
  */
object SharedFrames {

  /** Holder whose `lazy val` gives the JVM-level single-evaluation
    * guarantee: `putIfAbsent` decides ONE winning holder per key, and the
    * lazy initializer runs its compute exactly once no matter how many
    * threads race on first use (a bare `TrieMap.getOrElseUpdate` can
    * evaluate the thunk twice under concurrent first use — benign for
    * correctness here, but it double-pays the dedup chain and wobbles the
    * bench in a concurrent server). */
  private final class Memoized(compute: () => DataFrame) {
    lazy val value: DataFrame = compute()
  }

  private val cache = TrieMap.empty[(Int, LogicalPlan, String), Memoized]

  /** Wall-clock seconds each memo entry's compute thunk took, keyed by
    * tag (summed when the same tag materializes for several inputs, e.g.
    * two scale factors in one session). Diagnostics only — Bench prints
    * this after its warmup pass so amortized medians stay auditable (the
    * r14 verdict's memo-accounting rule: a memo added to a query moves
    * its build cost into the untimed warmup, and that move must be
    * visible in the bench output, not discovered by plan archaeology). */
  private val buildLog = TrieMap.empty[String, Double]

  private def logged[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val s = (System.nanoTime() - t0) / 1e9
    buildLog.put(tag, buildLog.getOrElse(tag, 0.0) + s)
    r
  }

  /** Snapshot of per-tag build seconds (only tags whose compute ran). */
  def buildSeconds: Map[String, Double] = buildLog.toMap

  /** `localCheckpoint` PRESERVES attribute ids, so two callers of the same
    * memo entry — or two different memo entries derived from one another
    * (quantized → cellAssigned) — would share expr-ids and trip Spark's
    * ambiguous-self-join detection when their frames meet in one query.
    * A per-call re-aliasing projection mints fresh ids, matching the
    * pre-memo semantics where every invocation built a fresh plan. */
  private def freshIds(df: DataFrame): DataFrame =
    df.select(df.columns.toIndexedSeq.map(c => df(c).alias(c)): _*)

  /** Memoize `compute` for this (input, tag): first caller pays, later
    * callers get the materialized frame. `compute` must be a pure function
    * of the input frame — the tag must encode every other parameter.
    *
    * Materialization is an EAGER `localCheckpoint`, not `persist`: the
    * CC-loop output carries a 25-round iterative plan whose re-analysis
    * alone costs seconds per action (and lazily-checkpointed inner rounds
    * re-trigger under AQE-cached plans — measured SLOWER than recompute).
    * The eager checkpoint runs the plan exactly once and hands every
    * consumer a plain scan over the computed partitions.
    *
    * Storage is MEMORY_AND_DISK_SER, not the checkpoint default
    * (deserialized): checkpoint blocks are NON-RECOMPUTABLE, so unlike a
    * persist they can never be evicted outright — at the 100× vector
    * point the deserialized default pinned enough heap to OOM the 8g
    * driver (SparkExitCode 52) once the whole s-family memoized through
    * here. Serialized long-array rows pack tightly and spill to disk
    * cleanly; consumers pay one deserialization per read, noise next to
    * the compute being memoized. */
  private val MemoLevel =
    org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER

  def memo(input: DataFrame, tag: String)(compute: => DataFrame): DataFrame = {
    val key = (System.identityHashCode(input.sparkSession),
      input.queryExecution.analyzed.canonicalized, tag)
    val fresh = new Memoized(() => logged(tag)(compute.localCheckpoint(true, MemoLevel)))
    freshIds(cache.putIfAbsent(key, fresh).getOrElse(fresh).value)
  }

  /** [[memo]] variant for SHALLOW plans: materialize via persist + eager
    * count instead of localCheckpoint. Two reasons, both measured:
    * (1) STATS — a checkpoint scan is a LogicalRDD whose sizeInBytes is
    * spark.sql.defaultSizeInBytes (unknown-huge), so Catalyst plans every
    * downstream join shuffle-first and AQE can only convert, not remove,
    * the inserted exchanges (q32 at sf0.1: 2.0 s persisted vs 3.7 s
    * checkpointed — the InMemoryRelation's real size keeps the small side
    * broadcastable at plan time); (2) MEMORY — persisted blocks are
    * recomputable and therefore evictable, where checkpoint blocks are
    * pinned (the 100× vector OOM class). The price is that consumers
    * re-analyze the memoized plan per action — fine for shallow plans;
    * ITERATIVE chains (the CC loop, multi-round trainers) stay on the
    * checkpointing [[memo]], whose whole point was cutting their
    * re-analysis cost. */
  def memoPersisted(input: DataFrame, tag: String)(compute: => DataFrame): DataFrame = {
    val key = (System.identityHashCode(input.sparkSession),
      input.queryExecution.analyzed.canonicalized, tag)
    val fresh = new Memoized(() => logged(tag) {
      // SER, same as [[MemoLevel]]: the InMemoryRelation's stats are real
      // at any storage level, and the deserialized default's 3-4× larger
      // blocks starved execution memory at the 10× rehearsal (storage
      // below spark.memory.storageFraction is eviction-immune)
      val df = compute.persist(MemoLevel)
      df.count() // eager: later callers never race a half-built cache
      df
    })
    freshIds(cache.putIfAbsent(key, fresh).getOrElse(fresh).value)
  }

  /** [[memo]] variant for computes that pin upstream persists/checkpoints
    * only the materialization needs: `compute` returns the frame AND a
    * release thunk; the frame is eagerly checkpointed first, then the
    * thunk runs — so intermediate persists (edge frames, per-round
    * checkpoints) are freed the moment the memoized result is
    * self-contained instead of lingering for the session (the r7 d13
    * leak). The thunk runs even if the checkpoint fails. */
  def memoReleasing(input: DataFrame, tag: String)(
      compute: => (DataFrame, () => Unit)): DataFrame = {
    val key = (System.identityHashCode(input.sparkSession),
      input.queryExecution.analyzed.canonicalized, tag)
    val fresh = new Memoized(() => logged(tag) {
      val (df, release) = compute
      try df.localCheckpoint(true, MemoLevel) finally release()
    })
    freshIds(cache.putIfAbsent(key, fresh).getOrElse(fresh).value)
  }

  /** Number of distinct memoized entries (test observability). */
  def size: Int = cache.size

  private final class MemoizedValue(compute: () => Any) {
    lazy val value: Any = compute()
  }

  private val valueCache = TrieMap.empty[(Int, LogicalPlan, String), MemoizedValue]

  /** Driver-side value analogue of [[memo]], for k-bounded training
    * artifacts a loop collects to the driver (k-means centroids, BPE
    * merge tables): same key discipline — (session, canonicalized input
    * plan, tag), tag encoding every non-input parameter. The artifact is
    * O(k), so holding it for the session is control-plane state, not a
    * data-plane cache. */
  def memoValue[T](input: DataFrame, tag: String)(compute: => T): T = {
    val key = (System.identityHashCode(input.sparkSession),
      input.queryExecution.analyzed.canonicalized, tag)
    val fresh = new MemoizedValue(() => logged(tag)(compute))
    valueCache.putIfAbsent(key, fresh).getOrElse(fresh).value.asInstanceOf[T]
  }

  def clear(): Unit = {
    // every holder in the map had `.value` forced by its inserting thread,
    // so this never triggers a fresh compute — at worst it waits for an
    // in-flight one to finish before releasing it.
    //
    // Two storage classes need two release paths (r9 ADVICE): persisted
    // entries ([[memoPersisted]]) live in the CacheManager, which
    // DataFrame.unpersist() clears; checkpoint entries ([[memo]] /
    // [[memoReleasing]]) are plain LogicalRDD scans whose blocks the
    // CacheManager never registered — for them DataFrame.unpersist() is a
    // no-op and the non-recomputable blocks would otherwise free only
    // when the ContextCleaner GCs the RDD reference. Unpersisting the
    // LogicalRDD's OWN rdd (the exact RDD localCheckpoint persisted)
    // makes the between-family release the 100× rehearsal depends on
    // deterministic rather than GC-timed.
    cache.values.foreach { h =>
      try {
        h.value.queryExecution.analyzed.foreach {
          case l: org.apache.spark.sql.execution.LogicalRDD =>
            l.rdd.unpersist(blocking = false)
          case _ => ()
        }
        h.value.unpersist()
      } catch { case _: Throwable => () }
    }
    cache.clear()
    valueCache.clear()
  }
}
