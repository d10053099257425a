package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for every left row, the right row with the
  * greatest timestamp ≤ the left timestamp ("last value before").
  *
  * The naive formulations both die at scale: a range theta-join explodes
  * into BroadcastNestedLoopJoin (quadratic), and a global
  * union-then-window moves everything to ONE partition. This uses time
  * bucketing to stay linear with bounded shuffles:
  *
  *   1. bucket both sides by `floor(ts / bucketUs)`;
  *   2. per-bucket right maximum + a running "max of all earlier buckets"
  *      — computed over the small per-bucket frame (one row per occupied
  *      (key, bucket), not per data row) and joined back AQE-sized: the
  *      frame grows with #keys × time-span, so the code does not force a
  *      broadcast (AQE promotes it at runtime whenever measured small);
  *   3. equi-join left↔right on bucket (hash join, linear) to resolve
  *      within-bucket candidates, then `greatest(inBucket, prevBuckets)`.
  *
  * Shuffles: one hash join keyed by bucket + one aggregation keyed by the
  * left key. Both scale horizontally; nothing is quadratic and no global
  * single-partition pass touches the big side. The CDC engine uses the
  * same shape to position data events against heartbeat beacons (SURVEY
  * §2 T33; reference components/heartbeat_searcher.py:35-159 is the
  * sequential-scan original).
  */
object AsOfJoin {

  /** @param left      big side; all its columns are preserved
    * @param leftKey   unique key column of `left` (dedupes the bucket join)
    * @param right     small-to-medium side: (rightTs, rightVal) pairs
    * @param bucketUs  bucket width in the timestamp unit; pick so a typical
    *                  right-side gap spans O(1) buckets. Timestamps must be
    *                  non-negative: `DIV` truncates toward zero, so negative
    *                  values would fold into the wrong bucket
    * @param keys      optional equi-keys present on both sides: the as-of
    *                  match is resolved independently per key group (e.g.
    *                  per table)
    * @param foldLeft  fold ALL left columns through the in-bucket
    *                  aggregation instead of re-joining them afterwards —
    *                  map-side partial aggregation collapses the per-bucket
    *                  fan-out before the shuffle, so the left frame crosses
    *                  the wire ONCE instead of twice (agg + join-back).
    *                  Profitable when left is NARROW (a key + a timestamp):
    *                  the fold's max(struct(...)) comparisons touch every
    *                  carried byte, so wide CDC frames measured FASTER on
    *                  the join-back path — they keep the default.
    * @return left columns + `asof_ts`, `asof_val` (null when no right row
    *         precedes the left timestamp). Ties on rightTs resolve to the
    *         greatest rightVal.
    */
  def lastBefore(
      left: DataFrame,
      leftKey: String,
      leftTs: String,
      right: DataFrame,
      rightTs: String,
      rightVal: String,
      bucketUs: Long,
      keys: Seq[String] = Nil,
      foldLeft: Boolean = false): DataFrame = {

    val keyCols = keys.map(col)

    val r = right
      .select(keyCols ++ Seq(col(rightTs).as("__rts"), col(rightVal).as("__rval")): _*)
      .groupBy(keyCols :+ col("__rts"): _*).agg(max("__rval").as("__rval"))
      .withColumn("__bucket", expr(s"__rts DIV $bucketUs"))

    val l = left.withColumn("__bucket", expr(s"$leftTs DIV $bucketUs"))
    val grpCols = keys :+ "__bucket"

    // tiny frames: one row per occupied (key, bucket); the key-partitioned
    // window runs over #buckets rows, never over data rows. Left buckets
    // are unioned in (a right-side gap can span many empty buckets, and
    // those left rows must still see the carry-forward max of all EARLIER
    // right buckets — same-bucket right rows are excluded by ordering left
    // rows first on ties; the ≤-filtered in-bucket path handles them).
    val perBucket = r.groupBy(grpCols.map(col): _*)
      .agg(max(struct(col("__rts"), col("__rval"))).as("__bmax"))
      .withColumn("__isr", lit(1))
    val leftBuckets = l.select(grpCols.map(col): _*).distinct()
      .withColumn("__bmax", lit(null).cast(perBucket.schema("__bmax").dataType))
      .withColumn("__isr", lit(0))
    val wPrev = (if (keys.isEmpty) Window.orderBy("__bucket", "__isr")
                 else Window.partitionBy(keyCols: _*).orderBy(col("__bucket"), col("__isr")))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevCum = perBucket.unionByName(leftBuckets)
      .withColumn("__prev", max(col("__bmax")).over(wPrev))
      .filter(col("__isr") === 0)
      .select(grpCols.map(col) :+ col("__prev"): _*)

    // within-bucket resolution: linear equi-join on (keys, bucket), then
    // one NARROW aggregation per left key (only the candidate struct rides
    // the shuffle) and a join-back to re-attach the left columns. The
    // join-back costs a second left-key shuffle but keeps the aggregate
    // narrow — measured faster than folding wide left rows through max()
    // aggregates.
    val fanned = l
      .join(r, grpCols, "left")
      .withColumn("__cand",
        when(col("__rts") <= col(leftTs), struct(col("__rts"), col("__rval"))))

    val resolved = if (foldLeft) {
      // one left-key shuffle total: every left column rides the partial
      // aggregation (leftKey is unique, so max() of a constant-per-group
      // column is that column), no join-back
      val carried = l.columns.filter(_ != leftKey).toSeq // includes __bucket
      fanned.groupBy(leftKey)
        .agg(max(col("__cand")).as("__in"),
          carried.map(c => max(col(c)).as(c)): _*)
    } else {
      // narrow aggregation + join-back: only the candidate struct rides
      // the shuffle; the second left-key shuffle re-attaches the wide
      // left columns (measured faster for wide frames — see @param)
      val inBucket = fanned.groupBy(leftKey).agg(max(col("__cand")).as("__in"))
      l.join(inBucket, Seq(leftKey))
    }

    resolved
      .join(prevCum, grpCols, "left")
      .withColumn("__best", greatest(col("__in"), col("__prev")))
      .withColumn("asof_ts", col("__best.__rts"))
      .withColumn("asof_val", col("__best.__rval"))
      .drop("__bucket", "__in", "__prev", "__best")
  }
}
