package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed range join: every (point, interval) pair with
  * start ≤ point < end, optionally per equi-key group.
  *
  * The naive `ON s <= p AND p < e` theta-join plans as a nested-loop
  * product — quadratic, dead at scale. Bucketing makes it a hash join:
  * each interval is replicated to every bucket it overlaps (⌈len/B⌉ + 1
  * rows — bounded when B is chosen near the typical interval length),
  * each point maps to exactly one bucket, and the bucket equi-join
  * (hash, linear) produces a candidate set that the exact range
  * predicate then filters. The same decomposition databases ship as
  * "range join optimization"; [[AsOfJoin]] is its last-value-before
  * sibling.
  *
  * Degenerate intervals (end ≤ start) are dropped up front — they can
  * match nothing, and Spark's `sequence(a, b)` DESCENDS for b < a, which
  * would otherwise fabricate buckets.
  */
object RangeJoin {

  /** @param points      big side; all columns preserved
    * @param ptCol       numeric (e.g. epoch-day/µs) point column; non-negative
    * @param intervals   interval side with `startCol` ≤ x < `endCol`
    * @param bucketWidth bucket size in the same unit; pick ≈ typical
    *                    interval length so replication stays O(1)
    * @param keys        optional equi-keys on both sides (per-key ranges)
    * @return inner join: point columns + the matching interval's columns */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    // withColumn would silently OVERWRITE a caller's __b and drop() would
    // then delete it from the output — refuse instead of losing data
    require(!points.columns.contains("__b") && !intervals.columns.contains("__b"),
      "inputs must not carry a __b column (internal bucket key)")
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__b", explode(expr(
        s"sequence($startCol DIV $bucketWidth, ($endCol - 1) DIV $bucketWidth)")))
    val pt = points.withColumn("__b", expr(s"$ptCol DIV $bucketWidth"))
    pt.join(iv, keys :+ "__b")
      .filter(col(startCol) <= col(ptCol) && col(ptCol) < col(endCol))
      .drop("__b")
  }
}
