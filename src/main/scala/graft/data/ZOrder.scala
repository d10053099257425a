package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) storage layout for multi-dimensional range
  * queries — the "OPTIMIZE ZORDER BY" lever of lakehouse tables, built
  * from public first principles: interleave the bits of two integer key
  * columns so that points close in (x, y) are close on the curve, write
  * the table partitioned by a coarse z-cell directory, and answer a 2-D
  * box query by statically pruning to the z-cells that intersect the box.
  *
  * Why this matters at 100 TB: a table laid out by ONE key prunes scans
  * on that key only — a predicate on (part, supplier), (user, time),
  * (lat, lon) still reads everything. The z-layout gives BOTH dimensions
  * partial locality, so a box covering p% of each axis reads ~(p²·cells
  * + curve-boundary overshoot) of the data instead of 100%. The pruning
  * is a literal `zbucket IN (...)` list computed on the driver from the
  * box — a STATIC PartitionFilter at the parquet scan, the same
  * mechanism `IvfLayoutSpec` proves for the IVF cell layout (no data is
  * read to decide what to read).
  *
  * The interleave is a plan-time generated integer expression
  * (shift/and/or over the 2^16-bounded keys) — narrow, codegen'd, no
  * shuffle beyond the layout write's own partitioning.
  */
object ZOrder {

  val Bits = 16 // per-dimension key budget: values must fit [0, 2^16)

  /** Morton interleave as a SQL expression over two integer columns:
    * bit i of x → bit 2i, bit i of y → bit 2i+1. */
  def zExpr(xCol: String, yCol: String): String =
    (0 until Bits).map { i =>
      s"(shiftleft(shiftright(CAST($xCol AS BIGINT), $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright(CAST($yCol AS BIGINT), $i) & 1, ${2 * i + 1}))"
    }.mkString(" + ")

  /** Driver-side mirror of [[zExpr]] (layout planning + tests). */
  def z(x: Long, y: Long): Long =
    (0 until Bits).foldLeft(0L) { (acc, i) =>
      acc + (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))
    }

  def decode(zv: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    for (i <- 0 until Bits) {
      x |= ((zv >> (2 * i)) & 1L) << i
      y |= ((zv >> (2 * i + 1)) & 1L) << i
    }
    (x, y)
  }

  /** Write `df` z-ordered on (xCol, yCol): rows carry their z value, the
    * directory key is the z-cell (top bits, `z >> shift`), and rows are
    * range-partitioned + sorted by z within the write so parquet min/max
    * footers are tight on BOTH source columns. An aligned z-cell of
    * 2^shift curve points is a rectangle of width 2^⌈shift/2⌉ and height
    * 2^⌊shift/2⌋ — the geometry [[bucketsFor]] prunes with. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, path: String,
      shift: Int = 22): Unit =
    df.withColumn("z", expr(zExpr(xCol, yCol)))
      .withColumn("zbucket", expr(s"shiftright(z, $shift)"))
      .repartitionByRange(col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").partitionBy("zbucket").parquet(path)

  /** Z-cells intersecting the inclusive box [x0,x1]×[y0,y1]: walk the
    * box's CELL-GRID range — an aligned z-cell of 2^shift curve points is
    * a wx×wy rectangle whose corner sits on the (wx, wy) grid, so the
    * intersecting cells are exactly the grid cells the clamped box spans.
    * Driver-side and O(box area / cell area), independent of the keyspace:
    * the r7 form filtered ALL 2^(2·Bits−shift) buckets, which a caller
    * passing a small shift turned into millions-to-billions of driver
    * decode calls (shift=10 → 4M, shift=2 → 1G). */
  def bucketsFor(x0: Long, x1: Long, y0: Long, y1: Long,
      shift: Int = 22): Seq[Long] = {
    require(shift >= 0 && shift <= 2 * Bits, s"shift must be in [0, ${2 * Bits}]")
    val wx = 1L << ((shift + 1) / 2)
    val wy = 1L << (shift / 2)
    val max = (1L << Bits) - 1
    val (cx0, cx1) = (math.max(x0, 0L), math.min(x1, max))
    val (cy0, cy1) = (math.max(y0, 0L), math.min(y1, max))
    if (cx0 > cx1 || cy0 > cy1) Seq.empty
    else for {
      gx <- cx0 / wx to cx1 / wx
      gy <- cy0 / wy to cy1 / wy
    } yield z(gx * wx, gy * wy) >> shift
  }

  /** Box query over a [[writeZOrdered]] layout: the z-cell list is a
    * literal IN-filter (static partition pruning at the scan), and the
    * exact box predicate re-filters inside the surviving cells. */
  def queryBox(spark: SparkSession, path: String, xCol: String, yCol: String,
      x0: Long, x1: Long, y0: Long, y1: Long, shift: Int = 22): DataFrame =
    spark.read.parquet(path)
      .filter(col("zbucket").isInCollection(bucketsFor(x0, x1, y0, y1, shift)))
      .filter(col(xCol).between(x0, x1) && col(yCol).between(y0, y1))
}
