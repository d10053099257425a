package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * A hash join on a key where a handful of values dominate sends those
  * values' entire row sets to single tasks — the job runs at the speed of
  * the hottest key. AQE's skew-join split handles this when statistics
  * catch it; salting is the explicit, deterministic form: spread each hot
  * fact key across `salts` sub-keys and replicate the (small) build side
  * once per sub-key, so the hot key's rows land on `salts` tasks instead
  * of one.
  *
  * Replication cost is `salts × |dim|`, so this composes with (does not
  * replace) broadcasting: broadcast when the dim fits in memory; salt when
  * the dim is too big to broadcast AND the fact key is skewed.
  */
object SkewOps {

  /** Inner equi-join `fact ⋈ dim` on `key`, salted with `salts` sub-keys.
    * Result is row-identical to the unsalted join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int = 16): DataFrame = {
    // deterministic per-row salt: hash of the whole fact row spreads even
    // a single hot key uniformly (rand() would break retry determinism)
    val factSalted = fact.withColumn("__salt",
      pmod(hash(fact.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val dimSalted = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    factSalted.join(dimSalted, Seq(key, "__salt")).drop("__salt")
  }
}
