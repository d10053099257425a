package graft.tools

import graft.Tables
import graft.data.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway stage profiler for the dedup family (noop writes — count()
  * would let Catalyst prune the expressions being measured). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.session("graft-profile")
    val docs = Tables.documents(spark, sfDir)

    def time(name: String)(df: => DataFrame): Unit = {
      def run() = df.write.format("noop").mode("overwrite").save()
      run() // warmup
      val t0 = System.nanoTime()
      run()
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    time("shingles")(TextOps.shingles(docs))
    time("minhash")(TextOps.minhashOf(TextOps.shingles(docs)))
    time("bands")(TextOps.lshBands(TextOps.minhashOf(TextOps.shingles(docs))))
    time("d3_full")(TextOps.dedupMinhashLsh(docs))
    locally {
      val sh = TextOps.shingles(docs).cache()
      val bands = TextOps.lshBands(TextOps.minhashOf(sh))
      val cands = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
      time("d3_cands")(cands)
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      time("d3_sizes")(sizes)
      val shA = sh.select(col("doc_id").as("doc_a"), col("sh"))
      val shB = sh.select(col("doc_id").as("doc_b2"), col("sh").as("sh_b"))
      val common = shA
        .join(broadcast(cands), "doc_a")
        .join(shB, col("doc_b") === col("doc_b2") && col("sh") === col("sh_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("common"))
      time("d3_common")(common)
    }
    time("d4_simhash")(TextOps.simhash(docs))

    // codegen-friendly simhash: explode words, md5 once per occurrence,
    // 16 sum(when) aggregates, bits reassembled from the sums
    time("d4_alt") {
      val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .withColumn("m", md5(col("w")))
      val sumCols = (0 until 16).map(j =>
        sum(expr(s"(ascii(substring(m, ${j + 1}, 1)) % 2) * 2 - 1")).as(s"s$j"))
      val sums = words.groupBy("doc_id").agg(sumCols.head, sumCols.tail: _*)
      val bitsExpr = (0 until 16).map(j => s"CASE WHEN s$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END").mkString(" + ")
      sums.withColumn("simhash", expr(bitsExpr))
        .withColumn("n_same", count(lit(1)).over(Window.partitionBy("simhash")).cast("long"))
        .select("doc_id", "simhash", "n_same")
        .orderBy("doc_id")
    }
    spark.stop()
  }
}
