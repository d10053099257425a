package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/** Native codegen'd dot product over BIGINT arrays — the inner loop of the
  * similarity-search family (SURVEY §8: s1-s3, d5).
  *
  * The `aggregate(zip_with(a, b, ...))` higher-order-function formulation
  * allocates a zipped intermediate array and evaluates its lambdas
  * interpreted, OUTSIDE whole-stage codegen, for every candidate pair —
  * the exact hot path brute-force ANN spends its time in. This expression
  * generates a tight primitive `long` loop into the whole-stage-codegen
  * method instead: no allocation, no virtual calls, null-safe via
  * `nullSafeCodeGen`.
  *
  * Also the norm: `graft_dot_long(v, v)` replaces the aggregate-lambda
  * squared-norm.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering the engine's native functions; installed
  * by `graft.Tables.session` via `SparkSession.builder.withExtensions`
  * (equivalently `spark.sql.extensions=graft.functions.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot_long"),
      new ExpressionInfo(classOf[LongDotProduct].getName, "graft_dot_long"),
      (children: Seq[Expression]) => LongDotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_span_hashes"),
      new ExpressionInfo(classOf[RollingSpanHashes].getName, "graft_span_hashes"),
      (children: Seq[Expression]) => RollingSpanHashes(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_topk_pairs"),
      new ExpressionInfo(classOf[TopKPairs].getName, "graft_topk_pairs"),
      (children: Seq[Expression]) =>
        TopKPairs(children(0), children(1), children(2), children(3))))
    ext.injectFunction((
      new FunctionIdentifier("graft_qsketch"),
      new ExpressionInfo(classOf[QuantileSketch].getName, "graft_qsketch"),
      (children: Seq[Expression]) =>
        QuantileSketch(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_hits"),
      new ExpressionInfo(classOf[BloomHits].getName, "graft_bloom_hits"),
      (children: Seq[Expression]) =>
        BloomHits(children(0), children(1), children(2), children(3))))
  }
}
