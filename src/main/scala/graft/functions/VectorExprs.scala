package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native (whole-stage-codegen) float-vector dot product.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are
  * CodegenFallback — interpreted lambda dispatch per element — which made
  * the all-pairs cosine stage the bench bottleneck (~75 s at sf0.1). This
  * expression emits a tight fused-multiply-add loop instead. Semantics are
  * EXACTLY the fold the oracle uses: Σ left-to-right of
  * `(double) a[i] * (double) b[i]` — bit-identical to the generated DuckDB
  * term sum ([[SimilarityOps.dotDuck]]), so oracle comparisons stay exact.
  *
  * This is the (b)-tier of the custom-operator preference order (compose
  * built-ins < custom Expression < custom plan node): a scalar expression
  * that keeps the surrounding join/top-k plan fully declarative.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<float> arguments, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  // Mismatched lengths → NULL, matching the zip_with/aggregate reference
  // (whose padded nulls poison the fold) — a truncated dot would be a
  // plausible-but-wrong similarity.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column API for [[DotProduct]] (array<float> × array<float> → double). */
  def dotNative(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def normNative(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotNative(a, a))
}
