package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native Catalyst expressions for the vector-similarity operators.
 *
 * Spark's higher-order functions (`zip_with`, `aggregate`) are evaluated
 * interpreted — fine for cold paths, but the cosine kernel sits inside the
 * candidate-pair scans of the embedding dedup / ANN operators where it runs
 * once per candidate pair. `CosineSim` is the same arithmetic as the
 * zip_with+fold formulation (index-order accumulation, so results are
 * bit-identical) compiled into whole-stage codegen: a single fused loop
 * computing dot(a,b), ‖a‖², ‖b‖² in one pass over the arrays.
 */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  // Interpreted fallback — identical accumulation order to the codegen path.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // All locals via ctx.freshName (as Spark's built-ins do): nullSafeExec
  // emits no scoping braces when a child is non-nullable, so two instances
  // of this expression in one whole-stage function would otherwise declare
  // duplicate locals → Janino error → silent interpreted fallback.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /**
   * cosine(a, b) as a codegen'd expression. Accepts `array<float>` or
   * `array<double>` — inputs are cast to `array<double>` here (the
   * expression itself requires doubles; a same-type cast is elided by
   * SimplifyCasts, so the double path pays nothing). Unequal-length arrays
   * are truncated to the shorter length (the old zip_with fold returned
   * null there) — documented divergence, asserted in SimilaritySpec.
   */
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(
      GraftBridge.expression(a.cast("array<double>")),
      GraftBridge.expression(b.cast("array<double>"))))
}
