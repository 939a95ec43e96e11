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

/**
 * SQ8 per-dimension encode — the fused kernel behind
 * [[graft.operators.Similarity.sqCodes]]'s interpreted
 * transform(sequence(…), element_at…) chain. Arithmetic is verbatim:
 * code_i = floor((x_i − lo_i)/(hi_i − lo_i)·255 + 0.5) clamped to
 * [0, 255], degenerate dims (hi == lo) code to 0; dims are 1..|vec|,
 * with lo/hi read positionally from the params arrays (null past their
 * end — mirroring element_at, which never fires for well-formed params).
 */
case class SqEncode(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(first.dataType) && ok(second.dataType) && ok(third.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs (vec, los, his)")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = true)
  override def prettyName: String = "sq_encode"

  override def nullSafeEval(v: Any, lo: Any, hi: Any): Any =
    SqOps.encode(v.asInstanceOf[ArrayData], lo.asInstanceOf[ArrayData],
      hi.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, lo, hi) =>
      s"${ev.value} = graft.functions.SqOps.encode($v, $lo, $hi);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** SQ8 midpoint reconstruction x̂_i = lo_i + code_i·(hi_i − lo_i)/255 —
  * the fused decode half (see [[SqEncode]]). */
case class SqDecode(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.LongType, _),
            ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<double>, array<double>)")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "sq_decode"

  override def nullSafeEval(c: Any, lo: Any, hi: Any): Any =
    SqOps.decode(c.asInstanceOf[ArrayData], lo.asInstanceOf[ArrayData],
      hi.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, lo, hi) =>
      s"${ev.value} = graft.functions.SqOps.decode($c, $lo, $hi);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object SqOps {
  // positions past the params arrays' end (or null inputs) yield null
  // elements — exactly the HOF's element_at-null propagation
  def encode(v: ArrayData, lo: ArrayData, hi: ArrayData): ArrayData = {
    val n = v.numElements()
    val p = math.min(lo.numElements(), hi.numElements())
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (i < p && !v.isNullAt(i) && !lo.isNullAt(i) && !hi.isNullAt(i)) {
        val l = lo.getDouble(i); val h = hi.getDouble(i)
        out(i) =
          if (h == l) java.lang.Long.valueOf(0L)
          else {
            val c = math.floor((v.getDouble(i) - l) / (h - l) * 255.0 + 0.5)
            java.lang.Long.valueOf(math.max(0.0, math.min(255.0, c)).toLong)
          }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def decode(c: ArrayData, lo: ArrayData, hi: ArrayData): ArrayData = {
    val n = c.numElements()
    val p = math.min(lo.numElements(), hi.numElements())
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (i < p && !c.isNullAt(i) && !lo.isNullAt(i) && !hi.isNullAt(i)) {
        val l = lo.getDouble(i); val h = hi.getDouble(i)
        out(i) = java.lang.Double.valueOf(
          l + c.getLong(i).toDouble * (h - l) / 255.0)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
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
  /** SQ8 codes of a vector against (los, his) params, one codegen pass. */
  def sqEncode(vec: Column, los: Column, his: Column): Column =
    GraftBridge.column(SqEncode(
      GraftBridge.expression(vec.cast("array<double>")),
      GraftBridge.expression(los.cast("array<double>")),
      GraftBridge.expression(his.cast("array<double>"))))
  /** SQ8 midpoint reconstruction from codes, one codegen pass. */
  def sqDecode(codes: Column, los: Column, his: Column): Column =
    GraftBridge.column(SqDecode(
      GraftBridge.expression(codes.cast("array<long>")),
      GraftBridge.expression(los.cast("array<double>")),
      GraftBridge.expression(his.cast("array<double>"))))
}
