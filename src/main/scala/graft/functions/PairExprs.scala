package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/**
 * Array-local unordered-pair enumeration as native Catalyst expressions —
 * the codegen rewrite of the interpreted HOF chains behind
 * [[graft.operators.Dedup.pairCombos]],
 * [[graft.operators.Similarity.weightedPairCombos]] and
 * [[graft.operators.Curation.sourceOverlap]]'s pair builder.
 *
 * Why a custom expression (the documented rejection of built-ins, the
 * [[WordNgrams]] pattern): Spark's higher-order functions are
 * CodegenFallback — each bucket row paid an interpreted
 * `flatten(transform(sequence…))` that allocated O(n²) transient index
 * structs, then a `filter` and a second `transform`, each binding a fresh
 * lambda frame per element with an `element_at` lookup per field access.
 * These kernels run the i<j enumeration as one fused JVM loop inside
 * whole-stage codegen and allocate only the surviving output structs.
 *
 * Semantics are pinned to the HOF forms (PropertySpec nested-loop
 * references + the unchanged oracle rows): value comparison uses Spark's
 * interpreted ordering for the field type (same NaN/equality semantics as
 * `===`, `least`, `greatest`), `least`/`greatest` skip nulls, and output
 * order is the HOF's i-major / j-minor enumeration order.
 */
private[functions] final class StructPairKernel(
    val aIdx: Int, val aType: DataType,
    val bIdx: Int, val bType: DataType,
    val numFields: Int) extends Serializable {
  @transient lazy val aOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(aType)
  @transient lazy val bOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(bType)
}

object PairOps {

  /** least() with Spark's skip-null semantics. */
  private def lo(x: Any, y: Any, ord: Ordering[Any]): Any =
    if (x == null) y else if (y == null) x
    else if (ord.compare(x, y) <= 0) x else y

  /** greatest() with Spark's skip-null semantics. */
  private def hi(x: Any, y: Any, ord: Ordering[Any]): Any =
    if (x == null) y else if (y == null) x
    else if (ord.compare(x, y) >= 0) x else y

  /** [[graft.operators.Dedup.pairCombos]]: same-block unordered pairs.
    * Kernel fields: a = blk (equality guard), b = id (least/greatest). */
  def pairCombos(arr: ArrayData, k: StructPairKernel): ArrayData = {
    val n = arr.numElements()
    val blks = new Array[Any](n)
    val ids = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val r = arr.getStruct(i, k.numFields)
        blks(i) = r.get(k.aIdx, k.aType)
        ids(i) = r.get(k.bIdx, k.bType)
      }
      i += 1
    }
    val out = new java.util.ArrayList[Any](n)
    i = 0
    while (i < n) {
      val bi = blks(i)
      if (bi != null) {
        var j = i + 1
        while (j < n) {
          val bj = blks(j)
          if (bj != null && k.aOrd.compare(bi, bj) == 0) {
            out.add(new GenericInternalRow(Array[Any](
              lo(ids(i), ids(j), k.bOrd),
              hi(ids(i), ids(j), k.bOrd))): InternalRow)
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** [[graft.operators.Similarity.weightedPairCombos]]: all unordered
    * pairs with the weight product. Kernel fields: a = id, b = w. */
  def weightedPairCombos(arr: ArrayData, k: StructPairKernel): ArrayData = {
    val n = arr.numElements()
    val ids = new Array[Any](n)
    val ws = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val r = arr.getStruct(i, k.numFields)
        ids(i) = r.get(k.aIdx, k.aType)
        ws(i) = r.get(k.bIdx, k.bType)
      }
      i += 1
    }
    val out = new Array[Any](if (n < 2) 0 else n * (n - 1) / 2)
    var o = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val prod: Any =
          if (ws(i) == null || ws(j) == null) null
          else java.lang.Double.valueOf(
            ws(i).asInstanceOf[Double] * ws(j).asInstanceOf[Double])
        out(o) = new GenericInternalRow(Array[Any](
          lo(ids(i), ids(j), k.aOrd),
          hi(ids(i), ids(j), k.aOrd), prod)): InternalRow
        o += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[UnorderedPairs]]: all {elem_i, elem_j} for i < j with
    * (id1, id2) = (least, greatest) — the self-join-free candidate-pair
    * enumeration over an UNSORTED bucket array. */
  def unorderedPairs(arr: ArrayData, elemType: DataType,
                     ord: Ordering[Any]): ArrayData = {
    val n = arr.numElements()
    val vs = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) vs(i) = arr.get(i, elemType)
      i += 1
    }
    val out = new Array[Any](if (n < 2) 0 else n * (n - 1) / 2)
    var o = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val a = vs(i); val b = vs(j)
        val (x, y) =
          if (a == null) (b, b) else if (b == null) (a, a)
          else if (ord.compare(a, b) <= 0) (a, b) else (b, a)
        out(o) = new GenericInternalRow(Array[Any](x, y)): InternalRow
        o += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[OrderedPairs]]: all (elem_i, elem_j) for i < j, positional order —
    * callers feed a SORTED array, so the pair is already ordered. */
  def orderedPairs(arr: ArrayData, elemType: DataType): ArrayData = {
    val n = arr.numElements()
    val vs = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) vs(i) = arr.get(i, elemType)
      i += 1
    }
    val out = new Array[Any](if (n < 2) 0 else n * (n - 1) / 2)
    var o = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(o) = new GenericInternalRow(Array[Any](vs(i), vs(j))): InternalRow
        o += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] trait StructPairExpr extends UnaryExpression {
  /** (guard-or-id field, value field) names in the element struct. */
  protected def fieldA: String
  protected def fieldB: String

  protected def elemStruct: StructType =
    child.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.fieldNames.contains(fieldA) && st.fieldNames.contains(fieldB) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<$fieldA, $fieldB, …>> input, " +
        s"got ${other.catalogString}")
  }

  @transient protected lazy val kernel: StructPairKernel = {
    val st = elemStruct
    val ai = st.fieldIndex(fieldA)
    val bi = st.fieldIndex(fieldB)
    new StructPairKernel(ai, st(ai).dataType, bi, st(bi).dataType, st.size)
  }

  protected def kernelRef(ctx: CodegenContext): String =
    ctx.addReferenceObj("pairKernel", kernel,
      classOf[StructPairKernel].getName)
}

/** Same-block unordered (id1 ≤ id2) pairs from an array of (blk, id)
  * structs — [[graft.operators.Dedup.pairCombos]]'s semantics as one
  * codegen loop: pair (i, j), i < j, emitted iff blk_i = blk_j (null
  * blocks pair with nothing), ids through least/greatest. */
case class PairCombos(child: Expression) extends StructPairExpr {
  protected def fieldA: String = "blk"
  protected def fieldB: String = "id"
  override def prettyName: String = "pair_combos"

  override def dataType: DataType = {
    val idF = elemStruct(elemStruct.fieldIndex("id"))
    ArrayType(StructType(Seq(
      StructField("id1", idF.dataType, idF.nullable),
      StructField("id2", idF.dataType, idF.nullable))), containsNull = false)
  }

  override def nullSafeEval(v: Any): Any =
    PairOps.pairCombos(v.asInstanceOf[ArrayData], kernel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = kernelRef(ctx)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PairOps.pairCombos($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All unordered (id1 ≤ id2, prod = w_i·w_j) pairs from an array of
  * (id, w) structs — [[graft.operators.Similarity.weightedPairCombos]]'s
  * semantics as one codegen loop (callers group by (token, block), so
  * block equality holds by construction and every i < j pair is emitted). */
case class WeightedPairCombos(child: Expression) extends StructPairExpr {
  protected def fieldA: String = "id"
  protected def fieldB: String = "w"
  override def prettyName: String = "weighted_pair_combos"

  override def checkInputDataTypes(): TypeCheckResult =
    super.checkInputDataTypes() match {
      case TypeCheckResult.TypeCheckSuccess
          if elemStruct(elemStruct.fieldIndex("w")).dataType != DoubleType =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a double `w` field, got " +
            elemStruct(elemStruct.fieldIndex("w")).dataType.catalogString)
      case r => r
    }

  override def dataType: DataType = {
    val st = elemStruct
    val idF = st(st.fieldIndex("id"))
    val wN = st(st.fieldIndex("w")).nullable
    ArrayType(StructType(Seq(
      StructField("id1", idF.dataType, idF.nullable),
      StructField("id2", idF.dataType, idF.nullable),
      StructField("prod", DoubleType, wN))), containsNull = false)
  }

  override def nullSafeEval(v: Any): Any =
    PairOps.weightedPairCombos(v.asInstanceOf[ArrayData], kernel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = kernelRef(ctx)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PairOps.weightedPairCombos($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All unordered {elem_i, elem_j} pairs (i < j positions) over a scalar
  * array, each emitted as (id1 = least, id2 = greatest) — the array-local
  * candidate-pair generator behind [[graft.operators.Dedup]]'s LSH bucket
  * enumeration (replaces the (band, band_key)-keyed SELF-JOIN: one
  * collect_list aggregate + this kernel instead of a bucket-count
  * aggregate, a semi-join and the join itself). */
case class UnorderedPairs(child: Expression) extends UnaryExpression {
  override def prettyName: String = "unordered_pairs"

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elemType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array input, got ${other.catalogString}")
  }

  override def dataType: DataType = {
    val at = child.dataType.asInstanceOf[ArrayType]
    ArrayType(StructType(Seq(
      StructField("id1", at.elementType, at.containsNull),
      StructField("id2", at.elementType, at.containsNull))),
      containsNull = false)
  }

  override def nullSafeEval(v: Any): Any =
    PairOps.unorderedPairs(v.asInstanceOf[ArrayData], elemType, ord)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refT = ctx.addReferenceObj("elemType", elemType,
      classOf[DataType].getName)
    val refO = ctx.addReferenceObj("elemOrd", ord, "scala.math.Ordering")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PairOps.unorderedPairs($c, $refT, $refO);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All (src1 = elem_i, src2 = elem_j) pairs for i < j over a scalar array
  * in positional order — [[graft.operators.Curation.sourceOverlap]] feeds
  * a sorted source list, so src1 < src2 by construction. */
case class OrderedPairs(child: Expression) extends UnaryExpression {
  override def prettyName: String = "ordered_pairs"

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array input, got ${other.catalogString}")
  }

  override def dataType: DataType = {
    val at = child.dataType.asInstanceOf[ArrayType]
    ArrayType(StructType(Seq(
      StructField("src1", at.elementType, at.containsNull),
      StructField("src2", at.elementType, at.containsNull))),
      containsNull = false)
  }

  override def nullSafeEval(v: Any): Any =
    PairOps.orderedPairs(v.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("elemType", elemType,
      classOf[DataType].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PairOps.orderedPairs($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PairExprs {
  /** Same-block (id1 ≤ id2) pairs from (blk, id) postings. */
  def pairCombos(ds: Column): Column =
    GraftBridge.column(PairCombos(GraftBridge.expression(ds)))
  /** All (id1 ≤ id2, prod) pairs from (id, w) postings. */
  def weightedPairCombos(ds: Column): Column =
    GraftBridge.column(WeightedPairCombos(GraftBridge.expression(ds)))
  /** All positional i<j pairs from a (sorted) scalar array. */
  def orderedPairs(ss: Column): Column =
    GraftBridge.column(OrderedPairs(GraftBridge.expression(ss)))
  /** All unordered (id1 ≤ id2) pairs from an unsorted scalar array. */
  def unorderedPairs(ds: Column): Column =
    GraftBridge.column(UnorderedPairs(GraftBridge.expression(ds)))
}
