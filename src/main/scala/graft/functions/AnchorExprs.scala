package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Both capture groups of every match of `regex`, in ONE matcher pass —
 * the fused rewrite of
 * `arrays_zip(regexp_extract_all(s, re, 1), regexp_extract_all(s, re, 2))`
 * behind [[graft.operators.WebGraph.extractLinks]], which ran the full
 * anchor automaton over each page's html TWICE (once per group) and then
 * allocated a zip array.
 *
 * Equivalence is by construction, not by re-implementation: the SAME
 * `java.util.regex` engine Spark's `regexp_extract_all` uses runs the
 * SAME pattern once, and each `find()` emits (group(1), group(2)) — the
 * exact pair the zip of the two per-group extractions produced (the
 * per-match group lists are index-aligned because they come from the
 * same match sequence). A non-participating group maps to "" exactly as
 * `RegExpExtractAll` maps it. Null input → null, no matches → empty
 * array (explode drops both, like the former shape).
 */
case class RegexCapturePairs(child: Expression, regex: String,
                             f1: String, f2: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField(f1, StringType, nullable = false),
    StructField(f2, StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "regex_capture_pairs"

  @transient private lazy val pattern: Pattern = Pattern.compile(regex)

  override def nullSafeEval(v: Any): Any =
    RegexCapturePairs.build(v.asInstanceOf[UTF8String], pattern)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("capturePattern", pattern,
      "java.util.regex.Pattern")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RegexCapturePairs.build($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegexCapturePairs {
  def build(s: UTF8String, p: Pattern): ArrayData = {
    val m = p.matcher(s.toString)
    val buf = new scala.collection.mutable.ArrayBuffer[Any](8)
    while (m.find()) {
      val g1 = m.group(1)
      val g2 = m.group(2)
      buf += (new GenericInternalRow(Array[Any](
        if (g1 == null) UTF8String.EMPTY_UTF8 else UTF8String.fromString(g1),
        if (g2 == null) UTF8String.EMPTY_UTF8 else UTF8String.fromString(g2)))
        : InternalRow)
    }
    new GenericArrayData(buf.toArray)
  }
}

object AnchorExprs {
  /** Array of (f1, f2) structs — groups 1 and 2 of every `regex` match. */
  def capturePairs(s: Column, regex: String, f1: String, f2: String): Column =
    GraftBridge.column(RegexCapturePairs(GraftBridge.expression(s), regex,
      f1, f2))
}
