package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/**
 * JPEG dimension extraction — the "harder case" of container-header
 * decoding (see graft.operators.Multimodal for the PNG fixed-offset case).
 *
 * Unlike PNG, a JPEG interleaves variable-length segments (APPn, DQT, DHT,
 * COM, ...) before the Start-Of-Frame marker that carries the dimensions,
 * so extraction is a marker SCAN, not a fixed offset: walk
 * `FF <marker> <len_be16> <payload>` segments from SOI until an SOFn
 * (0xC0-0xCF except DHT 0xC4, JPG 0xC8, DAC 0xCC), whose payload is
 * `precision(1) height(2,BE) width(2,BE) ...`.
 *
 * A loop over bytes is exactly what Spark's expression DSL can't compose
 * from built-ins, so this is a custom Catalyst expression with `doGenCode`
 * (custom-operator ladder rung (b)): the scan compiles into the whole-stage
 * function and runs inside the parquet scan — no UDF, no mapPartitions.
 * Null for anything that isn't a well-formed JPEG up to its SOF.
 */
case class JpegDim(child: Expression, isWidth: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = if (isWidth) "jpeg_width" else "jpeg_height"

  /** Shared scan: returns -1 when no SOF is found / input is not a JPEG. */
  private def scan(b: Array[Byte]): Long = {
    val n = b.length
    if (n < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return -1L
    var i = 2
    while (i + 9 < n) {
      if ((b(i) & 0xFF) != 0xFF) return -1L
      val m = b(i + 1) & 0xFF
      if (m == 0xFF) i += 1 // fill byte before a marker
      else if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
        return if (isWidth) (((b(i + 7) & 0xFF) << 8) | (b(i + 8) & 0xFF)).toLong
        else (((b(i + 5) & 0xFF) << 8) | (b(i + 6) & 0xFF)).toLong
      } else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i += 2 // standalone
      else {
        val len = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
        if (len < 2) return -1L
        i += 2 + len
      }
    }
    -1L
  }

  override def nullSafeEval(input: Any): Any = {
    val r = scan(input.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val b = ctx.freshName("b"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val m = ctx.freshName("m")
      val len = ctx.freshName("len"); val r = ctx.freshName("r")
      val dimExpr =
        if (isWidth) s"((long) ((($b[$i + 7] & 0xFF) << 8) | ($b[$i + 8] & 0xFF)))"
        else s"((long) ((($b[$i + 5] & 0xFF) << 8) | ($b[$i + 6] & 0xFF)))"
      s"""
         |byte[] $b = $bytes;
         |int $n = $b.length;
         |long $r = -1L;
         |if ($n >= 4 && ($b[0] & 0xFF) == 0xFF && ($b[1] & 0xFF) == 0xD8) {
         |  int $i = 2;
         |  while ($i + 9 < $n) {
         |    if (($b[$i] & 0xFF) != 0xFF) break;
         |    int $m = $b[$i + 1] & 0xFF;
         |    if ($m == 0xFF) { $i += 1; continue; }
         |    if ($m >= 0xC0 && $m <= 0xCF && $m != 0xC4 && $m != 0xC8 && $m != 0xCC) {
         |      $r = $dimExpr;
         |      break;
         |    } else if ($m == 0x01 || ($m >= 0xD0 && $m <= 0xD7)) {
         |      $i += 2;
         |    } else {
         |      int $len = (($b[$i + 2] & 0xFF) << 8) | ($b[$i + 3] & 0xFF);
         |      if ($len < 2) break;
         |      $i += 2 + $len;
         |    }
         |  }
         |}
         |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageExprs {
  /** JPEG frame width from the SOF marker scan; null if not a JPEG. */
  def jpegWidth(bin: Column): Column =
    GraftBridge.column(JpegDim(GraftBridge.expression(bin), isWidth = true))

  /** JPEG frame height from the SOF marker scan; null if not a JPEG. */
  def jpegHeight(bin: Column): Column =
    GraftBridge.column(JpegDim(GraftBridge.expression(bin), isWidth = false))
}
