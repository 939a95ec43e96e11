package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Winnowing fingerprint selection (Schleimer et al. 2003) as ONE native
 * Catalyst expression — the hot-path rewrite of the HOF formulation in
 * [[graft.operators.Dedup.winnowedDupSpans]]:
 *
 *  - the HOF chain evaluates interpreted and allocates per window (a
 *    w-slice + min + position scan per selection window, a k-slice or
 *    k-gram digest per hash window): O(n·k + n·w) interpreted steps and
 *    O(n) array copies per document, measured as the whole bench's
 *    compute tail;
 *  - this expression does the complete job in a single O(n) JVM pass:
 *    one md5 per TOKEN (not per window), window hashes by rolling
 *    Horner update h' = (h − t_out·B^(k−1))·B + t_in (mod P), and
 *    leftmost-min selection with a monotonic deque (strict-pop keeps
 *    the earliest index among equal values — exactly the published
 *    leftmost tie-break).
 *
 * Hash construction is IDENTICAL to the portable SQL form the oracle
 * replays (token hash = first 15 md5 hex chars mod P = 2³¹−1; window
 * hash = 0-seeded Horner fold, B = 1000003), so the expression, the HOF
 * variant [[graft.operators.Dedup.winnowedDupSpansFast]] originally
 * used, and DuckDB's `list_reduce` all produce the same fingerprints.
 * Winnowing's selected positions are non-decreasing in the window start
 * (a later window selecting an EARLIER position would contradict the
 * leftmost-min rule on the earlier window), so adjacent-duplicate
 * suppression reproduces `array_distinct` exactly.
 *
 * Returns the selected fingerprints as array<bigint>; fewer than
 * k + w − 1 tokens → empty array (the operator's absent-doc contract
 * falls out of the downstream explode).
 */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(v: Any): Any =
    WinnowFingerprints.select(v.asInstanceOf[ArrayData], k, w)

  // The loop lives in a static helper; codegen emits one call, keeping
  // the expression inside whole-stage codegen (the same shape Spark's
  // own built-ins use for non-trivial kernels).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFingerprints.select($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  val P = 2147483647L // 2^31 − 1, shared with Dedup.MinhashP
  val B = 1000003L

  /** Token hash: first 15 md5 hex chars (= 60 bits) of the utf8 bytes,
    * mod P — bit-identical to `pmod(conv(substring(md5(t),1,15),16,10),P)`. */
  private def tokenHash(md: java.security.MessageDigest,
                        bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
    v = (v << 4) | ((d(7) & 0xf0L) >> 4)
    v % P
  }

  def select(ts: ArrayData, k: Int, w: Int): ArrayData = {
    val n = ts.numElements()
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Long])
    val md = java.security.MessageDigest.getInstance("MD5")
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = tokenHash(md, ts.getUTF8String(i).getBytes)
      i += 1
    }
    val m = n - k + 1
    val hs = new Array[Long](m)
    var h = 0L
    var j = 0
    while (j < k) { h = (h * B + th(j)) % P; j += 1 }
    hs(0) = h
    var bk = 1L
    j = 0
    while (j < k - 1) { bk = bk * B % P; j += 1 }
    var s = 1
    while (s < m) {
      // th·bk < 2^62: fits signed 64; re-normalize the negative residue
      h = ((h - th(s - 1) * bk % P) % P + P) % P
      h = (h * B + th(s + k - 1)) % P
      hs(s) = h
      s += 1
    }
    // leftmost-min of each w-window of hs, monotonic deque; strict-pop
    // (>) keeps the EARLIEST index among equal values
    val out = new scala.collection.mutable.ArrayBuffer[Long](m / w + 2)
    val dq = new Array[Int](m)
    var head = 0; var tail = 0
    var last = -1
    var idx = 0
    while (idx < m) {
      while (tail > head && hs(dq(tail - 1)) > hs(idx)) tail -= 1
      dq(tail) = idx; tail += 1
      val start = idx - w + 1
      if (start >= 0) {
        while (dq(head) < start) head += 1
        val p = dq(head)
        if (p != last) { out += hs(p); last = p }
      }
      idx += 1
    }
    new GenericArrayData(out.toArray)
  }
}

object WinnowExprs {
  /** Selected winnowing fingerprints of a token array, as one codegen'd
    * O(n) kernel. */
  def winnowFingerprints(tokens: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowFingerprints(
      GraftBridge.expression(tokens), k, w))
}
