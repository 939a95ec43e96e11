package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Word n-gram construction as native Catalyst expressions — the codegen
 * rewrite of the interpreted HOF chains behind [[graft.operators.Dedup.shingleArray]]
 * (distinct shingles) and [[graft.operators.Curation.gramRows]] /
 * `repetitionSuite` (counting grams).
 *
 * Why a custom expression (the documented rejection of built-ins): the
 * relational formulation is `transform(sequence(...), i => concat_ws(" ",
 * element_at(ts, i), ...))` wrapped in the array()/element_at
 * lambda-binding trick — Spark's higher-order functions are
 * CodegenFallback, evaluated interpreted per row with a fresh lambda
 * frame per element, and do no common-subexpression elimination (the
 * repo measured 62 s vs <1 s when the token array was inlined instead of
 * bound, BENCH.md). These kernels run the same construction as one fused
 * JVM loop inside whole-stage codegen — the [[WinnowFingerprints]]
 * precedent (3.5× measured there).
 *
 * Semantics (pinned against the HOF forms in DedupSpec/CurationSpec
 * fixtures via the unchanged oracle rows): empty tokens are dropped
 * first (the `\W+`-split boundary artifacts — callers feed the raw
 * codegen split); fewer than n surviving tokens → empty array; grams
 * join tokens with a single space; `distinct = true` keeps first
 * occurrences in order (array_distinct semantics).
 */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(v: Any): Any =
    WordNgrams.build(v.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgrams.build($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {

  private val Space = UTF8String.fromString(" ")

  /** Non-null, non-empty tokens of the input array, in order. */
  private[functions] def cleanTokens(ts: ArrayData): Array[UTF8String] = {
    val n = ts.numElements()
    val buf = new Array[UTF8String](n)
    var i = 0; var len = 0
    while (i < n) {
      val t = ts.getUTF8String(i)
      if (t != null && t.numBytes() > 0) { buf(len) = t; len += 1 }
      i += 1
    }
    if (len == n) buf else java.util.Arrays.copyOf(buf, len)
  }

  private[functions] def gram(toks: Array[UTF8String], start: Int,
                              n: Int): UTF8String =
    if (n == 1) toks(start)
    else {
      val parts = new Array[UTF8String](2 * n - 1)
      var o = 0
      while (o < n) {
        parts(2 * o) = toks(start + o)
        if (o < n - 1) parts(2 * o + 1) = Space
        o += 1
      }
      UTF8String.concat(parts: _*)
    }

  def build(ts: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val toks = cleanTokens(ts)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val m = toks.length - n + 1
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
      var i = 0
      while (i < m) { seen.add(gram(toks, i, n)); i += 1 }
      val out = new Array[Any](seen.size)
      val it = seen.iterator(); var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) { out(i) = gram(toks, i, n); i += 1 }
      new GenericArrayData(out)
    }
  }
}

/**
 * All n-gram occurrences for EVERY n in `ns`, tagged (n, gram) — the
 * one-pass gram builder behind `repetitionSuite` (the former shape was a
 * flatten over per-n interpreted transforms). Output order matches:
 * all ns.head-grams in positional order, then the next n's, etc.
 */
case class WordNgramsTagged(child: Expression, ns: Seq[Int])
    extends UnaryExpression {
  require(ns.nonEmpty && ns.forall(_ >= 1), "ns must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "word_ngrams_tagged"

  @transient private lazy val nsArr: Array[Int] = ns.toArray

  override def nullSafeEval(v: Any): Any =
    WordNgramsTagged.build(v.asInstanceOf[ArrayData], nsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramNs", nsArr, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgramsTagged.build($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgramsTagged {
  def build(ts: ArrayData, ns: Array[Int]): ArrayData = {
    val toks = WordNgrams.cleanTokens(ts)
    var total = 0
    var k = 0
    while (k < ns.length) {
      val m = toks.length - ns(k) + 1
      if (m > 0) total += m
      k += 1
    }
    val out = new Array[Any](total)
    var j = 0
    k = 0
    while (k < ns.length) {
      val n = ns(k)
      val m = toks.length - n + 1
      var i = 0
      while (i < m) {
        out(j) = new GenericInternalRow(
          Array[Any](n, WordNgrams.gram(toks, i, n))): InternalRow
        i += 1; j += 1
      }
      k += 1
    }
    new GenericArrayData(out)
  }
}

/**
 * Skip-gram co-occurrence pairs — all (t_p, t_{p+d}) for d ∈ [1, window]
 * in p-major, d-minor order: the fused rewrite of
 * [[graft.operators.Curation.pmiCollocations]]'s interpreted
 * flatten/transform/element_at chain (CodegenFallback, one lambda frame
 * per (p, d)). Fewer than 2 tokens → empty array. Positions are taken
 * over the input array as-is (callers feed the cleaned tokenizer
 * output), matching the HOF's element_at indexing exactly.
 */
case class SkipgramPairs(child: Expression, window: Int)
    extends UnaryExpression {
  require(window >= 1, "window must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("x", StringType), StructField("y", StringType))),
    containsNull = false)
  override def prettyName: String = "skipgram_pairs"

  override def nullSafeEval(v: Any): Any =
    SkipgramPairs.build(v.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SkipgramPairs.build($c, $window);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SkipgramPairs {
  def build(ts: ArrayData, window: Int): ArrayData = {
    val n = ts.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    var total = 0L
    var p = 0
    while (p < n - 1) { total += math.min(window, n - 1 - p); p += 1 }
    val out = new Array[Any](total.toInt)
    var o = 0
    p = 0
    while (p < n - 1) {
      val dMax = math.min(window, n - 1 - p)
      var d = 1
      while (d <= dMax) {
        out(o) = new GenericInternalRow(Array[Any](
          ts.getUTF8String(p), ts.getUTF8String(p + d))): InternalRow
        o += 1
        d += 1
      }
      p += 1
    }
    new GenericArrayData(out)
  }
}

/**
 * Overlapping token chunks — the fused rewrite of
 * [[graft.operators.Curation.tokenChunks]]'s interpreted
 * transform(sequence(…), slice + concat_ws) chain (CodegenFallback, one
 * slice allocation + lambda frame per chunk). Emits
 * (start_tok 1-based, chunk = space-joined window, n_tokens) structs for
 * starts 1, 1+step, … ≤ max(n − overlap, 1), step = chunkSize − overlap —
 * the HOF's sequence bounds exactly (an empty array still yields one
 * empty-chunk struct; callers filter empty docs first).
 */
case class TokenChunks(child: Expression, chunkSize: Int, overlap: Int)
    extends UnaryExpression {
  require(overlap >= 0 && overlap < chunkSize, "overlap must be < chunkSize")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start_tok", LongType, nullable = false),
    StructField("chunk", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "token_chunks"

  override def nullSafeEval(v: Any): Any =
    TokenChunks.build(v.asInstanceOf[ArrayData], chunkSize, overlap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenChunks.build($c, $chunkSize, $overlap);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenChunks {
  private val Space = UTF8String.fromString(" ")
  private val Empty = UTF8String.fromString("")

  def build(ts: ArrayData, chunkSize: Int, overlap: Int): ArrayData = {
    val n = ts.numElements()
    val step = chunkSize - overlap
    val bound = math.max(n - overlap, 1) // sequence upper bound, 1-based
    val count = (bound - 1) / step + 1
    val out = new Array[Any](count)
    var c = 0
    var s = 1
    while (s <= bound) {
      val from = s - 1
      val until = math.min(from + chunkSize, n)
      val len = math.max(until - from, 0)
      val chunk =
        if (len == 0) Empty
        else if (len == 1) ts.getUTF8String(from)
        else {
          val parts = new Array[UTF8String](2 * len - 1)
          var o = 0
          while (o < len) {
            parts(2 * o) = ts.getUTF8String(from + o)
            if (o < len - 1) parts(2 * o + 1) = Space
            o += 1
          }
          UTF8String.concat(parts: _*)
        }
      // n_tokens mirrors least(size − s + 1, chunkSize) from the HOF
      out(c) = new GenericInternalRow(Array[Any](
        s.toLong, chunk, math.min(n - s + 1, chunkSize).toLong)): InternalRow
      c += 1
      s += step
    }
    new GenericArrayData(out)
  }
}

/**
 * Per-document n-gram term frequencies — (gram, tf) structs computed
 * WITHIN the row, first-occurrence order. Replaces the
 * `gramRows → groupBy(id, gram).count()` shape wherever the count is
 * per-document: a doc's gram counts are a pure per-row function, so the
 * corpus-sized (id, gram) exchange the groupBy paid is simply removed
 * (guide §2.4); the exploded output rows are already unique per
 * (id, gram). Empty/short docs → empty array.
 */
case class GramCounts(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("gram", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "gram_counts"

  override def nullSafeEval(v: Any): Any =
    GramCounts.build(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramCounts.build($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramCounts {
  def build(ts: ArrayData, n: Int): ArrayData = {
    val toks = WordNgrams.cleanTokens(ts)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.LinkedHashMap[UTF8String, java.lang.Long](m * 2)
    var i = 0
    while (i < m) {
      val g = WordNgrams.gram(toks, i, n)
      val c = counts.get(g)
      counts.put(g, if (c == null) java.lang.Long.valueOf(1L)
        else java.lang.Long.valueOf(c.longValue() + 1L))
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(
        Array[Any](e.getKey, e.getValue.longValue())): InternalRow
      j += 1
    }
    new GenericArrayData(out)
  }
}

object NgramExprs {
  /** Distinct word n-grams (first-occurrence order) over a token array. */
  def shingleTokens(tokens: Column, n: Int): Column =
    GraftBridge.column(WordNgrams(GraftBridge.expression(tokens), n,
      distinct = true))
  /** All word n-gram occurrences, in positional order. */
  def gramTokens(tokens: Column, n: Int): Column =
    GraftBridge.column(WordNgrams(GraftBridge.expression(tokens), n,
      distinct = false))
  /** All (n, gram) occurrences for every n in `ns`, one pass. */
  def gramsTagged(tokens: Column, ns: Seq[Int]): Column =
    GraftBridge.column(WordNgramsTagged(GraftBridge.expression(tokens), ns))
  /** All skip-gram (x, y) pairs up to `window` apart, one pass. */
  def skipgramPairs(tokens: Column, window: Int): Column =
    GraftBridge.column(SkipgramPairs(GraftBridge.expression(tokens), window))
  /** Overlapping (start_tok, chunk, n_tokens) token chunks, one pass. */
  def tokenChunks(tokens: Column, chunkSize: Int, overlap: Int): Column =
    GraftBridge.column(TokenChunks(GraftBridge.expression(tokens),
      chunkSize, overlap))
  /** Per-row (gram, tf) term frequencies, one pass. */
  def gramCounts(tokens: Column, n: Int): Column =
    GraftBridge.column(GramCounts(GraftBridge.expression(tokens), n))
}
