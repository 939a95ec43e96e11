package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis.pround4

/**
 * Training-data curation operators beyond the reference's surface (builder
 * brief: "the operations a large-scale training-data pipeline would need"):
 * repetition-based quality signals (Gopher-style), PII masking,
 * deterministic stratified sampling, token-window chunking, and benchmark
 * contamination detection.
 *
 * Scale design: everything is a scan-local expression or a single bounded
 * shuffle; the only joins are against bounded sides (the benchmark shingle
 * set); randomness is replaced by content hashes so sampling is
 * deterministic, engine-portable, and resume-stable.
 */
object Curation {

  /** Non-distinct word n-gram rows (id, gram) — the counting variant of
    * [[Dedup.shingles]] (which de-dups per doc). Same lambda-binding rule:
    * the token array MUST be bound once (interpreted HOFs do no CSE). */
  def gramRows(docs: DataFrame, idCol: String, textCol: String,
               n: Int): DataFrame = {
    val toks = filter(split(lower(col(textCol)), "\\W+"), t => t =!= "")
    def gramsOf(ts: Column): Column =
      when(size(ts) >= n,
        transform(sequence(lit(1), size(ts) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(o => element_at(ts, i + o)): _*)))
        .otherwise(array().cast("array<string>"))
    val grams = element_at(transform(array(toks), ts => gramsOf(ts)), 1)
    docs.select(col(idCol), explode(grams).as("gram"))
  }

  /**
   * Gopher-style duplicate-line fraction: 1 − distinct(lines)/lines over
   * non-blank lines; 0 for line-less docs. Pure scan-local expression.
   */
  def dupLineFraction(text: Column): Column = {
    val lines = filter(split(text, "\\n"), l => trim(l) =!= "")
    when(size(lines) === 0, 0.0).otherwise(
      pround4(lit(1.0) -
        size(array_distinct(lines)).cast("double") / size(lines)))
  }

  /**
   * Gopher-style top-bigram fraction per doc: occurrences of the most
   * frequent word bigram / total bigrams. One partial-agg shuffle on
   * (id, gram), then an id-local roll-up. Docs with <2 tokens are absent
   * (callers left-join + coalesce 0).
   */
  def topBigramFraction(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    gramRows(docs, idCol, textCol, n = 2)
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(pround4(max(col("c")).cast("double") / sum(col("c")))
        .as("top_bigram_frac"))

  /** Repetition-quality signals for every doc (absent bigrams → 0). */
  def repetitionSignals(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    docs.select(col(idCol), dupLineFraction(col(textCol)).as("dup_line_frac"))
      .join(topBigramFraction(docs, idCol, textCol), Seq(idCol), "left")
      .select(col(idCol), col("dup_line_frac"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"))

  /** Email address pattern — identical semantics in Java regex and RE2. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Phone-ish pattern: leading +?digit, ≥7 digits/space/dash, digit. */
  val PhoneRe = "\\+?\\d[\\d \\-]{7,}\\d"

  /**
   * PII masking: emails then phones (emails first — the phone pattern
   * would otherwise eat digit runs inside addresses). `regexp_replace` is
   * codegen'd and global in both engines.
   */
  def maskPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /**
   * Deterministic stratified sampling: keep a row iff
   * hash(stratum|id) mod 100 < rate(stratum). The hash is the same
   * md5-prefix→bigint construction as MinHash ([[Dedup.baseHash]] idea) so
   * the sample is reproducible across engines, partitionings, and re-runs —
   * no `rand()`, which would break resume idempotence and oracle checks.
   *
   * NULL stratum → row DROPPED, matching SQL `stratum || '|' || id` key
   * construction (NULL key → NULL comparison → filtered). The hash input
   * uses `concat` (null-propagating), NOT `concat_ws` (which silently
   * skips null args and would hash a null stratum as just the id —
   * engine/oracle divergence). Map nulls to a sentinel stratum upstream if
   * they should be sampled.
   */
  def stratifiedSampleFilter(stratum: Column, id: Column,
                             ratePct: Column): Column = {
    val h = pmod(conv(substring(
      md5(concat(stratum, lit("|"), id.cast("string"))),
      1, 15), 16, 10).cast("long"), lit(100L))
    h < ratePct
  }

  /**
   * Token-window chunking for model-input preparation: fixed-size windows
   * of whitespace tokens with overlap, array-local (no shuffle, no window
   * function). Window starts step by chunkSize−overlap; the final window
   * shortens to the doc tail. Emits (id, chunk_idx, start_tok, chunk,
   * n_tokens); token-less docs are dropped.
   */
  def tokenChunks(docs: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap < chunkSize, "overlap must be < chunkSize")
    val step = chunkSize - overlap
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
    def chunksOf(ts: Column): Column =
      transform(sequence(lit(1), greatest(size(ts) - overlap, lit(1)), lit(step)),
        s => struct(
          s.cast("long").as("start_tok"),
          concat_ws(" ", slice(ts, s, lit(chunkSize))).as("chunk"),
          least(size(ts) - s + 1, lit(chunkSize)).cast("long").as("n_tokens")))
    val cs = element_at(transform(array(toks), ts => chunksOf(ts)), 1)
    docs.filter(size(toks) > 0)
      .select(col(idCol), posexplode(cs))
      .select(col(idCol), (col("pos") + 1).cast("long").as("chunk_idx"),
        col("col.start_tok"), col("col.chunk"), col("col.n_tokens"))
  }

  /**
   * Benchmark-contamination detection: documents sharing any word n-gram
   * with a (small, broadcastable) benchmark set. The benchmark side is
   * bounded by construction — the join is a broadcast, never a shuffle of
   * the corpus; per-doc output aggregates with map-side combine.
   */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
                    benchDocs: DataFrame, n: Int = 8): DataFrame = {
    val sh = Dedup.shingles(docs, idCol, textCol, n)
    val bench = Dedup.shingles(benchDocs, idCol, textCol, n)
      .select(col("shingle"), col(idCol).as("bench_id"))
    sh.join(broadcast(bench), Seq("shingle"))
      .filter(col(idCol) =!= col("bench_id"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("shingle")).as("shared_grams"),
        countDistinct(col("bench_id")).as("bench_docs"))
  }
}
