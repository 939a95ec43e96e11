package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Parse / normalize stage — the vectorized recast of the reference's
 * per-message `normalizeLog` + the graft field extraction (SURVEY.md §2
 * G1-G4, G18).
 *
 * Everything is a Catalyst `Column` expression (whole-stage-codegen'd; no
 * UDFs), exposed individually so the analytics queries and the DuckDB
 * oracles can reuse the exact same semantics.
 *
 * Reference semantics reproduced bit-for-bit:
 *  - `service/LogProcessorService.java:189-191`  null timestamp → now()
 *    (here: an explicit job parameter, for determinism/resume)
 *  - `service/LogProcessorService.java:194-196`  level → upper
 *  - `service/LogProcessorService.java:199-201`  >10000 chars →
 *    substring(0,10000) + "... [truncated]" (result exactly 10015 chars)
 *  - `service/LogProcessorService.java:204-206`  null/empty env → "unknown"
 *  - `service/LogProcessorService.java:228-236`  keyword flags on the
 *    lower-cased (already truncated) message
 */
object Parse {

  val MaxMessageLength = 10000
  val TruncationSuffix = "... [truncated]"

  /** G1 — null timestamp defaults to the (fixed) job start parameter. */
  def normalizeTimestamp(ts: Column, jobStartTs: java.sql.Timestamp): Column =
    coalesce(ts, lit(jobStartTs))

  /** G2 — uppercase, null-safe (null stays null). */
  def normalizeLevel(level: Column): Column = upper(level)

  /** G3 — truncate >10000-char messages; exact 10015-char result.
    * Character semantics: Spark length/substring count Unicode CODE POINTS;
    * the reference's Java String ops count UTF-16 code units. Identical for
    * BMP text (all fixtures); for supplementary chars this build pins
    * code-point counting (asserted in ParseSpec "G3 character semantics"). */
  def truncateMessage(message: Column): Column =
    when(length(message) > MaxMessageLength,
      concat(substring(message, 1, MaxMessageLength), lit(TruncationSuffix)))
      .otherwise(message)

  /** G4 — null or empty environment → "unknown". */
  def normalizeEnvironment(env: Column): Column =
    when(env.isNull || env === "", lit("unknown")).otherwise(env)

  /** G8 — message contains "exception" or "error" (case-folded). */
  def hasException(message: Column): Column = {
    val m = lower(message)
    m.contains("exception") || m.contains("error")
  }

  /** G9 — contains "timeout" (NOT "timed out" — that is the ML-side G11). */
  def hasTimeout(message: Column): Column = lower(message).contains("timeout")

  /** G10 — contains "connection" or "connect" (first is redundant; kept for fidelity). */
  def hasConnection(message: Column): Column = {
    val m = lower(message)
    m.contains("connection") || m.contains("connect")
  }

  /**
   * G18 — severity router key derived from the enrichment flags:
   * ERROR if exception/error, WARN if timeout/connection, else INFO.
   * Null message (no flags) → INFO. Total and disjoint by construction.
   */
  def severity(message: Column): Column =
    when(coalesce(hasException(message), lit(false)), "ERROR")
      .when(coalesce(hasTimeout(message) || hasConnection(message), lit(false)), "WARN")
      .otherwise("INFO")

  /** G18 — host from url (empty-string-safe wrapper over parse_url). */
  def hostOf(url: Column): Column = parse_url(url, lit("HOST"))

  /**
   * G18' — canonical host: scheme-stripped authority without port,
   * lower-cased, leading `www.` removed — the dedup/blocking key form of
   * [[hostOf]]. Pure-regex so the DuckDB oracle reproduces it exactly
   * (parse_url has no DuckDB analog); ParseSpec pins equivalence to
   * `lower(parse_url(HOST))` minus `www.` on generated URLs.
   */
  def canonicalHost(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^[a-zA-Z]+://([^/:?#]+)", 1)),
      "^www\\.", "")

  /** Validation gate: rows failing it go to the rejected sink (B4/J2).
    * coalesce pins null url → false (not NULL), so REJECTED routing and
    * reject_reason agree on null urls (RefOracle: "invalid_url"). */
  def parseOk(url: Column, text: Column): Column =
    coalesce(url.rlike("^https?://[^/]+"), lit(false)) && text.isNotNull

  /**
   * Full parse stage over the pages table
   * `(url, warc_ts, html, text, lang)` → adds
   * `parse_ok, reject_reason, id, host, ts, message, severity,
   *  environment, has_exception, has_timeout, has_connection,
   *  message_length` — `text` passes through byte-identical (north rule).
   *
   * One narrow projection; no shuffle; whole-stage codegen end to end.
   */
  def apply(pages: DataFrame, jobStartTs: java.sql.Timestamp): DataFrame = {
    val msg = truncateMessage(col("text"))
    pages
      .withColumn("parse_ok", parseOk(col("url"), col("text")))
      .withColumn("reject_reason",
        when(col("url").isNull || !col("url").rlike("^https?://[^/]+"),
          "invalid_url") // isNull explicit: rlike(null) is NULL, not false
          .when(col("text").isNull, "null_text"))
      .withColumn("id", sha2(col("url"), 256))
      .withColumn("host", hostOf(col("url")))
      .withColumn("ts", normalizeTimestamp(col("warc_ts"), jobStartTs))
      .withColumn("message", msg)
      .withColumn("severity", severity(msg))
      .withColumn("environment", normalizeEnvironment(col("lang")))
      .withColumn("has_exception", hasException(msg))
      .withColumn("has_timeout", hasTimeout(msg))
      .withColumn("has_connection", hasConnection(msg))
      .withColumn("message_length", length(msg))
  }
}
