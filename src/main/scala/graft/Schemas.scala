package graft

import java.sql.Timestamp
import org.apache.spark.sql.types._

/**
 * Data model for the Spark-native rebuild of the reference log pipeline.
 *
 * The reference (keresifon/ai-monitoring-log-processor) moves one mutable
 * JSON document at a time: `dto/LogEntryDTO.java:19-39` (core fields) plus a
 * heterogeneous `Map<String,Object> metadata` (`dto/LogEntryDTO.java:34`).
 * Catalyst cannot represent `Map[String, Any]`, so the known enrichment keys
 * (constants at `service/LogProcessorService.java:32-41`) become a typed
 * struct ([[Enrichment]]) and anomaly results become [[AnomalyResult]] —
 * see SURVEY.md §1.3.
 *
 * The graft input table is the `input_hint` shape: Common-Crawl-style web
 * pages `(url, warc_ts, html, text, lang)`.
 */
object Schemas {

  /** Graft input row — Common-Crawl-style page (BASELINE.json input_hint). */
  final case class PageRow(
      url: String,
      warc_ts: Timestamp,
      html: Array[Byte],
      text: String,
      lang: String
  )

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = true),
    StructField("html", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)
  ))

  /**
   * Typed enrichment metadata — the 6 keys `enrichLog` puts into the
   * metadata map (`service/LogProcessorService.java:214-239`).
   */
  final case class Enrichment(
      processedAt: String,        // ISO instant string, job parameter (G5)
      processor: String,          // constant "log-processor-service" (G6)
      messageLength: Option[Int], // G7 — absent (null) when message null
      hasException: Option[Boolean], // G8
      hasTimeout: Option[Boolean],   // G9
      hasConnection: Option[Boolean] // G10
  )

  /**
   * ML feature vector — `MLServiceClient.extractFeatures`
   * (`service/MLServiceClient.java:41-56`). Note hasTimeout here differs
   * from Enrichment.hasTimeout (adds "timed out" — G11) and
   * hasConnectionError is conjunctive (G12).
   */
  final case class MlFeatures(
      messageLength: Int,
      level: String,             // default "INFO" (G13)
      service: String,           // default "unknown" (G13)
      hasException: Boolean,
      hasTimeout: Boolean,
      hasConnectionError: Boolean
  )

  /**
   * Deterministic anomaly prediction — replaces the external ML RPC
   * (`service/MLServiceClient.java:65-103`) with a pure rule-based scorer
   * so results are reproducible and oracle-checkable (SURVEY.md §2.H).
   */
  final case class AnomalyResult(
      anomalyScore: Double,
      isAnomaly: Boolean,
      confidence: Double,
      modelVersion: String
  )

  /**
   * Normalized + enriched log record — the unit that flows to the routed
   * sinks. Mirrors `dto/LogEntryDTO.java:19-39` with the graft parse
   * mapping (SURVEY.md §2 G18): host from url, ts from warc_ts, severity
   * from text keywords.
   */
  final case class LogRecord(
      id: String,                 // sha2(url) — deterministic doc id
      url: String,
      timestamp: Timestamp,       // G1: coalesce(warc_ts, jobStartTs)
      severity: String,           // router key: ERROR / WARN / INFO
      service: String,            // host parsed from url
      message: String,            // truncated text (G3)
      text: String,               // byte-identical pass-through (north rule)
      lang: String,
      environment: String         // G4: default "unknown"
  )

  /** Rows that fail parse/validation — dead-letter analog (B4/J2). */
  final case class RejectedRow(url: String, reason: String)

  /** Dimension: per-domain reputation lookup (broadcast-joined, A4/I7). */
  final case class DomainReputation(domain: String, reputation: Double, category: String)

  /** Dimension: language metadata lookup (broadcast-joined, A4/I7). */
  final case class LangMeta(lang: String, lang_family: String, script: String)

  /**
   * Anomaly side-table row — `model/AnomalyDetection.java:14-56`
   * (PostgreSQL `anomaly_detections`), `features` serialized JSON
   * (`service/LogProcessorService.java:149-160`).
   */
  final case class AnomalyRow(
      log_id: String,
      anomaly_score: Double,
      is_anomaly: Boolean,
      confidence: Double,
      model_version: String,
      features: String,           // JSON (G14)
      detected_at: Timestamp
  )

  /**
   * Per-stage checkpoint/lineage row (J1/J7): written LAST per stage; a
   * present committed row == stage done, enabling idempotent resume
   * (SURVEY.md §7).
   */
  final case class StageCommit(
      stageId: String,
      inputRows: Long,
      outputRows: Long,
      rejectedRows: Long,
      numPartitions: Int,
      commitTs: String,           // job parameter, not wall clock
      status: String              // "committed"
  )

  /** Per-partition lineage metrics (J7). */
  final case class PartitionLineage(
      stageId: String,
      partitionId: Int,
      rows: Long
  )
}
