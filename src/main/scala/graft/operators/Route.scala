package graft.operators

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Router / sink fan-out stage (SURVEY.md §2 B1-B4, F7, J1-J2;
 * north_rule "rule-driven router fans rows out to per-severity sinks").
 *
 * The reference indexes one document per HTTP call into a single ES index
 * (`service/ElasticsearchService.java:170-193`) and nacks failures to a DLQ
 * (`consumer/LogConsumer.java:52-62`). The Spark recast:
 *
 *  - ONE dynamic-partition parquet write `partitionBy("severity")` — a
 *    single pass fans all rows out to per-severity sinks with no
 *    per-severity re-scan and no shuffle (each write task appends to the
 *    partition dirs it sees). At cluster scale, an optional
 *    `repartition($"severity", $"id")` can cap files-per-partition; we keep
 *    the shuffle-free default.
 *  - rejected rows (parse failures) go to a `rejected/` sink, never dropped
 *    (B4/J2 dead-letter semantics);
 *  - anomaly results go to the `anomalies/` side-table (B3, PostgreSQL
 *    analog), `features` as JSON (G14);
 *  - per-sink aggregates (F7) are computed by reading BACK the routed sink
 *    (columnar scan of 3 small columns — cheap, partition-pruned) so the
 *    expensive parse/enrich plan runs exactly once;
 *  - row-count conservation (Σ sinks + rejected = input) is observed in the
 *    same pass via the `Observation` API (J7) — no extra scan.
 */
object Route {

  /** Columns persisted to the routed log sink (LogRecord + scoring);
    * `host` becomes the LogRecord `service` slot (SURVEY.md §1.4). */
  val sinkColumns: Seq[String] = Seq(
    "id", "url", "ts", "host as service", "message", "text", "lang", "environment",
    "message_length", "has_exception", "has_timeout", "has_connection",
    "reputation", "category", "lang_family", "script",
    "processed_at", "processor",
    "anomaly_score", "is_anomaly", "confidence", "alert", "severity")

  final case class RouteStats(inputRows: Long, routedRows: Long, rejectedRows: Long)

  /**
   * Writes `scored` (output of Parse→Enrich→Score, incl. `parse_ok`) to
   * `root/logs` (partitioned by severity), `root/rejected`, and
   * `root/anomalies`; returns conservation stats from the same pass.
   */
  def apply(scored: DataFrame, root: String): RouteStats = {
    val obs = new Observation("route")
    val tagged = scored.observe(obs,
      count(lit(1)).as("input_rows"),
      count(when(col("parse_ok"), 1)).as("routed_rows"),
      count(when(!col("parse_ok"), 1)).as("rejected_rows"))

    tagged.filter(col("parse_ok"))
      .selectExpr(sinkColumns: _*)
      .write.mode("overwrite")
      .partitionBy("severity")
      .parquet(s"$root/logs")

    val row = obs.get
    val stats = RouteStats(
      row("input_rows").asInstanceOf[Long],
      row("routed_rows").asInstanceOf[Long],
      row("rejected_rows").asInstanceOf[Long])

    scored.filter(!col("parse_ok"))
      .select(col("url"), col("reject_reason").as("reason"))
      .write.mode("overwrite").parquet(s"$root/rejected")

    // B3 — anomaly side-table (reference persists every prediction,
    // anomalous or not: LogProcessorServiceTest.java:506-533)
    scored.filter(col("parse_ok"))
      .select(
        col("id").as("log_id"),
        col("anomaly_score"),
        col("is_anomaly"),
        col("confidence"),
        col("model_version"),
        col("features_json").as("features"),
        col("processed_at").as("detected_at"))
      .write.mode("overwrite").parquet(s"$root/anomalies")

    stats
  }

  /**
   * F7 — per-sink aggregates over the routed sink (read-back; severity is a
   * partition column so per-severity queries are partition-pruned).
   */
  def sinkAggregates(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/logs")
      .groupBy("severity")
      .agg(
        count(lit(1)).as("doc_count"),
        countDistinct(col("service")).as("distinct_hosts"),
        round(avg(col("anomaly_score")), 4).as("avg_score"),
        count(when(col("is_anomaly"), 1)).as("anomaly_count"),
        count(when(col("alert"), 1)).as("alert_count"))
      .orderBy("severity")

  /**
   * J7 — per-written-file lineage (each file = one write task/partition):
   * the per-partition lineage rows the checkpoint table records.
   */
  def lineage(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/logs")
      .groupBy(col("severity"), input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"))
      .orderBy("severity", "file")
}
