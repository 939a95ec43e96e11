package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/**
 * Enrich stage — broadcast hash-join of the two dimension lookups plus the
 * processing-metadata stamps (SURVEY.md §2 G5-G7, I7; north_rule "broadcast
 * hash-join enrich stage").
 *
 * Reference analog: `enrichLog` metadata puts
 * (`service/LogProcessorService.java:214-239`) + config-derived lookup
 * (`service/MLServiceClient.java:25-32`). The reference has no joins (fully
 * denormalized documents) — the graft adds them; both dims are ≪ 10 MB so
 * they MUST plan as `BroadcastHashJoinExec` (skew-immune, shuffle-free;
 * asserted in EnrichSpec).
 */
object Enrich {

  val ProcessorName = "log-processor-service" // LogProcessorService.java:42

  /**
   * Left-joins `domain_reputation(domain, reputation, category)` on host and
   * `lang_meta(lang, lang_family, script)` on lang, then stamps
   * processedAt/processor (G5/G6). Misses keep null dim columns (tested via
   * the deliberate "ja" gap in Synth.langMeta).
   */
  def apply(parsed: DataFrame, domainRep: DataFrame, langMeta: DataFrame,
            jobStartTs: java.sql.Timestamp): DataFrame = {
    parsed
      .join(F.broadcast(domainRep), parsed("host") === domainRep("domain"), "left")
      .drop("domain")
      .join(F.broadcast(langMeta), Seq("lang"), "left")
      .withColumn("processed_at", lit(jobStartTs.toInstant.toString))
      .withColumn("processor", lit(ProcessorName))
  }
}
