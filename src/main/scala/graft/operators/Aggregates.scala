package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-aware aggregation (SURVEY.md §4 "Skew handling" — explicit work per
 * the north rule: "skewed domains are handled by salted repartitioning
 * with AQE skew-join hints").
 *
 * The synthetic pages table plants Zipf-skewed domains (the head domain
 * carries ~21% of all rows — Synth.pages), so a plain
 * `groupBy(domain).agg(...)` sends a fifth of the table through one
 * reducer. The salted two-phase shape bounds any single reducer's input:
 *
 *   phase 1: groupBy(domain, salt)   — salt = pmod(xxhash64(id), S):
 *            S-way split of every hot key, map-side partial agg applies
 *   phase 2: groupBy(domain)         — combines S tiny partials per key
 *
 * For algebraic aggregates (count/sum/min/max) the result is EXACTLY the
 * plain aggregation's (asserted in AggregatesSpec). countDistinct is not
 * salt-decomposable this way — use the two-phase distinct-first variant.
 *
 * Joins: both enrich dims broadcast (skew-immune by construction); for a
 * hypothetical shuffle join on domain, AQE's skew-join split
 * (`spark.sql.adaptive.skewJoin.enabled=true`, set in every session
 * builder here) re-splits oversized partitions at runtime.
 */
object Aggregates {

  /** Per-domain doc counts, naive single-phase (the skew victim). */
  def domainCounts(logs: DataFrame, keyCol: String = "service"): DataFrame =
    logs.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))

  /**
   * Per-domain counts via salted two-phase aggregation. `saltCol` must be
   * a high-cardinality deterministic column (e.g. the row id).
   */
  def domainCountsSalted(logs: DataFrame, keyCol: String = "service",
                         saltFrom: String = "id", buckets: Int = 16): DataFrame =
    logs
      .withColumn("_salt", pmod(xxhash64(col(saltFrom)), lit(buckets)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("partial")).as("cnt"))

  /**
   * Salted sum/min/max bundle (all algebraic — two-phase safe).
   */
  def domainStatsSalted(logs: DataFrame, keyCol: String, valueCol: String,
                        saltFrom: String = "id", buckets: Int = 16): DataFrame =
    logs
      .withColumn("_salt", pmod(xxhash64(col(saltFrom)), lit(buckets)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(
        count(lit(1)).as("p_cnt"),
        sum(col(valueCol)).as("p_sum"),
        min(col(valueCol)).as("p_min"),
        max(col(valueCol)).as("p_max"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("p_cnt")).as("cnt"),
        round(sum(col("p_sum")), 4).as("total"),
        min(col("p_min")).as("min_v"),
        max(col("p_max")).as("max_v"))

  /**
   * Distinct counts under skew: exact via two-phase distinct-first
   * (distinct is itself a salted-safe hash agg), or approximate via HLL
   * when the distinct set per key is huge.
   */
  def distinctHostsPerSeverity(logs: DataFrame): DataFrame =
    logs.select(col("severity"), col("service")).distinct()
      .groupBy(col("severity"))
      .agg(count(lit(1)).as("distinct_hosts"))

  def approxDistinctHostsPerSeverity(logs: DataFrame, rsd: Double = 0.05): DataFrame =
    logs.groupBy(col("severity"))
      .agg(approx_count_distinct(col("service"), rsd).as("approx_distinct_hosts"))
}
