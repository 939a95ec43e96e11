package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic synthetic data generator for the graft input table
 * (`pages(url, warc_ts, html, text, lang)` — BASELINE.json input_hint) and
 * the two broadcast dimension tables (SURVEY.md §2 A4, FIXTURES.md §1-2).
 *
 * Generation is **expression-based** (seeded `xxhash64` over `spark.range`),
 * so it is distributed, shuffle-free, and bit-reproducible at any scale —
 * no driver-side row building, no wall clock, no `rand()`. The same
 * (n, seed) always yields the same table, which is what makes the
 * RefOracle equality tests and the resume property test well-defined.
 *
 * Planted properties (exercised by the test suite):
 *  - Zipf-skewed domains (power-law via u^3) → the salted/AQE skew path
 *    has real skew to handle (SURVEY.md §7 risk list);
 *  - trigger phrases at controlled rates → severity mix + the G9-vs-G11
 *    "timed out" divergence (`LogProcessorService.java:29` vs
 *    `MLServiceClient.java:50`);
 *  - >10000-char outliers → truncation (`LogProcessorService.java:199-201`);
 *  - empty / null text, null warc_ts, null lang, invalid urls → every
 *    null-guard and the dead-letter path (B4).
 */
object Synth {

  val DefaultSeed = 42L

  /** 48 neutral filler words — no trigger keywords among them. */
  private val neutralVocab: Seq[String] = Seq(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "amber", "birch",
    "cedar", "dune", "ember", "fjord", "grove", "harbor", "isle",
    "jade", "knoll", "lagoon", "meadow", "nectar", "orchid", "prairie",
    "quartz", "ridge", "summit", "thicket", "umber", "vale")

  /**
   * Trigger phrases appended after the neutral body, by a deterministic
   * die roll. Rates chosen so ERROR ≈ 19%, WARN ≈ 24%, INFO ≈ 57%.
   *
   * Planted edge cases:
   *  - "operation timed out..." (die 380-419) → the G9/G11 divergence:
   *    enrich `hasTimeout` ("timeout" substring) FALSE, ML feature
   *    ("timed out") TRUE;
   *  - "fatal error: connection reset ... timeout" (die 420-449) → all
   *    heavy features at once → score 0.85+, confidence just above the
   *    exclusive 0.7 alert boundary (H3);
   *  - "connection failed and ... timed out" (die 450-479) → score lands
   *    right at the 0.5 isAnomaly boundary + ε, confidence ≈ 0.
   */
  private val triggers: Seq[(Int, String)] = Seq(
    80   -> " unhandled exception in request worker",
    160  -> " upstream returned error code 500",
    240  -> " gateway timeout after 30s",
    320  -> " connection refused by peer",
    380  -> " client connect retry scheduled",
    420  -> " operation timed out waiting for lock",
    450  -> " fatal error: connection reset by peer after timeout",
    480  -> " connection failed and operation timed out",
    1000 -> ""
  )

  /**
   * Pages table: `n` rows, `parts` input partitions.
   *
   * Skew: domain index = floor(D * u^3) over D = `domains` domains — the
   * head domain receives ~⌠P(u < (1/D)^(1/3)) ≈ 21% of rows at D=100.
   */
  def pages(spark: SparkSession, n: Long, seed: Long = DefaultSeed,
            parts: Int = 32, domains: Int = 100): DataFrame = {
    val df = spark.range(0L, n, 1L, parts)
    val vocab = array(neutralVocab.map(lit): _*)
    val vocabN = neutralVocab.size

    // uniform in [0,1) from a seeded per-row hash
    def u(salt: Int) =
      pmod(xxhash64(col("id"), lit(seed), lit(salt)), lit(1000000L)) / 1000000.0

    val domainIdx = floor(lit(domains) * pow(u(1), 3.0)).cast("int")
    val domain = concat(lit("d"), domainIdx, lit(".example.com"))

    // ~0.4% invalid urls -> rejected/dead-letter path (B4)
    val url = when(col("id") % 251 === 0,
        concat(lit("not-a-url-"), col("id")))
      .otherwise(concat(lit("https://"), domain, lit("/p/"), col("id")))

    // 24h window starting 2024-01-01; ~0.6% null (G1 default path)
    val epoch20240101 = 1704067200L // 2024-01-01T00:00:00Z
    val ts = when(col("id") % 173 === 0, lit(null).cast("timestamp"))
      .otherwise(timestamp_seconds(
        lit(epoch20240101) + pmod(xxhash64(col("id"), lit(seed), lit(2)), lit(86400L))))

    val bodyLen = (lit(5) + pmod(xxhash64(col("id"), lit(seed), lit(3)), lit(80))).cast("int")
    val body = concat_ws(" ",
      transform(sequence(lit(0), bodyLen - 1),
        i => element_at(vocab, (pmod(xxhash64(col("id"), i, lit(seed)), lit(vocabN)) + 1).cast("int"))))

    val die = pmod(xxhash64(col("id"), lit(seed), lit(4)), lit(1000))
    val suffix = triggers.init.foldRight(lit(""): org.apache.spark.sql.Column) {
      case ((bound, phrase), rest) => when(die < bound, lit(phrase)).otherwise(rest)
    }

    // ~0.1% >10000-char outliers (truncation G3); ~0.5% empty; ~0.2% null
    val rawText = concat(body, suffix)
    val text = when(col("id") % 431 === 0, lit(null).cast("string"))
      .when(col("id") % 211 === 0, lit(""))
      .when(col("id") % 997 === 0,
        concat(rawText, repeat(lit(" oversized exception payload segment"), 400)))
      .otherwise(rawText)

    val langs = array(Seq("en", "de", "fr", "es", "zh", "ru", "ja").map(lit): _*)
    val langIdx = pmod(xxhash64(col("id"), lit(seed), lit(5)), lit(8))
    val lang = when(langIdx === 7, lit(null).cast("string"))
      .otherwise(element_at(langs, (langIdx + 1).cast("int")))

    df.select(
      url.as("url"),
      ts.as("warc_ts"),
      when(text.isNotNull,
        concat(lit("<html><body>"), text, lit("</body></html>")).cast("binary"))
        .as("html"),
      text.as("text"),
      lang.as("lang"))
  }

  /** Per-domain reputation dimension — one row per generated domain (A4). */
  def domainReputation(spark: SparkSession, domains: Int = 100,
                       seed: Long = DefaultSeed): DataFrame = {
    val cats = array(Seq("news", "commerce", "social", "docs", "spam").map(lit): _*)
    spark.range(0, domains, 1, 1).select(
      concat(lit("d"), col("id"), lit(".example.com")).as("domain"),
      round(pmod(xxhash64(col("id"), lit(seed), lit(11)), lit(1000)) / 1000.0, 3)
        .as("reputation"),
      element_at(cats, (pmod(xxhash64(col("id"), lit(seed), lit(12)), lit(5)) + 1).cast("int"))
        .as("category"))
  }

  /** Language metadata dimension; "ja" deliberately missing (left-join null path). */
  def langMeta(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      Schemas.LangMeta("en", "germanic", "latin"),
      Schemas.LangMeta("de", "germanic", "latin"),
      Schemas.LangMeta("fr", "romance", "latin"),
      Schemas.LangMeta("es", "romance", "latin"),
      Schemas.LangMeta("zh", "sinitic", "han"),
      Schemas.LangMeta("ru", "slavic", "cyrillic")
    ).toDF()
  }
}
