package graft

import java.sql.Timestamp

/**
 * Pure-Scala (no Spark) reimplementation of the reference's row-at-a-time
 * semantics — a direct transcription of `normalizeLog`/`enrichLog`
 * (`service/LogProcessorService.java:187-239`) and `extractFeatures`
 * (`service/MLServiceClient.java:41-56`), plus the graft parse mapping and
 * the deterministic scorer.
 *
 * Used ONLY as the equality oracle in tests (SURVEY.md §5.2#2): the
 * vectorized Dataset pipeline applied to N rows must equal this function
 * mapped over the same N rows — the "routed-row equality per sink" gate.
 * Intentionally written in the most literal imperative style so that a
 * divergence is attributable to the Spark expressions, not the oracle.
 */
object RefOracle {

  final case class OracleRecord(
      id: String,
      url: String,
      ts: Timestamp,
      severity: String,
      host: String,
      message: String,          // post-truncation
      text: String,             // untouched input text (byte-identity invariant)
      environment: String,
      messageLength: Option[Int],
      hasException: Option[Boolean],
      hasTimeout: Option[Boolean],
      hasConnection: Option[Boolean],
      // ML features (MLServiceClient.java:41-56)
      featHasTimeout: Boolean,
      featHasConnectionError: Boolean,
      anomalyScore: Double,
      isAnomaly: Boolean,
      confidence: Double,
      alert: Boolean)

  final case class OracleReject(url: String, reason: String)

  def sha256Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def hostOf(url: String): Option[String] = {
    // parse_url(url, 'HOST') semantics: authority minus userinfo/port
    try {
      val u = new java.net.URI(url)
      Option(u.getHost)
    } catch { case _: Exception => None }
  }

  private val urlOk = "^https?://[^/]+.*".r

  /**
   * Applies the full reference chain to one page row. Returns either a
   * rejected row (Left) or the processed record (Right).
   */
  def process(url: String, warcTs: Timestamp, text: String, lang: String,
              jobStartTs: Timestamp): Either[OracleReject, OracleRecord] = {
    // validation gate (B4)
    if (url == null || !urlOk.matches(url))
      return Left(OracleReject(url, "invalid_url"))
    if (text == null)
      return Left(OracleReject(url, "null_text"))

    // --- normalizeLog (LogProcessorService.java:187-209) ---
    // G1: null timestamp -> now() (here: job parameter)
    val ts = if (warcTs == null) jobStartTs else warcTs
    // G3: truncate
    val message =
      if (text.length > 10000) text.substring(0, 10000) + "... [truncated]"
      else text
    // G4: env default — graft maps lang to the environment slot
    val environment = if (lang == null || lang.isEmpty) "unknown" else lang

    // --- enrichLog (LogProcessorService.java:214-239), on the truncated msg
    val ml = message.toLowerCase
    val msgLen = Some(message.length)
    val hasExc = Some(ml.contains("exception") || ml.contains("error"))
    val hasTmo = Some(ml.contains("timeout"))
    val hasConn = Some(ml.contains("connection") || ml.contains("connect"))

    // severity router (G18)
    val severity =
      if (hasExc.contains(true)) "ERROR"
      else if (hasTmo.contains(true) || hasConn.contains(true)) "WARN"
      else "INFO"

    // --- extractFeatures (MLServiceClient.java:41-56) ---
    val featLevel = severity.toUpperCase // already upper; null -> "INFO" n/a here
    val featHasException = ml.contains("exception") || ml.contains("error")
    val featHasTimeout = ml.contains("timeout") || ml.contains("timed out")
    val featHasConnErr = ml.contains("connection") &&
      (ml.contains("refused") || ml.contains("failed") || ml.contains("reset"))

    // --- deterministic scorer (Score.scala) ---
    def b(x: Boolean) = if (x) 1.0 else 0.0
    val raw = 0.30 * b(featHasException) + 0.25 * b(featHasConnErr) +
      0.20 * b(featHasTimeout) + 0.10 * b(featLevel == "ERROR") +
      0.05 * b(featLevel == "WARN") +
      0.10 * math.min(message.length / 10000.0, 1.0)
    val score = roundHalfUp(math.min(raw, 1.0), 4)
    val isAnom = score >= 0.5
    val conf = roundHalfUp(math.min(math.abs(score - 0.5) * 2.0, 1.0), 4)
    val alert = isAnom && conf > 0.7 // exclusive boundary (H3)

    Right(OracleRecord(
      id = sha256Hex(url), url = url, ts = ts, severity = severity,
      host = hostOf(url).orNull, message = message, text = text,
      environment = environment, messageLength = msgLen,
      hasException = hasExc, hasTimeout = hasTmo, hasConnection = hasConn,
      featHasTimeout = featHasTimeout, featHasConnectionError = featHasConnErr,
      anomalyScore = score, isAnomaly = isAnom, confidence = conf,
      alert = alert))
  }

  /** Spark's round() is HALF_UP on the unscaled decimal — replicate exactly. */
  def roundHalfUp(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
}
