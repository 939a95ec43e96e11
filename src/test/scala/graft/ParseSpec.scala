package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Parse, Score}

/**
 * Ports the reference's behavioral assertions (SURVEY.md §5.1,
 * `LogProcessorServiceTest.java` / `MLServiceClientTest.java`) to the
 * column expressions.
 */
class ParseSpec extends SparkSuite {
  import spark.implicits._

  private val t0 = Timestamp.from(java.time.Instant.parse("2024-06-01T00:00:00Z"))

  private def one(text: String): (Option[Int], String) = {
    val df = Seq(text).toDF("m")
      .select(length(Parse.truncateMessage($"m")).as("len"),
        Parse.truncateMessage($"m").as("out"))
    val r = df.collect()(0)
    (Option(r.get(0)).map(_.asInstanceOf[Int]), r.getString(1))
  }

  test("G3: 15000-char message truncates to exactly 10015 chars ending '... [truncated]'") {
    // LogProcessorServiceTest.java:119-145
    val (len, out) = one("x" * 15000)
    assert(len.contains(10015))
    assert(out.endsWith("... [truncated]"))
    assert(out.startsWith("x" * 100))
  }

  test("G3: 10000-char message is NOT truncated (boundary inclusive)") {
    val (len, out) = one("y" * 10000)
    assert(len.contains(10000) && !out.endsWith("[truncated]"))
  }

  test("G3: truncation is idempotent on already-truncated output") {
    val first = one("z" * 12000)._2
    assert(one(first)._2 == first) // 10015 > 10000 would re-truncate if buggy; it must not change
  }

  test("G2: level uppercased, null stays null") {
    // LogProcessorServiceTest.java:103-117, :387-405
    val r = Seq(Some("error"), Some("WaRn"), None).toDF("level")
      .select(Parse.normalizeLevel($"level")).as[Option[String]].collect()
    assert(r.toSeq == Seq(Some("ERROR"), Some("WARN"), None))
  }

  test("G4: null/empty environment -> unknown; non-empty passes through") {
    // LogProcessorServiceTest.java:147-164
    val r = Seq(Some(""), None, Some("prod")).toDF("env")
      .select(Parse.normalizeEnvironment($"env")).as[String].collect()
    assert(r.toSeq == Seq("unknown", "unknown", "prod"))
  }

  test("G1: null timestamp defaults to job start") {
    val r = Seq((1, Option.empty[Timestamp]), (2, Some(Timestamp.valueOf("2020-01-01 00:00:00"))))
      .toDF("i", "ts")
      .select(Parse.normalizeTimestamp($"ts", t0)).as[Timestamp].collect()
    assert(r(0) == t0 && r(1) == Timestamp.valueOf("2020-01-01 00:00:00"))
  }

  test("G8-G10 enrich flags match reference keyword semantics") {
    // LogProcessorServiceTest.java:167-190, :536-553 ("connect" variant)
    val cases = Seq(
      ("NullPointerException thrown", true, false, false),
      ("an ERROR occurred", true, false, false),
      ("request timeout", false, true, false),
      ("connection pool empty", false, false, true),
      ("cannot connect to db", false, false, true),
      ("operation timed out", false, false, false), // "timed out" is NOT G9
      ("all good", false, false, false))
    val df = cases.map(_._1).toDF("m").select($"m",
      Parse.hasException($"m").as("e"),
      Parse.hasTimeout($"m").as("t"),
      Parse.hasConnection($"m").as("c"))
    val got = df.collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
    assert(got.toSeq == cases)
  }

  test("G11/G9 divergence: ML hasTimeout includes 'timed out'") {
    // MLServiceClient.java:50 vs LogProcessorService.java:29
    val df = Seq("operation timed out", "a timeout", "fine").toDF("m")
      .select(Parse.hasTimeout($"m").as("g9"), Score.featHasTimeout($"m").as("g11"))
    val got = df.collect().map(r => (r.getBoolean(0), r.getBoolean(1))).toSeq
    assert(got == Seq((false, true), (true, true), (false, false)))
  }

  test("G12: hasConnectionError is conjunctive") {
    // MLServiceClientTest.java:36-105
    val cases = Seq(
      ("connection refused", true), ("connection failed", true),
      ("connection reset by peer", true), ("connection established", false),
      ("refused to comply", false), ("db connect failed", false)) // needs "connection"
    val got = cases.map(_._1).toDF("m")
      .select(Score.featHasConnectionError($"m")).as[Boolean].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("severity router is total and disjoint, null message -> INFO") {
    val df = Seq(Some("fatal error"), Some("timeout"), Some("connect"), Some("ok"), None)
      .toDF("m").select(Parse.severity($"m").as("s"))
    assert(df.as[String].collect().toSeq == Seq("ERROR", "WARN", "WARN", "INFO", "INFO"))
  }

  test("parse_ok gate: bad urls and null text rejected") {
    val df = Seq(("https://a.com/x", Some("t")), ("not-a-url", Some("t")),
      ("https://a.com/y", None), ("ftp://a.com/z", Some("t")))
      .toDF("url", "text")
      .select(Parse.parseOk($"url", $"text"))
    assert(df.as[Boolean].collect().toSeq == Seq(true, false, false, false))
  }

  test("canonicalHost equals lower(parse_url HOST) minus www., ports/query/fragment stripped") {
    val urls = Seq(
      "https://WWW.Sub.Example.COM/p/1?a=b#f",
      "http://plain.example.org:8080/x",
      "https://www.example.net",
      "https://host.example.io/p/7?utm=x",
      "ftp://Files.Example.com/pub")
    val got = urls.toDF("url").select(
      Parse.canonicalHost($"url").as("canon"),
      regexp_replace(lower(Parse.hostOf($"url")), "^www\\.", "").as("ref"))
      .as[(String, String)].collect()
    got.foreach { case (canon, ref) => assert(canon == ref, s"$canon != $ref") }
    assert(got.map(_._1).toSeq == Seq("sub.example.com", "plain.example.org",
      "example.net", "host.example.io", "files.example.com"))
  }

  test("null url: parse_ok is FALSE (not NULL) and reject_reason is invalid_url") {
    // rlike(null) is NULL in ternary logic; without the explicit guards a
    // null url would route to REJECTED with a NULL reason (RefOracle says
    // "invalid_url" — RefOracle.scala:65-66)
    val pages = Seq(
      (null.asInstanceOf[String], Some(t0), "h", "some text", "en"),
      ("https://ok.example.com/x", Some(t0), "h", "some text", "en"))
      .toDF("url", "warc_ts", "html", "text", "lang")
    val out = Parse(pages, t0)
      .select($"url", $"parse_ok", $"reject_reason")
      .collect().sortBy(r => Option(r.getString(0)).getOrElse(""))
    assert(!out(0).isNullAt(1) && !out(0).getBoolean(1), "parse_ok false, not null")
    assert(out(0).getString(2) == "invalid_url")
    assert(out(1).getBoolean(1) && out(1).isNullAt(2))
    assert(RefOracle.process(null, t0, "some text", "en", t0)
      .left.toOption.map(_.reason).contains("invalid_url"))
  }

  test("G3 character semantics: counts are Unicode code points (pinned divergence)") {
    // The reference's Java String.substring/length count UTF-16 code units
    // (LogProcessorService.java:199-201); Spark's length()/substring() count
    // code points. For BMP text (all of Synth + the fixtures) the two agree
    // exactly; for supplementary characters (emoji etc.) this build PINS
    // code-point semantics — asserted here so the divergence is a
    // documented choice, not an accident.
    val emoji = "😀" // U+1F600: 1 code point, 2 UTF-16 units
    val under = one(emoji * 10000) // Java would see 20000 units and truncate
    assert(under._1.contains(10000) && !under._2.endsWith("[truncated]"))
    val over = one(emoji * 10001)
    assert(over._1.contains(10015) && over._2.endsWith("... [truncated]"))
  }
}
