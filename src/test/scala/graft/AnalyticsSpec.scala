package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Analytics

/**
 * Pins the dashboard/search semantics from the reference test suite
 * (`ElasticsearchServiceTest.java`, SURVEY.md §5.1) plus the physical-plan
 * properties SURVEY.md §4 requires (pushdown, top-k, broadcast).
 */
class AnalyticsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val logs = Seq(
    ("a1", ts("2024-01-01 00:10:00"), "ERROR", "svc-a", "db connection refused"),
    ("a2", ts("2024-01-01 00:20:00"), "WARN", "svc-a", "slow request"),
    ("a3", ts("2024-01-01 03:40:00"), "INFO", "svc-b", "user logged in"),
    ("a4", ts("2024-01-01 03:50:00"), "ERROR", "svc-b", "timeout while parsing"),
    ("a5", ts("2024-01-01 03:55:00"), "INFO", "svc-c", "Parsing complete"))
    .toDF("id", "ts", "level", "service", "message")

  test("F1/F2: dashboard metrics in one pass, with zero-logs guard") {
    val m = Analytics.dashboardMetrics(logs).collect()(0)
    assert(m.getAs[Long]("total_logs") == 5)
    assert(m.getAs[Long]("error_count") == 2)
    assert(m.getAs[Long]("warning_count") == 1)
    assert(m.getAs[Double]("error_rate") == 40.0)
    // zero-logs division guard (ElasticsearchServiceTest.java:415-472)
    val z = Analytics.dashboardMetrics(logs.filter($"level" === "NOPE")).collect()(0)
    assert(z.getAs[Long]("total_logs") == 0 && z.getAs[Double]("error_rate") == 0.0)
  }

  test("F3: date histogram emits empty buckets (minDocCount 0)") {
    val v = Analytics.logVolume(logs).as[(Timestamp, Long)].collect()
    assert(v.length == 4) // 00h .. 03h inclusive
    assert(v.map(_._2).toSeq == Seq(2L, 0L, 0L, 3L)) // 01h,02h gap-filled
    // empty input -> empty output, no crash
    assert(Analytics.logVolume(logs.filter($"level" === "NOPE")).count() == 0)
  }

  test("F4: level distribution percentages") {
    val d = Analytics.levelDistribution(logs)
      .as[(String, Long, Double)].collect().toSeq
    assert(d == Seq(("ERROR", 2L, 40.0), ("INFO", 2L, 40.0), ("WARN", 1L, 20.0)))
  }

  test("F5: top-k services deterministic on count ties") {
    val t = Analytics.topServices(logs, 2).as[(String, Long)].collect().toSeq
    assert(t == Seq(("svc-a", 2L), ("svc-b", 2L))) // tie broken by name
  }

  test("E1: tokenized match is case-folded, whole-word, OR-of-terms") {
    val hits = logs.filter(Analytics.textMatch($"message", "PARSING user"))
      .select("id").as[String].collect().toSet
    assert(hits == Set("a3", "a4", "a5")) // "parsing" matches both cases; no substring hits
    val none = logs.filter(Analytics.textMatch($"message", "parse")) // not a token
      .count()
    assert(none == 0)
  }

  test("E1: BM25 ln-idf ranks identically to the rational-core idf " +
    "(ln is monotone) and scores are the exact Lucene formula") {
    val docs = Seq(
      (1L, "spark spark spark and flink"),   // tf(spark)=3
      (2L, "spark window window"),           // tf(spark)=1, tf(window)=2
      (3L, "window only here"),              // tf(window)=1
      (4L, "spark once"),                    // tf(spark)=1
      (5L, "nothing relevant at all"))
      .toDF("doc_id", "text")
    val rational = Analytics.textRankIdf(docs, "doc_id", "text", "spark window")
      .select($"doc_id").as[Long].collect().toSeq
    val bm25 = Analytics.textRankBm25(docs, "doc_id", "text", "spark window")
      .as[(Long, Double)].collect().toSeq
    // exact Lucene idf: ln(1 + (N - df + 0.5)/(df + 0.5)); N=5, df(spark)=3,
    // df(window)=2
    def idf(df: Int) = math.log(1.0 + (5.0 - df + 0.5) / (df + 0.5))
    def p4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val exp = Map(
      1L -> p4(3 * idf(3)), 2L -> p4(1 * idf(3) + 2 * idf(2)),
      3L -> p4(1 * idf(2)), 4L -> p4(1 * idf(3)))
    assert(bm25.toMap == exp)
    // same ranking as the rational core on this corpus (ties broken by id
    // in both) — the monotone-transform claim, asserted not assumed
    assert(bm25.map(_._1) == rational)
  }

  test("I1/I2: search pagination is deterministic and offset-correct") {
    val all = Analytics.searchLogs(logs, size = 5).select("id").as[String].collect().toSeq
    assert(all == Seq("a5", "a4", "a3", "a2", "a1")) // ts desc default
    val page1 = Analytics.searchLogs(logs, page = 1, size = 2)
      .select("id").as[String].collect().toSeq
    assert(page1 == Seq("a3", "a2"))
    // filters compose (levels + range + text)
    val filtered = Analytics.searchLogs(logs,
      queryText = Some("connection timeout parsing"),
      levels = Seq("ERROR"),
      start = Some(ts("2024-01-01 00:00:00")), end = Some(ts("2024-01-01 23:00:00")))
      .select("id").as[String].collect().toSeq
    assert(filtered == Seq("a4", "a1"))
    // D6: hosts param is accepted and IGNORED (reference dead filter)
    val withHosts = Analytics.searchLogs(logs, hosts = Seq("nope"), size = 5).count()
    assert(withHosts == 5)
  }

  test("plan: filters push to parquet scan; top-k plans TakeOrderedAndProject") {
    val dir = tmpDir("push")
    logs.write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .filter($"level" === "ERROR" && $"ts" >= ts("2024-01-01 00:00:00"))
      .select("id", "ts")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(level), IsNotNull(ts), EqualTo(level,ERROR)"),
      s"filters must reach the scan:\n$scan")
    assert(scan.contains("ReadSchema: struct<id:string,ts:timestamp"),
      "column pruning must reach the scan")
    val topk = Analytics.topServices(spark.read.parquet(dir), 3)
      .queryExecution.executedPlan.toString
    assert(topk.contains("TakeOrderedAndProject"), s"top-k pushdown missing:\n$topk")
  }

  test("B5/B6: export cap + CSV round-trip with RFC-4180 quoting") {
    val dir = tmpDir("csv")
    val tricky = Seq(("x1", "plain"), ("x2", "a,b"), ("x3", "say \"hi\""), ("x4", "line\nbreak"))
      .toDF("id", "message")
    Analytics.exportRows(tricky.withColumn("ts", lit(ts("2024-01-01 00:00:00"))), cap = 3)
    tricky.coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("multiLine", "true").csv(dir)
      .orderBy("id").as[(String, String)].collect().toSeq
    assert(back == Seq(("x1", "plain"), ("x2", "a,b"), ("x3", "say \"hi\""), ("x4", "line\nbreak")))
  }

  test("D7: anomaly repository predicates") {
    val anoms = Seq(
      ("l1", 0.9, true, 0.8, ts("2024-01-01 01:00:00")),
      ("l2", 0.6, true, 0.7, ts("2024-01-01 02:00:00")), // 0.7 NOT > 0.7
      ("l3", 0.2, false, 0.9, ts("2024-01-01 03:00:00")))
      .toDF("log_id", "anomaly_score", "is_anomaly", "confidence", "detected_at")
    assert(Analytics.Anomalies.highConfidence(anoms, 0.7)
      .select("log_id").as[String].collect().toSeq == Seq("l1"))
    assert(Analytics.Anomalies.recent(anoms, ts("2024-01-01 01:30:00")).count() == 2)
    assert(Analytics.Anomalies.countInRange(anoms,
      ts("2024-01-01 00:00:00"), ts("2024-01-01 02:30:00")) == 2)
  }

  test("E1: Porter-light stemming — rule coverage, and query/doc " +
    "inflections meet in stem space") {
    val d = Seq(
      (1L, "the classes pass"),      // sses -> ss, final-s drop
      (2L, "many ponies running"),   // ies -> i, ing drop
      (3L, "sparks flew"),           // final-s after k
      (4L, "she windowed the data"), // ed drop with vowel stem
      (5L, "plus bus us")).toDF("doc_id", "text") // s after u: kept
    val stemmed = d.select($"doc_id",
      Analytics.porterLightStemText($"text").as("s"))
      .as[(Long, String)].collect().toMap
    assert(stemmed(1L) == "the class pass")
    assert(stemmed(2L) == "many poni runn", stemmed(2L))
    assert(stemmed(3L) == "spark flew")
    assert(stemmed(4L) == "she window the data")
    assert(stemmed(5L) == "plus bus us", "u-final plurals untouched")
    // scala twin agrees with the column chain on the query side
    assert(Analytics.porterLightStem("sparks") == "spark")
    assert(Analytics.porterLightStem("windowing") == "window")
    // inflection pair meets at the stem: doc "sparking", query "sparks" —
    // unreachable for the suffix-expansion matcher
    val docs = Seq((1L, "cluster sparking tonight"), (2L, "no match here"))
      .toDF("doc_id", "text")
    val hits = docs.filter(Analytics.textMatchPorter($"text", "sparks"))
      .select($"doc_id").as[Long].collect().toSeq
    assert(hits == Seq(1L))
    assert(docs.filter(Analytics.textMatchStemmed($"text", "sparks"))
      .count() == 0, "suffix expansion of 'sparks' cannot reach 'sparking'")
  }

  test("E1: FULL BM25 length normalization demotes the long repetitive " +
    "doc that raw tf(-idf) promotes") {
    val filler = (1 to 200).map(i => s"filler$i").mkString(" ")
    val docs = Seq(
      (1L, "spark query"),                          // tf=1, dl=2
      (2L, s"spark $filler spark spark spark"),     // tf=4, dl=204
      (3L, "nothing relevant here")).toDF("doc_id", "text")
    def scoresOf(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.as[(Long, Double)].collect().toMap
    val plain = scoresOf(Analytics.textRankBm25(docs, "doc_id", "text", "spark"))
    val full = scoresOf(Analytics.textRankBm25Full(docs, "doc_id", "text", "spark"))
    assert(plain(2L) > plain(1L),
      "without length norm, raw repetition wins")
    assert(full(1L) > full(2L),
      "with k1/b, the short on-topic doc outranks the long repeater")
    assert(!plain.contains(3L) && !full.contains(3L), "non-matching doc absent")
    // saturation alone: per-occurrence value decays — 4x the tf buys
    // far less than 4x the score even before length norm kicks in
    assert(full(2L) < 4 * full(1L))
  }

  test("hybrid RRF: rank fusion rewards cross-arm agreement, hand-computed") {
    // text arm: ids 1,2,3 ranked 1..3; vector arm: ids 3,4 ranked 1..2.
    // id 3 appears in both (ranks 3 and 1) and must beat every single-arm
    // id; ids absent from an arm get no contribution from it.
    val textArm = Analytics.rankArm(
      Seq((1L, 9.0), (2L, 5.0), (3L, 2.0)).toDF("doc_id", "score"),
      "doc_id", "score")
    val vecArm = Analytics.rankArm(
      Seq((3L, 0.99), (4L, 0.80)).toDF("doc_id", "cos_sim"),
      "doc_id", "cos_sim")
    val fused = Analytics.rrfFuse(Seq(textArm, vecArm), "doc_id",
      k0 = 60, topK = 10).as[(Long, Double, Long)].collect()
    val byId = fused.map(r => r._1 -> r._2).toMap
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(byId(3L) == r4(1.0 / 63 + 1.0 / 61), "both arms sum")
    assert(byId(1L) == r4(1.0 / 61) && byId(4L) == r4(1.0 / 62))
    assert(fused.head._1 == 3L, "cross-arm agreement ranks first")
    // ids 2 (text rank 2) and 4 (vec rank 2) both score 1/62 — the
    // rounded-score tie breaks by ascending id, so 2 precedes 4
    assert(fused.map(_._1).toSeq == Seq(3L, 1L, 2L, 4L),
      "order: fused score desc, id tiebreak")
    assert(fused.find(_._1 == 3L).get._3 == 2L, "n_arms counts arm hits")
    // rankArm determinism: equal scores break ties by ascending id
    val tied = Analytics.rankArm(
      Seq((7L, 1.0), (5L, 1.0)).toDF("doc_id", "score"), "doc_id", "score")
      .as[(Long, Long)].collect().toMap
    assert(tied(5L) == 1L && tied(7L) == 2L)
  }

  test("stored text index: tbucket partitions prune to the query terms' " +
    "buckets and the roundtrip reproduces the in-memory BM25 exactly") {
    val docs = Seq(
      (1L, "spark window spark join"),
      (2L, "window the quick fox"),
      (3L, "spark " + Seq.fill(40)("filler").mkString(" ")),
      (4L, "nothing relevant here at all"),
      (5L, "spark window")).toDF("doc_id", "text")
    val path = tmpDir("text-idx")
    Analytics.writeTextIndex(docs, "doc_id", "text", path, nBuckets = 16)
    val fromIndex = Analytics.textIndexTopK(spark, path, "doc_id",
      "spark window", k1 = 1.2, b = 0.75)
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [tbucket"),
      s"tbucket predicate must prune partitions:\n$plan")
    val mem = Analytics.textRankBm25Full(docs, "doc_id", "text",
      "spark window", k1 = 1.2, b = 0.75)
      .as[(Long, Double)].collect().toSeq
    val idx = fromIndex.as[(Long, Double)].collect().toSeq
    assert(idx == mem, s"stored-index BM25 diverged: $idx vs $mem")
    // length normalization visible through the artifact too: the long
    // filler doc ranks below the short exact-match docs
    val rank = idx.map(_._1)
    assert(rank.indexOf(3L) > rank.indexOf(5L))
  }

  test("phrase match: adjacency required, overlaps counted, case-folded, " +
    "plan is scan-local (zero Exchange)") {
    val d = Seq(
      (1L, "the quick fox and the quick fox again"), // 2 occurrences
      (2L, "quick the fox"),                         // right words, wrong order
      (3L, "THE Quick fox"),                         // case folds
      (4L, "the slow fox"),                          // not adjacent pair
      (5L, "a a a"),                                 // overlap corpus
      (6L, "the"))                                   // shorter than phrase
      .toDF("doc_id", "text")
    val got = Analytics.phraseMatch(d, "doc_id", "text",
      Seq("the", "quick"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 1L)))
    assert(got(3L) == ((3L, 1L, 1L)))
    assert(!got.contains(2L) && !got.contains(4L) && !got.contains(6L))
    val ov = Analytics.phraseMatch(d, "doc_id", "text", Seq("a", "a"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(ov == Seq((5L, 2L, 1L)), s"overlapping matches both count: $ov")
    val plan = Analytics.phraseMatch(d, "doc_id", "text", Seq("x", "y"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"phrase match must be scan-local:\n$plan")
  }
}
