package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamPipeline

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  test("file-stream pipeline: batch and streaming produce identical routed rows") {
    val in = tmpDir("sin")
    val out = tmpDir("sout")
    val ckpt = tmpDir("sck")
    // two "arrivals" (files) of deterministic pages
    Synth.pages(spark, 500, parts = 2).write.parquet(s"$in/a")
    Synth.pages(spark, 500, seed = 77, parts = 2).write.parquet(s"$in/b")
    // flatten both dirs into one source dir
    val src = tmpDir("src")
    spark.read.parquet(s"$in/a").union(spark.read.parquet(s"$in/b"))
      .repartition(4).write.mode("overwrite").parquet(src)

    val q = StreamPipeline.run(spark, src, out, ckpt)
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(s"$out/batch=*")
      .filter($"severity" =!= "REJECTED")
    val dims = (Synth.domainReputation(spark), Synth.langMeta(spark))
    val batch = Pipeline.transform(spark.read.parquet(src), dims._1, dims._2)
      .filter($"parse_ok")
    assert(streamed.count() == batch.count())
    // routed-row equality across modes (severity + score per id)
    val a = streamed.select($"id", $"severity", $"anomaly_score")
      .as[(String, String, Double)].collect().sorted
    val b = batch.select($"id", $"severity", $"anomaly_score")
      .as[(String, String, Double)].collect().sorted
    assert(a.toSeq == b.toSeq)
  }

  test("stateful anomaly streaks across micro-batches (flatMapGroupsWithState)") {
    import graft.streaming.StreamPipeline.{ServiceEvent, StreakAlert}
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[ServiceEvent]
    val q = StreamPipeline.anomalyStreaks(mem.toDS(), threshold = 3)
      .writeStream.outputMode("append").format("memory").queryName("streaks").start()
    def ev(svc: String, m: Int, anom: Boolean) =
      ServiceEvent(svc, java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00"), anom)
    // batch 1: svc-a builds 2, svc-b stays clean
    mem.addData(ev("a", 1, true), ev("a", 2, true), ev("b", 1, false))
    q.processAllAvailable()
    assert(spark.table("streaks").count() == 0, "no alert below threshold")
    // batch 2: svc-a's streak CONTINUES across batches -> alert at 3;
    // svc-b resets mid-way and never alerts
    mem.addData(ev("a", 3, true), ev("b", 2, true), ev("b", 3, false), ev("b", 4, true))
    q.processAllAvailable()
    val alerts = spark.table("streaks").as[StreakAlert].collect().toSeq
    assert(alerts == Seq(StreakAlert("a", 3,
      java.sql.Timestamp.valueOf("2024-01-01 00:03:00"))))
    // batch 3: clean record resets svc-a; 3 more anomalies re-alert
    mem.addData(ev("a", 4, false), ev("a", 5, true), ev("a", 6, true), ev("a", 7, true))
    q.processAllAvailable()
    assert(spark.table("streaks").count() == 2)
    q.stop()
  }

  test("streaks under volume (rate test): streaming equals driver-side reference") {
    import graft.streaming.StreamPipeline.{ServiceEvent, StreakAlert}
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[ServiceEvent]
    val q = StreamPipeline.anomalyStreaks(mem.toDS(), threshold = 3)
      .writeStream.outputMode("append").format("memory")
      .queryName("streaks_rate").start()
    // 20k time-ordered events across 50 services, 40% anomalous
    val rnd = new scala.util.Random(42)
    val events = (1 to 20000).map { i =>
      ServiceEvent(s"svc-${rnd.nextInt(50)}",
        new java.sql.Timestamp(1700000000000L + i * 1000L),
        rnd.nextDouble() < 0.4)
    }
    events.grouped(4000).foreach { b => mem.addData(b); q.processAllAvailable() }
    val got = spark.table("streaks_rate").as[StreakAlert].collect().toSeq
      .sortBy(a => (a.service, a.at.getTime))
    val exp = events.groupBy(_.service).toSeq.flatMap { case (svc, evs) =>
      var streak = 0
      evs.sortBy(_.ts.getTime).flatMap { e =>
        if (e.isAnomaly) {
          streak += 1
          if (streak == 3) Some(StreakAlert(svc, 3, e.ts)) else None
        } else { streak = 0; None }
      }
    }.sortBy(a => (a.service, a.at.getTime))
    assert(got.nonEmpty && got == exp,
      s"streaming streaks (${got.length}) != reference (${exp.length})")
    q.stop()
  }

  test("streaming dedup: replays within the watermark are dropped (bounded state)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Schemas.PageRow]
    val q = StreamPipeline.dedupStream(mem.toDF(), watermark = "10 minutes")
      .select($"url")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream").start()
    def page(u: String, m: Int) = Schemas.PageRow(
      s"https://h.example.com/$u",
      java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00"),
      Array.emptyByteArray, "text", "en")
    mem.addData(page("a", 1), page("b", 1))
    q.processAllAvailable()
    // batch 2 replays "a" (at-least-once) within the watermark + adds "c"
    mem.addData(page("a", 2), page("c", 3))
    q.processAllAvailable()
    val urls = spark.table("dedup_stream").as[String].collect().toSeq
    assert(urls.sorted == Seq("https://h.example.com/a",
      "https://h.example.com/b", "https://h.example.com/c"),
      s"replay must be dropped exactly once: $urls")
    q.stop()
  }

  test("streaming sessionization (session_window): matches batch sessions, " +
    "boundary case (gap == limit stays in-session) included") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[StreamingSpec.UserEvent]
    val q = StreamPipeline.sessionizeStream(mem.toDF(), "user_id", "ts",
      gap = "30 minutes")
      .writeStream.outputMode("complete").format("memory")
      .queryName("sess_stream").start()
    def e(u: Long, t: String) =
      StreamingSpec.UserEvent(u, java.sql.Timestamp.valueOf(t))
    // user 1: 10:00, 10:20 merge (gap 1200 < 1800); 11:00 splits (2400 > 1800)
    // user 2: 10:00 then 10:30:00 — gap EXACTLY 1800
    mem.addData(
      e(1, "2024-01-01 10:00:00"), e(1, "2024-01-01 10:20:00"),
      e(1, "2024-01-01 11:00:00"),
      e(2, "2024-01-01 10:00:00"), e(2, "2024-01-01 10:30:00"))
    q.processAllAvailable()
    val got = spark.table("sess_stream")
      .select($"user_id", $"n_events", $"session_start_s", $"session_end_s")
      .as[(Long, Long, Long, Long)].collect().toSet
    def s(t: String) = java.sql.Timestamp.valueOf(t).getTime / 1000L
    assert(got == Set(
      (1L, 2L, s("2024-01-01 10:00:00"), s("2024-01-01 10:20:00")),
      (1L, 1L, s("2024-01-01 11:00:00"), s("2024-01-01 11:00:00")),
      // gap of EXACTLY 1800 merges — same inclusive boundary as batch
      (2L, 2L, s("2024-01-01 10:00:00"), s("2024-01-01 10:30:00"))), got)
    q.stop()
    // the batch operator sessionizes the same input IDENTICALLY,
    // boundary case included
    import graft.operators.Temporal
    val batch = Temporal.sessionStats(
      Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
        (1L, java.sql.Timestamp.valueOf("2024-01-01 10:20:00"), 2L),
        (1L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 3L),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 4L),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), 5L))
        .toDF("user_id", "ts", "event_id"),
      "user_id", "ts", 1800, "event_id")
      .select($"user_id", $"n_events", $"session_start_s", $"session_end_s")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch == Set(
      (1L, 2L, s("2024-01-01 10:00:00"), s("2024-01-01 10:20:00")),
      (1L, 1L, s("2024-01-01 11:00:00"), s("2024-01-01 11:00:00")),
      (2L, 2L, s("2024-01-01 10:00:00"), s("2024-01-01 10:30:00"))), batch)
  }

  test("windowed severity counts with watermark (incremental F3)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Schemas.PageRow]
    val agg = StreamPipeline.windowedSeverityCounts(mem.toDF())
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("wsc")
      .trigger(Trigger.ProcessingTime(0)).start()
    def page(i: Int, hour: Int, text: String) = Schemas.PageRow(
      s"https://h$i.example.com/p/$i",
      java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:15:00"),
      Array.emptyByteArray, text, "en")
    mem.addData(
      page(1, 0, "all fine"), page(2, 0, "fatal error here"),
      page(3, 1, "request timeout"), page(4, 3, "ok then"))
    q.processAllAvailable()
    val rows = spark.table("wsc")
      .select($"bucket", $"severity", $"cnt")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    assert(rows == Set(
      (ts(0), "INFO", 1L), (ts(0), "ERROR", 1L),
      (ts(1), "WARN", 1L), (ts(3), "INFO", 1L)))
    q.stop()
  }

  test("streaming contamination gate: stateless append-mode flagging matches " +
    "the batch operator's counts") {
    implicit val sq = spark.sqlContext
    val bench = Seq(
      (1L, "the secret benchmark answer is forty two exactly"),
      (2L, "another held out evaluation prompt entirely"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[StreamingSpec.Doc]
    val flagged = StreamPipeline.contaminationStream(mem.toDF(), "doc_id",
      "text", bench, n = 5)
    // zero streaming state: the plan must be append-mode runnable
    val q = flagged.writeStream.outputMode("append").format("memory")
      .queryName("contam_stream").start()
    val docs = Seq(
      StreamingSpec.Doc(10L, "prefix words the secret benchmark answer is forty two exactly suffix"),
      StreamingSpec.Doc(11L, "totally clean document with no overlap at all here"),
      StreamingSpec.Doc(12L, "another held out evaluation prompt entirely copied verbatim"))
    mem.addData(docs: _*)
    q.processAllAvailable()
    val got = spark.table("contam_stream").as[(Long, Long)].collect().toMap
    q.stop()
    val batch = graft.operators.Curation.contamination(
      docs.toDF(), "doc_id", "text", bench, n = 5)
      .select($"doc_id", $"shared_grams").as[(Long, Long)].collect().toMap
    assert(got == batch, s"stream $got vs batch $batch")
    assert(!got.contains(11L), "clean doc must not be flagged")
    assert(got(10L) == 4L) // 8-token match window -> 4 shared 5-grams
  }

  test("streaming LM gate: stateless append-mode scoring; equals the batch " +
    "operator bit-for-bit when train and score corpora coincide; OOV floor " +
    "prices unseen tokens") {
    implicit val sq = spark.sqlContext
    val corpus = Seq(
      StreamingSpec.Doc(1L, "the quick brown fox jumps over the lazy dog"),
      StreamingSpec.Doc(2L, "the quick brown cat naps under the warm sun"),
      StreamingSpec.Doc(3L, "the slow green turtle walks past the quick dog"))
    val staticDf = corpus.toDF()
    val mem = MemoryStream[StreamingSpec.Doc]
    val scored = StreamPipeline.lmScoreStream(mem.toDF(), "doc_id", "text",
      staticDf, minCount = 2L)
    val q = scored.writeStream.outputMode("append").format("memory")
      .queryName("lm_stream").start()
    // stream the SAME corpus -> must equal the batch self-trained scores,
    // plus one novel doc full of unseen tokens -> OOV-floor surprisal
    mem.addData(corpus :+ StreamingSpec.Doc(9L, "zzq xxv wwu unseen gibberish"): _*)
    q.processAllAvailable()
    val got = spark.table("lm_stream").as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    q.stop()
    val batch = graft.operators.Curation.unigramLmScore(staticDf,
      "doc_id", "text", minCount = 2L)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    corpus.foreach(d => assert(got(d.doc_id) == batch(d.doc_id),
      s"doc ${d.doc_id}: stream ${got(d.doc_id)} vs batch ${batch(d.doc_id)}"))
    // all-OOV doc: every token prices at -ln(1/total), the maximum
    assert(got(9L)._2 > corpus.map(d => got(d.doc_id)._2).max,
      "unseen-vocabulary doc must out-score every in-corpus doc")
  }

  test("streaming LM gate with topK: bounded-vocab stream scores equal the " +
    "batch topK scores exactly") {
    implicit val sq = spark.sqlContext
    val corpus = (1L to 20L).map(i =>
      StreamingSpec.Doc(i, s"alpha beta gamma delta tok${i % 3} rare$i"))
    val staticDf = corpus.toDF()
    val mem = MemoryStream[StreamingSpec.Doc]
    val scored = StreamPipeline.lmScoreStream(mem.toDF(), "doc_id", "text",
      staticDf, minCount = 2L, topK = Some(3))
    val q = scored.writeStream.outputMode("append").format("memory")
      .queryName("lm_stream_topk").start()
    mem.addData(corpus: _*)
    q.processAllAvailable()
    val got = spark.table("lm_stream_topk").as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    q.stop()
    val batch = graft.operators.Curation.unigramLmScore(staticDf,
      "doc_id", "text", minCount = 2L, topK = Some(3))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == batch, s"stream $got vs batch $batch")
  }

  test("streaming DSIR gate: stateless append-mode scoring equals the batch " +
    "weights bit-for-bit on the training corpus; unseen buckets price at " +
    "the OOV floor") {
    implicit val sq = spark.sqlContext
    val corpus = (
      (1L to 5L).map(i => StreamingSpec.SrcDoc(i, "t", "alpha alpha raven")) ++
      (6L to 20L).map(i => StreamingSpec.SrcDoc(i, "r", "beta beta stone")) :+
      StreamingSpec.SrcDoc(21L, "r", "alpha raven alpha")).toSeq
    val staticDf = corpus.toDF()
    val mem = MemoryStream[StreamingSpec.SrcDoc]
    val scored = StreamPipeline.dsirGateStream(mem.toDF(), "doc_id", "text",
      staticDf, isTarget = $"source" === "t", dim = 64)
    val q = scored.writeStream.outputMode("append").format("memory")
      .queryName("dsir_stream").start()
    mem.addData(corpus :+ StreamingSpec.SrcDoc(99L, "r", "zzq xxv unseen stuff"): _*)
    q.processAllAvailable()
    val got = spark.table("dsir_stream").as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    q.stop()
    val batch = graft.operators.Curation.dsirWeights(staticDf,
      "doc_id", "text", isTarget = $"source" === "t", dim = 64)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    corpus.foreach(d => assert(got(d.doc_id) == batch(d.doc_id),
      s"doc ${d.doc_id}: stream ${got(d.doc_id)} vs batch ${batch(d.doc_id)}"))
    assert(got(21L)._1 == 3L && got(21L)._2 > 0,
      "target-language doc scores in-domain through the gate")
    assert(got.contains(99L), "OOV doc still scored (lr0 floor), not dropped")
  }

  test("streaming NB gate: stateless append-mode scoring equals the batch " +
    "classifier bit-for-bit on the training corpus; OOV buckets price at " +
    "w0; predictions ride the rounded score") {
    implicit val sq = spark.sqlContext
    val corpus = (
      (1L to 6L).map(i => StreamingSpec.SrcDoc(i, "good", "alpha beta alpha clean prose")) ++
      (7L to 12L).map(i => StreamingSpec.SrcDoc(i, "spam", "zz yy zz buy now click"))).toSeq
    val staticDf = corpus.toDF()
    val mem = MemoryStream[StreamingSpec.SrcDoc]
    val scored = StreamPipeline.nbcGateStream(mem.toDF(), "doc_id", "text",
      staticDf, isPositive = $"source" === "good", dim = 256)
    val q = scored.writeStream.outputMode("append").format("memory")
      .queryName("nbc_stream").start()
    mem.addData(corpus :+ StreamingSpec.SrcDoc(99L, "spam", "totally unseen vocabulary here"): _*)
    q.processAllAvailable()
    val got = spark.table("nbc_stream").as[(Long, Long, Double, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    q.stop()
    val batch = graft.operators.Curation.nbcScore(staticDf, "doc_id", "text",
      isPositive = $"source" === "good", dim = 256)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    corpus.foreach(d => assert(got(d.doc_id) == batch(d.doc_id),
      s"doc ${d.doc_id}: stream ${got(d.doc_id)} vs batch ${batch(d.doc_id)}"))
    assert(got(1L)._3 && !got(7L)._3,
      "separable classes must gate correctly through the stream")
    assert(got.contains(99L), "OOV doc still scored (w0 floor), not dropped")
  }

  test("streaming NB gate refuses a degenerate training corpus (empty or " +
    "single-class) instead of silently passing nothing") {
    implicit val sq = spark.sqlContext
    val oneClass = (1L to 5L)
      .map(i => StreamingSpec.SrcDoc(i, "good", "alpha beta")).toSeq.toDF()
    val mem = MemoryStream[StreamingSpec.SrcDoc]
    val e = intercept[IllegalArgumentException] {
      StreamPipeline.nbcGateStream(mem.toDF(), "doc_id", "text",
        oneClass, isPositive = $"source" === "good", dim = 64)
    }
    assert(e.getMessage.contains("BOTH classes"), e.getMessage)
    val empty = oneClass.filter($"doc_id" < 0)
    val e2 = intercept[IllegalArgumentException] {
      StreamPipeline.nbcGateStream(mem.toDF(), "doc_id", "text",
        empty, isPositive = $"source" === "good", dim = 64)
    }
    assert(e2.getMessage.contains("BOTH classes"), e2.getMessage)
  }

  test("streaming robots gate: robotsFilter is streaming-transparent — " +
    "the same operator runs on a stream via a stateless stream-static " +
    "join and matches the batch verdicts row-for-row") {
    implicit val sq = spark.sqlContext
    val pages = Seq(
      StreamingSpec.Doc(1L, "https://a.com/private/x"),
      StreamingSpec.Doc(2L, "https://a.com/private/ok/x"),
      StreamingSpec.Doc(3L, "https://a.com/other"),
      StreamingSpec.Doc(4L, "https://norules.org/private/x"))
    val rules = Seq(
      ("a.com", "disallow", "/private"),
      ("a.com", "allow", "/private/ok"))
      .toDF("host", "rule", "path_prefix")
    def project(df: org.apache.spark.sql.DataFrame) =
      graft.operators.WebGraph.robotsFilter(
        df.withColumnRenamed("text", "url"), rules, "url")
        .select($"doc_id", $"matched_len", $"allowed")
    val mem = MemoryStream[StreamingSpec.Doc]
    val q = project(mem.toDF()).writeStream.outputMode("append")
      .format("memory").queryName("robots_stream").start()
    mem.addData(pages: _*)
    q.processAllAvailable()
    val got = spark.table("robots_stream").as[(Long, Long, Boolean)]
      .collect().toSet
    q.stop()
    val batch = project(pages.toDF()).as[(Long, Long, Boolean)].collect().toSet
    assert(got == batch, s"stream $got vs batch $batch")
    assert(got.contains((1L, 8L, false)) && got.contains((2L, 11L, true)))
  }

  test("streaming sketch maintenance: HLL and CMS registers maintained " +
    "incrementally in complete mode equal the batch sketches; registers " +
    "only grow across micro-batches (bounded state by construction)") {
    implicit val sq = spark.sqlContext
    import graft.operators.Sketches
    val chunk1 = (1 to 20).map(i => StreamingSpec.SrcDoc(i.toLong,
      s"s${i % 2}", (0 until 15).map(j => s"w${(i * 11 + j * 3) % 37}").mkString(" ")))
    val chunk2 = (21 to 40).map(i => StreamingSpec.SrcDoc(i.toLong,
      s"s${i % 2}", (0 until 15).map(j => s"w${(i * 11 + j * 3) % 37}").mkString(" ")))
    // HLL: the SAME operator runs on the stream — max-aggregation is
    // commutative/monotone, so complete-mode state is the 2 groups × 2^p
    // register table, bounded by construction
    val mem = MemoryStream[StreamingSpec.SrcDoc]
    val q = Sketches.hllRegisters(mem.toDF(), "source", "text", p = 5)
      .writeStream.outputMode("complete").format("memory")
      .queryName("hll_stream").start()
    mem.addData(chunk1: _*)
    q.processAllAvailable()
    val mid = spark.table("hll_stream").as[(String, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    mem.addData(chunk2: _*)
    q.processAllAvailable()
    val fin = spark.table("hll_stream").as[(String, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    q.stop()
    val batch = Sketches.hllRegisters((chunk1 ++ chunk2).toDF(),
      "source", "text", p = 5)
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(fin == batch, "final streaming registers must equal batch")
    mid.foreach { case (k, v) =>
      assert(fin.getOrElse(k, 0L) >= v, s"register shrank at $k")
    }
    // CMS: addition is likewise streaming-safe — final counts equal batch
    val mem2 = MemoryStream[StreamingSpec.SrcDoc]
    val q2 = Sketches.cmsSketch(mem2.toDF(), "source", "text", depth = 2,
      width = 16)
      .writeStream.outputMode("complete").format("memory")
      .queryName("cms_stream").start()
    mem2.addData(chunk1: _*); mem2.addData(chunk2: _*)
    q2.processAllAvailable()
    val cmsGot = spark.table("cms_stream").as[(String, Long, Long, Long)]
      .collect().toSet
    q2.stop()
    val cmsBatch = Sketches.cmsSketch((chunk1 ++ chunk2).toDF(),
      "source", "text", depth = 2, width = 16)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(cmsGot == cmsBatch, "streaming CMS must equal batch")
  }

  test("streaming incremental dedup: stateless anti-join probes of the " +
    "stored index match the batch operator row-for-row") {
    implicit val sq = spark.sqlContext
    val long = (1 to 30).map(i => s"w$i").mkString(" ")
    val seen = Seq(
      (1L, s"$long tail one"),
      (2L, "a completely different seen document body here"))
      .toDF("doc_id", "text")
    val path = tmpDir("sig-idx-stream")
    graft.operators.Dedup.writeSignatureIndex(seen, "doc_id", "text", path, n = 3)
    val newDocs = Seq(
      StreamingSpec.Doc(10L, s"$long tail one"),        // exact dup -> dropped
      StreamingSpec.Doc(11L, s"$long tail uno"),        // near dup -> dropped
      StreamingSpec.Doc(12L, "an entirely novel page about fresh topics"),
      StreamingSpec.Doc(13L, "xy")) // shingle-less: only the exact channel applies
    val mem = MemoryStream[StreamingSpec.Doc]
    val kept = StreamPipeline.incrementalDedupStream(spark, path,
      mem.toDF(), "doc_id", "text", n = 3)
    // zero streaming state: append-mode runnable as chained anti-joins
    val q = kept.writeStream.outputMode("append").format("memory")
      .queryName("incdedup_stream").start()
    mem.addData(newDocs: _*)
    q.processAllAvailable()
    val got = spark.table("incdedup_stream").select($"doc_id")
      .as[Long].collect().toSet
    q.stop()
    val batch = graft.operators.Dedup.incrementalDedupAgainstIndex(spark,
      path, newDocs.toDF(), "doc_id", "text", n = 3)
      .select($"doc_id").as[Long].collect().toSet
    assert(got == batch, s"stream $got vs batch $batch")
    assert(!got.contains(10L), "exact dup must be dropped")
    assert(!got.contains(11L), "near dup must be dropped")
    assert(got.contains(12L) && got.contains(13L),
      "novel and shingle-less docs must pass")
    // the index guard holds on the streaming path too
    val err = intercept[IllegalArgumentException] {
      StreamPipeline.incrementalDedupStream(spark, path, mem.toDF(),
        "doc_id", "text", n = 5)
    }
    assert(err.getMessage.contains("n=3"))
  }

  test("streaming keyed upsert: micro-batches merge into the partitioned " +
    "table, batch wins, final state equals the batch-side merge") {
    implicit val sq = spark.sqlContext
    val dir = tmpDir("upsert-stream") + "/tbl"
    val ckpt = tmpDir("upsert-stream-ckpt")
    val mem = MemoryStream[StreamingSpec.Versioned]
    // wave 1: base rows; AvailableNow drains then stops -> restart for wave 2
    mem.addData(
      StreamingSpec.Versioned(1L, "v0", "p1"),
      StreamingSpec.Versioned(2L, "v0", "p1"),
      StreamingSpec.Versioned(3L, "v0", "p2"))
    val q1 = StreamPipeline.upsertStream(spark, dir, mem.toDF(), "id", "part", ckpt)
    q1.awaitTermination()
    mem.addData(
      StreamingSpec.Versioned(2L, "v1", "p1"), // update
      StreamingSpec.Versioned(9L, "new", "p2")) // insert
    val q2 = StreamPipeline.upsertStream(spark, dir, mem.toDF(), "id", "part", ckpt)
    q2.awaitTermination()
    val got = spark.read.parquet(dir).select($"id", $"ver", $"part")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "v0", "p1"), (2L, "v1", "p1"), (3L, "v0", "p2"),
      (9L, "new", "p2")), got.toString)
  }
}

object StreamingSpec {
  /** Top-level case class: MemoryStream encoders reject local classes. */
  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp)

  final case class Doc(doc_id: Long, text: String)

  final case class SrcDoc(doc_id: Long, source: String, text: String)

  final case class Versioned(id: Long, ver: String, part: String)
}
