package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Parse, Score}

/**
 * Property tests (SURVEY.md §5.2#4). Each property evaluates the column
 * expressions over a generated batch in ONE Spark job (cases as rows),
 * not one job per case. Uses scalacheck Gen directly with fixed seeds
 * (deterministic; no scalatestplus bridge needed offline).
 */
class PropertySpec extends SparkSuite {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get
  import spark.implicits._

  private val texts: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.choose(9990, 10030).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar)),
    Gen.const(""),
    Gen.oneOf("exception", "ERROR inside", "timed out", "timeout",
      "connection refused", "connect", "connection reset"))

  private def runBatch(cases: Seq[String]) =
    cases.toDF("m").select(
      $"m",
      Parse.truncateMessage($"m").as("t"),
      Parse.severity(Parse.truncateMessage($"m")).as("sev"),
      Score.anomalyScore(Parse.truncateMessage($"m"), Parse.severity(Parse.truncateMessage($"m"))).as("score"))
      .collect()

  test("truncation: bounded at 10015, idempotent, identity below the limit") {
    val cases = sample(Gen.listOfN(200, texts), 11)
    val rows = runBatch(cases)
    rows.foreach { r =>
      val m = r.getString(0); val t = r.getString(1)
      assert(t.length <= 10015, s"bound violated for len ${m.length}")
      if (m.length <= 10000) assert(t == m, "identity below limit")
      else assert(t.length == 10015 && t.endsWith("... [truncated]"))
    }
    // idempotence: re-truncating the truncated output is a no-op
    val again = rows.map(_.getString(1)).toSeq.toDF("m")
      .select(Parse.truncateMessage($"m")).as[String].collect()
    assert(again.toSeq == rows.map(_.getString(1)).toSeq)
  }

  test("severity: total + disjoint; score within [0,1]; anomaly iff score>=0.5") {
    val cases = sample(Gen.listOfN(300, texts), 12)
    val rows = runBatch(cases)
    rows.foreach { r =>
      assert(Set("ERROR", "WARN", "INFO")(r.getString(2)))
      val s = r.getDouble(3)
      assert(s >= 0.0 && s <= 1.0)
    }
    // counts conserved across the partition-by-severity split
    val df = cases.toDF("m").select(Parse.severity($"m").as("s"))
    val bySev = df.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(bySev.values.sum == cases.length)
  }

  test("router conservation on synthetic pages: sinks + rejected = input") {
    for (k <- 1 to 5) {
      val n = sample(Gen.choose(100L, 2000L), k)
      val seed = sample(Gen.choose(1L, 1000L), k + 100)
      val pages = Synth.pages(spark, n, seed = seed, parts = 2)
      val parsed = graft.operators.Parse(pages, Pipeline.DefaultJobStart)
      val routed = parsed.filter($"parse_ok").count()
      val rejected = parsed.filter(!$"parse_ok").count()
      assert(routed + rejected == n, s"conservation at n=$n seed=$seed")
    }
  }

  test("csv escape expression matches RFC-4180 for arbitrary strings") {
    val cases = sample(Gen.listOfN(150, Gen.oneOf(
      Gen.asciiPrintableStr, Gen.const("a,b"), Gen.const("say \"hi\""),
      Gen.const("line\nbreak"), Gen.const("cr\rhere"))), 13)
    val got = cases.toDF("t").select(
      when($"t".rlike("[,\"\n\r]"),
        concat(lit("\""), regexp_replace($"t", "\"", "\"\""), lit("\"")))
        .otherwise($"t")).as[String].collect()
    cases.zip(got).foreach { case (in, out) =>
      val needs = in.exists(",\"\n\r".contains(_))
      val exp = if (needs) "\"" + in.replace("\"", "\"\"") + "\"" else in
      assert(out == exp, s"escape mismatch for ${in.take(40)}")
    }
  }
}
