package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Temporal

class TemporalSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join: latest at-or-before match per key, inclusive equality, null when none") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // after r@09:00 -> "a"
      (2L, 10L, ts("2024-01-01 12:00:00")), // exactly r@12:00 -> "b" (inclusive)
      (3L, 10L, ts("2024-01-01 08:00:00")), // before any right row -> null
      (4L, 20L, ts("2024-01-01 10:00:00")), // key with no right rows -> null
      (5L, 10L, ts("2024-01-02 00:00:00"))  // after all -> latest "b"
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:00:00"), "a"),
      (10L, ts("2024-01-01 12:00:00"), "b")
    ).toDF("k", "rts", "payload")
    val got = Temporal.asofJoin(left, right, "k", "ts", "rts")
      .select($"event_id", $"payload").as[(Long, Option[String])]
      .collect().toMap
    assert(got == Map(1L -> Some("a"), 2L -> Some("b"), 3L -> None,
      4L -> None, 5L -> Some("b")))
  }

  test("asof join matches a per-group scala reference on generated data") {
    val rnd = new scala.util.Random(5)
    val left = (1 to 500).map(i =>
      (i.toLong, (rnd.nextInt(8) + 1).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L)))
    val right = (1 to 120).map(i =>
      ((i % 10 + 1).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L), i.toLong))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq // unique (k, ts)
    val got = Temporal.asofJoin(
      left.toDF("event_id", "k", "ts"), right.toDF("k", "rts", "rid"),
      "k", "ts", "rts")
      .select($"event_id", $"rid").as[(Long, Option[Long])].collect().toMap
    left.foreach { case (id, k, t) =>
      val exp = right.filter(r => r._1 == k && !r._2.after(t))
        .sortBy(r => (r._2.getTime, r._3)).lastOption.map(_._3)
      assert(got(id) == exp, s"event $id key $k @ $t")
    }
  }

  test("sessionize: gap == limit stays in-session, gap > limit splits; stats roll up") {
    val e = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 10:30:00")), // gap exactly 1800s -> same session
      (3L, 7L, ts("2024-01-01 11:00:01")), // 1801s -> new session
      (4L, 7L, ts("2024-01-01 11:10:00")),
      (5L, 8L, ts("2024-01-01 10:00:00"))  // other key -> own session
    ).toDF("event_id", "user_id", "ts")
    val seqs = Temporal.sessionize(e, "user_id", "ts", 1800, "event_id")
      .select($"event_id", $"session_seq").as[(Long, Long)].collect().toMap
    assert(seqs == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
    def s(str: String): Long = ts(str).getTime / 1000L
    val stats = Temporal.sessionStats(e, "user_id", "ts", 1800, "event_id")
      .orderBy("user_id", "session_seq")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(stats == Seq(
      (7L, 1L, 2L, s("2024-01-01 10:00:00"), s("2024-01-01 10:30:00"), 1800L),
      (7L, 2L, 2L, s("2024-01-01 11:00:01"), s("2024-01-01 11:10:00"), 599L),
      (8L, 1L, 1L, s("2024-01-01 10:00:00"), s("2024-01-01 10:00:00"), 0L)))
  }

  test("asof join fills the WHOLE matched row: a null payload field stays null " +
    "(never stitched from an older right row)") {
    val left = Seq((1L, 10L, ts("2024-01-01 13:00:00"))).toDF("event_id", "k", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:00:00"), Option("old"), Option(7L)),
      (10L, ts("2024-01-01 12:00:00"), Option("new"), Option.empty[Long])
    ).toDF("k", "rts", "tag", "extra")
    val got = Temporal.asofJoin(left, right, "k", "ts", "rts")
      .select($"tag", $"extra").as[(Option[String], Option[Long])]
      .collect().toSeq
    // DuckDB ASOF attaches ALL columns of the single matched row — the
    // null `extra` of the 12:00 row must NOT be back-filled from 09:00.
    assert(got == Seq((Some("new"), None)))
  }

  test("asof join plan: one keyed window shuffle, no range join / cross product") {
    val left = spark.range(0, 1000).select($"id".as("event_id"),
      ($"id" % 10).as("k"), to_timestamp(lit("2024-01-01 10:00:00")).as("ts"))
    val right = spark.range(0, 50).select(($"id" % 10).as("k"),
      to_timestamp(lit("2024-01-01 09:00:00")).as("rts"), $"id".as("rid"))
      .groupBy("k", "rts").agg(max("rid").as("rid"))
    val p = Temporal.asofJoin(left, right, "k", "ts", "rts")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
  }
}
