package graft

import org.apache.spark.sql.SparkSession

/**
 * Driver-run benchmark: times every SparkEntry query on
 * SPARK_GRAFT_SF_DIR, prints ONE JSON line (driver contract).
 * Per-query progress goes to stderr.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: pays the first-query JIT/codegen/footer costs once so
    // per-query numbers measure the queries, not JVM startup (~8s skew
    // otherwise lands on whichever query runs first)
    try {
      SparkEntry.queries.get("q_counts_conditional").foreach(_(spark, sfDir).count())
      SparkEntry.queries.get("q_tpch_q1").foreach(_(spark, sfDir).count())
      // the scorer expression tree (big nested CASE) is the other distinct
      // codegen unit; without this the alphabetically-first scorer query
      // (q_alert_gate) absorbs its one-time JIT+compile cost
      SparkEntry.queries.get("q_alert_gate").foreach(_(spark, sfDir).count())
    } catch { case _: Throwable => }
    // two passes per query, report the min — the host steals CPU in
    // multi-minute episodes (BENCH.md §4); a single cold sample can read
    // 1.5-9x high. Same alternating-minimum protocol as scripts/scaling.sh.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (s1, n) = once()
      val (s2, _) = once()
      val secs = math.min(s1, s2)
      System.err.println(f"[bench] $name%-24s $secs%8.2f s  ($n rows)  [$s1%.2f, $s2%.2f]")
      name -> secs
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","passes":2,"aggregation":"min"}""")
    spark.stop()
  }
}
