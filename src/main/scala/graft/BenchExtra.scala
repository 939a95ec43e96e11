package graft

import org.apache.spark.sql.SparkSession

/**
 * Subset benchmark for optimization iteration (the frozen driver-contract
 * [[Bench]] times the full surface; this main times ONLY the named queries,
 * same session config and min-of-2 methodology, so an operator change can
 * be measured in seconds instead of minutes). Also supports a `noop:` name
 * prefix to time a query through the noop sink (guide §1.4 — computes every
 * column, excludes count()'s column pruning).
 *
 * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.BenchExtra <name> [<name>...]
 */
object BenchExtra {
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
    // same untimed warmup as Bench
    try {
      SparkEntry.queries.get("q_counts_conditional").foreach(_(spark, sfDir).count())
      SparkEntry.queries.get("q_tpch_q1").foreach(_(spark, sfDir).count())
      SparkEntry.queries.get("q_alert_gate").foreach(_(spark, sfDir).count())
    } catch { case _: Throwable => }
    val results = args.toSeq.map { arg =>
      val noop = arg.startsWith("noop:")
      val name = if (noop) arg.stripPrefix("noop:") else arg
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"benchextra: $arg")
      def once(): Double = {
        val t0 = System.nanoTime()
        if (noop)
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        else fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val s1 = once(); val s2 = once()
      val secs = math.min(s1, s2)
      System.err.println(f"[benchx] $arg%-28s $secs%8.2f s  [$s1%.2f, $s2%.2f]")
      arg -> secs
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"subset","value":${results.map(_._2).sum},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
