package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Diagnostic: where do the label-propagation cluster queries spend their
 * time? Splits q_dedup_clusters into candidate-build vs loop, and times
 * every propagation round (join+agg+join+checkpoint job, then the count
 * gate job) — the evidence behind the round-6 loop restructuring
 * decision (OPTIMIZATION_r06.md).
 *
 * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ClusterProbe
 */
object ClusterProbe {
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
    import spark.implicits._

    def t[A](what: String)(b: => A): A = {
      val t0 = System.nanoTime(); val r = b
      System.err.println(f"[cluster] $what%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warmup: JIT + codegen paths
    docs.select(count(lit(1))).collect()
    graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text", n = 3)
      .select(count(lit(1))).collect()

    for (pass <- 1 to 2) {
      System.err.println(s"--- pass $pass ---")
      val cand = t("candidates-build") {
        graft.operators.Dedup
          .minhashCandidates(docs, "doc_id", "text", n = 3).localCheckpoint()
      }
      t("candidates-count")(cand.count())
      // the dedupClusters loop, inlined with per-round timing
      val edges = t("edges-checkpoint") {
        cand.select(col("id1"), col("id2"))
          .union(cand.select(col("id2").as("id1"), col("id1").as("id2")))
          .localCheckpoint()
      }
      var labels = t("labels-init") {
        edges.select(col("id1").as("id")).distinct()
          .withColumn("cluster", col("id"))
          .localCheckpoint()
      }
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < 25) {
        val stepped = t(s"round-$iter-materialize") {
          val nbrMin = edges
            .join(labels.select(col("id").as("id2"), col("cluster").as("nl")),
              Seq("id2"))
            .groupBy(col("id1").as("id")).agg(min(col("nl")).as("nmin"))
          labels.join(nbrMin, Seq("id"))
            .select(col("id"), col("cluster"),
              least(col("cluster"), col("nmin")).as("next"))
            .localCheckpoint()
        }
        changed = t(s"round-$iter-gate") {
          stepped.filter(col("next") < col("cluster")).count()
        }
        labels = stepped.select(col("id"), col("next").as("cluster"))
        iter += 1
      }
      System.err.println(s"[cluster] converged after $iter rounds")
    }
    spark.stop()
  }
}
