package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Curation, TextAnalysis}

/**
 * Diagnostic: where does q_curation_v2 spend its time? Times the three
 * corpus passes separately (gate scan → paragraph-dedup pass → budget
 * pass) and the full composition — the evidence behind any round-6
 * restructuring of the curation composites (OPTIMIZATION_r06.md).
 *
 * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.CurationProbe
 */
object CurationProbe {
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

    def t[A](what: String)(b: => A): A = {
      val t0 = System.nanoTime(); val r = b
      System.err.println(f"[cur] $what%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.select(count(lit(1))).collect() // warmup

    for (pass <- 1 to 2) {
      System.err.println(s"--- pass $pass ---")
      val keep = Curation.gopherStruct(col("text")).getField("gopher_keep")
      t("gate-filter-direct") {
        d.filter(keep && TextAnalysis.qualityScore(col("text")) >= 0.45)
          .select(count(lit(1))).collect()
      }
      t("gate-project-then-agg") {
        d.select((keep && TextAnalysis.qualityScore(col("text")) >= 0.45)
          .as("k"))
          .select(sum(when(col("k"), 1L).otherwise(0L))).collect()
      }
      val gatedIds = t("gate-scan-checkpoint") {
        d.filter(keep && TextAnalysis.qualityScore(col("text")) >= 0.45)
          .select(col("doc_id")).localCheckpoint()
      }
      val gated = d.join(gatedIds, Seq("doc_id"))
      val para = t("para-pass") {
        Curation.paragraphDedup(gated, "doc_id", "text", 8)
          .filter(col("kept_frac") >= 0.5).select("doc_id").localCheckpoint()
      }
      t("budget-pass") {
        val clean = gated.join(para, Seq("doc_id"))
        Curation.tokenBudgetFilter(clean, "doc_id", "text", "source", 800L)
          .select(Curation.splitAssign(col("doc_id")).as("split"),
            col("n_tokens"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"))
          .orderBy("split").count()
      }
      t("full-query") {
        SparkEntry.queries("q_curation_v2")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
