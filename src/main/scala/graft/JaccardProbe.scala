package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Throwaway stage-timing probe for the jaccard operator (diagnostics). */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n)")
    }
    // warmup
    docs.count(); Dedup.shingles(docs, "doc_id", "text", 3).count()
    time("shingles scan only")(Dedup.shingles(docs, "doc_id", "text", 3).count())
    time("shingles + checkpoint")(
      Dedup.shingles(docs, "doc_id", "text", 3).localCheckpoint().count())
    for (_ <- 1 to 2)
      time("full ngramJaccardPairs")(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source",
          n = 3, threshold = 0.2, maxShingleDf = 100).count())
    spark.stop()
  }
}
