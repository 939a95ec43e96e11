package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object IsolateProbe {
  def main(args: Array[String]): Unit = {
    val input = args(0); val out = args(1)
    val spark = SparkSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dims = (Synth.domainReputation(spark), Synth.langMeta(spark))
    def scored = Pipeline.transform(spark.read.parquet(input), dims._1, dims._2)
    def t(what: String)(b: => Unit): Unit = {
      val t0 = System.nanoTime(); b
      System.err.println(f"[iso] $what%-18s ${(System.nanoTime()-t0)/1e9}%7.2f s")
    }
    t("warm-count") { scored.select(count(lit(1))).collect() }
    for (i <- 1 to 3) t(s"compute-only-$i") { scored.select(bit_xor(xxhash64(col("id"))), count(when(col("alert"),1))).collect() }
    for (i <- 1 to 8) { t(s"write-del-$i") { scored.withColumn("severity", when(col("parse_ok"), col("severity")).otherwise("REJECTED")).selectExpr(graft.operators.Route.sinkColumns :+ "severity": _*).write.mode("overwrite").partitionBy("severity").parquet(s"$out/w") }
      t(s"rm-$i") { org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$out/w")) } }
    spark.stop()
  }
}
