package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val W = java.nio.file.Files.createTempDirectory("plan").toString
    Synth.pages(spark, 10000, parts=4).write.parquet(s"$W/pages")
    val dims = (Synth.domainReputation(spark), Synth.langMeta(spark))
    val scored = Pipeline.transform(spark.read.parquet(s"$W/pages"), dims._1, dims._2)
      .filter(org.apache.spark.sql.functions.col("parse_ok"))
    println("===== FLAGSHIP =====")
    scored.explain("formatted")
    println("===== PRE-WRITE (sink projection) =====")
    import org.apache.spark.sql.functions._
    val prewrite = Pipeline.transform(spark.read.parquet(s"$W/pages"), dims._1, dims._2)
      .withColumn("severity", when(col("parse_ok"), col("severity")).otherwise("REJECTED"))
      .selectExpr(graft.operators.Route.sinkColumns :+ "severity": _*)
    prewrite.explain("formatted")
    spark.stop()
  }
}
