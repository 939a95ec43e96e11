package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.CentroidExprs

/**
 * Measurement probe for the ANN centroid machinery at PRODUCTION k
 * (r5 verdict "what's wrong #1"): the former cell-assignment expression
 * was `array_max` over k struct(cosine, −cid) LITERALS — depth linear in
 * k, the same hazard class whose StringReplace sibling degraded
 * superlinearly and StackOverflowed Catalyst analysis at depth 512
 * (BENCH.md §7). Production PQ uses k=256 codewords; SemDeDup's published
 * regime is k=50,000 cells.
 *
 * Protocol: deterministic corpus of `nDocs` vectors × dim 64 (seeded-hash
 * components in [−1, 1]), assigned to k synthetic centroids with BOTH
 * formulations at k = 8…4096: the literal `array_max` tree (reproduced
 * here verbatim from the former `Similarity.cellColumn`) and the native
 * [[graft.functions.NearestCentroidId]] kernel (codebook as one reference
 * object). Reports per k: analysis+plan time, execution wall, rows/s,
 * whole-stage-codegen status, and the cell-id checksum — the checksums
 * MUST match, pinning the kernels' equivalence at every k the literal
 * form survives.
 *
 * Run: sbt "runMain graft.CentroidDepthProbe [maxK] [nDocs]"
 */
object CentroidDepthProbe {
  def main(args: Array[String]): Unit = {
    val maxK = if (args.length > 0) args(0).toInt else 4096
    val nDocs = if (args.length > 1) args(1).toLong else 100000L
    val dim = 64
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "false") // see BpeDepthProbe
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // corpus: dim-64 vectors, components in [-1, 1], seeded-hash generated
    val vecs = spark.range(0L, nDocs, 1L, 8).select(
      col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)),
        i => pmod(xxhash64(col("id"), i, lit(11L)), lit(2001L))
          .cast("double") / 1000.0 - 1.0).as("v"))
      .localCheckpoint()
    val total = vecs.count()

    // synthetic codebook: k centroids over the same component distribution
    def codebook(k: Int): Seq[(Long, Seq[Double])] =
      (0L until k.toLong).map { c =>
        (c, (1 to dim).map(i =>
          ((Math.floorMod(c * 7919L + i * 104729L, 2001L)).toDouble
            / 1000.0) - 1.0))
      }

    // the FORMER literal formulation, verbatim (one struct literal per
    // centroid inside array_max) — kept here as the probe's baseline
    def literalCell(vecCol: Column, cents: Seq[(Long, Seq[Double])]): Column =
      -array_max(array(cents.map { case (cid, cv) =>
        struct(graft.functions.VectorExprs.cosineSim(vecCol, typedlit(cv))
          .as("c"), lit(-cid).as("nc"))
      }: _*)).getField("nc").cast("long")

    def measure(tag: String, k: Int, cell: Column): Unit = {
      try {
        val t0 = System.nanoTime()
        val df = vecs.select(cell.as("cell"))
        val plan = df.queryExecution.executedPlan // forces analysis+planning
        val tPlan = (System.nanoTime() - t0) / 1e9
        val hasCodegen = plan.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
        val t1 = System.nanoTime()
        val sum = df.agg(org.apache.spark.sql.functions.sum(col("cell")))
          .head().getLong(0)
        val tExec = (System.nanoTime() - t1) / 1e9
        println(f"$tag%-8s k=$k%5d  plan=$tPlan%7.2fs  exec=$tExec%7.2fs  " +
          f"rows/s=${total / tExec}%9.0f  codegen=$hasCodegen  cellsum=$sum")
      } catch {
        case e: Throwable =>
          println(f"$tag%-8s k=$k%5d  FAILED: ${e.getClass.getSimpleName}: " +
            s"${String.valueOf(e.getMessage).take(120)}")
      }
    }

    val ks = Seq(8, 64, 256, 1024, 4096).filter(_ <= maxK)
    for (k <- ks) measure("literal", k, literalCell(col("v"), codebook(k)))
    for (k <- ks) measure("native", k,
      CentroidExprs.nearestCentroidId(col("v"), codebook(k)))
    spark.stop()
  }
}
