package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`Array[Float]`) — brute-force
 * cosine top-k as the exactness baseline, sign-LSH bucketing as the scale
 * path. First-class training-data-pipeline operators (builder brief).
 *
 * Scale design: cosine is a pure `zip_with`+`aggregate` expression
 * (codegen'd, no UDF, no collect); top-k plans as TakeOrderedAndProject
 * (per-partition k then merge — no global sort materialization); the LSH /
 * label blocking bounds pair generation for the all-pairs near-dup case.
 * At 1000-executor scale the bucketed variant shuffles each vector once on
 * a small bucket key instead of broadcasting the corpus.
 */
object Similarity {

  /** dot(a,b) as a fold — works for float or double array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a,b) ∈ [-1,1]; null-safe via non-zero norms upstream. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Brute-force top-k neighbors of one query vector: O(n·d) scan, ranked
   * by cosine desc with id tiebreak → TakeOrderedAndProject.
   */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v.toDouble)): _*)
    emb.select(col(idCol),
      round(cosine(col(vecCol), q), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * Sign-LSH bucket key: the sign pattern of `nBits` fixed components —
   * a deterministic, engine-portable random-hyperplane surrogate (axis-
   * aligned hyperplanes). 2^nBits buckets; vectors near in cosine tend to
   * share sign patterns on the leading components.
   */
  def signBucket(vec: Column, nBits: Int = 4): Column =
    array_join(
      transform(sequence(lit(1), lit(nBits)),
        i => when(element_at(vec, i) > 0, "1").otherwise("0")), "")

  /**
   * ANN top-k: search only the query's sign bucket (the IVF-style probe-1
   * scale path). Recall < 1 by construction; SimilaritySpec measures it
   * against the brute-force baseline.
   */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int, nBits: Int = 4): DataFrame = {
    val qBucket = query.take(nBits).map(v => if (v > 0) "1" else "0").mkString
    emb.filter(signBucket(col(vecCol), nBits) === qBucket)
      .select(col(idCol), round(cosine(col(vecCol), array(query.map(v => lit(v.toDouble)): _*)), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * IVF (inverted-file) cell assignment — the other scale path for ANN.
   * Centroids here are deterministic seed vectors (ids < k) so results are
   * reproducible and oracle-checkable; a production build would run a few
   * k-means iterations over a sample instead (same assignment plan). Each
   * vector joins the (broadcast, tiny) centroid table, and its cell is the
   * max-cosine centroid (ties → smaller centroid id). One narrow shuffle
   * for the window; at scale the cell becomes the partition key of the
   * stored index, so probing reads only the probed cells' partitions.
   */
  def ivfCells(emb: DataFrame, idCol: String, vecCol: String,
               k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = emb.filter(col(idCol) < k)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(cosine(col(vecCol), col("cv")).desc, col("cid"))
    emb.crossJoin(org.apache.spark.sql.functions.broadcast(c))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("cid").as("cell"))
  }

  /** IVF probe-1 top-k: search only the query vector's own cell. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryId: Long, topK: Int, k: Int = 8): DataFrame = {
    val cells = ivfCells(emb, idCol, vecCol, k)
    val withCell = emb.join(cells, Seq(idCol))
    val q = withCell.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qv"), col("cell").as("qcell"))
    withCell.crossJoin(org.apache.spark.sql.functions.broadcast(q))
      .filter(col("cell") === col("qcell") && col(idCol) =!= queryId)
      .select(col(idCol), round(cosine(col(vecCol), col("qv")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(topK)
  }

  /**
   * Embedding near-dup pairs: all pairs with cosine ≥ threshold, blocked
   * by (blockCol, sign bucket) so the self-join is bounded per block —
   * the embedding-cosine near-dup dedup operator.
   */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                   blockCol: String, threshold: Double,
                   nBits: Int = 2): DataFrame = {
    val withB = emb.withColumn("bucket", signBucket(col(vecCol), nBits))
    val l = withB.select(col(blockCol).as("blk"), col("bucket"),
      col(idCol).as("id1"), col(vecCol).as("v1"))
    val r = withB.select(col(blockCol).as("blk"), col("bucket"),
      col(idCol).as("id2"), col(vecCol).as("v2"))
    l.join(r, Seq("blk", "bucket"))
      .filter(col("id1") < col("id2"))
      .withColumn("cos_sim", round(cosine(col("v1"), col("v2")), 4))
      .filter(col("cos_sim") >= threshold)
      .select(col("id1"), col("id2"), col("cos_sim"))
  }
}
