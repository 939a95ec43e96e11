package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for large-scale training-data pipelines —
 * exact, MinHash+LSH, SimHash, and n-gram Jaccard. Beyond the reference's
 * own surface (it has no dedup); first-class per the builder brief.
 *
 * Design for 100 TB:
 *  - every signature is computed with pure expressions (codegen'd, no UDF);
 *  - candidate generation is always BLOCKED (LSH band buckets / source
 *    partitions) so the self-join never goes quadratic in the corpus —
 *    the shuffle key is the bucket, and bucket sizes are bounded;
 *  - hashes are md5 hex strings (not JVM hashCode) so results are
 *    engine-portable and oracle-checkable in DuckDB.
 */
object Dedup {

  /** Distinct word tokens of a text column (case-folded, \W+ split). */
  def tokensOf(text: Column): Column =
    array_distinct(filter(split(lower(text), "\\W+"), t => t =!= ""))

  /**
   * Exact dedup: group by content hash, keep the smallest id as canonical.
   * Scale: one hash-shuffle on a 32-char key; map-side partial agg.
   */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_count"))

  /**
   * MinHash signature: k independent permutations simulated by salting the
   * token with the hash index — minhash_i = min over tokens of
   * md5(token || ':' || i). Lexicographic min over hex strings is
   * order-independent, so the whole signature is a narrow projection.
   */
  def minhashSignature(text: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(tokensOf(text),
        t => md5(concat(t, lit(":"), i.cast("string"))))))

  /**
   * MinHash + LSH banding: signature of k hashes split into `bands` bands
   * of k/bands rows each; docs sharing any band key are candidate pairs.
   * Returns (band, band_key, id) — the bucket table; joining it with
   * itself on (band, band_key) yields candidates with bounded bucket
   * sizes (the LSH guarantee), never an all-pairs product.
   */
  def minhashBuckets(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, bands: Int = 4): DataFrame = {
    val rows = k / bands
    docs
      .withColumn("sig", minhashSignature(col(textCol), k))
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => md5(concat_ws("|", slice(col("sig"), b * rows + 1, lit(rows)))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
      .select(col("band"), col("band_key"), col(idCol))
  }

  /** Candidate near-dup pairs from LSH buckets (id1 < id2, distinct). */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 8, bands: Int = 4): DataFrame = {
    val b = minhashBuckets(docs, idCol, textCol, k, bands)
    val l = b.withColumnRenamed(idCol, "id1")
    val r = b.withColumnRenamed(idCol, "id2")
    l.join(r, Seq("band", "band_key"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /**
   * SimHash (16-bit): bit j is 1 iff strictly more than half of the
   * distinct tokens have an odd hex digit at position j of md5(token).
   * Portable: no bit arithmetic, just hex-char parity — identical in SQL.
   */
  def simhash(text: Column, bits: Int = 16): Column = {
    val odd: Seq[Any] = Seq("1", "3", "5", "7", "9", "b", "d", "f")
    val toks = tokensOf(text)
    array_join(
      transform(sequence(lit(1), lit(bits)), j =>
        when(size(filter(toks,
          t => md5(t).substr(j, lit(1)).isin(odd: _*))) * 2 > size(toks),
          "1").otherwise("0")), "")
  }

  /** Hamming distance between two equal-length bit strings. */
  def hamming(a: Column, b: Column): Column =
    size(filter(zip_with(split(a, ""), split(b, ""), (x, y) => x =!= y),
      d => d))

  /**
   * Word n-gram shingles as a relational table (id, shingle) — built with
   * posexplode + lead() so the exact same formulation runs in DuckDB.
   */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(idCol),
      posexplode(filter(split(lower(col(textCol)), "\\W+"), t => t =!= "")))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "tok")
    val w = Window.partitionBy(col(idCol)).orderBy(col("p"))
    val grams = (1 until n).foldLeft(tok.withColumn("g", col("tok"))) {
      case (df, i) => df.withColumn("g",
        concat_ws(" ", col("g"), lead(col("tok"), i).over(w)))
    }
    grams.filter(size(split(col("g"), " ")) === n)
      .select(col(idCol), col("g").as("shingle")).distinct()
  }

  /**
   * N-gram Jaccard near-dup pairs, blocked by a grouping column (e.g.
   * source) so candidate generation is bounded per block:
   * J(a,b) = |A∩B| / (|A|+|B|−|A∩B|) ≥ threshold.
   */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockCol: String, n: Int = 3,
                        threshold: Double = 0.8): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
      .join(docs.select(col(idCol), col(blockCol)), Seq(idCol))
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val l = sh.select(col(blockCol).as("blk"), col(idCol).as("id1"), col("shingle"))
    val r = sh.select(col(blockCol).as("blk"), col(idCol).as("id2"), col("shingle"))
    l.join(r, Seq("blk", "shingle"))
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.select(col(idCol).as("id1"), col("sz").as("sz1")), Seq("id1"))
      .join(sizes.select(col(idCol).as("id2"), col("sz").as("sz2")), Seq("id2"))
      .withColumn("jaccard",
        round(col("shared") / (col("sz1") + col("sz2") - col("shared")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }
}
