package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/**
 * Pins the invariants that make the sf-sweep ratio table (BENCH.md §9)
 * meaningful: if ScaleUp's salting ever lets shingles, content hashes,
 * or band keys collide across copies, the dedup/pair queries measure the
 * harness instead of the plan.
 */
class ScaleUpSpec extends SparkSuite {
  import spark.implicits._

  private lazy val (srcDir, dstDir, factor) = {
    val src = "/root/testdata/sf0.001"
    val dst = tmpDir("scaleup")
    ScaleUp.run(spark, src, dst, factor = 3)
    (src, dst, 3)
  }
  private def dst(t: String) = spark.read.parquet(s"$dstDir/$t.parquet")
  private def srcT(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
  private val copyOf = (col("doc_id") / ScaleUp.KeyStride).cast("long")

  test("facts scale exactly factor x, dims pass through identically") {
    // run() itself requires exact fact scaling; spot-check one plus dims
    assert(dst("documents").count() === srcT("documents").count() * factor)
    val dim = dst("nation").orderBy("n_nationkey").collect().toSeq
    assert(dim === srcT("nation").orderBy("n_nationkey").collect().toSeq)
  }

  test("copy 0 is bit-identical to the source documents") {
    val a = srcT("documents").orderBy("doc_id").collect().toSeq
    val b = dst("documents").filter(copyOf === 0)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("no content hash collides across copies (exact-dup structure is per-copy)") {
    val cross = dst("documents")
      .filter(length(col("text")) > 0)
      .groupBy(md5(col("text")))
      .agg(countDistinct(copyOf).as("n_copies"))
      .filter(col("n_copies") > 1)
    assert(cross.count() === 0L)
  }

  test("no 3-shingle collides across copies (minhash/band candidates are per-copy)") {
    val cross = dst("documents")
      .select(copyOf.as("copy"),
        explode(Dedup.shingleArray(col("text"), 3)).as("sh"))
      .groupBy(col("sh")).agg(countDistinct(col("copy")).as("n_copies"))
      .filter(col("n_copies") > 1)
    assert(cross.count() === 0L)
  }

  test("dedup candidate volume scales linearly: copy 0 groups == source " +
    "groups, every salted copy within a small constant of the source") {
    // Salting shifts WITHIN-copy collision structure two ways, both
    // deterministic and bounded: a salt-containing shingle like
    // "copysalt1 merge a" is shared by any two docs with the same 2-word
    // group at a boundary (inflation), and the salt token's string
    // differs per copy so its shingle HASHES — hence minhash band
    // collisions — vary copy to copy (measured ~1.9x the source's 84
    // groups at sf0.001). Cross-copy isolation is pinned by the shingle
    // test above; this test bounds each copy's candidate volume at a
    // small constant of the source's, so total volume is LINEAR in N —
    // an N^2 regression (cross-copy collisions) would blow the bound and
    // the shingle test both.
    def bandGroups(df: org.apache.spark.sql.DataFrame) =
      Dedup.bucketsFromSignatures(
        Dedup.minhashSignatures(df, "doc_id", "text", 3), "doc_id")
    val perCopy = bandGroups(dst("documents"))
      .withColumn("copy", (col("doc_id") / ScaleUp.KeyStride).cast("long"))
      .groupBy("copy", "band", "band_key").count().filter(col("count") > 1)
      .groupBy("copy").count().orderBy("copy")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(perCopy.map(_._1) === (0L until factor.toLong))
    val srcGroups = bandGroups(srcT("documents"))
      .groupBy("band", "band_key").count().filter(col("count") > 1).count()
    assert(perCopy.head._2 === srcGroups)
    perCopy.tail.foreach { case (k, n) =>
      assert(n <= 4 * srcGroups, s"copy $k has $n band groups (src $srcGroups)")
    }
  }

  test("fact-to-fact join structure is preserved: lineitem x orders scales exactly") {
    val s = srcT("lineitem").join(srcT("orders"),
      col("l_orderkey") === col("o_orderkey")).count()
    val d = dst("lineitem").join(dst("orders"),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(d === s * factor)
  }
}
