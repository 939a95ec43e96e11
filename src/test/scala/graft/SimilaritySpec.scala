package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Similarity, TextAnalysis}

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private val dim = 8
  /** deterministic pseudo-random unit-ish vectors */
  private def vec(seed: Int): Array[Double] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)(r.nextGaussian())
  }
  private lazy val base = (1 to 200).map(i => (i.toLong, vec(i)))
  private lazy val emb = base.toDF("vec_id", "v")

  test("cosine expression matches scala reference") {
    val got = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
      .select(Similarity.cosine($"a", $"b")).as[Double].collect()(0)
    val exp = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got - exp) < 1e-12)
  }

  test("brute-force top-k returns true nearest neighbors") {
    val q = vec(1) // identical to vec_id 1 -> cos 1.0 at rank 1
    val top = Similarity.bruteForceTopK(emb, "vec_id", "v", q.map(_.toFloat), 5)
      .as[(Long, Double)].collect()
    assert(top(0)._1 == 1L && top(0)._2 == 1.0)
    // verify ranking against driver-side exact computation
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map(p => p._1 * p._2).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val exact = base.map { case (id, v) => (id, BigDecimal(cos(vec(1), v)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy(p => (-p._2, p._1)).take(5).map(_._1)
    assert(top.map(_._1).toSeq == exact.toSeq)
  }

  test("LSH bucket search: query's own bucket found, recall vs brute force measured") {
    val q = vec(7).map(_.toFloat)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "v", q, 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val lsh = Similarity.lshTopK(emb, "vec_id", "v", q, 10, nBits = 2)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(lsh.contains(7L), "query vector itself lives in its own bucket")
    val recall = (brute & lsh).size.toDouble / 10
    assert(recall >= 0.2, s"probe-1 recall unreasonably low: $recall")
    // every LSH result must share the query's sign bucket
    val qb = q.take(2).map(x => if (x > 0) "1" else "0").mkString
    val buckets = emb.filter($"vec_id".isin(lsh.toSeq: _*))
      .select(Similarity.signBucket($"v", 2)).as[String].collect()
    assert(buckets.forall(_ == qb))
  }

  test("IVF k-means: deterministic centroids, cells partition the corpus, multi-probe lifts recall") {
    val e = emb.withColumnRenamed("v", "vec")
    // k-means is deterministic: two runs produce identical centroids
    val c1 = Similarity.kmeansCentroids(e, "vec_id", "vec", k = 8, iters = 2, sampleN = 64)
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val c2 = Similarity.kmeansCentroids(e, "vec_id", "vec", k = 8, iters = 2, sampleN = 64)
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    assert(c1.map(_._1).toSeq == c2.map(_._1).toSeq)
    c1.zip(c2).foreach { case ((_, a), (_, b)) => assert(a.toSeq == b.toSeq) }
    // centroids moved off their seeds (Lloyd actually iterated)
    val seeds = emb.filter($"vec_id" < 8).as[(Long, Array[Double])].collect().toMap
    assert(c1.exists { case (cid, cv) => seeds.get(cid).exists(_.toSeq != cv.toSeq) })

    val cells = Similarity.ivfCells(e, "vec_id", "vec", k = 8, iters = 2, sampleN = 64)
    assert(cells.count() == 200, "every vector gets exactly one cell")
    assert(cells.select("vec_id").distinct().count() == 200)
    assert(cells.select("cell").distinct().count() <= 8)

    // multi-probe recall >= probe-1 recall, measured vs brute force
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "v", vec(7).map(_.toFloat), 11)
      .as[(Long, Double)].collect().map(_._1).filter(_ != 7L).take(10).toSet
    def probeIds(nprobe: Int) =
      Similarity.ivfTopK(e, "vec_id", "vec", queryId = 7L, topK = 10, k = 8,
        nprobe = nprobe, iters = 2, sampleN = 64)
        .as[(Long, Double)].collect().map(_._1).toSet
    val r1 = (brute & probeIds(1)).size
    val r2 = (brute & probeIds(2)).size
    assert(r2 >= r1, s"nprobe=2 recall $r2 < probe-1 recall $r1")
    assert(r2 >= 3, s"nprobe=2 recall unreasonably low: $r2/10")

    // probe-2 results all come from the two cells nearest the query
    val top = Similarity.ivfTopK(e, "vec_id", "vec", queryId = 7L, topK = 10, k = 8,
      nprobe = 2, iters = 2, sampleN = 64).as[(Long, Double)].collect()
    assert(top.map(_._2).toSeq == top.map(_._2).sorted.reverse.toSeq)
  }

  test("IVF stored index: cell partitions prune, results match the in-memory probe") {
    val e = emb.withColumnRenamed("v", "vec")
    val path = tmpDir("ivf-idx")
    Similarity.writeIvfIndex(e, "vec_id", "vec", path, k = 8, iters = 2, sampleN = 64)
    val qv = emb.filter($"vec_id" === 7L).as[(Long, Array[Double])].collect()(0)._2
    val fromIndex = Similarity.ivfIndexTopK(spark, path, "vec_id", "vec",
      qv.toSeq, topK = 11, nprobe = 2)
    // the scan reads ONLY the probed cells' partition directories
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"cell predicate must prune partitions:\n$plan")
    val idxIds = fromIndex.as[(Long, Double)].collect()
      .map(_._1).filter(_ != 7L).take(10).toSeq
    val memIds = Similarity.ivfTopK(e, "vec_id", "vec", queryId = 7L,
      topK = 10, k = 8, nprobe = 2, iters = 2, sampleN = 64)
      .as[(Long, Double)].collect().map(_._1).toSeq
    assert(idxIds == memIds, s"stored-index probe diverged: $idxIds vs $memIds")
  }

  test("multimodal: decode plumbing is partition-preserving with typed output") {
    val media = Multimodal.fromBinary(spark,
      Seq((1L, "img-bytes-aaaa"), (2L, "vid-bytes-bbbb"), (3L, "vid-bytes-cccc"))
        .toDF("id", "payload")
        .withColumn("payload", $"payload".cast("binary")),
      "id", "payload", "video")
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.rdd.getNumPartitions == media.rdd.getNumPartitions, "no shuffle")
    val rows = feats.collect().sortBy(_.id)
    assert(rows.length == 3)
    assert(rows.forall(r => r.byteLen == 14 && r.width >= 160 && r.frameCount > 0))
    // deterministic: same bytes -> same fake metadata
    val again = Multimodal.decodeFeatures(media).collect().sortBy(_.id)
    assert(rows.map(_.contentHash).toSeq == again.map(_.contentHash).toSeq)
    // frame sampling explodes stride-spaced indices
    val sampled = Multimodal.sampleFrames(feats.toDF(), stride = 100)
    val perDoc = sampled.groupBy("id").count().as[(String, Long)].collect().toMap
    assert(perDoc.keySet == Set("1", "2", "3"))
    rows.foreach { r =>
      assert(perDoc(r.id) == (r.frameCount + 99) / 100)
    }
  }

  test("binary metadata: length + hashes without decode") {
    val df = Seq((1L, "hello")).toDF("id", "t")
      .withColumn("b", $"t".cast("binary"))
    val m = Multimodal.binaryMeta(df, "id", "b").collect()(0)
    assert(m.getAs[Int]("byte_len") == 5)
    assert(m.getAs[String]("sha256") ==
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
  }

  test("text analysis: langId, token counts, quality bounds") {
    val d = Seq(
      (1L, "the cat sat on the mat and the dog"),
      (2L, "der hund und die katze nicht hier"),
      (3L, "xyzzy plugh qwerty"),
      (4L, "")).toDF("doc_id", "text")
    val got = d.select($"doc_id", TextAnalysis.langId($"text").as("l"),
      TextAnalysis.tokenCount($"text").as("n"),
      TextAnalysis.qualityScore($"text").as("q"))
      .as[(Long, String, Int, Double)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq("en", "de", "und", "und"))
    assert(got.map(_._3).toSeq == Seq(9, 7, 3, 0))
    assert(got.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    assert(got(3)._4 == 0.0)
    val bpe = Seq(("a-b, c!")).toDF("t")
      .select(TextAnalysis.bpeishTokenCount($"t")).as[Int].collect()(0)
    assert(bpe == 6) // a - b , c !
  }
}
