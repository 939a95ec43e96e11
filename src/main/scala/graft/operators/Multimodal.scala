package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column handling — image/audio/video as opaque `binary`
 * columns with typed metadata (builder brief).
 *
 * The Spark-side plumbing is REAL and tested: schema, partition-preserving
 * batch iteration, typed output. The codec itself is STUBBED with a
 * deterministic fake (`fakeDecode`) because no image/audio libraries ship
 * in this container — swapping in a real decoder changes only that one
 * function.
 *
 * Batch shape: `mapPartitions` over a typed Dataset is the Scala analog of
 * `mapInPandas` — one iterator per partition, rows streamed (never
 * materialized per-partition), arbitrary per-batch native calls allowed.
 * At 100 TB the binary column dominates I/O: keep it in its own parquet
 * column (columnar pruning skips it unless projected) and size
 * `maxPartitionBytes` so a partition of blobs fits executor memory.
 */
object Multimodal {

  final case class MediaRow(id: String, kind: String, media: Array[Byte])

  final case class MediaFeatures(
      id: String,
      kind: String,
      byteLen: Long,
      contentHash: String,
      width: Int,          // stubbed decode
      height: Int,         // stubbed decode
      durationMs: Long,    // stubbed decode (audio/video)
      frameCount: Int)     // stubbed decode (video)

  /**
   * STUB — deterministic fake decoder. A real implementation would hand
   * `bytes` to an image/audio codec here; the fake derives stable pseudo-
   * metadata from a content hash so tests are reproducible.
   */
  def fakeDecode(id: String, kind: String, bytes: Array[Byte]): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val hex = md.map("%02x".format(_)).mkString
    def u(i: Int): Int = java.lang.Integer.parseInt(hex.substring(i, i + 4), 16)
    MediaFeatures(
      id = id, kind = kind,
      byteLen = bytes.length.toLong,
      contentHash = hex,
      width = 160 + u(0) % 1760,
      height = 120 + u(4) % 960,
      durationMs = if (kind == "image") 0L else 1000L + u(8).toLong * 10,
      frameCount = if (kind == "video") 1 + u(12) % 7200 else if (kind == "image") 1 else 0)
  }

  /**
   * Decode / feature-extract over binary media columns. Partition-
   * preserving (no shuffle); the decoder runs once per row inside the
   * partition iterator — the mapInPandas-shaped seam.
   */
  def decodeFeatures(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.map(r => fakeDecode(r.id, r.kind, r.media)))
  }

  /**
   * Frame sampling plumbing: every `stride`-th frame index up to
   * frameCount, exploded to one row per sampled frame — the downstream
   * shape a video pipeline feeds to per-frame feature extraction.
   */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features.filter(col("kind") === "video")
      .select(col("id"),
        explode(sequence(lit(0), col("frameCount") - 1, lit(stride)))
          .as("frame_idx"))

  /** Pure-SQL metadata over binary columns (no decode): length + hashes. */
  def binaryMeta(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol),
      length(col(binCol)).as("byte_len"),
      sha2(col(binCol), 256).as("sha256"),
      crc32(col(binCol)).as("crc"))

  /** Build a MediaRow dataset from any binary column (helper). */
  def fromBinary(spark: SparkSession, df: DataFrame, idCol: String,
                 binCol: String, kind: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("string").as("id"), lit(kind).as("kind"),
      col(binCol).as("media")).as[MediaRow]
  }
}
