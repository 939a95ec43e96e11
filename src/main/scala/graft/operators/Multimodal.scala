package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  // ---- genuine container-header decoding (no codec library needed) -------
  //
  // Image DIMENSIONS don't need a decoder: they sit at fixed (PNG) or
  // scannable (JPEG) offsets in the container header. These are pure
  // codegen'd expressions over the BinaryType column — `substring` slices
  // bytes, `hex`+`conv` reads big-endian integers — so dimension extraction
  // runs inside the parquet scan at full width, no mapPartitions seam.
  // PNG layout: 8-byte magic 89 50 4E 47 0D 0A 1A 0A, then the IHDR chunk
  // (4-byte length, 4-byte type "IHDR", 4-byte BE width, 4-byte BE height).
  // JPEG (the documented harder case) interleaves variable-length segments
  // before SOF0/SOF2 — a marker SCAN, not a fixed offset; see JpegDims in
  // graft.functions (custom codegen Expression) for that one.

  private val PngMagicHex = "89504E470D0A1A0A"

  /** Big-endian unsigned int from `nBytes` at 1-based byte offset `off`. */
  def beUint(bin: Column, off: Int, nBytes: Int): Column =
    conv(hex(substring(bin, off, nBytes)), 16, 10).cast("long")

  /** True iff the blob starts with the 8-byte PNG signature. */
  def pngIsValid(bin: Column): Column =
    length(bin) >= 24 && hex(substring(bin, 1, 8)) === lit(PngMagicHex)

  /** PNG width from the IHDR chunk (bytes 17-20, big-endian); null if not PNG. */
  def pngWidth(bin: Column): Column =
    when(pngIsValid(bin), beUint(bin, 17, 4))

  /** PNG height from the IHDR chunk (bytes 21-24, big-endian); null if not PNG. */
  def pngHeight(bin: Column): Column =
    when(pngIsValid(bin), beUint(bin, 21, 4))

  // ---- WAV/RIFF audio headers --------------------------------------------
  // Canonical 44-byte PCM WAV header: "RIFF" + size(LE4) + "WAVE" +
  // "fmt " + 16(LE4) + format(LE2) + channels(LE2) + sampleRate(LE4) +
  // byteRate(LE4) + blockAlign(LE2) + bitsPerSample(LE2) + "data" +
  // dataSize(LE4). All multi-byte fields LITTLE-endian — the parse
  // reassembles bytes in reverse before the hex→int conversion. Like the
  // PNG path, pure codegen'd expressions inside the scan.

  /** Little-endian unsigned int from `nBytes` at 1-based byte offset. */
  def leUint(bin: Column, off: Int, nBytes: Int): Column =
    conv(concat(((nBytes - 1) to 0 by -1)
      .map(i => hex(substring(bin, off + i, 1))): _*), 16, 10).cast("long")

  /** True iff the blob is a CANONICAL 44-byte-header PCM WAV: RIFF/WAVE/
    * "fmt " magic AND the "data" chunk tag at byte 37 — the field offsets
    * below assume exactly this layout, so a RIFF with an interposed LIST/
    * fact chunk (common from real encoders) must read invalid rather than
    * return other chunks' bytes as lengths. */
  def wavIsValid(bin: Column): Column =
    length(bin) >= 44 && hex(substring(bin, 1, 4)) === lit("52494646") &&
      hex(substring(bin, 9, 8)) === lit("57415645666D7420") &&
      hex(substring(bin, 37, 4)) === lit("64617461")

  def wavChannels(bin: Column): Column = when(wavIsValid(bin), leUint(bin, 23, 2))
  def wavSampleRate(bin: Column): Column = when(wavIsValid(bin), leUint(bin, 25, 4))
  def wavByteRate(bin: Column): Column = when(wavIsValid(bin), leUint(bin, 29, 4))
  def wavBitsPerSample(bin: Column): Column = when(wavIsValid(bin), leUint(bin, 35, 2))
  def wavDataSize(bin: Column): Column = when(wavIsValid(bin), leUint(bin, 41, 4))

  /** Clip duration in whole milliseconds: dataSize·1000 / byteRate
    * (values ≤ 2⁵³ — the double floor is exact). */
  def wavDurationMs(bin: Column): Column =
    when(wavIsValid(bin) && wavByteRate(bin) > 0,
      floor(wavDataSize(bin) * lit(1000.0) / wavByteRate(bin)).cast("long"))

  /** Build a MediaRow dataset from any binary column (helper). */
  def fromBinary(spark: SparkSession, df: DataFrame, idCol: String,
                 binCol: String, kind: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("string").as("id"), lit(kind).as("kind"),
      col(binCol).as("media")).as[MediaRow]
  }
}
