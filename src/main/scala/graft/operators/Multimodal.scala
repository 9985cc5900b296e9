package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column surface: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / frame-sample
  * plumbing (builder mandate).
  *
  * The container has no image/audio codecs and the driver tables carry no
  * media, so the BYTES are stood in for by the documents' own text encoded
  * as binary, and the real codec call is STUBBED (see [[decodeStub]]) behind
  * a deterministic fake. Everything around the stub — schema (binary +
  * metadata struct), per-partition batch shape, fixed-width feature output,
  * partition-parallel execution with zero driver involvement — is the real
  * 100 TB design: a decode UDF over `mapPartitions` streams batches through
  * executors exactly like an image pipeline would, and the feature columns
  * come back as ordinary columns for downstream relational ops.
  */
object Multimodal {

  case class BlobRow(doc_id: Long, payload: Array[Byte], byte_len: Long, mime: String)
  case class FeatureRow(doc_id: Long, byte_len: Long, n_frames: Long,
      frame_checksum: Long, mean_byte: Double)

  /** Attach the opaque payload + typed metadata. In production this is the
    * parquet/lance binary column; here it is text-as-bytes (UTF-8 = the raw
    * payload truth for this corpus).
    */
  def withBlob(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      length(col("text")).cast("long").as("byte_len"),
      lit("text/plain").as("mime"))

  /** THE STUB: a real pipeline would call the image/audio codec here
    * (e.g. JPEG decode → pixel tensor). Deterministic fake: identity on
    * bytes. Marked loudly so nobody mistakes it for a codec.
    */
  private def decodeStub(payload: Array[Byte]): Array[Byte] = {
    // ??? <- real codec goes here (libjpeg/ffmpeg); container has none.
    payload
  }

  /** Per-partition batch "decode + featurize + frame-sample": every
    * `frameStep`-th byte is a sampled frame; features are exact integer /
    * rational stats so the pipeline stays oracle-checkable. Runs as
    * mapPartitions over the typed Dataset — executor-parallel, no shuffle,
    * no driver collection; scales with input bytes.
    */
  def extractFeatures(spark: SparkSession, dir: String, frameStep: Int = 16): Dataset[FeatureRow] = {
    import spark.implicits._
    withBlob(Tables.documents(spark, dir)).as[BlobRow].mapPartitions { rows =>
      rows.map { r =>
        val decoded = decodeStub(r.payload)
        val codes = decoded.map(b => (b & 0xff).toLong)
        val frames = codes.indices.collect { case i if i % frameStep == 0 => codes(i) }
        FeatureRow(
          doc_id = r.doc_id,
          byte_len = codes.length.toLong,
          n_frames = frames.length.toLong,
          frame_checksum = frames.sum % 2147483647L,
          // double division + HALF_UP round == Spark's round(double, 6),
          // keeping the value bit-aligned with the SQL oracle's round()
          mean_byte = BigDecimal.valueOf(codes.sum.toDouble / codes.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
  }

  /** The queries() entry: features joined back to doc metadata — the shape a
    * training pipeline feeds to a filter/sampler stage.
    */
  def features(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, dir).toDF()

  case class FrameRow(doc_id: Long, frame_idx: Long, byte_off: Long, frame_byte: Long)

  /** Frame SAMPLING — the one-to-many decode shape (video → frames, audio →
    * windows): each blob expands to one row per sampled frame via the same
    * per-partition batch plumbing as [[extractFeatures]], with the codec
    * stubbed ([[decodeStub]]) and the frame payload stood in by the sampled
    * byte. Executor-parallel flatMap, no shuffle; output row count is
    * Σ⌈bytes/frameStep⌉ — the explosion a real frame extractor produces.
    */
  def sampleFrames(spark: SparkSession, dir: String, frameStep: Int = 16): Dataset[FrameRow] = {
    import spark.implicits._
    withBlob(Tables.documents(spark, dir)).as[BlobRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val decoded = decodeStub(r.payload)
        Iterator.range(0, decoded.length, frameStep).zipWithIndex.map { case (off, idx) =>
          FrameRow(r.doc_id, idx.toLong, off.toLong, (decoded(off) & 0xff).toLong)
        }
      }
    }
  }

  def frames(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(spark, dir).toDF()

  case class ResizeRow(doc_id: Long, orig_len: Long, resized_len: Long,
      resized_checksum: Long, first_byte: Long, last_byte: Long)

  /** RESIZE — the many-bytes-to-fewer-bytes transform (image resize, audio
    * downsample): every `stride`-th byte of the decoded payload survives
    * into the resized blob, through the same per-partition batch plumbing
    * (codec stubbed, [[decodeStub]]). A real resizer interpolates pixels;
    * the stand-in keeps the SHAPE — output bytes ≈ input/stride, computed
    * executor-side with no shuffle — while staying integer-exact for the
    * oracle. Output summarizes the resized blob (len, checksum, first/last
    * byte) rather than shipping bytes to the driver.
    */
  def resizeBlobs(spark: SparkSession, dir: String, stride: Int = 4): Dataset[ResizeRow] = {
    import spark.implicits._
    require(stride >= 1, s"stride must be >= 1, got $stride")
    withBlob(Tables.documents(spark, dir)).as[BlobRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val decoded = decodeStub(r.payload)
        if (decoded.isEmpty) Iterator.empty
        else {
          val resized = Iterator.range(0, decoded.length, stride)
            .map(i => (decoded(i) & 0xff).toLong).toArray
          Iterator.single(ResizeRow(
            doc_id = r.doc_id,
            orig_len = decoded.length.toLong,
            resized_len = resized.length.toLong,
            resized_checksum = resized.sum % 2147483647L,
            first_byte = resized.head,
            last_byte = resized.last))
        }
      }
    }
  }

  def resized(spark: SparkSession, dir: String): DataFrame =
    resizeBlobs(spark, dir).toDF()
}
