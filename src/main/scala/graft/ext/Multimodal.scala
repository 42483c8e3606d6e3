package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §7.4): media as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The container ships no image/audio codecs, so the codec layer
  * ([[decodeStub]], [[extractFeaturesStub]]) is a clearly-marked
  * deterministic FAKE; everything around it — the schemas, the
  * `Dataset[T]` encoders, the `mapPartitions` batch shape, resize/
  * frame-sample operating on decoded structs, and the partitioning story —
  * is the real Spark plumbing a codec drops into. At 100 TB the binary
  * payloads stay distributed (never collected), every stage is
  * embarrassingly parallel per partition, and outputs are narrow typed
  * frames.
  */
object Multimodal {

  /** One media item: id + raw bytes + declared format. */
  case class MediaRow(doc_id: Long, bytes: Array[Byte], format: String)

  /** Decoded metadata/features for one media item. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long,
                       channels: Long, format: String)

  /** Fixed-size embedding-ish feature vector per media item. */
  case class MediaFeatures(doc_id: Long, features: Array[Double])

  /** One sampled "frame" of a media item. */
  case class MediaFrame(doc_id: Long, frame_idx: Int, n_bytes: Long, checksum: Long)

  /** STUB decode — deterministic fake standing in for a real codec
    * (e.g. javax.imageio / ffmpeg). Derives "dimensions" from the byte
    * length so tests are reproducible. A real implementation replaces ONLY
    * this function; the distributed plumbing is unchanged.
    */
  def decodeStub(r: MediaRow): MediaMeta = {
    val n = r.bytes.length.toLong
    MediaMeta(r.doc_id, n, n % 64 + 1, (n / 64) % 64 + 1, 3L, r.format)
  }

  /** STUB feature extraction — a 16-bin byte histogram, normalized.
    * (A real implementation would run a vision/audio model per batch; the
    * batched `mapPartitions` shape below is exactly where model state gets
    * initialized once per partition, not once per row.)
    */
  def extractFeaturesStub(r: MediaRow): MediaFeatures = {
    val hist = new Array[Double](16)
    r.bytes.foreach(b => hist((b & 0xFF) / 16) += 1.0)
    val n = math.max(r.bytes.length, 1).toDouble
    MediaFeatures(r.doc_id, hist.map(_ / n))
  }

  /** "Resize": recompute target dims preserving the stub aspect ratio —
    * pure column arithmetic over decoded metadata (no re-decode).
    */
  def resize(meta: DataFrame, maxSide: Long): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(col("width"), col("height")).cast("double"))
    meta.withColumn("resized_width", greatest(floor(col("width") * scale), lit(1L)))
      .withColumn("resized_height", greatest(floor(col("height") * scale), lit(1L)))
  }

  /** Frame sampling: split each payload into `frames` contiguous chunks and
    * emit one row per sampled chunk with a checksum — the video-frame
    * analogue (seek + decode per frame) with the byte-slicing stubbed.
    */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow], frames: Int): Dataset[MediaFrame] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap { r =>
      val n = r.bytes.length
      val step = math.max(n / frames, 1)
      (0 until math.min(frames, n)).iterator.map { i =>
        val chunk = r.bytes.slice(i * step, math.min((i + 1) * step, n))
        MediaFrame(r.doc_id, i, chunk.length.toLong,
          chunk.foldLeft(1125899906842597L)((h, b) => 31 * h + b))
      }
    })
  }

  /** Fixture `documents.text` as the binary payload stand-in. */
  def asMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents
      .select(col("doc_id"), col("text").cast("binary").as("bytes"), lit("txt").as("format"))
      .as[MediaRow]
  }

  /** Attach a binary column built from `documents.text` (fixture stand-in
    * for real media bytes) and decode per-partition.
    */
  def decodeDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    asMedia(spark, documents)
      .mapPartitions(_.map(decodeStub)) // batch-shaped: one iterator pass per partition
  }

  /** Decode -> feature-extract per partition (one model init per partition
    * in a real implementation).
    */
  def featurizeDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    asMedia(spark, documents).mapPartitions(_.map(extractFeaturesStub))
  }
}
