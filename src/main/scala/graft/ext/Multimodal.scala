package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §7.4): media as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The container ships no image/audio codecs, so [[decodeStub]] is a
  * clearly-marked deterministic FAKE decode; everything around it — the
  * schema, the `Dataset[MediaRow]` encoder, the `mapPartitions` batch shape,
  * and the partitioning story — is the real Spark plumbing a codec would
  * drop into. At 100 TB the binary payloads stay distributed (never
  * collected), decode is embarrassingly parallel per partition, and the
  * output is a narrow typed frame.
  */
object Multimodal {

  /** One media item: id + raw bytes + declared format. */
  case class MediaRow(doc_id: Long, bytes: Array[Byte], format: String)

  /** Decoded metadata/features for one media item. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long,
                       channels: Long, format: String)

  /** STUB decode — deterministic fake standing in for a real codec
    * (e.g. javax.imageio / ffmpeg). Derives "dimensions" from the byte
    * length so tests are reproducible. A real implementation replaces ONLY
    * this function; the distributed plumbing is unchanged.
    */
  def decodeStub(r: MediaRow): MediaMeta = {
    val n = r.bytes.length.toLong
    MediaMeta(r.doc_id, n, n % 64 + 1, (n / 64) % 64 + 1, 3L, r.format)
  }

  /** Attach a binary column built from `documents.text` (fixture stand-in
    * for real media bytes) and decode per-partition.
    */
  def decodeDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    documents
      .select(col("doc_id"), col("text").cast("binary").as("bytes"), lit("txt").as("format"))
      .as[MediaRow]
      .mapPartitions(_.map(decodeStub)) // batch-shaped: one iterator pass per partition
  }
}
