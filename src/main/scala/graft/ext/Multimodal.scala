package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (BASELINE.json north star): image/audio/video
  * as opaque BINARY columns with typed metadata, batch-shaped decode /
  * feature-extract kernels.
  *
  * The actual media decode is STUBBED with a deterministic fake — the
  * image/audio codecs are not in this container — but the Spark-side
  * contract is real and tested: schema (binary payload + metadata struct),
  * partition-preserving batch iteration (mapPartitions over the typed
  * Dataset — the JVM analog of mapInPandas: one iterator per batch, no
  * per-row function-call overhead), and a binaryFile-compatible layout.
  *
  * At 100 TB: payloads stay in their column (parquet keeps them out of the
  * scan unless projected), metadata-only queries never touch bytes, and
  * decode stages size partitions by `spark.sql.files.maxPartitionBytes`
  * so a batch of payloads fits executor memory.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class DecodedRow(media_id: Long, kind: String, n_bytes: Int,
                        width: Int, height: Int, checksum: Long)

  /** Deterministic fake decode: dimensions and checksum derived from the
    * payload bytes alone. ??? in a real deployment this calls the codec
    * (e.g. libjpeg via JNI or an image I/O library) — the fake keeps the
    * pipeline testable offline with the same batch shape. */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Long) = {
    var h = 0L
    var i = 0
    while (i < payload.length) { h = (h * 31 + (payload(i) & 0xff)) % 1000003L; i += 1 }
    val width = 64 + (h % 577).toInt
    val height = 64 + ((h * 7) % 419).toInt
    (width, height, h)
  }

  /** Decode stage: batch-iterating kernel over the typed Dataset.
    * Partition-preserving (no shuffle); one iterator pass per partition. */
  def decodeStage(spark: SparkSession, media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val (w, h, c) = fakeDecode(m.payload)
        DecodedRow(m.media_id, m.kind, m.payload.length, w, h, c)
      }
    }
  }

  /** Frame/segment sampling: every k-th fixed-size window of the payload —
    * pure column expressions (no decode needed for byte-range sampling). */
  def sampleSegments(media: DataFrame, segmentBytes: Int, everyK: Int): DataFrame =
    media.select(col("media_id"), col("kind"),
      transform(
        sequence(lit(0), greatest((length(col("payload")) / segmentBytes).cast("int") - 1, lit(0)), lit(everyK)),
        i => substring(col("payload"), (i * segmentBytes + 1).cast("int"), lit(segmentBytes)))
        .as("segments"))

  /** Build a media table from the documents fixture (text bytes as the
    * opaque payload — deterministic, codec-free). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        (when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video")).as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }
}
