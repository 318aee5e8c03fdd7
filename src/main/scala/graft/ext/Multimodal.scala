package graft.ext

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (BASELINE.json north star): image/audio/video
  * as opaque BINARY columns with typed metadata, batch-shaped decode /
  * feature-extract kernels.
  *
  * Decode is REAL for the container formats the JDK ships codecs for —
  * PNG / JPEG / GIF / BMP via javax.imageio and WAV via
  * javax.sound.sampled, both pure-JVM, headless-safe — and falls back to
  * a deterministic payload-derived fake for opaque payloads (so the
  * pipeline, and the q42 oracle over text-byte payloads, stay
  * reproducible with no codec installed for that format). Video remains
  * byte-range sampling only (no JDK video codec): frame extraction is the
  * one genuinely stubbed step.
  *
  * The Spark-side contract: schema (binary payload + metadata struct),
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
  /** Full decode metadata: codec as sniffed from magic bytes ("opaque"
    * when no JDK codec applies), image dims, audio shape. */
  case class MediaMeta(media_id: Long, kind: String, codec: String,
                       n_bytes: Int, width: Int, height: Int,
                       channels: Int, sample_rate: Int, n_frames: Long)

  /** Deterministic payload checksum/fake-dims (the fallback for opaque
    * payloads — keeps text-byte fixtures and unknown formats decodable
    * into the same schema without a codec). */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Long) = {
    var h = 0L
    var i = 0
    while (i < payload.length) { h = (h * 31 + (payload(i) & 0xff)) % 1000003L; i += 1 }
    val width = 64 + (h % 577).toInt
    val height = 64 + ((h * 7) % 419).toInt
    (width, height, h)
  }

  /** Magic-byte container sniff — never throws, never reads past the
    * header. */
  def sniffCodec(p: Array[Byte]): String = {
    def at(i: Int): Int = if (i < p.length) p(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "jpeg"
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') "gif"
    else if (at(0) == 'B' && at(1) == 'M') "bmp"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
             at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') "wav"
    else "opaque"
  }

  /** Real decode through the JDK codecs; opaque/corrupt payloads land on
    * the deterministic fallback rather than failing the task (the K7
    * row-isolation posture: one bad file must not kill a 100 TB batch). */
  def decodeMeta(id: Long, kind: String, payload: Array[Byte]): MediaMeta = {
    val codec = sniffCodec(payload)
    def fallback = {
      val (w, h, _) = fakeDecode(payload)
      MediaMeta(id, kind, "opaque", payload.length, w, h, 0, 0, 0L)
    }
    try codec match {
      case "png" | "jpeg" | "gif" | "bmp" =>
        val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
        if (img == null) fallback
        else MediaMeta(id, kind, codec, payload.length,
          img.getWidth, img.getHeight, img.getRaster.getNumBands, 0, 0L)
      case "wav" =>
        val in = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new ByteArrayInputStream(payload))
        try {
          val f = in.getFormat
          MediaMeta(id, kind, codec, payload.length, 0, 0,
            f.getChannels, f.getSampleRate.toInt, in.getFrameLength)
        } finally in.close()
      case _ => fallback
    } catch { case scala.util.control.NonFatal(_) => fallback }
  }

  /** Decode stage: batch-iterating kernel over the typed Dataset.
    * Partition-preserving (no shuffle); one iterator pass per partition.
    * Width/height come from the real codec when the container is
    * JDK-decodable, from the deterministic fallback otherwise; the
    * checksum is always the payload fold (codec-independent identity). */
  def decodeStage(spark: SparkSession, media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val (fw, fh, c) = fakeDecode(m.payload)
        val meta = decodeMeta(m.media_id, m.kind, m.payload)
        val (w, h) =
          if (meta.codec == "opaque") (fw, fh) else (meta.width, meta.height)
        DecodedRow(m.media_id, m.kind, m.payload.length, w, h, c)
      }
    }
  }

  /** Full-metadata decode stage (codec, dims, audio shape). */
  def decodeMetaStage(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import spark.implicits._
    media.mapPartitions(_.map(m => decodeMeta(m.media_id, m.kind, m.payload)))
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
