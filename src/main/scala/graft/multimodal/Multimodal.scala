package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed batch-wise with mapPartitions (the Scala
  * analogue of the mapInPandas batch shape).
  *
  * Two decoders behind one function signature: [[ImageIoDecoder]] does
  * REAL PNG/JPEG/GIF/BMP header extraction via javax.imageio (pure JVM),
  * and [[FakeDecoder]] is the deterministic stand-in for kinds whose
  * codecs are not in this container (audio/video) and for reproducible
  * tests. Everything around them (the schema, the partition-wise batch
  * processing, null handling, the typed Dataset API) is shared and
  * tested; swapping in a JNI/JavaCV video decoder changes one function.
  */
object Multimodal {

  /** A media row: opaque payload + source metadata. */
  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte], source: String)

  /** Extracted (decoded) features — fixed schema regardless of decoder. */
  final case class MediaFeatures(
      media_id: Long, kind: String, byte_size: Long, sha256: String,
      width: Int, height: Int, n_frames: Int, duration_ms: Long)

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType), StructField("kind", StringType),
    StructField("byte_size", LongType), StructField("sha256", StringType),
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("n_frames", IntegerType), StructField("duration_ms", LongType)))

  /** STUB decoder: deterministic fake metadata derived from the payload
    * bytes (sha-seeded). A real implementation decodes headers/frames. */
  object FakeDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val digest = md.digest(row.payload)
      val hex = digest.map("%02x".format(_)).mkString
      val h = java.nio.ByteBuffer.wrap(digest.take(8)).getLong
      val w = 64 + math.floorMod(h, 1920).toInt
      val ht = 64 + math.floorMod(h >> 16, 1080).toInt
      val frames = row.kind match {
        case "image" => 1
        case "video" => 1 + math.floorMod(h >> 24, 600).toInt
        case _       => 0
      }
      val dur = row.kind match {
        case "image" => 0L
        case _       => 1000L + math.floorMod(h >> 32, 600000L)
      }
      MediaFeatures(row.media_id, row.kind, row.payload.length.toLong, hex,
        w, ht, frames, dur)
    }
  }

  /** REAL image decoder: javax.imageio header probe for PNG/JPEG/GIF/BMP
    * — pure JVM, no native deps. Reads ONLY the header (ImageReader
    * .getWidth/getHeight never decode pixel data), which is the 100 TB
    * story: dimension extraction costs a few hundred bytes of IO per
    * image, not a full pixel decode.
    *
    * Failure policy: an undecodable payload (or a non-image kind) yields
    * width = height = -1 rather than throwing — one corrupt object among
    * billions must not kill the job; downstream filters on the sentinel.
    * byte_size and sha256 are always real. */
  object ImageIoDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(row.payload).map("%02x".format(_)).mkString
      var w = -1
      var h = -1
      if (row.kind == "image") {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(row.payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (readers.hasNext) {
            val r = readers.next()
            // NonFatal, not just IOException: plugin readers throw
            // IllegalArgumentException / ArrayIndexOutOfBounds on
            // malformed headers whose magic bytes matched — any decode
            // failure must yield the sentinel, never a task failure.
            // Both dims assign atomically AFTER the probe so a failure
            // between width and height cannot emit a half-sentinel row.
            try {
              r.setInput(iis)
              val pw = r.getWidth(0)
              val ph = r.getHeight(0)
              w = pw
              h = ph
            } catch { case scala.util.control.NonFatal(_) => () }
            finally r.dispose()
          }
        } finally iis.close()
      }
      MediaFeatures(row.media_id, row.kind, row.payload.length.toLong, hex,
        w, h, if (w >= 0) 1 else 0, 0L)
    }
  }

  /** REAL audio decoder: RIFF/WAVE header walk — pure JVM byte parsing,
    * no codec dependency. Extracts channel count, byte rate and data
    * size from the fmt/data chunks (a proper chunk walk, not a fixed
    * 44-byte offset: WAV files legally carry LIST/fact chunks before
    * data) and derives PCM frame count and duration. Header-only, same
    * 100 TB story as the image probe: a few dozen bytes of IO per file.
    *
    * Failure policy matches [[ImageIoDecoder]]: malformed/truncated
    * headers (or a non-audio kind) yield the sentinel (n_frames = 0,
    * duration_ms = 0) — one corrupt object must not kill the job.
    * width/height are always -1 for audio. */
  object WavDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(row.payload).map("%02x".format(_)).mkString
      var frames = 0L
      var durMs = 0L
      if (row.kind == "audio") try {
        val bb = java.nio.ByteBuffer.wrap(row.payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def tag(): String = {
          val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
        }
        if (tag() == "RIFF") {
          bb.getInt // RIFF size
          if (tag() == "WAVE") {
            var byteRate = 0
            var blockAlign = 0
            var dataSize = -1L
            while (bb.remaining() >= 8 && dataSize < 0) {
              val id = tag()
              val sz = bb.getInt
              if (id == "fmt ") {
                val start = bb.position()
                bb.getShort // audio format
                bb.getShort // channels
                bb.getInt   // sample rate
                byteRate = bb.getInt
                blockAlign = bb.getShort & 0xffff
                bb.position(start + sz + (sz & 1))
              } else if (id == "data") {
                dataSize = sz.toLong & 0xffffffffL
              } else {
                bb.position(bb.position() + sz + (sz & 1))
              }
            }
            if (dataSize >= 0 && blockAlign > 0 && byteRate > 0) {
              frames = dataSize / blockAlign
              durMs = dataSize * 1000L / byteRate
            }
          }
        }
      } catch { case scala.util.control.NonFatal(_) => frames = 0L; durMs = 0L }
      MediaFeatures(row.media_id, row.kind, row.payload.length.toLong, hex,
        -1, -1, math.min(frames, Int.MaxValue).toInt, durMs)
    }
  }

  /** Kind-dispatching header decoder: image → [[ImageIoDecoder]],
    * audio → [[WavDecoder]], anything else → the deterministic stub.
    * The per-partition batch shape means ONE dispatcher instance serves
    * the whole partition regardless of kind mix. */
  object HeaderDecoder {
    def decode(row: MediaRow): MediaFeatures = row.kind match {
      case "image" => ImageIoDecoder.decode(row)
      case "audio" => WavDecoder.decode(row)
      case _       => FakeDecoder.decode(row)
    }
  }

  /** Batch feature extraction: mapPartitions so any real decoder can
    * amortize per-batch init (model load, codec context) exactly like
    * mapInPandas batches — one decoder instance per partition, streaming
    * through rows without materializing the partition. `decode` defaults
    * to the deterministic [[FakeDecoder]] (no codecs needed); pass
    * [[ImageIoDecoder.decode]] for real PNG/JPEG header extraction. */
  def extractFeatures(media: Dataset[MediaRow],
      decode: MediaRow => MediaFeatures = FakeDecoder.decode): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: init decoder/codec once here
      rows.map(decode)
    }
  }

  /** Media "resize" shape: payload transform keeping lineage columns —
    * demonstrates the binary→binary batch path (stub: truncate bytes). */
  def resize(media: Dataset[MediaRow], maxBytes: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => r.copy(payload = r.payload.take(maxBytes)))
    }
  }

  /** Frame sampling shape for videos: explode into (media_id, frame_idx)
    * rows without decoding — the plan-level skeleton a real sampler fills. */
  def sampleFrames(features: DataFrame, everyNth: Int): DataFrame =
    features.filter(col("kind") === "video" && col("n_frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyNth))).as("frame_idx"))

  /** REAL file ingestion via Spark's built-in `binaryFile` source — the
    * 100 TB entry point for an image/audio corpus on object storage:
    * each file becomes one row of (path, modificationTime, length,
    * content) with the bytes read ONLY when the content column is
    * actually consumed (column pruning applies; a metadata-only query
    * never downloads payloads). media_id is the xxhash64 of the path
    * (stable across runs), kind derives from the extension, and the
    * path itself rides along as `source` for lineage. */
  def readBinaryFiles(spark: SparkSession, dir: String,
      glob: String = "*"): Dataset[MediaRow] = {
    import spark.implicits._
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    val kind = when(ext.isin("png", "jpg", "jpeg", "gif", "bmp", "webp"), "image")
      .when(ext.isin("mp4", "avi", "mkv", "webm"), "video")
      .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
      .otherwise("binary")
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(xxhash64(col("path")).as("media_id"), kind.as("kind"),
        col("content").as("payload"), col("path").as("source"))
      .as[MediaRow]
  }

  /** Build a media table from any string column (test/demo helper):
    * payload = utf-8 bytes. At 100 TB the payload column stays in parquet
    * binary chunks; only projected metadata shuffles. */
  def fromText(df: DataFrame, idCol: String, textCol: String, kind: String)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType).as("media_id"), lit(kind).as("kind"),
        encode(col(textCol), "UTF-8").as("payload"),
        lit("synthetic").as("source"))
      .as[MediaRow]
  }
}
