package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed batch-wise with mapPartitions (the Scala
  * analogue of the mapInPandas batch shape).
  *
  * The actual media decode is STUBBED — image/audio codecs are not in
  * this container — behind [[FakeDecoder]], a deterministic stand-in that
  * derives plausible metadata from the bytes. Everything around it (the
  * schema, the partition-wise batch processing, null handling, the typed
  * Dataset API) is real and tested; swapping FakeDecoder for a JNI/JavaCV
  * decoder changes one function.
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

  /** Batch feature extraction: mapPartitions so any real decoder can
    * amortize per-batch init (model load, codec context) exactly like
    * mapInPandas batches — one decoder instance per partition, streaming
    * through rows without materializing the partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: init decoder/codec once here
      rows.map(FakeDecoder.decode)
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
