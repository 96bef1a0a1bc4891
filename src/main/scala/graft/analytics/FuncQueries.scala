package graft.analytics

import graft.{GraftQuery, Tables}
import graft.functions.Cleaning
import org.apache.spark.sql.functions._

/** Oracle-checked queries exercising the §2.6 scalar kernel on the star
  * schema (the listing columns don't exist in the driver corpus, so the
  * functions run over synthesized-but-equivalent inputs built identically
  * in both engines). */
object FuncQueries {

  /** F2/F3 price parsing round-trip: build "₹ <int>/Piece" from
    * p_retailprice in both engines, parse back with the cleaning kernel. */
  val qPriceParse = GraftQuery(
    "q_price_parse",
    (s, dir) => {
      import s.implicits._
      Tables.part(s, dir)
        .withColumn("price_str",
          concat(lit("₹ "), floor($"p_retailprice").cast("bigint").cast("string"),
            lit("/Piece")))
        .select($"p_partkey",
          Cleaning.parsePriceToNumber($"price_str").as("price_numeric"),
          Cleaning.extractPriceUnit($"price_str").as("price_unit"))
        .orderBy($"p_partkey")
    },
    Some("""WITH p AS (SELECT p_partkey,
        '₹ ' || CAST(CAST(FLOOR(p_retailprice) AS BIGINT) AS VARCHAR) || '/Piece' AS price_str
      FROM part)
      SELECT p_partkey,
        CAST(regexp_extract(replace(replace(price_str, '₹', ''), ',', ''), '\d+(\.\d+)?', 0) AS DOUBLE) AS price_numeric,
        regexp_extract(price_str, '/\s*([A-Za-z]+)', 1) AS price_unit
      FROM p ORDER BY p_partkey""")
  )

  /** F5/F6 digit-strip + salted sha-256 (the phone anonymization) over
    * customer names. */
  val qHashDigits = GraftQuery(
    "q_hash_digits",
    (s, dir) => {
      import s.implicits._
      Tables.customer(s, dir)
        .select($"c_custkey",
          Cleaning.sha256Hash(Cleaning.cleanPhoneDigits($"c_name")).as("digit_hash"))
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey,
        CASE WHEN regexp_replace(c_name, '\D', '', 'g') = '' THEN NULL
             ELSE sha256('indiamart_etl_salt::' || regexp_replace(c_name, '\D', '', 'g'))
        END AS digit_hash
      FROM customer ORDER BY c_custkey""")
  )

  /** Multimodal plumbing, engine-visible part: opaque binary payloads from
    * text (encode), byte size + content digest — what shuffles at 100 TB
    * is this metadata, never the payload. */
  val qMultimodalMeta = GraftQuery(
    "q_multimodal_meta",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id",
          octet_length(encode($"text", "UTF-8")).as("byte_size"),
          sha2($"text", 256).as("sha256"))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id, octet_length(CAST(text AS BLOB)) AS byte_size,
        sha256(text) AS sha256
      FROM documents ORDER BY doc_id""")
  )

  /** Multimodal REAL-decode roundtrip: synthesize a small PNG per doc
    * (dimensions derived deterministically from doc_id), then decode it
    * back DISTRIBUTED through Multimodal.ImageIoDecoder — the oracle
    * checks the decoded dimensions against the formula, proving the
    * encode → binary column → partition-wise header decode path end to
    * end. Payload bytes never shuffle (encode and decode fuse into one
    * map stage); only (id, width, height) leaves the executors. */
  val qMultimodalDecode = GraftQuery(
    "q_multimodal_decode",
    (s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val media = Tables.documents(s, dir)
        .select($"doc_id").orderBy($"doc_id").limit(200).as[Long].map { id =>
          val w = (id % 16 + 1).toInt
          val h = (id % 9 + 1).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Multimodal.MediaRow(id, "image", bos.toByteArray, "synthetic")
        }
      Multimodal.extractFeatures(media, Multimodal.ImageIoDecoder.decode)
        .toDF()
        .select($"media_id", $"width", $"height", $"n_frames")
        .orderBy($"media_id")
    },
    Some("""SELECT doc_id AS media_id,
        CAST(doc_id % 16 + 1 AS INTEGER) AS width,
        CAST(doc_id % 9 + 1 AS INTEGER) AS height,
        CAST(1 AS INTEGER) AS n_frames
      FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200) t
      ORDER BY media_id""")
  )

  /** Audio REAL-decode roundtrip, mirror of q_multimodal_decode for the
    * WAV path: synthesize a PCM WAV per doc (sample rate / channels /
    * frame count derived from doc_id), decode DISTRIBUTED through the
    * kind-dispatching HeaderDecoder (which must route audio to the RIFF
    * chunk walk), and oracle the recovered frame count and duration
    * against the generating formulas. Payloads never shuffle; only
    * (id, n_frames, duration_ms) leaves the executors. */
  val qWavDecode = GraftQuery(
    "q_wav_decode",
    (s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val media = Tables.documents(s, dir)
        .select($"doc_id").orderBy($"doc_id").limit(200).as[Long].map { id =>
          val sampleRate = 8000 + (id % 4).toInt * 4000
          val channels = 1 + (id % 2).toInt
          val nFrames = 100 + (id % 900).toInt
          val blockAlign = channels * 2 // 16-bit PCM
          val dataSize = nFrames * blockAlign
          val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(channels.toShort).putInt(sampleRate)
            .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
            .putShort(16)
            .put("data".getBytes("US-ASCII")).putInt(dataSize)
          Multimodal.MediaRow(id, "audio", bb.array(), "synthetic")
        }
      Multimodal.extractFeatures(media, Multimodal.HeaderDecoder.decode)
        .toDF()
        .select($"media_id", $"n_frames", $"duration_ms")
        .orderBy($"media_id")
    },
    Some("""SELECT doc_id AS media_id,
        CAST(100 + doc_id % 900 AS INTEGER) AS n_frames,
        ((100 + doc_id % 900) * (1 + doc_id % 2) * 2 * 1000)
          // ((8000 + (doc_id % 4) * 4000) * (1 + doc_id % 2) * 2) AS duration_ms
      FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200) t
      ORDER BY media_id""")
  )

  /** Video REAL-decode roundtrip, mirror of q_wav_decode for the MP4
    * path: synthesize a minimal ISO-BMFF file per doc (dimensions /
    * duration / sample count derived from doc_id), decode DISTRIBUTED
    * through the kind-dispatching HeaderDecoder (which must route video
    * to the box walk — mvhd for duration, tkhd for 16.16 dims, stsz for
    * frames), and oracle the recovered values against the generating
    * formulas. timescale is 1000 so duration units are already ms.
    * Payloads never shuffle; only the metadata row leaves the
    * executors. */
  val qMp4Decode = GraftQuery(
    "q_mp4_decode",
    (s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val media = Tables.documents(s, dir)
        .select($"doc_id").orderBy($"doc_id").limit(200).as[Long].map { id =>
          val w = (id % 32 + 16).toInt
          val h = (id % 18 + 9).toInt
          val frames = (100 + id % 900).toInt
          val dur = 2000 + id % 60000
          Multimodal.MediaRow(id, "video",
            Multimodal.Mp4Decoder.minimal(w, h, frames, 1000, dur), "synthetic")
        }
      Multimodal.extractFeatures(media, Multimodal.HeaderDecoder.decode)
        .toDF()
        .select($"media_id", $"width", $"height", $"n_frames", $"duration_ms")
        .orderBy($"media_id")
    },
    Some("""SELECT doc_id AS media_id,
        CAST(doc_id % 32 + 16 AS INTEGER) AS width,
        CAST(doc_id % 18 + 9 AS INTEGER) AS height,
        CAST(100 + doc_id % 900 AS INTEGER) AS n_frames,
        CAST(2000 + doc_id % 60000 AS BIGINT) AS duration_ms
      FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200) t
      ORDER BY media_id""")
  )

  /** Semi-structured ingestion through Spark's VARIANT type: the event
    * props JSON is parsed ONCE into the binary variant encoding
    * (`parse_json`) and fields are extracted with typed `variant_get` /
    * `try_variant_get` paths — the Spark-4 shredding-friendly path for
    * schema-on-read at scale (one parse per row, typed extraction
    * pushes into codegen, no per-access JSON re-parse the way repeated
    * get_json_object calls would). try_variant_get on an absent path
    * yields NULL, not an error — counted to certify the lenient path.
    * Oracle: DuckDB's JSON extraction over the same strings. */
  val qVariantExtract = GraftQuery(
    "q_variant_extract",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .withColumn("v", parse_json($"props"))
        .select($"event_type",
          expr("variant_get(v, '$.k', 'bigint')").as("k"),
          expr("try_variant_get(v, '$.missing', 'bigint')").as("m"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          min($"k").as("min_k"), max($"k").as("max_k"),
          sum($"k").as("sum_k"),
          count($"m").as("n_with_missing_path"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, COUNT(*) AS n,
        MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        COUNT(CASE WHEN json_extract_string(props, '$.missing') IS NOT NULL
          THEN 1 END) AS n_with_missing_path
      FROM events GROUP BY 1 ORDER BY 1""")
  )

  val all: Seq[GraftQuery] = Seq(qPriceParse, qHashDigits, qMultimodalMeta,
    qMultimodalDecode, qWavDecode, qMp4Decode, qVariantExtract)
}
