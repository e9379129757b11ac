package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Multimodal binary-column operators (SURVEY §2 M1-M2).
  *
  * Media payloads are opaque `binary` columns with typed metadata alongside
  * — the pattern for image/audio/video at 100 TB: metadata columns let
  * Catalyst prune (filter by format/size) *before* any byte of payload is
  * decoded. The decode step is REAL header parsing: payloads carry valid
  * PNG / WAV (RIFF) / JPEG (JFIF) container headers (built by
  * [[MediaCodec.encode]], CRC-correct for PNG), and `m_media_meta`'s
  * width/height are read back out of those bytes by [[MediaCodec.decode]]
  * inside the per-partition batch-decode plumbing — exactly where an
  * image/ffmpeg library would sit. Only full-frame pixel decode is out of
  * scope (no media libs in this environment); the container layer — magic,
  * chunk/segment/RIFF walking, big- and little-endian dimension fields,
  * format sanity against the declared tag — is parsed for real.
  *
  * The driver parquet has no binary column, so payload bodies are
  * materialized from `documents.text` (ASCII, so the DuckDB oracle can
  * mirror body byte operations with varchar operations 1:1); the oracle
  * checks the decoded dimensions against the planted closed forms, so a
  * parser that misreads any header field hash-mismatches immediately.
  */
object Multimodal {

  val ChunkBytes = 32
  val SampleEvery = 4

  /** documents with a (headerless) binary payload + media-type tag — the
    * raw-bytes table the chunk sampler reads (its oracle mirrors payload
    * bytes with varchar ops, so no binary header prefix here). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).selectExpr(
      "doc_id",
      "CAST(text AS BINARY) AS payload",
      "element_at(array('image', 'audio', 'video'), CAST(doc_id % 3 AS INT) + 1) AS format")

  /** The same corpus as real container files: payload = a valid
    * PNG/WAV/JPEG header encoding the planted metadata, then the text
    * bytes as the (undecoded) body. Encoding is per-partition imperative
    * work ([[MediaCodec.encode]]) — the ingest-side twin of the decode
    * path. `n_bytes`/`magic` ride along as CATALYST projections over the
    * encoded payload: this is the table a 100 TB ingest would persist, and
    * those metadata columns are what lets a format/size filter prune file
    * reads without touching a payload byte. */
  def mediaEncoded(spark: SparkSession, dir: String): DataFrame = {
    val session = spark
    val rdd = mediaTable(spark, dir).select("doc_id", "payload", "format")
      .rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val body = r.getAs[Array[Byte]](1)
          val fmt = r.getString(2)
          Row(id, fmt, MediaCodec.encode(id, fmt, body))
        }
      }
    session.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
      .selectExpr("doc_id", "format", "payload",
        "CAST(length(payload) AS INT) AS n_bytes",
        "lower(hex(substring(payload, 1, 4))) AS magic")
  }

  // --- M1: metadata extraction ---------------------------------------------

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("n_bytes", IntegerType),
    StructField("magic", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Schema + metadata over real container payloads: width/height come
    * from parsing the container header bytes ([[MediaCodec.decode]] — PNG
    * IHDR big-endian, WAV fmt-chunk little-endian, JPEG SOF segment walk),
    * with the parsed container checked against the declared format tag.
    *
    * Plumbing: encode and decode are FUSED into one mapPartitions pass —
    * one RDD↔Catalyst boundary, each payload serialized once (the
    * two-hop form paid the full-payload exchange twice). n_bytes/magic
    * are read off the same in-hand bytes here; in a persisted deployment
    * they live as [[mediaEncoded]]'s column expressions over the stored
    * encoded table, where Catalyst prunes on them BEFORE any decode. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    val session = spark
    val rdd = mediaTable(spark, dir).select("doc_id", "payload", "format")
      .rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val fmt = r.getString(2)
          val payload = MediaCodec.encode(id, fmt, r.getAs[Array[Byte]](1))
          val (w, h) = MediaCodec.decode(fmt, payload)
          val magic = payload.take(4).map(b => f"${b & 0xff}%02x").mkString
          Row(id, fmt, payload.length, magic, w, h)
        }
      }
    session.createDataFrame(rdd, decodedSchema)
  }

  /** Oracle = the planted closed forms: header length / magic constants
    * per container, dimensions per the encoder's formulas — a decode that
    * misreads any field diverges from this. */
  val mediaMetaOracle: String =
    s"""SELECT doc_id,
       |  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS format,
       |  CAST(length(text) + CASE CAST(doc_id % 3 AS INT)
       |    WHEN 0 THEN ${MediaCodec.PngHeaderLen}
       |    WHEN 1 THEN ${MediaCodec.WavHeaderLen}
       |    ELSE ${MediaCodec.JpegHeaderLen} END AS INT) AS n_bytes,
       |  CASE CAST(doc_id % 3 AS INT)
       |    WHEN 0 THEN '89504e47' WHEN 1 THEN '52494646'
       |    ELSE 'ffd8ffe0' END AS magic,
       |  CAST(CASE CAST(doc_id % 3 AS INT)
       |    WHEN 1 THEN 8 * (1 + doc_id % 5)
       |    ELSE 16 + (length(text) % 240) END AS INT) AS width,
       |  CAST(CASE CAST(doc_id % 3 AS INT)
       |    WHEN 1 THEN 1 + doc_id % 2
       |    ELSE 16 + ((doc_id * 7) % 240) END AS INT) AS height
       |FROM documents""".stripMargin

  // --- M2: frame/chunk sampling --------------------------------------------

  /** Sample every 4th fixed-size chunk of each payload — the frame-sampling
    * plan shape: per-row chunk index generation (no shuffle), explode, hash.
    * Payload bytes are only touched for sampled chunks. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      // the n_chunks = 0 guard matters: Spark's sequence(0, -1) yields a
      // DESCENDING [0, -1] (not an empty array), so an empty payload would
      // emit a phantom chunk 0 that the oracle's range(0) never produces
      .filter(length(col("payload")) > 0)
      .selectExpr("doc_id", "payload",
        s"filter(sequence(0, CAST(ceil(length(payload) / $ChunkBytes.0) AS INT) - 1), i -> i % $SampleEvery = 0) AS idxs")
      .selectExpr("doc_id", "explode(idxs) AS chunk_idx", "payload")
      .selectExpr("doc_id", "chunk_idx",
        s"length(substring(payload, chunk_idx * $ChunkBytes + 1, $ChunkBytes)) AS chunk_len",
        s"md5(substring(payload, chunk_idx * $ChunkBytes + 1, $ChunkBytes)) AS chunk_md5")

  val frameSampleOracle: String =
    s"""SELECT doc_id, i AS chunk_idx,
       |  length(substr(text, CAST(i * $ChunkBytes + 1 AS INT), $ChunkBytes)) AS chunk_len,
       |  md5(substr(text, CAST(i * $ChunkBytes + 1 AS INT), $ChunkBytes)) AS chunk_md5
       |FROM documents,
       |  UNNEST(range(CAST(ceil(length(text) / $ChunkBytes.0) AS INT))) AS t(i)
       |WHERE i % $SampleEvery = 0""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_media_meta" -> mediaMeta,
    "m_frame_sample" -> frameSample)

  val oracles: Map[String, String] = Map(
    "m_media_meta" -> mediaMetaOracle,
    "m_frame_sample" -> frameSampleOracle)
}

/** Real media-container header encode/decode — plain static JVM code
  * called from the mapPartitions batch paths (same rule as the other
  * codegen helpers: one call per row, the byte walking runs as ordinary
  * JIT-compiled code).
  *
  * Planted metadata (mirrored by the DuckDB oracle's closed forms):
  *  - image → PNG:  width = 16 + bodyLen % 240, height = 16 + (id*7) % 240
  *  - audio → WAV:  sampleRate = 8000·(1 + id%5) Hz, channels = 1 + id%2;
  *                  published as width = kHz·8-form (sampleRate/1000),
  *                  height = channels — the generic dim0/dim1 convention
  *                  for non-image media
  *  - video → JPEG: same dimension forms as image (a keyframe header)
  */
object MediaCodec {

  val PngHeaderLen = 33  // 8 sig + 25 IHDR chunk (len+type+13 data+CRC)
  val WavHeaderLen = 44  // canonical RIFF/WAVE + fmt(16) + data chunk header
  val JpegHeaderLen = 39 // SOI + APP0(JFIF, 18) + SOF0(19)

  private def be16(v: Int) = Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Int) = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(v).array()
  private def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int) = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  private def readBe16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
  private def readBe32(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
  private def readLe16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def readLe32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Build a payload with a REAL container header for the tagged format:
    * a byte-level parser (ours below, or any standard tool reading only
    * the header) recovers the planted dimensions. The body (document
    * text) stands in for the compressed pixel/sample stream. */
  def encode(id: Long, format: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64 + body.length)
    format match {
      case "image" =>
        val w = 16 + Math.floorMod(body.length, 240)
        val h = 16 + Math.floorMod(id * 7, 240).toInt
        out.write(PngSig)
        out.write(be32(13)) // IHDR data length
        val typeAndData = new java.io.ByteArrayOutputStream(17)
        typeAndData.write("IHDR".getBytes("US-ASCII"))
        typeAndData.write(be32(w)); typeAndData.write(be32(h))
        // bit depth 8, color type 2 (truecolor), compression/filter 0,
        // interlace 0
        typeAndData.write(Array[Byte](8, 2, 0, 0, 0))
        val td = typeAndData.toByteArray
        out.write(td)
        val crc = new CRC32(); crc.update(td)
        out.write(be32(crc.getValue.toInt))
      case "audio" =>
        val rate = 8000 * (1 + Math.floorMod(id, 5).toInt)
        val channels = 1 + Math.floorMod(id, 2).toInt
        out.write("RIFF".getBytes("US-ASCII"))
        out.write(le32(36 + body.length)) // riff chunk size
        out.write("WAVE".getBytes("US-ASCII"))
        out.write("fmt ".getBytes("US-ASCII"))
        out.write(le32(16))               // fmt chunk size (PCM)
        out.write(le16(1))                // audio format 1 = PCM
        out.write(le16(channels))
        out.write(le32(rate))
        out.write(le32(rate * channels * 2)) // byte rate (16-bit samples)
        out.write(le16(channels * 2))        // block align
        out.write(le16(16))                  // bits per sample
        out.write("data".getBytes("US-ASCII"))
        out.write(le32(body.length))
      case "video" =>
        val w = 16 + Math.floorMod(body.length, 240)
        val h = 16 + Math.floorMod(id * 7, 240).toInt
        out.write(Array[Byte](0xff.toByte, 0xd8.toByte)) // SOI
        out.write(Array[Byte](0xff.toByte, 0xe0.toByte)) // APP0
        out.write(be16(16))
        out.write("JFIF".getBytes("US-ASCII")); out.write(0)
        out.write(Array[Byte](1, 1, 0))      // version 1.1, units 0
        out.write(be16(72)); out.write(be16(72)) // x/y density
        out.write(Array[Byte](0, 0))         // no thumbnail
        out.write(Array[Byte](0xff.toByte, 0xc0.toByte)) // SOF0 baseline
        out.write(be16(17))                  // segment length
        out.write(8)                         // precision
        out.write(be16(h)); out.write(be16(w))
        out.write(3)                         // components
        out.write(Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
      case other => throw new IllegalArgumentException(s"unknown format tag: $other")
    }
    out.write(body)
    out.toByteArray
  }

  private def fail(format: String, why: String) =
    throw new IllegalArgumentException(s"$format payload: $why")

  /** Parse (width, height) — for audio, (sampleRate/1000, channels) — out
    * of the container header, verifying the container matches the declared
    * format tag. Throws on mismatch or malformed headers: a corrupt or
    * mislabeled 100 TB shard should surface per-row errors, not produce
    * silent garbage dimensions. */
  def decode(format: String, payload: Array[Byte]): (Int, Int) = format match {
    case "image" =>
      if (payload.length < PngHeaderLen || !payload.take(8).sameElements(PngSig))
        fail(format, "missing PNG signature")
      if (!(12 until 16).forall(i => payload(i) == "IHDR".charAt(i - 12).toByte))
        fail(format, "first chunk is not IHDR")
      val td = java.util.Arrays.copyOfRange(payload, 12, 12 + 17)
      val crc = new CRC32(); crc.update(td)
      if (crc.getValue.toInt != readBe32(payload, 29)) fail(format, "IHDR CRC mismatch")
      (readBe32(payload, 16), readBe32(payload, 20))
    case "audio" =>
      if (payload.length < WavHeaderLen ||
          !(payload.take(4).sameElements("RIFF".getBytes("US-ASCII"))) ||
          !(java.util.Arrays.copyOfRange(payload, 8, 12)
            .sameElements("WAVE".getBytes("US-ASCII"))))
        fail(format, "not a RIFF/WAVE container")
      if (!java.util.Arrays.copyOfRange(payload, 12, 16)
            .sameElements("fmt ".getBytes("US-ASCII")))
        fail(format, "missing fmt chunk")
      (readLe32(payload, 24) / 1000, readLe16(payload, 22))
    case "video" =>
      if (payload.length < 4 || (payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8)
        fail(format, "missing JPEG SOI marker")
      // walk segments to the first SOF (start-of-frame) marker
      var p = 2
      while (p + 8 < payload.length) {
        if ((payload(p) & 0xff) != 0xff) fail(format, s"bad marker byte at $p")
        val m = payload(p + 1) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          return (readBe16(payload, p + 7), readBe16(payload, p + 5))
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) p += 2 // standalone
        else p += 2 + readBe16(payload, p + 2)
      }
      fail(format, "no SOF segment before body")
    case other => fail(other, "unknown format tag")
  }
}
