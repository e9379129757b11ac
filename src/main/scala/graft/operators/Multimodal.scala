package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Multimodal binary-column operators (SURVEY §2 M1-M2).
  *
  * Media payloads are opaque `binary` columns with typed metadata alongside
  * — the pattern for image/audio/video at 100 TB: metadata columns let
  * Catalyst prune (filter by format/size) *before* any byte of payload is
  * decoded. The decode step itself is STUBBED (no media libs in this
  * environment): `decodeStub` derives deterministic fake dimensions from
  * the bytes, but the Spark-side plumbing — binary schema, per-partition
  * batch decode via mapPartitions, chunk sampling — is real and tested.
  *
  * The driver parquet has no binary column, so payloads are materialized
  * from `documents.text` (ASCII, so the DuckDB oracle can mirror byte
  * operations with varchar operations 1:1).
  */
object Multimodal {

  val ChunkBytes = 32
  val SampleEvery = 4

  /** documents with a binary payload + media-type tag. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).selectExpr(
      "doc_id",
      "CAST(text AS BINARY) AS payload",
      "element_at(array('image', 'audio', 'video'), CAST(doc_id % 3 AS INT) + 1) AS format")

  // --- M1: metadata extraction ---------------------------------------------

  /** Schema + metadata over opaque payloads: byte length, magic prefix,
    * stub-decoded dimensions (pure functions of bytes/id — deterministic,
    * codegen'd; a real decoder would replace the width/height exprs with a
    * mapPartitions batch decode, cf. decodeStub below). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).selectExpr(
      "doc_id", "format",
      "length(payload) AS n_bytes",
      "lower(hex(substring(payload, 1, 4))) AS magic",
      "16 + pmod(length(payload), 240) AS width",
      "16 + pmod(doc_id * 7, 240) AS height")

  val mediaMetaOracle: String =
    """SELECT doc_id,
      |  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS format,
      |  length(text) AS n_bytes,
      |  lower(hex(encode(substr(text, 1, 4)))) AS magic,
      |  16 + (length(text) % 240) AS width,
      |  16 + ((doc_id * 7) % 240) AS height
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

  // --- stubbed batch decoder (mapPartitions plumbing; test-verified) -------

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_pixels", LongType)))

  /** Per-partition batch "decode": iterates payload rows in partition-sized
    * batches exactly as a real decoder (image lib, ffmpeg) would — the
    * deterministic fake derives dimensions from the byte content. This is
    * the (d)-tier mapPartitions path reserved for genuinely imperative
    * per-row work (SURVEY §4). */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "payload", "format").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val fmt = r.getString(2)
        // fake decode: dimensions from payload bytes (deterministic)
        val w = 16 + (bytes.length % 240)
        val h = 16 + ((bytes.headOption.getOrElse(0: Byte).toInt & 0x7f) % 240)
        Row(id, fmt, w, h, w.toLong * h)
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_media_meta" -> mediaMeta,
    "m_frame_sample" -> frameSample)

  val oracles: Map[String, String] = Map(
    "m_media_meta" -> mediaMetaOracle,
    "m_frame_sample" -> frameSampleOracle)
}
