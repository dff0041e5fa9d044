package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, IntegerType}

import graft.Tables

/** Multimodal-column plumbing for a training-data pipeline: media as
  * opaque `binary` payloads with a typed metadata struct, plus the
  * decode / feature-extract / resize / frame-sample operators.
  *
  * The media table is derived deterministically from `documents`
  * (payload = the UTF-8 text bytes) because the container ships no
  * image/audio codecs — the DECODE STEP IS A STUB (see
  * [[DecodeStub.decode]]), but everything Spark-side is real: the
  * binary+struct schema, column pruning to the blob only when needed,
  * the typed mapPartitions batch shape, and the explode-based frame
  * sampler.
  *
  * Scale design: payload bytes never enter a shuffle — every operator
  * is a narrow map/explode over the scan, so 100 TB of blobs stream
  * through executors partition-by-partition (parquet splits bound the
  * per-task working set). Aggregates happen AFTER feature extraction,
  * on the small numeric outputs, never on blobs.
  */
object Multimodal {

  /** Synthetic media fact table: media_id, kind ∈ {image,audio,video},
    * payload BINARY, meta STRUCT<width,height,sample_rate,n_frames,mime>.
    * All fields are index arithmetic on the documents row — identical in
    * the oracle CTE below. */
  def media(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
      col("text").cast(BinaryType).as("payload"),
      struct(
        (col("doc_id") % 64 + 16).cast(IntegerType).as("width"),
        (col("doc_id") % 48 + 12).cast(IntegerType).as("height"),
        (col("doc_id") % 3 * 8000 + 8000).cast(IntegerType).as("sample_rate"),
        (col("doc_id") % 8 + 2).cast(IntegerType).as("n_frames"),
        concat(lit("application/x-graft-"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast(IntegerType))).as("mime")).as("meta"))

  val mediaCte: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |    encode(text) AS payload,
      |    CAST(doc_id % 64 + 16 AS INTEGER) AS width,
      |    CAST(doc_id % 48 + 12 AS INTEGER) AS height,
      |    CAST(doc_id % 3 * 8000 + 8000 AS INTEGER) AS sample_rate,
      |    CAST(doc_id % 8 + 2 AS INTEGER) AS n_frames,
      |    text
      |  FROM documents)
      |""".stripMargin

  // ---------------------------------------------------------------- mm01
  /** Blob + metadata stats per kind: pure built-ins over the binary
    * column (the "can your engine even hold 100 TB of blobs" smoke:
    * count/bytes/digest without ever decoding). */
  def blobStats(s: SparkSession, d: String): DataFrame =
    media(s, d).select(col("media_id"), col("kind"),
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .orderBy(col("media_id"))

  val blobStatsSql: String = mediaCte +
    """SELECT media_id, kind,
      |  CAST(octet_length(payload) AS INTEGER) AS n_bytes,
      |  md5(text) AS payload_md5, width, height
      |FROM media
      |ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- mm02
  /** Frame sampling: every 2nd frame index of each video, with its byte
    * range inside the payload — `explode(sequence(...))`, so sampling is
    * a narrow rowcount-multiplying op, never a decode. */
  def frameSample(s: SparkSession, d: String): DataFrame =
    media(s, d).where(col("kind") === "video")
      .select(col("media_id"), col("meta.n_frames").as("n_frames"),
        length(col("payload")).as("n_bytes"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(2)))
          .as("frame_idx"))
      .withColumn("frame_offset",
        (col("frame_idx") * expr("n_bytes div n_frames")).cast("long"))
      .select(col("media_id"), col("frame_idx"), col("frame_offset"))
      .orderBy(col("media_id"), col("frame_idx"))

  val frameSampleSql: String = mediaCte +
    """SELECT media_id, CAST(f.frame_idx AS INTEGER) AS frame_idx,
      |  CAST(f.frame_idx * (octet_length(payload) // n_frames) AS BIGINT) AS frame_offset
      |FROM media, unnest(range(0, n_frames, 2)) AS f(frame_idx)
      |WHERE kind = 'video'
      |ORDER BY media_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------- mm03
  /** Decode + feature-extract through the typed batch path
    * ([[DecodeStub]] via mapPartitions — the Scala analog of a
    * mapInPandas decode stage): per-partition imperative loop over raw
    * bytes, emitting small numeric features. */
  def decodeFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    media(s, d)
      .select(col("media_id"), col("kind"), col("payload"))
      .as[DecodeStub.MediaRow]
      .mapPartitions(rows => rows.map(DecodeStub.decode))
      .toDF()
      .orderBy(col("media_id"))
  }

  val decodeFeaturesSql: String = mediaCte +
    """SELECT media_id, kind,
      |  CAST(octet_length(payload) AS INTEGER) AS n_bytes,
      |  CAST(list_sum(list_transform(range(1, LENGTH(text) + 1),
      |    i -> CAST(unicode(substr(text, CAST(i AS INT), 1)) AS BIGINT))) AS DOUBLE)
      |    / octet_length(payload) AS mean_byte,
      |  list_reduce(list_transform(range(1, LENGTH(text) + 1),
      |    i -> CAST(unicode(substr(text, CAST(i AS INT), 1)) AS BIGINT)),
      |    (a, b) -> (a * 31 + b) % 1000000007) AS checksum
      |FROM media
      |ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- mm04
  /** Resize: the metadata half of a real image resize — target dims =
    * halved (min 1), aspect preserved, payload untouched (a real codec
    * would rewrite it inside the same mapPartitions slot as mm03; the
    * md5 column proves the blob passed through unmodified). */
  def resizeMeta(s: SparkSession, d: String): DataFrame =
    media(s, d).where(col("kind") === "image")
      .select(col("media_id"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        greatest(lit(1), (col("meta.width") / 2).cast(IntegerType))
          .as("out_width"),
        greatest(lit(1), (col("meta.height") / 2).cast(IntegerType))
          .as("out_height"),
        md5(col("payload")).as("payload_md5"))
      .orderBy(col("media_id"))

  val resizeMetaSql: String = mediaCte +
    """SELECT media_id, width, height,
      |  GREATEST(1, CAST(width // 2 AS INTEGER)) AS out_width,
      |  GREATEST(1, CAST(height // 2 AS INTEGER)) AS out_height,
      |  md5(text) AS payload_md5
      |FROM media
      |WHERE kind = 'image'
      |ORDER BY media_id""".stripMargin

  // ----------------------------------------------------------- registry
  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "mm01_blob_stats" -> (blobStats _),
    "mm02_frame_sample" -> (frameSample _),
    "mm03_decode_features" -> (decodeFeatures _),
    "mm04_resize" -> (resizeMeta _))

  val oracles: Seq[(String, String)] = Seq(
    "mm01_blob_stats" -> blobStatsSql,
    "mm02_frame_sample" -> frameSampleSql,
    "mm03_decode_features" -> decodeFeaturesSql,
    "mm04_resize" -> resizeMetaSql)
}

/** STUB DECODER — stands in for libjpeg/ffmpeg/etc., which this
  * container does not ship. The "decode" just reads the raw bytes as
  * the sample stream. The surrounding plumbing (typed rows, partition
  * iterator, feature schema) is exactly what a real codec would plug
  * into: replace [[decode]]'s body and nothing else moves. */
object DecodeStub {
  final case class MediaRow(media_id: Long, kind: String,
      payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Int, mean_byte: Double, checksum: Long)

  /** Deterministic fake decode: mean "sample" value and a polynomial
    * rolling checksum over the byte stream (mirrors
    * graft.functions.PolyHash for ASCII payloads, which the oracle
    * exploits — bytes ≡ codepoints there). */
  def decode(m: MediaRow): MediaFeatures = {
    var sum = 0L
    var h = 0L
    var i = 0
    while (i < m.payload.length) {
      val b = m.payload(i) & 0xff
      sum += b
      h = (h * 31 + b) % 1000000007L
      i += 1
    }
    MediaFeatures(m.media_id, m.kind, m.payload.length,
      sum.toDouble / m.payload.length, h)
  }
}
