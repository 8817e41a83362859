package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief): media as opaque `binary`
  * columns with typed metadata, decode/feature-extract as partition-batched
  * functions.
  *
  * The real decode step is STUBBED — this container has no image/audio
  * codecs — behind [[StubDecoder]], a deterministic fake that derives
  * "header" metadata from the payload bytes. Everything around it is the
  * real Spark shape: a typed `Dataset` boundary, `mapPartitions` batching
  * (one decoder instance per partition, streaming iterator — the exact
  * shape a JNI/FFmpeg binding needs), and a `binary` payload column that
  * Parquet stores untouched. Swapping `StubDecoder.decode` for a real
  * codec changes no plan shape.
  */
object Multimodal {

  /** raw media row: opaque payload + source id */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** decoded metadata: what a header parse would yield */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int,
                             height: Int, format: String)

  /** STUB — stands in for an image decoder. Deterministic pure function of
    * the payload so the oracle can mirror it; a real implementation would
    * parse magic bytes/headers here (and is the only thing to replace).
    */
  object StubDecoder {
    def decode(r: MediaRow): MediaMeta = {
      val n = r.payload.length.toLong
      MediaMeta(
        doc_id = r.doc_id,
        n_bytes = n,
        width = (n % 640).toInt + 16,
        height = ((n * 7) % 480).toInt + 16,
        format = (r.doc_id % 3) match {
          case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
        })
    }
  }

  /** documents → media frame with a real `binary` payload column (UTF-8
    * bytes of the text stand in for image bytes).
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** The decode stage: partition-batched typed map. One decoder per
    * partition, iterator-streamed — constant memory per task regardless of
    * partition size.
    */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real codecs would init native resources here, once per partition
      rows.map(StubDecoder.decode)
    }
  }

  /** sampled "frame": chunk index + content digest */
  final case class FrameRow(doc_id: Long, frame_idx: Int, frame_md5: String)

  /** The frame-sample stage (video shape: one row in, k frames out).
    * STUB samples one "frame" per 256-byte payload chunk, capped at
    * [[MaxFrames]], digesting each chunk — a real implementation would
    * seek keyframes and emit decoded frame tensors; the 1→N flatMap
    * partition shape, the cap (bounded row-explosion at 100 TB), and the
    * downstream schema are the real thing.
    */
  val MaxFrames = 5
  def frameSample(spark: SparkSession, media: DataFrame): Dataset[FrameRow] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val n = math.min((r.payload.length + 255) / 256, MaxFrames)
      (0 until n).map { i =>
        val chunk = r.payload.slice(i * 256, math.min((i + 1) * 256,
          r.payload.length))
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(chunk).map("%02x".format(_)).mkString
        FrameRow(r.doc_id, i, digest)
      }
    }
  }

  /** DuckDB mirror (ASCII text: substr chunks = payload byte chunks) */
  val frameSampleSql: String =
    s"""SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       |       md5(substr(text, i*256 + 1, 256)) AS frame_md5
       |FROM documents,
       |     unnest(range(0, LEAST(CAST(ceil(length(text)/256.0) AS BIGINT),
       |                           $MaxFrames))) AS t(i)
       |ORDER BY doc_id, frame_idx""".stripMargin

  /** DuckDB mirror of the stub decode (documents are ASCII so byte length
    * equals char length).
    */
  val decodeMetaSql: String =
    """SELECT doc_id,
      |       CAST(length(text) AS BIGINT) AS n_bytes,
      |       CAST(length(text) % 640 + 16 AS INTEGER) AS width,
      |       CAST((length(text) * 7) % 480 + 16 AS INTEGER) AS height,
      |       CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
      |            ELSE 'webp' END AS format
      |FROM documents ORDER BY doc_id""".stripMargin
}
