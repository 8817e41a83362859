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

  /** resized output: stub dimensions + a digest of the resampled bytes */
  final case class ResizedRow(doc_id: Long, out_w: Int, out_h: Int,
                              n_in: Long, n_out: Int, resized_md5: String)

  /** The resize stage (image shape: payload in, smaller payload out).
    * STUB "resamples" by taking `nOut = min(len, outW·outH/256)` evenly
    * strided bytes (stride = len/nOut) and digesting them — a real
    * implementation decodes, scales, re-encodes; the partition-batched
    * typed map (one scaler per partition), the bounded output size, and
    * the downstream schema are the real thing. Deterministic pure
    * function of the payload, so the oracle mirrors it byte-for-byte.
    */
  def resize(spark: SparkSession, media: DataFrame, outW: Int,
             outH: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // a real scaler would init its native context here, per partition
      rows.map { r =>
        val len = r.payload.length
        val nOut = math.min(len, outW * outH / 256)
        val bytes =
          if (nOut == 0) Array.emptyByteArray
          else {
            val stride = len / nOut
            Array.tabulate(nOut)(i => r.payload(i * stride))
          }
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(bytes).map("%02x".format(_)).mkString
        ResizedRow(r.doc_id, outW, outH, len.toLong, nOut, digest)
      }
    }
  }

  /** DuckDB mirror of [[resize]] (ASCII text: strided chars = strided
    * payload bytes).
    */
  def resizeSql(outW: Int, outH: Int): String = {
    val cap = outW * outH / 256
    s"""SELECT doc_id, $outW AS out_w, $outH AS out_h,
       |       CAST(n_in AS BIGINT) AS n_in, CAST(n_out AS INTEGER) AS n_out,
       |       md5(CASE WHEN n_out = 0 THEN '' ELSE
       |         list_reduce([substr(text, i*(n_in//n_out) + 1, 1)
       |                      for i in range(0, n_out)],
       |                     (a, b) -> a || b) END) AS resized_md5
       |FROM (SELECT doc_id, text, length(text) AS n_in,
       |             LEAST(length(text), $cap) AS n_out FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** extracted feature row: one bin of the stub feature vector */
  final case class FeatureRow(doc_id: Long, bin: Int, value: Double)

  /** The feature-extract stage (the embedding-extraction shape: media
    * in, fixed-length vector out). STUB features are the normalized
    * byte-value histogram over `bins` residue classes — a real
    * implementation runs a vision/audio model over the decoded frames;
    * the partition-batched map and the exploded (doc, bin, value) output
    * schema (join-ready against the `embeddings` surface) are the real
    * thing. Division count/len is the only float op — same order both
    * engines.
    */
  def featureExtract(spark: SparkSession, media: DataFrame,
                     bins: Int): Dataset[FeatureRow] = {
    import spark.implicits._
    require(bins >= 1, s"bins must be >= 1, got $bins")
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val counts = new Array[Long](bins)
        r.payload.foreach { b => counts(java.lang.Byte.toUnsignedInt(b) % bins) += 1 }
        val len = r.payload.length.toDouble
        (0 until bins).map(b =>
          FeatureRow(r.doc_id, b,
            if (len == 0) 0.0 else counts(b) / len))
      }
    }
  }

  /** DuckDB mirror of [[featureExtract]] (ASCII text: char codes =
    * payload bytes).
    */
  def featureExtractSql(bins: Int): String =
    s"""WITH ch AS (SELECT doc_id, ascii(substr(text, i, 1)) % $bins AS bin
       |            FROM documents,
       |                 unnest(range(1, length(text) + 1)) AS t(i)),
       |n AS (SELECT doc_id, CAST(length(text) AS DOUBLE) AS len
       |      FROM documents),
       |b AS (SELECT unnest(range(0, $bins)) AS bin),
       |cnt AS (SELECT doc_id, bin, COUNT(*) AS c FROM ch GROUP BY 1, 2)
       |SELECT n.doc_id AS doc_id, CAST(b.bin AS INTEGER) AS bin,
       |       CASE WHEN n.len = 0 THEN 0.0
       |            ELSE COALESCE(c, 0) / n.len END AS value
       |FROM n CROSS JOIN b
       |LEFT JOIN cnt ON cnt.doc_id = n.doc_id AND cnt.bin = b.bin
       |ORDER BY n.doc_id, bin""".stripMargin

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
