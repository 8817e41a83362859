package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief): media as opaque `binary`
  * columns with typed metadata, decode/feature-extract as partition-batched
  * functions.
  *
  * The decode stage is a REAL binary P6 PPM decoder ([[PpmDecoder]]):
  * magic check, whitespace/comment-tolerant header parse, raster-length
  * validation, per-channel pixel moments — genuine byte-level work in the
  * `mapPartitions` boundary a JNI/FFmpeg binding would occupy. What this
  * container cannot provide is real IMAGE DATA, so [[renderPpm]]
  * synthesizes valid P6 files from document bytes (header + the leading
  * w·h·3 text bytes as the raster) — a deterministic fixture the DuckDB
  * oracle reproduces byte-for-byte, which lets the gate check the
  * decoder's moments against an independent recomputation from the same
  * bytes. The frame-sample / resize / feature stages remain byte-level
  * digests/histograms over the raw payload (real work, format-agnostic).
  */
object Multimodal {

  /** raw media row: opaque payload + source id */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** documents → media frame with a real `binary` payload column (UTF-8
    * bytes of the text stand in for image bytes).
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Valid binary P6 PPM images rendered from document bytes — the media
    * fixture: `P6\n<w> <h>\n255\n` + the leading w·h·3 text bytes as the
    * RGB raster, with w = h = min(16, ⌊√(n div 3)⌋) so the raster always
    * fits the text (documents are ASCII: byte length = char length).
    * Pure Column arithmetic, so the oracle rebuilds the same bytes; docs
    * too short for one pixel (n < 3) are dropped.
    */
  def renderPpm(docs: DataFrame): DataFrame = {
    val n = length(col("text"))
    val wh = least(lit(16),
      floor(sqrt((n.cast("long") / lit(3L)).cast("double"))).cast("int"))
    docs.where(n >= 3)
      .select(col("doc_id"),
        encode(concat(lit("P6\n"), wh.cast("string"), lit(" "),
          wh.cast("string"), lit("\n255\n"),
          col("text").substr(lit(1), wh * wh * lit(3))), "UTF-8")
          .as("payload"))
  }

  /** decoded P6 metadata + per-channel pixel moments */
  final case class PpmMeta(doc_id: Long, width: Int, height: Int,
                           maxval: Int, mean_r: Double, mean_g: Double,
                           mean_b: Double)

  /** A real (minimal) binary-PPM decoder: magic, whitespace/comment
    * handling per the netpbm spec, decimal header fields, single
    * separator byte, exact raster-length check. Throws on malformed
    * input — a decode stage that silently invents metadata hides
    * corruption at 100 TB.
    */
  object PpmDecoder {
    def decode(r: MediaRow): PpmMeta = {
      val b = r.payload
      var i = 0
      def isWs(c: Byte) =
        c == ' ' || c == '\n' || c == '\t' || c == '\r'
      def skipWs(): Unit = {
        var go = true
        while (go && i < b.length) {
          if (isWs(b(i))) i += 1
          else if (b(i) == '#') {
            while (i < b.length && b(i) != '\n') i += 1
          } else go = false
        }
      }
      def int(): Int = {
        skipWs()
        require(i < b.length && b(i) >= '0' && b(i) <= '9',
          s"PPM: digit expected at byte $i")
        var v = 0
        while (i < b.length && b(i) >= '0' && b(i) <= '9') {
          v = v * 10 + (b(i) - '0'); i += 1
        }
        v
      }
      require(b.length >= 2 && b(0) == 'P' && b(1) == '6',
        "PPM: bad magic")
      i = 2
      val w = int(); val h = int(); val mv = int()
      require(w > 0 && h > 0 && mv > 0 && mv < 65536,
        s"PPM: bad header $w x $h maxval $mv")
      require(i < b.length && isWs(b(i)), "PPM: raster separator expected")
      i += 1
      require(b.length - i == w * h * 3,
        s"PPM: raster ${b.length - i} bytes, expected ${w * h * 3}")
      var sr = 0L; var sg = 0L; var sb = 0L
      var p = i
      while (p < b.length) {
        sr += java.lang.Byte.toUnsignedInt(b(p))
        sg += java.lang.Byte.toUnsignedInt(b(p + 1))
        sb += java.lang.Byte.toUnsignedInt(b(p + 2))
        p += 3
      }
      val npx = (w * h).toDouble
      PpmMeta(r.doc_id, w, h, mv, sr / npx, sg / npx, sb / npx)
    }
  }

  /** The decode stage: partition-batched typed map over the binary
    * payloads — one decoder per partition, iterator-streamed, constant
    * memory per task regardless of partition size.
    */
  def decodePpm(spark: SparkSession, media: DataFrame): Dataset[PpmMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real codecs would init native resources here, once per partition
      rows.map(PpmDecoder.decode)
    }
  }

  /** DuckDB mirror of [[renderPpm]] ∘ [[decodePpm]]: the moments
    * recomputed INDEPENDENTLY from the same bytes (per-channel integer
    * sums over the leading w·h·3 char codes — never through the
    * decoder), so the gate cross-checks the byte-level parse.
    */
  val decodePpmSql: String =
    """WITH m AS (SELECT doc_id, text,
      |             LEAST(16, CAST(floor(sqrt(CAST(length(text) // 3
      |               AS DOUBLE))) AS INTEGER)) AS wh
      |           FROM documents WHERE length(text) >= 3),
      |px AS (SELECT doc_id, wh,
      |         CAST(t.i AS INTEGER) % 3 AS ch,
      |         ascii(substr(text, CAST(t.i AS INTEGER) + 1, 1)) AS v
      |       FROM m, unnest(range(0, wh * wh * 3)) AS t(i))
      |SELECT doc_id,
      |       CAST(wh AS INTEGER) AS width, CAST(wh AS INTEGER) AS height,
      |       255 AS maxval,
      |       CAST(SUM(CASE WHEN ch = 0 THEN v END) AS DOUBLE) / (wh * wh)
      |         AS mean_r,
      |       CAST(SUM(CASE WHEN ch = 1 THEN v END) AS DOUBLE) / (wh * wh)
      |         AS mean_g,
      |       CAST(SUM(CASE WHEN ch = 2 THEN v END) AS DOUBLE) / (wh * wh)
      |         AS mean_b
      |FROM px GROUP BY doc_id, wh ORDER BY doc_id""".stripMargin

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

}
