package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The binary P6 decoder must parse well-formed files (including
  * comment/whitespace header variants a renderer never emits — that is
  * what makes it a decoder, not an unformatter), compute exact channel
  * moments, and REJECT malformed bytes rather than invent metadata.
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ppm(header: String, raster: Array[Byte]): Array[Byte] =
    header.getBytes("UTF-8") ++ raster

  test("decodes a 2x1 P6 and computes exact channel means") {
    val raster = Array[Byte](10, 20, 30, 50, 60, 70)
    val m = Multimodal.PpmDecoder.decode(
      Multimodal.MediaRow(7L, ppm("P6\n2 1\n255\n", raster)))
    assert(m == Multimodal.PpmMeta(7L, 2, 1, 255, 30.0, 40.0, 50.0))
  }

  test("tolerates comments and mixed whitespace in the header") {
    val raster = Array[Byte](-1, 0, 127) // unsigned 255, 0, 127
    val m = Multimodal.PpmDecoder.decode(Multimodal.MediaRow(1L,
      ppm("P6 # a comment\n # another\n\t1\r\n1 # w h\n255\n", raster)))
    assert(m == Multimodal.PpmMeta(1L, 1, 1, 255, 255.0, 0.0, 127.0))
  }

  test("rejects malformed bytes instead of inventing metadata") {
    def bad(bytes: Array[Byte]): Unit =
      intercept[IllegalArgumentException] {
        Multimodal.PpmDecoder.decode(Multimodal.MediaRow(0L, bytes))
      }
    bad("P5\n1 1\n255\n...".getBytes("UTF-8")) // wrong magic
    bad("P6\n1 1\n255\n".getBytes("UTF-8") ++
      Array[Byte](1, 2)) // short raster
    bad("P6\n1 1\n255\n".getBytes("UTF-8") ++
      Array[Byte](1, 2, 3, 4)) // long raster
    bad("P6\n0 1\n255\n".getBytes("UTF-8")) // zero width
    bad("P6\n1 x\n255\n...".getBytes("UTF-8")) // non-digit height
  }

  test("fuzzed valid P6 files round-trip: exact dims and channel sums") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val w = 1 + rnd.nextInt(9); val h = 1 + rnd.nextInt(9)
      val raster = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
      // vary header whitespace/comment shape per case
      val hdr = rnd.nextInt(3) match {
        case 0 => s"P6\n$w $h\n255\n"
        case 1 => s"P6 $w\t$h 255\n"
        case _ => s"P6\n# c\n$w\n$h\n255 "
      }
      val m = Multimodal.PpmDecoder.decode(
        Multimodal.MediaRow(0L, ppm(hdr, raster)))
      assert(m.width == w && m.height == h && m.maxval == 255)
      def mean(ch: Int) = raster.zipWithIndex
        .collect { case (b, i) if i % 3 == ch =>
          java.lang.Byte.toUnsignedInt(b) }
        .sum.toDouble / (w * h)
      assert(m.mean_r == mean(0) && m.mean_g == mean(1) &&
        m.mean_b == mean(2))
    }
  }

  test("renderPpm emits valid P6 files the decoder round-trips") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "abcdefghijklmnopqrstuvwxyz0123456789"),
      (1L, "ab"), // < 3 chars: dropped
      (2L, "x" * 2000))
      .toDF("doc_id", "text")
    val out = Multimodal.decodePpm(s, Multimodal.renderPpm(docs))
      .collect().map(m => m.doc_id -> m).toMap
    assert(out.keySet == Set(0L, 2L))
    // n=36 -> wh = floor(sqrt(12)) = 3, raster = first 27 bytes
    assert(out(0L).width == 3 && out(0L).height == 3)
    val exp = "abcdefghijklmnopqrstuvwxyz0".take(27)
      .zipWithIndex
    def mean(ch: Int) = {
      val vs = exp.filter(_._2 % 3 == ch).map(_._1.toInt)
      vs.sum.toDouble / 9.0
    }
    assert(out(0L).mean_r == mean(0) && out(0L).mean_g == mean(1) &&
      out(0L).mean_b == mean(2))
    // n=2000 -> wh capped at 16, raster 768 'x' bytes
    assert(out(2L).width == 16 && out(2L).mean_r == 'x'.toInt.toDouble)
  }

  test("nearest-neighbor resize reads exact source pixels (2x2 -> 4x4 " +
    "and 4x4 -> 2x2)") {
    val s = spark
    import s.implicits._
    // 2x2 image with distinct per-pixel red values 0, 10, 20, 30
    val r22 = Array.tabulate[Byte](12)(i =>
      if (i % 3 == 0) (10 * (i / 3)).toByte else 0)
    val media22 = Seq(Multimodal.MediaRow(1L,
      ppm("P6\n2 2\n255\n", r22))).toDF("doc_id", "payload")
    // upsample 2x2 -> 4x4: each source pixel covers 4 output pixels,
    // so the mean equals the source mean (0+10+20+30)/4 = 15
    val up = Multimodal.resize(s, media22, 4, 4).collect().head
    assert(up.in_w == 2 && up.in_h == 2 && up.mean_r == 15.0 &&
      up.mean_g == 0.0)
    // 4x4 image, red = 10*pixel_index; downsample to 2x2 picks source
    // (0,0),(2,0),(0,2),(2,2) -> indices 0,2,8,10 -> mean 50
    val r44 = Array.tabulate[Byte](48)(i =>
      if (i % 3 == 0) (10 * (i / 3)).toByte else 0)
    val media44 = Seq(Multimodal.MediaRow(2L,
      ppm("P6\n4 4\n255\n", r44))).toDF("doc_id", "payload")
    val down = Multimodal.resize(s, media44, 2, 2).collect().head
    assert(down.mean_r == 50.0, down.toString)
  }

  test("frame bands partition the raster rows exactly; short images " +
    "emit one band per row") {
    val s = spark
    import s.implicits._
    // 1x7 image (7 rows): MaxFrames=5 bands at boundaries ⌊i·7/5⌋ =
    // 0,1,2,4,5,7 -> row counts 1,1,2,1,2
    val r = Array.tabulate[Byte](21)(i =>
      if (i % 3 == 0) (i / 3 + 1).toByte else 0)
    val media = Seq(Multimodal.MediaRow(3L,
      ppm("P6\n1 7\n255\n", r))).toDF("doc_id", "payload")
    val bands = Multimodal.frameSample(s, media).collect()
      .sortBy(_.frame_idx)
    assert(bands.map(_.band_rows).toSeq == Seq(1, 1, 2, 1, 2))
    assert(bands.map(_.band_rows).sum == 7)
    // band 2 covers rows 2-3 (red values 3,4) -> mean_r 3.5
    assert(bands(2).mean_r == 3.5 && bands(2).mean_g == 0.0)
    // a 2x1 image emits a single full band
    val one = Multimodal.frameSample(s, Seq(Multimodal.MediaRow(4L,
      ppm("P6\n2 1\n255\n", Array[Byte](4, 0, 0, 6, 0, 0))))
      .toDF("doc_id", "payload")).collect()
    assert(one.length == 1 && one.head.band_rows == 1 &&
      one.head.mean_r == 5.0)
  }

  test("feature extraction is a channel x intensity histogram over the " +
    "decoded raster, normalized by pixel count") {
    val s = spark
    import s.implicits._
    // 2x1 image: R values 10, 200 (bins 0 and 6 at 8 bins over 0-255),
    // G values 0, 0 (bin 0 twice), B values 128, 255 (bins 4 and 7)
    val raster = Array[Byte](10, 0, -128, 200.toByte, 0, -1)
    val media = Seq(Multimodal.MediaRow(9L, ppm("P6\n2 1\n255\n", raster)))
      .toDF("doc_id", "payload")
    val fs = Multimodal.featureExtract(s, media, 8).collect()
      .map(f => f.bin -> f.value).toMap
    assert(fs.size == 24)
    assert(fs(0) == 0.5 && fs(6) == 0.5)            // R: 10 -> 0, 200 -> 6
    assert(fs(8) == 1.0)                            // G: both 0
    assert(fs(8 + 4) == 0.0)                        // G bin 4 empty
    assert(fs(16 + 4) == 0.5 && fs(16 + 7) == 0.5)  // B: 128 -> 4, 255 -> 7
    assert(fs.values.sum == 3.0) // one unit of mass per channel
  }
}
