package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Trainable quality classifier: learning behavior, determinism of the
  * exact-decimal update chain, and degenerate inputs.
  */
class ClassifierSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** corpus whose label (n_words >= 10) is linearly separable from the
    * length feature alone: evens 3–4 words, odds 25–30
    */
  private def corpus() = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps")
    (0L until 60L).map { id =>
      val n = if (id % 2 == 0) 3 + rnd.nextInt(2) else 25 + rnd.nextInt(6)
      id -> (0 until n).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    }.toDF("doc_id", "text")
  }

  test("GD learns the word-count label (separable corpus, high accuracy)") {
    val out = Classifier.trainScore(corpus(), dim = 8, rounds = 15,
      lr = 0.05, minWords = 10).collect()
    val acc = out.count(r => r.getBoolean(3) == (r.getDouble(1) == 1.0))
      .toDouble / out.length
    assert(acc >= 0.9, s"accuracy $acc")
    // both classes must actually be predicted (not a constant model)
    assert(out.exists(_.getBoolean(3)) && out.exists(!_.getBoolean(3)))
  }

  test("training is deterministic: two runs produce identical weights") {
    val a = Classifier.trainWeights(corpus(), 8, 5, 0.05, 10)
    val b = Classifier.trainWeights(corpus(), 8, 5, 0.05, 10)
    assert(a.toSeq == b.toSeq)
  }

  test("weights are exact decimals at scale 9 with the bias last") {
    val w = Classifier.trainWeights(corpus(), 8, 3, 0.05, 10)
    assert(w.length == 10) // 8 content + length + bias
    assert(w.forall(_.scale == 9))
    // the length-feature weight must be positive (it carries the label)
    assert(w(8).signum > 0)
  }

  test("empty corpus fails loudly, not deep in the loop") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Classifier.trainWeights(empty, 8, 3, 0.05, 10)
    }
    assert(e.getMessage.contains("empty"))
  }

  test("calibration bins partition the scored corpus; zero-weight " +
    "scores land in the 0.5 bin with frac_pos = base rate") {
    val scored = Classifier.scoreWith(corpus(), 8, 10, Array.fill(10)(0.0))
    val cal = Classifier.calibration(scored, bins = 10).collect()
    // all scores exactly 0.5 -> one bin (floor(0.5*10) = 5)
    assert(cal.length == 1 && cal.head.getInt(0) == 5)
    assert(cal.head.getLong(1) == 60L)
    assert(cal.head.getDouble(2) == 0.5)
    assert(cal.head.getDouble(3) == 0.5) // 30/60 odd docs are positive
    // a trained model spreads bins and keeps the total count
    val trained = Classifier.trainScore(corpus(), 8, 15, 0.05, 10)
    val cal2 = Classifier.calibration(trained, bins = 10).collect()
    assert(cal2.map(_.getLong(1)).sum == 60L)
    assert(cal2.length > 1)
    // score 1.0 must clamp into the last bin, never bin `bins`
    assert(cal2.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 9))
  }

  /** pure-Scala reference trainer: same featurization (md5 buckets,
    * log-TF, log-length, bias), same exact-decimal GD — no Spark
    */
  private def refTrain(texts: Seq[(Long, String)], dim: Int, rounds: Int,
                       lr: Double,
                       minWords: Int): Seq[java.math.BigDecimal] = {
    import java.math.{BigDecimal => B, RoundingMode => RM}
    def r9(x: Double): Double =
      if (x.isNaN || x.isInfinite) x
      else B.valueOf(x).setScale(9, RM.HALF_UP).doubleValue
    def dec10(x: Double): B = B.valueOf(x).setScale(10, RM.HALF_UP)
    def bucket(word: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(word.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(h, 16) % dim).toInt
    }
    val docs = texts.map(_._2.trim.split(" ").filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
      .map { w =>
        val nw = w.length.toDouble
        val counts = w.groupBy(bucket).view.mapValues(_.size).toSeq
        val fs = counts.map { case (b, c) =>
          (b, r9(math.log(1.0 + c / nw))) } ++
          Seq((dim, r9(math.log(1.0 + nw))), (dim + 1, 1.0))
        val label = if (w.length >= minWords) 1.0 else 0.0
        (label, fs)
      }
    val lrD = B.valueOf(lr)
    var w = Array.fill(dim + 2)(B.ZERO.setScale(9))
    for (_ <- 1 to rounds) {
      val g = Array.fill(dim + 2)(B.ZERO)
      docs.foreach { case (label, fs) =>
        var z = B.ZERO
        fs.foreach { case (b, x) => z = z.add(dec10(r9(x * w(b).doubleValue))) }
        val p = r9(1.0 / (1.0 + math.exp(-z.doubleValue)))
        val err = r9(label - p)
        fs.foreach { case (b, x) => g(b) = g(b).add(dec10(r9(err * x))) }
      }
      w = Array.tabulate(dim + 2)(b =>
        w(b).add(lrD.multiply(g(b)).setScale(9, RM.HALF_UP)))
    }
    w.toSeq
  }

  test("fuzzed corpora train BIT-IDENTICAL weights to the pure-Scala " +
    "reference (featurization + exact-decimal GD)") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(3, 19)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Seq("aa", "bb", "cc", "dd", "ee", "ff", "gg")
      val texts = (0L until 50L).map { id =>
        id -> (1 + rnd.nextInt(12))
          .to(1, -1).map(_ => vocab(rnd.nextInt(vocab.length)))
          .mkString(" ")
      }
      val got = Classifier.trainWeights(texts.toDF("doc_id", "text"),
        dim = 8, rounds = 6, lr = 0.02, minWords = 7).toSeq
      val ref = refTrain(texts, dim = 8, rounds = 6, lr = 0.02,
        minWords = 7)
      assert(got == ref, s"seed=$seed")
    }
  }

  /** [[refTrain]] extended with the hashed word-bigram channel: pair
    * buckets offset by dimUni, same log-TF over n_words.
    */
  private def refTrainBi(texts: Seq[(Long, String)], dimUni: Int,
                         dimBi: Int, rounds: Int, lr: Double,
                         minWords: Int): Seq[java.math.BigDecimal] = {
    import java.math.{BigDecimal => B, RoundingMode => RM}
    def r9(x: Double): Double =
      if (x.isNaN || x.isInfinite) x
      else B.valueOf(x).setScale(9, RM.HALF_UP).doubleValue
    def dec10(x: Double): B = B.valueOf(x).setScale(10, RM.HALF_UP)
    def h(s: String, m: Int): Int = {
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hx, 16) % m).toInt
    }
    val n = dimUni + dimBi + 2
    val docs = texts.map(_._2.trim.split(" ").filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
      .map { w =>
        val nw = w.length.toDouble
        val uni = w.map(h(_, dimUni))
        val bi = w.sliding(2).filter(_.length == 2)
          .map(p => dimUni + h(p.mkString(" "), dimBi)).toSeq
        val counts = (uni ++ bi).groupBy(identity)
          .view.mapValues(_.size).toSeq
        val fs = counts.map { case (b, c) =>
          (b, r9(math.log(1.0 + c / nw))) } ++
          Seq((dimUni + dimBi, r9(math.log(1.0 + nw))),
            (dimUni + dimBi + 1, 1.0))
        (if (w.length >= minWords) 1.0 else 0.0, fs)
      }
    val lrD = B.valueOf(lr)
    var w = Array.fill(n)(B.ZERO.setScale(9))
    for (_ <- 1 to rounds) {
      val g = Array.fill(n)(B.ZERO)
      docs.foreach { case (label, fs) =>
        var z = B.ZERO
        fs.foreach { case (b, x) => z = z.add(dec10(r9(x * w(b).doubleValue))) }
        val p = r9(1.0 / (1.0 + math.exp(-z.doubleValue)))
        val err = r9(label - p)
        fs.foreach { case (b, x) => g(b) = g(b).add(dec10(r9(err * x))) }
      }
      w = Array.tabulate(n)(b =>
        w(b).add(lrD.multiply(g(b)).setScale(9, RM.HALF_UP)))
    }
    w.toSeq
  }

  test("bigram channel: fuzzed corpora train bit-identical weights to " +
    "the pure-Scala reference; single-word docs have no pair features") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(5, 23)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Seq("aa", "bb", "cc", "dd", "ee")
      // lengths start at 1: the single-word docs exercise the empty
      // bigram array
      val texts = (0L until 40L).map { id =>
        id -> (1 + rnd.nextInt(10))
          .to(1, -1).map(_ => vocab(rnd.nextInt(vocab.length)))
          .mkString(" ")
      }
      val df = texts.toDF("doc_id", "text")
      val got = Classifier.weightsBigram(df, dimUni = 6, dimBi = 6,
        rounds = 5, lr = 0.02, minWords = 6).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val ref = refTrainBi(texts, 6, 6, 5, 0.02, 6)
      assert(got == ref.zipWithIndex
        .map { case (w, b) => b.toLong -> w.doubleValue }.toMap,
        s"seed=$seed")
    }
  }

  test("bigram model still learns the separable length label") {
    val out = Classifier.trainScoreBigram(corpus(), dimUni = 8, dimBi = 8,
      rounds = 15, lr = 0.05, minWords = 10).collect()
    val acc = out.count(r => r.getBoolean(3) == (r.getDouble(1) == 1.0))
      .toDouble / out.length
    assert(acc >= 0.9, s"accuracy $acc")
  }

  test("held-out composition scores exactly the val split with weights " +
    "frozen from the train split") {
    val c = corpus()
    val out = Classifier.trainScoreHeldOut(c, dim = 8, rounds = 5,
      lr = 0.05, minWords = 10, valFrac = 0.3)
    val scoredIds = out.collect().map(_.getLong(0)).toSet
    val valIds = Curation.onSplit(c, 0.3, "val").collect()
      .map(_.getLong(0)).toSet
    assert(scoredIds == valIds && scoredIds.nonEmpty)
    // equals the manual composition: train on train, score val
    val manual = Classifier.scoreWith(Curation.onSplit(c, 0.3, "val"), 8,
      10, Classifier.trainWeights(Curation.onSplit(c, 0.3, "train"), 8, 5,
        0.05, 10).map(_.doubleValue)).collect().map(_.toSeq).toSet
    assert(out.collect().map(_.toSeq).toSet == manual)
    // and the splits partition the corpus
    val trainIds = Curation.onSplit(c, 0.3, "train").collect()
      .map(_.getLong(0)).toSet
    assert((trainIds & valIds).isEmpty)
    assert(trainIds.size + valIds.size == 60)
  }

  test("threshold scan: exact accuracies per bin edge, best pick " +
    "breaks ties low") {
    val s = spark
    import s.implicits._
    // scores 0.1/0.3 negative, 0.7/0.9 positive, one 0.3 positive
    val scored = Seq(
      (0L, 0.0, 0.11), (1L, 0.0, 0.31), (2L, 1.0, 0.31),
      (3L, 1.0, 0.71), (4L, 1.0, 0.91))
      .toDF("doc_id", "label", "score")
      .withColumn("keep",
        org.apache.spark.sql.functions.col("score") >= 0.5)
    val scan = Classifier.thresholdScan(scored, bins = 10).collect()
      .map(r => r.getInt(0) -> ((r.getLong(2), r.getDouble(4)))).toMap
    assert(scan.size == 11)
    // edge 0 keeps all: correct = 3 positives
    assert(scan(0) == ((3L, 0.6)))
    // edge 4 (t=0.4): rejects 0.11/0.31/0.31 -> correct = 2 neg + 2 pos
    assert(scan(4)._1 == 4L)
    // edge 10 keeps none: correct = 2 negatives
    assert(scan(10)._1 == 2L)
    // best: edges 2..7 all score 4/5 — tie breaks to the SMALLEST edge
    val best = Classifier.bestThreshold(scored, 10).collect()(0)
    assert(best.getInt(0) == 2 && best.getLong(2) == 4L)
    // totals constant across edges
    assert(Classifier.thresholdScan(scored, 10).collect()
      .forall(_.getLong(3) == 5L))
  }

  test("threshold scan: an exact 1.0 score is KEPT at the top edge " +
    "(boundary bin, r15 advisory)") {
    val s = spark
    import s.implicits._
    val scored = Seq((1L, 1.0, 1.0), (2L, 0.0, 0.25))
      .toDF("doc_id", "label", "score")
    val scan = Classifier.thresholdScan(scored, bins = 4).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    // edge 4 (t = 1.0): keep = score >= 1.0 keeps the 1.0-positive and
    // drops the 0.25-negative — both decisions correct
    assert(scan(4) == 2L,
      s"1.0 score clamped below the top edge: $scan")
  }

  test("scoreWith against zero weights scores everything 0.5 / keep") {
    val out = Classifier.scoreWith(corpus(), 8, 10,
      Array.fill(10)(0.0)).collect()
    assert(out.forall(_.getDouble(2) == 0.5))
    assert(out.forall(_.getBoolean(3)))
  }
}
