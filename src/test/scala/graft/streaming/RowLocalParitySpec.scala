package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Property tests for the ROW-LOCAL reimplementations inside the streaming
  * doc operators: both re-derive a batch computation per incoming row
  * (the banded minhash signature as array folds, the shingle overlap as a
  * Scala UDF), and any drift from the batch derivation — tokenization,
  * empty-token handling, slide bounds, hash formatting — would silently
  * break the stream/batch agreement the gates rely on. Random texts
  * include consecutive spaces (empty tokens), repeated words, and
  * length-0..2 word lists (below the shingle minimum).
  *
  * Both operators are plain DataFrame transforms, so the parity check
  * runs them in BATCH mode ([[DocStream.nearDupCandidates]] is the
  * dedup-free core exposed for exactly this).
  */
class RowLocalParitySpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** word lists over a tiny vocabulary (high collision rate → real shingle
    * overlap between texts), joined by single OR double spaces (double →
    * empty tokens, which the batch split KEEPS)
    */
  private def texts(n: Int, seed: Long): Seq[String] = {
    val vocab = Vector("ab", "cd", "ef", "gh", "ij", "kl")
    val word = Gen.oneOf(vocab)
    val sep = Gen.oneOf(" ", "  ")
    val text = for {
      len <- Gen.chooseNum(0, 10)
      ws <- Gen.listOfN(len, word)
      ss <- Gen.listOfN(math.max(len - 1, 0), sep)
    } yield ws.zipAll(ss, "", "").map { case (w, s) => w + s }.mkString.trim
    (0 until n).flatMap(i =>
      text(Gen.Parameters.default, Seed(seed + i)))
  }

  test("row-local banded signature ≡ batch: identical text always self-matches at J=1") {
    val s = spark
    import s.implicits._
    val ts = texts(40, seed = 7L)
    val corpus = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val index = graft.pipeline.Dedup.bandIndex(corpus)
    // probes: the SAME texts under shifted ids — if the row-local
    // signature matched the batch signature bit-for-bit, every probe with
    // ≥3 words collides with its corpus twin in ALL bands and verifies at
    // exactly jaccard 1.0; any derivation drift breaks all three bands
    // with overwhelming probability and the pair vanishes
    val probes = ts.zipWithIndex.map { case (t, i) => (1000L + i, t) }
      .toDF("doc_id", "text")
      .withColumn("ts", timestamp_millis(col("doc_id") * 1000L))
    val flagged = DocStream.nearDupCandidates(probes, index, threshold = 1.0)
      .where(col("match_id") === col("doc_id") - 1000L)
      .select("doc_id", "jaccard").distinct()
      .collect().map(r => (r.getLong(0) - 1000L, r.getDouble(1))).toMap
    val expect = ts.zipWithIndex.collect {
      case (t, i) if t.split(" ", -1).length >= 3 => i.toLong
    }.toSet
    assert(expect.nonEmpty, "generator produced no shingleable text")
    assert(flagged.keySet == expect,
      s"missing self-matches: ${expect -- flagged.keySet}; " +
        s"unexpected: ${flagged.keySet -- expect}")
    assert(flagged.values.forall(_ == 1.0))
  }

  test("decontaminate's text UDF ≡ the reference shingle-overlap join") {
    // r21: Curation.decontaminate (and the delegating
    // DocStream.decontaminate) ship the row-local UDF kernel, so the
    // reference side here is the explode → broadcast join →
    // count_distinct derivation the operator replaced — the exact
    // semantics the DuckDB oracle still spells
    val s = spark
    import s.implicits._
    val ts = texts(60, seed = 31L)
    val all = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val train = all.filter(_._1 % 3 != 0).toDF("doc_id", "text")
    val eval = all.filter(_._1 % 3 == 0).toDF("doc_id", "text")
    val evalSh = graft.pipeline.Dedup.shingles3(eval)
      .select("shingle").distinct()
    for (k <- Seq(1, 2)) {
      val st = graft.pipeline.Curation.decontaminate(train, eval, k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = graft.pipeline.Dedup.shingles3(train)
        .join(broadcast(evalSh), Seq("shingle"))
        .groupBy("doc_id")
        .agg(count_distinct(col("shingle")).as("n_overlap"))
        .where(col("n_overlap") >= k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(st == b, s"k=$k udf-only=${st -- b} join-only=${b -- st}")
    }
  }
}
