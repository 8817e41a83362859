package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantic properties of the curation operators (the hash gates prove
  * engine parity; these pin the operator CONTRACTS on adversarial
  * fixtures).
  */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docsDf(rows: Seq[(Long, String, String, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
  }

  test("decontaminate flags exactly the docs sharing >= k distinct shingles") {
    val evalDoc = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = docsDf(Seq(
      (1L, evalDoc, "en", "s0"),                       // exact copy of eval
      (2L, "alpha beta gamma delta unrelated words here", "en", "s0"), // 2 shared
      (3L, "completely different content with no overlap at all", "en", "s0"),
      (97L, evalDoc, "en", "s0")))                     // the eval doc
    val train = docs.where(col("doc_id") =!= 97L)
    val eval = docs.where(col("doc_id") === 97L)
    val flagged = Curation.decontaminate(train, eval, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares all 6 shingles; doc 2 shares exactly 2 (< 3); doc 3 none
    assert(flagged == Map(1L -> 6L))
    val flaggedAt2 = Curation.decontaminate(train, eval, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flaggedAt2 == Map(1L -> 6L, 2L -> 2L))
  }

  test("ppl buckets: value-based terciles per language, head+middle kept") {
    val s = spark
    import s.implicits._
    // scores injected directly — the bucket logic, not the LM, is under test
    val docs = Seq(
      (1L, "x", "en", "s0"), (2L, "x", "en", "s0"), (3L, "x", "en", "s0"),
      (4L, "x", "en", "s0"), (5L, "x", "en", "s0"), (6L, "x", "en", "s0"),
      (10L, "x", "de", "s0"), (11L, "x", "de", "s0"), (12L, "x", "de", "s0")
    ).toDF("doc_id", "text", "lang", "source")
    val scored = Seq(
      1L -> -1.0, 2L -> -2.0, 3L -> -3.0, 4L -> -4.0, 5L -> -5.0,
      6L -> -6.0,
      10L -> -1.0, 11L -> -2.0, 12L -> -3.0
    ).toDF("doc_id", "avg_logprob")
    val out = Curation.pplBuckets(docs, scored).collect()
      .map(r => r.getLong(0) -> ((r.getString(3), r.getBoolean(4)))).toMap
    // en: n=6 -> c13 = 2nd smallest = -5, c23 = 4th = -3
    assert(out(1L) == (("head", true)) && out(2L) == (("head", true)) &&
      out(3L) == (("head", true)))
    assert(out(4L) == (("middle", true)) && out(5L) == (("middle", true)))
    assert(out(6L) == (("tail", false)))
    // de: n=3 -> c13 = 1st = -3 (everything kept), c23 = 2nd = -2
    assert(out(10L) == (("head", true)) && out(11L) == (("head", true)))
    assert(out(12L) == (("middle", true)))
  }

  test("stratified sample is deterministic and monotone in the rate") {
    val docs = docsDf((1L to 400L).map(i =>
      (i, s"doc $i", if (i % 2 == 0) "en" else "de", "s0")))
    def ids(rates: Map[String, Double]) =
      Curation.sampleStratified(docs, "lang", rates, 0.0)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val half = ids(Map("en" -> 0.5))
    assert(ids(Map("en" -> 0.5)) == half, "same rates must resample identically")
    assert(half.forall(_ % 2 == 0), "default rate 0 must exclude the other stratum")
    val bigger = ids(Map("en" -> 0.8))
    assert(half.subsetOf(bigger), "raising a rate may only ADD documents")
    // the md5 threshold tracks the rate (binomial mean 100 of 200)
    assert(half.size > 60 && half.size < 140, s"got ${half.size} of 200")
  }

  test("token packing: chunks are contiguous and respect the budget") {
    val docs = docsDf((1L to 50L).map { i =>
      val words = Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")
      (i, words, "en", if (i <= 25) "a" else "b")
    })
    val packed = Curation.packTokenBudget(docs, budget = 10)
      .orderBy("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    for (src <- Seq("a", "b")) {
      val rows = packed.filter(_._1 == src)
      // chunk ids non-decreasing in doc order, starting at 0
      assert(rows.head._4 == 0L)
      assert(rows.sliding(2).forall { case Array(p, n) => n._4 >= p._4 })
      // a doc is in chunk c iff the tokens BEFORE it total in [c*B, (c+1)*B)
      var cum = 0L
      rows.foreach { case (_, _, n, c) =>
        assert(c == cum / 10, s"doc with $cum tokens before it in chunk $c")
        cum += n
      }
    }
  }

  test("per-stratum top-k keeps exactly k best with deterministic ties") {
    val docs = docsDf((1L to 30L).map(i =>
      (i, "same text for every doc", if (i <= 15) "en" else "de", "s0")))
    // identical quality everywhere → ties broken by doc_id ascending
    val kept = Curation.topkByQuality(docs, "lang", 4)
      .select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(kept.count(_._1 == "en") == 4 && kept.count(_._1 == "de") == 4)
    assert(kept.filter(_._1 == "en").map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(kept.filter(_._1 == "de").map(_._2).sorted.toSeq == Seq(16L, 17L, 18L, 19L))
  }

  test("weighted sampling: k rows, ascending exp-keys, non-positive " +
    "weights excluded, weight dominates inclusion in aggregate") {
    val s = spark
    import s.implicits._
    // 200 light docs (w=1) and 200 heavy docs (w=50)
    val docs = ((1L to 200L).map(i => (i, 1L)) ++
      (201L to 400L).map(i => (i, 50L)) ++
      Seq((900L, 0L), (901L, -5L)))       // never sampleable
      .toDF("doc_id", "n_chars")
    val got = Curation.sampleWeighted(docs, col("n_chars"), k = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length == 100)
    val keys = got.map(_._3).toSeq
    assert(keys == keys.sorted)
    assert(!got.exists(r => r._1 >= 900L))
    // E[e_i] = 1/w: the heavy class should dominate the sample — with
    // w-ratio 50 the expected light count is ≈ 100·(200/10200)·…, far
    // below half; assert a loose majority bound, not a distribution
    assert(got.count(_._2 == 50.0) > 80,
      s"heavy class sampled only ${got.count(_._2 == 50.0)}/100")
    // deterministic rerun
    val again = Curation.sampleWeighted(docs, col("n_chars"), k = 100)
      .collect().map(_.getLong(0))
    assert(got.map(_._1).toSeq == again.toSeq)
    // capped top-k plan, not a global sort
    val plan = Curation.sampleWeighted(docs, col("n_chars"), k = 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("split assignment is a pure id function; leakage pairs orient " +
    "train->val and add no join") {
    val s = spark
    import s.implicits._
    val docs = (0L until 200L).map(i => (i, s"text $i"))
      .toDF("doc_id", "text")
    val sp = Curation.assignSplit(docs, valFrac = 0.25)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // deterministic re-run, both classes present
    val again = Curation.assignSplit(docs, valFrac = 0.25)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sp == again)
    assert(sp.values.toSet == Set("train", "val"))
    // leakage: pairs crossing the boundary, oriented (train, val);
    // same-side pairs dropped
    val crossA = sp.collectFirst {
      case (a, "train") if sp.exists(_._2 == "val") => a }.get
    val valB = sp.collectFirst { case (b, "val") => b }.get
    val trainC = sp.collectFirst {
      case (c, "train") if c != crossA => c }.get
    val pairs = Seq(
      (crossA, valB, 0.9),  // crossing, a=train
      (valB, crossA, 0.8),  // crossing, a=val (must flip)
      (crossA, trainC, 0.7) // same side: dropped
    ).toDF("doc_a", "doc_b", "jaccard")
    val leak = Curation.splitLeakage(pairs, valFrac = 0.25)
    val got = leak.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((crossA, valB, 0.9), (crossA, valB, 0.8)))
    // zero joins, zero exchanges: the audit labels each pair row-locally
    val plan = leak.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      plan.take(1500))
  }
}
