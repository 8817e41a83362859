package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.pipeline.{Classifier, Curation, Dedup, Dsir, TextOps}

/** The static guard for the CollapseProject blow-up class: the audit
  * must FIRE on a deliberately de-barriered `hashFeatures` (the exact
  * shape of the r14 0.45 s → 136 s incident) and stay SILENT on the
  * engine's registered lambda-heavy operators at HEAD.
  */
class PlanAuditSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs: DataFrame =
    graft.core.Tables(spark, dir, "documents")

  test("the audit catches a de-barriered hashFeatures: the inlined " +
    "bucket array re-evaluates per element") {
    // the r14 incident's shape: the derivation chain held as Scala
    // Column vals and spliced straight into its consumers (no named
    // intermediate columns, no generator barrier) — construction-time
    // inlining plants the expensive `bs`/`ends` subtrees inside the
    // per-element lambdas below
    val dim = 8
    val bs = array_sort(transform(
      filter(col("w"), x => x =!= ""), word =>
        conv(substring(md5(word), 1, 8), 16, 10).cast("long") % dim))
    val ends = filter(sequence(lit(1), size(bs)), p =>
      coalesce(get(bs, p) =!= element_at(bs, p), lit(true)))
    val starts = concat(array(lit(0)),
      slice(ends, lit(1), size(ends) - 1))
    val pairs = zip_with(ends, starts, (e, s) =>
      struct(element_at(bs, e).as("bucket"),
        (e - s).cast("long").as("n")))
    val bad = Dedup.withWords(docs)
      .where(size(col("w")) > 0)
      .select(col("doc_id"), pairs.as("fs")) // no barrier
    val hits = PlanAudit.lambdaInvariants(bad)
    assert(hits.nonEmpty,
      "expected the per-element re-evaluation finding on the " +
        "de-barriered plan")
    assert(hits.exists(_.contains("per-element re-eval")), hits.mkString("\n"))
    // the advisory duplicate lint sees the multi-spliced derivation too
    assert(PlanAudit.duplicatedExpensive(bad).nonEmpty)
  }

  test("HEAD's lambda-heavy operators carry no blow-up signature") {
    val d = docs
    val zeros10 = Array.fill(10)(0.0)
    val frames: Seq[(String, DataFrame)] = Seq(
      "hash_features" -> TextOps.hashFeatures(d, 16),
      "classifier_score" -> Classifier.scoreWith(d, 8, 55, zeros10),
      "substring_scrub" -> Dedup.substringScrub(d, 8),
      "substring_scrub_keepfirst" -> Dedup.substringScrubKeepFirst(d, 8),
      "substring_spans" -> Dedup.substringSpans(d, 8),
      "minhash_pairs" -> Dedup.minhashPairs(d, 0.5),
      "ngram_jaccard" -> Dedup.ngramJaccardPairs(d, 0.3),
      "dsir_select" -> Dsir.select(d, 16, col("lang") === "en", 50),
      "pack_tokens" -> Curation.packTokenBudget(d, 4096),
      "text_repetition" -> TextOps.repetition(d),
      "text_entropy" -> TextOps.entropy(d),
      "text_langid" -> TextOps.langid(d),
      "text_fingerprint" -> TextOps.fingerprint(d),
      "gram_counts_append" -> Dedup.gramCountsAppend(
        Dedup.gramCounts(d.where(col("doc_id") % 5 =!= 0), 8),
        d.where(col("doc_id") % 5 === 0), 8))
    frames.foreach { case (name, df) =>
      val found = PlanAudit.findings(df)
      assert(found.isEmpty,
        s"$name carries a blow-up signature:\n${found.mkString("\n")}")
    }
  }

  test("the duplicate-derivation audit counts per node, not per plan " +
    "(recomputing a table in separate scans is sanctioned)") {
    // keep-first derives the occurrence table twice BY DESIGN, in two
    // separate scan branches: duplicatedExpensive must not flag it
    assert(PlanAudit.duplicatedExpensive(
      Dedup.substringScrubKeepFirst(docs, 8)).isEmpty)
  }

  test("the small-side join lint fires on a hinted shuffle join with a " +
    "broadcastable side, and exempts full-outer and co-located shapes") {
    val s = spark
    import s.implicits._
    val big = s.range(0, 10000).toDF("k")
      .withColumn("pay", expr("repeat('x', 64)"))
    val small = Seq(1L, 2L, 3L).toDF("k").withColumn("v", lit(1))
    // the MERGE hint forces the SortMergeJoin the planner would never
    // pick over a 60-byte side — the misplan shape (in the wild it is
    // a stats misestimate upstream) the lint exists to catch
    val findings = PlanAudit.unbroadcastSmallJoins(
      big.join(small.hint("MERGE"), Seq("k")))
    assert(findings.exists(_.contains("SortMergeJoin")),
      findings.mkString("; "))
    // a threshold between the two sides' estimates: "small" stays
    // broadcastable, "big" (180 KB) does not — at the default 10 MB
    // both test frames would count as broadcastable
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "1000")
    try {
      // a full-outer join has no broadcastable side: the shuffle is
      // the correct plan, never a finding
      assert(PlanAudit.unbroadcastSmallJoins(
        big.join(small, Seq("k"), "full_outer")).isEmpty)
      // left outer with a small LEFT side: only the right side is
      // buildable, and it sits over the threshold — silent
      assert(PlanAudit.unbroadcastSmallJoins(
        small.join(big, Seq("k"), "left")).isEmpty)
    } finally s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
