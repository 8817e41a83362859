package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling scratch — not part of the library surface. Edit the
  * body to time whatever is under investigation; keep measurements honest
  * by mirroring the driver flow (cold first action = the Verify shape,
  * post-warmup = the Bench shape). Session-cold numbers are dominated by
  * per-plan codegen/JIT at test scale — profile both.
  *
  * Current investigation: dedup_ngram stage split (VERDICT r4 #2) — banded
  * candidate generation vs exact-Jaccard verification.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables(spark, sfDir, "documents")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r")
      r
    }
    def release(): Unit =
      graft.core.Caches.releaseTransient(spark, blocking = true)

    // codegen/JIT warmup on a different family so stage timings below are
    // not charged session startup
    graft.pipeline.Dedup.exact(docs).write.format("noop").mode("overwrite").save()

    // ---- stage split, bigram path (2 passes each: first-run + steady) ----
    for (run <- 1 to 2) {
      release()
      t(s"run$run shingles2 count")(
        graft.pipeline.Dedup.shingles2(docs).count())
      release()
      t(s"run$run signature (md5+groupBy) count")(
        graft.pipeline.Dedup.ngramSignatureForProfile(docs).count())
      release()
      t(s"run$run melted materialize")(
        graft.pipeline.Dedup.ngramMeltedForProfile(docs).count())
      // NO release: next step reads the warm melted cache on purpose
      t(s"run$run pairs from warm melted")(
        graft.pipeline.Dedup.ngramCandidatesForProfile(docs).count())
      release()
      t(s"run$run banded candidates count")(
        graft.pipeline.Dedup.ngramCandidatesForProfile(docs).count())
      // NO release: verify-only timing on warm candidate caches
      t(s"run$run verify-only (warm candidates)")(
        graft.pipeline.Dedup.ngramJaccardPairs(docs, 0.3)
          .orderBy("doc_a", "doc_b")
          .write.format("noop").mode("overwrite").save())
      release()
      t(s"run$run full ngramJaccardPairs")(
        graft.pipeline.Dedup.ngramJaccardPairs(docs, 0.3)
          .orderBy("doc_a", "doc_b")
          .write.format("noop").mode("overwrite").save())
      release()
    }
    spark.stop()
  }
}
