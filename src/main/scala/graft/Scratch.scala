package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** throwaway profiling scratch — not part of the library surface */
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

    t("docs.count")(docs.count())
    // mimic bench: minhash (3-shingle) pipeline warm first
    t("minhash warm")(graft.pipeline.Dedup.minhashPairs(docs, 0.5)
      .write.format("noop").mode("overwrite").save())
    // ngram stage breakdown
    val sh2 = graft.pipeline.Dedup.shingles2(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("ngram sh2 materialize")(sh2.count())
    val hashed = sh2.select(col("doc_id") +:
      (0 until 3).map(s =>
        md5(concat_ws("|", lit(s.toString), col("shingle"))).as(s"h$s")): _*)
    val mhAggs = for (s <- 0 until 3; c <- 0 until 4)
      yield min(substring(col(s"h$s"), c * 8 + 1, 8)).as(s"mh${s}_$c")
    val sig = hashed.groupBy("doc_id").agg(mhAggs.head, mhAggs.tail: _*)
    t("ngram sig")(sig.write.format("noop").mode("overwrite").save())
    t("ngram full (sh2 warm)")(graft.pipeline.Dedup.ngramJaccardPairs(docs, 0.3)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
