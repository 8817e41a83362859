package graft.core

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The artifact-memo eviction hook (r14 advisory): registered
  * (session, dir)-keyed memo caches must drop — and unpersist — exactly
  * the entries scoped to the refreshed dir, so a regenerated corpus can
  * never pair with a stale frozen artifact.
  */
class CachesSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("evictArtifacts drops only the (session, dir) entries, " +
    "unpersisting frames wherever the value carries them") {
    val s = spark
    import s.implicits._
    val cache = Caches.registerArtifactCache(
      new java.util.concurrent.ConcurrentHashMap[
        (SparkSession, String), Any]())
    val tupleCache = Caches.registerArtifactCache(
      new java.util.concurrent.ConcurrentHashMap[
        (SparkSession, String, Double), Any]())
    val a = Seq(1, 2).toDF("x").persist()
    val b = Seq(3).toDF("y").persist()
    val c = Seq(4).toDF("z").persist()
    a.count(); b.count(); c.count()
    cache.put((s, "/data/v1"), a)
    cache.put((s, "/data/KEEP"), b)
    // value carrying the frame inside a product (index, meta) pair
    tupleCache.put((s, "/data/v1", 0.5), (c, 42))
    // SUB-CORPUS keys (`dir#suffix` — a store over a subset/derived
    // view of dir, e.g. the IVF refresh gate's base store) must fall
    // with the dir they derive from; a LONGER dir sharing the prefix
    // must not ("/data/v1x" is a different corpus)
    cache.put((s, "/data/v1#ivf-append-base"), 7)
    cache.put((s, "/data/v1x"), 8)
    val n = Caches.evictArtifacts(s, "/data/v1")
    assert(n == 3)
    assert(!cache.containsKey((s, "/data/v1")))
    assert(!cache.containsKey((s, "/data/v1#ivf-append-base")))
    assert(cache.containsKey((s, "/data/v1x")))
    assert(cache.containsKey((s, "/data/KEEP")))
    assert(!tupleCache.containsKey((s, "/data/v1", 0.5)))
    assert(a.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    assert(c.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    assert(b.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    // sanctioned frames lose their sanction on eviction: a second pass
    // finds nothing left
    assert(Caches.evictArtifacts(s, "/data/v1") == 0)
    b.unpersist(true)
  }

  test("end to end: a regenerated corpus dir serves a stale frozen " +
    "artifact until evictArtifacts, rebuilds fresh after") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-evict").toString
    val long1 = (1 to 20).map(i => s"w$i").mkString(" ")
    val long2 = (1 to 20).map(i => s"z$i").mkString(" ")
    def write(texts: Seq[(Long, String)]): Unit =
      texts.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def pairs() = graft.entry.PipelineQueries
      .queries("dedup_minhash")(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // v1 corpus: docs 0 and 1 identical → the near-dup pair (0, 1);
    // the gate memoizes + sanctions the pair set as its artifact
    write(Seq((0L, long1), (1L, long1), (2L, long2)))
    assert(pairs() == Set((0L, 1L)))
    // regenerate: now 1 and 2 are the duplicates. The staleness
    // contract says the frozen artifact MAY keep answering (0, 1)
    // (whether it does depends on which cached blocks survive the
    // overwrite — not pinned here); evictArtifacts is the caller's
    // GUARANTEE of a fresh rebuild:
    write(Seq((0L, long2), (1L, long1), (2L, long1)))
    assert(Caches.evictArtifacts(s, dir) >= 1,
      "the memoized pair artifact must be registered and scoped to dir")
    // no manual cacheManager.clearCache(): evictArtifacts itself
    // invalidates plan-equality caches reading the dir (recacheByPath),
    // so the hook ALONE delivers the documented guarantee (r15 advisory)
    assert(pairs() == Set((1L, 2L)), "expected a fresh rebuild")
    // and the rebuilt artifact was re-memoized: a second evict finds it
    assert(Caches.evictArtifacts(s, dir) >= 1)
  }
}
