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
    val n = Caches.evictArtifacts(s, "/data/v1")
    assert(n == 2)
    assert(!cache.containsKey((s, "/data/v1")))
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
}
