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

  test("eviction predicate vs fuzzed key shapes: exactly the keys with " +
    "a session element and a dir / dir#suffix string element fall") {
    // r17 verdict #6: refresh-invalidation correctness hangs on the
    // `dir#suffix` SUB-CORPUS string convention — any future artifact
    // key that embeds the path differently must not SILENTLY escape
    // eviction. This pins the predicate against generated key shapes:
    //   evicted(key) ⟺ key is a Product with (∃ element eq session) ∧
    //                   (∃ string element s: s == dir ∨ s.startsWith(dir+"#"))
    // so near-miss spellings (dir+"/x", dir+"x", "#"+dir, dir embedded
    // mid-string, dir without a session element, non-product keys) all
    // correctly SURVIVE — an artifact keyed that way is outside the
    // convention and a spec failure here is the loud signal the
    // convention needs extending, not a silent stale pairing.
    val s = spark
    val other = s.newSession()
    val dir = s"/fuzz/corpus-${java.util.UUID.randomUUID().toString.take(8)}"
    val cache = Caches.registerArtifactCache(
      new java.util.concurrent.ConcurrentHashMap[Any, Any]())
    val rnd = new scala.util.Random(181818L)
    // string pool: matching spellings and near-misses of the convention
    def strings(): String = rnd.nextInt(8) match {
      case 0 => dir
      case 1 => dir + "#" + rnd.alphanumeric.take(4).mkString // sub-corpus
      case 2 => dir + "/" + rnd.alphanumeric.take(4).mkString // child path
      case 3 => dir + rnd.alphanumeric.take(3).mkString       // longer dir
      case 4 => "#" + dir                                     // suffix-side
      case 5 => s"/pre$dir"                                   // embedded
      case 6 => dir.stripSuffix(dir.takeRight(2))             // shorter
      case _ => "/fuzz/other-" + rnd.alphanumeric.take(6).mkString
    }
    def matchingString(x: Any): Boolean = x match {
      case str: String => str == dir || str.startsWith(dir + "#")
      case _ => false
    }
    val keys: Seq[Any] = (0 until 300).map { i =>
      val arity = 1 + rnd.nextInt(4)
      val elems: Seq[Any] = (0 until arity).map { _ =>
        rnd.nextInt(5) match {
          case 0 => s
          case 1 => other
          case 2 => strings()
          case 3 => rnd.nextInt(100): java.lang.Integer
          case _ => rnd.nextDouble(): java.lang.Double
        }
      }
      val key: Any = (rnd.nextInt(6), elems) match {
        case (0, Seq(a)) => a // bare (non-product) key
        case (_, Seq(a)) => Tuple1(a)
        case (_, Seq(a, b)) => (a, b)
        case (_, Seq(a, b, c)) => (a, b, c)
        case (_, es) => (es(0), es(1), es(2), es(3))
      }
      cache.put(key, i)
      key
    }.distinct
    val expectEvicted = keys.filter {
      case p: Product =>
        p.productIterator.exists(_.asInstanceOf[AnyRef] eq s) &&
          p.productIterator.exists(matchingString)
      case _ => false // bare keys carry no session scope: never evicted
    }.toSet
    assert(expectEvicted.nonEmpty && expectEvicted.size < keys.size,
      "fuzz must generate both evicted and surviving shapes")
    Caches.evictArtifacts(s, dir)
    val survivors = {
      val b = Seq.newBuilder[Any]
      cache.keySet().forEach(k => { b += k; () })
      b.result().toSet
    }
    val wronglyKept = expectEvicted.intersect(survivors)
    val wronglyEvicted = keys.toSet.diff(expectEvicted).diff(survivors)
    assert(wronglyKept.isEmpty, s"escaped eviction: $wronglyKept")
    assert(wronglyEvicted.isEmpty, s"over-evicted: $wronglyEvicted")
    cache.clear()
  }
}
