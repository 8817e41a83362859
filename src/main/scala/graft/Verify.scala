package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg (dev loop only; the driver passes two): restrict
    // the dump to a comma-separated subset of query names
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // fixture pins for the sizing-DEPENDENT similarity oracles
      // (probed top-k / LSH range bake these into their SQL); unset,
      // the engine corpus-scales the index sizing (DqlArtifacts)
      .config("spark.graft.dql.sim.ncells", graft.dql.DqlArtifacts.NCells)
      .config("spark.graft.dql.sim.bits", graft.dql.DqlArtifacts.Bits)
      // generated-class cache DERIVED from the gate surface (core/Tuning;
      // the 100-entry default LRU-evicts across 334 gates, and a literal
      // here was the r17 verdict's last fixture constant)
      .config("spark.sql.codegen.cache.maxEntries",
        graft.core.Tuning.codegenCacheEntries(SparkEntry.queries.size))
      // single-tenant harness: session artifact isolation would scope the
      // generated-class cache per streaming query's cloned session and
      // re-Janino identical stream plans every run (see Bench's note)
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.2fs")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // per-query persisted intermediates (shingle/bucket tables) are
      // released here; the sanctioned memoized artifacts (series table,
      // minhash pair set) survive across queries by design
      graft.core.Caches.releaseTransient(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
