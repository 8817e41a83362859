package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Dev probe: histogram of streaming-DQL rejection reasons over the fuzz
  * generator, to find the biggest liftable mass.
  */
object StreamRejectProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[SeriesStream.Ev]
    val counts = scala.collection.mutable.Map[String, Int]()
      .withDefaultValue(0)
    var compiled = 0; var i = 0; var total = 0
    while (total < 120 && i < 400) {
      val params = Gen.Parameters.default.withSize(1 + i % 30)
      graft.dql.DqlGen.query(params, Seed(i.toLong)).foreach { q0 =>
        val q = if (i % 2 == 0) q0
          else q0.copy(selectors = Seq(q0.selectors.head.copy(shift = None)),
            limit = None)
        val text = graft.dql.Unparse(q)
        try {
          StreamingDql.compile(in.toDF(), text, "10 seconds")
          compiled += 1
        } catch {
          case e: StreamingDql.Unstreamable =>
            counts(e.msg.take(60)) += 1
          case e: graft.dql.Resolver.ResolveError =>
            counts("RESOLVE: " + e.msg.take(50)) += 1
        }
        total += 1
      }
      i += 1
    }
    println(s"[probe] compiled=$compiled total=$total")
    counts.toSeq.sortBy(-_._2).foreach { case (m, c) =>
      println(f"[probe] $c%3d  $m")
    }
    spark.stop()
  }
}
