package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
object DebugMulti {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions","2")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def ev(sec: Long, v: Double) =
      graft.streaming.SeriesStream.Ev(new Timestamp(sec*1000), "purchase", 1L, v)
    val dql = "SELECT avg('purchase'.'1' BUCKET 'testdata', 1 m), " +
      "max('purchase'.'1' BUCKET 'testdata', 1 m) LAST 1 h"
    for (slotExact <- Seq(true, false)) {
      spark.conf.set("spark.graft.streaming.slotExact", slotExact.toString)
      val in = MemoryStream[graft.streaming.SeriesStream.Ev]
      val out = graft.streaming.StreamingDql.compile(in.toDF(), dql, "0 seconds")
      val q = out.writeStream.format("memory").queryName(s"dbg$slotExact")
        .outputMode("append").start()
      in.addData(ev(0,1), ev(10,3), ev(20,8))
      in.addData(ev(200,0))
      q.processAllAvailable()
      println(s"[dbg] slotExact=$slotExact rows:")
      spark.table(s"dbg$slotExact").collect().foreach(r => println("[dbg]   " + r))
      q.recentProgress.foreach { p =>
        println(s"[dbg]   batch=${p.batchId} wm=${p.eventTime.get("watermark")} stateOps=" +
          p.stateOperators.map(so => s"${so.operatorName}:rows=${so.numRowsTotal}").mkString(" | "))
      }
      q.stop()
    }
    spark.conf.unset("spark.graft.streaming.slotExact")
    spark.stop()
  }
}
