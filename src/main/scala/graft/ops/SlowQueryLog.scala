package graft.ops

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.util.QueryExecutionListener

/** Slow-query debug dump — the reference's `log_slow_queries` flow
  * (src/dqe.erl:288-322: queries slower than `debug_slow`, default
  * 5000 ms, write a graphviz .dot of the operator graph plus a debug log
  * to a folder). Spark-side this is a [[QueryExecutionListener]]: every
  * finished action carries its QueryExecution and wall time; past the
  * threshold we write `<epoch-seconds>-<n>.dot` (the executed SparkPlan
  * as a graphviz digraph, edges in data-flow direction) and a matching
  * `.log` (duration, action name, formatted explain). Failed actions dump
  * too, tagged with the error — the reference tags error results on its
  * span the same way (src/dqe.erl:261-267).
  *
  * Confs (read per event, so they can be changed live):
  *   - `spark.graft.debug.slowMs`  threshold, default 5000
  *   - `spark.graft.debug.folder`  target dir, default java.io.tmpdir
  */
object SlowQueryLog {
  val SlowMsConf = "spark.graft.debug.slowMs"
  val FolderConf = "spark.graft.debug.folder"
  val DefaultSlowMs = 5000L

  private val seq = new java.util.concurrent.atomic.AtomicLong()

  /** executed plan → graphviz digraph; child → parent edges (data flow),
    * like the reference's dflow_graph:desc_to_graphviz
    */
  def dot(plan: SparkPlan): String = {
    val sb = new StringBuilder("digraph plan {\n  node [shape=box];\n")
    var id = 0
    def walk(p: SparkPlan): Int = p match {
      // adaptive wrappers hide the real tree behind zero-child nodes
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(s.plan)
      case _ =>
        val my = id
        id += 1
        val label = p.nodeName.replace("\"", "'")
        sb.append(s"""  n$my [label="$label"];\n""")
        p.children.foreach { c =>
          val ci = walk(c)
          sb.append(s"  n$ci -> n$my;\n")
        }
        my
    }
    walk(plan)
    sb.append("}\n").toString
  }

  final class Listener(spark: SparkSession) extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      maybeDump(funcName, qe, durationNs, error = None)
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit =
      maybeDump(funcName, qe, durationNs = -1L, error = Some(exception))

    private def maybeDump(funcName: String, qe: QueryExecution,
                          durationNs: Long, error: Option[Throwable]): Unit =
      try {
        val slowMs = spark.conf.getOption(SlowMsConf).map(_.toLong)
          .getOrElse(DefaultSlowMs)
        val ms = durationNs / 1000000L
        if (error.isDefined || ms > slowMs) {
          val dir = spark.conf.getOption(FolderConf)
            .getOrElse(System.getProperty("java.io.tmpdir"))
          Files.createDirectories(Paths.get(dir))
          val file = s"${System.currentTimeMillis() / 1000}-${seq.incrementAndGet()}"
          val dotPath = Paths.get(dir, s"$file.dot")
          Files.writeString(dotPath, dot(qe.executedPlan))
          val log = new StringBuilder()
            .append(s"## DOT file: $dotPath\n")
            .append(s"## action: $funcName\n")
            .append(if (ms >= 0) s"## duration_ms: $ms (slow_ms: $slowMs)\n"
                    else "## duration_ms: n/a\n")
          error.foreach(e => log.append(s"## error: ${e.getClass.getName}: ${e.getMessage}\n"))
          log.append(qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
          Files.writeString(Paths.get(dir, s"$file.log"), log.toString)
          org.slf4j.LoggerFactory.getLogger(getClass)
            .info(s"[graft] slow-query debug written to $dir/$file.log")
        }
      } catch {
        case t: Throwable => // observability must never fail the query
          System.err.println(s"[graft] slow-query dump failed: ${t.getMessage}")
      }
  }

  /** install on a session; returns the listener so callers can unregister
    * with `spark.listenerManager.unregister`
    */
  def register(spark: SparkSession): Listener = {
    val l = new Listener(spark)
    spark.listenerManager.register(l)
    l
  }
}
