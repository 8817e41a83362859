package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream scan + filter compiler (SURVEY §1.2, §2.9; reference
  * `src/dqe_events.erl`, grammar `src/dql_parser.yrl:89-113`).
  *
  * Events are timestamped semi-structured documents; filters address dotted
  * JSON paths with `==, !=, >, >=, <, <=, ~=` under AND/OR/NOT. The
  * reference pushes the filter to its storage backend; here the filter is a
  * Catalyst `Column` predicate — Spark pushes supported parts into the
  * parquet scan, and JSON-path predicates evaluate in the codegen'd
  * projection.
  */
object Events {
  sealed trait Filter
  final case class Cmp(path: String, op: String, value: Any) extends Filter
  final case class Regex(path: String, pattern: String) extends Filter
  final case class And(fs: Seq[Filter]) extends Filter
  final case class Or(a: Filter, b: Filter) extends Filter
  final case class Not(f: Filter) extends Filter

  /** Resolve a dotted path: bare column names hit real columns; anything
    * else is a JSON path into `props`. Array indexing `seg[i]` maps to the
    * JSONPath `$.seg[i]` form.
    */
  private def pathCol(df: DataFrame, path: String): Column =
    if (df.columns.contains(path)) col(path)
    else get_json_object(col("props"), "$." + path)

  def compile(df: DataFrame, f: Filter): Column = f match {
    case Cmp(p, op, v) =>
      val c = v match {
        case _: Int | _: Long | _: Double =>
          pathCol(df, p).cast("double")
        case _ => pathCol(df, p)
      }
      val l = lit(v match {
        case i: Int => i.toDouble; case i: Long => i.toDouble
        case d: Double => d; case s: String => s
      })
      op match {
        case "==" => c === l
        case "!=" => c =!= l  // lowered to NOT == in the reference grammar
        case ">"  => c > l
        case ">=" => c >= l
        case "<"  => c < l
        case "<=" => c <= l
      }
    case Regex(p, pat) => pathCol(df, p).rlike(pat)
    case And(fs)       => fs.map(compile(df, _)).reduce(_ && _)
    case Or(a, b)      => compile(df, a) || compile(df, b)
    case Not(g)        => !compile(df, g)
  }

  /** DuckDB mirror of [[compile]] over the raw events table. */
  def sql(f: Filter, columns: Set[String]): String = {
    def path(p: String): String =
      if (columns.contains(p)) p
      else s"json_extract_string(props, '$$.$p')"
    def numPath(p: String): String =
      if (columns.contains(p)) p
      else s"CAST(json_extract_string(props, '$$.$p') AS DOUBLE)"
    f match {
      case Cmp(p, op, v) =>
        val (c, l) = v match {
          case s: String => (path(p), s"'$s'")
          case n         => (numPath(p), n.toString)
        }
        val o = if (op == "==") "=" else op
        s"($c $o $l)"
      case Regex(p, pat) => s"regexp_matches(${path(p)}, '$pat')"
      case And(fs)       => fs.map(sql(_, columns)).mkString("(", " AND ", ")")
      case Or(a, b)      => s"(${sql(a, columns)} OR ${sql(b, columns)})"
      case Not(g)        => s"(NOT ${sql(g, columns)})"
    }
  }
}
