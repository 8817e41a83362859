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
          // try_cast, not cast: a JSON prop holding a non-numeric
          // value ("N/A") must read as a non-match (NULL comparison),
          // not a CAST_INVALID_INPUT that aborts the scan under
          // Spark 4's default ANSI mode (r17 review); the mirror uses
          // TRY_CAST for the same filter-as-non-match semantics
          pathCol(df, p).try_cast("double")
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
    // literal values and regex patterns splice into single-quoted SQL:
    // escape quotes (doubled per the SQL standard) so a value like
    // "it's" cannot break — or redirect — the oracle query (r17
    // review; same class as the Unparse.q fix)
    def esc(s: String): String = s.replace("'", "''")
    def path(p: String): String =
      if (columns.contains(p)) p
      else s"json_extract_string(props, '$$.${esc(p)}')"
    def numPath(p: String): String =
      if (columns.contains(p)) p
      else s"TRY_CAST(json_extract_string(props, '$$.${esc(p)}') AS DOUBLE)"
    f match {
      case Cmp(p, op, v) =>
        val (c, l) = v match {
          case s: String => (path(p), s"'${esc(s)}'")
          case n         => (numPath(p), n.toString)
        }
        val o = if (op == "==") "=" else op
        s"($c $o $l)"
      case Regex(p, pat) => s"regexp_matches(${path(p)}, '${esc(pat)}')"
      case And(fs)       => fs.map(sql(_, columns)).mkString("(", " AND ", ")")
      case Or(a, b)      => s"(${sql(a, columns)} OR ${sql(b, columns)})"
      case Not(g)        => s"(NOT ${sql(g, columns)})"
    }
  }
}
