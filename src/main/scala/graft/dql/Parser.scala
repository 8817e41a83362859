package graft.dql

import Ast._
import Lexer._

/** Recursive-descent DQL parser (reference grammar: `src/dql_parser.yrl`,
  * precedence levels math1/math2 at `:129-160`). Constant numeric
  * arithmetic is folded here, as in the reference (`:183-193`). Infix
  * series math parses to placeholder fcalls (`__add` etc.) that the
  * resolver lowers to arithmetic or combinators by operand type
  * (`:132-158`).
  */
object Parser {
  final case class ParseError(msg: String) extends RuntimeException(msg)

  def parse(input: String): Query = new P(Lexer.lex(input)).query()

  /** 'yyyy-MM-dd', 'yyyy-MM-dd HH:mm:ss' or ISO-8601 instant → epoch ms
    * (UTC). Used for quoted date points in timeframes.
    */
  def parseDateMs(s: String): Option[Long] = {
    import java.time._
    import scala.util.Try
    Try(LocalDate.parse(s).atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli)
      .orElse(Try(LocalDateTime.parse(s.replace(' ', 'T'))
        .atZone(ZoneOffset.UTC).toInstant.toEpochMilli))
      .orElse(Try(Instant.parse(s).toEpochMilli))
      .toOption
  }

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def peek2: Tok = if (pos + 1 < toks.length) toks(pos + 1) else TEnd
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def fail(what: String): Nothing =
      throw ParseError(s"expected $what but found ${peek} (token ${pos})")

    private def expectKw(kw: String): Unit = next() match {
      case TKw(`kw`) => ()
      case _ => pos -= 1; fail(s"keyword $kw")
    }
    private def expectSym(s: String): Unit = next() match {
      case TSym(`s`) => ()
      case _ => pos -= 1; fail(s"'$s'")
    }
    private def part(): String = next() match {
      case TPart(s) => s
      case _ => pos -= 1; fail("name")
    }
    private def atKw(kw: String): Boolean = peek == TKw(kw)
    private def atSym(s: String): Boolean = peek == TSym(s)
    private def eatKw(kw: String): Boolean =
      if (atKw(kw)) { pos += 1; true } else false
    private def eatSym(s: String): Boolean =
      if (atSym(s)) { pos += 1; true } else false

    // ---------------------------------------------------------- query

    def query(): Query = {
      expectKw("SELECT")
      val sels = collection(selector _)
      val aliases: Map[String, Expr] =
        if (eatKw("ALIAS")) collection(aliasDef _).toMap else Map.empty
      val tf = timeframe()
      val lim = limit()
      peek match {
        case TEnd => Query(sels, aliases, tf, lim)
        case t    => fail(s"end of query (got $t)")
      }
    }

    private def collection[A](one: () => A): Seq[A] = {
      val buf = Seq.newBuilder[A]
      buf += one()
      while (eatSym(",")) buf += one()
      buf.result()
    }

    private def aliasDef(): (String, Expr) = {
      val n = part(); expectSym("="); (n, expr())
    }

    private def selector(): Selector = {
      val e = expr()
      val shift = if (eatKw("SHIFT")) { expectKw("BY"); Some(timeLit()) } else None
      val name = if (eatKw("AS")) Some(nameSpec()) else None
      val md = if (eatKw("METADATA")) metadata() else Nil
      Selector(e, shift, name, md)
    }

    // ------------------------------------------------------ expressions

    def expr(): Expr = addSub()

    private def fold(op: String, a: Expr, b: Expr): Expr = (a, b) match {
      // parse-time constant folding (src/dql_parser.yrl:183-193)
      case (Num(x, xi), Num(y, yi)) =>
        val v = op match {
          case "__add" => x + y; case "__sub" => x - y
          case "__mul" => x * y; case "__div" => x / y
        }
        Num(v, xi && yi && op != "__div")
      case _ => FCall(op, Seq(a, b))
    }

    private def addSub(): Expr = {
      var e = mulDiv()
      var go = true
      while (go) {
        if (eatSym("+")) e = fold("__add", e, mulDiv())
        else if (eatSym("-")) e = fold("__sub", e, mulDiv())
        else go = false
      }
      e
    }

    private def mulDiv(): Expr = {
      var e = primary()
      var go = true
      while (go) {
        if (eatSym("*")) e = fold("__mul", e, primary())
        else if (eatSym("/")) e = fold("__div", e, primary())
        else go = false
      }
      e
    }

    private def primary(): Expr = peek match {
      case TInt(v) =>
        next()
        peek match {
          case TPart(u) if TimeLit.units.contains(u) =>
            next(); TimeLit(v, u)
          case _ => Num(v.toDouble, isInt = true)
        }
      case TFloat(v) => next(); Num(v, isInt = false)
      case TSym("(") => next(); val e = expr(); expectSym(")"); e
      case TKw("EVENTS") =>
        next(); expectKw("FROM")
        val bucket = part()
        val f = if (eatKw("WHERE")) Some(eventFilter()) else None
        EventsScan(bucket, f)
      case TKw("ALL") =>
        next(); expectKw("FROM"); lookupTail(None)
      case TPart(name) =>
        peek2 match {
          case TSym("(") => next(); next(); fcallTail(name)
          case _         => pathExpr()
        }
      case TSym("*") => pathExpr()
      case t => fail(s"expression (got $t)")
    }

    private def fcallTail(name: String): Expr = {
      val args =
        if (atSym(")")) Nil
        else collection(expr _)
      expectSym(")")
      FCall(name, args)
    }

    /** metric path followed by BUCKET (get/sget) or FROM (lookup); a bare
      * single part is an alias variable reference.
      */
    private def pathExpr(): Expr = {
      val parts = Seq.newBuilder[String]
      parts += (if (eatSym("*")) "*" else part())
      while (atSym(".")) { next(); parts += (if (eatSym("*")) "*" else part()) }
      val path = parts.result()
      if (eatKw("BUCKET")) Get(path, part())
      else if (eatKw("FROM")) lookupTail(Some(path))
      else if (path.length == 1 && path.head != "*") Var(path.head)
      else fail("BUCKET or FROM after metric path")
    }

    private def lookupTail(path: Option[Seq[String]]): Expr = {
      val coll = part()
      val where = if (eatKw("WHERE")) Some(tagFilter()) else None
      val (gb, gf) =
        if (eatKw("GROUP")) {
          expectKw("BY")
          val tags = collection { () =>
            expectSym("$"); val ns = part()
            if (eatSym(":")) (ns, part()) else ("", ns)
          }
          expectKw("USING")
          (tags, Some(part()))
        } else (Nil, None)
      Lookup(path, coll, where, gb, gf)
    }

    // ------------------------------------------------------ tag filter

    private def tagFilter(): TagFilter = {
      var e = tagAnd()
      while (eatKw("OR")) e = TagOr(e, tagAnd())
      e
    }
    private def tagAnd(): TagFilter = {
      var e = tagTerm()
      while (eatKw("AND")) e = TagAnd(e, tagTerm())
      e
    }
    private def tagTerm(): TagFilter = {
      if (eatSym("(")) { val e = tagFilter(); expectSym(")"); e }
      else {
        val ns0 = part()
        val (ns, key) = if (eatSym(":")) (ns0, part()) else ("", ns0)
        if (eatSym("=")) TagEq(ns, key, part())
        else if (eatSym("!=")) TagNeq(ns, key, part())
        else fail("'=' or '!=' in tag filter")
      }
    }

    // ---------------------------------------------------- event filter

    private def eventFilter(): EventFilter = {
      var e = eventAnd()
      while (eatKw("OR")) e = EOr(e, eventAnd())
      e
    }
    private def eventAnd(): EventFilter = {
      var e = eventTerm()
      while (eatKw("AND")) e = EAnd(e, eventTerm())
      e
    }
    private def eventTerm(): EventFilter = {
      if (eatKw("NOT")) ENot(eventTerm())
      else if (eatSym("(")) { val e = eventFilter(); expectSym(")"); e }
      else {
        val p = eventPath()
        val op = next() match {
          case TSym(o @ ("==" | "!=" | ">" | ">=" | "<" | "=<" | "<=" | "~=")) => o
          case _ => pos -= 1; fail("comparison operator")
        }
        if (op == "~=") ERegex(p, part())
        else {
          val v: Either[String, Double] = next() match {
            case TPart(s)  => Left(s)
            case TInt(v)   => Right(v.toDouble)
            case TFloat(v) => Right(v)
            case _ => pos -= 1; fail("comparison value")
          }
          ECmp(p, if (op == "=<") "<=" else op, v)
        }
      }
    }
    private def eventPath(): Seq[String] = {
      val parts = Seq.newBuilder[String]
      parts += part()
      var go = true
      while (go) {
        if (eatSym(".")) parts += part()
        else if (eatSym("[")) {
          val i = next() match {
            case TInt(v) => v.toString
            case _ => pos -= 1; fail("array index")
          }
          expectSym("]")
          parts += s"[$i]"
        } else go = false
      }
      parts.result()
    }

    // ------------------------------------------------------- timeframe

    private def timeLit(): TimeLit = next() match {
      case TInt(v) => next() match {
        case TPart(u) if TimeLit.units.contains(u) => TimeLit(v, u)
        case _ => pos -= 1; fail("time unit")
      }
      case _ => pos -= 1; fail("duration")
    }

    private def point(): Point = peek match {
      case TKw("NOW") => next(); Now
      case TInt(v) =>
        // `N <unit> AGO` vs absolute ms timestamp
        peek2 match {
          case TPart(u) if TimeLit.units.contains(u) =>
            val t = timeLit(); expectKw("AGO"); Ago(t)
          case _ => next(); AbsMs(v)
        }
      // quoted date string (reference grammar accepts RFC dates):
      // 'yyyy-MM-dd' or 'yyyy-MM-dd HH:mm:ss' / ISO instant, UTC
      case TPart(s) =>
        Parser.parseDateMs(s) match {
          case Some(ms) => next(); AbsMs(ms)
          case None     => fail(s"point in time (unparseable date '$s')")
        }
      case t => fail(s"point in time (got $t)")
    }

    private def timeframe(): Timeframe =
      if (eatKw("LAST")) Last(timeLit())
      else if (eatKw("BETWEEN")) {
        val a = point(); expectKw("AND"); Between(a, point())
      }
      else if (eatKw("AFTER")) {
        val p = point(); expectKw("FOR"); After(p, timeLit())
      }
      else if (eatKw("BEFORE")) {
        val p = point(); expectKw("FOR"); Before(p, timeLit())
      }
      else fail("timeframe (LAST/BETWEEN/AFTER/BEFORE)")

    private def limit(): Option[Limit] = {
      val top = atKw("TOP")
      if (eatKw("TOP") || eatKw("BOTTOM")) {
        val n = next() match {
          case TInt(v) => v.toInt
          case _ => pos -= 1; fail("limit count")
        }
        expectKw("BY")
        val f = part()
        expectSym("("); expectSym(")")
        Some(Limit(top, n, f))
      } else None
    }

    // ---------------------------------------------------------- naming

    private def nameSpec(): Seq[NamePart] = {
      val parts = Seq.newBuilder[NamePart]
      def one(): NamePart =
        if (eatSym("$")) next() match {
          case TInt(n) => NPos(n.toInt)
          case TPart(ns) =>
            if (eatSym(":")) NTag(ns, part()) else NTag("", ns)
          case _ => pos -= 1; fail("positional or tag variable")
        }
        else NLit(part())
      parts += one()
      while (eatSym(".")) parts += one()
      parts.result()
    }

    private def metadata(): Seq[(String, MetaVal)] = {
      expectSym("{")
      val kvs = collection { () =>
        val k = part(); expectSym(":")
        val v: MetaVal = next() match {
          case TPart(s)  => MStr(s)
          case TInt(n)   => MNum(n.toDouble, isInt = true)
          case TFloat(f) => MNum(f, isInt = false)
          case _ => pos -= 1; fail("metadata value")
        }
        (k, v)
      }
      expectSym("}")
      kvs
    }
  }
}
