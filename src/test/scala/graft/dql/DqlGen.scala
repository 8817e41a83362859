package graft.dql

import org.scalacheck.Gen
import Ast._

/** Query-shape generators, ported from the reference's eqc generators
  * (`eqc/dqe_helper.erl:65-333`, SURVEY §5): sized trees of
  * get/sget/lookup leaves under aggregations, transforms, arithmetic and
  * combinators, with timeframes, limits, WHERE trees, naming and metadata.
  */
object DqlGen {
  private val name: Gen[String] = for {
    c <- Gen.alphaLowerChar
    // quote and backslash included: quoted parts may carry them (the
    // lexer has escape rules), and the parse∘unparse fixpoint must
    // survive them — the r17 review found the unparser dropped
    // backslash escaping and no generated part ever exercised it
    s <- Gen.listOfN(4,
      Gen.frequency(8 -> Gen.alphaNumChar,
        1 -> Gen.const('\\'), 1 -> Gen.const('\'')))
  } yield (c :: s).mkString

  private val unit: Gen[String] = Gen.oneOf(TimeLit.units)
  val timeLit: Gen[TimeLit] = for {
    n <- Gen.choose(1L, 100L)
    u <- unit
  } yield TimeLit(n, u)

  private val posInt: Gen[Num] = Gen.choose(1L, 1000L).map(n => Num(n.toDouble, isInt = true))
  private val posFloat: Gen[Num] =
    Gen.choose(1, 99999).map(n => Num(n / 100.0, isInt = false))
  private val const: Gen[Num] = Gen.oneOf(posInt, posFloat)

  private val path: Gen[Seq[String]] = Gen.choose(1, 3).flatMap(n =>
    Gen.listOfN(n, name))
  private val globPath: Gen[Seq[String]] = for {
    p <- path
    i <- Gen.choose(0, p.length - 1)
  } yield p.updated(i, "*")

  val tagFilter: Gen[TagFilter] = Gen.sized { sz =>
    val leaf = for {
      ns <- Gen.oneOf(Gen.const(""), name)
      k <- name; v <- name
      eq <- Gen.oneOf(true, false)
    } yield if (eq) TagEq(ns, k, v) else TagNeq(ns, k, v)
    if (sz <= 1) leaf
    else Gen.frequency(
      3 -> leaf,
      1 -> (for {
        a <- Gen.resize(sz / 2, tagFilter); b <- Gen.resize(sz / 2, tagFilter)
      } yield TagAnd(a, b)),
      1 -> (for {
        a <- Gen.resize(sz / 2, tagFilter); b <- Gen.resize(sz / 2, tagFilter)
      } yield TagOr(a, b)))
  }

  val leaf: Gen[Expr] = Gen.frequency(
    4 -> (for { p <- path; b <- name } yield Get(p, b)),
    2 -> (for { p <- globPath; b <- name } yield Get(p, b)),
    2 -> (for {
      p <- Gen.option(path); c <- name; w <- Gen.option(Gen.resize(3, tagFilter))
    } yield Lookup(p, c, w)),
    1 -> (for {
      p <- path; c <- name; w <- Gen.option(Gen.resize(3, tagFilter))
      // tag names from the store vocabulary (the eqc mock pins canned
      // index answers the same way, eqc/qry_parser_eqc.erl:81-85)
      tags <- Gen.someOf(Seq(("", "type"), ("", "user")))
        .suchThat(_.nonEmpty).map(_.toSeq)
      f <- Gen.oneOf("sum", "avg", "min", "max")
    } yield Lookup(Some(p), c, w, tags, Some(f))))

  private val aggr2Name = Gen.oneOf(Resolver.aggr2.toSeq)
  private val aggr3Name = Gen.oneOf(Resolver.aggr3.toSeq)
  private val trans1Name = Gen.oneOf(Resolver.trans1.toSeq)
  private val trans2Name = Gen.oneOf(Resolver.trans2.toSeq)
  private val combName = Gen.oneOf(Resolver.combs.toSeq)

  /** well-typed metric expressions (resolver must accept): resolution is
    * threaded through generation exactly as the reference's typed
    * generators do — aggregation windows are chosen as exact multiples of
    * the child's (coarsened) resolution, so nesting never conflicts.
    */
  def metricExpr(depth: Int): Gen[Expr] = typed(depth, 1000L).map(_._1)

  private def window(childResMs: Long): Gen[(TimeLit, Long)] =
    Gen.choose(1L, 20L).map { k =>
      val ms = childResMs * k
      val t =
        if (ms % 3600000L == 0) TimeLit(ms / 3600000L, "h")
        else if (ms % 60000L == 0) TimeLit(ms / 60000L, "m")
        else if (ms % 1000L == 0) TimeLit(ms / 1000L, "s")
        else TimeLit(ms, "ms")
      (t, ms)
    }

  private def typed(depth: Int, baseRes: Long): Gen[(Expr, Long)] =
    if (depth <= 0) leaf.map((_, baseRes))
    else Gen.frequency(
      3 -> leaf.map((_, baseRes)),
      2 -> (for {
        n <- aggr2Name; (m, r) <- typed(depth - 1, baseRes)
        (t, w) <- window(r)
      } yield (FCall(n, Seq(m, t)), w)),
      1 -> (for {
        n <- aggr3Name; (m, r) <- typed(depth - 1, baseRes)
        // percentile's constant must land in (0, 1] AFTER the
        // integer-halving rule (now resolver-validated); threshold
        // aggregates take any constant
        c <- if (n == "percentile")
          Gen.oneOf[Num](Gen.const(Num(1.0, isInt = true)),
            Gen.const(Num(2.0, isInt = true)),
            Gen.choose(1, 99).map(p => Num(p / 100.0, isInt = false)))
        else const
        (t, w) <- window(r)
      } yield (FCall(n, Seq(m, c, t)), w)),
      2 -> (for {
        n <- trans1Name; (m, r) <- typed(depth - 1, baseRes)
      } yield (FCall(n, Seq(m)), r)),
      1 -> (for {
        n <- trans2Name; (m, r) <- typed(depth - 1, baseRes); c <- const
      } yield (FCall(n, Seq(m, c)), r)),
      1 -> (for {
        n <- combName; k <- Gen.choose(2, 3)
        ms <- Gen.listOfN(k, leaf) // leaves share the base resolution
      } yield (FCall(n, ms), baseRes)))

  val point: Gen[Point] = Gen.oneOf(
    Gen.choose(1L, 2000000000000L).map(AbsMs(_)),
    Gen.const(Now),
    timeLit.map(Ago(_)))

  val timeframe: Gen[Timeframe] = Gen.oneOf(
    timeLit.map(Last(_)),
    Gen.zip(point, point).map { case (a, b) => Between(a, b) },
    Gen.zip(point, timeLit).map { case (p, t) => After(p, t) },
    Gen.zip(point, timeLit).map { case (p, t) => Before(p, t) })

  val namePartGen: Gen[NamePart] = Gen.frequency(
    3 -> name.map(NLit(_)),
    1 -> Gen.choose(1, 3).map(NPos(_)),
    1 -> Gen.zip(Gen.oneOf(Gen.const(""), name), name)
      .map { case (ns, k) => NTag(ns, k) })

  val metadata: Gen[Seq[(String, MetaVal)]] = Gen.listOfN(2,
    Gen.zip(name, Gen.oneOf(
      name.map(MStr(_)),
      posInt.map(n => MNum(n.v, n.isInt)),
      posFloat.map(n => MNum(n.v, n.isInt))))).map(_.distinctBy(_._1))

  val selector: Gen[Selector] = for {
    e <- Gen.sized(sz => metricExpr(math.min(sz / 8, 3)))
    shift <- Gen.option(timeLit)
    nm <- Gen.option(Gen.nonEmptyListOf(namePartGen).map(_.take(3)))
    md <- Gen.oneOf(Gen.const(Nil), metadata)
  } yield Selector(e, shift, nm, md)

  val limit: Gen[Limit] = for {
    top <- Gen.oneOf(true, false)
    n <- Gen.choose(1, 10)
    f <- aggr2Name
  } yield Limit(top, n, f)

  val query: Gen[Query] = for {
    sels <- Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, selector))
    tf <- timeframe
    lim <- Gen.option(limit)
  } yield Query(sels, Map.empty, tf, lim)

  /** events query generator */
  val eventFilter: Gen[EventFilter] = Gen.sized { sz =>
    val cmpOp = Gen.oneOf("==", "!=", ">", ">=", "<", "<=")
    val epath = Gen.choose(1, 2).flatMap(n => Gen.listOfN(n, name))
    val leafG: Gen[EventFilter] = Gen.frequency(
      3 -> (for {
        p <- epath; o <- cmpOp
        v <- Gen.oneOf(name.map(Left(_): Either[String, Double]),
          posInt.map(n => Right(n.v): Either[String, Double]))
      } yield ECmp(p, o, v)),
      1 -> Gen.zip(epath, name).map { case (p, pat) => ERegex(p, pat) })
    if (sz <= 1) leafG
    else Gen.frequency(
      3 -> leafG,
      1 -> Gen.zip(Gen.resize(sz / 2, eventFilter), Gen.resize(sz / 2, eventFilter))
        .map { case (a, b) => EAnd(a, b) },
      1 -> Gen.zip(Gen.resize(sz / 2, eventFilter), Gen.resize(sz / 2, eventFilter))
        .map { case (a, b) => EOr(a, b) },
      1 -> Gen.resize(sz - 1, eventFilter).map(ENot(_)))
  }

  val eventsQuery: Gen[Query] = for {
    b <- name
    f <- Gen.option(Gen.resize(4, eventFilter))
    tf <- timeframe
  } yield Query(Seq(Selector(EventsScan(b, f))), Map.empty, tf, None)

  /** pipeline table-function queries (the SURVEY §7.2.11 registry):
    * well-typed calls the resolver must accept, standalone selectors
    */
  val pipelineQuery: Gen[Query] = for {
    e <- Gen.oneOf(
      Gen.const(FCall("dedup_exact", Nil)),
      Gen.choose(1, 100).map(t =>
        FCall("dedup_minhash", Seq(Num(t / 100.0, isInt = false)))),
      Gen.const(FCall("quality", Nil)),
      Gen.const(FCall("langid", Nil)),
      Gen.choose(1L, 5000L).map(c =>
        FCall("dedup_hot_bands", Seq(Num(c.toDouble, isInt = true)))),
      Gen.choose(2L, 12L).map(n =>
        FCall("scrub", Seq(Num(n.toDouble, isInt = true)))),
      Gen.choose(2L, 12L).map(n =>
        FCall("scrub_keepfirst", Seq(Num(n.toDouble, isInt = true)))),
      Gen.zip(Gen.choose(1L, 50L), Gen.choose(1L, 20L)).map { case (nq, k) =>
        FCall("sim_topk",
          Seq(Num(nq.toDouble, isInt = true), Num(k.toDouble, isInt = true)))
      },
      Gen.zip(Gen.choose(1L, 50L), Gen.choose(1L, 20L), Gen.choose(1L, 32L))
        .map { case (nq, k, nc) =>
          FCall("sim_topk_sized",
            Seq(Num(nq.toDouble, isInt = true), Num(k.toDouble, isInt = true),
              Num(nc.toDouble, isInt = true)))
        },
      Gen.zip(Gen.choose(1L, 50L), Gen.choose(1L, 20L), Gen.choose(1L, 8L))
        .map { case (nq, k, np) =>
          FCall("sim_topk_sq8",
            Seq(Num(nq.toDouble, isInt = true), Num(k.toDouble, isInt = true),
              Num(np.toDouble, isInt = true)))
        },
      Gen.zip(Gen.choose(1L, 50L), Gen.choose(1L, 20L), Gen.choose(1L, 8L))
        .map { case (nq, k, np) =>
          FCall("sim_topk_pq",
            Seq(Num(nq.toDouble, isInt = true), Num(k.toDouble, isInt = true),
              Num(np.toDouble, isInt = true)))
        },
      // cos >= 0 only: the grammar has no unary minus (reference parity),
      // so negative literals are not DQL-expressible
      Gen.zip(Gen.choose(1L, 50L), Gen.choose(0, 99)).map { case (nq, c) =>
        FCall("sim_range",
          Seq(Num(nq.toDouble, isInt = true), Num(c / 100.0, isInt = false)))
      })
    tf <- timeframe
  } yield Query(Seq(Selector(e)), Map.empty, tf, None)
}
