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

  /** pipeline table-function generators (the SURVEY §7.2.11 registry),
    * REGISTRY-DRIVEN (r18 verdict #4: the hand-listed arm covered 12 of
    * the registry's spellings while the engine's surface kept widening —
    * example gates caught output drift, nothing caught grammar/registry
    * drift on the rest): one valid-argument generator per
    * `Resolver.pipelineFns` key, with a coverage assertion in the spec so
    * a registry entry without a generator fails the suite.
    *
    * Grammar note: the DQL grammar has no unary minus (reference
    * parity), so the parseable cosine domain is [0, 1] even though the
    * resolver accepts AST literals down to -1.
    */
  private def intNum(n: Long) = Num(n.toDouble, isInt = true)
  val pipelineValidArgs: Map[String, Gen[Seq[Num]]] = {
    val bound = Gen.choose(1L, 50L).map(intNum) // query vec_id bound
    val k = Gen.choose(1L, 20L).map(intNum)
    val nprobe = Gen.choose(1L, 8L).map(intNum)
    // (0, 1] and (0, 1) float fractions; [0, 1] parseable cosine
    val frac01oc = Gen.choose(1, 100).map(t => Num(t / 100.0, isInt = false))
    val frac01open = Gen.choose(1, 99).map(t => Num(t / 100.0, isInt = false))
    val cos = Gen.choose(0, 100).map(c => Num(c / 100.0, isInt = false))
    def topk2 = Gen.zip(bound, k).map { case (b, kk) => Seq(b, kk) }
    def topk3(third: Gen[Num]) = Gen.zip(bound, k, third)
      .map { case (b, kk, t) => Seq(b, kk, t) }
    def range2 = Gen.zip(bound, cos).map { case (b, c) => Seq(b, c) }
    val trainArgs = for {
      dim <- Gen.choose(8L, 64L).map(intNum)
      rounds <- Gen.choose(1L, 5L).map(intNum)
      lr <- Gen.choose(1, 500).map(t => Num(t / 100.0, isInt = false))
      minWords <- Gen.choose(1L, 20L).map(intNum)
      valFrac <- frac01open
    } yield Seq(dim, rounds, lr, minWords, valFrac)
    Map(
      "dedup_exact" -> Gen.const(Nil),
      "quality" -> Gen.const(Nil),
      "langid" -> Gen.const(Nil),
      "tokens" -> Gen.const(Nil),
      "fingerprint" -> Gen.const(Nil),
      "gopher" -> Gen.const(Nil),
      "dedup_minhash" -> frac01oc.map(Seq(_)),
      "dedup_ngram" -> frac01oc.map(Seq(_)),
      "dedup_embed" -> cos.map(Seq(_)),
      "dedup_simhash" -> Gen.choose(0L, 64L).map(h => Seq(intNum(h))),
      "dedup_hot_bands" -> Gen.choose(1L, 5000L).map(c => Seq(intNum(c))),
      "scrub" -> Gen.choose(2L, 12L).map(n => Seq(intNum(n))),
      "scrub_keepfirst" -> Gen.choose(2L, 12L).map(n => Seq(intNum(n))),
      "sim_topk" -> topk2,
      "sim_topk_brute" -> topk2,
      "sim_rrf" -> topk2,
      "sim_topk_sized" -> topk3(Gen.choose(1L, 32L).map(intNum)),
      "sim_topk_probe" -> topk3(nprobe),
      "sim_topk_sq8" -> topk3(nprobe),
      "sim_topk_pq" -> topk3(nprobe),
      "sim_range" -> range2,
      "sim_range_brute" -> range2,
      "sim_range_lsh" -> range2,
      "quality_trained" -> trainArgs,
      "threshold_scan" -> Gen.zip(trainArgs,
        Gen.choose(1L, 32L).map(intNum)).map { case (as, bins) => as :+ bins })
  }

  /** a random valid call: (spelling, call) over the whole registry */
  val pipelineValidCall: Gen[(String, FCall)] = for {
    n <- Gen.oneOf(pipelineValidArgs.keys.toSeq.sorted)
    as <- pipelineValidArgs(n)
  } yield (n, FCall(n, as))

  /** invalid calls the resolver must reject with a TYPED ResolveError
    * (never a MatchError/ClassCastException): wrong arity, or an
    * out-of-domain argument per the registry's documented signature
    */
  val pipelineInvalidCall: Gen[(String, FCall)] = {
    val arityMut: Gen[(String, FCall)] = for {
      n <- Gen.oneOf(pipelineValidArgs.keys.toSeq.sorted)
      as <- pipelineValidArgs(n)
      mutated <- Gen.oneOf(
        Gen.const(as :+ intNum(1)),              // one extra arg
        Gen.const(if (as.isEmpty) Seq(intNum(1)) else as.init)) // dropped
    } yield (n, FCall(n, mutated))
    val domainBad: Map[String, Gen[Seq[Num]]] = {
      def bad1(g: Gen[Num]) = g.map(Seq(_))
      val zero = Gen.const(intNum(0))
      val overCos = Gen.const(Num(1.5, isInt = false))
      Map(
        "dedup_minhash" -> bad1(Gen.oneOf(Num(0.0, isInt = false), Num(1.5, isInt = false))),
        "dedup_ngram" -> bad1(Gen.oneOf(Num(0.0, isInt = false), Num(1.5, isInt = false))),
        "dedup_embed" -> bad1(overCos),
        "dedup_simhash" -> bad1(Gen.const(Num(0.5, isInt = false))),
        "dedup_hot_bands" -> bad1(zero),
        "scrub" -> bad1(Gen.oneOf(intNum(1), Num(2.5, isInt = false))),
        "scrub_keepfirst" -> bad1(Gen.oneOf(intNum(1), Num(2.5, isInt = false))),
        "sim_topk" -> Gen.oneOf(Seq(intNum(0), intNum(5)),
          Seq(Num(2.5, isInt = false), intNum(5)), Seq(intNum(5), intNum(0))),
        "sim_topk_brute" -> Gen.const(Seq(intNum(0), intNum(5))),
        "sim_rrf" -> Gen.const(Seq(intNum(5), intNum(0))),
        "sim_topk_sized" -> Gen.const(Seq(intNum(5), intNum(5), intNum(0))),
        "sim_topk_probe" -> Gen.const(Seq(intNum(5), intNum(5), intNum(0))),
        "sim_topk_sq8" -> Gen.const(Seq(intNum(0), intNum(5), intNum(1))),
        "sim_topk_pq" -> Gen.const(Seq(intNum(5), intNum(0), intNum(1))),
        "sim_range" -> Gen.oneOf(Seq(intNum(0), Num(0.5, isInt = false)),
          Seq(intNum(5), Num(1.5, isInt = false))),
        "sim_range_brute" -> Gen.const(Seq(intNum(5), Num(1.5, isInt = false))),
        "sim_range_lsh" -> Gen.const(Seq(intNum(5), Num(-1.5, isInt = false))),
        "quality_trained" -> Gen.oneOf(
          Seq(intNum(0), intNum(1), Num(0.1, isInt = false), intNum(1), Num(0.5, isInt = false)),
          Seq(intNum(8), intNum(1), Num(0.0, isInt = false), intNum(1), Num(0.5, isInt = false)),
          Seq(intNum(8), intNum(1), Num(0.1, isInt = false), intNum(1), Num(1.0, isInt = false))),
        "threshold_scan" -> Gen.const(
          Seq(intNum(8), intNum(1), Num(0.1, isInt = false), intNum(1),
            Num(0.5, isInt = false), intNum(0))))
    }
    val domainMut: Gen[(String, FCall)] = for {
      n <- Gen.oneOf(domainBad.keys.toSeq.sorted)
      as <- domainBad(n)
    } yield (n, FCall(n, as))
    Gen.frequency(1 -> arityMut, 2 -> domainMut)
  }

  /** pipeline table-function queries: well-typed calls the resolver must
    * accept, standalone selectors — now spanning the FULL registry
    */
  val pipelineQuery: Gen[Query] = for {
    (_, e) <- pipelineValidCall
    tf <- timeframe
  } yield Query(Seq(Selector(e)), Map.empty, tf, None)

  /** fused-histogram queries (SURVEY §2.7): `fn(histogram(m, htv, sf, t))`
    * for the reducing fns plus `percentile(histogram(...), p)`. The
    * reference's eqc generators DISABLE histogram trees
    * (`eqc/dqe_helper.erl:248-250` commented out); this engine supports
    * them, so the random property surface covers them too (r18 verdict #4
    * breadth note). Window chosen as an exact multiple of the leaf
    * resolution, htv ≥ 1 int, sf in 1–5 — the resolver's documented
    * domain.
    */
  val histQuery: Gen[Query] = for {
    m <- leaf
    htv <- Gen.choose(1L, 10000L).map(intNum)
    sf <- Gen.choose(1L, 5L).map(intNum)
    (t, _) <- window(1000L)
    call <- Gen.frequency(
      5 -> Gen.oneOf(Resolver.histFns.toSeq).map(fn =>
        FCall(fn, Seq(FCall("histogram", Seq(m, htv, sf, t))))),
      2 -> Gen.choose(1, 100).map(p =>
        FCall("percentile", Seq(FCall("histogram", Seq(m, htv, sf, t)),
          Num(p / 100.0, isInt = false)))))
    tf <- timeframe
  } yield Query(Seq(Selector(call)), Map.empty, tf, None)
}
