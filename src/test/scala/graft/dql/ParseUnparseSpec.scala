package graft.dql

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import Ast._

/** The reference's primary property (`eqc/qry_parser_eqc.erl:11-26`):
  * `parse(unparse(Q)) == Q` for generated query trees, plus explicit
  * parses of the representative queries in FIXTURES.md.
  *
  * (scalatestplus isn't on the classpath, so generators are driven
  * directly: fixed seeds, growing sizes — deterministic and repeatable.)
  */
class ParseUnparseSpec extends AnyFunSuite {

  private def forAllSamples[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    var checked = 0
    var i = 0
    while (checked < n && i < n * 3) {
      val params = Gen.Parameters.default.withSize(1 + i % 40)
      gen(params, Seed(i.toLong)).foreach { a => f(a); checked += 1 }
      i += 1
    }
    assert(checked >= n / 2, s"generator exhausted: only $checked samples")
  }

  test("parse . unparse is a fixpoint on generated metric queries") {
    forAllSamples(DqlGen.query) { q =>
      val text = Unparse(q)
      val re = Parser.parse(text)
      assert(re == q, s"\n  text: $text")
    }
  }

  test("parse . unparse is a fixpoint on generated events queries") {
    forAllSamples(DqlGen.eventsQuery) { q =>
      val text = Unparse(q)
      assert(Parser.parse(text) == q, s"\n  text: $text")
    }
  }

  test("parse . unparse is a fixpoint on pipeline table-function queries") {
    forAllSamples(DqlGen.pipelineQuery, n = 100) { q =>
      val text = Unparse(q)
      assert(Parser.parse(text) == q, s"\n  text: $text")
      // and they resolve to the typed table-function node
      val r = Resolver.resolve(q.selectors.head.expr, Map.empty, _ => 1000L)
      assert(r.isInstanceOf[Resolver.RPipeline], text)
    }
  }

  test("EVERY pipeline registry spelling has a generator arm and survives " +
    "parse.unparse + typed resolution (r18 verdict #4: registry drift)") {
    // coverage assertion: a new Resolver.pipelineFns entry without a
    // generator (or a generator for a removed spelling) fails here
    assert(DqlGen.pipelineValidArgs.keySet == Resolver.pipelineFns.keySet,
      s"generator arms out of sync with the registry — only in registry: " +
        s"${(Resolver.pipelineFns.keySet -- DqlGen.pipelineValidArgs.keySet).toSeq.sorted}; " +
        s"only in generators: " +
        s"${(DqlGen.pipelineValidArgs.keySet -- Resolver.pipelineFns.keySet).toSeq.sorted}")
    for (n <- Resolver.pipelineFns.keys.toSeq.sorted)
      forAllSamples(DqlGen.pipelineValidArgs(n), n = 10) { as =>
        val q = Query(Seq(Selector(FCall(n, as))), Map.empty,
          Last(TimeLit(1, "h")), None)
        val text = Unparse(q)
        assert(Parser.parse(text) == q, s"\n  text: $text")
        val r = Resolver.resolve(q.selectors.head.expr, Map.empty, _ => 1000L)
        assert(r == Resolver.RPipeline(n, as.map(_.v)), text)
      }
  }

  test("parse . unparse is a fixpoint on fused-histogram queries, and " +
    "they resolve to RHistFn (beyond the reference eqc envelope, which " +
    "disables histogram trees - eqc/dqe_helper.erl:248-250)") {
    forAllSamples(DqlGen.histQuery, n = 100) { q =>
      val text = Unparse(q)
      assert(Parser.parse(text) == q, s"\n  text: $text")
      val r = Resolver.resolve(q.selectors.head.expr, Map.empty, _ => 1000L)
      assert(r.isInstanceOf[Resolver.RHistFn], text)
    }
  }

  test("invalid pipeline calls (wrong arity / out-of-domain args) raise a " +
    "TYPED ResolveError across the registry") {
    forAllSamples(DqlGen.pipelineInvalidCall, n = 150) { case (name, call) =>
      val e = intercept[Resolver.ResolveError](
        Resolver.resolve(call, Map.empty, _ => 1000L))
      // the reject names the spelling or quotes its documented signature
      assert(e.msg.contains(name) || e.msg.contains("("), s"$call -> ${e.msg}")
    }
  }

  test("representative reference queries parse (FIXTURES.md A)") {
    val samples = Seq(
      "SELECT avg('a'.'b'.'c' BUCKET 'bkt', 30 s) LAST 1 h",
      "SELECT sum(divide('a'.* BUCKET 'bkt', 2), 1 m) BETWEEN 1470000000000 AND NOW",
      "SELECT 'cpu' FROM 'coll' WHERE 'dc':'region' = 'eu' GROUP BY $'dc':'region' USING sum LAST 10 m",
      "SELECT derivate('a'.'b'.'c' BUCKET 'bkt') AS 'rate'.'of'.$1 METADATA {'team': 'infra'} BEFORE 2 h AGO FOR 1 h",
      "SELECT max('a'.'b'.'c' BUCKET 'bkt', 1 m) SHIFT BY 1 d LAST 1 h TOP 3 BY avg()",
      "SELECT EVENTS FROM 'logs' WHERE 'status' == 500 AND NOT 'path'.'seg'[0] ~= 'health' LAST 15 m")
    samples.foreach { s =>
      val q = Parser.parse(s)
      assert(q.selectors.nonEmpty, s)
      // and the unparsed form re-parses to the same tree
      assert(Parser.parse(Unparse(q)) == q, s)
    }
  }

  test("parser folds constant arithmetic (src/dql_parser.yrl:183-193)") {
    val q = Parser.parse("SELECT add('a' BUCKET 'b', 2 + 3 * 4) LAST 1 h")
    q.selectors.head.expr match {
      case FCall("add", Seq(_, Num(v, true))) => assert(v == 14.0)
      case other => fail(s"unexpected: $other")
    }
  }

  test("BETWEEN with reversed bounds swaps (src/dql_resolution.erl:236-240)") {
    val q = Parser.parse("SELECT 'a' BUCKET 'b' BETWEEN 2000 AND 1000")
    val store = new TestdataStore("/nonexistent")
    val c = new Compiler(null, store, nowMs = 5000L)
    assert(c.range(q.timeframe) == (1000L, 2000L))
  }

  test("lex errors carry position; parse errors name the expectation") {
    intercept[Lexer.LexError](Lexer.lex("SELECT 'unterminated"))
    val e = intercept[Parser.ParseError](
      Parser.parse("SELECT avg('a' BUCKET 'b', 1 h)"))
    assert(e.msg.contains("timeframe"))
  }
}
