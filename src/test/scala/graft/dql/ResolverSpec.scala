package graft.dql

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import Ast._
import Resolver._

/** The reference's second property (`eqc/qry_parser_eqc.erl:28-56`): every
  * generated well-typed query survives the full compile pipeline against a
  * mocked storage (resolution 1000 ms for every bucket). Plus the typed
  * error surface: overload selection, resolution conflicts, registry
  * misses.
  */
class ResolverSpec extends AnyFunSuite {
  private val res1s: String => Long = _ => 1000L

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

  test("every generated well-typed expression resolves (prop_prepare)") {
    forAllSamples(Gen.sized(sz => DqlGen.metricExpr(math.min(sz / 8, 3)))) { e =>
      val r = Resolver.resolve(e, Map.empty, res1s)
      assert(r.resMs >= 1000L)
    }
  }

  test("overload selection by argument types (src/dql_resolver.erl:65-109)") {
    def r(e: Expr) = Resolver.resolve(e, Map.empty, res1s)
    val m = Get(Seq("a"), "b")
    // min(m, 5) → clamp; min(m, 5m) → windowed agg; min(m1, m2) → combinator
    assert(r(FCall("min", Seq(m, Num(5, isInt = true))))
      .isInstanceOf[RTrans])
    assert(r(FCall("min", Seq(m, TimeLit(5, "m"))))
      .isInstanceOf[RAggr])
    assert(r(FCall("min", Seq(m, Get(Seq("c"), "b"))))
      .isInstanceOf[RComb])
  }

  test("integer percentile constants are halved (dqe_percentile_aggr:15)") {
    val m = Get(Seq("a"), "b")
    Resolver.resolve(FCall("percentile", Seq(m, Num(1, isInt = true),
      TimeLit(1, "h"))), Map.empty, res1s) match {
      case RAggr("percentile", Some(p), _, _) => assert(p == 0.5)
      case other => fail(s"unexpected: $other")
    }
  }

  test("resolution_conflict on mixed-resolution combinator children") {
    val a = FCall("avg", Seq(Get(Seq("a"), "b"), TimeLit(1, "h")))
    val b = FCall("avg", Seq(Get(Seq("c"), "b"), TimeLit(2, "h")))
    val e = intercept[ResolveError](
      Resolver.resolve(FCall("sum", Seq(a, b)), Map.empty, res1s))
    assert(e.msg.contains("resolution_conflict"))
  }

  test("window must divide input resolution") {
    val e = intercept[ResolveError](Resolver.resolve(
      FCall("avg", Seq(Get(Seq("a"), "b"), TimeLit(1500, "ms"))),
      Map.empty, res1s))
    assert(e.msg.contains("not a multiple"))
  }

  test("unknown signatures report name and types (dqe.erl not_found)") {
    val e = intercept[ResolveError](Resolver.resolve(
      FCall("frobnicate", Seq(Get(Seq("a"), "b"))), Map.empty, res1s))
    assert(e.msg.contains("frobnicate") && e.msg.contains("metric"))
  }

  test("divide-by-zero constant rejected at plan time (dqe_divide_arith:12)") {
    val e = intercept[ResolveError](Resolver.resolve(
      FCall("divide", Seq(Get(Seq("a"), "b"), Num(0, isInt = true))),
      Map.empty, res1s))
    assert(e.msg.contains("zero"))
  }

  test("alias substitution with unknown alias error (dql_alias)") {
    val q = FCall("avg", Seq(Var("base"), TimeLit(1, "h")))
    val aliases = Map("base" -> (Get(Seq("a"), "b"): Expr))
    assert(Resolver.resolve(q, aliases, res1s).isInstanceOf[RAggr])
    val e = intercept[ResolveError](
      Resolver.resolve(q, Map.empty, res1s))
    assert(e.msg.contains("base"))
  }

  test("histogram requires a reducing wrapper (SURVEY 2.7 fusion)") {
    val h = FCall("histogram",
      Seq(Get(Seq("a"), "b"), Num(1000, isInt = true), Num(3, isInt = true),
        TimeLit(1, "h")))
    assert(Resolver.resolve(FCall("percentile", Seq(h, Num(0.9, isInt = false))),
      Map.empty, res1s).isInstanceOf[RHistFn])
    val e = intercept[ResolveError](Resolver.resolve(h, Map.empty, res1s))
    assert(e.msg.contains("histogram"))
  }

  test("pipeline table functions: typed signatures and series-position " +
    "rejection (SURVEY 7.2.11 registry)") {
    def r(e: Expr) = Resolver.resolve(e, Map.empty, res1s)
    assert(r(FCall("dedup_minhash", Seq(Num(0.5, isInt = false)))) ==
      RPipeline("dedup_minhash", Seq(0.5)))
    assert(r(FCall("sim_topk",
      Seq(Num(5, isInt = true), Num(10, isInt = true)))) ==
      RPipeline("sim_topk", Seq(5.0, 10.0)))
    assert(r(FCall("dedup_exact", Nil)) == RPipeline("dedup_exact", Nil))
    // arity and range validation
    intercept[ResolveError](r(FCall("dedup_minhash", Nil)))
    intercept[ResolveError](r(FCall("dedup_minhash",
      Seq(Num(1.5, isInt = false)))))
    intercept[ResolveError](r(FCall("sim_topk",
      Seq(Num(0, isInt = true), Num(5, isInt = true)))))
    intercept[ResolveError](r(FCall("sim_topk",
      Seq(Num(2.5, isInt = false), Num(5, isInt = true)))))
    // a table function is not a series: aggr/trans/comb positions reject
    intercept[ResolveError](r(FCall("avg",
      Seq(FCall("quality", Nil), TimeLit(1, "h")))))
    intercept[ResolveError](r(FCall("abs", Seq(FCall("quality", Nil)))))
    intercept[ResolveError](r(FCall("sum",
      Seq(FCall("quality", Nil), Get(Seq("a"), "b")))))
  }
}
