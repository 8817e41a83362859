package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's code-cache headroom assertion (r17 verdict #5): the
  * generated-class cache is now DERIVED from the gate surface
  * (core/Tuning) and the artifact must warn when JIT code-heap usage
  * approaches the VM reservation — the silent cliff where C2 flushes and
  * hot loops degrade to interpreted.
  */
class BenchDiagSpec extends AnyFunSuite {

  test("codegen cache entries derive from the gate surface with a floor") {
    assert(graft.core.Tuning.codegenCacheEntries(334) == 2004)
    assert(graft.core.Tuning.codegenCacheEntries(1000) == 6000)
    // focused dev runs (few gates) keep the floor, never thrash at 6×n
    assert(graft.core.Tuning.codegenCacheEntries(3) == 512)
    assert(graft.core.Tuning.codegenCacheEntries(0) == 512)
    // the shipped conf is the derivation of the REGISTERED surface
    assert(SparkEntry.queries.size > 300)
  }

  test("synthetic over-cap: the headroom warning fires at >=80% of the " +
    "reservation and stays quiet below") {
    val reserved = 512L << 20
    // below the line: quiet
    assert(BenchDiag.codeCacheWarning(reserved * 79 / 100, reserved).isEmpty)
    // at and above the line: fires, naming both sides of the ratio
    val atLine = BenchDiag.codeCacheWarning(reserved - reserved / 5, reserved)
    assert(atLine.isDefined)
    assert(atLine.get.contains("409 MB") && atLine.get.contains("512 MB"))
    assert(BenchDiag.codeCacheWarning(reserved, reserved).isDefined)
    // no reservation info → never warn (the gauge is meaningless)
    assert(BenchDiag.codeCacheWarning(reserved, 0L).isEmpty)
  }

  test("the VM reservation is readable on this JVM (the bench's gauge " +
    "has a denominator)") {
    val r = BenchDiag.reservedCodeCacheBytes
    assert(r.isDefined && r.get > 0,
      "HotSpotDiagnosticMXBean must expose ReservedCodeCacheSize")
  }
}
