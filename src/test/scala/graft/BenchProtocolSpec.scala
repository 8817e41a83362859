package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's adjudication + trust rules, pinned as pure functions
  * (BenchProtocol): these decide which number ships as the round's record,
  * so every class and corner gets an explicit case — including the r17
  * failure (env_event with load spanning run1 AND run3) and the r18
  * remedies (deferred requote, untrusted exclusion).
  */
class BenchProtocolSpec extends AnyFunSuite {
  import BenchProtocol._

  private val base = 0.15 // session probe baseline (quiet-box fixed work)

  test("env_event on a run1 outlier requotes to min(run1, run3)") {
    val a = adjudicate("run1", run1 = 12.0, run2 = 11.0, run3 = 0.8,
      siblingMedian = 0.7, probeSec = 1.2, probeBaseline = base)
    assert(a.cls == "env_event" && a.envEvent)
    assert(a.official == 0.8 && a.steady == 0.8)
  }

  test("env_event persisting through run3 still ships run3's (slow) min " +
    "- the case the deferred pass exists to requote") {
    val a = adjudicate("run1", run1 = 30.4, run2 = 29.0, run3 = 28.0,
      siblingMedian = 0.7, probeSec = 2.0, probeBaseline = base)
    assert(a.cls == "env_event")
    assert(a.official == 28.0) // still poisoned: min of two dirty runs
  }

  test("run1_abs (absolute 5s trigger) is a run1-class trigger for the " +
    "env requote rule") {
    val a = adjudicate("run1_abs", run1 = 6.0, run2 = 5.5, run3 = 1.1,
      siblingMedian = 2.4, probeSec = 1.0, probeBaseline = base)
    assert(a.cls == "env_event" && a.official == 1.1)
  }

  test("transient_warmup: probe fast, run3 back under the line; " +
    "conservative run1 stands, steady records the fastest run") {
    val a = adjudicate("run1", run1 = 4.0, run2 = 1.2, run3 = 1.0,
      siblingMedian = 1.0, probeSec = 0.16, probeBaseline = base)
    assert(a.cls == "transient_warmup" && !a.envEvent)
    assert(a.official == 4.0 && a.steady == 1.0)
  }

  test("regression: probe fast, run3 still slow; run1 stands") {
    val a = adjudicate("run1", run1 = 4.2, run2 = 4.4, run3 = 4.1,
      siblingMedian = 0.9, probeSec = 0.14, probeBaseline = base)
    assert(a.cls == "regression" && a.official == 4.2)
  }

  test("unadjudicated: run3 failed; no evidence, run1 stands") {
    val a = adjudicate("run1", run1 = 4.2, run2 = 4.0, run3 = -1.0,
      siblingMedian = 0.9, probeSec = 0.14, probeBaseline = base)
    assert(a.cls == "unadjudicated" && a.official == 4.2)
  }

  test("a FAILED adjacent probe is absent evidence, never env_event") {
    val a = adjudicate("run1", run1 = 8.0, run2 = 7.0, run3 = 7.5,
      siblingMedian = 0.9, probeSec = -1.0, probeBaseline = base)
    assert(!a.envEvent && a.cls == "regression" && a.official == 8.0)
  }

  test("run2-triggered outliers never requote the official (run1 was " +
    "never in question)") {
    val a = adjudicate("run2", run1 = 0.9, run2 = 9.0, run3 = 0.8,
      siblingMedian = 0.8, probeSec = 1.4, probeBaseline = base)
    assert(a.envEvent && a.official == 0.9)
  }

  test("deferred requote: load-flagged first number + healthy quiet " +
    "window -> the deferred run IS the official") {
    val (sec, src, trusted) = trustDecision(preOfficial = 28.0,
      preSource = "run3", loadFlagged = true, overLine = true, inflated = false,
      deferredProbe = 0.16, deferredRun = 0.9, probeBaseline = base)
    assert(sec == 0.9 && src == "deferred" && trusted)
  }

  test("an over-line official requotes from a healthy deferred window " +
    "even when its own adjacent probe missed the burst (not flagged)") {
    val (sec, src, trusted) = trustDecision(preOfficial = 6.5,
      preSource = "run1", loadFlagged = false, overLine = true, inflated = false,
      deferredProbe = 0.16, deferredRun = 2.3, probeBaseline = base)
    assert(sec == 2.3 && src == "deferred" && trusted)
  }

  test("a requote never WORSENS an official: a slower (but healthy) " +
    "deferred run leaves the first number standing") {
    val (sec, src, trusted) = trustDecision(preOfficial = 2.3,
      preSource = "run3", loadFlagged = true, overLine = false, inflated = false,
      deferredProbe = 0.16, deferredRun = 2.9, probeBaseline = base)
    assert(sec == 2.3 && src == "run3" && trusted)
  }

  test("untrusted: load-flagged but the deferred window is also " +
    "poisoned - published, excluded from the total") {
    val (sec, src, trusted) = trustDecision(preOfficial = 28.0,
      preSource = "run3", loadFlagged = true, overLine = true, inflated = false,
      deferredProbe = 1.8, deferredRun = 25.0, probeBaseline = base)
    assert(sec == 28.0 && src == "run3" && !trusted)
    // a failed deferred run is equally untrusted
    assert(!trustDecision(28.0, "run3", loadFlagged = true, overLine = true, inflated = false,
      deferredProbe = 0.16, deferredRun = -1.0, probeBaseline = base)._3)
  }

  test("an un-flagged UNDER-line suspect (genuine regression evidence " +
    "run) keeps its conservative official, trusted") {
    val (sec, src, trusted) = trustDecision(preOfficial = 4.0,
      preSource = "run1", loadFlagged = false, overLine = false, inflated = false,
      deferredProbe = 0.16, deferredRun = 3.8, probeBaseline = base)
    assert(sec == 4.0 && src == "run1" && trusted)
  }

  test("over-line official with an unhealthy deferred window is " +
    "UNTRUSTED even when not load-flagged (r19 verdict #1: text_vocab " +
    "shipped trusted at 7.27s for 0.66s of steady work through the old " +
    "fall-through)") {
    val (s2, _, t2) = trustDecision(preOfficial = 6.0,
      preSource = "run1", loadFlagged = false, overLine = true, inflated = false,
      deferredProbe = 1.8, deferredRun = 5.5, probeBaseline = base)
    assert(s2 == 6.0 && !t2)
    // a FAILED deferred run is equally an unhealthy window
    assert(!trustDecision(14.66, "run1", loadFlagged = false,
      overLine = true, inflated = false,
      deferredProbe = 0.16, deferredRun = -1.0, probeBaseline = base)._3)
  }

  test("windowHealthy is the single health definition: succeeded run + " +
    "probe at baseline") {
    assert(windowHealthy(probeSec = 0.16, runSec = 1.0, baseline = base))
    assert(!windowHealthy(probeSec = 1.8, runSec = 1.0, baseline = base))
    assert(!windowHealthy(probeSec = 0.16, runSec = -1.0, baseline = base))
    assert(!windowHealthy(probeSec = -1.0, runSec = 1.0, baseline = base))
  }

  test("probe health floors at 0.3s so sub-second jitter never flags") {
    assert(probeHealthy(0.29, baseline = 0.05))
    assert(!probeHealthy(0.31, baseline = 0.05))
    assert(probeHealthy(0.9, baseline = 0.5))
    assert(!probeHealthy(-1.0, baseline = 0.5)) // failed probe: unhealthy
  }

  test("steady folds over SUCCESSFUL runs only: a failed run1 must not " +
    "seed a negative steady past healthy run2/run3") {
    val a = adjudicate("run2", run1 = -1.0, run2 = 1.4, run3 = 1.2,
      siblingMedian = 0.9, probeSec = 0.14, probeBaseline = base)
    assert(a.steady == 1.2)
    // no successful run at all: run1 is the only (failed) evidence
    val b = adjudicate("run1", run1 = -1.0, run2 = -1.0, run3 = -1.0,
      siblingMedian = 0.9, probeSec = 0.14, probeBaseline = base)
    assert(b.steady == -1.0)
  }

  test("inflatedOfficial: official > 2x own steady above the 1s floor " +
    "is a deferred suspect (r18: aggr_avg shipped 4.12s for 0.61s work)") {
    assert(inflatedOfficial(official = 4.12, steady = 0.61))
    assert(!inflatedOfficial(official = 0.9, steady = 0.3))  // under floor
    assert(!inflatedOfficial(official = 1.5, steady = 0.9))  // under 2x
    assert(!inflatedOfficial(official = 4.0, steady = -1.0)) // no evidence
    assert(!inflatedOfficial(official = 4.0, steady = 4.0))
  }

  test("inflated official + healthy quiet window requotes to the " +
    "deferred run (the r18 load-shaped-total fix)") {
    val (sec, src, trusted) = trustDecision(preOfficial = 4.12,
      preSource = "run1", loadFlagged = false, overLine = false,
      inflated = true,
      deferredProbe = 0.16, deferredRun = 0.7, probeBaseline = base)
    assert(sec == 0.7 && src == "deferred" && trusted)
  }

  test("inflated official whose deferred run confirms the cost (cold-run " +
    "JIT, not load) keeps the conservative official — min() never worsens") {
    val (sec, src, trusted) = trustDecision(preOfficial = 4.0,
      preSource = "run1", loadFlagged = false, overLine = false,
      inflated = true,
      deferredProbe = 0.16, deferredRun = 3.9, probeBaseline = base)
    assert(sec == 3.9 && src == "deferred" && trusted)
    val (s2, src2, t2) = trustDecision(preOfficial = 4.0,
      preSource = "run1", loadFlagged = false, overLine = false,
      inflated = true,
      deferredProbe = 0.16, deferredRun = 4.3, probeBaseline = base)
    assert(s2 == 4.0 && src2 == "run1" && t2)
  }

  test("inflated official with a poisoned deferred window is UNTRUSTED " +
    "(r19 verdict #1: a suspect the deferred window could not acquit " +
    "has no defensible number; Bench retries one more window first)") {
    val (sec, src, trusted) = trustDecision(preOfficial = 4.12,
      preSource = "run1", loadFlagged = false, overLine = false,
      inflated = true,
      deferredProbe = 1.8, deferredRun = 4.0, probeBaseline = base)
    assert(sec == 4.12 && src == "run1" && !trusted)
  }

  test("settleNeeded (probe-first pauses): a healthy immediate re-probe " +
    "skips the settle wait entirely — settle_wait_ms stays 0") {
    assert(!settleNeeded(reprobeSec = 0.317, baseline = base * 2))
    assert(!settleNeeded(reprobeSec = 0.16, baseline = base))
    assert(settleNeeded(reprobeSec = 1.2, baseline = base))
    assert(settleNeeded(reprobeSec = -1.0, baseline = base)) // failed probe
  }
}
