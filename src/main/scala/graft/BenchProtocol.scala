package graft

/** The bench's outlier-adjudication and trust decisions as PURE functions,
  * so the protocol that decides what number ships as the round's record is
  * itself spec-pinned (r18: the r17 round shipped a 30 s official for
  * 0.1 s of work because the decision rules had an unreachable corner —
  * `env_event` with load spanning both runs — that nothing exercised).
  *
  * Decision inputs are seconds (negative = the run failed / not taken).
  */
object BenchProtocol {

  /** Adjudication classes (doc in Bench's outlier block):
    *   - env_event: the adjacent fixed-work probe also ran slow — box
    *     event; official = min(run1, run3) when run1 was the outlier.
    *   - transient_warmup: probe fast AND run3 back under the trigger
    *     line — one-off session warm-up; conservative run1 stands.
    *   - regression: probe fast, run3 still slow — real; run1 stands.
    *   - unadjudicated: run3 itself failed.
    */
  final case class Adjudication(official: Double, steady: Double,
                                cls: String, envEvent: Boolean)

  /** probe health: a fixed-work probe at ≤2× the session's quiet-box
    * baseline (floored at 0.3 s so sub-second jitter never flags)
    */
  def probeHealthy(probeSec: Double, baseline: Double): Boolean =
    probeSec > 0 && probeSec <= math.max(0.3, 2 * baseline)

  def adjudicate(trigger: String, run1: Double, run2: Double,
                 run3: Double, siblingMedian: Double,
                 probeSec: Double, probeBaseline: Double): Adjudication = {
    // a FAILED probe (≤0) is absent evidence, not a slow probe: env_event
    // requotes officials, so it needs a positive slow reading
    val envEvent = probeSec > math.max(0.3, 2 * probeBaseline)
    // steady = fastest SUCCESSFUL run; a failed (≤0) run1 must not seed
    // the fold (it would ship a negative steady despite healthy run2/3) —
    // run1 is only the fallback when no run succeeded at all
    val positives = Seq(run1, run2, run3).filter(_ > 0)
    val steady = if (positives.isEmpty) run1 else positives.min
    val cls =
      if (run3 <= 0) "unadjudicated"
      else if (envEvent) "env_event"
      else if (run3 <= math.max(1.0, 3 * siblingMedian)) "transient_warmup"
      else "regression"
    val official =
      if (envEvent && trigger.startsWith("run1") && run3 > 0)
        math.min(run1, run3)
      else run1
    Adjudication(official, steady, cls, envEvent)
  }

  /** A deferred window is healthy evidence only when the run succeeded
    * AND its adjacent fixed-work probe read at the quiet-box baseline —
    * the single definition Bench's retry queue and [[trustDecision]]
    * both consult, so "needs another window" and "window was good"
    * can never drift apart.
    */
  def windowHealthy(probeSec: Double, runSec: Double,
                    baseline: Double): Boolean =
    runSec > 0 && probeHealthy(probeSec, baseline)

  /** Post-sweep trust decision for a deferred-re-run suspect (r17 verdict
    * items 1b/1d): a HEALTHY deferred quiet-window run (probe at
    * baseline, run succeeded) requotes the official when the first
    * number was load-flagged OR over the 5 s slow line — an over-line
    * run1 whose adjacent probe happened to land in a gap of a BURSTY
    * co-tenant reads as clean (r18 observed: tpch_q1 at 6.5 s / 6.3
    * CPU-s for 1.5 s of quiet work, probe fast on both sides), and two
    * independent quiet observations under the same cold-plan discipline
    * beat one hot one. The requote takes min(first, deferred) so a
    * deferred run that caught its own noise never WORSENS an official.
    *
    * When NO healthy window exists, ANY suspect class — load-flagged,
    * over-line, or inflated — is UNTRUSTED (published with its
    * best-known value but excluded from the contract total). r19 closed
    * only the load-flagged arm and the fall-through shipped
    * `text_bigrams` TRUSTED at 14.66 s (6.3× its own 2.33 s steady,
    * deferred probe 11.6 s = window poisoned, run discarded) and
    * `text_vocab` at 7.27 s (11× steady) inside the contract total
    * (r19 verdict #1). A suspect without clean evidence has no
    * defensible number: the conservative official is KNOWN to carry
    * load (that's what made it a suspect) and the deferred window
    * could not acquit it. Bench grants each such gate one RETRY window
    * at end of drive before this demotion fires, so untrusted is the
    * last resort, not the first response.
    *
    * @return (official seconds, source tag, trusted?)
    */
  def trustDecision(preOfficial: Double, preSource: String,
                    loadFlagged: Boolean, overLine: Boolean,
                    inflated: Boolean,
                    deferredProbe: Double, deferredRun: Double,
                    probeBaseline: Double): (Double, String, Boolean) = {
    val healthy = windowHealthy(deferredProbe, deferredRun, probeBaseline)
    if ((loadFlagged || overLine || inflated) && healthy) {
      if (deferredRun < preOfficial) (deferredRun, "deferred", true)
      else (preOfficial, preSource, true)
    }
    else if (loadFlagged || overLine || inflated)
      (preOfficial, preSource, false)
    else (preOfficial, preSource, true)
  }

  /** Inflation suspect rule (r18 verdict #1: the driver total summed run1
    * officials taken at loadavg 3–13 — `aggr_avg` shipped trusted at
    * 4.12 s for 0.61 s of quiet work — because the deferred pass only
    * fired over the 5 s line or on an env_event above 1 s; persistent
    * mid-band load on sub-5 s gates never requoted). An official more
    * than 2× the gate's OWN steady (fastest successful run) with a 1 s
    * absolute floor is a deferred-re-run suspect.
    *
    * Known, accepted semantic shift (r19 review): the deferred run is a
    * FRESH PLAN in a warm JVM, so for a gate whose run1/run2 gap is
    * legitimate first-execution JIT of its generated classes (not load),
    * the deferred run lands near run2 and min() requotes the official to
    * a warm measurement. This is the r18 verdict's explicitly chosen
    * trade ("two independent quiet observations under the same cold-plan
    * discipline beat one hot one" — the over-line requote has worked
    * this way since r18): within one JVM, load-inflation and JIT cost
    * are indistinguishable (the loadavg annotation cannot discriminate —
    * the bench's own 32-thread work reads 1.6–11.6 on a QUIET box,
    * measured r19), and a warm-but-honest number beats a cold-but-maybe-
    * poisoned one in the contract total. First-execution cost stays
    * visible per gate: the detail artifact keeps run1/run2/run3 and
    * marks the requote with `source: "deferred"`.
    */
  def inflatedOfficial(official: Double, steady: Double): Boolean =
    official > 1.0 && steady > 0 && official > 2 * steady

  /** Mid-run pause rule (r18 verdict: `pauses[0]` burned its full 90 s
    * settle budget at the `comb` boundary when its own re-probe then
    * read healthy in 0.317 s). Probe-first, exactly like the deferred
    * pass: a slow boundary probe triggers an immediate RE-probe, and the
    * settle wait is spent only when the re-probe is also unhealthy — a
    * healthy re-probe means the slow reading was a blip and the sweep
    * proceeds with `settle_wait_ms: 0`.
    */
  def settleNeeded(reprobeSec: Double, baseline: Double): Boolean =
    !probeHealthy(reprobeSec, baseline)
}
