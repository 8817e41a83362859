package graft.core

import java.util.concurrent.atomic.AtomicLong

/** Process-wide accumulator separating SCAFFOLDING from query work in the
  * gate harnesses (round-11 instrument; VERDICT r10 "What's missing" #3).
  *
  * The streaming gates pay fixed costs a production stream never pays per
  * query — staging replay file copies, building the one-row watermark
  * sentinel, starting and stopping a short-lived streaming query (temp
  * checkpoint dir, state-store spin-up/teardown), memory-sink table
  * management. Those seconds land inside the bench's timed region because
  * the gate function hides the whole replay behind one DataFrame call, so
  * the artifact could not show whether a slow stream gate was slow
  * MICRO-BATCH COMPUTE (a real regression) or slow scaffolding (harness
  * provisioning). Every such block is now wrapped in [[timed]]; the bench
  * snapshots [[snapshotNs]] around each run and publishes the delta as
  * `provision_ms` next to the run's task metrics, so artifact readers can
  * subtract scaffolding from the contract number per query.
  */
object Provisioning {
  private val acc = new AtomicLong

  def timed[T](body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally { acc.addAndGet(System.nanoTime() - t0); () }
  }

  def snapshotNs: Long = acc.get
}
