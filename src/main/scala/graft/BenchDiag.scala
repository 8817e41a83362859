package graft

import java.lang.management.ManagementFactory
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession

/** In-band environment/self-diagnostics for the bench artifact.
  *
  * Motivation (rounds 8–9): the driver-box artifact twice showed queries
  * 2–20× their steady-state time with nothing in the artifact to
  * attribute the inflation — adjudicating env-vs-code took a manual
  * re-run on a quiet box. This collector makes the artifact
  * self-diagnosing: per timed run it records the task-metric deltas a
  * reader needs to separate the three inflation modes —
  *
  *   - GC pressure: `gc_task_ms` (GC elapsed inside tasks) and
  *     `gc_jvm_ms` (collector-bean delta, catches driver-side GC too)
  *     large relative to `wall_ms`;
  *   - cache eviction / recomputation: `input_bytes` or `spill_*` far
  *     above the query's quiet-box profile, `storage_used` dropping;
  *   - external box load: `cpu_ms` ≪ `task_ms` (tasks runnable but not
  *     on-core) and the 1-minute `loadavg` gauge high — corroborated by
  *     the fixed-work calibration probe the bench times between query
  *     families, whose own seconds inflate under the same pressure.
  *
  * Mechanics: a [[SparkListener]] accumulates `TaskMetrics` sums
  * (spill, GC, input, shuffle, run/CPU time) and a per-task
  * `peakExecutionMemory` max. Listener events post asynchronously, so
  * [[mark]]/[[measure]] first wait for the task-end count to match the
  * task-start count and go quiet (bounded poll) — the bench is strictly
  * sequential, so quiescence means the window's events are all counted.
  * Gauges (block-manager storage used, heap used, system loadavg) are
  * sampled at measure time.
  */
final class BenchDiag(spark: SparkSession) {
  private val tasksStarted = new AtomicLong
  private val tasksEnded = new AtomicLong
  private val spillMem = new AtomicLong
  private val spillDisk = new AtomicLong
  private val gcTaskMs = new AtomicLong
  private val inputBytes = new AtomicLong
  private val shuffleRead = new AtomicLong
  private val shuffleWrite = new AtomicLong
  private val taskMs = new AtomicLong
  private val cpuNs = new AtomicLong
  private val peakExec = new AtomicLong // max per-task since last mark()

  spark.sparkContext.addSparkListener(new SparkListener {
    override def onTaskStart(e: SparkListenerTaskStart): Unit = {
      tasksStarted.incrementAndGet(); ()
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        spillMem.addAndGet(m.memoryBytesSpilled)
        spillDisk.addAndGet(m.diskBytesSpilled)
        gcTaskMs.addAndGet(m.jvmGCTime)
        inputBytes.addAndGet(m.inputMetrics.bytesRead)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        taskMs.addAndGet(m.executorRunTime)
        cpuNs.addAndGet(m.executorCpuTime)
        peakExec.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
      }
      tasksEnded.incrementAndGet(); ()
    }
  })

  import BenchDiag.Snap

  private val jitBean = ManagementFactory.getCompilationMXBean
  private val clBean = ManagementFactory.getClassLoadingMXBean

  /** bytes used across the three JIT code-heap pools — if this saturates
    * ReservedCodeCacheSize (240 MB default), HotSpot stops or churns C2
    * compilation and hot loops run interpreted: the "CPU-bound in task
    * threads on tiny input" signature
    */
  private def codeCacheUsed: Long = {
    var t = 0L
    ManagementFactory.getMemoryPoolMXBeans.forEach { p =>
      if (p.getName.startsWith("CodeHeap")) t += p.getUsage.getUsed
    }
    t
  }

  /** current JIT code-heap usage, for the bench's headroom assertion */
  def codeCacheUsedBytes: Long = codeCacheUsed

  private def gcBeanMs: Long = {
    var t = 0L
    ManagementFactory.getGarbageCollectorMXBeans.forEach { b =>
      val c = b.getCollectionTime
      if (c > 0) t += c
    }
    t
  }

  /** Wait until the async listener bus has delivered every task-end for
    * work submitted so far: end-count equals start-count AND is stable
    * across two polls. Bounded — diagnostics must never hang the bench.
    */
  private def quiesce(maxWaitMs: Long = 2000): Unit = {
    val deadline = System.nanoTime + maxWaitMs * 1000000L
    var last = -1L
    while (System.nanoTime < deadline) {
      val s = tasksStarted.get
      val e = tasksEnded.get
      if (e == s && e == last) return
      last = e
      Thread.sleep(10)
    }
  }

  /** Start a measurement window: quiesce, snapshot cumulative counters,
    * reset the per-window peak-memory max.
    */
  def mark(): Snap = {
    quiesce()
    peakExec.set(0L)
    Snap(tasksEnded.get, spillMem.get, spillDisk.get, gcTaskMs.get,
      gcBeanMs, inputBytes.get, shuffleRead.get, shuffleWrite.get,
      taskMs.get, cpuNs.get, System.nanoTime,
      jitBean.getTotalCompilationTime, clBean.getTotalLoadedClassCount,
      codegenCount, codegenMs)
  }

  /** Spark codegen (Janino) cumulative compile count / ms, via the
    * CodegenMetrics source. The count is exact; the ms is the histogram's
    * mean × count (reservoir-sampled — close enough to attribute a storm).
    */
  private def codegenCount: Long =
    org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount
  private def codegenMs: Long = {
    val h = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME
    (h.getSnapshot.getMean * h.getCount).toLong
  }

  /** Close a window opened by [[mark]]: quiesce, return the ordered
    * (key → value) diagnostics map — counter deltas plus point-in-time
    * gauges.
    */
  def measure(m0: Snap): Seq[(String, Long)] = {
    quiesce()
    val storageUsed = spark.sparkContext.getExecutorMemoryStatus.values
      .map { case (max, remaining) => max - remaining }.sum
    val rt = Runtime.getRuntime
    Seq(
      "wall_ms" -> (System.nanoTime - m0.wallNs) / 1000000L,
      "tasks" -> (tasksEnded.get - m0.tasks),
      "task_ms" -> (taskMs.get - m0.taskMs),
      "cpu_ms" -> (cpuNs.get - m0.cpuNs) / 1000000L,
      "gc_task_ms" -> (gcTaskMs.get - m0.gcTaskMs),
      "gc_jvm_ms" -> (gcBeanMs - m0.gcJvmMs),
      "spill_mem" -> (spillMem.get - m0.spillMem),
      "spill_disk" -> (spillDisk.get - m0.spillDisk),
      "input_bytes" -> (inputBytes.get - m0.input),
      "shuffle_read" -> (shuffleRead.get - m0.sRead),
      "shuffle_write" -> (shuffleWrite.get - m0.sWrite),
      "peak_exec_mem" -> peakExec.get,
      "storage_used" -> storageUsed,
      "heap_used" -> (rt.totalMemory - rt.freeMemory),
      "loadavg_x100" -> loadAvgX100,
      // compilation attribution (round-11 instrument): a run with high
      // cpu_ms but low jit_ms + code_cache_used near ReservedCodeCacheSize
      // (240 MB) means C2 gave up / is flushing and hot loops are running
      // interpreted; high jit_ms + classes_loaded means honest first-run
      // compilation; codegen_n/_ms are the Janino (Spark codegen) share
      "jit_ms" -> (jitBean.getTotalCompilationTime - m0.jitMs),
      "classes_loaded" -> (clBean.getTotalLoadedClassCount - m0.classes),
      "codegen_n" -> (codegenCount - m0.codegenN),
      "codegen_ms" -> (codegenMs - m0.codegenMs),
      "code_cache_used" -> codeCacheUsed)
  }

  /** 1-minute system load average ×100 (long-valued so the whole diag map
    * is integral); -100 where the platform doesn't report one.
    */
  def loadAvgX100: Long =
    (ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage * 100).toLong
}

object BenchDiag {
  /** cumulative counters at a point in time (after listener quiescence) */
  final case class Snap(tasks: Long, spillMem: Long, spillDisk: Long,
                        gcTaskMs: Long, gcJvmMs: Long, input: Long,
                        sRead: Long, sWrite: Long, taskMs: Long,
                        cpuNs: Long, wallNs: Long, jitMs: Long,
                        classes: Long, codegenN: Long, codegenMs: Long)

  /** The JVM's ReservedCodeCacheSize (bytes) via the HotSpot diagnostic
    * bean; None on a VM that doesn't expose it. The bench asserts
    * headroom against this rather than assuming the build.sbt flag
    * reached the forked JVM (dropping the flag is exactly the silent
    * cliff the assertion exists to catch).
    */
  def reservedCodeCacheBytes: Option[Long] =
    try {
      val b = ManagementFactory.getPlatformMXBean(
        classOf[com.sun.management.HotSpotDiagnosticMXBean])
      Option(b.getVMOption("ReservedCodeCacheSize")).map(_.getValue.toLong)
    } catch { case _: Throwable => None }

  /** Code-cache headroom check (pure, spec-pinned): warn when JIT
    * code-heap usage crosses 80% of the reservation — past that HotSpot
    * starts flushing/refusing C2 compilations and hot loops degrade to
    * interpreted, the "CPU-bound on tiny input" signature. The settled
    * r17 drive peaked at 228 MB of 512 MB (44%); a doubled gate surface
    * or a dropped `-XX:ReservedCodeCacheSize` flag crosses the line
    * silently without this.
    */
  def codeCacheWarning(usedBytes: Long, reservedBytes: Long): Option[String] =
    if (reservedBytes > 0 && usedBytes * 5 >= reservedBytes * 4)
      Some(s"code cache at ${usedBytes / (1 << 20)} MB of " +
        s"${reservedBytes / (1 << 20)} MB reserved (>=80%) — C2 flush " +
        "risk; raise -XX:ReservedCodeCacheSize or lower " +
        "spark.sql.codegen.cache.maxEntries")
    else None

  // ---- box-state forensics (r19 verdict #4: deferred runs executed at
  // 20–50× steady while loadavg read ~2 — whatever poisoned those
  // windows was invisible to the load average, so the deferred records
  // now carry memory and IO gauges next to it). All best-effort, -1
  // where /proc is absent (non-Linux): forensics must never take a
  // measurement down.

  private def procLines(path: String): Seq[String] =
    try {
      val src = scala.io.Source.fromFile(path)
      try src.getLines().toList finally src.close()
    } catch { case _: Throwable => Seq.empty }

  /** Box-global MemAvailable (kB) from /proc/meminfo — external memory
    * pressure (a co-tenant ballooning, tmpfs fills) moves this while
    * loadavg can stay flat.
    */
  def memAvailableKb: Long =
    procLines("/proc/meminfo")
      .collectFirst { case l if l.startsWith("MemAvailable:") =>
        l.split("\\s+")(1).toLong }
      .getOrElse(-1L)

  /** Box-global cumulative iowait ticks from /proc/stat's aggregate cpu
    * line — a window poisoned by IO contention shows a tick-delta here
    * with no loadavg signature.
    */
  def iowaitTicks: Long =
    procLines("/proc/stat")
      .collectFirst { case l if l.startsWith("cpu ") =>
        val f = l.trim.split("\\s+")
        if (f.length > 5) f(5).toLong else -1L }
      .getOrElse(-1L)

  /** This JVM's cumulative major page faults from /proc/self/stat —
    * majflt across a run window means the process itself was paging
    * (memory pressure reached us, not just the box).
    */
  def selfMajorFaults: Long =
    try {
      val stat = procLines("/proc/self/stat").headOption.getOrElse("")
      // fields after the parenthesised comm: state ppid pgrp session
      // tty_nr tpgid flags minflt cminflt majflt ...
      val rest = stat.substring(stat.lastIndexOf(')') + 2).split(" ")
      if (rest.length > 9) rest(9).toLong else -1L
    } catch { case _: Throwable => -1L }
}
