ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dqespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The bench/verify drivers parse machine-readable JSON from the run's
// stdout tail: forked output must reach stdout RAW (no "[info] " logger
// prefix) and nothing may print after it (no "[success] Total time"
// epilogue). Both held the contract line hostage in rounds 1-2.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Shuffle-file and checkpoint IO on the host disk dominates per-task cost
// at gate scale: stack-sampling showed map tasks spending most of their
// "CPU" (thread time incl. kernel) in FileOutputStream.open/mmap/unmap for
// per-task shuffle files — ~100-300 ms of syscall overhead PER TASK on a
// loaded virtual disk, which multiplied by 32-197-task stages inflated
// whole query families 6-8x (round-10 regression). Production clusters
// point spark.local.dir at fast local SSDs; the single-box equivalent is
// tmpfs. java.io.tmpdir is Spark's default for spark.local.dir, block
// manager dirs, AND streaming temp checkpoints, so one flip covers all
// three. Guarded: falls back to the system default when /dev/shm is
// absent (measured: hist_p90 0.51 s on tmpfs vs 2.5 s on disk, same code).
val fastTmp: Seq[String] = {
  val shm = new java.io.File("/dev/shm")
  if (shm.isDirectory && shm.canWrite) {
    val d = new java.io.File(shm, "graft-tmp")
    d.mkdirs()
    Seq(s"-Djava.io.tmpdir=${d.getAbsolutePath}")
  } else Seq.empty
}
javaOptions ++= jdk17AddOpens ++ fastTmp ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // temp streaming checkpoints must not accumulate in tmpfs across the
  // gate harness's many short-lived queries
  "-Dspark.sql.streaming.forceDeleteTempCheckpointLocation=true",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // the 305-gate harness generates thousands of whole-stage-codegen
  // classes per drive; if a code-cache segment fills, HotSpot silently
  // stops compiling and fresh generated classes run interpreted — the
  // signature is identical task metrics burning several times the CPU
  // (seen once on the r15 driver box: same 453 tasks/bytes, 6.5x the
  // task-time on a rebuilt plan). Double the reserved cache as insurance.
  "-XX:ReservedCodeCacheSize=512m",
)
