ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "shuttlespark"
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
// The forked run's stdout must reach THIS process's stdout verbatim: the
// default LoggedOutput strategy prefixes every line with "[info] ", which
// breaks any consumer that parses the benchmark's one-line JSON contract
// from captured stdout (a strict JSON parse of "[info] {...}" fails).
// StdoutOutput inherits sbt's own stdout/stderr instead — raw lines.
// runMain resolves its runner (and these fork options) from the `run`
// scope, so this covers `sbt "runMain graft.Bench"` too.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// ---- parallel forked test groups -------------------------------------
// The full suite run SEQUENTIALLY in one forked JVM measured 32m33s on
// this host (r18; all 407 tests green) — long enough to outlive a CI
// step budget, which is what the red tests gate in VERIFY_r17.json was
// (a timeout, not a failure: the captured tail holds only registry
// WARNs). Suites are split into four forked JVMs that run CONCURRENTLY:
// in-JVM execution stays sequential (testForkedParallel is off — many
// suites mutate their shared session's conf), and cross-JVM state is
// disjoint by construction (own SparkSession, own warehouse tempdir)
// except the session-published artifact roots, which get a per-group
// base dir via -Dgraft.artifact.base (see StorageOps.artifactBase).
val testGroupCount = 6
// The heaviest suites are pinned so the groups balance (per-suite totals
// measured r18 from the -oD report under 4-way concurrency, seconds:
// DedupIndex 523, Dedup 396, Curation 163, TornVersion 146,
// StorageAndAgg 120, VectorIndex 106, Admission 99, WorkerHealth 99,
// AdmissionStream 90, HotKeys 87, Caching 87, Chaos 77, Skew 75,
// LexIndex 74, GraphAnalytics 74, IngestCycle 69, GraphOps 66);
// everything else hashes round-robin.
val pinnedTestGroup = Map(
  "graft.DedupIndexSpec" -> 0,
  "graft.DedupSpec" -> 1, "graft.CachingSpec" -> 1,
  "graft.CurationSpec" -> 2, "graft.TornVersionSpec" -> 2,
  "graft.StorageAndAggSpec" -> 2, "graft.PlanShapeSpec" -> 2,
  "graft.VectorIndexSpec" -> 3, "graft.AdmissionSpec" -> 3,
  "graft.WorkerHealthSpec" -> 3, "graft.AdmissionStreamSpec" -> 3,
  "graft.ChaosSpec" -> 3,
  "graft.HotKeysSpec" -> 4, "graft.SkewSpec" -> 4,
  "graft.LexIndexSpec" -> 4, "graft.GraphAnalyticsSpec" -> 4,
  "graft.IngestCycleSpec" -> 4, "graft.GraphOpsSpec" -> 4,
  "graft.EventOpsSpec" -> 5, "graft.PrecisionGateSpec" -> 5,
  "graft.PqSpec" -> 5, "graft.PropertySpec" -> 5, "graft.BpeSpec" -> 5,
  "graft.TransitionStreamSpec" -> 5, "graft.RetrievalStreamSpec" -> 5,
  "graft.MultiModalSpec" -> 5)
Test / testGrouping := {
  val defs = (Test / definedTests).value
  val base = ForkOptions()
    .withJavaHome(javaHome.value)
    .withWorkingDirectory(Option((Test / baseDirectory).value))
  val opts = (Test / javaOptions).value.toVector
  (0 until testGroupCount).map { g =>
    Tests.Group(
      name = s"group$g",
      tests = defs.filter(t => pinnedTestGroup.getOrElse(t.name,
        math.abs(t.name.hashCode) % testGroupCount) == g),
      runPolicy = Tests.SubProcess(base.withRunJVMOptions(
        opts :+ s"-Dgraft.artifact.base=target/testgrp$g")))
  }
}
// per-test durations in the report (slow-suite regressions stay visible)
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
  Tags.limitAll(math.max(8, java.lang.Runtime.getRuntime.availableProcessors())))
