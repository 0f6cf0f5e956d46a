ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "scdatasetspark"
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
// Forked run output goes straight to stdout, NOT through sbt's logger —
// the logger prefixes every line with "[info] ", which breaks consumers
// that parse Bench's single JSON result line from stdout.
run / outputStrategy := Some(StdoutOutput)
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
// The suite set is ~100 Spark suites over tiny in-memory data; one forked
// JVM runs them SEQUENTIALLY on a local[4] session, leaving most cores of
// a 32-core host idle for the whole run (the r20 grading run was killed by
// the harness timeout mid-suite for exactly this reason).  Partition the
// suites round-robin into N forked JVMs and let sbt run the groups
// concurrently — full SparkContext isolation per group (no shared-session
// or stop() hazards), same tests, same assertions, ~N× the wall-clock.
// N scales with the host and is env-overridable (SPARK_GRAFT_TEST_GROUPS);
// heap per group stays the configured -Xmx, so 6 groups fit comfortably
// in the 128 GiB sandbox.
// Per-suite wall-clock lands in JUnit XML (target/test-reports) so the
// grouping below can be balanced from MEASURED weights, not file sizes.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest,
  "-u", "target/test-reports")
val testGroupCount: Int =
  sys.env.get("SPARK_GRAFT_TEST_GROUPS").map(_.toInt).getOrElse {
    math.max(1, math.min(6, java.lang.Runtime.getRuntime.availableProcessors / 5))
  }
// Measured per-suite wall-clock (seconds, from target/test-reports JUnit
// XML of a full 6-way run on the 32-core sandbox).  Round-robin packing
// left two straggler JVMs running alone for half the wall-clock; greedy
// longest-first bin-packing by these weights evens the groups out.  A
// suite not listed gets a small default — staleness only costs balance,
// never correctness.
val suiteWeights: Map[String, Double] = Map(
  "graft.CoreSpec" -> 297.0, "graft.OpsSpec" -> 191.0,
  "graft.R12anSpec" -> 147.0, "graft.PipelineSpec" -> 82.0,
  "graft.R16PackSpec" -> 78.0, "graft.R15StreamSpec" -> 73.0,
  "graft.R12eSpec" -> 60.0, "graft.R16ResidentKmeansSpec" -> 59.0,
  "graft.R21LayoutSpec" -> 35.0, "graft.R12ahSpec" -> 30.0,
  "graft.R12mSpec" -> 30.0, "graft.R15LakeIndexSpec" -> 22.0,
  "graft.R15QuantSpec" -> 19.0, "graft.R15UnigramSpec" -> 15.0,
  "graft.R15Lake2Spec" -> 12.0, "graft.R20IndexCompactSpec" -> 10.0,
  "graft.R16SketchSpec" -> 9.0, "graft.R14IngestSpec" -> 9.0,
  "graft.R15BpeSpec" -> 9.0, "graft.R15GraphSpec" -> 9.0,
  "graft.R12kSpec" -> 9.0, "graft.R15LakeStreamSpec" -> 9.0)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val fo = ForkOptions().withRunJVMOptions(opts)
  // greedy longest-processing-time: heaviest suite first, always into the
  // currently-lightest bin — deterministic (stable sort + name tiebreak)
  val bins = Array.fill(testGroupCount)(
    (0.0, scala.collection.mutable.ArrayBuffer.empty[sbt.TestDefinition]))
  tests.sortBy(t => (-suiteWeights.getOrElse(t.name, 6.0), t.name))
    .foreach { t =>
      val i = bins.indices.minBy(bins(_)._1)
      bins(i) = (bins(i)._1 + suiteWeights.getOrElse(t.name, 6.0),
        bins(i)._2 += t)
    }
  bins.toSeq.zipWithIndex.filter(_._1._2.nonEmpty).map { case ((_, ts), g) =>
    Tests.Group(s"group$g", ts.toSeq, Tests.SubProcess(fo))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
  Tags.limitAll(math.max(testGroupCount,
    java.lang.Runtime.getRuntime.availableProcessors)))
