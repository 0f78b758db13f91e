ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "teraspark"
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
// Run the test suites in PARALLEL FORKED JVMs (round 16): the
// sequential suite grew to ~28 min of wall (23 suites, 368 tests, each
// Spark-job-heavy) and the round-15 verify window truncated it
// mid-GraphSpec (VERIFY tests_ok: false with no ScalaTest summary).
// Each group is its own JVM with its own SparkContext, so suite
// isolation is UNCHANGED — this only removes the artificial
// serialization between groups. Buckets are static (balanced from the
// per-suite timings measured 2026-08-18: GraphSpec ~330 s,
// PipelineOpsSpec ~330 s, the rest grouped to match); a new suite
// lands in the catch-all bucket. 5 groups x local[4] Spark = 20
// worker threads, 5 x 8g heap — well inside the 32-core/128 GiB box.
Test / testGrouping := {
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
  val bucketOf: String => Int = {
    case "graft.GraphSpec" => 0
    case "graft.PipelineOpsSpec" => 1
    case "graft.StreamingSpec" | "graft.StoreLifecycleSpec" |
         "graft.ResourceContractSpec" | "graft.IntervalJoinSpec" => 2
    case "graft.GraftApiSpec" | "graft.BatchTxnSpec" |
         "graft.ResolveFuzzSpec" | "graft.StringJoinSpec" |
         "graft.ResolveSpec" => 3
    case _ => 4
  }
  (Test / definedTests).value.groupBy(t => bucketOf(t.name)).toSeq
    .sortBy(_._1).map { case (g, ts) =>
      Tests.Group(s"group$g", ts, Tests.SubProcess(forkOpts))
    }
}
// sbt's default restrictions cap forked test groups at 1 — lift it to
// the group count (and keep a global task ceiling)
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 5),
  Tags.limitAll(15))
// Pipe the forked run's stdout straight through instead of re-logging
// it with an "[info] " prefix: the bench driver parses the final JSON
// line of stdout, and the prefix has broken that parse every round
// (BENCH_rN.json "parsed": null since round 1).
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
