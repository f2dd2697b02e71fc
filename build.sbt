ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "levelmapreducespark"
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
// Forked `run` output must reach stdout raw, NOT through sbt's logger —
// the bench driver parses the JSON line and a "[info] " prefix breaks it.
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
// Parallel forked test GROUPS: the suite is dozens of Spark-heavy specs
// whose wall-clock is dominated by driver-side fixed costs (planning,
// codegen, tiny sequential jobs) on a 32-core box where one local[4]
// session leaves everything idle. Groups are whole suites in separate
// JVMs — shared-JVM state (the one SparkSession, sys.props toggles,
// operator build memos) stays single-threaded inside each group, and a
// per-group working directory isolates cwd-derived state
// (spark-warehouse, metastore_db) across groups. Round-robin by suite
// name keeps the split deterministic. SPARK_GRAFT_TEST_GROUPS=1 restores
// the single sequential JVM.
Test / testGrouping := {
  val groups = sys.env.getOrElse("SPARK_GRAFT_TEST_GROUPS", "6").toInt
  val tests = (Test / definedTests).value
  val baseOpts = (Test / javaOptions).value.toVector
  val tgt = target.value
  tests.sortBy(_.name).zipWithIndex.groupBy(_._2 % groups).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      val wd = tgt / s"test-group-$i"
      java.nio.file.Files.createDirectories(wd.toPath)
      Tests.Group(s"group$i", ts.map(_._1),
        Tests.SubProcess(ForkOptions()
          .withWorkingDirectory(Some(wd))
          .withRunJVMOptions(baseOpts)))
    }
}
// let the forked groups actually run concurrently
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup,
    sys.env.getOrElse("SPARK_GRAFT_TEST_GROUPS", "6").toInt))
