ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nsq2kinesisspark"
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
// Forked-run output passes through UNPREFIXED: the driver tails sbt stdout
// and parses the last JSON line out of a 2000-char window; sbt's default
// LoggedOutput prefixes every child line with "[info] ", which defeated the
// parse in every BENCH_r*.json through r18 ("parsed": null). StdoutOutput
// hands the child process the parent's stdout directly.
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

// The *ClusterSpec suites own local-cluster[2,1,*] SparkContexts, which
// cannot coexist with the shared local[4] session the other suites use —
// give them their own forked JVM (the multi-JVM harness cluster-mode
// behavior needs; suites in the group run sequentially, each creating and
// stopping its own context). SPARK_HOME lets the in-JVM standalone Worker
// launch executors.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val base = ForkOptions()
    .withRunJVMOptions(opts)
    .withEnvVars(Map(
      "SPARK_HOME" -> "/opt/spark",
      // the executor-launch command builder scans dev build dirs unless the
      // scala version is pinned ("Cannot find any build directories")
      "SPARK_SCALA_VERSION" -> "2.13"))
  val (cluster, rest) = tests.partition(_.name.endsWith("ClusterSpec"))
  Seq(
    Tests.Group("cluster", cluster, Tests.SubProcess(base)),
    Tests.Group("rest", rest, Tests.SubProcess(base)),
  ).filter(_.tests.nonEmpty)
}
