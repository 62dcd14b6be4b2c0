ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "agnosticblockchainetlspark"
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
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"`
// as the bench summary JSON. Two things used to break that: the
// `[info] ` log prefix on forked output, and the `[success] Total
// time: …` epilogue sbt prints after the JVM exits. Route forked run
// output straight through un-prefixed, and drop the success epilogue.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // SPARK_DRIVER_XMS pins the forked JVM's initial heap (growth/bench
  // runs set it = Xmx: ParallelGC's adaptive sizing shrinks the heap
  // after the tools' between-timing System.gc() and the next timing
  // pays the re-expansion — measured as spurious warm-slower-than-cold
  // inversions on the image-fixture queries). JAVA_TOOL_OPTIONS can't
  // carry it: sbt's own launcher JVM would inherit it and die at init.
  sys.env.get("SPARK_DRIVER_XMS").map(x => s"-Xms$x").toSeq
// ClusterMaterializeSpec runs a local-cluster[2,1,1024] harness whose
// SparkContext must not share a JVM with the other suites (SparkContext
// is a process-global singleton: any concurrent suite's getOrCreate
// would adopt the cluster context and its afterAll would stop it
// mid-test). Give it a forked JVM of its own; sbt's default
// Tags.ForkedTestGroup limit of 1 keeps the groups sequential.
// SPARK_SCALA_VERSION is set for the cluster group because the
// standalone worker builds executor commands via the launcher, whose
// scala-version probe otherwise expects a source-tree SPARK_HOME.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val (cluster, rest) =
    tests.partition(_.name.contains("ClusterMaterializeSpec"))
  def group(name: String, ts: Seq[TestDefinition], env: Map[String, String]) =
    Tests.Group(name, ts, Tests.SubProcess(ForkOptions()
      .withRunJVMOptions(opts)
      .withEnvVars(env)))
  Seq(
    // default-ON so the plain `sbt test` gate exercises the executor-loss
    // paths; export GRAFT_CLUSTER_SPEC=0 to opt out (e.g. a CI host that
    // cannot spawn standalone worker JVMs)
    group("cluster", cluster, Map("SPARK_SCALA_VERSION" -> "2.13",
      "GRAFT_CLUSTER_SPEC" -> sys.env.getOrElse("GRAFT_CLUSTER_SPEC", "1"))),
    group("default", rest, Map.empty))
}
