ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "databendspark"
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
// Parallel forked test groups (round-14): the suite grew past 1100
// tests and a single sequential forked JVM exceeded the verification
// driver's window (r13 `tests_ok: false`, output truncated mid-suite).
// Each group below runs in its OWN forked JVM (own SparkSession,
// warehouse, temp dirs — no shared session state), up to 6 at a time
// (groups are mostly driver-bound single-task jobs, so modest thread
// oversubscription of the 32 hardware threads measures faster than
// idle tail slots; 6 x 8g heap fits the 128 GiB sandbox).
//  - each SqlSltSpec shard is its own group (the slt_sql corpus is the
//    bulk of the wall clock);
//  - specs that materialize the SHARED staged datasets/indexes under
//    /tmp/graft_tpcds | /tmp/graft_stage | /tmp/graft_index (their
//    ensure() is marker-checked but only JVM-locally synchronized) are
//    pinned to ONE group so generation can never race across JVMs;
//  - everything else is round-robined by sorted class name.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val fo = (Test / forkOptions).value
  val stagedDataSpecs = Set("graft.SmokeSpec", "graft.PlanSpec",
    "graft.QuerySurfaceManifestSpec", "graft.ExtensionsSpec")
  val rest = tests.map(_.name)
    .filterNot(n => n.startsWith("graft.SqlSltSpec") || stagedDataSpecs(n))
    .sorted.zipWithIndex.map { case (n, i) => n -> s"misc${i % 4}" }.toMap
  def groupOf(name: String): String =
    if (name.startsWith("graft.SqlSltSpec")) name.stripPrefix("graft.")
    else if (stagedDataSpecs(name)) "entry"
    else rest(name)
  tests.groupBy(t => groupOf(t.name)).map { case (g, ts) =>
    Tests.Group(g, ts.sortBy(_.name), Tests.SubProcess(fo))
  }.toSeq.sortBy(_.name)
}
// REPLACE the default restriction set: sbt's default contains
// Tags.limit(Tags.ForkedTestGroup, 1) and limits AND together, so a
// `+=` of a higher limit would not relax it.
Global / concurrentRestrictions := Seq(
  Tags.limitAll(12),
  Tags.limit(Tags.ForkedTestGroup, 6),
)
// the container's default locale is C (ASCII): file paths and
// sun.jnu conversions would mangle unicode table names
Test / envVars += ("LC_ALL" -> "C.utf8")
run / envVars += ("LC_ALL" -> "C.utf8")
// pass forked-app stdout through verbatim (no [info] prefix) so the
// one-line JSON from Bench/Verify stays machine-parseable
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
  // the container runs LANG=C: without this, every default-charset
  // hop (variant json parse/render included) mangles non-ASCII
  "-Dfile.encoding=UTF-8",
  "-Dsun.jnu.encoding=UTF-8",
  "-Dstdout.encoding=UTF-8",
  "-Dstderr.encoding=UTF-8",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
