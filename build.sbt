ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datafusionspark"
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
// r14: a sequential `sbt test` measured ~30 min wall (SltRunnerSpec alone
// ~19 min) — past the driver's capture budget (VERIFY_r13 tests_ok=false
// with a truncated, failure-free tail). Split the suites into 8
// duration-balanced groups (weights from that measured run; the slt
// monolith is itself split into 5 sibling suites, see SltRunnerSpec.scala)
// and fork each group as its own JVM — own SparkContext, parallel across
// groups, sequential inside a group. Spark warehouse/derby homes are
// per-group; the slt scratch root is already per-JVM (SltRunner.ScratchRoot).
val testGroupOf: String => Int = {
  val pinned = Map(
    "graft.SltRunnerSpec"  -> 0,
    "graft.SltRunnerSpecB" -> 1,
    "graft.SltRunnerSpecC" -> 2,
    "graft.SltRunnerSpecD" -> 3,
    "graft.SltRunnerSpecE" -> 4,
    "graft.QueriesSpec" -> 5, "graft.SparkSltSpec" -> 5,
    "graft.SqlUnparserSweepSpec" -> 6, "graft.DifferentialFuzzSpec" -> 6,
    "graft.SubstraitSweepSpec" -> 6, "graft.ExtensionsSpec" -> 6)
  (n: String) => pinned.getOrElse(n, 7)
}
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  (Test / definedTests).value.groupBy(t => testGroupOf(t.name)).toSeq
    .sortBy(_._1).map { case (g, ts) =>
      Tests.Group(s"g$g", ts, Tests.SubProcess(ForkOptions()
        .withRunJVMOptions(opts ++ Vector(
          s"-Dspark.sql.warehouse.dir=/tmp/graft_test_wh_g$g",
          s"-Dderby.system.home=/tmp/graft_test_derby_g$g"))))
    }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 8), Tags.limitAll(12))

// forward stdin to forked runMain processes (graft.tools.Repl reads SQL
// from stdin, interactive or piped)
run / connectInput := true
// Emit forked-process stdout directly (no "[info] " logger prefix) so the
// driver can machine-parse Bench's single JSON line from the sbt output.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
