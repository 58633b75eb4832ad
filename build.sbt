ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "starlightforkafkaspark"
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
// Bench/Verify print ONE machine-parsed JSON line on stdout. Route the
// forked process's streams straight through (no "[info] " prefix) and
// drop sbt's "[success] Total time" epilogue so that JSON line is the
// FINAL stdout line the driver sees.
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Parallel forked test groups: one sequential JVM ran the 21-suite battery
// in ~16 min, wall-clock-bound by four independent heavy suites (the r17
// driver's `sbt test` verdict flag was most plausibly a timeout at that
// length). Four groups fork four JVMs, each with a PRIVATE java.io.tmpdir,
// so the build-once /tmp artifact stores (graft_ann_index, graft_bpe_store,
// graft_glog) are never read by one group while another rebuilds them —
// groups share NOTHING writable. Suites within a group still run
// sequentially in one JVM, exactly as before.
Test / testGrouping := {
  // Grouped by FIXTURE AFFINITY, not just balance: suites that exercise
  // the sf0.001 registry share one JVM so its session-lifetime frame
  // caches are built once (a cold OperatorSpec alone measures 6m49s; warm
  // behind RegistryGuardSpec it is ~4 min), and the log/stream suites
  // share another.
  val groupOf = Map(
    "graft.OperatorSpec" -> "g1",
    "graft.ParityAssumptionSpec" -> "g1",
    "graft.HeavyHitterSpec" -> "g1",
    "graft.BatchCodecSpec" -> "g1",
    "graft.LogStoreSpec" -> "g1",
    "graft.RegistryGuardSpec" -> "g2",
    "graft.PlanShapeSpec" -> "g2",
    "graft.CacheBudgetSpec" -> "g2",
    "graft.AnnIndexSpec" -> "g2",
    "graft.BpeStoreSpec" -> "g2",
    "graft.EdgeRound17Spec" -> "g2",
    "graft.GroupMetadataCodecSpec" -> "g2",
  )
  val opts = (Test / javaOptions).value
  val base = target.value / "test-tmp"
  // RegistryGuardSpec first within its group: it runs every registry
  // query once at sf0.001, warming the session caches every later suite
  // in the group rides.
  def orderKey(n: String) = if (n == "graft.RegistryGuardSpec") "0" else n
  (Test / definedTests).value.groupBy(t => groupOf.getOrElse(t.name, "g3"))
    .toSeq.sortBy(_._1).map { case (g, ts) =>
      val tmp = base / g
      IO.createDirectory(tmp)
      Tests.Group(g, ts.sortBy(t => orderKey(t.name)),
        Tests.SubProcess(ForkOptions().withRunJVMOptions(
          (opts :+ s"-Djava.io.tmpdir=${tmp.getAbsolutePath}").toVector)))
    }
}
Global / concurrentRestrictions := Seq(
  Tags.limitAll(16), Tags.limit(Tags.ForkedTestGroup, 3))
