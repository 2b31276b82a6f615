ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataingestionengineprocessspark"
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
// Forward the forked JVM's stdout verbatim (no "[info] " prefix): the
// bench/verify drivers parse Bench's single JSON line from stdout.
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
  // 16g default: local[32] runs 32 concurrent tasks in ONE JVM sharing
  // execution memory, storage (checkpointed posting tables), and codegen
  // metaspace for a 140+-query board. At 8g the unified-memory pool
  // (0.6 x heap ~ 4.8g) sat near its cap during the checkpoint-heavy
  // queries, so storage evictions + old-gen GC dominated under board load
  // (r6 driver board: those queries at 4-6x floor). The box has 128 GiB;
  // 16g is still modest, and SPARK_DRIVER_MEM overrides either way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)

// ---- Second JDBC dialect (test-scope only) ----
// JdbcDialectSpec certifies the production JDBC writer/reader/upsert
// classes against a SECOND live dialect family: embedded DuckDB speaks
// PostgreSQL-family SQL (case-preserving lowercase-folding identifiers,
// TEXT/DOUBLE PRECISION type names, Spark's DEFAULT JdbcDialect) next to
// the gated queries' Derby (SQL-standard family: uppercase folding, CLOB
// string mapping via Spark's built-in DerbyDialect). The driver jar is
// already present in this image's pre-warmed local coursier cache, so it
// is attached as an UNMANAGED test jar — no new dependency resolution, no
// network. If the jar is absent the glob finds nothing and the spec
// self-cancels (assume()) rather than failing the build.
Test / unmanagedJars ++= {
  val cache = file(sys.props("user.home")) / ".cache" / "coursier"
  (cache ** "duckdb_jdbc-*.jar").get.headOption.map(Attributed.blank).toSeq
}
