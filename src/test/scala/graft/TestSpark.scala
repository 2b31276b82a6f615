package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime
import scala.jdk.CollectionConverters._

/** Shared test session (one forked JVM per `sbt test` run). Mirrors the
  * Verify/Bench session config and registers [[graft.functions.GraftExtensions]]
  * so SQL-surface tests can call the custom functions by name. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Static conf; the suite executes the full query board plus its
      // own variants — far beyond the default 100-entry codegen cache.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sfDir = "/root/testdata/sf0.001"

  def tempDir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  /** Write `df` as exactly ONE parquet file named `<dir>/<name>.parquet`
    * with an explicit modification time, so a streaming file source replays
    * slices in a deterministic order (FileStreamSource lists by modTime). */
  def writeSlice(df: DataFrame, dir: Path, name: String, modTimeMs: Long): Unit = {
    val tmp = Files.createTempDirectory("slice")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(sys.error(s"no parquet part written under $tmp"))
    Files.createDirectories(dir)
    val dest = dir.resolve(s"$name.parquet")
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(dest, FileTime.fromMillis(modTimeMs))
  }

  /** Multiset equality on two frames with identical schemas (order-free).
    * Compared driver-side on collected canonical renderings: test frames
    * are small, and `exceptAll`'s ReplicateRows rewrite trips an
    * ATTRIBUTE_NOT_FOUND pruning bug in Spark 4.1 when one input is a
    * dropDuplicates aggregate. */
  def assertSameRows(a: DataFrame, b: DataFrame, hint: String): Unit = {
    def render(df: DataFrame): Seq[String] =
      df.collect().toSeq.map(_.toString).sorted
    val (ra, rb) = (render(a), render(b))
    if (ra != rb) {
      val onlyA = ra.diff(rb).take(5)
      val onlyB = rb.diff(ra).take(5)
      assert(false, s"$hint: ${ra.size} vs ${rb.size} rows; " +
        s"only in left: $onlyA; only in right: $onlyB")
    }
  }
}
