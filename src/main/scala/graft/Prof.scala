package graft

import org.apache.spark.sql.SparkSession

/** Steady-state query timer (dev tool, not part of the driver contract):
  * `SPARK_GRAFT_PROF=q1,q2 sbt "runMain graft.Prof"` runs each named
  * query 3x with a noop write in one session, so codegen/AQE warmup is
  * visible and the last iteration approximates steady state. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = sys.env.get("SPARK_GRAFT_PROF").map(_.split(",").toSeq)
      .getOrElse(args.toSeq)
    for (name <- names; i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      System.err.println(f"[prof] $name #$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
