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
    // SPARK_GRAFT_CONF="k=v;k2=v2": extra session confs for A/B plan
    // experiments (e.g. toggling AQE coalescing) without editing code.
    val extra = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val builder = SparkSession.builder()
      // Same extension registration as TestSpark: GraftStrategy must be
      // present to plan the seq_spine custom leaf (and graft_* SQL names).
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Match Bench: codegen class cache sized for a many-query session
      // (static conf, default 100 entries).
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val spark = extra.foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = sys.env.get("SPARK_GRAFT_PROF").map(_.split(",").toSeq)
      .getOrElse(args.toSeq)
    // SPARK_GRAFT_COUNT=1: also report the output row count once per query
    // (untimed, separate action) — used by the §4.4.8 output-blowup probes,
    // where the interesting number is how the RESULT grows, not just the time.
    val wantCount = sys.env.get("SPARK_GRAFT_COUNT").contains("1")
    // SPARK_GRAFT_ITERS: iterations per query (default 3). The 3-run
    // steady-state convention is for sub-30s queries where warmup dominates;
    // multi-minute probe runs use 1 — warmup skew is negligible there.
    val iters = sys.env.get("SPARK_GRAFT_ITERS").map(_.toInt).getOrElse(3)
    for (name <- names) {
      for (i <- 1 to iters) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        System.err.println(f"[prof] $name #$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        spark.catalog.clearCache()
        // Same untimed cleanup as Bench: synchronously drop localCheckpoint
        // blocks so iterations measure the query, not predecessors' leftovers.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
      if (wantCount) {
        System.err.println(s"[prof] $name rows=${SparkEntry.queries(name)(spark, sfDir).count()}")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
