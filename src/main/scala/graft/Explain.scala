package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one or more queries —
  * `runMain graft.Explain <sfDir> <query> [query ...]`. Used to audit
  * pushdown (PushedFilters/ReadSchema), broadcast choices, codegen spans,
  * and shuffle shape per operator. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 4)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", cpus.toInt * 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
