package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe corpus generator (dev tool, not part of the driver contract,
  * like [[Prof]]/[[Explain]]): writes a copy of a testdata directory with
  * the relational fact tables (orders, lineitem) replicated ×N under
  * shifted order keys, so `Prof` can measure how the relational family
  * scales with data volume on otherwise-identical table shapes.
  *
  * Key shifting preserves join semantics exactly: each replica's lineitem
  * rows still match only their own replica's orders rows (join multiplicity
  * per key is unchanged), while o_custkey is left alone — a customer simply
  * has ×N orders, which is what organic fact growth looks like. Dimension
  * and LLM tables are copied unchanged.
  *
  * Usage: `sbt "runMain graft.ProbeGen /root/testdata/sf0.1 /tmp/probe_x10 10"`
  */
object ProbeGen {
  def main(args: Array[String]): Unit = {
    val Array(baseDir, outDir, factorS) = args
    val factor = factorS.toLong
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
    // Offset far beyond any base order key so replica key ranges never collide.
    val off = 1000000000L
    def fan(df: DataFrame, keyCol: String): DataFrame =
      df.withColumn("_i", explode(sequence(lit(0L), lit(factor - 1L))))
        .withColumn(keyCol, col(keyCol) + col("_i") * off)
        .drop("_i")
    fan(spark.read.parquet(s"$baseDir/orders.parquet"), "o_orderkey")
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    fan(spark.read.parquet(s"$baseDir/lineitem.parquet"), "l_orderkey")
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "events", "documents", "embeddings"))
      spark.read.parquet(s"$baseDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    spark.stop()
  }
}
