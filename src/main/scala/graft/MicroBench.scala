package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 128)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val doc = spark.read.parquet(s"$d/documents.parquet")
      .repartition(64, col("doc_id"))
    def t(name: String)(f: => Unit): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime(); f
        System.err.println(f"[mb] $name #$i ${(System.nanoTime()-t0)/1e9}%7.2f s")
      }
    }
    val words = split(col("text"), " ")
    def bigramArr(ws: org.apache.spark.sql.Column) =
      zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat_ws(" ", a, b))
    val sh = array_distinct(when(size(words) >= 2, bigramArr(words))
      .otherwise(array().cast("array<string>")))
    t("split-explode")(doc.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().write.format("noop").mode("overwrite").save())
    t("shingles-explode")(doc.select(col("doc_id"), explode(sh).as("t"))
      .groupBy("t").count().write.format("noop").mode("overwrite").save())
    t("shingles-polyhash")(doc.select(col("doc_id"), explode(sh).as("t"))
      .select(col("doc_id"), graft.functions.GraftFunctions.poly_hash(col("t")).as("h"))
      .groupBy("doc_id").agg(min("h")).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
