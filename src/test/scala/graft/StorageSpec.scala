package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** Physical-layout levers for the 100 TB design point: bucketing
  * co-locates equi-join keys at WRITE time so the join itself needs no
  * exchange — the shuffle is paid once when the table lands, not on every
  * downstream join. */
class StorageSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed tables co-locate the join: zero shuffle exchanges in the plan") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      Tables.load(spark, sfDir, "orders").write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      Tables.load(spark, sfDir, "lineitem").write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("l_extendedprice"))
      joined.write.format("noop").mode("overwrite").save()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed equi-join must not shuffle either side:\n$plan")
      // Same join over the raw parquet DOES shuffle — the bucketing is
      // what removed it, not the data size.
      val unbucketed = Tables.load(spark, sfDir, "lineitem")
        .join(Tables.load(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("l_extendedprice"))
      unbucketed.write.format("noop").mode("overwrite").save()
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
      // And the bucketed join returns the same rows.
      assert(joined.count() == unbucketed.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
