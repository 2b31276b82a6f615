package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, Eval, Events, Ingestion, LlmOps, Pruning, Relational, Scalars, Stats}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator declared in SURVEY.md §2 appears here as one entry in
  * `queries` (Spark DataFrame build) with a DuckDB twin in `oracleSql`;
  * the driver hash-compares both results on /root/testdata/sf0.01.
  */
object SparkEntry {
  /** Flagship query (AGG-1, TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.all("agg1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.all ++ Scalars.all ++ LlmOps.all ++ Events.all ++ Ingestion.all ++ Pruning.all ++ Stats.all ++ Analytics.all ++ Eval.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Scalars.oracle ++ LlmOps.oracle ++ Events.oracle ++ Ingestion.oracle ++ Pruning.oracle ++ Stats.oracle ++ Analytics.oracle ++ Eval.oracle
}
