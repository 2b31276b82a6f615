package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table access + canonicalization helpers shared by every query.
  *
  * The testdata tables (see /root/repo/TESTDATA.md) are plain parquet files,
  * one per table. Loading is a bare `spark.read.parquet` so Catalyst keeps
  * full pushdown/pruning freedom — no caching, no repartition here; each
  * query declares its own distribution needs.
  *
  * Determinism rules (SURVEY.md §5.3) live here so Spark queries and the
  * DuckDB oracle SQL stay in lock-step:
  *   - money/measure sums are computed over DECIMAL(38,4), never raw double
  *   - averages are decimal-sum cast to double, divided by count, re-cast
  *   - every result ends with a total ORDER BY (asc nulls first)
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one testdata table.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS): Spark has no nanosecond
    * timestamp type, so sessions set `spark.sql.legacy.parquet.nanosAsLong`
    * and we truncate here to microseconds (`ts div 1000`, floor) — exactly
    * what DuckDB's `CAST(ts AS TIMESTAMP)` does, keeping the oracle aligned
    * (SURVEY §5.3 / §7.4). At 100 TB scale you'd land µs timestamps so scan
    * pushdown on ts survives; the conversion cost here is one codegen'd
    * projection.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** DECIMAL(38,4) — the canonical exact aggregation type (SURVEY §5.3). */
  val dt: DecimalType = DecimalType(38, 4)

  /** Cast a measure to the canonical decimal BEFORE aggregating. */
  def dec(c: Column): Column = c.cast(dt)

  /** Portable round-half-up-at-4-decimals for COMPUTED doubles.
    *
    * Engines disagree on double→decimal tie-breaking (Spark rounds the
    * shortest decimal rendering half-up; DuckDB rounds the binary expansion
    * half-even), and products of 2-decimal inputs land exactly on the
    * 4th-decimal tie ~1% of the time. floor(x*1e4+0.5)/1e4 is pure IEEE
    * double arithmetic, so both engines compute the identical double and the
    * final decimal cast is never within an engine-dependent tie.
    * DuckDB twin: `CAST(floor((x)*10000+0.5)/10000 AS DECIMAL(38,4))`.
    */
  def dec4(c: Column): Column =
    (floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)).cast(dt)

  /** Exact decimal sum of a RAW (≤2 decimal places) measure column. */
  def dsum(c: Column): Column = sum(dec(c)).cast(dt)

  /** Exact decimal sum of a COMPUTED double expression (tie-safe per-row cast). */
  def dsum4(c: Column): Column = sum(dec4(c)).cast(dt)

  /** Order-insensitive average: exact decimal sum -> double -> / count,
    * tie-safe rounded. DuckDB twin:
    * `CAST(floor((CAST(SUM(CAST(x AS DECIMAL(38,4))) AS DOUBLE)/COUNT(1))*10000+0.5)/10000 AS DECIMAL(38,4))`. */
  def davg(c: Column): Column =
    dec4(sum(dec(c)).cast("double") / count(lit(1)))

  /** Total order on all output columns, asc nulls first (matches the
    * `ORDER BY ... NULLS FIRST` the oracle SQL spells out). */
  def ordered(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(c => col(c).asc_nulls_first).toIndexedSeq: _*)
}
