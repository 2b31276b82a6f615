package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import graft.core.Tables.pin

/** Exact global EXCLUSIVE prefix max WITHOUT a single-task sort — the
  * third member of the two-pass offset family ([[GlobalRank]]: prefix
  * sums/row numbers; [[IslandMerge]]: interval-union labeling; here: the
  * sharded running max SURVEY §2.2's SKY-1 row declares as skyline's
  * scale fallback, PACK-2's shard→offset decomposition applied to max).
  *
  *   1. `repartitionByRange(n, sortCols)` — balanced range shuffle,
  *      partitions totally ordered by id;
  *   2. per-partition `max(src)` — an n-row aggregate collected to the
  *      driver (config-bounded, never data-bounded), exclusive prefix-max
  *      scan over it = each partition's carry;
  *   3. broadcast the n-row carry table back; `dst` = max(carry, local
  *      exclusive running max) under a PARTITIONED window — null for the
  *      globally-first row, exactly the unpartitioned
  *      `max(src).over(orderBy(sortCols).rowsBetween(-∞, -1))` semantics.
  *
  * Ties: equal sort keys never straddle a range boundary, so the local
  * running max sees exactly the rows a global window would (callers whose
  * `sortCols` are non-unique get the same frame semantics either way —
  * rows on the SAME key are excluded from each other's prefix only by the
  * `-1` bound, which both forms apply per sort order).
  */
object PrefixMax {
  private val PID = "_pm_pid"

  /** Attach `dstCol` = the exclusive global running max of integral
    * `srcCol` under `sortCols` (null until a preceding row exists). */
  def attach(df: DataFrame, sortCols: Seq[Column], srcCol: String,
             dstCol: String, numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numParts > 0) numParts
            else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parted = pin(df.repartitionByRange(n, sortCols: _*)
      .withColumn(PID, spark_partition_id()))
    val perPart = parted.groupBy(col(PID))
      .agg(max(col(srcCol).cast("long")).as("_pm_mx"))
      .orderBy(col(PID)).collect()
    var running: Option[Long] = None
    val carryRows: Array[Row] = perPart.map { r =>
      val row = Row(r.getInt(0), running.map(Long.box).orNull)
      if (!r.isNullAt(1))
        running = Some(running.fold(r.getLong(1))(math.max(_, r.getLong(1))))
      row
    }
    val carryDf = spark.createDataFrame(
      java.util.Arrays.asList(carryRows: _*),
      StructType(Seq(
        StructField(PID, IntegerType, nullable = false),
        StructField("_pm_carry", LongType, nullable = true))))
    val w = Window.partitionBy(col(PID)).orderBy(sortCols: _*)
    val localPm = max(col(srcCol).cast("long"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    parted.join(broadcast(carryDf), PID)
      .withColumn(dstCol,
        when(col("_pm_carry").isNull, localPm)
          .otherwise(when(localPm.isNull, col("_pm_carry"))
            .otherwise(greatest(col("_pm_carry"), localPm))))
      .drop(PID, "_pm_carry")
  }
}
