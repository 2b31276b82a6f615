package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY §4.2 / the 100 TB design point). AQE's
  * skew-join split handles most runtime skew; these are the explicit
  * levers for the cases AQE can't fix — a single hot GROUP BY key whose
  * final aggregation lands on one reducer, and a join key so hot one task
  * owns it. Both rewrites are result-identical for associative aggregates
  * and plain joins; only the data distribution changes.
  */
object Skew {
  /** RETRY-SAFE salt: a pure content hash of the full row. An earlier
    * version mixed in the physical position (spark_partition_id +
    * monotonically_increasing_id) to also spread byte-identical duplicate
    * rows — but position is NOT stable across task recomputation, and
    * under a partial map-stage retry (executor loss after some reducers
    * fetched) a repositioned row lands in a different (key, salt) group
    * than the one already fetched: double-counted or dropped, silently.
    * On a 1000-executor cluster where task retries are routine, retry
    * determinism beats duplicate spreading. Residual limitation, by
    * choice: byte-identical DUPLICATE rows of a hot key share one bucket
    * — a corpus whose skew is dominated by exact duplicate rows should
    * dedup or pre-aggregate first (the usual pipeline shape anyway);
    * hot KEYS with varying payloads (the common case) spread fully. */
  private def saltCol(df: DataFrame, buckets: Int): Column =
    pmod(hash(struct(df.columns.map(col).toIndexedSeq: _*)), lit(buckets))

  /** Two-phase salted aggregation: rows of one key spread over `buckets`
    * partial groups (salt derived from the full row — deterministic, no
    * rand()), partial count/sum per (key, salt), then final combine per
    * key. The hot key's work is shared by `buckets` reducers instead of
    * one; the final pass aggregates `buckets` rows per key, not the raw
    * stream. Decimal sums keep the result exactly equal to the direct
    * aggregation (addition is associative-commutative on DECIMAL). */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     buckets: Int): DataFrame = {
    require(buckets > 0)
    val dt = org.apache.spark.sql.types.DecimalType(38, 4)
    val salted = df.withColumn("_salt", saltCol(df, buckets))
    salted.groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_cnt"), sum(col(valueCol).cast(dt)).as("_sum"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_cnt")).as("n"), sum(col("_sum")).cast(dt).as("total"))
  }

  /** Salted equi-join for a skewed big side: each big row gets one of
    * `buckets` salts; the (small) dimension side is replicated once per
    * salt value, so the hot key's rows split across `buckets` tasks while
    * every big row still meets its full dimension match. Row multiset is
    * identical to the plain join; the cost is a `buckets`× replication of
    * the small side — the classic skew/broadcast trade. */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    val b = big.withColumn("_salt_b", saltCol(big, buckets))
    val s = small.withColumn("_salt_s", explode(sequence(lit(0), lit(buckets - 1))))
    b.join(s, b(bigKey) === s(smallKey) && col("_salt_b") === col("_salt_s"))
      .drop("_salt_b", "_salt_s")
  }
}
