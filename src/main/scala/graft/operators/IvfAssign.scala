package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.dot_product

/** The ONE nearest-centroid assignment core behind every IVF surface —
  * batch (`sim1_ivf`/`ivf_eval`/`ivf_curve`/`ivf_pq` via
  * `LlmOps.ivfAssigned`) and streaming (`StreamOps.assignCells`, the
  * STR-IVF index-maintenance op). The streamed-index-equals-batch
  * invariant depends on both sides scoring and tie-breaking identically
  * (cosine desc, then cell_label asc), so the rule lives in exactly one
  * place and cannot drift.
  *
  * `vecs` must carry (vec_id, e: ARRAY<DOUBLE>); `cent` must carry
  * (cell_label, ce: ARRAY<DOUBLE>). Norm columns (`vn`/`cn`) are computed
  * unless already present. Returns every (vector × centroid) row with
  * `cscore` (cosine) and `crn` (that vector's cell preference rank —
  * crn=1 is its home cell; crn ≤ nprobe are a query's probe cells). The
  * centroid table is index METADATA (k rows, broadcast), so the cross is
  * the declared vectors × broadcast-k shape, never data × data. */
object IvfAssign {
  def ranked(vecs: DataFrame, cent: DataFrame): DataFrame = {
    val vecsN =
      if (vecs.columns.contains("vn")) vecs
      else vecs.withColumn("vn", sqrt(dot_product(col("e"), col("e"))))
    val centN =
      if (cent.columns.contains("cn")) cent
      else cent.withColumn("cn", sqrt(dot_product(col("ce"), col("ce"))))
    val byVec = Window.partitionBy(col("vec_id"))
      .orderBy(col("cscore").desc, col("cell_label").asc)
    // Zero-norm guard: cosine against a zero vector is 0/0 = NaN, and NaN
    // sorts ABOVE every real score under desc — one degenerate centroid
    // (or vector) would otherwise silently capture crn=1 for the whole
    // corpus. Pin such pairs to -Infinity so they rank strictly LAST
    // (ties among them still break by cell_label).
    vecsN.crossJoin(broadcast(centN))
      .withColumn("cscore",
        when(col("vn") * col("cn") > 0.0,
          dot_product(col("e"), col("ce")) / (col("vn") * col("cn")))
        .otherwise(lit(Double.NegativeInfinity)))
      .withColumn("crn", row_number().over(byVec))
  }
}
