package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` extension point (SURVEY §2.6): the
  * element-wise mean of a vector column — per-group embedding centroids,
  * the building block for IVF-style ANN partitioning (cluster centroids)
  * and per-label corpus statistics.
  *
  * Buffer is (running element sum, count); merge is element-wise, so the
  * aggregate is partial-aggregation friendly: executors combine local
  * buffers and the shuffle carries one (d+1)-double buffer per group, not
  * the vectors. Empty/null inputs contribute nothing; an empty group
  * yields an empty centroid. */
class CentroidAggregator(dim: Int)
    extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.fill(dim)(0.0), 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    if (v == null || v.length != dim) b
    else {
      var i = 0
      while (i < dim) { b._1(i) += v(i); i += 1 }
      (b._1, b._2 + 1)
    }
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    var i = 0
    while (i < dim) { x._1(i) += y._1(i); i += 1 }
    (x._1, x._2 + y._2)
  }

  override def finish(b: (Array[Double], Long)): Array[Double] =
    if (b._2 == 0L) Array.empty else b._1.map(_ / b._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
