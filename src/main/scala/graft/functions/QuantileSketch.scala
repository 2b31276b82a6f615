package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Deterministic mergeable quantile summary — the Munro–Paterson /
  * Manku-Rajagopalan-Lindsay multilevel collapse (Munro & Paterson 1980;
  * the deterministic ancestor of KLL, which replaces the alternating
  * selection with coin flips to sharpen constants): the percentile analog
  * of AGG-13's re-aggregatable HLL cube (r13 verdict task 5).
  *
  * Why it exists: exact percentiles do NOT re-aggregate — AGG-9/WIN-9
  * recompute from raw values, and a 100 TB rolling p99 cannot. This state
  * is a MONOID: per-partition sketches merge associatively map-side, a
  * per-group sketch stored once serves every coarser rollup as a cheap
  * sketch union (agg_hll_merge's shape), and the shuffle carries
  * O(k·log(n/k)) longs per group, never the value stream.
  *
  * Structure: `levels(i)` holds values each standing for 2^i inputs,
  * ≤ k per level. Level 0 ingests raw values; a full level SORTS and
  * keeps the odd-indexed half, promoted to level i+1 (each survivor now
  * weighs double). Every collapse of a weight-w level perturbs any rank
  * by ≤ w, so total rank error ≤ Σ_i (collapses at i)·2^i ≈
  * n·log₂(n/k)/k — ε ≈ log₂(n/k)/k, ~4–5% at k=256 over 10⁶ rows
  * (ApproxSpec gates the measured window; GraftLaws pins merge
  * associativity within the same bound). Deterministic by construction:
  * no coins, ties broken by value order, an odd buffer retains its
  * maximum in place and collapses the even remainder.
  *
  * Rows-only gated (`agg_qsketch`): like agg_approx/agg_hll_merge, no
  * cross-engine oracle hash exists for an engine-specific sketch
  * (SURVEY §2.7) — correctness is the ε-rank-bound law, not equality. */
object QSketch {
  /** Per-level capacity. ε ≈ log₂(n/k)/k; 256 ⇒ ~0.04 at n = 10⁶, with
    * worst-case state k·log₂(n/k) ≈ 3k longs — bounded index metadata
    * per group, never data-proportional. */
  val K: Int = 256

  final class State(var n: Long,
      var levels: Array[scala.collection.mutable.ArrayBuffer[Long]]) {
    def this() = this(0L, Array(new scala.collection.mutable.ArrayBuffer[Long]))
  }

  def update(s: State, v: Long): State = {
    s.levels(0) += v
    s.n += 1L
    if (s.levels(0).length >= K) cascade(s)
    s
  }

  def merge(a: State, b: State): State = {
    if (b.levels.length > a.levels.length)
      a.levels = a.levels ++ Array.fill(
        b.levels.length - a.levels.length)(
        new scala.collection.mutable.ArrayBuffer[Long])
    var i = 0
    while (i < b.levels.length) { a.levels(i) ++= b.levels(i); i += 1 }
    a.n += b.n
    cascade(a)
    a
  }

  /** Collapse every over-full level bottom-up. A level with an ODD count
    * keeps its maximum in place (deterministic, value-ordered — no
    * arrival-order dependence inside one buffer) and collapses the even
    * remainder by promoting the odd-indexed half. */
  private def cascade(s: State): Unit = {
    var i = 0
    while (i < s.levels.length) {
      if (s.levels(i).length >= K) {
        val sorted = s.levels(i).toArray
        java.util.Arrays.sort(sorted)
        val even = sorted.length - (sorted.length % 2)
        val keep = new scala.collection.mutable.ArrayBuffer[Long]
        if (sorted.length % 2 == 1) keep += sorted(sorted.length - 1)
        if (i + 1 >= s.levels.length)
          s.levels = s.levels :+ new scala.collection.mutable.ArrayBuffer[Long]
        var j = 1
        while (j < even) { s.levels(i + 1) += sorted(j); j += 2 }
        s.levels(i) = keep
      }
      i += 1
    }
  }

  /** Rank-query: the smallest retained value whose cumulative weight
    * reaches ⌈q·n⌉ over the weight-expanded sorted summary. */
  def quantile(s: State, q: Double): Long = {
    require(s.n > 0, "quantile of an empty sketch")
    val items = new scala.collection.mutable.ArrayBuffer[(Long, Long)]
    var i = 0
    while (i < s.levels.length) {
      val w = 1L << i
      s.levels(i).foreach(v => items += ((v, w)))
      i += 1
    }
    val sorted = items.sortBy(_._1)
    val target = math.max(1L, math.ceil(q * s.n).toLong)
    var cum = 0L
    var idx = 0
    while (idx < sorted.length) {
      cum += sorted(idx)._2
      if (cum >= target) return sorted(idx)._1
      idx += 1
    }
    sorted.last._1
  }

  def serialize(s: State): Array[Byte] = {
    val nvals = s.levels.map(_.length).sum
    val bb = ByteBuffer.allocate(8 + 4 + s.levels.length * 4 + nvals * 8)
    bb.putLong(s.n)
    bb.putInt(s.levels.length)
    s.levels.foreach { l => bb.putInt(l.length); l.foreach(bb.putLong) }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val nl = bb.getInt
    val levels = Array.fill(nl) {
      val m = bb.getInt
      val buf = new scala.collection.mutable.ArrayBuffer[Long](m)
      var j = 0
      while (j < m) { buf += bb.getLong; j += 1 }
      buf
    }
    new State(n, levels)
  }
}

/** `quantile_sketch(longCol, percentiles)` → `array<long>`: one estimate
  * per requested percentile, computed from the mergeable [[QSketch]]
  * state. Partial aggregation applies (ObjectHashAggregate partial →
  * merge) exactly like [[MinHashSketch]] — the shuffle carries the
  * bounded sketch, never the values. Empty groups evaluate to null. */
case class QuantileSketch(child: Expression, percentiles: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketch.State] with ExpectsInputTypes
  with UnaryLike[Expression] {

  require(percentiles.nonEmpty && percentiles.forall(p => p >= 0.0 && p <= 1.0),
    s"percentiles must be in [0,1]: $percentiles")

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quantile_sketch"

  override def createAggregationBuffer(): QSketch.State = new QSketch.State()

  override def update(buf: QSketch.State, input: InternalRow): QSketch.State = {
    val v = child.eval(input)
    if (v != null) QSketch.update(buf, v.asInstanceOf[Long]) else buf
  }

  override def merge(b1: QSketch.State, b2: QSketch.State): QSketch.State =
    QSketch.merge(b1, b2)

  override def eval(buf: QSketch.State): Any =
    if (buf.n == 0L) null
    else new GenericArrayData(
      percentiles.map(q => QSketch.quantile(buf, q)).toArray)

  override def serialize(buf: QSketch.State): Array[Byte] =
    QSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QSketch.State =
    QSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketch =
    copy(child = newChild)
}

/** `quantile_sketch_bin(longCol)` → binary: the SERIALIZED mergeable
  * summary itself — the per-bucket artifact a rolling/cube consumer
  * stores once and re-aggregates without rescanning the fact table
  * (AGG-13's `hll_sketch_agg` analog for rank queries; the write side
  * of WIN-10's rolling window). Empty groups evaluate to null. */
case class QuantileSketchBin(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketch.State] with ExpectsInputTypes
  with UnaryLike[Expression] {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quantile_sketch_bin"

  override def createAggregationBuffer(): QSketch.State = new QSketch.State()

  override def update(buf: QSketch.State, input: InternalRow): QSketch.State = {
    val v = child.eval(input)
    if (v != null) QSketch.update(buf, v.asInstanceOf[Long]) else buf
  }

  override def merge(b1: QSketch.State, b2: QSketch.State): QSketch.State =
    QSketch.merge(b1, b2)

  override def eval(buf: QSketch.State): Any =
    if (buf.n == 0L) null else QSketch.serialize(buf)

  override def serialize(buf: QSketch.State): Array[Byte] =
    QSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QSketch.State =
    QSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchBin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchBin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchBin =
    copy(child = newChild)
}

/** Java-callable codegen helper for [[QuantileSketchEval]] (the
  * GraftGearImpl/GraftEntropyImpl pattern: a top-level object gets static
  * forwarders the generated Java can call directly). */
object QSketchOps {
  /** Merge serialized summaries (null elements skipped — an empty bucket
    * stores null) and rank-query the union; null when nothing merged. */
  def mergeEval(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      percs: Array[Double]): org.apache.spark.sql.catalyst.util.ArrayData = {
    var acc: QSketch.State = null
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val st = QSketch.deserialize(arr.getBinary(i))
        acc = if (acc == null) st else QSketch.merge(acc, st)
      }
      i += 1
    }
    if (acc == null || acc.n == 0L) null
    else new GenericArrayData(percs.map(q => QSketch.quantile(acc, q)))
  }
}

/** `quantile_sketch_eval(array<binary>, p…)` → `array<long>`: merge
  * serialized summaries and rank-query the union — the READ side of the
  * sketch cube / rolling window: one merge of a bounded handful of
  * O(k·log(n/k)) states per output row, never a value rescan. */
case class QuantileSketchEval(child: Expression, percentiles: Seq[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  require(percentiles.nonEmpty && percentiles.forall(p => p >= 0.0 && p <= 1.0),
    s"percentiles must be in [0,1]: $percentiles")

  override def inputTypes = Seq(ArrayType(BinaryType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quantile_sketch_eval"

  @transient private lazy val percs: Array[Double] = percentiles.toArray

  override protected def nullSafeEval(input: Any): Any =
    QSketchOps.mergeEval(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], percs)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("graftPercs", percs, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.QSketchOps.mergeEval($c, $ref);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantileSketchEval =
    copy(child = newChild)
}

object QuantileSketch {
  /** Column API: `quantile_sketch(valueCol, 0.5, 0.99)` → `array<long>`. */
  def quantile_sketch(c: Column, percentiles: Double*): Column =
    Bridge.column(
      QuantileSketch(Bridge.expression(c), percentiles.toSeq)
        .toAggregateExpression())

  /** Column API: the serialized per-bucket summary (WIN-10's write side). */
  def quantile_sketch_bin(c: Column): Column =
    Bridge.column(
      QuantileSketchBin(Bridge.expression(c)).toAggregateExpression())

  /** Column API: merge an `array<binary>` of summaries and rank-query. */
  def quantile_sketch_eval(c: Column, percentiles: Double*): Column =
    Bridge.column(QuantileSketchEval(Bridge.expression(c), percentiles.toSeq))
}
