package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra–Gries frequent-items summary (Misra & Gries 1982;
  * merge rule from Agarwal et al., "Mergeable Summaries", PODS 2012) —
  * the FREQUENT-ITEMS member of the sketch family beside HLL (distinct,
  * AGG-13), count-min (point frequency, SKT-1) and the quantile summary
  * (rank, AGG-19).
  *
  * What the others can't do: CMS answers "how often does item X occur"
  * but cannot ENUMERATE the heavy items without a candidate stream; a
  * full `groupBy(item).count.orderBy(desc)` enumerates exactly but
  * shuffles the whole vocabulary — at 100 TB of n-grams that vocabulary
  * is billions of keys and the global sort-by-count is the bottleneck
  * stage. This summary keeps at most k (item, count) pairs, ingests a
  * stream in O(1) amortized per item, and merges associatively, with the
  * deterministic guarantees (ε = n/(k+1), n = total stream weight):
  *
  *  - UNDERESTIMATE only:  true(x) − ε  ≤  est(x)  ≤  true(x);
  *  - COVERAGE: every item with true(x) > ε is retained — the candidate
  *    set is a guaranteed superset of the heavy hitters.
  *
  * Those two bounds survive ANY merge tree (Agarwal et al. §3: summing
  * matched counts then removing the (k+1)-th largest count from all
  * keeps the total decrement ≤ n/(k+1)), which is what makes the
  * per-partition partial → shuffle-merge path safe: the shuffle carries
  * at most k pairs per partial, never the item stream.
  *
  * Exact values are merge-ORDER-dependent (like the quantile summary's
  * retained set, and unlike SKT-1's commutative counters), so queries
  * over the raw estimates gate rows-only with the ε laws in ApproxSpec;
  * the COVERAGE guarantee is what powers the hash-gated two-pass exact
  * top-K (SKT-3 `freq_topk_exact`): pass 1 elects ≤ k candidates, pass 2
  * exact-counts only them — both passes bounded-shuffle by construction. */
object MGSketch {
  /** Default capacity. ε = n/(k+1): at k = 1024 an item must hold
    * < 0.1% of the stream to be missed — far below any top-20 boundary
    * on a Zipfian corpus — while the state stays ≤ k pairs. */
  val K: Int = 1024

  final class State(val k: Int) {
    var n: Long = 0L
    val counts = new java.util.HashMap[UTF8String, Long](k * 2)
  }

  def update(s: State, item: UTF8String): State = {
    s.n += 1L
    val c = s.counts.get(item)
    if (c != 0L) s.counts.put(item, c + 1L)
    else if (s.counts.size < s.k) s.counts.put(item.clone(), 1L)
    else {
      // Classic MG decrement-all: total decrement work across the stream
      // is bounded by total increments, so the amortized cost is O(1).
      val it = s.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
    s
  }

  /** Mergeable-summaries rule: sum matched counts, then if over capacity
    * subtract the (k+1)-th largest count from every item and drop the
    * non-positive remainder — the summary shrinks back to ≤ k pairs and
    * the accumulated underestimate stays ≤ (n_a + n_b)/(k+1). */
  def merge(a: State, b: State): State = {
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = a.counts.get(e.getKey)
      a.counts.put(e.getKey, c + e.getValue)
    }
    a.n += b.n
    if (a.counts.size > a.k) {
      val cs = new Array[Long](a.counts.size)
      var i = 0
      val vit = a.counts.values().iterator()
      while (vit.hasNext) { cs(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(cs)
      // (k+1)-th largest = index size-1-k of the ascending sort.
      val cut = cs(cs.length - 1 - a.k)
      val eit = a.counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
    a
  }

  /** Entries sorted (count desc, item asc in UTF8 binary order) — the
    * deterministic read-out given a fixed final state. */
  def sortedEntries(s: State): Array[(UTF8String, Long)] = {
    val arr = new Array[(UTF8String, Long)](s.counts.size)
    var i = 0
    val it = s.counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
    scala.util.Sorting.stableSort(arr,
      (x: (UTF8String, Long), y: (UTF8String, Long)) =>
        x._2 > y._2 || (x._2 == y._2 && x._1.compareTo(y._1) < 0))
    arr
  }

  def serialize(s: State): Array[Byte] = {
    var bytes = 8 + 4 + 4
    val it0 = s.counts.keySet().iterator()
    while (it0.hasNext) bytes += 4 + 8 + it0.next().numBytes()
    val bb = ByteBuffer.allocate(bytes)
    bb.putLong(s.n)
    bb.putInt(s.k)
    bb.putInt(s.counts.size)
    val it = s.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      bb.putInt(kb.length)
      bb.put(kb)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val s = new State(bb.getInt)
    s.n = n
    var m = bb.getInt
    while (m > 0) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      s.counts.put(UTF8String.fromBytes(kb), bb.getLong)
      m -= 1
    }
    s
  }
}

private[functions] trait MGAggregate
    extends TypedImperativeAggregate[MGSketch.State] with ExpectsInputTypes
    with UnaryLike[Expression] {
  def k: Int
  require(k > 0, s"capacity must be positive: $k")

  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MGSketch.State = new MGSketch.State(k)

  override def update(buf: MGSketch.State, input: InternalRow): MGSketch.State = {
    val v = child.eval(input)
    if (v != null) MGSketch.update(buf, v.asInstanceOf[UTF8String]) else buf
  }

  override def merge(b1: MGSketch.State, b2: MGSketch.State): MGSketch.State =
    MGSketch.merge(b1, b2)

  override def serialize(buf: MGSketch.State): Array[Byte] =
    MGSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): MGSketch.State =
    MGSketch.deserialize(bytes)
}

/** `heavy_hitters(strCol, k, topN)` → `array<struct<item,est>>`: the topN
  * retained items by (estimate desc, item asc). Estimates carry the MG
  * bounds above; rows-only gated (`freq_mg`) with the ε laws in
  * ApproxSpec — the retained-count values are merge-order-dependent. */
case class HeavyHitters(child: Expression, k: Int, topN: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends MGAggregate {

  require(topN > 0 && topN <= k, s"topN must be in [1,$k]: $topN")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_heavy_hitters"

  override def eval(buf: MGSketch.State): Any = {
    val rows = MGSketch.sortedEntries(buf).take(topN).map { case (item, est) =>
      new GenericInternalRow(Array[Any](item, est))
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
}

/** `heavy_hitters_items(strCol, k)` → `array<string>`: ALL retained items
  * (≤ k), sorted ascending — the candidate set whose COVERAGE guarantee
  * (every item above n/(k+1) present) makes the two-pass exact top-K
  * hash-gateable: any superset of the true heavy set yields the identical
  * exact pass-2 answer. */
case class HeavyHittersItems(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends MGAggregate {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_heavy_hitters_items"

  override def eval(buf: MGSketch.State): Any = {
    val items = new Array[UTF8String](buf.counts.size)
    var i = 0
    val it = buf.counts.keySet().iterator()
    while (it.hasNext) { items(i) = it.next(); i += 1 }
    java.util.Arrays.sort(items, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    new GenericArrayData(items.asInstanceOf[Array[Any]])
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersItems =
    copy(child = newChild)
}

object HeavyHitters {
  /** Column API: `heavy_hitters(itemCol, k, topN)` → `array<struct<item,est>>`. */
  def heavy_hitters(c: Column, k: Int = MGSketch.K, topN: Int = 20): Column =
    Bridge.column(
      HeavyHitters(Bridge.expression(c), k, topN).toAggregateExpression())

  /** Column API: the sorted candidate item set (SKT-3's pass 1). */
  def heavy_hitters_items(c: Column, k: Int = MGSketch.K): Column =
    Bridge.column(
      HeavyHittersItems(Bridge.expression(c), k).toAggregateExpression())
}
