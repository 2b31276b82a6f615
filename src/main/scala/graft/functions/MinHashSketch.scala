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

/** Shared MinHash seed set — one (a, b) affine permutation per signature
  * slot over the 31-poly token hash, mod P = 2^31-1. The DuckDB oracle
  * spells the identical constants, so sketches are bit-equal across
  * engines (see LlmOps.ddp_minhash). */
object MinHashSeeds {
  val P: Long = GraftHashImpl.P
  val As: Seq[Long] = Seq(1299721L, 15485863L, 32452843L, 49979687L,
    67867967L, 86028121L, 104395301L, 122949823L)
  val Bs: Seq[Long] = Seq(104729L, 224737L, 350377L, 479909L,
    611953L, 746773L, 882377L, 1020379L)
  val slots: Int = As.size
  // Primitive copies for the per-token hot loop: Seq#apply on the List
  // above boxes every access and walks i cells — at 8 slots × every token
  // of every doc that is measurable interpreter overhead.
  private[functions] val AsArr: Array[Long] = As.toArray
  private[functions] val BsArr: Array[Long] = Bs.toArray
}

/** MinHash sketch as a `TypedImperativeAggregate` (SURVEY §2.6 / SIM-3):
  * aggregates token hashes into the 8-slot signature
  * `sig[i] = min over tokens of (A_i * h + B_i) mod P`, returned as
  * `array<long>`. Semantically identical to eight separate `min(...)`
  * aggregate columns, but held in ONE mutable buffer updated per row —
  * the extension shape a real sketch (HLL, KLL, count-min) needs, where
  * per-slot builtin aggregates stop being expressible. Partial aggregation
  * applies (ObjectHashAggregate partial → merge), so the shuffle carries
  * one 64-byte buffer per doc, never the token stream.
  *
  * Load sensitivity vs the builtin twin (r6 driver-board finding, 6.3×
  * the builtin's sample under load vs 1.5× at quiet steady state): the
  * structural difference is the aggregation path, not this class's
  * serialization — the buffer is already one fixed 64-byte array, and
  * serialize/merge allocate nothing beyond it. ObjectHashAggregate holds
  * one heap Array[Long] PER IN-FLIGHT GROUP and its update loop is
  * interpreted (`child.eval` per row), where the builtin eight-`min` path
  * is whole-stage-codegen'd over UnsafeRow bytes — so when the JVM is
  * under allocation/GC pressure from co-tenant work, the object path
  * degrades first. r7 mitigations (board-order heavies-first, serialized
  * band/checkpoint storage, 16g default heap) removed the gap at steady
  * state (1.11 s UDAF vs 1.18 s builtin, sf0.1); the builtin path remains
  * the production default and this aggregate remains the EXTENSION
  * TEMPLATE — a real HLL/KLL/count-min buffer is where the object path's
  * flexibility pays for its load profile. */
case class MinHashSketch(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes
  with UnaryLike[Expression] {

  import MinHashSeeds._

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash"

  // Min identity: P is one past the largest reachable slot value (P-1).
  override def createAggregationBuffer(): Array[Long] = Array.fill(slots)(P)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < slots) {
        val s = (AsArr(i) * h + BsArr(i)) % P
        if (s < buf(i)) buf(i) = s
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < slots) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * slots)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(slots)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSketch =
    copy(child = newChild)
}

object MinHashSketch {
  /** Column API: `minhash_sketch(tokenHashCol)` → `array<long>` signature. */
  def minhash_sketch(c: Column): Column =
    Bridge.column(MinHashSketch(Bridge.expression(c)).toAggregateExpression())
}
