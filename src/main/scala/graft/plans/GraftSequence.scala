package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.LongType

/** The whole-operator extension chain (SURVEY §4.3 / §2.6): a custom
  * logical plan, an optimizer `Rule[LogicalPlan]` that rewrites it, a
  * `SparkStrategy` that plans it, and a physical `SparkPlan` that executes
  * it — wired through `SparkSessionExtensions` (see
  * [[graft.functions.GraftExtensions]]).
  *
  * The operator itself is a distributed long-sequence source (a
  * `spark.range` built from scratch): useful as a synthetic-data leaf, and
  * small enough that every extension seam stays visible. The rule folds
  * `id` range predicates directly into the leaf's bounds — source-level
  * filter pushdown for a custom plan, the same shape a DSv2 pushdown or a
  * custom scan-pruning rule takes at 100 TB (don't generate-then-filter;
  * never materialize pruned work). */
case class GraftSequence(start: Long, end: Long, slices: Int,
                         output: Seq[Attribute]) extends LeafNode {
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = math.max(0L, end - start) * 8L)
}

object GraftSequence {
  def node(start: Long, end: Long, slices: Int): GraftSequence =
    GraftSequence(start, end, slices,
      Seq(AttributeReference("id", LongType, nullable = false)()))

  /** User-facing constructor: `GraftSequence.df(spark, 0, 1000000)`. */
  def df(spark: SparkSession, start: Long, end: Long, slices: Int = 4): DataFrame =
    Bridge.ofRows(spark, node(start, end, slices))
}

/** Optimizer rule: fold `id` bound predicates into the sequence bounds so
  * pruned ranges are never generated. Non-bound conjuncts stay as a
  * residual Filter. */
class PushFilterIntoGraftSequence extends Rule[LogicalPlan] {
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def asLong(l: Literal): Option[Long] = l.value match {
    case i: java.lang.Integer => Some(i.longValue)
    case j: java.lang.Long => Some(j.longValue)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case Filter(cond, seq: GraftSequence) =>
      val id = seq.output.head
      var (lo, hi) = (seq.start, seq.end)
      val residual = conjuncts(cond).filter {
        case GreaterThanOrEqual(a: Attribute, l: Literal) if a.semanticEquals(id) =>
          asLong(l).forall { v => lo = math.max(lo, v); false }
        // `v + 1` at Long.MaxValue wraps to Long.MinValue and inverts the
        // bound (`id > MAX` would return all rows, `id <= MAX` none) — keep
        // the boundary literal as a residual conjunct instead of folding.
        case GreaterThan(a: Attribute, l: Literal) if a.semanticEquals(id) =>
          asLong(l).forall { v =>
            if (v == Long.MaxValue) true else { lo = math.max(lo, v + 1); false } }
        case LessThan(a: Attribute, l: Literal) if a.semanticEquals(id) =>
          asLong(l).forall { v => hi = math.min(hi, v); false }
        case LessThanOrEqual(a: Attribute, l: Literal) if a.semanticEquals(id) =>
          asLong(l).forall { v =>
            if (v == Long.MaxValue) true else { hi = math.min(hi, v + 1); false } }
        case EqualTo(a: Attribute, l: Literal) if a.semanticEquals(id) =>
          asLong(l).forall { v =>
            if (v == Long.MaxValue) true
            else { lo = math.max(lo, v); hi = math.min(hi, v + 1); false } }
        case _ => true
      }
      val pruned = seq.copy(start = lo, end = math.max(lo, hi))
      if (residual.isEmpty) pruned
      else Filter(residual.reduce(And), pruned)
  }
}

/** Planner strategy: map the logical leaf to its physical operator. */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GraftSequence(s, e, n, out) => GraftSequenceExec(s, e, n, out) :: Nil
    case _ => Nil
  }
}

/** Physical operator: generates the range across `slices` partitions with
  * no shuffle and no driver-side data; rows are produced directly as
  * UnsafeRows. */
case class GraftSequenceExec(start: Long, end: Long, slices: Int,
                             output: Seq[Attribute]) extends SparkPlan with LeafExecNode {
  override protected def doExecute(): RDD[InternalRow] = {
    val n = math.max(0L, end - start)
    val (s0, k) = (start, slices.toLong)
    sparkContext.parallelize(0 until slices, slices).mapPartitionsWithIndex { (i, _) =>
      val lo = s0 + i * n / k
      val hi = s0 + (i + 1) * n / k
      val proj = UnsafeProjection.create(Array[org.apache.spark.sql.types.DataType](LongType))
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      (lo until hi).iterator.map { v => row.update(0, v); proj(row) }
    }
  }
}
