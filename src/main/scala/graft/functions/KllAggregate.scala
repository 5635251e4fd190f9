package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Re-aggregatable quantile sketches (Datasketches KLL) — the third
  * leg of the mergeable-summary family (q62 exact-distinct bitmaps,
  * q66 approximate-distinct HLL, here approximate QUANTILES).
  *
  * Exact percentiles need a full sort per group per question; a KLL
  * sketch is a few KB per group, built in one pass, merged
  * associatively — so day-grain sketches materialized once answer any
  * later quantile question over any time range as a KB-scale merge,
  * the same at-rest pattern as the other two families. k=200 gives
  * ~1.65% one-sided rank error at 99% confidence (Karnin–Lang–
  * Liberty, FOCS'16); estimates are actual stream values (order
  * statistics), not interpolations. Sketch compaction flips
  * pseudo-random bits, so outputs are estimate-stable only within
  * rank-error bounds — spec-gated like every sketch here (q29
  * policy). */
object KllOps {
  val DefaultK = 200

  def quantile(bytes: Array[Byte], rank: Double): Double =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getQuantile(rank)
}

/** graft_kll(x): one-pass KLL sketch of a numeric column. */
case class KllBuild(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("graft_kll: input must be numeric")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kll"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(KllOps.DefaultK)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Number].doubleValue())
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** graft_kll_merge(sk): re-aggregate serialized sketches — the rollup
  * step that never re-reads the fact table. */
case class KllMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("graft_kll_merge: input must be a KLL sketch (BINARY)")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kll_merge"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(KllOps.DefaultK)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** graft_kll_quantile(sk, rank): estimated quantile off the serialized
  * bytes — stays in whole-stage codegen. The rank must be a numeric
  * LITERAL in [0, 1] (a SQL `0.95` parses as DECIMAL — accepted and
  * folded to a constant double at analysis, like the other sized
  * graft aggregates). */
case class KllQuantile(left: Expression, right: Expression) extends BinaryExpression {

  private lazy val rankVal: Double = right.eval() match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[BinaryType])
      TypeCheckResult.TypeCheckFailure("graft_kll_quantile: sketch must be BINARY")
    else if (!right.foldable || !(right.dataType.isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckFailure("graft_kll_quantile: rank must be a numeric literal")
    else if (rankVal < 0.0 || rankVal > 1.0)
      TypeCheckResult.TypeCheckFailure("graft_kll_quantile: rank must be in [0, 1]")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kll_quantile"

  override protected def nullSafeEval(sk: Any, rank: Any): Any =
    KllOps.quantile(sk.asInstanceOf[Array[Byte]], rankVal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, _) => s"graft.functions.KllOps.quantile($s, ${rankVal}d)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
