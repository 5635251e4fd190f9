package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Theta sketches — approximate distinct counting over SET
  * EXPRESSIONS, the capability the rest of the sketch family lacks:
  * HLL (q66) unions but cannot intersect, so "users who clicked AND
  * purchased" needs either an exact (shuffle-everything) distinct
  * join or a theta sketch, which supports union / intersection /
  * difference in sketch space (Dasgupta et al., "Theta-Sketch
  * Framework", and the Apache DataSketches theta implementation).
  * Audience-overlap matrices at 100 TB: one sketch per segment
  * materialized in a single fact pass, every pairwise overlap then a
  * KB-scale set operation — no re-scan, no pairwise joins over raw
  * ids. Default nominal entries 4096 → RSE ≈ 1/√4096 ≈ 1.6%;
  * set-op results degrade gracefully and carry their own bounds.
  * Estimates are engine/seed-specific → spec-gated (q29 policy). */
object ThetaOps {
  def heapify(bytes: Array[Byte]): Sketch = Sketch.heapify(Memory.wrap(bytes))

  def estimate(bytes: Array[Byte]): Double = heapify(bytes).getEstimate

  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildIntersection()
      .intersect(heapify(a), heapify(b)).toByteArray

  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildANotB()
      .aNotB(heapify(a), heapify(b)).toByteArray
}

private[functions] trait ThetaAggBase extends TypedImperativeAggregate[Union] {
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): Union = SetOperation.builder().buildUnion()

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult); buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(ThetaOps.heapify(bytes))
    u
  }
}

/** graft_theta(x): theta sketch of an integral key column. */
case class ThetaBuild(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("graft_theta: key must be integral")
  }

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_theta"

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Number].longValue())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** graft_theta_union(sk): re-aggregate serialized theta sketches. */
case class ThetaUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("graft_theta_union: input must be a theta sketch (BINARY)")
  }

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_theta_union"

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(ThetaOps.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** graft_theta_estimate(sk): distinct estimate off the bytes. */
case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("graft_theta_estimate: input must be BINARY")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_estimate"

  override protected def nullSafeEval(sk: Any): Any =
    ThetaOps.estimate(sk.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.ThetaOps.estimate($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

private[functions] trait ThetaBinOp extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[BinaryType] && right.dataType.isInstanceOf[BinaryType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName: both inputs must be theta sketches (BINARY)")
  override def dataType: DataType = BinaryType
}

/** graft_theta_intersect(a, b): sketch of A ∩ B. */
case class ThetaIntersect(left: Expression, right: Expression) extends ThetaBinOp {
  override def prettyName: String = "graft_theta_intersect"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaOps.intersect(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ThetaOps.intersect($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** graft_theta_anotb(a, b): sketch of A ∖ B. */
case class ThetaANotB(left: Expression, right: Expression) extends ThetaBinOp {
  override def prettyName: String = "graft_theta_anotb"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaOps.aNotB(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ThetaOps.aNotB($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
