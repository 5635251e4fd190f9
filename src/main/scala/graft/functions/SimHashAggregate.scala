package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** 64-bit SimHash as ONE aggregate function over per-token hashes.
  *
  * Why not 64 `sum((h >> j) & 1)` columns: each sum is its own
  * aggregate expression, so the generated aggregate class carries 64
  * buffer slots and 64 update trees — big enough that codegen/JIT time
  * dominated the operator (196 s in the round-1 bench). Here the
  * buffer is a single `long[65]` (64 bit-counts + the token count) and
  * the per-row update is a 64-iteration shift loop on one JVM array —
  * no codegen blowup, identical partial-aggregation shape (map-side
  * combine, merge = element-wise add), so the shuffle still carries
  * one 520-byte buffer per (group × map task).
  *
  * eval folds the counts directly: bit j of the result is set iff
  * 2·count(bit j) > n_tokens — the majority rule — so the aggregate
  * returns the finished signature and the plan needs no post-select
  * bit assembly.
  */
case class SimHash64(
    hashExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(hashExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](65)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hashExpr.eval(input)
    if (h != null) {
      val v = h.asInstanceOf[Long]
      var j = 0
      while (j < 64) { buf(j) += (v >>> j) & 1L; j += 1 }
      buf(64) += 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 65) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf(64)
    var sig = 0L
    var j = 0
    while (j < 64) { if (buf(j) * 2L > n) sig |= 1L << j; j += 1 }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(65 * 8)
    var j = 0
    while (j < 65) { bb.putLong(buf(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](65)
    var j = 0
    while (j < 65) { buf(j) = bb.getLong(); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHash64 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHash64 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(hashExpr = newChildren(0))
}
