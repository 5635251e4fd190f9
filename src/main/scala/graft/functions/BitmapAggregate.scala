package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Exact distinct counting that RE-AGGREGATES: the OLAP bitmap trick.
  *
  * `COUNT(DISTINCT x)` results cannot be rolled up — distinct users
  * per day don't sum to distinct users per week. The standard fix is
  * to aggregate a BITMAP of ids instead: day-level bitmaps OR together
  * into week/month/total bitmaps, and every level's cardinality is a
  * popcount — one pass over the fact table ever, every rollup after
  * that touches only (groups × bitmap) summary rows. That is what
  * keeps exact-distinct dashboards feasible at 100 TB: the fact scan
  * happens once, materialized day-grain bitmaps are a few KB per
  * group, and arbitrary time-range distincts become cheap merges.
  *
  * Representation: an UNCOMPRESSED word-aligned bitset (long words,
  * little level of indirection, popcount via Long.bitCount). Dense
  * words are the right shape for enumerated/dictionary-encoded id
  * domains (users, devices, skus); for sparse 64-bit id spaces a
  * production build swaps this buffer for a compressed roaring-style
  * bitmap behind the same three operators — the aggregate contract
  * (update / associative merge / eval) is representation-agnostic.
  * Ids must be in [0, MaxBits); out-of-domain ids fail fast with the
  * remediation in the message (dictionary-encode first).
  *
  * Buffers grow geometrically to the highest word touched, so a
  * group's buffer is proportional to its max id, not to MaxBits.
  */
object BitmapOps {
  /** 2^26 bits = 8 MiB per group ceiling — far above the testdata id
    * domain, low enough that a mis-keyed aggregate fails fast instead
    * of OOMing an executor. */
  val MaxBits: Long = 1L << 26

  def ensureWord(buf: Array[Long], word: Int): Array[Long] =
    if (word < buf.length) buf
    else {
      val grown = new Array[Long](math.max(word + 1, buf.length * 2))
      System.arraycopy(buf, 0, grown, 0, buf.length)
      grown
    }

  def serialize(buf: Array[Long]): Array[Byte] = {
    // trim trailing zero words: merge targets stay small for sparse groups
    var n = buf.length
    while (n > 0 && buf(n - 1) == 0L) n -= 1
    val bb = ByteBuffer.allocate(4 + n * 8)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new Array[Long](math.max(n, 1))
    var i = 0
    while (i < n) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  def orInto(into: Array[Long], from: Array[Long]): Array[Long] = {
    val out = ensureWord(into, from.length - 1)
    var i = 0
    while (i < from.length) { out(i) |= from(i); i += 1 }
    out
  }

  /** Popcount of a serialized bitmap, straight off the bytes. */
  def cardinality(bytes: Array[Byte]): Long = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    var c = 0L
    var i = 0
    while (i < n) { c += java.lang.Long.bitCount(bb.getLong()); i += 1 }
    c
  }
}

/** graft_bitmap(id): build the bitmap of non-negative long ids. */
case class BitmapBuild(
    idExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bitmap"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = idExpr.eval(input)
    if (v == null) buf
    else {
      val id = v.asInstanceOf[Number].longValue()
      if (id < 0 || id >= BitmapOps.MaxBits)
        throw new IllegalArgumentException(
          s"graft_bitmap: id $id outside [0, ${BitmapOps.MaxBits}) — " +
            "dictionary-encode the id column before bitmap aggregation")
      val out = BitmapOps.ensureWord(buf, (id >>> 6).toInt)
      out((id >>> 6).toInt) |= 1L << (id & 63)
      out
    }
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    BitmapOps.orInto(buf, other)

  override def eval(buf: Array[Long]): Any = BitmapOps.serialize(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = BitmapOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BitmapOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(idExpr = newChildren.head)
}

/** graft_bitmap_or(bitmap): re-aggregate serialized bitmaps by OR —
  * the rollup step that never re-reads the fact table. */
case class BitmapOr(
    bmExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(bmExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bitmap_or"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = bmExpr.eval(input)
    if (v == null) buf
    else BitmapOps.orInto(buf, BitmapOps.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    BitmapOps.orInto(buf, other)

  override def eval(buf: Array[Long]): Any = BitmapOps.serialize(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = BitmapOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BitmapOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapOr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapOr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(bmExpr = newChildren.head)
}

/** graft_bitmap_card(bitmap): popcount of a serialized bitmap — stays
  * inside whole-stage codegen (one static call on the byte array). */
case class BitmapCardinality(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitmap_card"

  override protected def nullSafeEval(input: Any): Any =
    BitmapOps.cardinality(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BitmapOps.cardinality($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
