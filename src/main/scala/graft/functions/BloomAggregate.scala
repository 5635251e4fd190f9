package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bloom-filter runtime join pruning — the semi-join tool for 100 TB.
  *
  * A selective semi-join (fact rows whose key appears in a filtered
  * dimension) normally shuffles the ENTIRE fact side: the filter on
  * the build side says nothing about which probe rows survive until
  * after the exchange. When the build side is too large to broadcast
  * as a hash relation but its KEY SET fits a few hundred KB of bits,
  * a Bloom filter of the build keys broadcast to the probe side
  * discards most non-matching fact rows map-side, BEFORE the shuffle —
  * the same idea as Spark's own runtime row-level filtering
  * (spark.sql.optimizer.runtime.bloomFilter), made explicit and
  * composable. False positives only let extra rows through to the
  * exact join that follows; false negatives cannot happen, so the
  * final result is EXACT and the filter is purely a shuffle-volume
  * optimization. Sizing: for n keys and target fp rate p, bits
  * m ≈ -n·ln(p)/ln(2)², hashes k ≈ (m/n)·ln(2); the aggregate takes
  * both explicitly so callers size for the expected build cardinality
  * at full scale.
  *
  * Hashing is double hashing (Kirsch–Mitzenmacher): two independent
  * 64-bit finalizer mixes h1, h2 of the key; bit i = (h1 + i·h2) mod m.
  * Deterministic — the same key set always yields the same bits, so
  * partial aggregates OR associatively and bloom(A ∪ B) ≡
  * bloom(A) | bloom(B) (spec-pinned).
  */
object BloomOps {
  /** splitmix64 finalizer — full-avalanche mix of a 64-bit value. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def set(words: Array[Long], numBits: Int, numHashes: Int, key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L // odd: never a degenerate zero stride
    var i = 0
    while (i < numHashes) {
      val bit = (((h1 + i * h2) % numBits + numBits) % numBits).toInt
      words(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** Serialized layout: Int numWords, Int numHashes, words. */
  def serialize(words: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(words.length)
    bb.putInt(numHashes)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  /** Membership test straight off the serialized bytes (no copy) —
    * called per probe row from generated code. */
  def mightContain(bytes: Array[Byte], key: Long): Boolean = {
    val bb = ByteBuffer.wrap(bytes)
    val numWords = bb.getInt()
    val numHashes = bb.getInt()
    val numBits = numWords << 6
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = (((h1 + i * h2) % numBits + numBits) % numBits).toInt
      if ((bb.getLong(8 + ((bit >>> 6) << 3)) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** graft_bloom(key, numBits, numHashes): aggregate long keys into a
  * serialized Bloom filter. numBits is rounded up to a multiple of 64;
  * both parameters must be positive literals (analysis-time check). */
case class BloomBuild(
    keyExpr: Expression,
    bitsExpr: Expression,
    hashesExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val numWords: Int =
    (bitsExpr.eval().asInstanceOf[Number].intValue() + 63) >>> 6
  private lazy val numBits: Int = numWords << 6
  private lazy val numHashes: Int = hashesExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult = {
    val integral = Seq[DataType](ByteType, ShortType, IntegerType, LongType)
    if (!integral.contains(keyExpr.dataType))
      TypeCheckResult.TypeCheckFailure("graft_bloom: key must be integral")
    else if (!bitsExpr.foldable || !hashesExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_bloom: numBits/numHashes must be literals")
    else if (!integral.contains(bitsExpr.dataType) || !integral.contains(hashesExpr.dataType))
      TypeCheckResult.TypeCheckFailure("graft_bloom: numBits/numHashes must be integral")
    else (bitsExpr.eval(), hashesExpr.eval()) match {
      case (m: Number, k: Number)
          if m.longValue() >= 1L && m.longValue() <= (1L << 30) && k.longValue() >= 1L =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_bloom: need 1 <= numBits <= 2^30 and numHashes >= 1")
    }
  }

  override def children: Seq[Expression] = Seq(keyExpr, bitsExpr, hashesExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = keyExpr.eval(input)
    if (v != null) BloomOps.set(buf, numBits, numHashes, v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < other.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomOps.serialize(buf, numHashes)
  override def serialize(buf: Array[Long]): Array[Byte] = BloomOps.serialize(buf, numHashes)
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt(); bb.getInt()
    val words = new Array[Long](n)
    var i = 0
    while (i < n) { words(i) = bb.getLong(); i += 1 }
    words
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(keyExpr = newChildren(0), bitsExpr = newChildren(1), hashesExpr = newChildren(2))
}

/** graft_might_contain(bloom, key): Bloom membership test — stays in
  * whole-stage codegen (one static call per probe row). */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[BinaryType])
      TypeCheckResult.TypeCheckFailure("graft_might_contain: bloom must be BINARY")
    else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(right.dataType))
      TypeCheckResult.TypeCheckFailure("graft_might_contain: key must be integral")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain"

  override protected def nullSafeEval(bloom: Any, key: Any): Any =
    BloomOps.mightContain(bloom.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"graft.functions.BloomOps.mightContain($b, (long) $k)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
