package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters as a mergeable aggregate.
  *
  * The bounded-memory path to hot items at 100 TB: the exact
  * formulation (explode → groupBy token → top-k, tx6) must shuffle one
  * row per DISTINCT token — fine for word vocabularies, ruinous for
  * n-gram/URL/id domains whose cardinality tracks the corpus. A
  * Misra–Gries summary of capacity c is a fixed c-entry map per
  * partial, merged associatively (Agarwal et al., "Mergeable summaries",
  * PODS'12): counts come back under-estimated by at most n/(c+1)
  * (n = total items), so any item with true frequency > n/(c+1) is
  * GUARANTEED present — choose c ≫ 1/supportThreshold and read the
  * survivors. The shuffle carries partitions × c fixed-width entries,
  * independent of cardinality.
  *
  * Estimates (not the survivor guarantee) depend on merge order, so
  * this is spec-gated (planted frequencies, error bound) rather than
  * oracle-hashed.
  *
  * Output: array<struct<item string, est bigint>>, est descending,
  * item ascending on ties.
  */
case class MisraGries(
    itemExpr: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[String, Long]] {

  private lazy val cap: Int = capExpr.eval().asInstanceOf[Number].intValue()

  /** Misuse fails at analysis time, not mid-job: the capacity must be a
    * literal (a non-foldable capacity would be eval()'d with no input
    * row) and >= 1 (cap <= 0 would make offer() take min of an empty
    * map on the first item). */
  override def checkInputDataTypes(): TypeCheckResult = {
    if (!itemExpr.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure("graft_heavyhitters: item must be STRING")
    else if (!capExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_heavyhitters: capacity must be a literal")
    else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(capExpr.dataType))
      TypeCheckResult.TypeCheckFailure("graft_heavyhitters: capacity must be integral")
    else capExpr.eval() match {
      case n: Number if n.longValue() >= 1L => TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure("graft_heavyhitters: capacity must be >= 1")
    }
  }

  override def children: Seq[Expression] = Seq(itemExpr, capExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_heavyhitters"

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, Long] =
    mutable.LinkedHashMap.empty[String, Long]

  /** Classic MG step: count if tracked, insert if room, else decrement
    * every counter (amortized O(1) via the lazy sweep below). */
  private def offer(buf: mutable.LinkedHashMap[String, Long], item: String, w: Long): Unit = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + w)
      case None if buf.size < cap => buf.update(item, w)
      case None =>
        // decrement-all by the smallest of (w, current min); repeat
        // until the new item found room or its weight is absorbed
        var remaining = w
        while (remaining > 0 && !buf.contains(item) && buf.size >= cap) {
          val dec = math.min(remaining, buf.values.min)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keys.toArray.foreach { k =>
            val nv = buf(k) - dec
            if (nv <= 0) dead += k else buf.update(k, nv)
          }
          dead.foreach(buf.remove)
          remaining -= dec
          if (remaining > 0 && buf.size < cap) buf.update(item, remaining)
        }
    }
  }

  override def update(
      buf: mutable.LinkedHashMap[String, Long], input: InternalRow): mutable.LinkedHashMap[String, Long] = {
    val v = itemExpr.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  /** Mergeable-summaries merge: add counts, then if over capacity
    * subtract the (cap+1)-th largest count from everything. */
  override def merge(
      buf: mutable.LinkedHashMap[String, Long],
      other: mutable.LinkedHashMap[String, Long]): mutable.LinkedHashMap[String, Long] = {
    other.foreach { case (k, v) => buf.update(k, buf.getOrElse(k, 0L) + v) }
    if (buf.size > cap) {
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse).apply(cap)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keys.toArray.foreach { k =>
        val nv = buf(k) - cut
        if (nv <= 0) dead += k else buf.update(k, nv)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.LinkedHashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est).asInstanceOf[Any]
    })
  }

  override def serialize(buf: mutable.LinkedHashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    // length-prefixed raw UTF-8, not writeUTF: writeUTF throws for
    // items whose encoding exceeds 65535 bytes (base64-ish blobs in a
    // real corpus) — a mid-job crash, not a graceful degrade
    buf.foreach { case (k, v) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb); out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.update(new String(kb, "UTF-8"), in.readLong())
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0), capExpr = newChildren(1))
}
