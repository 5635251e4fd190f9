package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass winnowing fingerprints (k-char shingles, window w) as a
  * native expression.
  *
  * Replaces the nested-HOF formulation (`transform` of `array_min` of
  * `slice` over a `transform` of hashes): without common-subexpression
  * elimination Catalyst re-evaluated the inner hash transform inside
  * every window lambda — O(len·w) and quadratic for long documents.
  * This expression hashes each shingle once and takes window minima
  * with a monotonic deque, O(len) total, in one codegen-friendly call
  * (doGenCode emits a static invoke, so the surrounding projection
  * stays inside whole-stage codegen).
  *
  * Output is bit-identical to the HOF version (asserted by spec):
  * same XXH64 seed-42 hash Spark's `xxhash64` uses, same SQL substring
  * semantics at the tail, same `array_distinct` first-occurrence
  * order.
  */
case class WinnowMinima(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1, "winnow k and w must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_winnow"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects a string argument")
  }

  protected override def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Winnow {
  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val len = s.numChars()
    // mirrors greatest(len−k+1, 1): short/empty docs hash one
    // (truncated) shingle, exactly like substring() would produce
    val nH = math.max(len - k + 1, 1)
    val hashes = new Array[Long](nH)
    var i = 0
    while (i < nH) {
      val sub = s.substringSQL(i + 1, k)
      hashes(i) = XXH64.hashUnsafeBytes(sub.getBaseObject, sub.getBaseOffset, sub.numBytes, 42L)
      i += 1
    }
    // distinct window minima in first-occurrence order
    // (= array_distinct over per-window array_min)
    val out = new java.util.LinkedHashSet[java.lang.Long]
    if (nH <= w) {
      var m = hashes(0); var j = 1
      while (j < nH) { if (hashes(j) < m) m = hashes(j); j += 1 }
      out.add(m)
    } else {
      // monotonic deque of indices; front = argmin of current window
      val deque = new Array[Int](nH)
      var head = 0; var tail = 0 // live slice is [head, tail)
      var j = 0
      while (j < nH) {
        while (tail > head && hashes(deque(tail - 1)) >= hashes(j)) tail -= 1
        deque(tail) = j; tail += 1
        if (deque(head) <= j - w) head += 1
        if (j >= w - 1) out.add(hashes(deque(head)))
        j += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var x = 0
    while (it.hasNext) { arr(x) = it.next(); x += 1 }
    new GenericArrayData(arr)
  }
}
