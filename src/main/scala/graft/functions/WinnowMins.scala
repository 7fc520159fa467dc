package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD'03):
  * the DISTINCT minima of every w-length sliding window over a k-gram
  * hash array, in first-occurrence order — exactly
  * `array_distinct(transform(sequence(1, greatest(1, n-w+1)),
  *    i -> array_min(slice(hs, i, w))))`
  * but O(n) via a monotonic deque instead of O(n·w) with a fresh slice
  * allocation per window, and a native JVM loop instead of Catalyst's
  * interpreted lambda evaluator (higher-order functions never enter
  * whole-stage codegen). Measured ~6 s → sub-second on the t33 corpus
  * at sf0.1.
  *
  * For n < w the single window is the whole array (slice truncates at
  * the end), matching the SQL form's greatest(1, ·) guard.
  *
  * DELIBERATE deviation at n = 0: this returns the empty array, while
  * the SQL form above yields `[null]` (array_min over the empty slice
  * is NULL and array_distinct keeps it). An empty fingerprint set is
  * the only useful answer for an empty document — a nullable element
  * type just to carry that sentinel would poison every downstream
  * `sorted_intersect_count` — so the element type stays
  * containsNull = false. Unreachable via `shingle_hashes` (which always
  * emits ≥ 1 element), but the function is registered as a general
  * session SQL function, so external callers should know.
  * SortedIntersectSpec pins both the equivalence on non-empty inputs
  * and this divergence at the empty input.
  */
object WinnowMins {
  def compute(x: ArrayData, w: Int): ArrayData = {
    val n = x.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // live indices in [head, tail)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    val firstEmit = math.min(w, n) - 1
    var i = 0
    while (i < n) {
      val v = x.getLong(i)
      while (tail > head && x.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= firstEmit) {
        val m = x.getLong(deque(head))
        if (seen.add(m)) out += m
      }
      i += 1
    }
    new GenericArrayData(out.result())
  }
}

case class WinnowMins(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }) && right.dataType == IntegerType && right.foldable
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"winnow_mins requires (array<bigint>, literal int), got ${left.dataType} / ${right.dataType}")
  }
  override def prettyName: String = "winnow_mins"

  override def nullSafeEval(a: Any, b: Any): Any =
    WinnowMins.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  // single static call — the loop itself is JVM-compiled; codegen only
  // wires null checks and the ArrayData hand-off
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.WinnowMins.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WinnowMins =
    copy(left = newLeft, right = newRight)
}
