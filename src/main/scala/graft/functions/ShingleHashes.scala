package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-neutral char-k-gram shingle hash array of a document:
  * for each code-point position i in 1..max(1, len−k+1), the 60-bit
  * integer image of the k-gram's md5 — exactly
  * `transform(sequence(1, greatest(1, length(text)-k+1)),
  *    i -> CAST(conv(substring(md5(substring(text, i, k)), 1, 15), 16, 10) AS BIGINT))`
  * (the d01/d10/t33 shingle family; 15 hex digits = the digest's first
  * 7.5 bytes, which both Spark and DuckDB print identically).
  *
  * Native for the same reason as [[WinnowMins]]: the lambda form runs on
  * Catalyst's interpreted evaluator and allocates a UTF8String, a hex
  * string, and a decimal parse per shingle. Here one pass finds the
  * code-point byte offsets, then each k-gram is digested straight from
  * the text's UTF-8 bytes and folded to the 60-bit value without any
  * intermediate hex representation.
  */
object ShingleHashes {
  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of the digest as a non-negative long:
    * bytes 0..6 shifted in whole, then the high nibble of byte 7.
    */
  private def fold60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  def compute(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    // code-point start offsets (one scan); offs(n) = nBytes sentinel
    val offs = new Array[Int](nBytes + 1)
    var nCp = 0
    var b = 0
    while (b < nBytes) {
      offs(nCp) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      nCp += 1
    }
    offs(nCp) = nBytes
    val md = mdLocal.get()
    val nOut = math.max(1, nCp - k + 1)
    val out = new Array[Long](nOut)
    var i = 0
    while (i < nOut) {
      val from = offs(i)
      val until = offs(math.min(i + k, nCp))
      md.reset()
      md.update(bytes, from, until - from)
      out(i) = fold60(md.digest())
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType == StringType &&
      right.dataType == IntegerType && right.foldable
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires (string, literal int), got ${left.dataType} / ${right.dataType}")
  }
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleHashes.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)
}
