package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003): rolling Rabin–Karp hashes of byte k-grams, then the
  * minimum hash of each sliding window of w hashes (rightmost-min rule)
  * — guaranteeing any match of length ≥ w+k−1 shares a fingerprint. */
object WinnowUtil {
  val K = 8 // k-gram length (bytes)
  val W = 4 // winnow window

  private val B = 257L
  private val BK = { var p = 1L; (0 until K).foreach(_ => p *= B); p } // B^K mod 2^64

  def fingerprints(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < K) return new GenericArrayData(Array.empty[Long])
    val m = n - K + 1
    val hs = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < K) { h = h * B + (bytes(i) & 0xff); i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = h * B - (bytes(i - 1) & 0xff) * BK + (bytes(i + K - 1) & 0xff)
      hs(i) = h
      i += 1
    }
    // winnow: rightmost minimum of each window of W hashes
    val sel = new java.util.TreeSet[java.lang.Long]()
    var start = 0
    while (start + W <= m) {
      var minIdx = start
      var j = start + 1
      while (j < start + W) { if (hs(j) <= hs(minIdx)) minIdx = j; j += 1 }
      sel.add(hs(minIdx))
      start += 1
    }
    if (sel.isEmpty) sel.add(hs(0))
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** string → array<long>: the winnowed fingerprint set (sorted distinct). */
case class WinnowFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    WinnowUtil.fingerprints(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowUtil.fingerprints($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Winnow {
  def fingerprint(text: Column): Column =
    GraftBridge.toColumn(WinnowFingerprint(GraftBridge.toExpression(text)))
}
