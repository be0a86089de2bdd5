package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared runtime kernel so both interpreted eval and generated code run
  * the identical loop (called as a static method from codegen). */
object SimHashUtil {
  // one MessageDigest per thread; digest() resets the instance after use
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 64-bit token hash = the first 8 bytes of md5(token), big-endian —
    * equivalently the first 16 hex chars of md5's hex form parsed as an
    * unsigned 64-bit value. md5 (not murmur3) because BOTH engines can
    * compute it: the DuckDB oracle replays it as hex-digit arithmetic in
    * HUGEINT, which is what makes dd04 hash-exact end-to-end. (md5 costs
    * a few ns more per token than murmur3; the 64-bit-column update loop
    * below dominates the kernel either way.)
    */
  def tokenHash64(s: UTF8String): Long = {
    val dig = md.get().digest(s.getBytes)
    ((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
      ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
      ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
      ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)
  }

  /** 64-bit SimHash over a token array: each token contributes ±1 per bit
    * position of its 64-bit md5-derived hash; the sign of each bit-column
    * sum becomes the output bit. */
  def simhash64(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = tokenHash64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** SimHash64 as a native Catalyst expression: array<string> → long.
  *
  * A fused per-row kernel (one pass over the token array) instead of the
  * equivalent higher-order-function pipeline, which would rehash every
  * token 64 times. Codegen emits a single static call so the surrounding
  * stage stays inside whole-stage codegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override lazy val resolved: Boolean = childrenResolved && (child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  })

  override def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashUtil.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {
  /** Column wrapper: simhash64(tokens). */
  def simhash64(tokens: Column): Column =
    GraftBridge.toColumn(SimHash64(GraftBridge.toExpression(tokens)))
}
