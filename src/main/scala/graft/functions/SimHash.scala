package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Shared runtime kernel so both interpreted eval and generated code run
  * the identical loop (called as a static method from codegen). */
object SimHashUtil {
  /** 64-bit SimHash over a token array: each token contributes ±1 per bit
    * position of its 64-bit hash (two 32-bit murmur halves with distinct
    * seeds); the sign of each bit-column sum becomes the output bit. */
  def simhash64(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val lo = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42)
        val hi = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 0x9747b28c)
        val h = (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
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
