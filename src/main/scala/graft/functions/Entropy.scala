package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object EntropyUtil {
  /** Shannon entropy (bits/byte) of the byte distribution — the classic
    * gibberish/compressibility signal for corpus filtering (low entropy:
    * repeated padding; high entropy: random noise / binary junk). */
  def charEntropy(s: UTF8String): Double = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0.0
    val counts = new Array[Int](256)
    var i = 0
    while (i < n) { counts(bytes(i) & 0xff) += 1; i += 1 }
    var h = 0.0
    var b = 0
    val ln2 = math.log(2.0)
    while (b < 256) {
      val c = counts(b)
      if (c > 0) {
        val p = c.toDouble / n
        h -= p * math.log(p) / ln2
      }
      b += 1
    }
    h
  }
}

/** string → double: byte-distribution Shannon entropy, fused single pass. */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    EntropyUtil.charEntropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.EntropyUtil.charEntropy($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Entropy {
  def charEntropy(text: Column): Column =
    GraftBridge.toColumn(CharEntropy(GraftBridge.toExpression(text)))
}
