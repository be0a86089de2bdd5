package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Z-order (Morton) curve utilities: the multi-dimensional data-layout
  * discipline bucketing (bk01) can't provide. Bucketing co-locates ONE
  * key; interleaving the bits of TWO keys makes rows close in (a, b)
  * space land in the same or nearby z-cells, so a table laid out by
  * z-cell serves 2-D range queries by touching only the cells that
  * intersect the query box — every other partition is pruned at
  * planning time (bk02, StorageLayoutSpec). The same curve is what
  * lakehouse OPTIMIZE/ZORDER clustering implements; here it is a
  * first-class layout + query path.
  */
object ZOrderUtil {
  /** Interleave the low `bits` bits of two non-negative longs: bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1. bits ≤ 31 keeps
    * the result positive in a long. Negative inputs are rejected — the
    * curve is defined on the non-negative grid, and a silent
    * two's-complement interleave would place -1 above every positive
    * cell. Inputs ≥ 2^bits are rejected for the same reason: the
    * interleave would silently DROP their high bits, colliding two
    * distinct keys onto one z-value — and z_value is SQL-registered,
    * so an external caller passing raw un-bucketed keys would get a
    * silently wrong layout instead of a loud error. */
  def interleave(a: Long, b: Long, bits: Int): Long = {
    if (a < 0 || b < 0) throw new IllegalArgumentException(
      s"z_value: inputs must be non-negative, got ($a, $b)")
    if (a >= (1L << bits) || b >= (1L << bits))
      throw new IllegalArgumentException(
        s"z_value: inputs must fit in $bits bits (< ${1L << bits}), " +
          s"got ($a, $b); bucket raw keys into grid cells first")
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >>> i) & 1L) << (2 * i)
      z |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** All z-cells whose (ca, cb) grid coordinates intersect the box
    * [ca0, ca1] × [cb0, cb1] — the planning-time bucket enumeration for
    * a 2-D range query (bounded by the grid size, driver-side by
    * design: it becomes an IN-list partition filter). */
  def rangeCells(ca0: Long, ca1: Long, cb0: Long, cb1: Long,
      bits: Int): Seq[Long] =
    for (ca <- ca0 to ca1; cb <- cb0 to cb1)
      yield interleave(ca, cb, bits)
}

/** `z_value(a, b)` — fused bit-interleave of two non-negative longs
  * (31 bits each), the Morton index used by the bk02 layout. A plain
  * scalar expression: stays inside whole-stage codegen on the write
  * path that computes one z-cell per row of the corpus. */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression {

  private val bits = 31

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"z_value requires two BIGINT arguments, got ${left.dataType.sql} " +
        s"and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderUtil.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderUtil.interleave($a, $b, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "z_value"
}

object ZOrder {
  /** Column form of [[ZValue]]. */
  def zValue(a: Column, b: Column): Column =
    GraftBridge.toColumn(ZValue(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
