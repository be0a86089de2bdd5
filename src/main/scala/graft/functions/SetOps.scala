package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared kernel for interpreted eval and codegen. */
object SetOpsUtil {
  /** Distinct-set Jaccard of two ASCENDING-sorted long arrays (duplicate
    * values tolerated — each run counts once) via a single merge pass.
    * NaN when both sides are empty, mirroring the 0/0 of the
    * size(array_intersect)/size(array_union) composition it replaces.
    */
  def jaccardSorted(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0
    var inter = 0; var union = 0
    while (i < n && j < m) {
      val a = x.getLong(i); val b = y.getLong(j)
      if (a == b) {
        inter += 1; union += 1
        while (i < n && x.getLong(i) == a) i += 1
        while (j < m && y.getLong(j) == a) j += 1
      } else if (a < b) {
        union += 1
        while (i < n && x.getLong(i) == a) i += 1
      } else {
        union += 1
        while (j < m && y.getLong(j) == b) j += 1
      }
    }
    while (i < n) {
      val a = x.getLong(i); union += 1
      while (i < n && x.getLong(i) == a) i += 1
    }
    while (j < m) {
      val b = y.getLong(j); union += 1
      while (j < m && y.getLong(j) == b) j += 1
    }
    if (union == 0) Double.NaN else inter.toDouble / union
  }
}

/** Fused distinct-set Jaccard over pre-sorted long arrays.
  *
  * Replaces `size(array_intersect(a,b)) / size(array_union(a,b))` on the
  * near-dup verification path: the built-in composition builds two hash
  * maps and materializes two intermediate arrays PER CANDIDATE PAIR;
  * this expression is one branch-predictable merge scan with zero
  * allocation. The sort is hoisted to once per DOCUMENT (sort_array
  * before the pair join) instead of per pair — at 100 TB the candidate
  * verification stage evaluates this per pair, so per-pair cost is what
  * matters. Inputs MUST be ascending-sorted (callers use sort_array);
  * values are identical to the built-in composition (both engines'
  * distinct-set semantics), so the DuckDB oracles are unchanged.
  */
case class JaccardSortedLongs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override lazy val resolved: Boolean =
    childrenResolved && Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })

  override def nullSafeEval(a: Any, b: Any): Any =
    SetOpsUtil.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SetOpsUtil.jaccardSorted($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SetOps {
  /** jaccard over ascending-sorted array<long> columns. */
  def jaccardSorted(a: Column, b: Column): Column =
    GraftBridge.toColumn(JaccardSortedLongs(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
