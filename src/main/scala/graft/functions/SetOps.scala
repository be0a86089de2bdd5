package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared kernel for interpreted eval and codegen. */
object SetOpsUtil {
  private def unsorted(side: String): Nothing =
    throw new IllegalArgumentException(
      s"jaccard_sorted: $side array is not ascending-sorted — " +
        "sort inputs with sort_array() before calling")

  /** Distinct-set Jaccard of two ASCENDING-sorted long arrays (duplicate
    * values tolerated — each run counts once) via a single merge pass.
    * NaN when both sides are empty, mirroring the 0/0 of the
    * size(array_intersect)/size(array_union) composition it replaces.
    *
    * Sortedness is VERIFIED, not assumed: the merge already touches the
    * run boundaries, so a descent check costs one compare per distinct
    * run — an unsorted input (possible from the public SQL surface,
    * where nothing forces callers through sort_array) fails loudly
    * instead of returning a silently wrong Jaccard.
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
        if (i < n && x.getLong(i) < a) unsorted("left")
        if (j < m && y.getLong(j) < a) unsorted("right")
      } else if (a < b) {
        union += 1
        while (i < n && x.getLong(i) == a) i += 1
        if (i < n && x.getLong(i) < a) unsorted("left")
      } else {
        union += 1
        while (j < m && y.getLong(j) == b) j += 1
        if (j < m && y.getLong(j) < b) unsorted("right")
      }
    }
    while (i < n) {
      val a = x.getLong(i); union += 1
      while (i < n && x.getLong(i) == a) i += 1
      if (i < n && x.getLong(i) < a) unsorted("left")
    }
    while (j < m) {
      val b = y.getLong(j); union += 1
      while (j < m && y.getLong(j) == b) j += 1
      if (j < m && y.getLong(j) < b) unsorted("right")
    }
    if (union == 0) Double.NaN else inter.toDouble / union
  }

  /** Distinct intersection size of two ASCENDING-sorted long arrays —
    * the counting core of [[jaccardSorted]] without the union tally.
    * Same merge scan, same loud failure on unsorted input. */
  def intersectCountSorted(x: ArrayData, y: ArrayData): Long = {
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0
    var inter = 0L
    while (i < n && j < m) {
      val a = x.getLong(i); val b = y.getLong(j)
      if (a == b) {
        inter += 1
        while (i < n && x.getLong(i) == a) i += 1
        while (j < m && y.getLong(j) == a) j += 1
        if (i < n && x.getLong(i) < a) unsorted("left")
        if (j < m && y.getLong(j) < a) unsorted("right")
      } else if (a < b) {
        while (i < n && x.getLong(i) == a) i += 1
        if (i < n && x.getLong(i) < a) unsorted("left")
      } else {
        while (j < m && y.getLong(j) == b) j += 1
        if (j < m && y.getLong(j) < b) unsorted("right")
      }
    }
    inter
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
  * matters. Inputs MUST be ascending-sorted (callers use sort_array) —
  * the kernel verifies this and fails loudly on descent; values are
  * identical to the built-in composition (both engines' distinct-set
  * semantics), so the DuckDB oracles are unchanged.
  *
  * Exposed on the public SQL surface as `jaccard_sorted`, so input
  * types are gated at analysis: arrays that may CONTAIN NULL elements
  * are rejected (ArrayData.getLong on a null slot reads an undefined
  * value — a wrong Jaccard, not an error), with a proper type-check
  * message rather than an unresolved-expression failure.
  */
case class JaccardSortedLongs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, false) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "jaccard_sorted requires two ARRAY<BIGINT> arguments whose elements " +
        s"cannot be null, got ${left.dataType.sql} and ${right.dataType.sql}" +
        " (wrap nullable arrays in filter(a, e -> e IS NOT NULL) first)")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SetOpsUtil.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SetOpsUtil.jaccardSorted($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused distinct intersection COUNT over pre-sorted long arrays — the
  * adjacency-intersection core of triangle counting (Graph.scala) and
  * of any sorted-set overlap tally. Same merge-scan/codegen/type-gate
  * design as [[JaccardSortedLongs]]; returns BIGINT. */
case class IntersectCountSortedLongs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, false) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "intersect_count_sorted requires two ARRAY<BIGINT> arguments whose " +
        s"elements cannot be null, got ${left.dataType.sql} and ${right.dataType.sql}" +
        " (wrap nullable arrays in filter(a, e -> e IS NOT NULL) first)")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SetOpsUtil.intersectCountSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SetOpsUtil.intersectCountSorted($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SetOps {
  /** jaccard over ascending-sorted array<long> columns. */
  def jaccardSorted(a: Column, b: Column): Column =
    GraftBridge.toColumn(JaccardSortedLongs(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  /** distinct |a ∩ b| over ascending-sorted array<long> columns. */
  def intersectCountSorted(a: Column, b: Column): Column =
    GraftBridge.toColumn(IntersectCountSortedLongs(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
