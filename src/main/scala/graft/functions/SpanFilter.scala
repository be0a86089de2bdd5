package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Kernel shared by interpreted eval and codegen: keep the tokens whose
  * index is covered by NO span. Spans arrive in collect_list order
  * (nondeterministic), so they are insertion-sorted by start first
  * (span lists are tiny — only a doc's duplicated regions); the walk is
  * then a single pass with a running max-end, which handles overlapping
  * and adjacent spans identically to `exists(spans, i ∈ [start, end))`.
  */
object SpanFilterUtil {
  def cut(toks: ArrayData, spans: ArrayData): ArrayData = {
    val n = toks.numElements()
    val m = spans.numElements()
    val starts = new Array[Long](m)
    val ends = new Array[Long](m)
    var j = 0
    while (j < m) {
      val r = spans.getStruct(j, 2)
      starts(j) = r.getLong(0); ends(j) = r.getLong(1)
      j += 1
    }
    var a = 1
    while (a < m) { // insertion sort by start (m is small by construction)
      val s0 = starts(a); val e0 = ends(a)
      var b = a - 1
      while (b >= 0 && starts(b) > s0) {
        starts(b + 1) = starts(b); ends(b + 1) = ends(b); b -= 1
      }
      starts(b + 1) = s0; ends(b + 1) = e0
      a += 1
    }
    val out = new Array[AnyRef](n)
    var cnt = 0
    var i = 0
    j = 0
    var maxEnd = Long.MinValue
    while (i < n) {
      while (j < m && starts(j) <= i) {
        if (ends(j) > maxEnd) maxEnd = ends(j)
        j += 1
      }
      if (i >= maxEnd) { out(cnt) = toks.getUTF8String(i); cnt += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOfRange(out, 0, cnt))
  }
}

/** The dd13/dd13b span cut as ONE fused expression: drop every token
  * whose index falls inside any (span_start, span_end) interval, in a
  * single sorted-interval pass per row.
  *
  * Why a custom expression (the PqEncode treatment, applied to the
  * scrub): the `filter(toks, (_, i) => !exists(spans, …))` higher-order
  * composition is CodegenFallback — interpreted per token × per span,
  * with a lambda-variable binding per step; the hot half of a corpus
  * scrub pass. This is an O(T + S log S) loop that whole-stage codegen
  * inlines (S = spans per doc, tiny by construction — only duplicated
  * regions).
  *
  * `left`: array<string> tokens. `right`: array<struct<span_start:
  * long, span_end: long>>; intervals may arrive unsorted (collect_list
  * order) and may overlap/touch — semantics are exactly "token i kept
  * iff no interval covers i". Null if either side is null
  * (BinaryExpression default; the caller coalesces a spanless doc to
  * its own tokens).
  */
case class SpanFilter(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = left.dataType

  override lazy val resolved: Boolean = childrenResolved &&
    (left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }) &&
    (right.dataType match {
      case ArrayType(StructType(fs), _) =>
        fs.length == 2 && fs.forall(_.dataType == LongType)
      case _ => false
    })

  override def nullSafeEval(t: Any, s: Any): Any =
    SpanFilterUtil.cut(t.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = graft.functions.SpanFilterUtil.cut($t, $s);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SpanFilter {
  import org.apache.spark.sql.GraftBridge

  /** Tokens with every spanned index removed — fused codegen loop. */
  def spanCut(toks: Column, spans: Column): Column =
    GraftBridge.toColumn(SpanFilter(
      GraftBridge.toExpression(toks), GraftBridge.toExpression(spans)))
}
