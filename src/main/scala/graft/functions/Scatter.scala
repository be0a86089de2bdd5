package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Integer scatter matrix Σ c·cᵀ as a single-pass aggregate — the
  * sufficient statistic for PCA/covariance over a quantized embedding
  * corpus (emb05). Same architecture as the CMS/HLL/Hist family: the
  * buffer IS the statistic (the upper triangle of the d×d Long matrix,
  * d(d+1)/2 cells — symmetry halves both the arithmetic and the
  * buffer), updated in place per row and merged cell-wise across the
  * exchange, so a 100 TB scan ships ONE ~16 KB buffer per map
  * partition instead of a d²-exploded corpus-sized aggregation (the
  * naive posexplode(i)×posexplode(j) form carries |corpus|·d² rows
  * into the shuffle). eval() mirrors the triangle into the full d×d
  * nested array so downstream consumers (and the DuckDB oracle's
  * full-matrix replay) read plain S[i][j].
  *
  * All integer: inputs are centered int8-grid components (|c| ≤ 254),
  * so a cell overflows 2⁶³ only past ~1.4e14 rows — the emb03/q31
  * "exact integers or it can't be oracle'd" argument applied to the
  * second moment.
  */
case class ScatterAggregate(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim > 0, s"scatter_matrix: dim must be positive, got $dim")

  // SQL-reachable (GraftSql registers scatter_matrix), so reject wrong
  // input types at analysis time: array<bigint> would otherwise be read
  // via getInt on 8-byte elements and silently produce garbage, and a
  // null element would silently count as 0.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      // containsNull=true is accepted (higher-order functions mark their
      // results nullable even when no element is) — update() then
      // rejects an ACTUAL null element loudly instead of counting it 0.
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "scatter_matrix requires an ARRAY<INT> argument, got " +
            s"${other.sql} (cast components to INT first)")
    }
  }

  private lazy val elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](dim * (dim + 1) / 2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      require(a.numElements() == dim,
        s"scatter_matrix: expected $dim components, got ${a.numElements()}")
      if (elementsNullable) {
        var i = 0
        while (i < dim) {
          if (a.isNullAt(i)) throw new IllegalArgumentException(
            s"scatter_matrix: null component at index $i — " +
              "filter(a, e -> e IS NOT NULL) or impute before aggregating")
          i += 1
        }
      }
      Scatter.accumulate(buf, a.getInt, dim)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val rows = new Array[Any](dim)
    var i = 0
    while (i < dim) {
      val r = new Array[Long](dim)
      var j = 0
      while (j < dim) {
        r(j) = if (j >= i) buf(Scatter.rowBase(i, dim) + j)
          else buf(Scatter.rowBase(j, dim) + i)
        j += 1
      }
      rows(i) = new GenericArrayData(r)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ScatterAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ScatterAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ScatterAggregate =
    copy(child = newChildren(0))
  override def prettyName: String = "scatter_matrix"
}

object Scatter {
  import org.apache.spark.sql.GraftBridge

  /** `scatter_matrix(c, dim)` aggregate column: the full d×d Σ c·cᵀ
    * as array<array<bigint>> (triangle-computed, mirrored on eval). */
  def scatterMatrix(c: Column, dim: Int): Column =
    GraftBridge.toColumn(ScatterAggregate(
      GraftBridge.toExpression(c), dim).toAggregateExpression())

  /** Triangle offset of row i: cells (i,i)..(i,dim−1) live at
    * rowBase(i,dim)+i .. rowBase(i,dim)+dim−1. */
  @inline private[graft] def rowBase(i: Int, dim: Int): Int =
    i * dim - i * (i - 1) / 2 - i

  /** Fold one vector's outer product into the triangle buffer — the
    * ONE accumulation kernel, shared by the batch aggregate and the
    * streaming twin (SketchStream.scatterCells) so their cells cannot
    * drift. */
  private[graft] def accumulate(buf: Array[Long], get: Int => Int,
      dim: Int): Unit = {
    var i = 0
    while (i < dim) {
      val ci = get(i).toLong
      val base = rowBase(i, dim)
      var j = i
      while (j < dim) {
        buf(base + j) += ci * get(j)
        j += 1
      }
      i += 1
    }
  }
}
