package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Fixed-bin integer histogram as a PRODUCTION single-pass aggregate —
  * the QUANTILE member of the mergeable-sketch family (CmsAggregate =
  * frequency, HllAggregate = distinct count, this = rank/percentile).
  *
  * Shape: a TypedImperativeAggregate whose buffer IS the bin-count
  * array (`nBins` longs). Each input long lands in bin
  * `clamp((x - lo) / binWidth, 0, nBins-1)` — pure integer floor
  * division, so the bin assignment (and therefore every count, and
  * therefore every rank answer derived from the counts) replays
  * bit-for-bit in any engine. Partial buffers merge bin-wise across
  * the exchange (count addition is associative/commutative — the
  * sketch's defining property), so at 100 TB a percentile estimate
  * costs one corpus scan plus a CONSTANT-size shuffle (nBins·8 bytes
  * per map partition per group), where exact percentiles
  * (q19_quantity_percentiles) shuffle the data and q19c's hash sample
  * still shuffles a corpus-proportional sliver.
  *
  * Accuracy model: a rank query answered from the histogram is exact
  * about WHICH bin holds the rank; the value is known to within one
  * binWidth (the bin's lower edge is reported). Error is bounded by
  * the bin width — fixed in VALUE units, independent of corpus size —
  * versus q19b's KLL (rank-error, not engine-replayable) and q19c's
  * sample (probabilistic, corpus-independent). Out-of-range values
  * clamp into the edge bins, so the sketch never drops rows — a
  * consumer that cares can read the edge-bin counts as the
  * out-of-range audit.
  *
  * Values are fed as integer-quantized longs (cents for prices —
  * exact via DECIMAL(18,2)·100 in both engines); the SQL facade form
  * is `hist_sketch(x, lo, binWidth, nBins)`.
  */
case class HistAggregate(
    child: Expression,
    lo: Long,
    binWidth: Long,
    nBins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(binWidth > 0, s"hist_sketch: binWidth must be positive, got $binWidth")
  require(nBins > 0 && nBins <= (1 << 20),
    s"hist_sketch: nBins must be in [1, 2^20], got $nBins")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nBins)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) buf(Hist.bin(v.asInstanceOf[Long], lo, binWidth, nBins)) += 1L
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

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

  override def withNewMutableAggBufferOffset(newOffset: Int): HistAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistAggregate =
    copy(child = newChildren(0))
  override def prettyName: String = "hist_sketch"
}

object Hist {
  import org.apache.spark.sql.GraftBridge

  /** `hist_sketch(x)` aggregate column: the nBins bin-count array. */
  def histSketch(x: Column, lo: Long, binWidth: Long, nBins: Int): Column =
    GraftBridge.toColumn(HistAggregate(
      GraftBridge.toExpression(x), lo, binWidth, nBins).toAggregateExpression())

  /** The bin for a value — the derivation shared by the batch
    * aggregate and the streaming state (SketchStream.histBins). The
    * `d < 0` branch catches long overflow of `x - lo` (possible when
    * lo is very negative and x very positive — hist_sketch is
    * SQL-exposed, so the bounds are caller-controlled): the true
    * difference exceeds Long.MaxValue, which is past any bin range,
    * so it clamps into the last bin like any other above-range value
    * instead of indexing negatively. */
  private[graft] def bin(x: Long, lo: Long, binWidth: Long, nBins: Int): Int =
    if (x < lo) 0
    else {
      val d = x - lo
      if (d < 0) nBins - 1
      else math.min(d / binWidth, nBins - 1L).toInt
    }
}
