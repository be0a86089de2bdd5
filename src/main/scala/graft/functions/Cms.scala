package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-min sketch as a PRODUCTION single-pass aggregate: a
  * TypedImperativeAggregate whose buffer is the d×w cell array itself —
  * one corpus scan, map-side partial sketches merged cell-wise across
  * the exchange (a sketch's defining property), no per-row d× explode.
  * The previous ev16 shape exploded every event d times and
  * hash-aggregated (seed, bucket) pairs: same integers, but the
  * exchange carried an aggregate over d×|events| generated rows where
  * this carries ONE fixed d·w·8-byte buffer per map partition —
  * at 100 TB the difference between a corpus-sized aggregation and a
  * constant-size one. eval() returns the flattened cells
  * (row-major: cell(seed, b) at index (seed−1)·w + b) so the existing
  * probe/audit machinery — and the unchanged DuckDB oracle — read the
  * exact integers the exploded form produced.
  *
  * The bucket hash is ev16's md5 derivation verbatim (the first 5 hex
  * digits of md5("<seed>_<id>") mod w), NOT xxhash: cross-engine
  * replayability is the whole point of the sketch-accuracy audit.
  */
case class CmsAggregate(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      var seed = 1
      while (seed <= depth) {
        buf((seed - 1) * width + CmsAggregate.bucket(seed, id, width)) += 1L
        seed += 1
      }
    }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsAggregate =
    copy(child = newChildren(0))
  override def prettyName: String = "cms_sketch"
}

object CmsAggregate {
  /** The bucket for (seed, id): value of the first 5 hex digits of
    * md5("<seed>_<id>"), mod `width` — bit-for-bit what the Column
    * form `conv(substring(md5(concat_ws('_', seed, id)), 1, 5), 16,
    * 10) % width` computes (concat_ws renders both operands in
    * decimal; 5 hex digits = bytes 0, 1 and the high nibble of 2). */
  def bucket(seed: Int, id: Long, width: Int): Int = {
    val dig = Md5.digest(seed.toString + "_" + id.toString)
    val v = ((dig(0) & 0xff) << 12) | ((dig(1) & 0xff) << 4) | ((dig(2) & 0xf0) >>> 4)
    v % width
  }
}

object Cms {
  import org.apache.spark.sql.GraftBridge

  /** `cms_sketch(id)` aggregate column: the flattened d×w cell array. */
  def cmsSketch(id: Column, depth: Int, width: Int): Column =
    GraftBridge.toColumn(CmsAggregate(
      GraftBridge.toExpression(id), depth, width).toAggregateExpression())
}
