package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution,
  Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** Broadcast band join: [[BandJoinExec]]'s semantics with
  * [[BroadcastAsofJoinExec]]'s plan shape — the small build side ships
  * to every executor and the PROBE SIDE IS NEVER SHUFFLED OR SORTED.
  * The per-key sorted-times index is the SAME structure the broadcast
  * as-of builds (and shares its memo, keyed by broadcast id + key
  * exprIds + time ordinal); a probe binary-searches the band's lower
  * edge and emits every row up to the upper edge, or one null-build
  * row when the band is empty. */
case class BroadcastBandJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    lowUs: Long,
    highUs: Long) extends SparkPlan with BinaryExecNode {

  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    "band join needs matching non-empty key lists")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"band key types differ: ${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
  require(AsofJoinPlan.timeTypeOk(leftTime.dataType) &&
      AsofJoinPlan.timeTypeOk(rightTime.dataType),
    "band time columns must be BIGINT micros or a timestamp type")
  require(lowUs <= highUs, s"band bounds inverted: [$lowUs, $highUs]")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil


  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    Map("numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeIdx = lOut.indexWhere(_.exprId == leftTime.exprId)
    val rTimeIdx = rOut.indexWhere(_.exprId == rightTime.exprId)
    require(lTimeIdx >= 0 && rTimeIdx >= 0, "time attribute not in child output")
    val allOut = output
    val nRight = rOut.size
    val lo = lowUs
    val hi = highUs
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    val memoKey = (bcast.id, rKeyExprs.map(_.exprId.id), rTimeIdx)

    left.execute().mapPartitions { lIter =>
      val index = BroadcastAsofJoinExec.indexFor(memoKey, {
        val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
        val grouped = new java.util.HashMap[InternalRow,
          scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
        bcast.value.foreach { r =>
          val k = rKeyProj(r).copy()
          var buf = grouped.get(k)
          if (buf == null) {
            buf = new scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]
            grouped.put(k, buf)
          }
          buf += ((r.getLong(rTimeIdx), r))
        }
        val out = new java.util.HashMap[InternalRow, (Array[Long], Array[InternalRow])](
          grouped.size * 2)
        grouped.forEach { (k, buf) =>
          val sorted = buf.sortBy(_._1)
          out.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
        }
        out
      })
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val resultProj = UnsafeProjection.create(allOut,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow

      AsofJoinPlan.counted(new Iterator[InternalRow] {
        // the probe row stays valid until the next lIter.next(), and
        // its whole band emits before that — no copies anywhere
        private var l: InternalRow = _
        private var rows: Array[InternalRow] = _
        private var times: Array[Long] = _
        private var idx = 0
        private var end = 0

        override def hasNext: Boolean = idx < end || lIter.hasNext

        override def next(): InternalRow = {
          if (idx < end) {
            val r = rows(idx); idx += 1
            return resultProj(joined(l, r))
          }
          l = lIter.next()
          val entry = index.get(lKeyProj(l))
          if (entry == null) return resultProj(joined(l, nullRight))
          val (ts, rs) = entry
          times = ts; rows = rs
          val lTime = l.getLong(lTimeIdx)
          // leftmost index with times(i) >= lTime + lo
          var loI = 0
          var hiI = ts.length - 1
          var first = ts.length
          while (loI <= hiI) {
            val mid = (loI + hiI) >>> 1
            if (ts(mid) >= lTime + lo) { first = mid; hiI = mid - 1 }
            else loI = mid + 1
          }
          // end = one past the last index with times(i) <= lTime + hi
          var e = first
          while (e < ts.length && ts(e) <= lTime + hi) e += 1
          if (first >= e) resultProj(joined(l, nullRight))
          else {
            idx = first + 1; end = e
            resultProj(joined(l, rs(first)))
          }
        }
      }, numOut)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastBandJoinExec =
    copy(left = newLeft, right = newRight)
}
