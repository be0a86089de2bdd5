package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution,
  Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** Broadcast as-of join: the small build side ships to every executor
  * and the PROBE SIDE IS NEVER SHUFFLED OR SORTED — the plan the merge
  * variant cannot give you, and the one that matters at 100 TB: an
  * event stream joined as-of against a small dimension (exchange
  * rates, calibration tables, config history) with zero exchanges on
  * the stream. `requiredChildDistribution` asks only for a
  * `BroadcastDistribution(IdentityBroadcastMode)` on the right;
  * probe-side partitioning AND ordering pass through untouched.
  *
  * Per executor the broadcast rows index into {key → (sorted times,
  * rows)}; each probe is a hash lookup + binary search for the
  * greatest build time at-or-before the probe time. The index is
  * memoized per broadcast id (small LRU) so the thousands of tasks a
  * 100 TB scan schedules don't each rebuild it.
  *
  * Same semantics as [[AsofJoinExec]], including the null-key and
  * equal-(key,time) caveats documented there.
  */
case class BroadcastAsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    direction: String = "backward",
    toleranceUs: Long = -1L) extends SparkPlan with BinaryExecNode {

  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    "asof join needs matching non-empty key lists")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"asof key types differ: ${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
  require(AsofJoinPlan.timeTypeOk(leftTime.dataType) &&
      AsofJoinPlan.timeTypeOk(rightTime.dataType),
    "asof time columns must be BIGINT micros or a timestamp type")
  require(direction == "backward" || direction == "forward",
    s"asof direction must be backward|forward, got '$direction'")

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
    val bcast = right.executeBroadcast[Array[InternalRow]]()

    // The memo key must capture everything the built index depends on:
    // ReuseExchange can share one IdentityBroadcastMode exchange between
    // two as-of joins over the same build subplan but with different key
    // or time bindings, and a bare broadcast-id key would then serve the
    // first operator's index to the second.
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

      val fwd = direction == "forward"
      val tol = toleranceUs
      AsofJoinPlan.counted(lIter.map { l =>
        val entry = index.get(lKeyProj(l)) // UnsafeRow equals is by bytes
        val r =
          if (entry == null) nullRight
          else {
            val (times, rows) = entry
            // backward: rightmost index with times(i) <= lTime;
            // forward: leftmost index with times(i) >= lTime
            val lTime = l.getLong(lTimeIdx)
            var lo = 0
            var hi = times.length - 1
            var found = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (if (fwd) times(mid) >= lTime else times(mid) <= lTime) {
                found = mid
                if (fwd) hi = mid - 1 else lo = mid + 1
              } else {
                if (fwd) lo = mid + 1 else hi = mid - 1
              }
            }
            if (found < 0 || (tol >= 0 &&
                math.abs(times(found) - lTime) > tol)) nullRight
            else rows(found)
          }
        resultProj(joined(l, r))
      }, numOut)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object BroadcastAsofJoinExec {
  // Per-JVM memo of built indexes: every task of a stage shares one
  // build. Keyed by (broadcast id, right-key exprIds, time ordinal) —
  // not broadcast id alone — because ReuseExchange may share one
  // exchange across differently-bound as-of operators. Bounded LRU (8)
  // so repeated executions in a long session can't accumulate executor
  // memory — each entry is small by the broadcast threshold's own
  // definition.
  private type MemoKey = (Long, Seq[Long], Int)
  private val indexes = new java.util.LinkedHashMap[MemoKey, AnyRef](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[MemoKey, AnyRef]): Boolean =
      size() > 8
  }

  private[plans] def indexFor(
      id: MemoKey,
      build: => java.util.HashMap[InternalRow, (Array[Long], Array[InternalRow])])
      : java.util.HashMap[InternalRow, (Array[Long], Array[InternalRow])] =
    indexes.synchronized {
      indexes.get(id) match {
        case null =>
          val built = build
          indexes.put(id, built)
          built
        case hit =>
          hit.asInstanceOf[java.util.HashMap[InternalRow, (Array[Long], Array[InternalRow])]]
      }
    }
}
