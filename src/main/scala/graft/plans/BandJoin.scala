package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection,
  UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** Banded (interval) join as a native operator — [[AsofJoinExec]]
  * generalized from "the single latest build row" to "every build row
  * within [probeTime + lowUs, probeTime + highUs]", left-outer (a
  * probe with no band match emits one null-build row).
  *
  * Why: expressed relationally (ev07's shape) a band predicate rides
  * an equi-join as a residual filter, which executes as a per-key
  * candidate PRODUCT — every probe × every build row of that key,
  * filtered after the fact. Fine when keys are small; quadratic the
  * moment one key carries volume. The native merge is O(input +
  * output): both sides arrive (key, time)-sorted and co-partitioned
  * (the as-of contract), a ring buffer holds exactly the build rows
  * inside the current probe's band — rows evict from the front as the
  * band's lower edge passes them and append at the back as the upper
  * edge reaches them, each build row entering and leaving ONCE per
  * key. State is band occupancy (width × arrival rate), never the
  * key's full history. Probe partitioning and ordering survive, as
  * with the as-of operator.
  */
case class BandJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    lowUs: Long,
    highUs: Long,
    hint: String = "auto") extends BinaryNode {

  require(lowUs <= highUs, s"band bounds inverted: [$lowUs, $highUs]")
  require(AsofJoinPlan.hints(hint), s"band hint must be one of " +
    s"${AsofJoinPlan.hints.mkString("/")}, got '$hint'")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BandJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class BandJoinExec(
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

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head


  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    Map("numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val keyTypes = leftKeys.map(_.dataType)
    val lTimeIdx = lOut.indexWhere(_.exprId == leftTime.exprId)
    val rTimeIdx = rOut.indexWhere(_.exprId == rightTime.exprId)
    require(lTimeIdx >= 0 && rTimeIdx >= 0, "time attribute not in child output")
    val allOut = output
    val nRight = rOut.size
    val lo = lowUs
    val hi = highUs

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val resultProj = UnsafeProjection.create(allOut,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)

      AsofJoinPlan.counted(new Iterator[InternalRow] {
        // the band: copies of build rows with bufKey's key, times
        // within [lastProbeTime + lo, lastProbeTime + hi]; fronts
        // evict as the lower edge passes, backs append as the upper
        // edge arrives — each build row is copied at most once per key
        private val buf = new java.util.ArrayDeque[InternalRow]()
        private var bufKey: InternalRow = _
        private val bufKeyBuf = {
          val r = new UnsafeRow(rKeyExprs.size)
          r.pointTo(new Array[Byte](64), 64); r
        }
        private var head: InternalRow = _
        private var headKey: InternalRow = _
        // probe row pinned across its multi-row emission (sorter rows
        // are valid only until the next lIter.next())
        private val lBuf = {
          val r = new UnsafeRow(lOut.size)
          r.pointTo(new Array[Byte](64), 64); r
        }
        private var emitLeft: InternalRow = _
        private var emit: java.util.Iterator[InternalRow] = _
        advance()

        private def advance(): Unit =
          if (rIter.hasNext) {
            head = rIter.next()
            headKey = rKeyProj(head)
          } else { head = null; headKey = null }

        override def hasNext: Boolean =
          (emit != null && emit.hasNext) || lIter.hasNext

        override def next(): InternalRow = {
          if (emit != null && emit.hasNext)
            return resultProj(joined(emitLeft, emit.next()))
          // pull the next probe and rebuild its band
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = l.getLong(lTimeIdx)
          if (bufKey == null || keyOrd.compare(bufKey, lKey) != 0) {
            buf.clear()
            lKey match {
              case u: UnsafeRow => bufKeyBuf.copyFrom(u); bufKey = bufKeyBuf
              case other => bufKey = other.copy()
            }
          }
          // evict below the lower edge (probe times only grow per key)
          while (!buf.isEmpty &&
              buf.peekFirst().getLong(rTimeIdx) < lTime + lo)
            buf.removeFirst()
          // consume build rows: skip passed keys, append rows at or
          // under the upper edge (pre-lower-edge rows can never match
          // a later probe either — times only grow — so skip them)
          var scan = head != null
          while (scan) {
            val c = keyOrd.compare(headKey, lKey)
            if (c < 0) advance()
            else if (c == 0 && head.getLong(rTimeIdx) <= lTime + hi) {
              if (head.getLong(rTimeIdx) >= lTime + lo) buf.addLast(head match {
                case u: UnsafeRow => u.copy()
                case other => other.copy()
              })
              advance()
            } else scan = false
            scan = scan && head != null
          }
          l match {
            case u: UnsafeRow => lBuf.copyFrom(u); emitLeft = lBuf
            case other => emitLeft = other.copy()
          }
          if (buf.isEmpty) {
            emit = null
            resultProj(joined(emitLeft, nullRight))
          } else {
            emit = buf.iterator()
            resultProj(joined(emitLeft, emit.next()))
          }
        }
      }, numOut)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BandJoinExec =
    copy(left = newLeft, right = newRight)
}
