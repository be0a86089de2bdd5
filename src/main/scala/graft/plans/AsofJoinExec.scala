package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** Physical as-of join: a single-pass sorted merge per co-partitioned
  * pair of partitions.
  *
  * Contract with the planner (EnsureRequirements supplies both):
  *  - each side hash-clustered on its keys (the two
  *    `ClusteredDistribution`s are co-partitioned exactly as a
  *    sort-merge join's are);
  *  - each side sorted by (keys…, time) ascending.
  *
  * The merge then never looks back: probe rows arrive in (key, time)
  * order, the build iterator advances monotonically, and the only
  * retained state is the one candidate row for the probe's current
  * key — O(1) memory per partition regardless of corpus size, no spill
  * surface beyond the sorts the planner already owns. Build rows with
  * keys the probe stream has passed are discarded unexamined (probe
  * keys only grow), so a partition is one forward scan of each side.
  *
  * Determinism: among build rows sharing (key, time) the LAST in sort
  * order wins, which is engine-ambiguous — callers must pre-reduce the
  * build side to one row per (key, time), as ev08/ev08b do with
  * `max(event_id)`. Time columns are required to be LongType (unix
  * micros — `unix_micros` upstream), matching the engine-wide event
  * time convention.
  *
  * Scale: identical exchange count to the ev08 union+window form (one
  * hash exchange + one sort per side) but the probe side's
  * partitioning/ordering survive the operator (`outputPartitioning` /
  * `outputOrdering`), so a downstream per-key aggregate or a second
  * as-of against the same keys adds ZERO exchanges.
  */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute) extends SparkPlan with BinaryExecNode {

  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    "asof join needs matching non-empty key lists")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"asof key types differ: ${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "asof time columns must be LongType (unix micros)")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
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

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // bind against the NULLABLE right schema — binding against the
      // child's raw attributes would compile away the null checks and
      // read zeros out of the all-null unmatched row
      val resultProj = UnsafeProjection.create(allOut,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // `head`/`headKey` are defensive copies (sorter iterators reuse
        // row buffers); `matched`/`matchedKey` alias those copies, so
        // each build row is copied exactly once.
        private var matched: InternalRow = _
        private var matchedKey: InternalRow = _
        private var head: InternalRow = _
        private var headKey: InternalRow = _
        advance()

        private def advance(): Unit =
          if (rIter.hasNext) {
            head = rIter.next().copy()
            headKey = rKeyProj(head).copy()
          } else { head = null; headKey = null }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l) // transient: compared before next proj call
          val lTime = l.getLong(lTimeIdx)
          if (matched != null && keyOrd.compare(matchedKey, lKey) != 0) {
            matched = null; matchedKey = null
          }
          var scan = head != null
          while (scan) {
            val c = keyOrd.compare(headKey, lKey)
            if (c < 0) advance() // passed key: can never match again
            else if (c == 0 && head.getLong(rTimeIdx) <= lTime) {
              matched = head; matchedKey = headKey; advance()
            } else scan = false
            scan = scan && head != null
          }
          resultProj(joined(l, if (matched != null) matched else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
