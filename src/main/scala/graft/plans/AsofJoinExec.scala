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
  * time convention. NULL keys follow the natural ordering, not SQL
  * equality: they sort first and match EACH OTHER (both the generic
  * ordering path and the single-Long fast path, spec-pinned) — filter
  * null keys upstream when SQL join semantics are wanted.
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
    val fwd = direction == "forward"
    val tol = toleranceUs
    // single-Long-key fast path (the dominant shape: user_id, doc_id):
    // primitive compares, no per-row key projection or ordering object
    val fastLongKey = keyTypes == Seq(LongType)
    val lKeyIdx = if (fastLongKey) lOut.indexWhere(_.exprId == leftKeys.head.exprId) else -1
    val rKeyIdx = if (fastLongKey) rOut.indexWhere(_.exprId == rightKeys.head.exprId) else -1

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bind against the NULLABLE right schema — binding against the
      // child's raw attributes would compile away the null checks and
      // read zeros out of the all-null unmatched row
      val resultProj = UnsafeProjection.create(allOut,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow

      val base = if (fastLongKey && lKeyIdx >= 0 && rKeyIdx >= 0)
        new Iterator[InternalRow] {
          // same merge as the generic path below, with the key held as
          // (isNull, Long) primitives; null keys order first and match
          // each other, mirroring the natural ordering's null placement
          private var matched: InternalRow = _
          private var hasM = false
          private var mNull = false
          private var mKey = 0L
          private var mTime = 0L
          private val matchedBuf = {
            val r = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(rOut.size)
            r.pointTo(new Array[Byte](64), 64); r
          }
          private var head: InternalRow = _
          private var hNull = false
          private var hKey = 0L
          advance()

          private def advance(): Unit =
            if (rIter.hasNext) {
              head = rIter.next()
              hNull = head.isNullAt(rKeyIdx)
              hKey = if (hNull) 0L else head.getLong(rKeyIdx)
            } else head = null

          private def cmp(an: Boolean, a: Long, bn: Boolean, b: Long): Int =
            if (an && bn) 0 else if (an) -1 else if (bn) 1
            else java.lang.Long.compare(a, b)

          private def retain(): Unit = {
            head match {
              case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
                matchedBuf.copyFrom(u); matched = matchedBuf
              case other => matched = other.copy()
            }
            mNull = hNull; mKey = hKey; mTime = matched.getLong(rTimeIdx)
            hasM = true
          }

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lNull = l.isNullAt(lKeyIdx)
            val lKey = if (lNull) 0L else l.getLong(lKeyIdx)
            val lTime = l.getLong(lTimeIdx)
            if (fwd) {
              // forward: drop passed keys and same-key rows strictly
              // before lTime (later probes' times only grow), match =
              // the head itself — NO retention, zero copies ever
              var c = 1
              var scan = head != null
              while (scan) {
                c = cmp(hNull, hKey, lNull, lKey)
                if (c < 0 || (c == 0 && head.getLong(rTimeIdx) < lTime)) {
                  advance(); scan = head != null
                } else scan = false
              }
              val ok = head != null && c == 0 &&
                (tol < 0 || head.getLong(rTimeIdx) - lTime <= tol)
              resultProj(joined(l, if (ok) head else nullRight))
            } else {
              if (hasM && cmp(mNull, mKey, lNull, lKey) != 0) hasM = false
              var scan = head != null
              while (scan) {
                val c = cmp(hNull, hKey, lNull, lKey)
                if (c < 0) advance()
                else if (c == 0 && head.getLong(rTimeIdx) <= lTime) {
                  retain(); advance()
                } else scan = false
                scan = scan && head != null
              }
              val ok = hasM && (tol < 0 || lTime - mTime <= tol)
              resultProj(joined(l, if (ok) matched else nullRight))
            }
          }
        }
      else asofMergeGeneric(lIter, rIter, resultProj, nullRight, joined)
      AsofJoinPlan.counted(base, numOut)
    }
  }

  private def asofMergeGeneric(
      lIter: Iterator[InternalRow], rIter: Iterator[InternalRow],
      resultProj: UnsafeProjection, nullRight: GenericInternalRow,
      joined: JoinedRow): Iterator[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val keyTypes = leftKeys.map(_.dataType)
    val lTimeIdx = lOut.indexWhere(_.exprId == leftTime.exprId)
    val rTimeIdx = rOut.indexWhere(_.exprId == rightTime.exprId)
    val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
    val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
    val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)

    new Iterator[InternalRow] {
        // `head` stays UNCOPIED — a sorter row is valid until the next
        // rIter.next(), and we never advance while still holding it;
        // `headKey` lives in rKeyProj's buffer, overwritten only by the
        // next advance(). Build rows are retained ONLY when they become
        // the match, and retention goes through two REUSED UnsafeRow
        // buffers (`copyFrom` grows once, then memcpys) — the merge
        // allocates nothing per row in steady state.
        private var matched: InternalRow = _
        private var matchedKey: InternalRow = _
        private var matchedTime = 0L
        // copyFrom targets must be byte[]-backed; it regrows on demand
        private val matchedBuf = {
          val r = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(rOut.size)
          r.pointTo(new Array[Byte](64), 64); r
        }
        private val matchedKeyBuf = {
          val r = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(rKeyExprs.size)
          r.pointTo(new Array[Byte](64), 64); r
        }
        private var head: InternalRow = _
        private var headKey: InternalRow = _
        advance()

        private def retain(): Unit = {
          head match {
            case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
              matchedBuf.copyFrom(u); matched = matchedBuf
            case other => matched = other.copy()
          }
          headKey match {
            case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
              matchedKeyBuf.copyFrom(u); matchedKey = matchedKeyBuf
            case other => matchedKey = other.copy()
          }
          matchedTime = matched.getLong(rTimeIdx)
        }

        private def advance(): Unit =
          if (rIter.hasNext) {
            head = rIter.next()
            headKey = rKeyProj(head)
          } else { head = null; headKey = null }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l) // transient: compared before next proj call
          val lTime = l.getLong(lTimeIdx)
          if (direction == "forward") {
            var c = 1
            var scan = head != null
            while (scan) {
              c = keyOrd.compare(headKey, lKey)
              if (c < 0 || (c == 0 && head.getLong(rTimeIdx) < lTime)) {
                advance(); scan = head != null
              } else scan = false
            }
            val ok = head != null && c == 0 &&
              (toleranceUs < 0 || head.getLong(rTimeIdx) - lTime <= toleranceUs)
            resultProj(joined(l, if (ok) head else nullRight))
          } else {
            if (matched != null && keyOrd.compare(matchedKey, lKey) != 0) {
              matched = null; matchedKey = null
            }
            var scan = head != null
            while (scan) {
              val c = keyOrd.compare(headKey, lKey)
              if (c < 0) advance() // passed key: can never match again
              else if (c == 0 && head.getLong(rTimeIdx) <= lTime) {
                retain(); advance()
              } else scan = false
              scan = scan && head != null
            }
            val ok = matched != null &&
              (toleranceUs < 0 || lTime - matchedTime <= toleranceUs)
            resultProj(joined(l, if (ok) matched else nullRight))
          }
        }
      }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
