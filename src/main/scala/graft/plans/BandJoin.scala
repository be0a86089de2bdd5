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
  // see AsofJoinPlan: a streaming build would lose cross-batch matches
  require(!right.isStreaming,
    "band build side must be static (stream-static enrichment only)")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BandJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** The compiled per-partition state machine behind both the iterator
  * and the whole-stage-codegen paths of [[BandJoinExec]]: holds the
  * build-side iterator and the sliding band deque, and answers one
  * probe row at a time. Public (not nested) because generated Java
  * instantiates and calls it by name. */
final class BandScanner(
    rIter: Iterator[InternalRow],
    lKeyProj: UnsafeProjection,
    rKeyProj: UnsafeProjection,
    keyOrd: Ordering[InternalRow],
    lTimeIdx: Int,
    rTimeIdx: Int,
    nRightCols: Int,
    nRightKeys: Int,
    lo: Long,
    hi: Long) {

  // the band: copies of build rows with bufKey's key, times within
  // [lastProbeTime + lo, lastProbeTime + hi]; fronts evict as the
  // lower edge passes, backs append as the upper edge arrives — each
  // build row is copied at most once per key
  private val buf = new java.util.ArrayDeque[InternalRow]()
  private var bufKey: InternalRow = _
  private val bufKeyBuf = {
    val r = new UnsafeRow(nRightKeys)
    r.pointTo(new Array[Byte](64), 64); r
  }
  private var head: InternalRow = _
  private var headKey: InternalRow = _

  /** The shared all-null build row the caller emits for probes whose
    * band is empty (the operator is left-outer). */
  val nullRow: InternalRow = new GenericInternalRow(nRightCols)

  advance()

  private def advance(): Unit =
    if (rIter.hasNext) {
      head = rIter.next()
      headKey = rKeyProj(head)
    } else { head = null; headKey = null }

  /** Rebuild the band for probe `l` and return an iterator over the
    * matching build rows (empty ⇒ the caller emits [[nullRow]]). The
    * returned iterator is valid until the next `feed`. */
  def feed(l: InternalRow): java.util.Iterator[InternalRow] = {
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
    // consume build rows: skip passed keys, append rows at or under
    // the upper edge (pre-lower-edge rows can never match a later
    // probe either — times only grow — so skip them)
    var scan = head != null
    while (scan) {
      val c = keyOrd.compare(headKey, bufKey)
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
    buf.iterator()
  }
}

case class BandJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    lowUs: Long,
    highUs: Long,
    isSkewJoin: Boolean = false) extends SparkPlan with BinaryExecNode
    with org.apache.spark.sql.execution.CodegenSupport {

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

  // isSkewJoin: see AsofJoinExec — the AQE skew rule's per-partition
  // reads are 1:1 aligned but carry no Partitioning, so requirements
  // switch off exactly as SortMergeJoinExec's do
  override def requiredChildDistribution: Seq[Distribution] =
    if (isSkewJoin)
      org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution ::
        org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution :: Nil
    else
      ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override def stringArgs: Iterator[Any] =
    super.stringArgs.toSeq.dropRight(1).iterator ++
      (if (isSkewJoin) Iterator("isSkewJoin=true") else Iterator.empty)


  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    Map("numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  private def lTimeIdx = {
    val i = left.output.indexWhere(_.exprId == leftTime.exprId)
    require(i >= 0, "probe time attribute not in child output"); i
  }
  private def rTimeIdx = {
    val i = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(i >= 0, "build time attribute not in child output"); i
  }

  /** Per-partition scanner factory — serialized into the task (and,
    * on the codegen path, into the generated class's references); the
    * projections/ordering are created fresh per partition inside it. */
  private def scannerFactory: Iterator[InternalRow] => BandScanner = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val keyTypes = leftKeys.map(_.dataType)
    val (lIdx, rIdx) = (lTimeIdx, rTimeIdx)
    val nRight = rOut.size
    val (lo, hi) = (lowUs, highUs)
    rIter => new BandScanner(rIter,
      UnsafeProjection.create(lKeyExprs, lOut),
      UnsafeProjection.create(rKeyExprs, rOut),
      RowOrdering.createNaturalAscendingOrdering(keyTypes),
      lIdx, rIdx, nRight, rKeyExprs.size, lo, hi)
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    val lSize = lOut.size
    val rIdx = rTimeIdx
    val mkScanner = scannerFactory

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val resultProj = UnsafeProjection.create(allOut,
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val scanner = mkScanner(rIter)

      AsofJoinPlan.counted(new Iterator[InternalRow] {
        // probe row pinned across its multi-row emission (sorter rows
        // are valid only until the next lIter.next())
        private val lBuf = {
          val r = new UnsafeRow(lSize)
          r.pointTo(new Array[Byte](64), 64); r
        }
        private var emitLeft: InternalRow = _
        private var emit: java.util.Iterator[InternalRow] = _

        override def hasNext: Boolean =
          (emit != null && emit.hasNext) || lIter.hasNext

        override def next(): InternalRow = {
          if (emit != null && emit.hasNext)
            return resultProj(joined(emitLeft, emit.next()))
          // pull the next probe and rebuild its band
          val l = lIter.next()
          val matches = scanner.feed(l)
          l match {
            case u: UnsafeRow => lBuf.copyFrom(u); emitLeft = lBuf
            case other => emitLeft = other.copy()
          }
          if (!matches.hasNext) {
            emit = null
            resultProj(joined(emitLeft, scanner.nullRow))
          } else {
            emit = matches
            resultProj(joined(emitLeft, emit.next()))
          }
        }
      }, numOut)
    }
  }

  // ---- whole-stage codegen: the probe loop runs inside the stage ----
  // (build side stays an iterator behind the compiled BandScanner —
  // the SortMergeJoin arrangement). One output row per generated-loop
  // iteration so shouldStop() can return with all state in fields.
  // Kill switch: spark.graft.band.codegen=false falls back to the
  // iterator doExecute above; both paths share BandScanner.

  override def supportCodegen: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.band.codegen", "true").toBoolean

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  override def needCopyResult: Boolean = true

  override protected def doProduce(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext)
      : String = {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "bandLeftInput", v => s"$v = inputs[0];")
    val scannerCls = classOf[BandScanner].getName
    val factory = ctx.addReferenceObj("bandScannerFactory", scannerFactory,
      "scala.Function1")
    val scanner = ctx.addMutableState(scannerCls, "bandScanner",
      v => s"$v = ($scannerCls) $factory.apply(inputs[1]);")
    val matchIter = ctx.addMutableState("java.util.Iterator", "bandMatches")
    val row = "org.apache.spark.sql.catalyst.InternalRow"
    val leftRow = ctx.addMutableState(row, "bandLeftRow")
    val rightRow = ctx.addMutableState(row, "bandRightRow")
    val numOutput = metricTerm(ctx, "numOutputRows")

    ctx.currentVars = null
    ctx.INPUT_ROW = leftRow
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    ctx.INPUT_ROW = rightRow
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, nullable = true).genCode(ctx)
    }

    s"""
       |while (true) {
       |  if ($matchIter != null && $matchIter.hasNext()) {
       |    $rightRow = ($row) $matchIter.next();
       |  } else if ($leftInput.hasNext()) {
       |    $leftRow = ($row) $leftInput.next();
       |    $matchIter = $scanner.feed($leftRow);
       |    if ($matchIter.hasNext()) {
       |      $rightRow = ($row) $matchIter.next();
       |    } else {
       |      $matchIter = null;
       |      $rightRow = $scanner.nullRow();
       |    }
       |  } else {
       |    break;
       |  }
       |  $numOutput.add(1);
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BandJoinExec =
    copy(left = newLeft, right = newRight)
}
