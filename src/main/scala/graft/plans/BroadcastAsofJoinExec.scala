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
    toleranceUs: Long = -1L) extends SparkPlan with BinaryExecNode
    with org.apache.spark.sql.execution.CodegenSupport {

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

    val fwd = direction == "forward"
    val tol = toleranceUs
    left.execute().mapPartitions { lIter =>
      val probe = new BroadcastAsofProbe(
        BroadcastAsofJoinExec.indexFor(memoKey,
          BroadcastAsofJoinExec.buildIndex(bcast.value,
            UnsafeProjection.create(rKeyExprs, rOut), rTimeIdx)),
        nRight, fwd, tol)
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val resultProj = UnsafeProjection.create(allOut,
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow

      AsofJoinPlan.counted(lIter.map { l =>
        resultProj(joined(l, probe.lookup(lKeyProj(l), l.getLong(lTimeIdx))))
      }, numOut)
    }
  }

  // ---- whole-stage codegen: the BroadcastHashJoin arrangement — the
  // probe side PARTICIPATES in the stage (scan → asof-probe → downstream
  // fuse with no iterator boundary); the build side arrives via
  // executeBroadcast and the memoized index. One output row per probe.
  // Kill switch shared with the merge: spark.graft.asof.codegen=false.

  override def supportCodegen: Boolean =
    left.isInstanceOf[org.apache.spark.sql.execution.CodegenSupport] &&
      org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.asof.codegen", "true").toBoolean

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.asInstanceOf[org.apache.spark.sql.execution.CodegenSupport].inputRDDs()

  override def needCopyResult: Boolean = true

  override protected def doProduce(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext)
      : String =
    left.asInstanceOf[org.apache.spark.sql.execution.CodegenSupport]
      .produce(ctx, this)

  override def doConsume(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      input: Seq[org.apache.spark.sql.catalyst.expressions.codegen.ExprCode],
      row: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : String = {
    import org.apache.spark.sql.catalyst.expressions.{BindReferences, BoundReference}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    val rTimeIdxV = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(rTimeIdxV >= 0, "build time attribute not in child output")
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    val memoKey = (bcast.id, rightKeys.map(_.exprId.id), rTimeIdxV)
    val rOut = right.output
    val rKeyExprs = rightKeys
    val nRight = rOut.size
    val fwd = direction == "forward"
    val tol = toleranceUs
    val mkProbe: () => BroadcastAsofProbe = () => new BroadcastAsofProbe(
      BroadcastAsofJoinExec.indexFor(memoKey,
        BroadcastAsofJoinExec.buildIndex(bcast.value,
          UnsafeProjection.create(rKeyExprs, rOut), rTimeIdxV)),
      nRight, fwd, tol)
    val probeCls = classOf[BroadcastAsofProbe].getName
    val factory = ctx.addReferenceObj("asofProbeFactory", mkProbe,
      "scala.Function0")
    val probe = ctx.addMutableState(probeCls, "asofProbe",
      v => s"$v = ($probeCls) $factory.apply();")

    // probe key as an UnsafeRow with the same layout the index keys use
    ctx.currentVars = input
    val keyEv = GenerateUnsafeProjection.createCode(ctx,
      leftKeys.map(k => BindReferences.bindReference(
        k: org.apache.spark.sql.catalyst.expressions.Expression, left.output)))
    val timeEv = BindReferences.bindReference(
      leftTime.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression],
      left.output).genCode(ctx)
    val rowT = "org.apache.spark.sql.catalyst.InternalRow"
    val matched = ctx.addMutableState(rowT, "asofMatchedRow")
    val numOutput = metricTerm(ctx, "numOutputRows")

    // build-side columns read from the matched (possibly all-null) row
    ctx.currentVars = null
    ctx.INPUT_ROW = matched
    val rightVars = rOut.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, nullable = true).genCode(ctx)
    }
    // null time reads as 0 — the documented natural-ordering semantics
    val timeVal = if (leftTime.nullable)
      s"(${timeEv.isNull} ? 0L : ${timeEv.value})" else timeEv.value

    s"""
       |${keyEv.code}
       |${timeEv.code}
       |$matched = $probe.lookup(${keyEv.value}, $timeVal);
       |$numOutput.add(1);
       |${consume(ctx, input ++ rightVars)}
     """.stripMargin
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

  /** The {key → (sorted times, rows)} index both broadcast operators
    * (and both their execution paths) build from the broadcast rows. */
  private[plans] def buildIndex(
      rows: Array[InternalRow], rKeyProj: UnsafeProjection, rTimeIdx: Int)
      : java.util.HashMap[InternalRow, (Array[Long], Array[InternalRow])] = {
    val grouped = new java.util.HashMap[InternalRow,
      scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
    rows.foreach { r =>
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
  }
}

/** Compiled per-stage probe behind the broadcast as-of's generated
  * code: holds the memoized {key → (sorted times, rows)} index and
  * answers one probe at a time. Public because generated Java
  * instantiates and calls it by name. */
final class BroadcastAsofProbe(
    index: java.util.HashMap[InternalRow, (Array[Long], Array[InternalRow])],
    nRightCols: Int, fwd: Boolean, tol: Long) {

  val nullRow: InternalRow = new GenericInternalRow(nRightCols)

  /** The matched build row for (key, time), or [[nullRow]]. */
  def lookup(key: InternalRow, lTime: Long): InternalRow = {
    val entry = index.get(key) // UnsafeRow equals is by bytes
    if (entry == null) return nullRow
    val (times, rows) = entry
    // backward: rightmost index with times(i) <= lTime;
    // forward: leftmost index with times(i) >= lTime
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
        math.abs(times(found) - lTime) > tol)) nullRow
    else rows(found)
  }
}

/** [[BroadcastAsofProbe]]'s band twin: `find` binary-searches the
  * band's slice and returns its length (0 ⇒ caller emits one
  * [[nullRow]]); `row(i)` reads the slice without allocating an
  * iterator per probe. */
final class BroadcastBandProbe(
    index: java.util.HashMap[InternalRow, (Array[Long], Array[InternalRow])],
    nRightCols: Int, lo: Long, hi: Long) {

  val nullRow: InternalRow = new GenericInternalRow(nRightCols)
  private var rows: Array[InternalRow] = _
  private var first = 0

  /** Locate [lTime + lo, lTime + hi] in key's sorted times; returns
    * the match count and pins the slice for [[row]]. */
  def find(key: InternalRow, lTime: Long): Int = {
    val entry = index.get(key)
    if (entry == null) return 0
    val (ts, rs) = entry
    // leftmost index with ts(i) >= lTime + lo
    var loI = 0
    var hiI = ts.length - 1
    var f = ts.length
    while (loI <= hiI) {
      val mid = (loI + hiI) >>> 1
      if (ts(mid) >= lTime + lo) { f = mid; hiI = mid - 1 }
      else loI = mid + 1
    }
    var e = f
    while (e < ts.length && ts(e) <= lTime + hi) e += 1
    rows = rs
    first = f
    e - f
  }

  def row(i: Int): InternalRow = rows(first + i)
}
