package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{CoalescedPartitionSpec, ShufflePartitionSpec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, ShufflePartitionsUtil, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ENSURE_REQUIREMENTS
import org.apache.spark.sql.internal.SQLConf
import graft.plans.{AsofJoinExec, BandJoinExec}

/** AQE skew handling for the graft merge joins — the exact mechanism of
  * Spark's own `OptimizeSkewedJoin`, applied to [[AsofJoinExec]] and
  * [[BandJoinExec]]: once both child shuffle stages have materialized,
  * read their per-reducer byte sizes from `MapOutputStatistics`, and for
  * every PROBE partition larger than the skew threshold replace the
  * plain read with mapper-range slices (`PartialReducerPartitionSpec`)
  * while the matching BUILD partition is read whole once per slice
  * (`CoalescedPartitionSpec` repeated). No second shuffle, no hot-key
  * detection job, no logical replan — the splits are just different
  * reads of the map output that already exists.
  *
  * Splitting the probe side is exact for both operators because each
  * probe row's result depends only on its own row plus the FULL build
  * partition for its key: as-of picks the latest build row at-or-before
  * the probe time, band emits every build row in the probe's window —
  * neither consults other probe rows. Splitting the BUILD side would
  * scatter one key's build rows across slices and break both scans, so
  * it is never done (the same reason Spark's rule refuses to split the
  * preserved side of an outer join). Skew ON the build side therefore
  * stays a merge bottleneck — but a build partition is only ever as big
  * as the dimension's hot key, and the probe side is where a 100 TB
  * corpus's 20%-on-one-user skew actually lands.
  *
  * Runs as a QUERY-STAGE-PREP rule (the phase Spark's own skew rule
  * runs in, re-applied on every AQE re-optimization): by the time both
  * stages are materialized the pattern below —
  * exec(Sort(stage), Sort(stage)) — is exactly what re-planning
  * produces, and `isSkewJoin = true` switches the exec's required
  * distributions off so the introduced `AQEShuffleReadExec`s (whose
  * 1:1 per-slice alignment IS the clustering, but carries no
  * `Partitioning`) pass validation, exactly as `SortMergeJoinExec`
  * does. The manual salting API ([[graft.plans.AsofSkew]]) remains for
  * non-AQE sessions and for pre-shuffle salting decisions; this rule
  * makes the STOCK call fast under skew with zero user action.
  * Kill switch: `spark.graft.skewJoin` (and Spark's own
  * `spark.sql.adaptive.skewJoin.enabled` gates it too).
  */
case class OptimizeSkewedGraftJoin() extends Rule[SparkPlan] {

  private object ShuffleStage {
    def unapply(plan: SparkPlan): Option[ShuffleQueryStageExec] = plan match {
      case s: ShuffleQueryStageExec
          if s.isMaterialized && s.mapStats.isDefined &&
            s.shuffle.shuffleOrigin == ENSURE_REQUIREMENTS => Some(s)
      case _ => None
    }
  }

  private def medianSize(sizes: Array[Long]): Long = {
    val sorted = sizes.sorted
    math.max(sorted(sizes.length / 2), 1L)
  }

  override def apply(plan: SparkPlan): SparkPlan = {
    if (!conf.getConf(SQLConf.SKEW_JOIN_ENABLED) ||
        !conf.getConfString(OptimizeSkewedGraftJoin.ConfKey, "true").toBoolean)
      return plan
    plan.transformUp {
      case j: AsofJoinExec if !j.isSkewJoin =>
        (j.left, j.right) match {
          case (s1 @ SortExec(_, _, ShuffleStage(probe), _),
              s2 @ SortExec(_, _, ShuffleStage(build), _)) =>
            split(probe, build).map { case (pRead, bRead) =>
              j.copy(left = s1.copy(child = pRead),
                right = s2.copy(child = bRead), isSkewJoin = true)
            }.getOrElse(j)
          case _ => j
        }
      case j: BandJoinExec if !j.isSkewJoin =>
        (j.left, j.right) match {
          case (s1 @ SortExec(_, _, ShuffleStage(probe), _),
              s2 @ SortExec(_, _, ShuffleStage(build), _)) =>
            split(probe, build).map { case (pRead, bRead) =>
              j.copy(left = s1.copy(child = pRead),
                right = s2.copy(child = bRead), isSkewJoin = true)
            }.getOrElse(j)
          case _ => j
        }
    }
  }

  /** Probe-side skew split: None when nothing is skewed (leave the
    * plan untouched — no AQEShuffleRead wrapper, no isSkewJoin). */
  private def split(probe: ShuffleQueryStageExec,
      build: ShuffleQueryStageExec)
      : Option[(SparkPlan, SparkPlan)] = {
    val pStats = probe.mapStats.get
    val bStats = build.mapStats.get
    val pSizes = pStats.bytesByPartitionId
    val bSizes = bStats.bytesByPartitionId
    if (pSizes.length != bSizes.length) return None
    val med = medianSize(pSizes)
    val threshold = math.max(
      conf.getConf(SQLConf.SKEW_JOIN_SKEWED_PARTITION_THRESHOLD).toDouble,
      med * conf.getConf(SQLConf.SKEW_JOIN_SKEWED_PARTITION_FACTOR))
    val targetSize = math.max(
      conf.getConf(SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES), med)
    val pSide = Seq.newBuilder[ShufflePartitionSpec]
    val bSide = Seq.newBuilder[ShufflePartitionSpec]
    var nSplit = 0
    var i = 0
    while (i < pSizes.length) {
      val slices: Seq[ShufflePartitionSpec] =
        if (pSizes(i) > threshold) {
          ShufflePartitionsUtil
            .createSkewPartitionSpecs(pStats.shuffleId, i, targetSize)
            .filter(_.length > 1) match {
            case Some(s) => nSplit += 1; s
            case None => Seq(CoalescedPartitionSpec(i, i + 1, pSizes(i)))
          }
        } else Seq(CoalescedPartitionSpec(i, i + 1, pSizes(i)))
      slices.foreach { sp =>
        pSide += sp
        bSide += CoalescedPartitionSpec(i, i + 1, bSizes(i))
      }
      i += 1
    }
    if (nSplit == 0) None
    else {
      logInfo(s"graft skew join: split $nSplit probe partition(s)")
      Some((AQEShuffleReadExec(probe, pSide.result()),
        AQEShuffleReadExec(build, bSide.result())))
    }
  }
}

object OptimizeSkewedGraftJoin {
  val ConfKey = "spark.graft.skewJoin"
}
