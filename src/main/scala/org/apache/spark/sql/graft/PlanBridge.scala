package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import graft.plans.{AsofJoinPlan, AsofJoinStrategy}

/** The one `private[sql]`-visibility seam the graft planner extension
  * needs: constructing a DataFrame from a custom logical node
  * (`Dataset.ofRows`) and appending the planner strategy to a LIVE
  * session (`experimental.extraStrategies`). Everything else in
  * graft.plans uses public Catalyst extension points; this object
  * exists only because `ofRows` is package-private, the standard
  * arrangement for Spark extension libraries.
  */
object PlanBridge {

  // ---- automatic hot-BUILD-key routing ------------------------------
  // `spark.graft.skewJoin.buildKeys=auto` makes the STOCK asofJoin /
  // bandJoin calls heal the b >> p skew quadrant — the one the AQE
  // probe-slice rule cannot (every slice re-sorts the whole hot build
  // partition): run AsofSkew.detectHotKeyTuples on the BUILD side (the
  // bounded two-job sample pre-pass) and, when tuples are found, route
  // through the logical bucket+carry tier (asofJoinBuildSkewedKeys /
  // bandJoinBuildSkewedKeys — row-identical by construction, pinned by
  // AsofSkewSpec). Costs two bounded jobs at PLAN-BUILD time per stock
  // call, which is why it is opt-in. Suppressed (a) re-entrantly, so
  // the routed composition's own internal joins don't re-detect, and
  // (b) for internal "__graft_"-prefixed keys (salt/bucket columns the
  // salted and keyless tiers append) — those calls are already inside
  // a skew-treated composition.
  private val suppressAutoRoute: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  /** Run `f` with automatic build-skew routing suppressed — for
    * compositions that call [[asofJoin]]/[[bandJoin]] as internal
    * building blocks of an already-skew-treated plan. */
  def noAutoRoute[T](f: => T): T = {
    val prev = suppressAutoRoute.get()
    suppressAutoRoute.set(true)
    try f finally suppressAutoRoute.set(prev)
  }

  private def autoRouteHotBuild(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)]): Option[Seq[Seq[Any]]] = {
    val conf = left.sparkSession.conf
    val auto = conf.getOption(OptimizeSkewedGraftJoin.BuildKeysConfKey)
      .contains("auto")
    // streaming PROBE is covered too (round-16): detection samples only
    // the static BUILD side (two bounded jobs at stream-definition
    // time, the norm for streaming setup), and every piece of the
    // routed composition is streaming-probe-legal — filters on the
    // stream, per-hot-key branches through the keyless bucket tier
    // (which switches its in-bucket joins to the stateless broadcast
    // as-of for a streaming probe), and a union of streaming
    // DataFrames. AsofSkewSpec pins microbatch-vs-batch row parity.
    // A streaming BUILD side never reaches here — asofJoin/bandJoin
    // refuse it before routing.
    if (!auto || suppressAutoRoute.get() || keys.isEmpty ||
        keys.exists(_._1.startsWith("__graft_")))
      None
    else {
      val frac = conf
        .getOption(OptimizeSkewedGraftJoin.BuildKeysSampleFractionKey)
        .map(_.toDouble).getOrElse(0.01)
      val minShare = conf
        .getOption(OptimizeSkewedGraftJoin.BuildKeysMinShareKey)
        .map(_.toDouble).getOrElse(0.05)
      Some(graft.plans.AsofSkew.detectHotKeyTuples(right, keys.map(_._2),
        sampleFraction = frac, minShare = minShare)).filter(_.nonEmpty)
    }
  }

  /** Idempotently register the graft strategy on an existing session.
    * Sessions built from config should prefer
    * `spark.sql.extensions=graft.plans.GraftExtensions`. */
  def ensureStrategy(spark: SparkSession): Unit = synchronized {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(AsofJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsofJoinStrategy
  }

  /** Idempotently register the plain-SQL interval-join auto-rewrite
    * ([[graft.plans.BandJoinAutoRewrite]]) on an existing session —
    * the runtime twin of `injectOptimizerRule`. Deliberately separate
    * from [[ensureStrategy]]: the strategy only plans nodes graft
    * itself creates, while the rewrite changes plans for STOCK joins,
    * so it is opt-in per session (config-injected sessions get both). */
  def ensureBandRewrite(spark: SparkSession): Unit = synchronized {
    ensureStrategy(spark)
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(graft.plans.BandJoinAutoRewrite))
      exp.extraOptimizations =
        exp.extraOptimizations :+ graft.plans.BandJoinAutoRewrite
  }

  /** A NEW session on `base`'s context with `f`'s extensions applied —
    * how specs exercise the config-injected surface (parser, analyzer
    * rule, strategy) without rebuilding the shared test session. The
    * 6-arg constructor is the same one Builder.getOrCreate uses; it is
    * private[sql], which is this object's whole reason to exist. */
  def sessionWithExtensions(base: SparkSession,
      f: org.apache.spark.sql.SparkSessionExtensions => Unit): SparkSession = {
    val b = base.asInstanceOf[classic.SparkSession]
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    f(ext)
    // the 6-arg constructor Builder.getOrCreate uses is fully private;
    // reflection is confined to this one test seam
    val ctor = classOf[classic.SparkSession].getDeclaredConstructors
      .find(_.getParameterCount == 6)
      .getOrElse(throw new IllegalStateException(
        "classic.SparkSession 6-arg constructor not found"))
    ctor.setAccessible(true)
    ctor.newInstance(b.sparkContext, Some(b.sharedState), None, ext,
      Map.empty[String, String], Map.empty[String, String])
      .asInstanceOf[SparkSession]
  }

  /** A DataFrame over an analyzed logical plan — the ofRows seam for
    * rules that lower a plan by COMPOSING DataFrame-level machinery
    * (the keyless ASOF SQL lowering builds AsofKeyless's composition
    * around the clause's child plans). */
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Test seam: the planner strategies a config-injected session would
    * receive from `ext` (buildPlannerStrategies is package-private). */
  def plannerStrategies(ext: org.apache.spark.sql.SparkSessionExtensions,
      spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark)

  /** As-of join `left` (probe) to `right` (build): for each left row,
    * the right row with equal keys and the greatest `rightTime` at or
    * before `leftTime`, or nulls. Column names must be disjoint across
    * sides (alias before calling — also what keeps a self-join's
    * expression ids distinct). Time columns must be LongType micros or
    * either timestamp type (physically long micros; tolerance stays a
    * micro count either way — see AsofJoinPlan.timeTypeOk).
    * `hint`: "merge" forces the sorted-merge operator, "broadcast" the
    * broadcast operator (probe side untouched), "auto" (default) picks
    * by the build side's statistics vs autoBroadcastJoinThreshold.
    * `direction`: "backward" (default, greatest rightTime <= leftTime)
    * or "forward" (smallest rightTime >= leftTime), pandas
    * merge_asof-style. `toleranceUs >= 0` nulls out a directional
    * match farther than that many micros from the probe time (pandas
    * tolerance); negative disables.
    * With `spark.graft.skewJoin.buildKeys=auto`, a bounded detection
    * pre-pass samples the build side and routes detected hot build
    * keys through [[graft.plans.AsofSkew.asofJoinBuildSkewedKeys]]
    * (row-identical; two extra bounded jobs at plan-build time).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)], leftTime: String, rightTime: String,
      hint: String = "auto", direction: String = "backward",
      toleranceUs: Long = -1L): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[classic.SparkSession]
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    val shared = lPlan.output.map(_.name).toSet
      .intersect(rPlan.output.map(_.name).toSet)
    require(shared.isEmpty,
      s"asofJoin sides must have disjoint column names; shared: $shared")
    // streaming BUILD has no bounded-state formulation here: each
    // microbatch would join against only that batch's build rows and
    // silently drop every cross-batch match. Streaming PROBE is the
    // supported stream-static shape (pass hint="broadcast").
    require(!right.isStreaming,
      "asofJoin build side must be static (stream-static enrichment only)")

    autoRouteHotBuild(left, right, keys) match {
      case Some(hot) =>
        graft.plans.AsofSkew.asofJoinBuildSkewedKeys(
          left, right, keys, leftTime, rightTime, hot, hint, direction,
          toleranceUs)
      case None =>
        def resolve(plan: LogicalPlan, name: String): Attribute =
          plan.output.find(_.name == name).getOrElse(
            throw new IllegalArgumentException(
              s"column '$name' not in [${plan.output.map(_.name).mkString(", ")}]"))

        classic.Dataset.ofRows(spark, AsofJoinPlan(lPlan, rPlan,
          keys.map(k => resolve(lPlan, k._1)), keys.map(k => resolve(rPlan, k._2)),
          resolve(lPlan, leftTime), resolve(rPlan, rightTime),
          AsofJoinPlan.steerHint(lPlan.isStreaming, hint), direction,
          toleranceUs))
    }
  }

  /** Banded (interval) join `left` (probe) to `right` (build): every
    * right row with equal keys and `rightTime` within
    * [leftTime + lowUs, leftTime + highUs], left-outer (no-match
    * probes emit one null-build row). Same contracts as [[asofJoin]]
    * (disjoint column names, LongType micro times); the physical
    * operator is the [[graft.plans.BandJoinExec]] sliding-band merge —
    * O(input + output) instead of the equi-join's per-key candidate
    * product. */
  def bandJoin(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)], leftTime: String, rightTime: String,
      lowUs: Long, highUs: Long, hint: String = "auto"): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[classic.SparkSession]
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    val shared = lPlan.output.map(_.name).toSet
      .intersect(rPlan.output.map(_.name).toSet)
    require(shared.isEmpty,
      s"bandJoin sides must have disjoint column names; shared: $shared")
    require(!right.isStreaming, // see asofJoin — cross-batch matches lost
      "bandJoin build side must be static (stream-static enrichment only)")

    autoRouteHotBuild(left, right, keys) match {
      case Some(hot) =>
        graft.plans.AsofSkew.bandJoinBuildSkewedKeys(
          left, right, keys, leftTime, rightTime, lowUs, highUs, hot, hint)
      case None =>
        def resolve(plan: LogicalPlan, name: String): Attribute =
          plan.output.find(_.name == name).getOrElse(
            throw new IllegalArgumentException(
              s"column '$name' not in [${plan.output.map(_.name).mkString(", ")}]"))

        classic.Dataset.ofRows(spark, graft.plans.BandJoinPlan(lPlan, rPlan,
          keys.map(k => resolve(lPlan, k._1)), keys.map(k => resolve(rPlan, k._2)),
          resolve(lPlan, leftTime), resolve(rPlan, rightTime), lowUs, highUs,
          AsofJoinPlan.steerHint(lPlan.isStreaming, hint)))
    }
  }

  /** KEYLESS banded join — every (left, right) pair with `rightTime`
    * within [leftTime + lowUs, leftTime + highUs], no equi-key at all
    * (global time-window correlation), left-outer like [[bandJoin]].
    * Runs as [[graft.plans.BandConds.lowerBandKeyless]]'s range
    * bucketization: probes floor-bucket by `max(highUs − lowUs, 1)`
    * micros, build rows replicate to their ≤ 3 reachable buckets, and
    * the keyed band merge runs with the bucket as its key — both sides
    * shuffle-partition by time range, O(input + output), where the
    * stock plan is a nested-loop cartesian. Time columns: LongType
    * micros or either timestamp type (bucket arithmetic runs on the
    * exact physical-micros extraction); SQL null semantics (null times
    * never match; null-time probes emit the null-extended row). */
  def bandJoinKeyless(left: DataFrame, right: DataFrame,
      leftTime: String, rightTime: String,
      lowUs: Long, highUs: Long, hint: String = "auto"): DataFrame = {
    require(lowUs <= highUs, s"band [$lowUs, $highUs] is empty")
    val spark = left.sparkSession.asInstanceOf[classic.SparkSession]
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    val shared = lPlan.output.map(_.name).toSet
      .intersect(rPlan.output.map(_.name).toSet)
    require(shared.isEmpty,
      s"bandJoinKeyless sides must have disjoint column names; shared: $shared")

    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in [${plan.output.map(_.name).mkString(", ")}]"))

    val parts = graft.plans.BandConds.Parts(Nil, Nil,
      resolve(lPlan, leftTime), resolve(rPlan, rightTime), lowUs, highUs,
      Nil, Nil)
    classic.Dataset.ofRows(spark, graft.plans.BandConds.lowerBandKeyless(
      lPlan, rPlan, parts, hint, keepUnmatched = true))
  }
}
