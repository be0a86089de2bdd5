package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanBridge

/** Skew tier for the as-of family. The merge path hash-partitions
  * probes by key, so one hot key (a power user, a default tenant id)
  * serializes its entire probe volume through one partition's sort +
  * merge — the same failure mode sk01 treats for equi-joins.
  *
  * The fix is EXACT salting, and as-of joins make it unusually clean:
  * a probe's match depends only on the build rows OF ITS KEY, so
  * splitting a hot key's probes across S salts while REPLICATING that
  * key's build rows to every salt changes nothing about any probe's
  * match — each salted partition still sees the key's complete build
  * history. (Contrast equi-join salting, which must reconcile
  * duplicated matches; here the per-probe semantics make replication
  * free of bookkeeping.) Build rows for a hot key are duplicated S
  * times — the build side is the small side in every skew scenario
  * that matters, and S·|hot build rows| stays trivially bounded.
  *
  * Probes salt by `pmod(hash(time), S)` — deterministic, and time
  * spreads a hot key's probes uniformly. Cold keys keep salt 0, so
  * their build rows are not duplicated and their partition layout is
  * unchanged (modulo the extra join key in the hash).
  *
  * Keys are ARBITRARY tuples: any number of key columns of any
  * equatable type (strings, ints, composites). Hot-key membership is
  * an OR-of-conjunct-equalities predicate over the ≤ 1/minShare
  * detected tuples — a few literal comparisons per row, broadcast-free
  * and codegen-friendly. Null key components never test hot (SQL
  * equality semantics), which is correct: null keys never match in
  * the join either, so their layout is irrelevant. The single-Long
  * entry points below delegate to the generic tier.
  */
object AsofSkew {

  /** Hot probe key TUPLES by sampled share: tuples holding ≥
    * `minShare` of a `sampleFraction` sample of the probe side.
    * Bounded by construction: at most 1/minShare tuples can exceed
    * the share, and only that many rows are collected. Two vocab-free
    * jobs over the sample — the sk02 detection shape, usable as a
    * pre-pass at any scale. */
  def detectHotKeyTuples(probe: DataFrame, keys: Seq[String],
      sampleFraction: Double = 0.01, minShare: Double = 0.05)
      : Seq[Seq[Any]] = {
    require(keys.nonEmpty, "at least one key column")
    val counts = probe.select(keys.map(col): _*).sample(sampleFraction, seed = 42)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("__graft_n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totalRow = counts.agg(sum(col("__graft_n"))).head
      val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
      if (total == 0L) Seq.empty
      else counts.filter(col("__graft_n") >= lit(total * minShare))
        .orderBy(col("__graft_n").desc)
        .limit((1.0 / minShare).toInt + 1)
        .collect().map(r => keys.indices.map(r.get).toSeq).toSeq
    } finally { counts.unpersist(); () }
  }

  /** Single-column convenience over [[detectHotKeyTuples]], kept for
    * the dominant one-Long-key shape. Fails loudly on a non-Long key
    * column — silently returning no hot keys would turn the skew
    * mitigation into a no-op. */
  def detectHotKeys(probe: DataFrame, key: String,
      sampleFraction: Double = 0.01, minShare: Double = 0.05): Seq[Long] =
    detectHotKeyTuples(probe, Seq(key), sampleFraction, minShare).map {
      case Seq(v: Long) => v
      case other => throw new IllegalArgumentException(
        s"detectHotKeys needs a LongType key column; '$key' yielded " +
          s"$other — use detectHotKeyTuples for generic keys")
    }

  /** OR-of-conjunct-equalities membership test: does this row's key
    * tuple equal any hot tuple? Null components compare to null (never
    * hot) under ===, matching the join's own null semantics. */
  private def isHot(cols: Seq[String], hot: Seq[Seq[Any]]): Column =
    hot.map(t => cols.zip(t).map { case (c, v) =>
      if (v == null) lit(false) else col(c) === lit(v)
    }.reduce(_ && _)).reduce(_ || _)

  private def salted(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)], leftTime: String,
      hot: Seq[Seq[Any]], salts: Int): (DataFrame, DataFrame) = {
    val l2 = left.withColumn("__graft_salt_l",
      when(isHot(keys.map(_._1), hot),
        pmod(hash(col(leftTime)), lit(salts)).cast("long"))
        .otherwise(lit(0L)))
    val r2 = right.withColumn("__graft_salt_r",
      explode(when(isHot(keys.map(_._2), hot),
        sequence(lit(0L), lit(salts - 1L)))
        .otherwise(array(lit(0L)))))
    (l2, r2)
  }

  /** As-of join with the hot key tuples salted `salts` ways. Results
    * are row-identical to the unsalted join (AsofSkewSpec pins it,
    * including string and two-column keys); only the partition layout
    * changes. */
  def asofJoinSaltedKeys(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String, rightTime: String,
      hotKeys: Seq[Seq[Any]], salts: Int = 16,
      hint: String = "merge", direction: String = "backward",
      toleranceUs: Long = -1L): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    require(keys.nonEmpty, "at least one key pair")
    if (hotKeys.isEmpty)
      return PlanBridge.asofJoin(left, right, keys, leftTime, rightTime,
        hint, direction, toleranceUs)
    val (l2, r2) = salted(left, right, keys, leftTime, hotKeys, salts)
    // noAutoRoute: this call IS a skew treatment — the buildKeys=auto
    // detection pre-pass must not fire inside it
    PlanBridge.noAutoRoute(PlanBridge.asofJoin(l2, r2,
        keys :+ ("__graft_salt_l" -> "__graft_salt_r"),
        leftTime, rightTime, hint, direction, toleranceUs))
      .drop("__graft_salt_l", "__graft_salt_r")
  }

  /** Single-Long-key convenience over [[asofJoinSaltedKeys]]. */
  def asofJoinSalted(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      hotKeys: Seq[Long], salts: Int = 16,
      hint: String = "merge", direction: String = "backward",
      toleranceUs: Long = -1L): DataFrame =
    asofJoinSaltedKeys(left, right, Seq(leftKey -> rightKey),
      leftTime, rightTime, hotKeys.map(Seq(_: Any)), salts,
      hint, direction, toleranceUs)

  /** Band join with the hot key tuples salted `salts` ways — the
    * identical replication argument as [[asofJoinSaltedKeys]]: a
    * probe's band is a function of its key's COMPLETE build rows, so
    * replicating the hot keys' build rows to every salt and routing
    * each probe to one salt preserves every probe's match set exactly,
    * with no duplicate and no reconciliation (each probe sees exactly
    * one salt's full copy). Completes the skew tier across the
    * operator family. */
  def bandJoinSaltedKeys(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String, rightTime: String,
      lowUs: Long, highUs: Long,
      hotKeys: Seq[Seq[Any]], salts: Int = 16,
      hint: String = "merge"): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    require(keys.nonEmpty, "at least one key pair")
    if (hotKeys.isEmpty)
      return PlanBridge.bandJoin(left, right, keys, leftTime, rightTime,
        lowUs, highUs, hint)
    val (l2, r2) = salted(left, right, keys, leftTime, hotKeys, salts)
    PlanBridge.noAutoRoute(PlanBridge.bandJoin(l2, r2, // see asof sibling
        keys :+ ("__graft_salt_l" -> "__graft_salt_r"),
        leftTime, rightTime, lowUs, highUs, hint))
      .drop("__graft_salt_l", "__graft_salt_r")
  }

  /** Single-Long-key convenience over [[bandJoinSaltedKeys]]. */
  def bandJoinSalted(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      lowUs: Long, highUs: Long,
      hotKeys: Seq[Long], salts: Int = 16,
      hint: String = "merge"): DataFrame =
    bandJoinSaltedKeys(left, right, Seq(leftKey -> rightKey),
      leftTime, rightTime, lowUs, highUs,
      hotKeys.map(Seq(_: Any)), salts, hint)

  // ---- BUILD-side hot keys: the opposite skew quadrant --------------
  //
  // Probe salting is useless here — it would REPLICATE the hot key's
  // millions of build rows per salt. And the AQE probe-slice only
  // helps while the probe partition is at least build-sized: every
  // slice re-fetches and re-sorts the whole hot build partition, so
  // with build >> probe the wall stays pinned at sort(build_hot). The
  // exact fix is the keyless bucket+carry composition applied PER HOT
  // KEY: within one key the join is keyless, so bucketing that key's
  // build rows by time spreads its history across ~16×partitions
  // buckets (the sort distributes), the bucket-count-sized carry table
  // restores cross-bucket lookback, and cold keys run the normal keyed
  // merge untouched. Results are row-identical (AsofSkewSpec pins it):
  // a probe's match depends only on its own key's complete build rows,
  // which each branch still sees in full. Detection: sample the BUILD
  // side with [[detectHotKeyTuples]] (same bounded two-job shape).

  /** Null-safe hot-membership: a null key component is never hot (it
    * never matches in the join either), and — unlike raw `isHot`,
    * whose three-valued NULL would make `!pred` DROP null-key rows —
    * this is safe to negate for the cold branch. */
  private def isHotNullSafe(cols: Seq[String], hot: Seq[Seq[Any]]): Column =
    coalesce(isHot(cols, hot), lit(false))

  /** Plan-growth guard for the build-skew tiers: one keyless branch is
    * built PER hot tuple, and every branch carries its own scan of both
    * inputs — plans and input scans grow LINEARLY with the routed tuple
    * count (detectHotKeyTuples can return up to 1/minShare + 1 ≈ 21 at
    * the defaults). A handful is the intended regime (true hot keys are
    * few by definition — each holds ≥ minShare of the table); past the
    * threshold, warn loudly: the caller should raise minShare so only
    * genuinely hot keys route, or persist the inputs themselves before
    * calling so the per-branch rescans hit storage once. */
  private val BranchWarnThreshold = 8
  private def warnManyBranches(op: String, n: Int): Unit =
    if (n > BranchWarnThreshold)
      System.err.println(s"[graft] $op: routing $n hot build-key " +
        s"tuples — one keyless branch (and one scan of each input) per " +
        "tuple; plans and IO grow linearly with the tuple count. Raise " +
        "minShare so only genuinely hot keys route, or persist the " +
        "inputs before calling.")

  /** As-of join with hot BUILD key tuples routed through the keyless
    * bucket+carry composition (one branch per hot tuple, cold keys
    * through the plain keyed merge). Row-identical to the plain join;
    * only the layout of the hot keys' build history changes. Plans and
    * input scans grow linearly with `hotKeys.size` — see
    * [[warnManyBranches]]; pass only genuinely hot tuples. */
  def asofJoinBuildSkewedKeys(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String, rightTime: String,
      hotKeys: Seq[Seq[Any]],
      hint: String = "merge", direction: String = "backward",
      toleranceUs: Long = -1L): DataFrame = PlanBridge.noAutoRoute {
    require(keys.nonEmpty, "at least one key pair")
    // one branch per DISTINCT tuple: a duplicated hot key (two
    // detection passes concatenated) would silently duplicate every
    // matched row for it — the salted sibling's membership test is
    // naturally duplicate-tolerant, this union is not
    val hot = hotKeys.distinct
    if (hot.isEmpty)
      PlanBridge.asofJoin(left, right, keys, leftTime, rightTime,
        hint, direction, toleranceUs)
    else {
      warnManyBranches("asofJoinBuildSkewedKeys", hot.size)
      val cold = PlanBridge.asofJoin(
        left.filter(!isHotNullSafe(keys.map(_._1), hot)),
        right.filter(!isHotNullSafe(keys.map(_._2), hot)),
        keys, leftTime, rightTime, hint, direction, toleranceUs)
      val hotBranches = hot.map { t =>
        val pEq = keys.map(_._1).zip(t)
          .map { case (c, v) => col(c) === lit(v) }.reduce(_ && _)
        val bEq = keys.map(_._2).zip(t)
          .map { case (c, v) => col(c) === lit(v) }.reduce(_ && _)
        // the caller's hint steers the hot branches too (the partitions
        // they are most likely tuning) — the keyless composition accepts
        // the same hint vocabulary
        AsofKeyless.asofJoinKeyless(left.filter(pEq), right.filter(bEq),
          leftTime, rightTime, direction, toleranceUs, hint)
      }
      hotBranches.foldLeft(cold)(_.unionByName(_))
    }
  }

  /** Single-Long-key convenience over [[asofJoinBuildSkewedKeys]]. */
  def asofJoinBuildSkewed(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      hotKeys: Seq[Long],
      hint: String = "merge", direction: String = "backward",
      toleranceUs: Long = -1L): DataFrame =
    asofJoinBuildSkewedKeys(left, right, Seq(leftKey -> rightKey),
      leftTime, rightTime, hotKeys.map(Seq(_: Any)),
      hint, direction, toleranceUs)

  /** Band join with hot BUILD key tuples routed through the keyless
    * bucketized band — same exactness argument (and same linear
    * plan-growth caveat) as [[asofJoinBuildSkewedKeys]]. */
  def bandJoinBuildSkewedKeys(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String, rightTime: String,
      lowUs: Long, highUs: Long,
      hotKeys: Seq[Seq[Any]],
      hint: String = "merge"): DataFrame = PlanBridge.noAutoRoute {
    require(keys.nonEmpty, "at least one key pair")
    val hot = hotKeys.distinct // see asofJoinBuildSkewedKeys
    if (hot.isEmpty)
      PlanBridge.bandJoin(left, right, keys, leftTime, rightTime,
        lowUs, highUs, hint)
    else {
      warnManyBranches("bandJoinBuildSkewedKeys", hot.size)
      val cold = PlanBridge.bandJoin(
        left.filter(!isHotNullSafe(keys.map(_._1), hot)),
        right.filter(!isHotNullSafe(keys.map(_._2), hot)),
        keys, leftTime, rightTime, lowUs, highUs, hint)
      val hotBranches = hot.map { t =>
        val pEq = keys.map(_._1).zip(t)
          .map { case (c, v) => col(c) === lit(v) }.reduce(_ && _)
        val bEq = keys.map(_._2).zip(t)
          .map { case (c, v) => col(c) === lit(v) }.reduce(_ && _)
        PlanBridge.bandJoinKeyless(left.filter(pEq), right.filter(bEq),
          leftTime, rightTime, lowUs, highUs, hint)
      }
      hotBranches.foldLeft(cold)(_.unionByName(_))
    }
  }

  /** Single-Long-key convenience over [[bandJoinBuildSkewedKeys]]. */
  def bandJoinBuildSkewed(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      lowUs: Long, highUs: Long,
      hotKeys: Seq[Long],
      hint: String = "merge"): DataFrame =
    bandJoinBuildSkewedKeys(left, right, Seq(leftKey -> rightKey),
      leftTime, rightTime, lowUs, highUs, hotKeys.map(Seq(_: Any)), hint)
}
