package graft.plans

import org.apache.spark.sql.DataFrame
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
  */
object AsofSkew {

  /** Hot probe keys by sampled share: keys holding ≥ `minShare` of a
    * `sampleFraction` sample of the probe side. Bounded by
    * construction: at most 1/minShare keys can exceed the share, and
    * only that many rows are collected. Two vocab-free jobs over the
    * sample — the sk02 detection shape, usable as a pre-pass at any
    * scale. */
  def detectHotKeys(probe: DataFrame, key: String,
      sampleFraction: Double = 0.01, minShare: Double = 0.05): Seq[Long] = {
    val counts = probe.select(col(key)).sample(sampleFraction, seed = 42)
      .groupBy(col(key)).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totalRow = counts.agg(sum(col("n"))).head
      val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
      if (total == 0L) Seq.empty
      else counts.filter(col("n") >= lit(total * minShare))
        .orderBy(col("n").desc)
        .limit((1.0 / minShare).toInt + 1)
        .collect().map(_.getLong(0)).toSeq
    } finally { counts.unpersist(); () }
  }

  /** As-of join with the hot keys salted `salts` ways. Results are
    * row-identical to the unsalted join (AsofSkewSpec pins it); only
    * the partition layout changes. Single Long key columns only (the
    * dominant shape; generic keys compose the same way by hand). */
  def asofJoinSalted(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      hotKeys: Seq[Long], salts: Int = 16,
      hint: String = "merge", direction: String = "backward",
      toleranceUs: Long = -1L): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    if (hotKeys.isEmpty)
      return PlanBridge.asofJoin(left, right,
        Seq(leftKey -> rightKey), leftTime, rightTime,
        hint, direction, toleranceUs)
    val hot = hotKeys.map(x => x: Any)
    val l2 = left.withColumn("__graft_salt_l",
      when(col(leftKey).isin(hot: _*),
        pmod(hash(col(leftTime)), lit(salts)).cast("long"))
        .otherwise(lit(0L)))
    val r2 = right.withColumn("__graft_salt_r",
      explode(when(col(rightKey).isin(hot: _*),
        sequence(lit(0L), lit(salts - 1L)))
        .otherwise(array(lit(0L)))))
    PlanBridge.asofJoin(l2, r2,
        Seq(leftKey -> rightKey, "__graft_salt_l" -> "__graft_salt_r"),
        leftTime, rightTime, hint, direction, toleranceUs)
      .drop("__graft_salt_l", "__graft_salt_r")
  }

  /** Band join with the hot keys salted `salts` ways — the identical
    * replication argument as [[asofJoinSalted]]: a probe's band is a
    * function of its key's COMPLETE build rows, so replicating the hot
    * keys' build rows to every salt and routing each probe to one salt
    * preserves every probe's match set exactly, with no duplicate and
    * no reconciliation (each probe sees exactly one salt's full copy).
    * Completes the skew tier across the operator family. */
  def bandJoinSalted(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      lowUs: Long, highUs: Long,
      hotKeys: Seq[Long], salts: Int = 16,
      hint: String = "merge"): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    if (hotKeys.isEmpty)
      return PlanBridge.bandJoin(left, right,
        Seq(leftKey -> rightKey), leftTime, rightTime, lowUs, highUs, hint)
    val hot = hotKeys.map(x => x: Any)
    val l2 = left.withColumn("__graft_salt_l",
      when(col(leftKey).isin(hot: _*),
        pmod(hash(col(leftTime)), lit(salts)).cast("long"))
        .otherwise(lit(0L)))
    val r2 = right.withColumn("__graft_salt_r",
      explode(when(col(rightKey).isin(hot: _*),
        sequence(lit(0L), lit(salts - 1L)))
        .otherwise(array(lit(0L)))))
    PlanBridge.bandJoin(l2, r2,
        Seq(leftKey -> rightKey, "__graft_salt_l" -> "__graft_salt_r"),
        leftTime, rightTime, lowUs, highUs, hint)
      .drop("__graft_salt_l", "__graft_salt_r")
  }
}
