package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed global ordered prefix sum — the two-pass plan that replaces
  * an unpartitioned `Window.orderBy(...)` (whose physical form is a
  * SinglePartition exchange + one-task global sort: the classic
  * 100 TB-killer hidden inside "cumulative sum").
  *
  * Plan shape:
  *   1. range-repartition on the order key: partitions are globally
  *      ordered, each bounded at ~1/N of the data;
  *   2. per-partition ordered cumsum (window PARTITIONED by the range
  *      partition id — N parallel sorts, not one);
  *   3. per-partition totals: N rows, collected and scanned into an
  *      exclusive-prefix offset table (driver-side work is O(N), the
  *      partition count — NOT the data);
  *   4. map-only add of the broadcast offset to each local cumsum.
  *
  * Every stage is bounded: two shuffles of the (already column-pruned)
  * input and a collect of one row per partition. Determinism: the order
  * key must be a total order (callers pass a unique tiebreaker), so the
  * cumsum value per row is engine-exact regardless of where the range
  * boundaries fall.
  */
object PrefixSum {

  /** Append `out` = cumulative sum of `value` over the global total order
    * `order`. `inclusive=false` gives the exclusive prefix (sum of strictly
    * preceding rows, 0 for the first). `value` must be integral (the sum is
    * carried as long, so the result is exact).
    */
  def globalCumsum(df: DataFrame, value: Column, order: Seq[Column],
      out: String, inclusive: Boolean = true): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    // Internal working columns: pick names that cannot collide with the
    // caller's schema (a caller `_pid` would otherwise be consumed, and a
    // caller `_off` would make the join projection ambiguous).
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(n => !df.columns.contains(n)).get
    val pidCol = fresh("_pid")
    val offCol = fresh("_off")
    // Pass-1 table: ranged layout + partition id, persisted because both
    // the totals scan and the final rescan consume it (at 100 TB: write
    // the ranged table once, read it twice). DISK_ONLY — never pins
    // executor memory; callers prune to the key+value columns first.
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn(pidCol, spark_partition_id())
      .persist(StorageLevel.DISK_ONLY)
    val frame = Window.partitionBy(col(pidCol)).orderBy(order: _*)
    val w = if (inclusive) frame.rowsBetween(Window.unboundedPreceding, 0)
      else frame.rowsBetween(Window.unboundedPreceding, -1)
    // one row per partition — the only thing that ever reaches the driver.
    // coalesce: a partition whose values are ALL NULL sums to NULL, and
    // getLong on that is an NPE; its offset contribution is 0.
    val totals = ranged.groupBy(col(pidCol))
      .agg(coalesce(sum(value.cast("long")), lit(0L)).as("t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    // exclusive scan over partition totals = each partition's global offset
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _))
    // Broadcast-join the tiny (pid → offset) table rather than folding a
    // per-pid CASE chain into the projection: a when-chain is O(P)-deep —
    // invisible at local[32], but at cluster partition counts (thousands)
    // it is O(N·P) expression evaluation and an analyzer/codegen-hostile
    // multi-thousand-node expression tree. The join keeps plan size and
    // per-row cost constant in P. (Empty partitions emit no totals row
    // and hold no rows, so the inner join drops nothing.)
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF(pidCol, offCol))
    // `ranged` stays persisted for the lifetime of the returned plan: the
    // final pass re-scans it lazily, so it cannot be unpersisted here
    // without silently recomputing the range shuffle (whose sampled
    // boundaries — and thus _pid values — are not guaranteed stable
    // across recomputations). DISK_ONLY keeps the cost to scratch disk,
    // and the block manager frees the blocks when the context stops.
    ranged.join(offDf, Seq(pidCol))
      .withColumn(out, coalesce(sum(value).over(w), lit(0L)) + col(offCol))
      .drop(pidCol, offCol)
  }
}
