package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location: the write-side answer to "this fact-fact
  * join shuffles both sides every run".
  *
  * Writing both tables bucketed (and sorted) by the join key hash-splits
  * each into N files per key-range ONCE, at write time; every subsequent
  * equi-join on that key plans as a bucket-local sort-merge with ZERO
  * shuffle exchanges — the join cost becomes a co-partitioned scan. At
  * 100 TB this is the difference between re-shuffling 30 TB of lineitem
  * on every query and never shuffling it again; BucketingSpec pins the
  * exchange-free plan. (Spark's managed-table bucketing is
  * hash(key) mod N on both sides, so bucket i of table A joins only
  * bucket i of table B.)
  */
object Bucketing {

  /** Write `df` as a managed bucketed table (bucketed + sorted by `key`). */
  def writeBucketed(spark: SparkSession, df: DataFrame, table: String,
      key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plans with no
    * shuffle on either side. */
  def cojoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
