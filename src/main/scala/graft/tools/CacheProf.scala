package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolate the InMemoryTableScan / cache-read cost seen in the graph
  * family (round 16). Dev aid. */
object CacheProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      mat(f)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mat(f); (System.nanoTime() - t0) / 1e6
      }
      println(f"$label%-46s min=${ts.min}%7.0fms  runs=${ts.map(t => f"$t%.0f").mkString(",")}")
    }
    val n = 1200000L
    val base = spark.range(n).select(
      (col("id") % 16000).as("src"), (col("id") % 7919).as("dst"),
      (col("id") % 97 + 1).as("deg"))
    timed("range compute, no cache")(base)
    timed("range agg, no cache")(
      base.groupBy(col("dst")).agg(sum(col("src")).as("s")))
    val disk = base.repartition(32, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    disk.count()
    timed("DISK_ONLY scan")(disk)
    timed("DISK_ONLY agg")(disk.groupBy(col("dst")).agg(sum(col("src")).as("s")))
    val mem = base.repartition(32, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    mem.count()
    timed("MEMORY_ONLY scan")(mem)
    timed("MEMORY_ONLY agg")(mem.groupBy(col("dst")).agg(sum(col("src")).as("s")))
    val shuffledNoCache = base.repartition(32, col("src"))
    timed("repartition, no cache")(shuffledNoCache)
    timed("agg 32 keys")(
      base.groupBy(col("src") % 32).agg(sum(col("src")).as("s")))
    timed("agg 500k keys")(
      base.groupBy((col("src") * 31 + col("dst")).as("k")).agg(sum(col("src")).as("s")))
    timed("agg count only 7919 keys")(
      base.groupBy(col("dst")).agg(count(lit(1)).as("s")))
    timed("global agg sum")(
      base.groupBy().agg(sum(col("src")).as("s")))
    base.groupBy(col("dst")).agg(sum(col("src")).as("s")).explain()
    spark.stop()
  }
}
