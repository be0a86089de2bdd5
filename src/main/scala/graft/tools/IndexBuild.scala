package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot index-build job: materialize every standard graft index for
  * a corpus dir into an IndexStore root, so that every later session —
  * on this machine or any executor fleet sharing the storage — LOADS
  * instead of rebuilding. This is the "index build is a one-time job
  * whose cost amortizes over every query" half of the build/probe split
  * (IvfIndex's scaladoc), promoted from per-JVM memoization to storage.
  *
  * Usage: tools/run.sh graft.tools.IndexBuild <corpusDir> <indexRoot>
  *        [--rebuild]
  *
  * With --rebuild, stale indexes (corpus changed since the last build)
  * are overwritten; without it they fail loudly (IndexStore's default),
  * which makes the job safe to run from cron: a concurrent corpus
  * mutation can't silently publish indexes for a corpus that no longer
  * exists.
  *
  * Prints one JSON line per index: name, action (built/loaded/rebuilt),
  * and wall seconds — "loaded" means the persisted copy was already
  * fresh and the job was a no-op for that index.
  */
object IndexBuild {
  // each entry triggers exactly the build path its queries use, so the
  // persisted artifact is byte-for-byte what a live session would make
  private def builders: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "lsh_pairs" -> ((s, d) =>
      graft.ops.Dedup.minhashPairs(s, d).count(): Unit),
    "cluster_map" -> ((s, d) =>
      graft.ops.Dedup.queries("dd08_cc_clusters")(s, d).count(): Unit),
    "span_table" -> ((s, d) =>
      graft.ops.Dedup.queries("dd12_exact_substring")(s, d).count(): Unit),
    "span_table_keep1" -> ((s, d) =>
      graft.ops.Dedup.queries("dd13b_substring_scrub_keep1")(s, d)
        .count(): Unit),
    "standing_bloom" -> ((s, d) =>
      graft.ops.Dedup.queries("dd11_incremental_dedup_bloom")(s, d)
        .count(): Unit),
    "pq_codebooks" -> ((s, d) =>
      graft.ops.Similarity.queries("ss09_pq_topk")(s, d).count(): Unit),
    "ivf" -> ((s, d) =>
      graft.ops.Similarity.queries("ss03_ivf_topk")(s, d).count(): Unit))

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: IndexBuild <corpusDir> <indexRoot> [--rebuild]")
    val (dir, root) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(graft.IndexStore.RootKey, root)
      .config(graft.IndexStore.IfStaleKey,
        if (args.contains("--rebuild")) "rebuild" else "error")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for ((name, build) <- builders) {
      val t0 = System.nanoTime()
      build(spark, dir)
      val secs = (System.nanoTime() - t0) / 1e9
      val action = graft.IndexStore.lastAction
        .getOrElse((dir, name), "untouched")
      println(f"""{"index":"$name","action":"$action","sec":$secs%.2f}""")
    }
    spark.stop()
  }
}
