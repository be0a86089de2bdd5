package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual queries (after a warmup) — dev profiling aid.
  * Usage: graft.tools.TimeQuery <sfDir> <name> [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same materialization as Bench (noop sink) so profiles measure the
    // full expression evaluation, not a count()-pruned scan
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    materialize(graft.SparkEntry.entry(spark)) // warmup
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      materialize(graft.SparkEntry.queries(name)(spark, sfDir))
      println(f"$name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
