package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints `explain("formatted")` for selected queries so
  * scan pushdown (PushedFilters/ReadSchema), broadcast joins, and
  * WholeStageCodegen spans can be inspected.
  *
  * Usage: graft.tools.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q02_revenue_by_nation",
        "q06_forecast_revenue", "ev01_hourly_stats", "ss01_topk_bruteforce")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
