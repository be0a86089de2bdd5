package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev helper: print the executed plan of one registered query
  * (`ExplainQ <sfDir> <query> [grep]`) — the .explain feedback loop the
  * build rules ask for, runnable via tools/run.sh without sbt. */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    println(df.queryExecution.executedPlan.toString)
  }
}
