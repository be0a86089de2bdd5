package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.PlanBridge

/** Dev probe: prints whether WholeStageCodegen wraps BandJoinExec and
  * that the kill switch falls back to the iterator path. */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val probe = Seq((1L, 1L, 20L), (2L, 1L, 31L), (3L, 2L, 45L)).toDF("id", "k", "t")
    val build = Seq((1L, 10L, 100L), (1L, 25L, 101L), (2L, 50L, 200L)).toDF("bk", "bt", "bid")
    val df = PlanBridge.bandJoin(probe, build, Seq("k" -> "bk"), "t", "bt", -15L, 0L)
    df.collect().foreach(r => println("ROW " + r))
    println(df.queryExecution.executedPlan.toString.split("\n").take(10).mkString("\n"))
    spark.conf.set("spark.graft.band.codegen", "false")
    val df2 = PlanBridge.bandJoin(probe, build, Seq("k" -> "bk"), "t", "bt", -15L, 0L)
    df2.collect()
    println("OFF: " + df2.queryExecution.executedPlan.toString.split("\n").take(3).mkString(" | "))
    spark.stop()
  }
}
