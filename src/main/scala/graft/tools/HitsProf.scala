package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decompose gr06's construction-time cost (round 16): which phase of
  * hits() spends the ~2.3s QProf sees before the action. Dev aid. */
object HitsProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e6}%7.0fms")
      r
    }
    // warm the memos + codegen
    mat(graft.ops.Graph.queries("gr06_hits")(spark, sfDir))
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val df = t("construct (query fn)") {
        graft.ops.Graph.queries("gr06_hits")(spark, sfDir)
      }
      t("materialize (noop)") { mat(df) }
    }
    spark.stop()
  }
}
