package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose the single-row-group lineitem scan task (round 16): how much
  * of the ~850ms is parquet decode vs decimal aggregation vs expression
  * work. Dev aid. */
object ScanProf {
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
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      mat(f) // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mat(f); (System.nanoTime() - t0) / 1e6
      }
      println(f"$label%-42s min=${ts.min}%7.0fms  runs=${ts.map(t => f"$t%.0f").mkString(",")}")
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cols7 = li.select(col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate"))
    timed("scan 7 cols")(cols7)
    timed("scan 7 cols + filter")(cols7.filter(col("l_shipdate") <= "1998-09-02"))
    timed("scan 2 num cols")(li.select(col("l_quantity"), col("l_extendedprice")))
    timed("scan all cols")(li)
    timed("q01 agg decimal") {
      cols7.filter(col("l_shipdate") <= "1998-09-02")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("a"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("b"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1.0) - col("l_discount")).cast("decimal(18,2)"))).as("c"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            ((lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).cast("decimal(18,4)"))).as("d"),
          count(lit(1)).as("n"),
          sum(col("l_discount").cast("decimal(18,2)")).as("e"))
    }
    timed("q01 agg double") {
      cols7.filter(col("l_shipdate") <= "1998-09-02")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("a"),
          sum(col("l_extendedprice")).as("b"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("c"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("d"),
          count(lit(1)).as("n"),
          sum(col("l_discount")).as("e"))
    }
    timed("count only")(li.groupBy().agg(count(lit(1)).as("n")))
    timed("cast4 to decimal, no agg") {
      cols7.select(col("l_quantity").cast("decimal(18,2)"),
        col("l_extendedprice").cast("decimal(18,2)"),
        col("l_discount").cast("decimal(18,2)"),
        col("l_tax").cast("decimal(18,2)"))
    }
    timed("cast1 to decimal, no agg") {
      cols7.select(col("l_extendedprice").cast("decimal(18,2)"))
    }
    timed("sum1 decimal") {
      cols7.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("b"))
    }
    timed("sum1 double") {
      cols7.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_extendedprice")).as("b"))
    }
    timed("q01 via Num (actual)") {
      import graft.functions.Num
      cols7.filter(col("l_shipdate") <= "1998-09-02")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(Num.dsum(col("l_quantity")).as("a"),
          Num.dsum(col("l_extendedprice")).as("b"),
          Num.dsum2(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("c"),
          Num.dsum24(col("l_extendedprice"),
            (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("d"),
          count(lit(1)).as("n"),
          Num.dsum(col("l_discount")).as("e"))
    }
    spark.stop()
  }
}
