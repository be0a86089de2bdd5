package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object HllProf {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(s"$n: ${(System.nanoTime()-t0)/1e9}s")
    }
    val li = graft.Tables.load(s, d, "lineitem")
      .withColumn("pk", concat_ws("_", col("l_partkey"), col("l_suppkey")))
    li.count()
    time("sketch-only")(li.groupBy(col("l_returnflag"))
      .agg(graft.functions.Hll.hllSketch(col("pk"), 8)).collect())
    time("sketch-only2")(li.groupBy(col("l_returnflag"))
      .agg(graft.functions.Hll.hllSketch(col("pk"), 8)).collect())
    time("countDistinct-only")(li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("pk"))).collect())
    time("countDistinct-only2")(li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("pk"))).collect())
    time("both")(li.groupBy(col("l_returnflag"))
      .agg(graft.functions.Hll.hllSketch(col("pk"), 8), countDistinct(col("pk"))).collect())
    s.stop()
  }
}
