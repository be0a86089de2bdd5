package graft.tools
import org.apache.spark.sql.SparkSession
object PqProf {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(s"$n: ${(System.nanoTime() - t0) / 1e9}s")
    }
    val q = graft.ops.Similarity.queries
    time("ss09 cold")(q("ss09_pq_topk")(s, d).collect())
    time("ss09 warm1")(q("ss09_pq_topk")(s, d).collect())
    time("ss09 warm2")(q("ss09_pq_topk")(s, d).collect())
    time("ss10 warm1")(q("ss10_pq_rerank")(s, d).collect())
    time("ss10 warm2")(q("ss10_pq_rerank")(s, d).collect())
    s.stop()
  }
}
