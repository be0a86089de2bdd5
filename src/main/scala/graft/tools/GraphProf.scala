package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the graph family's constant factor (round 14):
  * decomposes one pagerank round into its stages and times storage /
  * join-strategy variants. Dev aid, not part of the bench contract. */
object GraphProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the memoized trade edges via the public query (warm build)
    mat(graft.ops.Graph.queries("gr01_pagerank")(spark, sfDir))
    timed("gr01 warm (memoized adj)") {
      mat(graft.ops.Graph.queries("gr01_pagerank")(spark, sfDir))
    }

    // raw edge table, rebuilt here so variants control their own persist
    val orders = graft.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val line = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val e0 = orders.join(line, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")).distinct()
    val edges = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst")))

    def variant(label: String, level: org.apache.spark.storage.StorageLevel,
        bcastRanks: Boolean, truncate: Boolean): Unit = {
      val parts = spark.sessionState.conf.numShufflePartitions
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val adj = edges.join(deg, "src")
        .repartition(parts, col("src")).persist(level)
      adj.count()
      val nodes = adj.select(col("src").as("node")).distinct().persist(level)
      val n = nodes.count()
      val scale = 1000000000000L
      val teleport = 15L * scale / 100
      def run(): Unit = {
        var ranks = nodes.withColumn("rank", lit(scale))
        for (_ <- 1 to 5) {
          val r = if (bcastRanks) broadcast(ranks) else ranks
          ranks = adj.join(r, adj("src") === r("node"))
            .select(col("dst"), expr("rank DIV deg").as("share"))
            .groupBy(col("dst"))
            .agg(sum(col("share")).as("contrib"))
            .select(col("dst").as("node"),
              (lit(teleport) + expr("(85 * contrib) DIV 100")).as("rank"))
          if (truncate) ranks = graft.ops.Lineage.truncate(ranks)
        }
        mat(ranks)
      }
      run() // warm codegen
      timed(label)(run())
      timed(label + " (rep2)")(run())
      adj.unpersist(blocking = true)
      nodes.unpersist(blocking = true)
    }

    // plan-construction vs execution split per family query
    for (name <- Seq("gr01_pagerank", "gr02_triangles", "gr03_bfs_hops",
        "gr04_label_prop", "gr05_ppr", "gr06_hits")) {
      mat(graft.SparkEntry.queries(name)(spark, sfDir)) // warm memos
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.executedPlan // force analysis+optimization
      val t1 = System.nanoTime()
      mat(df)
      val t2 = System.nanoTime()
      println(f"$name%-18s plan ${(t1 - t0) / 1e9}%5.2fs  exec ${(t2 - t1) / 1e9}%5.2fs")
    }

    import org.apache.spark.storage.StorageLevel._
    timed("adj scan x5 (DISK_ONLY, no join)") {
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val adj = edges.join(deg, "src").repartition(32, col("src"))
        .persist(DISK_ONLY)
      adj.count()
      (1 to 5).foreach(_ => mat(adj))
      adj.unpersist(blocking = true)
    }
    variant("pagerank DISK_ONLY stock", DISK_ONLY, bcastRanks = false, truncate = false)
    variant("pagerank MEMORY_AND_DISK", MEMORY_AND_DISK, bcastRanks = false, truncate = false)
    variant("pagerank DISK_ONLY bcast-ranks", DISK_ONLY, bcastRanks = true, truncate = false)
    variant("pagerank MEM bcast-ranks", MEMORY_AND_DISK, bcastRanks = true, truncate = false)
    variant("pagerank DISK_ONLY truncate-rounds", DISK_ONLY, bcastRanks = false, truncate = true)
    spark.stop()
  }
}
