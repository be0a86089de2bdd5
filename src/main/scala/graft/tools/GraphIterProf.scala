package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose one pagerank iteration's map stage (round 16): cached
  * adjacency scan vs broadcast join vs DIV vs partial agg. Dev aid. */
object GraphIterProf {
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
      mat(f)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mat(f); (System.nanoTime() - t0) / 1e6
      }
      println(f"$label%-46s min=${ts.min}%7.0fms  runs=${ts.map(t => f"$t%.0f").mkString(",")}")
    }
    val parts = spark.sessionState.conf.numShufflePartitions
    val disk = org.apache.spark.storage.StorageLevel.DISK_ONLY

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val line = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    val e0 = orders.join(line, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")).distinct()
    val edges = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val adj = edges.join(deg, "src").repartition(parts, col("src")).persist(disk)
    println("adj rows: " + adj.count())
    val nodes = adj.select(col("src").as("node")).distinct().persist(disk)
    println("nodes: " + nodes.count())
    val scale = 1000000000000L
    val ranks0 = nodes.withColumn("rank", lit(scale))

    timed("scan cached adj")(adj)
    timed("scan cached adj + count")(adj.groupBy().agg(count(lit(1))))
    timed("join bcast ranks")(
      adj.join(broadcast(ranks0), adj("src") === ranks0("node")))
    timed("join + DIV project")(
      adj.join(broadcast(ranks0), adj("src") === ranks0("node"))
        .select(col("dst"), expr("rank DIV deg").as("share")))
    timed("join + / project (plain div)")(
      adj.join(broadcast(ranks0), adj("src") === ranks0("node"))
        .select(col("dst"), (col("rank") / col("deg")).cast("long").as("share")))
    timed("full iter (join+DIV+agg)")(
      adj.join(broadcast(ranks0), adj("src") === ranks0("node"))
        .select(col("dst"), expr("rank DIV deg").as("share"))
        .groupBy(col("dst")).agg(sum(col("share")).as("contrib")))
    timed("full iter non-bcast (AQE decides)")(
      adj.join(ranks0, adj("src") === ranks0("node"))
        .select(col("dst"), expr("rank DIV deg").as("share"))
        .groupBy(col("dst")).agg(sum(col("share")).as("contrib")))
    // memory-deser cache comparison
    val adjMem = edges.join(deg, "src").repartition(parts, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    adjMem.count()
    timed("full iter over MEMORY_AND_DISK adj")(
      adjMem.join(broadcast(ranks0), adjMem("src") === ranks0("node"))
        .select(col("dst"), expr("rank DIV deg").as("share"))
        .groupBy(col("dst")).agg(sum(col("share")).as("contrib")))

    // Round 17 (verdict item 3): decompose the agg slice further.
    // (a) dst-partitioned adjacency: groupBy(dst) needs NO exchange and
    // the whole iteration is ONE stage — isolates the exchange+stage-
    // barrier share of the agg slice from the hash-agg kernel itself.
    // (NOT shippable: at 100 TB ranks may not broadcast, and then the
    // src-equi join over a dst-partitioned adjacency shuffles the EDGE
    // table per iteration — the refused formulation.)
    val adjDst = edges.join(deg, "src").repartition(parts, col("dst"))
      .persist(disk)
    adjDst.count()
    timed("full iter, dst-partitioned (no exchange)")(
      adjDst.join(broadcast(ranks0), adjDst("src") === ranks0("node"))
        .select(col("dst"), expr("rank DIV deg").as("share"))
        .groupBy(col("dst")).agg(sum(col("share")).as("contrib")))
    // (b) count instead of sum: same hash probe, no add — if these tie,
    // the aggregate FUNCTION (primitive codegen'd long sum) is not the
    // cost and a custom DeclarativeAggregate cannot win anything.
    timed("full iter, count() not sum()")(
      adj.join(broadcast(ranks0), adj("src") === ranks0("node"))
        .select(col("dst"), expr("rank DIV deg").as("share"))
        .groupBy(col("dst")).agg(count(lit(1)).as("contrib")))
    // (c) the 10-iteration chain as the query runs it (AQE) vs planned
    // statically with an explicit broadcast hint (one job, no per-stage
    // AQE barriers) — quantifies the per-iteration scheduling share.
    // (The static+hint form is an EXPERIMENT: a static broadcast hint
    // is a scale-killer when ranks outgrows the driver.)
    def chain(hint: Boolean): org.apache.spark.sql.DataFrame = {
      var r = ranks0
      for (_ <- 1 to 10) {
        val rr = if (hint) broadcast(r) else r
        r = adj.join(rr, adj("src") === rr("node"))
          .select(col("dst"), expr("rank DIV deg").as("share"))
          .groupBy(col("dst")).agg(sum(col("share")).as("contrib"))
          .select(col("dst").as("node"),
            (lit(150000000000L) + expr("(85 * contrib) DIV 100")).as("rank"))
      }
      r
    }
    timed("10-iter chain (AQE, as shipped)")(chain(hint = false))
    timed("10-iter chain (AQE + bcast hint)")(chain(hint = true))
    val k = "spark.sql.adaptive.enabled"
    spark.conf.set(k, "false")
    timed("10-iter chain (static + bcast hint)")(chain(hint = true))
    spark.conf.set(k, "true")
    spark.stop()
  }
}
