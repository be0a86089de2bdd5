package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Connected-components stress driver: one giant low-diameter component
  * (hub-and-spoke over 90% of the nodes) plus one LONG CHAIN over the
  * remaining 10% — the chain is the adversarial case for label
  * propagation, because the min label must traverse the full path and
  * only pointer jumping keeps the round count logarithmic (a 1M-node
  * chain must converge in ~log2(1M) ≈ 20 rounds, not 1M).
  *
  * Prints one JSON line: node/edge counts, rounds, wall seconds,
  * component count (must be exactly 2). Run:
  *   tools/run.sh graft.tools.CcStress [nNodes]
  * Results are recorded in docs/ROUND6.md.
  */
object CcStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val giantN = n / 10 * 9
    val hubs = 1024L
    // giant component: every node points at one of 1024 hubs; hubs form a
    // ring — diameter ~hubs/2 pre-compression, tiny after pointer jumping
    val spokes = spark.range(0, giantN)
      .select(col("id").as("a"), (col("id") % hubs).as("b"))
    val ring = spark.range(0, hubs)
      .select(col("id").as("a"), ((col("id") + 1) % hubs).as("b"))
    // long chain over the remaining nodes: giantN .. n-1
    val chain = spark.range(giantN, n - 1)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val edges = spokes.union(ring).union(chain)

    val t0 = System.nanoTime()
    val (labels, rounds) = graft.ops.Dedup.connectedComponentsWithStats(edges)
    val comps = labels.select(col("cluster_rep")).distinct().count()
    val nodes = labels.count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(s"""{"nodes":$nodes,"chain_nodes":${n - giantN},"rounds":$rounds,""" +
      s""""wall_sec":$wall,"n_components":$comps}""")
    require(comps == 2, s"expected exactly 2 components, got $comps")
    spark.stop()
  }
}
