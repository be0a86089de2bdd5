package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph analytics beyond connected components (Dedup.scala):
  * PageRank by power iteration, the canonical "state table vs static
  * edge table" workload.
  *
  * Scale design — the dd08 CC loop's shape, applied to rank mass:
  *   - the edge list (with out-degrees) is computed ONCE, pre-partitioned
  *     on `src`, and persisted DISK_ONLY: per iteration only the small
  *     (node, rank) state table shuffles into the join; the edge table —
  *     the 100 TB side — never moves again;
  *   - each iteration is exactly one join + one aggregation shuffle on
  *     `dst`, with map-side partial sums (longs, not text);
  *   - nothing is ever collected to the driver.
  *
  * Exactness design — ranks are INTEGERS: 1.0 of rank mass = 1e12, the
  * contribution of node j to each out-neighbor is `rank_j DIV deg_j`
  * (floor division), and damping is `(85 * inbound) DIV 100` plus a
  * constant teleport of 0.15e12. Every operation is integral and every
  * value positive, so the fixed 5-iteration recurrence is bit-exact in
  * any engine — the DuckDB oracle replays it with five unrolled CTEs
  * (standard SQL forbids aggregation inside a recursive CTE, and
  * unrolling is the honest equivalent). Floor-division rank leaks mean
  * total mass is not exactly conserved — that is the documented cost of
  * bit-exactness, ~deg ulps of 1e-12 per node per round, irrelevant at
  * rank scale 1e12.
  *
  * Overflow headroom: a node's inbound sum is < total mass = N * 1e12,
  * and the 85x intermediate must stay under 2^63, so N must stay below
  * ~10^5 at this Scale. At larger N, drop Scale one decade per decade of
  * N (rank resolution falls, arithmetic stays exact); the recurrence is
  * unchanged.
  *
  * Graph: the customer—supplier relationship graph from orders x
  * lineitem (who trades with whom), symmetrized. Customer keys map to
  * even node ids (2k), supplier keys to odd (2k+1), so the two key
  * spaces never collide.
  */
object Graph {

  private[graft] val Scale = 1000000000000L // rank 1.0
  private[graft] val Iters = 5
  private val Teleport = 15L * Scale / 100 // 0.15, exactly

  /** Fixed-iteration integer PageRank over a directed edge list with
    * columns (src, dst). Returns (node, rank); every node that appears
    * as a source gets a rank (on a symmetrized graph: every node). */
  def pagerank(edges: DataFrame, iters: Int = Iters): DataFrame = {
    val s = edges.sparkSession
    val parts = s.sessionState.conf.numShufflePartitions
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val adj = edges.join(deg, "src")
      .repartition(parts, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // materialize before the iteration fans out: every round scans this
    // table, and at 100 TB this line IS "write the adjacency list once"
    adj.count()
    var ranks = adj.select(col("src").as("node")).distinct()
      .withColumn("rank", lit(Scale))
    for (_ <- 1 to iters) {
      ranks = adj.join(ranks, adj("src") === ranks("node"))
        .select(col("dst"), expr("rank DIV deg").as("share"))
        .groupBy(col("dst"))
        .agg(sum(col("share")).as("contrib"))
        .select(col("dst").as("node"),
          (lit(Teleport) + expr("(85 * contrib) DIV 100")).as("rank"))
    }
    ranks
  }

  private def kind(node: Column): Column =
    when(node % 2 === 0, lit("customer")).otherwise(lit("supplier"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gr01_pagerank" -> { (s, d) =>
      val orders = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val line = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val e0 = orders.join(line, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      // customer ids are even, supplier ids odd: the two directions of
      // the symmetrized bipartite graph are disjoint row sets
      val edges = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      pagerank(edges)
        .select(col("node").as("node_id"), col("rank"))
        .withColumn("kind", kind(col("node_id")))
    }
  )

  // The recurrence unrolled: r_{i} = teleport + 0.85 * sum of inbound
  // floor-shares of r_{i-1}, all in BIGINT (DuckDB's SUM widens to
  // HUGEINT; the cast narrows it back — values fit by the headroom
  // argument above, and an overflowing cast would fail loudly).
  private def pagerankSql: String = {
    val rounds = (1 to Iters).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |    CAST($Teleport + (85 * SUM(r.rank // d.d)) // 100 AS BIGINT) AS rank
         |  FROM edges e
         |  JOIN r${i - 1} r ON e.src = r.node
         |  JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (
       |  SELECT src, dst FROM e0
       |  UNION ALL
       |  SELECT dst AS src, src AS dst FROM e0),
       |deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
       |r0 AS (SELECT src AS node, CAST($Scale AS BIGINT) AS rank FROM deg),
       |$rounds
       |SELECT node AS node_id, rank,
       |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind
       |FROM r$Iters""".stripMargin
  }

  def oracle: Map[String, String] = Map(
    "gr01_pagerank" -> pagerankSql
  )
}
