package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  /** Independent reference: the same integer recurrence computed with
    * plain Scala maps (no Spark), for cross-checking the distributed
    * plan on graphs small enough to enumerate. */
  private def refPagerank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = deg.keys.map(_ -> Graph.Scale).toMap
    for (_ <- 1 to iters) {
      val inbound = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (s, _) => rank(s) / deg(s) }.sum
      }.toMap
      rank = inbound.map { case (n, c) => n -> (15L * Graph.Scale / 100 + 85L * c / 100) }
    }
    rank
  }

  test("pagerank matches the integer recurrence exactly on a path graph") {
    import spark.implicits._
    // path 1-2-3, symmetrized: 2 is structurally central
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val got = Graph.pagerank(e.toDF("src", "dst"), iters = Graph.Iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPagerank(e, Graph.Iters))
    // endpoints are symmetric, the center dominates
    assert(got(1L) == got(3L))
    assert(got(2L) > got(1L))
  }

  test("pagerank matches the recurrence on a star and ranks the hub highest") {
    import spark.implicits._
    val e = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L)))
    val got = Graph.pagerank(e.toDF("src", "dst"), iters = Graph.Iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPagerank(e, Graph.Iters))
    assert((1L to 4L).forall(l => got(0L) > got(l)))
  }

  test("gr01 every rank is at least the teleport floor and kinds split by parity") {
    val df = Graph.queries("gr01_pagerank")(spark, sf).cache()
    assert(df.filter(col("rank") < 15L * Graph.Scale / 100).count() == 0)
    assert(df.filter(
      (col("node_id") % 2 === 0 && col("kind") =!= "customer") ||
        (col("node_id") % 2 === 1 && col("kind") =!= "supplier")).count() == 0)
  }
}
