package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** A join of two tables bucketed on the join key must plan with ZERO
  * shuffle exchanges below the join (bucket-co-located), and return
  * exactly the same rows as the plain shuffled join. Driven through the
  * registered bk01 query so the pinned plan is the one the driver
  * gates. */
class BucketingSpec extends SparkSpec {

  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
    case _ => p +: p.children.flatMap(walk)
  }

  test("bk01: bucketed fact-fact join has no shuffle below the join, exact rows") {
    // disable auto-broadcast so the test exercises the co-located
    // sort-merge path (at real scale neither fact side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Bucketing.queries("bk01_bucketed_cojoin")(spark, sf)
      val smj = walk(df.queryExecution.executedPlan)
        .collectFirst { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty,
        s"expected a sort-merge cojoin:\n${df.queryExecution.executedPlan}")
      // the bucketed layout means the join's entire subtree is
      // exchange-free — the only shuffle in the query is the final
      // aggregate ABOVE the join
      val below = walk(smj.get).collect { case s: ShuffleExchangeExec => s }
      assert(below.isEmpty,
        s"bucketed join still shuffles below the join:\n${smj.get}")

      // exact rows vs the plain (unbucketed) join aggregate
      val orders = graft.Tables.load(spark, sf, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val lineitem = graft.Tables.load(spark, sf, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
      val plain = orders.join(lineitem, "o_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          graft.functions.Num.dsum(col("l_quantity")).as("sum_qty"))
      assert(df.exceptAll(plain).isEmpty && plain.exceptAll(df).isEmpty,
        "bucketed cojoin aggregate differs from the plain join")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
