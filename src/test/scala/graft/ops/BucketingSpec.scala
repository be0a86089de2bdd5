package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** A join of two tables bucketed on the join key must plan with ZERO
  * shuffle exchanges (bucket-co-located), and return exactly the same
  * rows as the plain shuffled join. */
class BucketingSpec extends SparkSpec {

  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
    case _ => p +: p.children.flatMap(walk)
  }

  test("bucketed fact-fact join plans without any shuffle exchange") {
    val orders = graft.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val lineitem = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Bucketing.writeBucketed(spark, orders, "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(spark, lineitem, "lineitem_b", "o_orderkey", 8)

    // disable auto-broadcast so the test exercises the co-located
    // sort-merge path (at real scale neither fact side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.cojoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      val shuffles = walk(joined.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty,
        s"bucketed join still shuffles:\n${joined.queryExecution.executedPlan}")
      // same rows as the plain join of the unbucketed inputs
      val plain = orders.join(lineitem, "o_orderkey")
      assert(joined.count() == plain.count())
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty,
        "bucketed join returned different rows than the plain join")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
