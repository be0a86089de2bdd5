package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-pass global prefix sum must (a) equal the single-window global
  * cumsum bit-for-bit and (b) contain NO single-partition exchange — the
  * whole point is that nothing in the plan funnels the table through one
  * task. */
class PrefixSumSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("n_chars"))

  test("inclusive cumsum matches the global-window reference exactly") {
    val two = PrefixSum.globalCumsum(docs, col("n_chars"),
      Seq(col("n_chars").desc, col("doc_id")), "cum")
    val w = Window.orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ref = docs.withColumn("cum", sum(col("n_chars")).over(w))
    assert(two.exceptAll(ref).isEmpty && ref.exceptAll(two).isEmpty,
      "two-pass cumsum diverged from global-window reference")
  }

  test("exclusive cumsum matches the global-window reference exactly") {
    val two = PrefixSum.globalCumsum(docs, col("n_chars"),
      Seq(col("doc_id")), "cum", inclusive = false)
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = docs.withColumn("cum",
      coalesce(sum(col("n_chars")).over(w), lit(0L)))
    assert(two.exceptAll(ref).isEmpty && ref.exceptAll(two).isEmpty,
      "two-pass exclusive cumsum diverged from global-window reference")
  }

  test("no single-partition exchange in the prefix-sum plan (or pp05/pp06)") {
    val two = PrefixSum.globalCumsum(docs, col("n_chars"),
      Seq(col("n_chars").desc, col("doc_id")), "cum")
    val plans = Seq(
      "globalCumsum" -> two,
      "pp05" -> graft.queries.Pipeline.queries("pp05_token_budget")(spark, sf),
      "pp06" -> graft.queries.Pipeline.queries("pp06_sequence_pack")(spark, sf))
    plans.foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("SinglePartition"),
        s"$name still funnels through one partition:\n$plan")
    }
  }

  // Physical-plan nodes, descending into the AQE wrapper (a leaf node —
  // plain collect stops at it). Tree traversal, not toString matching:
  // plan rendering changes across Spark versions, node types don't.
  private def physicalNodes(
      df: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
      case _ => p +: p.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("offset lookup is a broadcast join, not a per-pid CASE chain") {
    import org.apache.spark.sql.catalyst.expressions.CaseWhen
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val two = PrefixSum.globalCumsum(docs, col("n_chars"),
      Seq(col("n_chars").desc, col("doc_id")), "cum")
    val nodes = physicalNodes(two)
    // the old fold built `CASE WHEN (_pid = 0) ... WHEN (_pid = P-1)`,
    // O(P)-deep — at cluster partition counts that is O(N·P) evaluation.
    // Nothing in this plan legitimately needs a CaseWhen, so assert none.
    val cases = nodes.flatMap(_.expressions).flatMap(_.collect { case c: CaseWhen => c })
    assert(cases.isEmpty,
      s"offset lookup regressed to a per-pid CASE chain: ${cases.take(1)}")
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"expected a broadcast (pid -> offset) join in the plan:\n${two.queryExecution.executedPlan}")
  }

  test("all-NULL-value partitions contribute offset 0 (no driver NPE)") {
    import spark.implicits._
    // every range partition is all-null: sum(value) per partition is NULL
    val allNull = (1L to 100L).toDF("id")
      .withColumn("v", lit(null).cast("long"))
    val out = PrefixSum.globalCumsum(allNull, col("v"), Seq(col("id")), "cum")
    assert(out.count() == 100)
    assert(out.filter(col("cum") =!= 0L).isEmpty, "null values must cumsum to 0")
  }

  test("caller columns named _pid/_off are preserved, not consumed") {
    import spark.implicits._
    val tricky = (1L to 50L).toDF("id")
      .withColumn("_pid", col("id") * 10)
      .withColumn("_off", col("id") * 100)
      .withColumn("v", lit(1L))
    val out = PrefixSum.globalCumsum(tricky, col("v"), Seq(col("id")), "cum")
    assert(out.columns.sorted.toSeq == Seq("_off", "_pid", "cum", "id", "v"))
    // the caller's columns come through untouched and the cumsum is right
    assert(out.filter(col("_pid") =!= col("id") * 10).isEmpty)
    assert(out.filter(col("_off") =!= col("id") * 100).isEmpty)
    assert(out.filter(col("cum") =!= col("id")).isEmpty)
  }

  test("work spreads across partitions (more than one range partition fills)") {
    val two = PrefixSum.globalCumsum(docs, col("n_chars"),
      Seq(col("n_chars").desc, col("doc_id")), "cum")
    // reconstruct the pid spread from the output: with 4 shuffle
    // partitions and 500 docs, the range partitioner must have used >1
    val w = Window.orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val nParts = docs.repartitionByRange(
      spark.sessionState.conf.numShufflePartitions,
      col("n_chars").desc, col("doc_id"))
      .select(spark_partition_id().as("pid")).distinct().count()
    assert(nParts > 1, s"range partitioning collapsed to $nParts partition(s)")
    assert(two.count() == docs.count())
  }
}
