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

  test("offset lookup is a broadcast join, not a per-pid CASE chain") {
    val two = PrefixSum.globalCumsum(docs, col("n_chars"),
      Seq(col("n_chars").desc, col("doc_id")), "cum")
    val plan = two.queryExecution.executedPlan.toString
    // the old fold built `CASE WHEN (_pid = 0) ... WHEN (_pid = P-1)`,
    // O(P)-deep — at cluster partition counts that is O(N·P) evaluation
    assert(!plan.contains("CASE WHEN (_pid"),
      s"offset lookup regressed to a per-pid CASE chain:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast (pid -> offset) join in the plan:\n$plan")
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
