package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, SortMergeJoinExec}

/** Pins the 100 TB contract for the text-analysis vocabulary joins:
  * tx09/tx11/tx12 join a corpus-sized table against aggregates whose
  * cardinality is the corpus VOCABULARY (distinct words / bigram heads) —
  * 10⁸-10⁹ rows on a real web corpus. Those joins must never carry a
  * forced broadcast hint: with auto-broadcast disabled they have to plan
  * as shuffle joins, so the only way a broadcast happens in production is
  * AQE proving the runtime size is actually small. The one-row corpus
  * count in tx09 is the sole explicit broadcast allowed (bounded by
  * construction). */
class TextPlanSpec extends SparkSpec {

  /** Plan the query with auto-broadcast off; a BroadcastHashJoin can then
    * only appear via an explicit hint. `sparkPlan` is the pre-AQE physical
    * plan — exactly where a forced hint would surface. */
  private def planWithoutAutoBroadcast(name: String): SparkPlan = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "-1")
    try TextAnalysis.queries(name)(spark, sf).queryExecution.sparkPlan
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def broadcastHashJoins(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case b: BroadcastHashJoinExec => b }

  test("tx11: unigram-totals join is not hint-broadcast (vocab cardinality)") {
    val plan = planWithoutAutoBroadcast("tx11_bigram_lm")
    assert(broadcastHashJoins(plan).isEmpty,
      s"forced broadcast on a vocabulary-cardinality side:\n$plan")
    // with auto-broadcast off, the only legal plan for the w1 join is a
    // shuffle join — proves no hint survives anywhere in the tree
    assert(plan.collect { case j: SortMergeJoinExec => j }.nonEmpty,
      s"expected the w1 join to plan as sort-merge:\n$plan")
  }

  test("tx12: LM and unigram joins are not hint-broadcast (vocab cardinality)") {
    val plan = planWithoutAutoBroadcast("tx12_lm_score")
    assert(broadcastHashJoins(plan).isEmpty,
      s"forced broadcast on a vocabulary-cardinality side:\n$plan")
    // both the w1 join and the (w1,w2) score join must shuffle
    assert(plan.collect { case j: SortMergeJoinExec => j }.size == 2,
      s"expected both LM joins to plan as sort-merge:\n$plan")
  }

  test("tx09: df join is not hint-broadcast; only the one-row corpus count is") {
    val plan = planWithoutAutoBroadcast("tx09_tfidf")
    assert(broadcastHashJoins(plan).isEmpty,
      s"forced broadcast on the vocabulary-cardinality df side:\n$plan")
    // the df join must shuffle; the single-row n_docs cross join keeps
    // its explicit broadcast (bounded by construction) and shows up as
    // the lone nested-loop join — never as a hash join on the vocab side
    assert(plan.collect { case j: SortMergeJoinExec => j }.nonEmpty,
      s"expected the df join to plan as sort-merge:\n$plan")
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.size == 1,
      s"n_docs broadcast should feed the cross join:\n$plan")
  }

  test("tx15: line-frequency join is not hint-broadcast; lines chunked once") {
    val plan = planWithoutAutoBroadcast("tx15_line_dedup")
    assert(broadcastHashJoins(plan).isEmpty,
      s"forced broadcast on the line-vocabulary side:\n$plan")
    // all three consumers (freq agg, filter join, totals) must read the
    // persisted line table — documents are chunked exactly once
    val scans = plan.collect {
      case s if s.nodeName.contains("InMemoryTableScan") => s
    }
    assert(scans.size >= 3, s"expected 3 cached line-table scans, " +
      s"found ${scans.size}:\n$plan")
  }

  test("tx12: bigram pairs are persisted once for both consumers") {
    val df: DataFrame = TextAnalysis.queries("tx12_lm_score")(spark, sf)
    val scans = df.queryExecution.sparkPlan.collect {
      case s if s.nodeName.contains("InMemoryTableScan") => s
    }
    // the LM aggregation and the score join each read the cached pairs —
    // documents are scanned/tokenized exactly once
    assert(scans.size >= 2, s"expected both consumers to read the persisted " +
      s"pairs table, found ${scans.size} cached scans:\n${df.queryExecution.sparkPlan}")
  }
}
