package graft.functions

import graft.SparkSpec
import graft.functions.BloomMightContainBcast
import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

/** Pins dc02's 100 TB contract: the benchmark side ships as an O(bits)
  * bloom filter evaluated MAP-SIDE (below every shuffle), the confirm
  * join carries no forced broadcast, and the result is exactly dc01 —
  * false positives are an internal optimization detail, never visible
  * in the output. */
class BloomSpec extends SparkSpec {

  test("bloom prefilter never misses a true member; fpp stays in budget") {
    import spark.implicits._
    val members = (1L to 5000L).map(i => s"gram-$i").toDF("g")
    val bloom = Bloom.build(members, col("g"), expectedItems = 5000L, fpp = 0.01)
    // zero false negatives — the defining bloom guarantee
    val missed = members.filter(!Bloom.mightContain(bloom, col("g"))).count()
    assert(missed == 0, s"$missed true members rejected")
    // false-positive rate on a disjoint probe set lands near the budget
    val probes = (100001L to 110000L).map(i => s"gram-$i").toDF("g")
    val fps = probes.filter(Bloom.mightContain(bloom, col("g"))).count()
    assert(fps < 10000 * 0.05, s"fpp blew the budget: $fps/10000")
  }

  test("dc02: bloom probe evaluates below every shuffle (map-side)") {
    val plan: SparkPlan = graft.queries.Pipeline
      .queries("dc02_decontaminate_bloom")(spark, sf)
      .queryExecution.sparkPlan
    val bloomFilters = plan.collect {
      case f: FilterExec if f.expressions.exists(_.exists(
        _.isInstanceOf[BloomMightContainBcast])) => f
    }
    assert(bloomFilters.nonEmpty, s"no bloom probe in the plan:\n$plan")
    bloomFilters.foreach { f =>
      val shufflesBelow = f.collect { case e: ShuffleExchangeLike => e }
      assert(shufflesBelow.isEmpty,
        s"bloom probe sits above a shuffle — it must prune BEFORE data moves:\n$plan")
    }
  }

  test("dc02: confirm join carries no forced broadcast (benchmark can be huge)") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "-1")
    try {
      val plan = graft.queries.Pipeline
        .queries("dc02_decontaminate_bloom")(spark, sf)
        .queryExecution.sparkPlan
      assert(plan.collect { case b: BroadcastHashJoinExec => b }.isEmpty,
        s"forced broadcast in dc02 — the bloom exists so this never happens:\n$plan")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("broadcast map drains when the owning session's caches evict") {
    import org.apache.spark.sql.SparkSession
    // a sibling session owns the broadcast: evicting it must not touch
    // any other session's entries (or the shared suite session's caches)
    val sibling = spark.newSession()
    val prevActive = SparkSession.getActiveSession
    SparkSession.setActiveSession(sibling)
    try {
      val before = Bloom.bcastCountFor(sibling)
      val bloom = Bloom.build(
        spark.range(100).selectExpr("cast(id as string) as g"),
        col("g"), expectedItems = 100L, fpp = 0.01)
      Bloom.mightContain(bloom, col("g")) // registers one broadcast
      assert(Bloom.bcastCountFor(sibling) == before + 1)
      // same filter instance again: identity-keyed, no second broadcast
      Bloom.mightContain(bloom, col("g"))
      assert(Bloom.bcastCountFor(sibling) == before + 1)
      graft.SessionCaches.evictNow(sibling)
      assert(Bloom.bcastCountFor(sibling) == 0,
        "session eviction left bloom broadcasts behind")
    } finally prevActive match {
      case Some(s) => SparkSession.setActiveSession(s)
      case None => SparkSession.clearActiveSession()
    }
  }

  test("dc02 equals dc01 row-for-row (false positives removed by the confirm join)") {
    val exact = graft.queries.Pipeline.queries("dc01_decontaminate")(spark, sf)
    val bloomed = graft.queries.Pipeline.queries("dc02_decontaminate_bloom")(spark, sf)
    assert(bloomed.exceptAll(exact).isEmpty && exact.exceptAll(bloomed).isEmpty,
      "bloom-prefiltered decontamination diverged from the exact result")
  }
}
