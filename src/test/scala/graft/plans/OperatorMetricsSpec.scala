package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.graft.PlanBridge

/** numOutputRows on the four custom operators — the observability hook
  * the Spark UI and AQE runtime stats read; each operator's metric
  * must equal its actual output row count. AQE is disabled inside the
  * test so the exec nodes are reachable by plan traversal. */
class OperatorMetricsSpec extends SparkSpec {

  private def withPlainPlans[A](f: => A): A = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private lazy val (probe, build) = {
    import spark.implicits._
    val probes = (0 until 300).map(i => (i.toLong, (i % 5).toLong, (i % 50).toLong))
    val builds = (0 until 60).map(j => (1000L + j, (j % 5).toLong, (j * 3 % 50).toLong))
    (probes.toDF("p_id", "p_key", "p_us"), builds.toDF("b_id", "b_key", "b_us"))
  }

  test("as-of merge and broadcast: numOutputRows == probe count") {
    withPlainPlans {
      for (hint <- Seq("merge", "broadcast")) {
        val df = PlanBridge.asofJoin(probe, build,
          Seq("p_key" -> "b_key"), "p_us", "b_us", hint = hint)
        val n = df.count()
        df.collect()
        val execs = df.queryExecution.executedPlan.collect {
          case e: AsofJoinExec => e.metrics("numOutputRows").value
          case e: BroadcastAsofJoinExec => e.metrics("numOutputRows").value
        }
        assert(execs.nonEmpty, s"$hint: operator not in plan")
        assert(execs.head == 300L && n == 300L,
          s"$hint: metric ${execs.head} != rows $n")
      }
    }
  }

  test("band merge and broadcast: numOutputRows == emitted rows " +
      "(multi-match probes included)") {
    withPlainPlans {
      for (hint <- Seq("merge", "broadcast")) {
        val df = PlanBridge.bandJoin(probe, build,
          Seq("p_key" -> "b_key"), "p_us", "b_us", -10L, 0L, hint = hint)
        val n = df.count()
        df.collect()
        val execs = df.queryExecution.executedPlan.collect {
          case e: BandJoinExec => e.metrics("numOutputRows").value
          case e: BroadcastBandJoinExec => e.metrics("numOutputRows").value
        }
        assert(execs.nonEmpty, s"$hint: operator not in plan")
        assert(execs.head == n, s"$hint: metric ${execs.head} != rows $n")
        assert(n >= 300L, s"band should emit at least one row per probe, got $n")
      }
    }
  }
}
