package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanBridge

/** The salted as-of rewrite's contract: row-identical results to the
  * unsalted join under every variant (direction × tolerance ×
  * null-key probes × keys with no build rows), and bounded hot-key
  * detection. */
class AsofSkewSpec extends SparkSpec {

  // adversarial little corpus: one hot key (70% of probes), a cold
  // key, a probe-only key, ties on (key, time), and pre-history probes
  private lazy val (probe, build) = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val probes = (0 until 200).map { i =>
      val key = if (i % 10 < 7) 1L else if (i % 10 < 9) 2L else 3L
      (i.toLong, key, rnd.nextInt(100).toLong)
    }
    val builds = (0 until 40).map { j =>
      val key = if (j % 4 < 3) 1L else 2L
      (1000L + j, key, (j * 7 % 100).toLong)
    }
    (probes.toDF("event_id", "user_id", "us"),
      builds.toDF("b_id", "b_key", "b_us"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("event_id", "b_id", "b_us").collect()
    .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    .sortBy(_._1).toSeq

  test("salted == unsalted, backward/forward × tolerance, hot build " +
      "rows replicated without duplicate or lost matches") {
    for (dir <- Seq("backward", "forward"); tol <- Seq(-1L, 10L)) {
      val plain = rows(PlanBridge.asofJoin(probe, build,
        Seq("user_id" -> "b_key"), "us", "b_us", "merge", dir, tol))
      val salted = rows(AsofSkew.asofJoinSalted(probe, build,
        "user_id", "b_key", "us", "b_us",
        hotKeys = Seq(1L), salts = 8, direction = dir, toleranceUs = tol))
      assert(salted == plain, s"dir=$dir tol=$tol diverged")
      assert(plain.size == 200)
    }
  }

  test("multiple hot keys and the broadcast hint also match") {
    val plain = rows(PlanBridge.asofJoin(probe, build,
      Seq("user_id" -> "b_key"), "us", "b_us"))
    val salted = rows(AsofSkew.asofJoinSalted(probe, build,
      "user_id", "b_key", "us", "b_us",
      hotKeys = Seq(1L, 2L), salts = 4, hint = "broadcast"))
    assert(salted == plain)
  }

  test("empty hot-key list degrades to the plain join") {
    val plain = rows(PlanBridge.asofJoin(probe, build,
      Seq("user_id" -> "b_key"), "us", "b_us"))
    val salted = rows(AsofSkew.asofJoinSalted(probe, build,
      "user_id", "b_key", "us", "b_us", hotKeys = Seq.empty, salts = 8))
    assert(salted == plain)
  }

  private def bandRows(df: org.apache.spark.sql.DataFrame) = df
    .select("event_id", "b_id", "b_us").collect()
    .map(r => (r.getLong(0),
      if (r.isNullAt(1)) -1L else r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2)))
    .sorted.toSeq

  test("band salted == unsalted across band shapes, merge and broadcast " +
      "(multi-row probes: no duplicate, no lost match)") {
    for ((lo, hi) <- Seq((-10L, 0L), (-25L, 25L), (0L, 15L));
         hint <- Seq("merge", "broadcast")) {
      val plain = bandRows(PlanBridge.bandJoin(probe, build,
        Seq("user_id" -> "b_key"), "us", "b_us", lo, hi, hint = "merge"))
      val salted = bandRows(AsofSkew.bandJoinSalted(probe, build,
        "user_id", "b_key", "us", "b_us", lo, hi,
        hotKeys = Seq(1L), salts = 8, hint = hint))
      assert(salted == plain, s"band [$lo,$hi] hint=$hint diverged")
    }
  }

  test("band salted: empty hot-key list degrades to the plain join") {
    val plain = bandRows(PlanBridge.bandJoin(probe, build,
      Seq("user_id" -> "b_key"), "us", "b_us", -10L, 0L))
    val salted = bandRows(AsofSkew.bandJoinSalted(probe, build,
      "user_id", "b_key", "us", "b_us", -10L, 0L,
      hotKeys = Seq.empty, salts = 8))
    assert(salted == plain)
  }

  test("detectHotKeys finds the dominant key and nothing else") {
    val hot = AsofSkew.detectHotKeys(probe, "user_id",
      sampleFraction = 1.0, minShare = 0.25)
    assert(hot == Seq(1L), s"got $hot")
    // empty probe side detects nothing
    assert(AsofSkew.detectHotKeys(probe.limit(0), "user_id",
      sampleFraction = 1.0).isEmpty)
  }
}
