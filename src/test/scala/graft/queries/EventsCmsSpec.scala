package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the count-min guarantee behind ev16: the estimate NEVER
  * undercounts (it is a min over d per-row overcounts), for every user
  * in the population — the query's top-50 audit slice inherits it. */
class EventsCmsSpec extends SparkSpec {

  test("ev16: estimates bound exact counts from above, one audit row per top user") {
    val df = Events.queries("ev16_cms_heavy_hitters")(spark, sf).cache()
    val nUsers = graft.Tables.load(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(df.count() == math.min(50L, nUsers))
    assert(df.filter(col("n_est") < col("n_exact")).count() == 0,
      "CMS undercounted — the no-false-negative bound is broken")
    assert(df.filter(col("overestimate") =!= col("n_est") - col("n_exact"))
      .count() == 0)
    df.unpersist()
  }

  test("the single-pass sketch aggregate equals the exploded groupBy cell-for-cell") {
    // the production aggregate (one buffer per map partition) must
    // produce the EXACT integers of the d× explode + hash-agg shape it
    // replaced — same md5 buckets, same counts
    val D = 4
    def bucket(seed: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column) =
      conv(substring(md5(concat_ws("_", seed, id)), 1, 5), 16, 10)
        .cast("long") % 1024
    val ev = graft.Tables.load(spark, sf, "events").select(col("user_id"))
    val exploded = ev
      .select(col("user_id"), explode(sequence(lit(1), lit(D))).as("seed"))
      .select(col("seed"), bucket(col("seed"), col("user_id")).as("b"))
      .groupBy(col("seed"), col("b")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sketch = ev
      .agg(graft.functions.Cms.cmsSketch(col("user_id"), D, 1024).as("cells"))
      .select(posexplode(col("cells")))
      .collect().map(r => ((r.getInt(0) / 1024) + 1, (r.getInt(0) % 1024).toLong) -> r.getLong(1))
      .filter(_._2 > 0).toMap
    assert(sketch == exploded, "sketch cells diverged from the exploded form")
  }

  test("ev16 plan: the sketch side is ONE aggregate over events — no corpus-sized explode") {
    val plan = Events.queries("ev16_cms_heavy_hitters")(spark, sf)
      .queryExecution.sparkPlan
    assert(plan.toString.contains("cms_sketch"),
      s"ev16 lost the single-pass sketch aggregate:\n$plan")
    // every Generate (explode) must sit ABOVE an aggregate — the 1-row
    // sketch unpack and the top-50 probe fan-out — never directly over
    // the events scan (the old d×|events| shape)
    val gens = plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(gens.nonEmpty)
    gens.foreach { g =>
      val aggBelow = g.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }
      assert(aggBelow.isDefined,
        s"a corpus-sized explode survived below the sketch:\n$plan")
    }
  }

  test("CMS bound holds for EVERY user, not just the heavy tail") {
    // rebuild the same 4x1024 sketch and probe the full population:
    // min-over-rows must dominate the exact count for all users
    val D = 4
    def bucket(seed: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column) =
      conv(substring(md5(concat_ws("_", seed, id)), 1, 5), 16, 10)
        .cast("long") % 1024
    val ev = graft.Tables.load(spark, sf, "events").select(col("user_id"))
    val cells = ev
      .select(col("user_id"), explode(sequence(lit(1), lit(D))).as("seed"))
      .select(col("seed"), bucket(col("seed"), col("user_id")).as("b"))
      .groupBy(col("seed"), col("b")).agg(count(lit(1)).as("n"))
    val est = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
      .select(col("user_id"), col("n_exact"),
        explode(sequence(lit(1), lit(D))).as("seed"))
      .withColumn("b", bucket(col("seed"), col("user_id")))
      .join(cells, Seq("seed", "b"))
      .groupBy(col("user_id"), col("n_exact"))
      .agg(min(col("n")).as("n_est"))
    assert(est.filter(col("n_est") < col("n_exact")).count() == 0,
      "CMS undercounted somewhere in the full population")
  }
}
