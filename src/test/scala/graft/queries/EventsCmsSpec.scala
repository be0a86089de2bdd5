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
