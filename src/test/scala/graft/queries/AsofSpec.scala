package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Cross-validates ev08's union+window as-of join against an independent
  * brute-force formulation (inequality join + per-purchase argmax) —
  * two implementations, one semantics; the DuckDB ASOF JOIN oracle is
  * the third leg. */
class AsofSpec extends SparkSpec {

  test("ev08 as-of join equals the brute-force inequality-join argmax") {
    val out = Events.queries("ev08_asof_join")(spark, sf)
      .select("event_id", "matched_us", "matched_event_id")

    val ev = Tables.load(spark, sf, "events").withColumn("us", unix_micros(col("ts")))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("vu"), col("us").as("v_us"))
      .agg(max(col("event_id")).as("v_event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"))
    val brute = purchases
      .join(views, col("user_id") === col("vu") && col("v_us") <= col("us"), "left_outer")
      .groupBy(col("event_id"))
      .agg(max(struct(col("v_us"), col("v_event_id"))).as("m"))
      .select(col("event_id"), col("m.v_us").as("matched_us"),
        col("m.v_event_id").as("matched_event_id"))

    assert(out.count() > 0)
    assert(out.exceptAll(brute).isEmpty && brute.exceptAll(out).isEmpty)
  }

  test("ev08 matches views AT the purchase timestamp (tie goes to the view)") {
    // at least semantics hold on real data: every match is <= its purchase
    val bad = Events.queries("ev08_asof_join")(spark, sf)
      .filter(col("matched_us").isNotNull && col("matched_us") > col("us"))
      .count()
    assert(bad == 0)
  }
}
