package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TEMPORARY spike: does Spark 4.1 accept stream-stream left-outer
  * interval join followed by windowed max-aggregation in append mode?
  * DELETE after the real operator lands. */
class StreamSpikeSpec extends SparkSpec {
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_spike")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("spike: interval join + windowed agg, append mode") {
    val tolUs = 1800L * 1000000L
    def side(t: String, prefix: String) =
      EventsStream.readEvents(spark, eventsDir, maxFilesPerTrigger = 100)
        .filter(col("event_type") === t)
        .select(col("event_id").as(s"${prefix}_event_id"),
          col("ts").as(s"${prefix}_ts"),
          col("user_id").as(s"${prefix}_user_id"))
        .withWatermark(s"${prefix}_ts", "1 hour")
    val p = side("purchase", "p")
    val v = side("view", "v")
    val joined = p.join(v,
      expr(s"""p_user_id = v_user_id AND
        v_ts >= p_ts - INTERVAL $tolUs MICROSECOND AND
        v_ts <= p_ts"""), "leftOuter")
    val agg = joined
      .groupBy(window(col("p_ts"), "10 minutes"),
        col("p_event_id"), col("p_user_id"),
        unix_micros(col("p_ts")).as("us"))
      .agg(max(struct(col("v_ts"), col("v_event_id"))).as("m"))
      .select(col("p_event_id"), col("p_user_id"), col("us"),
        unix_micros(col("m.v_ts")).as("matched_us"),
        col("m.v_event_id").as("matched_event_id"))
    val q = agg.writeStream.format("memory").queryName("spike")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("spike")
      val n = got.count()
      val matched = got.filter(col("matched_us").isNotNull).count()
      println(s"[spike] emitted $n rows, $matched matched")
      val batch = graft.queries.Events.queries("ev08e_asof_tolerance")(spark, sf)
      println(s"[spike] batch ev08e rows: ${batch.count()}")
      // exact-subset check: every emitted row must equal its batch twin
      val b = batch.select(col("event_id").as("p_event_id"),
        col("user_id").as("p_user_id"), col("us"),
        col("matched_us").as("b_mus"), col("matched_event_id").as("b_mid"))
      val joinedCmp = got.join(b, Seq("p_event_id", "p_user_id", "us"), "left")
      val mismatch = joinedCmp.filter(
        !(col("matched_us") <=> col("b_mus")) ||
        !(col("matched_event_id") <=> col("b_mid"))).count()
      val unmatched = joinedCmp.filter(col("b_mus").isNull &&
        col("matched_us").isNotNull).count()
      println(s"[spike] mismatches vs batch: $mismatch (orphans $unmatched)")
      assert(n > 0 && mismatch == 0)
    } finally q.stop()
  }
}
