package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming/batch parity: the DuckDB-verified batch queries (ev01/ev02)
  * act as oracles for the streaming versions. */
class EventsStreamSpec extends SparkSpec {

  /** File stream sources consume directories (files get dropped in over
    * time) — stage the single events parquet into one. */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming hourly stats (complete mode) matches the batch ev01 aggregation") {
    val stream = EventsStream.readEvents(spark, eventsDir)
    // complete mode: every window emitted regardless of watermark — the
    // bounded-input equivalence run
    val q = EventsStream.hourlyStats(stream)
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly")
        .select("hour", "event_type", "n_events", "sum_value").collect().toSet
      val batch = graft.queries.Events.queries("ev01_hourly_stats")(spark, sf)
        .collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming sessionization matches batch ev02 session count and sizes") {
    val stream = EventsStream.readEvents(spark, eventsDir, maxFilesPerTrigger = 100)
    val q = EventsStream.sessionize(spark, stream)
      .writeStream.format("memory").queryName("sessions").outputMode("update").start()
    try {
      q.processAllAvailable()
      // one trigger (single file) → each emitted row is a distinct session
      val streamed = spark.table("sessions")
        .select(col("user_id"), col("n_events"), col("start_us"), col("duration_us"))
        .collect().toSet
      val batch = graft.queries.Events.queries("ev02_sessionize")(spark, sf)
        .select(col("user_id"), col("n_events"), col("start_us"), col("duration_us"))
        .collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("watermarked append mode emits only watermark-closed windows (late-data semantics)") {
    val stream = EventsStream.readEvents(spark, eventsDir)
    val q = EventsStream.hourlyStats(stream)
      .writeStream.format("memory").queryName("hourly_append").outputMode("append").start()
    try {
      q.processAllAvailable()
      val appended = spark.table("hourly_append").count()
      val total = graft.queries.Events.queries("ev01_hourly_stats")(spark, sf).count()
      // windows at/after the final watermark stay open — append must be
      // strictly fewer rows than the complete result, and non-empty
      assert(appended > 0 && appended < total)
    } finally q.stop()
  }
}
