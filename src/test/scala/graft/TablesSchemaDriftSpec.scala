package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver-generated events parquet has drifted across testdata
  * generations: ts was TIMESTAMP(NANOS) (Spark reads it only as a long via
  * the nanosAsLong escape hatch), now TIMESTAMP(MICROS) written without
  * UTC adjustment (Spark reads TIMESTAMP_NTZ). Tables.load must normalize
  * BOTH to one session-tz TimestampType column carrying the same instants,
  * or every events query breaks on a regeneration. This spec writes the
  * same instants in both physical layouts and pins the equivalence.
  */
class TablesSchemaDriftSpec extends SparkSpec {

  private def writeVariants(): (String, String) = {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Files.createTempDirectory("ts_drift")
    val micros = Seq(0L, 1700000000000000L, 1700000000123456L, 1700003600999999L)
    val rows = micros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, us, i.toLong % 2, "view", 1.5 * i, "{}")
    }

    // Generation A: ts as INT64 (epoch nanos) — what nanosAsLong yields.
    // Limitation: Spark cannot WRITE an annotated TIMESTAMP(NANOS)
    // column, so this fixture is plain INT64 and the nanosAsLong escape
    // hatch itself is not exercised here — only the post-hatch LongType
    // normalization path (integer-div to micros) is pinned. A true
    // nanos-generation file would need to be checked in as a binary
    // fixture; the driver's regeneration removed the last one.
    val nanoDir = base.resolve("nanos").toString
    val nanoSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(
      rows.map(r => Row(r(0), r.getLong(1) * 1000L, r(2), r(3), r(4), r(5))).asJava,
      nanoSchema)
      .coalesce(1).write.parquet(s"$nanoDir/events.parquet")

    // Generation B: ts as TIMESTAMP_NTZ(MICROS) — the current testdata.
    val ntzDir = base.resolve("ntz").toString
    val ntzSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(
      rows.map(r => Row(r(0),
        java.time.LocalDateTime.ofEpochSecond(
          r.getLong(1) / 1000000L, (r.getLong(1) % 1000000L).toInt * 1000,
          java.time.ZoneOffset.UTC),
        r(2), r(3), r(4), r(5))).asJava,
      ntzSchema)
      .coalesce(1).write.parquet(s"$ntzDir/events.parquet")

    (nanoDir, ntzDir)
  }

  test("Tables.load normalizes both events-ts generations to identical instants") {
    val (nanoDir, ntzDir) = writeVariants()
    val a = Tables.load(spark, nanoDir, "events")
    val b = Tables.load(spark, ntzDir, "events")
    assert(a.schema("ts").dataType === TimestampType)
    assert(b.schema("ts").dataType === TimestampType)
    val ua = a.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ub = b.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ua === ub)
    // and the instants are the ones we wrote, not shifted by a zone
    assert(ua.map(_._2) === Seq(0L, 1700000000000000L, 1700000000123456L, 1700003600999999L))
  }

  test("EventsStream.readEvents adapts to both generations (same hourly counts)") {
    val (nanoDir, ntzDir) = writeVariants()
    def countsOf(dir: String): Map[String, Long] = {
      val q = streaming.EventsStream.hourlyStats(
          streaming.EventsStream.readEvents(spark, s"$dir/events.parquet"))
        .writeStream.format("memory")
        .queryName(s"drift_${dir.hashCode.abs}")
        .outputMode("complete").start()
      q.processAllAvailable(); q.stop()
      spark.table(s"drift_${dir.hashCode.abs}")
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    }
    assert(countsOf(nanoDir) === countsOf(ntzDir))
  }
}
