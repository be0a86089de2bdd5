package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** Streaming ingest: the reference's EP1 record-at-a-time pipeline
  * (producer goroutine → channel → workers, main.go:93-119) as a
  * Structured Streaming job.
  *
  *  - file source watching a drop directory (record-at-a-time semantics
  *    at file granularity — the unit the reference processes);
  *  - `maxFilesPerTrigger` = bounded-channel backpressure;
  *  - flatten + whitelist projection per micro-batch (same operators as
  *    the batch path — one implementation, two execution modes);
  *  - `cleanSource=archive` + `sourceArchiveDir` = MoveInputFile
  *    (fileloader.go:263-328), engine-managed;
  *  - exactly-once parquet sink via checkpointing — strictly stronger
  *    than the reference's at-most-once commit.
  */
object StreamingIngest {

  /** Watch `inputDir` for envelope-JSON files and continuously ingest. */
  def jsonStream(spark: SparkSession, inputDir: String,
      schema: StructType = IngestSchema.raw,
      envelopeKey: String = "Records",
      maxFilesPerTrigger: Int = 10,
      archiveDir: Option[String] = None): DataFrame = {
    val envelope = StructType(Seq(
      StructField(envelopeKey, ArrayType(schema), nullable = true)))
    val rd = spark.readStream
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
    val rd2 = archiveDir.fold(rd) { dir =>
      rd.option("cleanSource", "archive").option("sourceArchiveDir", dir)
    }
    val raw = rd2.schema(envelope).json(inputDir)
      .select(explode(col(envelopeKey)).as("r"))
      .select(col("r.*"))
    JsonIngest.projectWhitelist(Flatten(raw), IngestSchema.sinkColumns,
      IngestSchema.flattened.fields.map(f => f.name -> f.dataType).toMap)
  }

  /** Start the stream into a parquet sink (exactly-once via checkpoint). */
  def startParquetSink(df: DataFrame, outDir: String,
      checkpointDir: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()

  /** Start the stream into the transactional JDBC sink: each micro-batch
    * goes through the staging-table atomic load (all-or-nothing per
    * batch — the streaming form of the reference's whole-file
    * transactionality). Checkpointed source offsets + the sink's
    * per-(table, batchId) commit marker give EXACTLY-ONCE rows in the
    * DB: a crash between the DB commit and the checkpoint commit makes
    * foreachBatch re-deliver the batch on restart, and the marker turns
    * that replay into a no-op (JdbcTransactionalSink.writeBatch). */
  def startJdbcSink(df: DataFrame, url: String, props: java.util.Properties,
      table: String, checkpointDir: String,
      opts: JdbcTransactionalSink.Options = JdbcTransactionalSink.Options())
      : StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val res = JdbcTransactionalSink.writeBatch(
          batch, url, props, table, batchId, opts)
        println(s"[graft-stream] batch=$batchId total=${res.total} " +
          s"succeeded=${res.succeeded} errors=${res.errors} " +
          s"committed=${res.committed} replayed=${res.replayed}")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
}
